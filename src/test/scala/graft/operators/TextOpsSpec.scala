package graft.operators

import graft.SparkSpec
import graft.functions.LangId
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("langId routes real sentences to the right profile") {
    val cases = Seq(
      ("the cat sat on the mat and it is happy", "en"),
      ("le chat est sur le tapis et la table", "fr"),
      ("der hund ist im haus und die katze nicht", "de"),
      ("el gato es un animal y la casa es una", "es"),
      ("我 是 一 个 人 这 是 我 的 家", "zh"),
      ("qqq www zzz xyz", "unknown"),
    )
    val out = cases.toDF("text", "expected")
      .withColumn("detected", LangId.langId(col("text")))
      .select("expected", "detected").as[(String, String)].collect()
    out.foreach { case (exp, det) => assert(det == exp, s"expected $exp got $det") }
  }

  test("detectLanguages runs over the corpus and labels every document") {
    val d = TextOps.detectLanguages(spark, sfDir)
    assert(d.count() == graft.Tables.load(spark, sfDir, "documents").count())
    assert(d.filter(col("detected_lang").isNull).count() == 0)
  }

  test("doc quality metrics are internally consistent") {
    val q = TextOps.docQuality(spark, sfDir)
    assert(q.filter(col("n_distinct_tokens") > col("n_tokens")).count() == 0)
    assert(q.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() == 0)
    // chars in tokens + separators == n_chars (single-space corpus)
    val bad = q.join(
      graft.Tables.load(spark, sfDir, "documents").select("doc_id", "text"), "doc_id")
      .withColumn("reconstructed",
        round(col("avg_token_len") * col("n_tokens") + col("n_tokens") - 1).cast("long"))
      .filter(col("reconstructed") =!= col("n_chars"))
    assert(bad.count() == 0)
  }
  test("q97 split: deterministic, id-keyed, ~80/10/10, engine-portable bucket domain") {
    val a = TextOps.splitAssign(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sortBy(_._1)
    // deterministic and content-independent: re-running AND running over
    // a different corpus snapshot with the same ids assigns identically
    val b = TextOps.splitAssign(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sortBy(_._1)
    assert(a == b)
    val c = TextOps.splitAssign(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).map(t => t._1 -> (t._2, t._3)).toMap
    a.foreach { case (id, bkt, sp) =>
      assert(c.get(id).forall(_ == (bkt, sp)), s"id $id split drifted across corpora")
    }
    // buckets live in [0, 100) and the split boundaries hold exactly
    a.foreach { case (id, bkt, sp) =>
      assert(bkt >= 0 && bkt < 100, s"id $id bucket $bkt")
      val want = if (bkt < 80) "train" else if (bkt < 90) "val" else "test"
      assert(sp == want, s"id $id bucket $bkt split $sp")
    }
    // hash split is approximately 80/10/10 (loose: small corpus)
    val frac = a.count(_._3 == "train").toDouble / a.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

}
