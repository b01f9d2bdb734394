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
}
