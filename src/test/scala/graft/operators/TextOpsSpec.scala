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

  test("q100 mixture sample: integer quotas hit, bucket-split equals naive global rank") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = TextOps.MixtureWeights.toMap
    val t = w.map { case (l, wt) => counts.getOrElse(l, 0L) * 100 / wt }.min
    val quotas = w.map { case (l, wt) => l -> t * wt / 100 }
    val got = TextOps.mixtureSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // per-language kept counts equal the integer quotas exactly
    val gotCounts = got.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    quotas.foreach { case (l, q) =>
      assert(gotCounts.getOrElse(l, 0L) == q, s"$l: got ${gotCounts.get(l)} want $q") }
    // bit-identical to the naive single-window form the oracle runs
    val naive = docs
      .select(col("doc_id"), col("lang"), md5(col("doc_id").cast("string")).as("h"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
      .filter { case (_, l, rnk) => rnk <= quotas.getOrElse(l, 0L) }
      .map(t3 => (t3._1, t3._2)).toSet
    assert(got.toSet == naive)
    // deterministic across runs
    val again = TextOps.mixtureSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == got.toSet)
  }

  test("q101 pii redaction: planted PII found and scrubbed, clean docs untouched") {
    val out = TextOps.piiRedaction(spark, sfDir)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    // every doc_id % 7 == 0 has exactly the planted email; % 11 the phone
    rows.foreach { case (id, ne, np, _, _) =>
      assert(ne == (if (id % 7 == 0) 1L else 0L), s"doc $id emails=$ne")
      assert(np == (if (id % 11 == 0) 1L else 0L), s"doc $id phones=$np")
    }
    assert(rows.exists(_._2 > 0) && rows.exists(_._3 > 0), "no planted PII; vacuous")
    // the redacted text admits NO further matches (re-scan the actual
    // redaction output, not the fingerprint)
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val planted = docs.withColumn("txt", concat(
      col("text"),
      when(col("doc_id") % 7 === 0, concat(lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com"))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0, concat(lit(" call +1-555-"),
        (col("doc_id") % 10000).cast("string"))).otherwise(lit(""))))
    val red = planted.select(col("doc_id"), regexp_replace(
      regexp_replace(col("txt"), lit(TextOps.EmailRegex), lit("<EMAIL>")),
      lit(TextOps.PhoneRegex), lit("<PHONE>")).as("red"))
    val residual = red.filter(
      regexp_count(col("red"), lit(TextOps.EmailRegex)) > 0 ||
        regexp_count(col("red"), lit(TextOps.PhoneRegex)) > 0)
    assert(residual.count() == 0)
    // untouched docs keep their exact text (md5(red) == md5(text))
    val clean = out.join(docs, "doc_id")
      .filter(col("n_emails") === 0 && col("n_phones") === 0)
      .filter(col("redacted_md5") =!= md5(col("text")))
    assert(clean.count() == 0)
  }

  test("q102 sequence packing: two-phase prefix sum equals the naive global window") {
    import org.apache.spark.sql.expressions.Window
    val out = TextOps.sequencePacking(spark, sfDir)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val naive = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(graft.functions.TextSig.tokens(col("text"))).cast("long").as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(
        Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq == naive.toSeq)
    // bin bookkeeping: offset decomposes exactly, bins are monotone in doc order
    rows.foreach { case (_, _, off, bin, bo) =>
      assert(bin == off / TextOps.PackBinTokens && bo == off % TextOps.PackBinTokens)
    }
    assert(rows.map(_._4).toSeq == rows.map(_._4).sorted.toSeq)
  }

  test("q103 curation pipeline: every gate bites and the rollup reconciles") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val total = docs.count()
    // recompute the survivor chain step by step
    val dedup = docs.withColumn("k",
        min(col("doc_id")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(graft.functions.TextSig.tokenSetKey(col("text")))))
      .filter(col("doc_id") === col("k"))
    val split = dedup.filter(pmod(
      conv(substring(md5(col("doc_id").cast("string")), 9, 8), 16, 10).cast("long"),
      lit(100L)) < 80)
    val tok = graft.functions.TextSig.tokens(col("text"))
    val qual = split
      .withColumn("nt", size(tok).cast("long"))
      .withColumn("nd", size(array_distinct(tok)).cast("long"))
      .withColumn("ns", size(filter(tok,
        w => w.isin(TextOps.Stopwords: _*))).cast("long"))
      .filter(col("nt") >= TextOps.CurationMinTokens &&
        col("nd").cast("double") / col("nt") > TextOps.CurationMinDistinctRatio &&
        col("ns").cast("double") / col("nt") < TextOps.CurationMaxStopwordRatio)
    // gates are neither vacuous nor total
    assert(dedup.count() < total, "dedup gate dropped nothing")
    assert(split.count() < dedup.count(), "split gate dropped nothing")
    assert(qual.count() > 0, "quality gates dropped everything")
    val out = TextOps.curationPipeline(spark, sfDir)
      .agg(sum(col("n_docs")), sum(col("total_tokens"))).head()
    assert(out.getLong(0) == qual.count())
    assert(out.getLong(1) == qual.agg(sum(col("nt"))).head().getLong(0))
  }

  test("q104 repetition: sorted-run-length multiplicities equal the relational count") {
    val rows = TextOps.repetitionScores(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6)))
    assert(rows.nonEmpty)
    // relational recomputation of max multiplicities
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), graft.functions.TextSig.tokens(col("text")).as("tok"))
      .filter(size(col("tok")) >= 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    rows.foreach { case (id, nBg, nDist, mxBg, mxTok) =>
      val tk = docs(id)
      val bgs = tk.sliding(2).map(_.mkString("_")).toSeq
      assert(nBg == bgs.size.toLong, s"doc $id n_bigrams")
      assert(nDist == bgs.distinct.size.toLong, s"doc $id distinct bigrams")
      assert(mxBg == bgs.groupBy(identity).values.map(_.size).max.toLong, s"doc $id max bigram")
      assert(mxTok == tk.groupBy(identity).values.map(_.size).max.toLong, s"doc $id max token")
    }
    // map-only plan: no DATA-DEPENDENT shuffle before the verify sink — no
    // keyed (hash/range) exchange may exist at any corpus size. The one
    // allowed exchange is Tables.fanOut's round-robin repartition (r21):
    // a row-identity rebalance that fires only when the input scan cannot
    // be split (the single-row-group fixture), never a per-n-gram shuffle.
    val plan = TextOps.repetitionScores(spark, sfDir)
      .queryExecution.executedPlan.toString
    val keyedExchanges = plan.linesIterator
      .filter(_.contains("Exchange")).filterNot(_.contains("RoundRobinPartitioning"))
    assert(keyedExchanges.isEmpty,
      s"repetition scoring shuffled on a key:\n$plan")
  }

  test("q105 tfidf: top terms equal a direct recomputation, ranks well-formed") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), graft.functions.TextSig.tokens(col("text")).as("tok"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val n = docs.size.toLong
    val dfMap = docs.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val expect = docs.flatMap { case (id, tk) =>
      tk.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .map { case (t, tf) => (t, tf, dfMap(t), (tf * n).toDouble / dfMap(t)) }
        .sortBy { case (t, _, _, w) => (-w, t) }
        .take(TextOps.TfidfTopK)
        .zipWithIndex
        .map { case ((t, tf, df, w), i) => (id, i + 1L, t, tf, df, w) }
    }.toSet
    val got = TextOps.tfidfTopTerms(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(got == expect)
  }

  test("q100 property: arbitrary integer mixtures match the naive rank on every weight set") {
    val rng = new scala.util.Random(20260814L)
    val docs = graft.Tables.load(spark, sfDir, "documents").select("doc_id", "lang")
    val local = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    (1 to 5).foreach { trial =>
      // random weights over a random subset of languages (1..5 of them)
      val langs = rng.shuffle(Seq("en", "de", "fr", "es", "zh"))
        .take(rng.between(1, 6))
      val weights = langs.map(_ -> rng.between(1, 50))
      val counts = local.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val t = weights.map { case (l, w) => counts.getOrElse(l, 0L) * 100 / w }.min
      val quotas = weights.map { case (l, w) => l -> t * w / 100 }.toMap
      val expect = local
        .filter { case (_, l) => quotas.contains(l) }
        .groupBy(_._2).toSeq.flatMap { case (l, ds) =>
          ds.sortBy { case (id, _) => (md5hex(id.toString), id) }
            .take(quotas(l).toInt)
        }.toSet
      val got = TextOps.mixtureSampleOn(docs, weights).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == expect, s"trial $trial weights=$weights")
    }
  }

  test("q107 duplicate spans: equals brute-force sliding-window recomputation") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), graft.functions.TextSig.tokens(col("text")).as("tok"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).filter(_._2.size >= 8)
    val windows = docs.flatMap { case (id, tk) =>
      tk.sliding(TextOps.SpanWindow).map(w => (id, w.mkString(" "))).toSeq
    }
    val expect = windows.groupBy(_._2).collect {
      case (_, occ) if occ.length > 1 =>
        (occ.length.toLong, occ.map(_._1).distinct.length.toLong, occ.map(_._1).min)
    }.toSeq.sorted
    val got = TextOps.duplicateSpans(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
    assert(expect.nonEmpty, "no duplicated spans in fixture; vacuous")
    assert(got == expect)
  }

  test("native graft_max_run is bit-identical to the sorted-run-length HOF") {
    assert(spark.catalog.functionExists(graft.plans.GraftExtensions.MaxRunName),
      "spec session must register the extensions")
    // corpus-wide on both q104 input shapes (tokens and bigrams)
    val tok = graft.functions.TextSig.tokens(col("text"))
    val both = graft.Tables.load(spark, sfDir, "documents").select(
      call_function(graft.plans.GraftExtensions.MaxRunName, tok).as("nat"),
      TextOps.maxMultiplicityHof(tok).as("hof"))
    assert(both.queryExecution.executedPlan.toString.contains("graft_max_run"))
    assert(both.filter(not(col("nat") <=> col("hof"))).count() == 0)
    // the q104 operator picks the kernel on this session
    assert(TextOps.repetitionScores(spark, sfDir)
      .queryExecution.executedPlan.toString.contains("graft_max_run"))
    // adversarial edges: null elements (own group), all-null, empty
    // array, null array, multi-byte and empty-string tokens, ties
    val edge = Seq(
      (1L, Some(Seq(Option("a"), None, Option("a"), None, None))),
      (2L, Some(Seq(Option.empty[String], Option.empty[String]))),
      (3L, Some(Seq.empty[Option[String]])),
      (4L, Option.empty[Seq[Option[String]]]),
      (5L, Some(Seq(Option(""), Option(""), Option("日本"), Option("日本"), Option("日本")))),
      (6L, Some(Seq(Option("x"), Option("y"), Option("x"), Option("y"))))
    ).toDF("id", "arr")
    val er = edge.select(col("id"),
      call_function(graft.plans.GraftExtensions.MaxRunName, col("arr")).as("nat"),
      TextOps.maxMultiplicityHof(col("arr")).as("hof")).orderBy(col("id")).collect()
    er.foreach { r =>
      val id = r.getLong(0)
      if (r.isNullAt(1) || r.isNullAt(2))
        assert(r.isNullAt(1) && r.isNullAt(2), s"null split on row $id")
      else assert(r.getLong(1) == r.getLong(2), s"row $id: ${r.getLong(1)} vs ${r.getLong(2)}")
    }
    val byId = er.map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(byId == Map(1L -> 3L, 2L -> 2L, 3L -> 0L, 4L -> -1L, 5L -> 3L, 6L -> 2L))
  }

  test("native graft_span_hashes is bit-identical to the HOF composition") {
    assert(spark.catalog.functionExists(graft.plans.GraftExtensions.SpanHashesName),
      "spec session must register the extensions")
    // corpus-wide on the q107 shape
    val tok = graft.functions.TextSig.tokens(col("text"))
    val both = graft.Tables.load(spark, sfDir, "documents").select(
      call_function(graft.plans.GraftExtensions.SpanHashesName,
        tok, lit(TextOps.SpanWindow)).as("nat"),
      TextOps.spanHashesHof(tok, TextOps.SpanWindow).as("hof"))
    assert(both.queryExecution.executedPlan.toString.contains("graft_span_hashes"))
    assert(both.filter(not(col("nat") <=> col("hof"))).count() == 0)
    // the q107 operator picks the kernel on this session
    assert(TextOps.duplicateSpans(spark, sfDir)
      .queryExecution.executedPlan.toString.contains("graft_span_hashes"))
    // adversarial edges: null tokens skipped with their separator
    // (array_join semantics), short arrays empty, null array null,
    // multi-byte and empty-string tokens hash byte-identically
    val edge = Seq(
      (1L, Some(Seq(Option("a"), None, Option("b"), Option("c")))),
      (2L, Some(Seq(Option("only"), Option("two")))),
      (3L, Option.empty[Seq[Option[String]]]),
      (4L, Some(Seq(Option(""), Option("日本"), Option("x y"), Option("z")))),
    ).toDF("id", "arr")
    val w = 3
    val er = edge.select(col("id"),
      call_function(graft.plans.GraftExtensions.SpanHashesName,
        col("arr"), lit(w)).as("nat"),
      TextOps.spanHashesHof(col("arr"), w).as("hof")).orderBy(col("id")).collect()
    er.foreach { r =>
      val id = r.getLong(0)
      if (r.isNullAt(1) || r.isNullAt(2))
        assert(r.isNullAt(1) && r.isNullAt(2), s"null split on row $id")
      else assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"row $id: ${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
    }
    assert(er(1).getSeq[String](1).isEmpty, "short array must give no windows")
    assert(er(2).isNullAt(1), "null array must stay null")
    // non-positive w: both forms give the empty array (null array stays null)
    val z = edge.select(col("id"),
      call_function(graft.plans.GraftExtensions.SpanHashesName,
        col("arr"), lit(0)).as("nat"),
      TextOps.spanHashesHof(col("arr"), 0).as("hof")).orderBy(col("id")).collect()
    z.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"w=0 null split on row ${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getSeq[String](1).isEmpty && r.getSeq[String](2).isEmpty)
    }
  }
}
