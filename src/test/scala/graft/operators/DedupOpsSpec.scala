package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("LSH pipeline never materializes an all-pairs join") {
    val plan = planOf(DedupOps.minhashNeardupPairs(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), "cartesian product in LSH plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "nested-loop join in LSH plan")
  }

  test("LSH candidates have full recall on the exact >=0.9 bigram-Jaccard pairs") {
    // ground truth by brute force (test-only; 500 docs)
    val sh = DedupOps.shingled(spark, sfDir)
    val a = sh.select(col("doc_id").as("doc_i"), col("sh").as("sh_i"))
    val b = sh.select(col("doc_id").as("doc_j"), col("sh").as("sh_j"))
    val inter = size(array_intersect(col("sh_i"), col("sh_j")))
    val truth = a.crossJoin(b).filter(col("doc_i") < col("doc_j"))
      .withColumn("jac", inter.cast("double") / (size(col("sh_i")) + size(col("sh_j")) - inter))
      .filter(col("jac") >= DedupOps.NeardupThreshold)
      .select("doc_i", "doc_j").as[(Long, Long)].collect().toSet

    val found = DedupOps.minhashNeardupPairs(spark, sfDir)
      .select("doc_i", "doc_j").as[(Long, Long)].collect().toSet

    assert(truth.nonEmpty, "fixture has no near-dup pairs; test is vacuous")
    assert(found == truth, s"missed=${truth -- found} extra=${found -- truth}")
  }

  test("LSH skew guard: a planted giant bucket sub-bands into bounded pairs") {
    // 200 docs with IDENTICAL shingle sets: every band hashes them into
    // ONE bucket — ungated, that is C(200,2) = 19900 pairs per band
    val n = 200
    val cap = 10
    val planted = (1L to n.toLong).map(i => (i, Seq("ab", "bc", "cd", "de")))
      .toDF("doc_id", "sh")
    spark.conf.set("spark.graft.dedup.lshMaxBucket", cap.toString)
    try {
      val pairs = DedupOps.lshCandidatesOf(spark, planted)
        .as[(Long, Long)].collect()
      assert(pairs.nonEmpty, "sub-banding must still produce in-group candidates")
      assert(pairs.forall { case (i, j) => i < j })
      // bounded: O(n*cap), nowhere near the quadratic C(n,2)
      assert(pairs.length <= n * cap * 2,
        s"skew guard ineffective: ${pairs.length} pairs from one giant bucket")
      assert(pairs.length < n * (n - 1) / 4,
        s"pair count ${pairs.length} is still quadratic-scale")
      // without the conf the same corpus stays under the default cap logic
      // (planted bucket of 200 < default 1024 -> full expansion)
      spark.conf.unset("spark.graft.dedup.lshMaxBucket")
      assert(DedupOps.lshCandidatesOf(spark, planted).count() == n.toLong * (n - 1) / 2)
    } finally spark.conf.unset("spark.graft.dedup.lshMaxBucket")
  }

  test("simhash hamming-band candidates are complete for distance <= 3") {
    val pairs = DedupOps.simhashNeardupPairs(spark, sfDir)
    // brute-force hamming over all pairs as truth
    val sims = graft.Tables.load(spark, sfDir, "documents").select(
      col("doc_id"), graft.functions.TextSig.simhash(split(col("text"), " ")).as("sim"))
    val x = sims.select(col("doc_id").as("doc_i"), col("sim").as("sim_i"))
    val y = sims.select(col("doc_id").as("doc_j"), col("sim").as("sim_j"))
    val truth = x.crossJoin(y).filter(col("doc_i") < col("doc_j"))
      .withColumn("hamming", bit_count(col("sim_i").bitwiseXOR(col("sim_j"))))
      .filter(col("hamming") <= 3)
      .select("doc_i", "doc_j").as[(Long, Long)].collect().toSet
    val found = pairs.select("doc_i", "doc_j").as[(Long, Long)].collect().toSet
    assert(found == truth, s"missed=${truth -- found} extra=${found -- truth}")
    val plan = planOf(pairs)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("native graft_simhash is bit-identical to the HOF composition (incl. edge semantics)") {
    import graft.functions.TextSig
    assert(spark.catalog.functionExists(graft.plans.GraftExtensions.SimHashName),
      "spec session must register the extensions")
    val both = graft.Tables.load(spark, sfDir, "documents")
      .select(
        TextSig.simhash(TextSig.tokens(col("text"))).as("nat"),
        TextSig.simhashHof(TextSig.tokens(col("text"))).as("hof"))
    assert(both.queryExecution.executedPlan.toString.contains("graft_simhash"),
      "native kernel not picked by the plan")
    assert(both.filter(col("nat") =!= col("hof")).count() == 0,
      "corpus simhashes diverge")
    // edge semantics: empty token array is all-ones (majority of zero
    // tokens holds for every lane), a null TOKEN votes for nothing but
    // counts toward n (md5(null) is null -> every HOF bit lane takes the
    // otherwise(0) branch), a null array is null — both forms
    val edge = Seq(
      (1L, Some(Seq(Option("a"), None, Option("b")))),
      (2L, Some(Seq.empty[Option[String]])),
      (3L, Option.empty[Seq[Option[String]]])).toDF("id", "toks")
    val er = edge.select(col("id"),
      TextSig.simhash(col("toks")).as("nat"),
      TextSig.simhashHof(col("toks")).as("hof"))
      .orderBy(col("id")).collect()
    assert(er(0).getLong(1) == er(0).getLong(2), s"null-token row: ${er(0)}")
    assert(er(1).getLong(1) == -1L && er(1).getLong(2) == -1L, s"empty row: ${er(1)}")
    assert(er(2).isNullAt(1) && er(2).isNullAt(2), s"null-array row: ${er(2)}")
    // byte-level parity on adversarial tokens: empty string (zero bytes
    // under the seed) and multi-byte UTF-8 — the kernel hashes raw bytes,
    // so non-ASCII must agree byte for byte
    val adv = Seq((1L, Seq("", "héllo", "日本語", "a b"))).toDF("id", "toks")
    val ar = adv.select(
      TextSig.simhash(col("toks")).as("nat"),
      TextSig.simhashHof(col("toks")).as("hof")).head
    assert(ar.getLong(0) == ar.getLong(1), s"adversarial tokens diverge: $ar")
    // type-domain parity (ADVICE r10): a non-string token array analyzes
    // identically with and without the kernel — the wrapper casts to
    // array<string>, so graft_simhash's array<string> requirement can
    // never make analysis environment-dependent
    val ints = Seq((1L, Seq(1, 22, 333))).toDF("id", "toks")
    val ir = ints.select(
      TextSig.simhash(col("toks")).as("nat"),
      TextSig.simhashHof(col("toks").cast("array<string>")).as("hof")).head
    assert(ir.getLong(0) == ir.getLong(1), s"int-token casts diverge: $ir")
  }

  test("prefix-filter Jaccard join is EXACT: equals brute force at 0.8, no all-pairs join") {
    val sh = DedupOps.shingled(spark, sfDir)
    val a = sh.select(col("doc_id").as("doc_i"), col("sh").as("sh_i"))
    val b = sh.select(col("doc_id").as("doc_j"), col("sh").as("sh_j"))
    val inter = size(array_intersect(col("sh_i"), col("sh_j")))
    val truth = a.crossJoin(b).filter(col("doc_i") < col("doc_j"))
      .withColumn("jac", inter.cast("double") / (size(col("sh_i")) + size(col("sh_j")) - inter))
      .filter(col("jac") >= 0.8)
      .select("doc_i", "doc_j").as[(Long, Long)].collect().toSet
    val got = DedupOps.jaccardSimilarityJoin(spark, sfDir)
      .select("doc_i", "doc_j").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture has no pairs at 0.8; test is vacuous")
    assert(got == truth, s"missed=${truth -- got} extra=${got -- truth}")
    val plan = planOf(DedupOps.jaccardSimilarityJoin(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "prefix-filter join degenerated to all-pairs")
  }

  test("prefix length survives ceil boundaries: exact pairs on adversarial set sizes") {
    // sets sized so that t*|x| lands exactly on integers (the double-ceil
    // trap: ceil(0.8*5) must be 4, not 5) — x1/x2 share 4 of 5 shingles
    // (jac 4/6 < 0.8), x3/x4 are identical 5-sets (jac 1.0), x5/x6 overlap
    // 9 of 10 (jac 9/11 = 0.818 >= 0.8)
    val docs = Seq(
      1L -> "a b c d e f",       // bigrams: ab bc cd de ef (5)
      2L -> "a b c d e g",       // ab bc cd de eg — shares 4
      3L -> "p q r s t u",       // 5 bigrams
      4L -> "p q r s t u",       // identical
      5L -> "m n o w x y z m2 n2 o2 w2", // 10 bigrams
      6L -> "m n o w x y z m2 n2 o2 w3", // last bigram differs: 9/11 = 0.818
    ).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"), graft.functions.TextSig.shingles(col("text")).as("sh"))
    val got = DedupOps.jaccardSimilarityJoinOn(sh, 4, 5)
      .select("doc_i", "doc_j").as[(Long, Long)].collect().toSet
    assert(got == Set((3L, 4L), (5L, 6L)), s"operator found: $got")
  }

  test("graft_inter_count accepts array<string> inputs differing only in containsNull") {
    // regression (review finding r12): the long-path type guard must
    // compare ELEMENT types — an exact ArrayType equality rejected a
    // containsNull=true shingle column against a containsNull=false
    // array literal, both plain array<string>
    val r = spark.sql(
      "SELECT graft_inter_count(array('a','b','c'), " +
        "transform(array('a','b','x'), t -> if(t = 'zz', NULL, t)), 1, 2)")
      .head().getInt(0)
    assert(r == 2) // {a,b} of union size 4: 2*3 >= 1*6 at threshold 1/2
  }

  test("graft_inter_count sorted-long fast path: property-equal to set semantics, early exit safe") {
    // the compact-signature verify path (r12): thresholded merge
    // intersection of sorted distinct long arrays must agree with naive
    // set intersection + the exact rational threshold on every input —
    // including the adversarial shapes: empty arrays, zero overlap, full
    // overlap, and pairs sitting exactly ON the ceil(alpha) boundary
    // (where a premature early exit would flip a true pair to -1)
    import org.apache.spark.sql.catalyst.util.ArrayData
    def check(a: Seq[Long], b: Seq[Long], tNum: Int, tDen: Int): Unit = {
      val inter = a.toSet.intersect(b.toSet).size
      val expect =
        if (inter.toLong * (tNum + tDen) >= tNum.toLong * (a.size + b.size)) inter else -1
      val got = graft.plans.InterCount.computeSortedLong(
        ArrayData.toArrayData(a.toArray), ArrayData.toArrayData(b.toArray), tNum, tDen)
      assert(got == expect, s"a=$a b=$b t=$tNum/$tDen: got $got want $expect")
    }
    check(Nil, Nil, 4, 5)          // 0 >= 0: empty pair IS above threshold
    check(Seq(1L), Nil, 4, 5)      // empty vs non-empty: unreachable
    check(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 4, 5)      // identical
    check(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L), 4, 5)      // disjoint
    check((1L to 5L), (1L to 4L) :+ 9L, 4, 5)          // 4/6 < 0.8
    check((1L to 10L), (1L to 9L) :+ 99L, 4, 5)        // 9/11 = 0.818 on the boundary
    val rng = new scala.util.Random(20260814L)
    (1 to 500).foreach { _ =>
      val n = rng.nextInt(40)
      val m = rng.nextInt(40)
      val pool = (0L until 30L).toVector
      val a = rng.shuffle(pool).take(n).sorted
      val b = rng.shuffle(pool).take(m).sorted
      val (tn, td) = Seq((4, 5), (1, 2), (9, 10), (1, 9))(rng.nextInt(4))
      check(a, b, tn, td)
    }
  }

  test("dedup survivors partition the corpus: sum of group sizes = corpus size") {
    val total = graft.Tables.load(spark, sfDir, "documents").count()
    val survivors = DedupOps.dedupSurvivors(spark, sfDir)
    assert(survivors.agg(sum("group_size")).as[Long].head() == total)
    assert(survivors.select("doc_id").distinct().count() == survivors.count())
  }

  test("native graft_minhash_bands is bit-identical to the functions._ composition") {
    assert(spark.catalog.functionExists(graft.plans.GraftExtensions.MinHashBandsName),
      "extension not registered in the test session")
    val sh = DedupOps.shingled(spark, sfDir)
    val both = sh.select(
      col("doc_id"),
      call_function(graft.plans.GraftExtensions.MinHashBandsName,
        col("sh"), lit(8), lit(4)).as("native"),
      graft.functions.TextSig.minhashBands(col("sh"), 8, 4).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.count() > 0)
  }

  test("native graft_shingles is bit-identical to the functions._ composition") {
    assert(spark.catalog.functionExists(graft.plans.GraftExtensions.ShinglesName))
    // corpus-wide equality, ELEMENT ORDER INCLUDED (array_distinct keeps
    // first occurrences) — plus the edge shapes: empty text, single token,
    // repeated separators (empty tokens), duplicate bigrams
    val corpus = graft.Tables.load(spark, sfDir, "documents").select(col("text"))
      .unionAll(Seq("", "one", "a b c a b", "a  b", "x y x y x", " lead", "trail ")
        .toDF("text"))
    val both = corpus.select(
      call_function(graft.plans.GraftExtensions.ShinglesName, col("text")).as("native"),
      graft.functions.TextSig.shingles(col("text")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0,
      both.filter(col("native") =!= col("hof")).limit(3).collect().mkString("; "))
    assert(both.count() > 0)
  }

  test("native graft_rank_order is bit-identical to the functions._ composition") {
    assert(spark.catalog.functionExists(graft.plans.GraftExtensions.RankOrderName))
    val sh = DedupOps.shingled(spark, sfDir)
    // a PARTIAL dictionary (every other token, capped-dict shape): in-dict
    // tokens order by their df, out-of-dict tokens by (1, tok)
    val dict: Map[String, Long] = sh.select(explode(col("sh")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok"))
      .collect().zipWithIndex.collect { case (r, i) if i % 2 == 0 =>
        r.getString(0) -> r.getLong(1)
      }.toMap
    def hof(dictCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = transform(
      sort_array(transform(col("sh"), t =>
        struct(coalesce(try_element_at(dictCol, t), lit(1L)).as("df"), t.as("tok")))),
      st => st.getField("tok"))
    val corpus = sh.unionByName(
      Seq((100001L, Seq.empty[String]), (100002L, Seq("only_one")),
        (100003L, Seq("zz_1", "aa_2", "mm_3"))).toDF("doc_id", "sh"))
    val both = corpus.select(
      call_function(graft.plans.GraftExtensions.RankOrderName,
        col("sh"), typedlit(dict)).as("native"),
      hof(typedlit(dict)).as("hofv"))
    assert(both.filter(col("native") =!= col("hofv")).count() == 0,
      both.filter(col("native") =!= col("hofv")).limit(3).collect().mkString("; "))
    // empty dictionary: pure (1, tok) lexicographic order, both forms
    val emptyDict = typedlit(Map.empty[String, Long])
    val b2 = corpus.select(
      call_function(graft.plans.GraftExtensions.RankOrderName,
        col("sh"), emptyDict).as("native"),
      hof(emptyDict).as("hofv"))
    assert(b2.filter(col("native") =!= col("hofv")).count() == 0)
    assert(both.count() > 0)
  }

  test("capped prefix dictionary keeps the Jaccard join exact") {
    // dictionary capped to 16 entries — most tokens order as df=1; the
    // candidate set grows but the pair set must not change
    spark.conf.set("spark.graft.dedup.prefixDictSize", "16")
    try {
      val docs = Seq(
        1L -> "a b c d e f", 2L -> "a b c d e g",
        3L -> "p q r s t u", 4L -> "p q r s t u",
        5L -> "m n o w x y z m2 n2 o2 w2", 6L -> "m n o w x y z m2 n2 o2 w3",
      ).toDF("doc_id", "text")
      val sh = docs.select(col("doc_id"), graft.functions.TextSig.shingles(col("text")).as("sh"))
      val got = DedupOps.jaccardSimilarityJoinOn(sh, 4, 5)
        .select("doc_i", "doc_j").as[(Long, Long)].collect().toSet
      assert(got == Set((3L, 4L), (5L, 6L)), s"operator found: $got")
    } finally spark.conf.unset("spark.graft.dedup.prefixDictSize")
  }

  test("rolling fingerprint is deterministic and content-sensitive") {
    import graft.functions.TextSig
    val df = Seq("a b c", "a b c", "a b d").toDF("text")
      .select(TextSig.rollingFingerprint(col("text")).as("fp")).as[Long].collect()
    assert(df(0) == df(1) && df(0) != df(2))
  }
  test("q98 decontamination equals brute-force containment; benchmark side broadcasts") {
    val sh = DedupOps.shingled(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val bench = sh.filter(_._1 % 50 == 0)
    val truth = (for {
      (id, set) <- sh if id % 50 != 0 && set.nonEmpty
      (bid, bset) <- bench
      cont = (set intersect bset).size.toDouble / set.size
      if cont >= DedupOps.DecontaminationThreshold
    } yield (id, bid, cont)).toSet
    val df = DedupOps.decontamination(spark, sfDir)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(truth.nonEmpty, "fixture has no contaminated docs; test is vacuous")
    assert(got == truth, s"missed=${truth -- got} extra=${got -- truth}")
    // the benchmark postings are the BROADCAST side (small by nature);
    // the corpus is never broadcast
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("connectedComponents: chains, cliques, isolated pairs converge to min labels") {
    // path 1-2-3-4-5 (closure forced through transitivity), a triangle
    // {10,11,12}, a far pair {100, 7}, duplicate + reversed edges
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (5L, 4L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (100L, 7L), (7L, 100L), (100L, 7L)).toDF("u", "v")
    val got = DedupOps.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      7L -> 7L, 100L -> 7L))
  }

  test("connectedComponents: long path exercises multi-round convergence") {
    // a 64-node path is the worst shape for naive propagation (diameter
    // 63); large-star/small-star must still close it in O(log n) rounds.
    // Force the DISTRIBUTED rounds (the driver union-find tail would
    // otherwise absorb a fixture this small).
    spark.conf.set("spark.graft.dedup.ccDriverMaxEdges", "0")
    try {
      val edges = (1L until 64L).map(i => (i, i + 1)).toDF("u", "v")
      val got = DedupOps.connectedComponents(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size == 64 && got.values.forall(_ == 1L))
    } finally spark.conf.unset("spark.graft.dedup.ccDriverMaxEdges")
  }

  test("convergence guard: a doctored colliding signature does not accept unequal edge sets") {
    // VERDICT r12 #1 done-criterion: the per-round convergence signature
    // is a (count, XOR-of-xxhash64) pair — probabilistic. ccAccept is the
    // guard that runs when the signatures already match; doctoring
    // sigEqual=true over two DIFFERENT same-count edge sets simulates a
    // 64-bit collision, and the exact exceptAll check must refuse it.
    val e1 = Seq((1L, 2L), (3L, 4L)).toDF("lo", "hi")
    val e2 = Seq((1L, 2L), (3L, 5L)).toDF("lo", "hi")
    assert(!DedupOps.ccAccept(e2, e1, sigEqual = true),
      "a colliding signature over unequal sets was accepted as convergence")
    // and the guard still accepts genuine fixpoints (content-equal sets)
    assert(DedupOps.ccAccept(e1, Seq((3L, 4L), (1L, 2L)).toDF("lo", "hi"), sigEqual = true))
    // signature inequality short-circuits regardless of content
    assert(!DedupOps.ccAccept(e1, e1, sigEqual = false))
  }

  test("connectedComponents: driver tail and distributed rounds agree on the q38 pairs") {
    // BOTH fixture scales: the sf0.01 pair set is the one that exposed
    // the keys-view-mutation bug (47 endpoints -> 28 labels) which the
    // smaller sf0.001 set did not trigger
    Seq(sfDir, "/root/testdata/sf0.01").foreach { dir =>
      val pairs = DedupOps.minhashNeardupPairs(spark, dir)
        .select(col("doc_i").as("u"), col("doc_j").as("v"))
      val endpoints = pairs.collect()
        .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
      val viaDriver = DedupOps.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
      spark.conf.set("spark.graft.dedup.ccDriverMaxEdges", "0")
      val viaRounds =
        try DedupOps.connectedComponents(pairs)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
        finally spark.conf.unset("spark.graft.dedup.ccDriverMaxEdges")
      assert(viaDriver.nonEmpty && viaDriver == viaRounds, s"paths diverge at $dir")
      assert(viaDriver.map(_._1) == endpoints, s"labels lost endpoints at $dir")
    }
  }

  test("q99 components agree with the q38 pair set (endpoints linked, labels minimal)") {
    val pairs = DedupOps.minhashNeardupPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val comp = DedupOps.neardupComponents(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val label = comp.map(t => t._1 -> t._2).toMap
    assert(pairs.nonEmpty, "fixture has no near-dup pairs; test is vacuous")
    // exactly the pair endpoints appear
    assert(label.keySet == pairs.flatMap(p => Set(p._1, p._2)))
    // both endpoints of every pair share a component
    pairs.foreach { case (i, j) => assert(label(i) == label(j), s"pair ($i,$j) split") }
    // the label is the component minimum and cluster_size counts members
    val members = comp.groupBy(_._2)
    members.foreach { case (c, ms) =>
      assert(ms.map(_._1).min == c, s"component $c not labeled by its min")
      ms.foreach(t => assert(t._3 == ms.length.toLong))
    }
  }

  test("connectedComponents property: random graphs match union-find ground truth") {
    val rng = new scala.util.Random(20260814L)
    def truthOf(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
      }
      edges.foreach { case (a0, b0) =>
        val (a, b) = (find(a0), find(b0))
        if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      nodes.map(x => x -> find(x)).toMap
    }
    (1 to 20).foreach { i =>
      val n = rng.between(2, 40)
      val m = rng.between(1, 3 * n)
      val edges = Seq.fill(m)((rng.between(0, n).toLong, rng.between(0, n).toLong))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val truth = truthOf(n, edges)
        // driver-tail path on every graph; forced distributed rounds on a few
        val viaDriver = DedupOps.connectedComponents(edges.toDF("u", "v"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(viaDriver == truth, s"graph $i driver path")
        if (i % 7 == 0) {
          spark.conf.set("spark.graft.dedup.ccDriverMaxEdges", "0")
          try {
            val viaRounds = DedupOps.connectedComponents(edges.toDF("u", "v"))
              .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
            assert(viaRounds == truth, s"graph $i distributed path")
          } finally spark.conf.unset("spark.graft.dedup.ccDriverMaxEdges")
        }
      }
    }
  }

  test("q108 streaming twin: MemoryStream + foreachBatch converges to the batch answer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the corpus keyed like q108, split into two ORDERED halves
    val keyed = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.functions.TextSig.tokenSetKey(col("text")).as("group_key"))
      .as[(Long, String)].collect().sortBy(_._1)
    val (h1, h2) = keyed.splitAt(keyed.length / 2)
    val stream = MemoryStream[(Long, String)]
    @volatile var state = DedupOps.emptySurvivors(spark)
    def drain(): Unit = {
      val q = stream.toDF().toDF("doc_id", "group_key")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          state = DedupOps.dedupStep(state, b, id)
          ()
        }
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    stream.addData(h1.toSeq); drain()
    stream.addData(h2.toSeq); drain()
    val got = state.select("doc_id", "group_key")
      .as[(Long, String)].collect().toSet
    val expect = keyed.groupBy(_._2).view.mapValues(_.map(_._1).min)
      .toMap.map(_.swap).map { case (id, k) => (id, k) }.toSet
    assert(got == expect, "streaming incremental dedup diverged from batch min-per-key")
    // and the q108 operator itself agrees with the same ground truth
    val q108 = DedupOps.incrementalDedup(spark, sfDir)
      .select("doc_id", "group_key").as[(Long, String)].collect().toSet
    assert(q108 == expect)
  }

  test("connectedComponents at scale: 5k-node random graph, forced distributed rounds") {
    // large enough that convergence takes multiple Large-Star/Small-Star
    // rounds and the O(log n) bound matters; ground truth by union-find
    val rng = new scala.util.Random(20260815L)
    val n = 5000
    val edges = Seq.fill(6000)((rng.between(0, n).toLong, rng.between(0, n).toLong))
      .filter(e => e._1 != e._2)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    edges.foreach { case (a0, b0) =>
      val (a, b) = (find(a0), find(b0))
      if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val truth = nodes.map(x => x -> find(x)).toMap
    spark.conf.set("spark.graft.dedup.ccDriverMaxEdges", "0")
    try {
      val got = DedupOps.connectedComponents(edges.toDF("u", "v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size == truth.size, s"${got.size} labels for ${truth.size} nodes")
      assert(got == truth)
    } finally spark.conf.unset("spark.graft.dedup.ccDriverMaxEdges")
  }

  test("dedupStep: a null group key dedups once across batches (null-safe state probe)") {
    val b1 = Seq((5L, Option("k1")), (9L, Option.empty[String]), (7L, Option("k1")))
      .toDF("doc_id", "group_key")
    val b2 = Seq((11L, Option.empty[String]), (12L, Option("k2")))
      .toDF("doc_id", "group_key")
    val s1 = DedupOps.dedupStep(DedupOps.emptySurvivors(spark), b1, 0L)
    val s2 = DedupOps.dedupStep(s1, b2, 1L)
    val got = s2.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).toSet
    // the null key is ONE group: batch 0 keeps its min (9), batch 1's
    // null-keyed doc must NOT re-append
    assert(got == Set((5L, Some("k1"), 0L), (9L, None, 0L), (12L, Some("k2"), 1L)),
      s"got $got")
  }

  test("incrementalDedupOn property: first-seen-wins under arbitrary batch splits") {
    // the ORDERED split (q108) makes first-seen = global min; under ANY
    // split the contract is: one survivor per key, stamped with the
    // first batch containing the key, and equal to the in-batch min of
    // that batch — lock that semantics for out-of-order ingest too
    val rng = new scala.util.Random(20260816L)
    val keyed = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.functions.TextSig.tokenSetKey(col("text")).as("group_key"))
      .as[(Long, String)].collect()
    (1 to 3).foreach { trial =>
      val nB = rng.between(2, 5)
      val assign = keyed.map(r => (r, rng.between(0, nB)))
      val batches = (0 until nB).map(b =>
        assign.filter(_._2 == b).map(_._1).toSeq.toDF("doc_id", "group_key"))
      val got = DedupOps.incrementalDedupOn(batches).collect()
        .map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
      // one survivor per key
      assert(got.map(_._1).distinct.length == got.length, s"trial $trial dup keys")
      val byKey = got.map(t => t._1 -> (t._2, t._3)).toMap
      val truthFirst = assign.groupBy(_._1._2).view.mapValues { rs =>
        val fb = rs.map(_._2).min // first batch containing the key
        (rs.filter(_._2 == fb).map(_._1._1).min, fb.toLong)
      }.toMap
      assert(byKey.keySet == truthFirst.keySet, s"trial $trial key sets differ")
      byKey.foreach { case (k, v) =>
        assert(v == truthFirst(k), s"trial $trial key $k: $v vs ${truthFirst(k)}")
      }
    }
  }
}
