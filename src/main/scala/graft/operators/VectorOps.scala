package graft.operators

import graft.{NamedQuery, Tables}
import graft.functions.VectorMath
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` fixture (64-dim float vectors,
  * driver brief north star).
  *
  * Scale design:
  *  - the exact path is the distributed brute-force BASELINE: broadcast
  *    the (tiny) probe set, score in one pass over the table (O(N·P),
  *    never O(N²)), then per-probe top-k through a rank window that Spark
  *    executes as WindowGroupLimit — a map-side partial top-k per
  *    partition before the single small shuffle, so no full sort and no
  *    fat shuffle at any N;
  *  - the ANN scale path is IVF-style list pruning: vectors are grouped
  *    into coarse lists (the fixture's `label` is the offline coarse
  *    quantizer assignment, as in any production IVF index), probes rank
  *    list centroids and visit only `nprobe` lists — candidates shrink by
  *    nlists/nprobe while recall stays high (spec-asserted).
  *
  * The exact top-k is DuckDB-oracle-checked bit-for-bit thanks to the
  * integer quantization documented on [[VectorMath]].
  */
object VectorOps {

  /** Fixed probe ids (present at every scale factor). */
  val ProbeIds: Seq[Long] = Seq(0L, 123L, 321L)
  val K = 10

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** vec_id, label, quantized vector + its squared norm. */
  private[operators] def prepared(s: SparkSession, dir: String): DataFrame = {
    val q = VectorMath.quantize(col("embedding"))
    emb(s, dir).select(
      col("vec_id"), col("label"), q.as("qv"))
      .withColumn("nq", VectorMath.normSq(col("qv")))
  }

  /** q39 — exact top-k cosine neighbors for the fixed probe set:
    * broadcast probes → one scoring pass → rank-window top-k. */
  val exactTopK: (SparkSession, String) => DataFrame = (s, dir) => {
    val e = prepared(s, dir)
    val p = prepared(s, dir)
      .filter(col("vec_id").isin(ProbeIds: _*))
      .select(col("vec_id").as("probe_id"), col("qv").as("pqv"), col("nq").as("pnq"))
    val scored = e.join(broadcast(p))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("sim",
        VectorMath.cosineFromParts(
          VectorMath.dot(col("qv"), col("pqv")), col("nq"), col("pnq")))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("probe_id"), col("rank"), col("vec_id"), col("sim"))
  }

  /** NATIVE k-means coarse quantizer (Lloyd's) in pure DataFrame algebra —
    * no fixture `label`, no driver-side vectors:
    *  - seeded deterministic init: the k vectors with the smallest
    *    xxhash64(vec_id) (TakeOrderedAndProject — distributed partial
    *    top-k, k rows materialize);
    *  - per iteration: assignment against BROADCAST centroids (k×dim — the
    *    only thing that is ever small enough to broadcast), then
    *    dimension-wise means via posexplode + two-key groupBy;
    *  - `localCheckpoint` truncates the growing lineage each iteration
    *    without collecting anything to the driver.
    * Returns (list_id, centroid). */
  def kmeansCentroids(e: DataFrame, k: Int = 10, iters: Int = 3): DataFrame = {
    val base = e.select(col("vec_id"), col("embedding"))
    var cents = {
      val seeds = base.withColumn("h", xxhash64(col("vec_id"))).orderBy(col("h")).limit(k)
      // k rows: the single-partition window is trivially cheap here
      Tables.shared(seeds.withColumn("list_id",
          (row_number().over(Window.orderBy(col("h"))) - 1).cast("int"))
        .select(col("list_id"), col("embedding").as("centroid")), eager = true)
    }
    (1 to iters).foreach { _ =>
      cents = assignLists(base, cents)
        .select(col("list_id"), posexplode(col("embedding")))
        .groupBy(col("list_id"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("list_id"))
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("ps"))
      cents = Tables.shared(cents
        .select(col("list_id"),
          transform(col("ps"), p => p.getField("m").cast("float")).as("centroid")),
        eager = true)
    }
    cents
  }

  /** Nearest-centroid assignment by cosine: broadcast join against the k
    * centroids, then an argmax per vector via map-side-combining `max_by`
    * (the shuffle moves ONE row per vector, not k). Ties break to the
    * larger list id deterministically. Keeps every payload column of `e`. */
  def assignLists(e: DataFrame, cents: DataFrame): DataFrame = {
    val payload = e.columns.filterNot(_ == "vec_id")
    val scored = e.join(broadcast(cents.select(col("list_id"), col("centroid"))))
      .withColumn("csim", VectorMath.cosineRaw(col("embedding"), col("centroid")))
    val aggs = max_by(col("list_id"), struct(col("csim"), col("list_id"))).as("list_id") +:
      payload.map(c => first(col(c)).as(c))
    scored.groupBy(col("vec_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** ANN top-k: probes rank the k-means centroids, visit only the `nprobe`
    * nearest inverted lists, exact-rescore candidates. Same output shape
    * as [[exactTopK]] (recall measured in the spec — on planted clusters
    * and on the adversarially-uniform fixture). */
  def ivfTopK(s: SparkSession, dir: String, nprobe: Int = 3, nlists: Int = 10): DataFrame = {
    val raw = emb(s, dir).select(col("vec_id"), col("embedding"))
    ivfTopKWith(raw, kmeansCentroids(raw, nlists), nprobe)
  }

  private[operators] def ivfTopKWith(
      raw: DataFrame, cents: DataFrame, nprobe: Int,
      probeIds: Seq[Long] = ProbeIds): DataFrame = {
    val e = assignLists(raw, cents)
      .select(col("vec_id"), col("list_id"), VectorMath.quantize(col("embedding")).as("qv"))
      .withColumn("nq", VectorMath.normSq(col("qv")))
    val qcents = cents
      .withColumn("cq", VectorMath.quantize(col("centroid")))
      .withColumn("cn", VectorMath.normSq(col("cq")))
      .select(col("list_id").as("c_list"), col("cq"), col("cn"))
    val p = e.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("probe_id"), col("qv").as("pqv"), col("nq").as("pnq"))
    // probe × centroid ranking (tiny): pick nprobe lists per probe
    val listRank = Window.partitionBy(col("probe_id"))
      .orderBy(col("csim").desc, col("c_list"))
    val lists = p.join(broadcast(qcents))
      .withColumn("csim",
        VectorMath.cosineFromParts(
          VectorMath.dot(col("pqv"), col("cq")), col("pnq"), col("cn")))
      .withColumn("r", row_number().over(listRank))
      .filter(col("r") <= nprobe)
      .select(col("probe_id"), col("pqv"), col("pnq"), col("c_list"))
    // candidates = members of the selected lists only (equi-join on list id)
    val scored = e.join(broadcast(lists), e("list_id") === lists("c_list"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("sim",
        VectorMath.cosineFromParts(
          VectorMath.dot(col("qv"), col("pqv")), col("nq"), col("pnq")))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("probe_id"), col("rank"), col("vec_id"), col("sim"))
  }

  // -------------------------------------------------- product quantization

  /** PRODUCT-QUANTIZATION codebook (Jégou/Douze/Schmid, "Product
    * quantization for nearest neighbor search", TPAMI 2011): an
    * independent ksub-codeword k-means per subspace.
    *
    * Training runs ENTIRELY ON THE DRIVER over a BOUNDED deterministic
    * sample (hash thinning to `trainCap` rows — the same O(1)-in-corpus
    * pattern as the prefix-join's rank dictionary): Lloyd assignment
    * costs rows × m × ksub distance evaluations per iteration and
    * codebook quality saturates long before the full corpus, so at
    * 100 TB training on everything would dominate the pipeline — while
    * 2k × 64 floats iterate in microseconds locally. Running the
    * iterations as cluster jobs only bought ~10 scheduling-bound stages
    * per build. trainCap≈2k keeps >= 64 training rows per codeword at
    * ksub=32. ENCODING ([[pqEncode]]) still covers every vector,
    * distributed. Seeded deterministic init (smallest xxhash64 of
    * (vec_id, sub)); empty codewords drop out; ties assign the smaller
    * code. Returns (sub, code, centroid). */
  def pqCodebook(e: DataFrame, m: Int = 8, ksub: Int = 16, iters: Int = 12,
      dim: Int = 64, trainCap: Int = 2048): DataFrame =
    pqCodebookFromSample(e.sparkSession, trainSample(e, trainCap), m, ksub, iters, dim)

  /** The deterministic bounded training sample in ONE corpus pass: the
    * trainCap smallest rows by (xxhash64(vec_id), vec_id) — TakeOrdered
    * keeps trainCap candidates per partition and merges, no count()
    * pre-pass over the corpus and exactly trainCap rows at any corpus
    * size. Split out so a composition training TWO codebooks over the
    * same corpus ([[ivfPqTopKOn]]: the coarse quantizer and the PQ
    * codebook) collects it ONCE — at 100 TB each TakeOrdered is a full
    * corpus pass, and the sample is identical by determinism anyway. */
  private def trainSample(e: DataFrame, trainCap: Int): Array[(Long, Array[Float])] = {
    val spark = e.sparkSession
    val base = e.select(col("vec_id"), col("embedding"))
    val train = base.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(trainCap)
    import spark.implicits._
    train.as[(Long, Array[Float])].collect()
  }

  /** Training sample AND probe vectors in ONE collect job (r21): every
    * PQ/IVF-PQ build needs both, and each was a separate full-corpus
    * action (TakeOrdered pass + filtered scan) — a union of the two
    * bounded row sets collects them together, halving the driver jobs a
    * q77/q123 run pays before any corpus work starts. Row order inside
    * the sample is the TakeOrdered sort order, exactly as before (union
    * preserves branch order), so the Lloyd fold sees the identical
    * sequence and the codebook stays bit-identical. */
  private def trainSampleAndProbes(s: SparkSession, e: DataFrame, trainCap: Int)
      : (Array[(Long, Array[Float])], Array[(Long, Seq[Float])]) = {
    val base = e.select(col("vec_id"), col("embedding"))
    val sampleDf = base.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(trainCap)
      .select(lit(0).as("grp"), col("vec_id"), col("embedding"))
    val probesDf = base.filter(col("vec_id").isin(ProbeIds: _*))
      .select(lit(1).as("grp"), col("vec_id"), col("embedding"))
    import s.implicits._
    val rows = sampleDf.unionAll(probesDf).as[(Int, Long, Array[Float])].collect()
    (rows.collect { case (0, id, v) => (id, v) },
      rows.collect { case (1, id, v) => (id, v.toSeq) })
  }

  /** [[pqCodebook]]'s driver-side training over an already-collected
    * sample — bit-identical output (same seeding, same Lloyd loop). */
  private def pqCodebookFromSample(spark: SparkSession,
      sample: Array[(Long, Array[Float])], m: Int, ksub: Int, iters: Int = 12,
      dim: Int = 64): DataFrame = {
    val dsub = dim / m
    val rows = (0 until m).flatMap { sub =>
      val subvecs: Array[(Long, Array[Float])] =
        sample.map { case (id, v) => (id, v.slice(sub * dsub, (sub + 1) * dsub)) }
      // deterministic FARTHEST-POINT seeding (the k-means++ maxmin idea
      // without randomness): start from the smallest-hash vector, then
      // greedily add the sample point farthest from its nearest chosen
      // seed — spreads codewords over the subspace far better than
      // hash-random picks, and the driver pays microseconds for it
      var cents: Array[Array[Double]] = {
        val pts = subvecs.map(_._2.map(_.toDouble))
        if (pts.isEmpty) Array.empty
        else {
          val first = subvecs.zipWithIndex.minBy { case ((id, _), _) =>
            (org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(id, 42L + sub), id)
          }._2
          val chosen = scala.collection.mutable.ArrayBuffer(first)
          val minD = Array.fill(pts.length)(Double.MaxValue)
          def relax(cIdx: Int): Unit = {
            var i = 0
            while (i < pts.length) {
              var d = 0.0; var j = 0
              while (j < dsub) { val x = pts(i)(j) - pts(cIdx)(j); d += x * x; j += 1 }
              if (d < minD(i)) minD(i) = d
              i += 1
            }
          }
          relax(first)
          var spread = true
          while (spread && chosen.length < math.min(ksub, pts.length)) {
            var best = -1; var bestD = -1.0
            var i = 0
            while (i < pts.length) {
              if (minD(i) > bestD) { bestD = minD(i); best = i }
              i += 1
            }
            // every remaining point coincides with a chosen seed: stop —
            // fewer distinct codewords than ksub is the honest codebook
            if (bestD <= 0.0) spread = false
            else { chosen += best; relax(best) }
          }
          chosen.map(pts(_)).toArray
        }
      }
      (1 to iters).foreach { _ =>
        val sums = Array.fill(cents.length)(new Array[Double](dsub))
        val counts = new Array[Long](cents.length)
        subvecs.foreach { case (_, v) =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cents.length) {
            var d = 0.0; var i = 0
            while (i < dsub) { val x = v(i) - cents(c)(i); d += x * x; i += 1 }
            if (d < bestD) { bestD = d; best = c } // strict: ties keep smaller code
            c += 1
          }
          counts(best) += 1
          var i = 0
          while (i < dsub) { sums(best)(i) += v(i); i += 1 }
        }
        cents = cents.indices.collect {
          case c if counts(c) > 0 =>
            Array.tabulate(dsub)(i => sums(c)(i) / counts(c))
        }.toArray
      }
      cents.zipWithIndex.map { case (cent, code) =>
        (sub, code, cent.map(_.toFloat).toSeq)
      }
    }
    import spark.implicits._
    rows.toDF("sub", "code", "centroid")
  }

  /** Encode each vector as m codebook indices — 8 small ints instead of
    * 64 floats (a 32× memory cut: THE reason PQ is the 100 TB ANN path;
    * the raw embedding column never needs to be resident for scoring).
    * `anq` carries the reconstruction's squared norm (sum of assigned
    * codeword norms) for approximate cosine.
    *
    * Encoding is a PURE PROJECTION: the codebook (m × ksub rows) collapses
    * into per-subspace array LITERALS, each subspace's argmin runs
    * in-place over its slice (native `graft_l2sq` inner loop), and the
    * codeword norms fold from a literal lookup — no subvector explode, no
    * join, no regroup. One map-only pass at any corpus size (the former
    * shape shuffled rows × m through an assignment join and a
    * reassembly aggregation). Returns (vec_id, codes, anq). */
  def pqEncode(e: DataFrame, cb: DataFrame, m: Int = 8, dim: Int = 64,
      keep: Seq[String] = Nil): DataFrame = {
    val dsub = dim / m
    // the codebook is tiny by construction (m × ksub); collapse it to
    // driver literals once
    val local = collectCodebook(cb)
    // squared codeword norms, driver-computed with the kernel's float
    // multiply + double accumulate
    val norms: Map[Int, Seq[Double]] = local.map { case (sub, cs) =>
      sub -> cs.map { case (_, cent) =>
        cent.foldLeft(0.0)((acc, x) => acc + (x * x).toDouble)
      }
    }
    def anqOf(codes: Column): Column =
      (0 until m).map(sub =>
        element_at(typedlit(norms.getOrElse(sub, Seq.empty)), col("codes")(sub) + 1))
        .reduce(_ + _)
    e.select((col("vec_id") +: keep.map(col)) :+ col("embedding"): _*)
      .withColumn("codes", pqCodesCol(local, m, dsub))
      .select((col("vec_id") +: keep.map(col)) ++
        Seq(col("codes"), anqOf(col("codes")).as("anq")): _*)
  }

  private def collectCodebook(cb: DataFrame): Map[Int, Seq[(Int, Seq[Float])]] = cb
    .select(col("sub"), col("code"), col("centroid"))
    .collect()
    .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
    .groupBy(_._1)
    .map { case (sub, rs) => sub -> rs.sortBy(_._2).map(t => (t._2, t._3)).toSeq }

  /** The per-row codes column over `embedding`: argmin-L2 codeword per
    * subspace. NATIVE `graft_pq_argmins` kernel when the session has
    * GraftExtensions (one compiled loop — the HOF form re-enters the
    * interpreted evaluator once per codeword and measured ~72% of the
    * whole PQ query at 10× scale); the pure-functions composition
    * otherwise — bit-identical by construction and spec (`forceHof` lets
    * the parity spec pin exactly that). */
  private[operators] def pqCodesCol(local: Map[Int, Seq[(Int, Seq[Float])]],
      m: Int, dsub: Int, forceHof: Boolean = false): Column = {
    def codeOf(sub: Int): Column = {
      val cands = typedlit(local.getOrElse(sub, Seq.empty))
      val sv = slice(col("embedding"), sub * dsub + 1, dsub)
      // score every codeword once, pick (min d2, min code) — same
      // argmin/tie semantics as array_min over (d2, code) structs
      array_min(transform(cands, c => struct(
        VectorMath.l2Sq(sv, c.getField("_2")).as("d2"),
        c.getField("_1").as("code")))).getField("code")
    }
    val hof = array((0 until m).map(codeOf): _*)
    if (forceHof) hof
    else {
      // codes are reindexed contiguous per sub (empty codewords dropped at
      // training), so the flat layout's position IS the code. That
      // invariant is what the kernel's flat layout stands on — an
      // arbitrary caller-supplied codebook with gaps or reordered codes
      // would silently diverge from the HOF form the kernel claims
      // bit-parity with (ADVICE r15 #2), so fail loudly instead.
      (0 until m).foreach { sub =>
        val codes = local.getOrElse(sub, Nil).map(_._1)
        require(codes == (0 until codes.size),
          s"pqCodesCol: sub $sub codes ${codes.take(8)}… are not contiguous 0..${codes.size - 1} " +
            "— the native flat layout requires position-is-code (pqCodebook output shape)")
      }
      val flat: Seq[Float] =
        (0 until m).flatMap(sub => local.getOrElse(sub, Nil).flatMap(_._2))
      val lens: Seq[Int] = (0 until m).map(sub => local.getOrElse(sub, Nil).size)
      graft.plans.GraftExtensions.nativeCall(graft.plans.GraftExtensions.PqArgminsName,
        col("embedding"), typedlit(flat), typedlit(lens), lit(dsub))(hof)
    }
  }

  /** q77 — PQ ANN top-k with ASYMMETRIC DISTANCE COMPUTATION: each probe
    * precomputes dot(probe_sub, codeword) for all m×ksub codewords (one
    * small lookup map, broadcast), so scoring a candidate is m map lookups
    * over its codes — the raw vectors never participate. The ADC top
    * `rerank` shortlist is then exactly re-scored (quantized, bit-parity
    * with q39's math) and cut to top-k. Same output shape as [[exactTopK]];
    * recall vs the exact baseline is spec-asserted. */
  def pqTopK(s: SparkSession, dir: String, m: Int = 8, ksub: Int = 32,
      rerank: Int = 150, dim: Int = 64): DataFrame =
    pqTopKOn(s, emb(s, dir).select(col("vec_id"), col("embedding")), m, ksub, rerank, dim)

  /** [[pqTopK]] over any (vec_id, embedding) corpus — split out so the
    * planted-duplicate oracle query (q93) and specs can supply corpora. */
  /** Diagnostic construct-phase timing (stderr), enabled by
    * SPARK_GRAFT_PROBE_TIMING — never part of the driver contract. */
  private def timed[A](label: String)(body: => A): A =
    if (sys.env.contains("SPARK_GRAFT_PROBE_TIMING")) {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[vec-timing] $label ${(System.nanoTime() - t0) / 1e6}%.0f ms")
      r
    } else body

  def pqTopKOn(s: SparkSession, raw: DataFrame, m: Int = 8, ksub: Int = 32,
      rerank: Int = 150, dim: Int = 64): DataFrame = {
    // one fused collect for the bounded sample + probes (see
    // trainSampleAndProbes) — identical codebook, half the driver jobs
    val (sample, probesLocal) = timed("collect")(trainSampleAndProbes(s, raw, 2048))
    val cb = timed("lloyd")(pqCodebookFromSample(s, sample, m, ksub, dim = dim))
    val encoded = timed("encode-plan")(pqEncode(raw, cb, m, dim))
    val cands = timed("cands-plan")(
      encoded.join(broadcast(adcProbes(s, probesLocal, cb, m, ksub, dim)))
        .filter(col("vec_id") =!= col("probe_id")))
    timed("rerank-plan")(adcRerankTopK(s, raw, cands, m, ksub, rerank, probesLocal))
  }

  /** Per-probe ADC lookup tables computed ON THE DRIVER (the FAISS shape:
    * the codebook is already driver-resident from training, probes are
    * the bounded query-side input — m·ksub dots per probe are
    * microseconds, where the former DataFrame build paid a
    * shuffle-bearing job before the corpus work even started). Each table
    * is a DENSE array indexed by slot (sub·ksub + code, 1-based):
    * element_at on an array is O(1) where a map column is a linear scan
    * of all m·ksub entries, and the scoring loop runs once per
    * (candidate, probe). Dropped (empty) codewords stay 0.0 — no
    * candidate's codes reference them. Float multiply + double accumulate
    * matches the graft_dot kernel. Returns (probe_id, pnq, tbl). */
  private def adcProbes(s: SparkSession, probesLocal: Array[(Long, Seq[Float])],
      cb: DataFrame, m: Int, ksub: Int, dim: Int): DataFrame = {
    val dsub = dim / m
    val cbLocal: Array[(Int, Int, Seq[Float])] =
      cb.collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
    import s.implicits._
    probesLocal.toSeq.map { case (pid, v) =>
      val arr = new Array[Double](m * ksub)
      cbLocal.foreach { case (sub, code, cent) =>
        var d = 0.0
        var i = 0
        while (i < cent.length) { d += (v(sub * dsub + i) * cent(i)).toDouble; i += 1 }
        arr(sub * ksub + code) = d
      }
      var nq = 0.0
      v.foreach(x => nq += (x * x).toDouble)
      (pid, nq, arr.toSeq)
    }.toDF("probe_id", "pnq", "tbl")
  }

  private def collectProbes(s: SparkSession, raw: DataFrame): Array[(Long, Seq[Float])] = {
    import s.implicits._
    raw.filter(col("vec_id").isin(ProbeIds: _*))
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
  }

  /** ADC-score joined candidates, cut the per-probe top-`rerank`
    * shortlist, exactly re-rank it — the shared tail of [[pqTopKOn]] and
    * [[ivfPqTopKOn]]. `cands` carries (vec_id, codes, anq, probe_id, pnq,
    * tbl) rows: every candidate already paired with each probe it scores
    * against. */
  private def adcRerankTopK(s: SparkSession, raw: DataFrame, cands: DataFrame,
      m: Int, ksub: Int, rerank: Int,
      probesLocal: Array[(Long, Seq[Float])]): DataFrame = {
    // candidate scoring: m STATICALLY-UNROLLED O(1) array lookups per
    // (candidate, probe) — no per-row array allocation, stays inside
    // whole-stage codegen
    val scored = cands
      .withColumn("adc",
        (0 until m).map(i =>
          element_at(col("tbl"), col("codes")(i) + lit(i * ksub + 1))).reduce(_ + _))
      .withColumn("approx", col("adc") / sqrt(col("anq") * col("pnq")))
    val wa = Window.partitionBy(col("probe_id")).orderBy(col("approx").desc, col("vec_id"))
    val shortlist = scored
      .withColumn("r", row_number().over(wa)).filter(col("r") <= rerank)
      .select(col("probe_id"), col("vec_id"))
    // exact re-rank of the shortlist only (the standard PQ refine step) —
    // quantized from the SAME corpus df, so planted rows rescore too.
    // The shortlist is the BROADCAST build side (probes × rerank skinny
    // rows — bounded by construction) and the quantized corpus STREAMS
    // map-side: the former `shortlist.join(eq)` shape let the planner
    // shuffle the corpus (qv is ~64 floats/row, and eq outgrows the
    // broadcast gate with the corpus — measured 72 MB at the 100× scale
    // point, the whole super-linear term of the family's exchange).
    // With the corpus streaming, the family's only data-bearing exchange
    // is the shortlist window above — skinny rows ∝ corpus — so the
    // declared shuffle law is LINEAR (VERDICT r15 #1).
    val eq = raw.select(col("vec_id"), VectorMath.quantize(col("embedding")).as("qv"))
      .withColumn("nq", VectorMath.normSq(col("qv")))
    // probe side built from the ALREADY-COLLECTED probe vectors (r21): the
    // former filtered-scan shape re-read the whole corpus for 3 rows — a
    // full pass at 100 TB and an extra broadcast stage locally. Quantize +
    // norm mirror TYPE as well as value (ADVICE r21): Spark's floor emits
    // LONG, so pqv/pnq are bigint like VectorMath.quantize/normSq on the
    // corpus side — the rescore dot runs in the same long×long arithmetic
    // as q39 structurally, not just while |x|·1e6 happens to stay an exact
    // double (and a NaN component coerces to 0L here exactly as Spark's
    // floor does, instead of propagating a NaN the engine path never sees).
    val pq = {
      import s.implicits._
      probesLocal.toSeq.map { case (pid, v) =>
        val qv = v.map(x => math.floor(x.toDouble * 1e6).toLong)
        var nq = 0L
        qv.foreach(q => nq += q * q)
        (pid, qv, nq)
      }.toDF("probe_id", "pqv", "pnq")
    }
    val rescored = eq
      .join(broadcast(shortlist), "vec_id")
      .join(broadcast(pq), "probe_id")
      .withColumn("sim",
        VectorMath.cosineFromParts(
          VectorMath.dot(col("qv"), col("pqv")), col("nq"), col("pnq")))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("vec_id"))
    rescored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("probe_id"), col("rank"), col("vec_id"), col("sim"))
  }

  // ------------------------------------------------------------------ IVF-PQ

  /** q123/scale — IVF-PQ ANN top-k (Jégou'11 §V: the inverted-file coarse
    * quantizer composed with PQ residual-free ADC): the SCALE path that
    * keeps the O(N) term a cheap map-only scan.
    *
    *  - COARSE stage: an nlists-codeword full-dimension codebook from the
    *    same driver-trained bounded-sample k-means as PQ ([[pqCodebook]]
    *    with m = 1); every corpus vector is assigned to its nearest
    *    centroid by a PURE PROJECTION over centroid literals (the
    *    [[pqEncode]] idiom — no join, no shuffle; the former
    *    [[assignLists]] shape shuffled one row per vector through a
    *    groupBy argmax, which at corpus scale ships the embeddings).
    *  - PROBE stage: probes rank the nlists centroids ON THE DRIVER with
    *    the kernel's exact float-multiply/double-accumulate L2, visiting
    *    the nprobe nearest lists — so a probe's own argmin list (where an
    *    identical vector provably lands) is always visited first, which
    *    is what makes the planted rank-1 oracle (q123) deterministic.
    *  - PQ stage: encode + ADC + shortlist + exact re-rank run ONLY over
    *    members of visited lists — candidates shrink to ~nprobe/nlists
    *    of the corpus per probe while the full-corpus work is one argmin
    *    projection.
    *
    * Defaults visit 10 of 16 lists: the fixture is adversarially UNIFORM
    * (no cluster structure, organic cosine ≤ 0.6), the worst case for any
    * IVF index — a probe's true neighbors concentrate only mildly around
    * its centroid, so recall tracks the visited fraction plus that
    * concentration (measured: 0.77 at 8/16, 0.93 at 10/16 on the 10×
    * corpus, re-asserted per scale run by ScaleBench); on clustered data
    * (where ANN is actually deployed) the same composition prunes far
    * deeper at equal recall (the q71 spec's planted-cluster result). */
  def ivfPqTopK(s: SparkSession, dir: String, nlists: Int = 16, nprobe: Int = 10,
      m: Int = 8, ksub: Int = 32, rerank: Int = 150, dim: Int = 64): DataFrame =
    ivfPqTopKOn(s, emb(s, dir).select(col("vec_id"), col("embedding")),
      nlists, nprobe, m, ksub, rerank, dim)

  def ivfPqTopKOn(s: SparkSession, raw: DataFrame, nlists: Int = 16, nprobe: Int = 10,
      m: Int = 8, ksub: Int = 32, rerank: Int = 150, dim: Int = 64): DataFrame = {
    // ONE corpus pass trains BOTH codebooks (the sample is identical by
    // determinism) and ONE filtered scan collects the probes for both
    // the driver-side list ranking and the ADC tables — the former shape
    // paid two TakeOrdered passes and two probe scans per build, real
    // money at 100 TB
    val (sample, probesLocal) = trainSampleAndProbes(s, raw, 2048)
    val coarseLocal = collectCodebook(
      pqCodebookFromSample(s, sample, m = 1, ksub = nlists, dim = dim))
    val cents: Seq[(Int, Seq[Float])] = coarseLocal.getOrElse(0, Nil)
    // driver-side probe→list ranking, bit-matching the kernel's l2Sq
    // (per-term FLOAT subtract/multiply, DOUBLE accumulate) so the
    // distributed argmin below and this ranking can never disagree on a
    // probe's own nearest list; ties break to the smaller code like
    // array_min over (d2, code) structs
    def l2(v: Seq[Float], c: Seq[Float]): Double = {
      var d = 0.0
      var i = 0
      while (i < c.length) { val t = v(i) - c(i); d += (t * t).toDouble; i += 1 }
      d
    }
    val visited: Seq[(Long, Int)] = probesLocal.toSeq.flatMap { case (pid, v) =>
      cents.sortBy { case (code, cent) => (l2(v, cent), code) }
        .take(nprobe).map { case (code, _) => (pid, code) }
    }
    val allVisited = visited.map(_._2).distinct.sorted
    // map-only nearest-centroid assignment (the PQ codes kernel at m = 1,
    // full dimension), then prune to visited lists BEFORE any PQ work: the
    // non-candidate majority costs one argmin pass and a literal IN
    // filter, never an encode
    val pruned = raw.select(col("vec_id"), col("embedding"))
      .withColumn("list_id", pqCodesCol(coarseLocal, 1, dim).getItem(0))
      .filter(col("list_id").isin(allVisited: _*))
    val cb = pqCodebookFromSample(s, sample, m, ksub, dim = dim)
    val encoded = pqEncode(pruned, cb, m, dim, keep = Seq("list_id"))
    // (probe_id, c_list) × ADC tables — both tiny, broadcast as one
    val probeLists = {
      import s.implicits._
      visited.toDF("probe_id", "c_list")
    }
    val probes = adcProbes(s, probesLocal, cb, m, ksub, dim).join(probeLists, "probe_id")
    val cands = encoded
      .join(broadcast(probes), col("list_id") === col("c_list"))
      .filter(col("vec_id") =!= col("probe_id"))
      .drop("list_id", "c_list")
    adcRerankTopK(s, raw, cands, m, ksub, rerank, probesLocal)
  }

  /** Embedding near-dup pairs at `minSim`, MULTI-BAND SRP-LSH: vectors
    * meet only inside a shared (band, code) bucket — candidates collide in
    * ANY of `bands` independent `bits`-wide sign-random-projection codes —
    * then exact cosine verifies. Same shape as the MinHash pipeline
    * ([[DedupOps.lshCandidates]]): codes computed ONCE per row, posexplode
    * to (band, code), bucket groupBy, in-bucket pair expansion, distinct.
    * No join in the plan at all.
    *
    * Tuning (standard banding trade-off): recall for a cos-θ pair is
    * 1-(1-a^bits)^bands with a = 1-θ/π — defaults give ≈0.94 at sim 0.9
    * and ≈0.999 at sim 0.95 — while per-band buckets hold ~N/2^bits random
    * vectors; grow `bits` with the corpus (collision mass) and `bands` to
    * buy recall back. Spec-validated on planted dups; the fixture holds no
    * organic pairs above 0.7. */
  def lshNeardupPairs(s: SparkSession, dir: String, minSim: Double = 0.9,
      df: Option[DataFrame] = None, bands: Int = 8, bits: Int = 8): DataFrame = {
    val base = df.getOrElse(emb(s, dir))
    // ONE traversal computes all bands*bits projection sums; the sums land
    // as a materialized column so the per-band code fold references them
    // for free (an inline expression would re-project once per band).
    // The (band, code) fan-out explodes a CONSTANT band range rather than
    // a per-row codes array: exploding the array makes Catalyst infer a
    // `size(codes) > 0` filter and push it below the sums projection,
    // substituting the sums DEFINITION into the per-bit fold — the whole
    // O(bands·bits·dim) signature re-evaluated once per bit in an
    // interpreted HOF (measured 67 s vs <2 s at sf0.1). The constant
    // range's inferred filter constant-folds away, and each exploded row
    // folds its one band's code from the materialized sums attribute.
    val e = base.select(
      col("vec_id"),
      VectorMath.quantize(col("embedding")).as("qv"),
      VectorMath.srpSums(col("embedding"), bands * bits).as("sums"))
      .withColumn("nq", VectorMath.normSq(col("qv")))
    e.select(col("vec_id"), col("qv"), col("nq"), col("sums"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("vec_id"), col("qv"), col("nq"), col("band"),
        VectorMath.srpBandCode(col("sums"), col("band"), bits).as("code"))
      .groupBy(col("band"), col("code"))
      .agg(sort_array(collect_list(struct(col("vec_id"), col("qv"), col("nq")))).as("ms"))
      .filter(size(col("ms")) > 1)
      .select(explode(DedupOps.bucketPairs(col("ms")) { (x, y) =>
        struct(
          x.getField("vec_id").as("vec_i"),
          y.getField("vec_id").as("vec_j"),
          VectorMath.cosineFromParts(
            VectorMath.dot(x.getField("qv"), y.getField("qv")),
            x.getField("nq"), y.getField("nq")).as("sim"))
      }).as("p"))
      .filter(col("p.sim") >= minSim)
      .select(col("p.vec_i").as("vec_i"), col("p.vec_j").as("vec_j"), col("p.sim").as("sim"))
      .distinct() // a pair may collide in several bands
  }

  /** q69 — embedding-cosine near-dup pairs, EXACT: every (i < j) pair at
    * `minSim` or above, scored on quantized vectors so the oracle matches
    * bit-for-bit. This is the VERIFICATION BASELINE of the cosine-dedup
    * family — an upper-triangle all-pairs comparison (broadcast
    * nested-loop; O(N²) by definition) that exists to pin down the exact
    * answer the sub-quadratic scale path ([[lshNeardupPairs]], bucketed
    * SRP-LSH, no join at all) is measured against — the same exact/LSH
    * split as q68 vs q38 on the text side. The fixture's organic pair
    * similarities top out near 0.5 (no planted vector dups), so the
    * near-dup threshold here is 0.45. */
  val NeardupMinSim = 0.45
  val exactCosinePairs: (SparkSession, String) => DataFrame = (s, dir) =>
    exactCosinePairsOn(emb(s, dir), NeardupMinSim)

  def exactCosinePairsOn(base: DataFrame, minSim: Double): DataFrame = {
    val e = base
      .select(col("vec_id"), VectorMath.quantize(col("embedding")).as("qv"))
      .withColumn("nq", VectorMath.normSq(col("qv")))
    val a = e.select(col("vec_id").as("vec_i"), col("qv").as("qi"), col("nq").as("ni"))
    val b = e.select(col("vec_id").as("vec_j"), col("qv").as("qj"), col("nq").as("nj"))
    a.join(b, col("vec_i") < col("vec_j"))
      .withColumn("sim",
        VectorMath.cosineFromParts(VectorMath.dot(col("qi"), col("qj")), col("ni"), col("nj")))
      .filter(col("sim") >= lit(minSim))
      .select(col("vec_i"), col("vec_j"), col("sim"))
  }

  private val quantCte =
    """WITH e AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1e6)) qv
      |  FROM embeddings
      |), n AS (
      |  SELECT vec_id, label, qv, list_dot_product(qv, qv) nq FROM e
      |), p AS (
      |  SELECT vec_id AS probe_id, qv AS pqv, nq AS pnq FROM n
      |  WHERE vec_id IN (0, 123, 321)
      |)""".stripMargin

  /** q91 — SRP-LSH embedding near-dup pairs, oracle-checked END TO END.
    * The fixture holds no organic pairs near the dup band (measured
    * organic max cosine, r11: 0.479 at sf0.001, 0.513 at sf0.01, 0.601 at
    * sf0.1 — the margin below the 0.9 cut grows as sf shrinks), so the
    * query PLANTS exact duplicates — every
    * `vec_id % 5 == 0` vector re-enters under `vec_id + PlantOffset` —
    * and runs the sub-quadratic banded pipeline ([[lshNeardupPairs]]: no
    * join in the plan, codes → band buckets → in-bucket pairs → exact
    * cosine verify) at minSim 0.9. Identical vectors produce identical
    * sign-random-projection codes, so every planted pair collides in
    * every band BY CONSTRUCTION — recall 1 deterministically, not
    * probabilistically — while organic pairs sit ≥0.29 below the
    * threshold. The surviving pair set is therefore exactly the planted
    * set, plain-SQL-expressible, and the whole LSH path hash-checks
    * against DuckDB (the q71/q77 family's first fully oracle-checked
    * member; recall on NON-identical planted neighbors stays
    * spec-asserted, VectorOpsSpec).
    *
    * Robust against fixture regeneration: degenerate vectors (null
    * embedding, null element, all-zero after quantization — whose cosine
    * is null/NaN and would diverge cross-engine, Spark ordering NaN >=
    * 0.9 as true) are filtered out of BOTH the pipeline input and the
    * oracle with the same predicate, and the plant offset sits far above
    * any plausible organic vec_id so planted ids can never collide. */
  val PlantOffset = 1000000000000L
  val lshNeardup: (SparkSession, String) => DataFrame = (s, dir) =>
    lshNeardupPlanted(s, dir, bits = 8)

  /** [[lshNeardup]] with the band WIDTH as a parameter — the documented
    * scale knob (see [[lshNeardupPairs]]: buckets hold ~N/2^bits vectors,
    * so `bits` grows with the corpus to keep in-bucket pair expansion
    * linear). Planted recall stays exactly 1 at ANY width — identical
    * vectors carry identical codes in every band — which is what lets
    * ScaleBench grow `bits` per scale point while the ground-truth pair
    * count stays exactly linear. */
  def lshNeardupPlanted(s: SparkSession, dir: String, bits: Int): DataFrame = {
    val base = emb(s, dir).select(col("vec_id"), col("embedding"))
      .filter(col("embedding").isNotNull &&
        VectorMath.normSq(VectorMath.quantize(col("embedding"))) > 0)
    val planted = base.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + PlantOffset).as("vec_id"), col("embedding"))
    lshNeardupPairs(s, dir, minSim = 0.9, df = Some(base.unionByName(planted)),
      bands = 8, bits = bits)
  }

  /** Corpus with an exact duplicate of each PROBE vector planted under
    * `probe_id + PlantOffset` — the q92/q93 oracle input. Degenerate
    * vectors (null / quantized-zero, whose cosine is null or NaN — and
    * Spark sorts NaN ABOVE every real sim, so one would steal rank 1) are
    * filtered with the same predicate the oracle applies. */
  private def probePlantedCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = emb(s, dir).select(col("vec_id"), col("embedding"))
      .filter(col("embedding").isNotNull &&
        VectorMath.normSq(VectorMath.quantize(col("embedding"))) > 0)
    val dups = base.filter(col("vec_id").isin(ProbeIds: _*))
      .select((col("vec_id") + PlantOffset).as("vec_id"), col("embedding"))
    base.unionByName(dups)
  }

  /** Corpus planting K (=10) exact duplicates of each probe under
    * `probe_id + j * PlantOffset`, j = 1..K — the FULL-top-k oracle
    * input (q128/q129): every duplicate carries the probe's exact vector,
    * so each scores the maximal sim and the rank window's deterministic
    * (sim DESC, vec_id ASC) tie-break orders the K duplicates by
    * ascending id — rank j IS `probe_id + j * PlantOffset`, closed-form.
    * Ids are distinct across probes (probe ids are tiny vs the offset)
    * and cannot collide with organic ids. */
  private def probePlantedKCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = emb(s, dir).select(col("vec_id"), col("embedding"))
      .filter(col("embedding").isNotNull &&
        VectorMath.normSq(VectorMath.quantize(col("embedding"))) > 0)
    val dups = base.filter(col("vec_id").isin(ProbeIds: _*))
      .withColumn("j", explode(lit((1 to K).toArray)))
      .select((col("vec_id") + col("j") * PlantOffset).as("vec_id"), col("embedding"))
    base.unionByName(dups)
  }

  /** q92 — the IVF ANN top-k's PARTIAL ORACLE via planted probe
    * duplicates: each probe's exact duplicate is (a) assigned to the
    * probe's own coarse list by construction (identical vector → identical
    * centroid ranking, ties break identically), which is always the
    * probe's rank-1 visited list, and (b) exactly rescored to the maximal
    * sim — so it MUST hold rank 1, deterministically. The rank-1 slice is
    * therefore plain-SQL-expressible (probe_id, 1, probe_id + offset,
    * nq/sqrt(nq·nq)) and hash-checks against DuckDB, while ranks 2..k stay
    * engine-internal (k-means-dependent) and remain covered by the recall
    * specs on q71 (VectorOpsSpec). Organic vectors top out ≈0.48–0.60
    * cosine — no organic row can outrank a planted duplicate, and the
    * fixture holds no exact probe duplicates that could tie it. */
  val ivfRank1: (SparkSession, String) => DataFrame = (s, dir) => {
    val planted = probePlantedCorpus(s, dir)
    ivfTopKWith(planted, kmeansCentroids(planted, 10), nprobe = 5)
      .filter(col("rank") === 1)
  }

  /** q93 — the PQ ANN top-k's PARTIAL ORACLE, same planted contract as
    * q92: the probe's duplicate carries the probe's own PQ codes, so its
    * ADC score is the table maximum (far above the ≤0.6-cosine organic
    * corpus, well inside the rerank=150 shortlist), and the exact refine
    * rescores it to the maximal sim → rank 1 deterministically.
    * (Margin for both: measured organic max cosine 0.479/0.513/0.601 at
    * sf0.001/0.01/0.1 — see the q91 scaladoc — vs the duplicate's ~1.0.) */
  val pqRank1: (SparkSession, String) => DataFrame = (s, dir) =>
    pqTopKOn(s, probePlantedCorpus(s, dir)).filter(col("rank") === 1)

  /** q123 — the IVF-PQ composition's PARTIAL ORACLE, the q92+q93 contracts
    * stacked: the probe's planted duplicate (a) lands in the probe's own
    * argmin coarse list (identical vector → bit-identical distributed
    * argmin), which the driver-side ranking provably visits first — so the
    * coarse PRUNE can never drop it; (b) carries the probe's own PQ codes
    * → maximal ADC → inside the shortlist; (c) exact-rescores to the
    * maximal sim → rank 1 deterministically. One hash-checked query pins
    * both stages of the composition at once. */
  val ivfPqRank1: (SparkSession, String) => DataFrame = (s, dir) =>
    ivfPqTopKOn(s, probePlantedCorpus(s, dir)).filter(col("rank") === 1)

  /** q128 — the IVF ANN top-k's FULL oracle (VERDICT r17 #7): on the
    * [[probePlantedKCorpus]] geometry EVERY one of the K result ranks is
    * provably exact, not just rank 1 — the K identical duplicates (a)
    * land in the probe's own argmin coarse list, always visited first,
    * so the prune keeps all of them; (b) exact-score to the maximal sim
    * (organic corpus tops out ≈0.48–0.60 cosine, see the q91 margins);
    * (c) fill ranks 1..K in ascending-id order under the window's
    * deterministic tie-break. DuckDB hash-checks all K ranks from the
    * closed form — the engine-internal k-means can shape the LISTS but
    * no longer any output row. q71 (the organic corpus, where ranks 2..k
    * are genuinely centroid-dependent) stays registered as the
    * production shape; its recall floor is spec-asserted. */
  val ivfFullTopK: (SparkSession, String) => DataFrame = (s, dir) => {
    val planted = probePlantedKCorpus(s, dir)
    ivfTopKWith(planted, kmeansCentroids(planted, 10), nprobe = 5)
  }

  /** q129 — the PQ ANN top-k's FULL oracle, same geometry as q128: the K
    * duplicates carry the probe's own PQ codes (maximal ADC, far inside
    * the rerank=150 shortlist regardless of tie order), the exact refine
    * rescores all K to the maximal sim, and the tie-break fixes the
    * permutation — all K output ranks are closed-form. */
  val pqFullTopK: (SparkSession, String) => DataFrame = (s, dir) =>
    pqTopKOn(s, probePlantedKCorpus(s, dir))

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q91_lsh_neardup_pairs", lshNeardup, bench = true, oracle = Some(
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1e6)) qv
         |  FROM embeddings WHERE vec_id % 5 = 0 AND embedding IS NOT NULL
         |), n AS (SELECT vec_id, qv, list_dot_product(qv, qv) nq FROM e)
         |SELECT vec_id AS vec_i, vec_id + $PlantOffset AS vec_j,
         |  list_dot_product(qv, qv) / sqrt(nq * nq) AS sim
         |FROM n WHERE nq > 0
         |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q39_exact_topk_cosine", exactTopK, bench = true, oracle = Some(
      quantCte +
        """
          |, s AS (
          |  SELECT probe_id, vec_id,
          |    list_dot_product(qv, pqv) / sqrt(nq * pnq) AS sim
          |  FROM n CROSS JOIN p WHERE vec_id <> probe_id
          |), r AS (
          |  SELECT probe_id,
          |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS INT) AS rank,
          |    vec_id, sim
          |  FROM s
          |)
          |SELECT probe_id, rank, vec_id, sim FROM r WHERE rank <= 10
          |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q69_exact_cosine_pairs", exactCosinePairs, oracle = Some(
      quantCte +
        """
          |, pr AS (
          |  SELECT a.vec_id AS vec_i, b.vec_id AS vec_j,
          |    list_dot_product(a.qv, b.qv) / sqrt(a.nq * b.nq) AS sim
          |  FROM n a JOIN n b ON a.vec_id < b.vec_id
          |)
          |SELECT vec_i, vec_j, sim FROM pr WHERE sim >= 0.45
          |ORDER BY ALL NULLS FIRST""".stripMargin)),
    // r19 (VERDICT r18 #5): q71/q77 re-pointed at the planted-K geometry
    // so the registry's ANN entries are ALL hash-checked — the organic
    // corpus (where ranks 2..k are genuinely k-means-dependent) carried
    // no assurance the planted twins don't, and its recall floors stay
    // spec-asserted (VectorOpsSpec) either way. They are NOT q128/q129
    // aliases: q71 runs the production nprobe=3 prune (the spec-gated
    // recall setting; q128 visits 5 lists) and q77 a rerank=60 shortlist
    // (q129 uses the default 150) — the planted closed form holds at ANY
    // nprobe ≥ 1 / shortlist ≥ K, so each pins a different prune
    // aggressiveness of the same pipeline.
    NamedQuery("q71_ivf_ann_topk", (s, dir) => {
      val planted = probePlantedKCorpus(s, dir)
      ivfTopKWith(planted, kmeansCentroids(planted, 10), nprobe = 3)
    }, oracle = Some(fullTopKOracleSql)),
    NamedQuery("q77_pq_ann_topk",
      (s, dir) => pqTopKOn(s, probePlantedKCorpus(s, dir), rerank = 60),
      bench = true, oracle = Some(fullTopKOracleSql)),
    NamedQuery("q92_ivf_rank1_planted", ivfRank1, oracle = Some(rank1OracleSql)),
    NamedQuery("q93_pq_rank1_planted", pqRank1, oracle = Some(rank1OracleSql)),
    NamedQuery("q123_ivfpq_rank1_planted", ivfPqRank1, oracle = Some(rank1OracleSql)),
    NamedQuery("q128_ivf_full_topk_planted", ivfFullTopK, oracle = Some(fullTopKOracleSql)),
    NamedQuery("q129_pq_full_topk_planted", pqFullTopK, oracle = Some(fullTopKOracleSql)),
  )

  /** Shared q92/q93 oracle: the planted duplicate must hold rank 1 with
    * the exact-rescore sim of identical quantized vectors — nq/sqrt(nq·nq)
    * on the SAME IEEE operands both engines compute (the q91 precedent).
    * The degeneracy filter matches [[probePlantedCorpus]]. */
  /** Shared q128/q129 oracle: ALL K ranks closed-form — rank j is the
    * probe's j-th planted duplicate (ascending id under the tie-break),
    * every row at the identical-vector sim nq/sqrt(nq·nq). */
  private def fullTopKOracleSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1e6)) qv
       |  FROM embeddings WHERE vec_id IN (0, 123, 321) AND embedding IS NOT NULL
       |), n AS (SELECT vec_id, qv, list_dot_product(qv, qv) nq FROM e),
       |j AS (SELECT UNNEST(range(1, ${K + 1})) AS j)
       |SELECT n.vec_id AS probe_id, CAST(j.j AS INT) AS rank,
       |  n.vec_id + j.j * $PlantOffset AS vec_id,
       |  nq / sqrt(nq * nq) AS sim
       |FROM n CROSS JOIN j WHERE nq > 0
       |ORDER BY ALL NULLS FIRST""".stripMargin

  private def rank1OracleSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1e6)) qv
       |  FROM embeddings WHERE vec_id IN (0, 123, 321) AND embedding IS NOT NULL
       |), n AS (SELECT vec_id, qv, list_dot_product(qv, qv) nq FROM e)
       |SELECT vec_id AS probe_id, CAST(1 AS INT) AS rank,
       |  vec_id + $PlantOffset AS vec_id,
       |  nq / sqrt(nq * nq) AS sim
       |FROM n WHERE nq > 0
       |ORDER BY ALL NULLS FIRST""".stripMargin
}
