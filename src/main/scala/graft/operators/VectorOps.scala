package graft.operators

import graft.{NamedQuery, Tables}
import graft.functions.VectorMath
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Per-list centroids of the IVF coarse quantizer (average vector per
    * label): dimension-wise mean via posexplode + two-key groupBy —
    * distributed, no driver collect. */
  def ivfCentroids(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("col")).as("m"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pairs"))
      .select(col("label"), transform(col("pairs"), p => p.getField("m")).as("centroid"))

  /** ANN top-k: probes rank centroids, visit only the `nprobe` nearest
    * lists, exact-rescore candidates. Returns the same shape as
    * [[exactTopK]] (recall measured in the spec). */
  def ivfTopK(s: SparkSession, dir: String, nprobe: Int = 3): DataFrame = {
    val e = prepared(s, dir)
    val cents = ivfCentroids(s, dir)
      .withColumn("cq", VectorMath.quantize(col("centroid")))
      .withColumn("cn", VectorMath.normSq(col("cq")))
      .select(col("label").as("c_label"), col("cq"), col("cn"))
    val p = prepared(s, dir)
      .filter(col("vec_id").isin(ProbeIds: _*))
      .select(col("vec_id").as("probe_id"), col("qv").as("pqv"), col("nq").as("pnq"))
    // probe × centroid ranking (tiny): pick nprobe lists per probe
    val listRank = Window.partitionBy(col("probe_id"))
      .orderBy(col("csim").desc, col("c_label"))
    val lists = p.join(broadcast(cents))
      .withColumn("csim",
        VectorMath.cosineFromParts(
          VectorMath.dot(col("pqv"), col("cq")), col("pnq"), col("cn")))
      .withColumn("r", row_number().over(listRank))
      .filter(col("r") <= nprobe)
      .select(col("probe_id"), col("pqv"), col("pnq"), col("c_label"))
    // candidates = members of the selected lists only (equi-join on label)
    val scored = e.join(broadcast(lists), e("label") === lists("c_label"))
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

  /** Embedding near-dup pairs at `minSim`, LSH-bucketed: vectors meet only
    * inside a shared sign-random-projection bucket (equi-join, no
    * all-pairs), then exact cosine verifies. Probabilistic recall by
    * construction — spec-validated; the fixture holds no pairs above 0.7,
    * so this is exercised on synthetic planted duplicates. */
  def lshNeardupPairs(s: SparkSession, dir: String, minSim: Double = 0.9,
      df: Option[DataFrame] = None): DataFrame = {
    val base = df.getOrElse(emb(s, dir))
    val e = base.select(
      col("vec_id"),
      VectorMath.quantize(col("embedding")).as("qv"),
      VectorMath.srpCode(col("embedding"), 8).as("code"))
      .withColumn("nq", VectorMath.normSq(col("qv")))
    val a = e.alias("a")
    val b = e.alias("b")
    a.join(b, col("a.code") === col("b.code") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim",
        VectorMath.cosineFromParts(
          VectorMath.dot(col("a.qv"), col("b.qv")), col("a.nq"), col("b.nq")))
      .filter(col("sim") >= minSim)
      .select(col("a.vec_id").as("vec_i"), col("b.vec_id").as("vec_j"), col("sim"))
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

  val all: Seq[NamedQuery] = Seq(
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
  )
}
