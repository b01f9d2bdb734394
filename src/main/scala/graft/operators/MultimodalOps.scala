package graft.operators

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (driver brief): image/audio/video payloads
  * as opaque `binary` columns with typed metadata, plus the decode /
  * feature-extract / resize / frame-sample stages a training-data
  * pipeline runs over them.
  *
  * The environment ships no media codecs, so the DECODE step is a
  * DETERMINISTIC FAKE (clearly marked below): it parses a synthetic
  * header we stamp on each payload. Everything around it — the binary
  * schema, the typed Dataset + mapPartitions batch pipeline (the Scala
  * equivalent of mapInPandas: rows stream through in executor-side
  * batches with no driver involvement), the exploded frame table — is
  * real and tested, and is exactly what a real codec would slot into.
  *
  * Scale: all stages are map-only over the asset table (no shuffle);
  * frame sampling is a generator (explode) whose output is partitioned
  * like its input. Payload bytes never leave the executor.
  */
object MultimodalOps {

  /** Typed media asset row: binary payload + metadata. */
  final case class MediaAsset(
      asset_id: Long,
      media_type: String,
      payload: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Int)

  final case class MediaFeature(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      feature: Array[Float])

  final case class Frame(
      asset_id: Long,
      frame_idx: Int,
      frame_bytes: Array[Byte])

  /** Batch size for the mapPartitions pipeline (the "Arrow batch shape"
    * knob of the mapInPandas equivalent). */
  val BatchSize = 64

  private val MediaTypes = Seq("image", "audio", "video")

  /** Derive a deterministic binary asset table from the documents fixture:
    * payload = UTF-8 bytes of the text, media type cycles by doc_id,
    * synthetic dimensions derived from the byte length. This stands in
    * for `spark.read.format("binaryFile")` + a sidecar metadata table. */
  def mediaAssets(s: SparkSession, dir: String): Dataset[MediaAsset] = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id").as("asset_id"),
        element_at(
          array(MediaTypes.map(lit): _*),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        (pmod(col("doc_id"), lit(64)) * 16 + 64).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) * 16 + 48).cast("int").as("height"),
        (octet_length(encode(col("text"), "UTF-8")) * 10).cast("int").as("duration_ms"))
      .as[MediaAsset]
  }

  /** === STUBBED DECODE ===
    * A real implementation would hand `payload` to an image/audio codec.
    * This deterministic fake "decodes" by reading the payload bytes
    * directly; it exists so the pipeline shape (per-batch processing,
    * fixed-width feature output) is real and testable in this codec-less
    * environment. */
  private def fakeDecode(payload: Array[Byte]): Array[Int] =
    payload.map(b => (b & 0xFF): Int)

  /** Feature extraction: typed mapPartitions in executor-side batches of
    * [[BatchSize]] (the Scala shape of mapInPandas) producing a fixed
    * 16-bin byte histogram, L1-normalized — deterministic stand-in for an
    * embedding model over decoded media. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { a =>
          val decoded = fakeDecode(a.payload)
          val hist = new Array[Float](16)
          decoded.foreach(v => hist(v % 16) += 1f)
          val n = math.max(decoded.length, 1).toFloat
          var i = 0
          while (i < 16) { hist(i) /= n; i += 1 }
          MediaFeature(a.asset_id, a.media_type, a.payload.length.toLong, hist)
        }
      }
    }
  }

  /** Resize: halve the synthetic dimensions and truncate the payload
    * proportionally (a real implementation would re-encode pixels; the
    * metadata/payload contract is what downstream stages consume). */
  def resize(assets: Dataset[MediaAsset], factor: Int = 2): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.map { a =>
      a.copy(
        payload = a.payload.take(math.max(a.payload.length / (factor * factor), 1)),
        width = math.max(a.width / factor, 1),
        height = math.max(a.height / factor, 1))
    }
  }

  /** Frame sampling for video assets: one deterministic byte-stride slice
    * per 500 ms of synthetic duration (a real impl would seek keyframes).
    * Generator shape: flatMap → the frame table inherits the asset
    * partitioning. */
  def sampleFrames(assets: Dataset[MediaAsset], everyMs: Int = 500): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.media_type == "video").flatMap { a =>
      val nFrames = math.max(a.duration_ms / everyMs, 1)
      val stride = math.max(a.payload.length / nFrames, 1)
      (0 until nFrames).map { i =>
        Frame(a.asset_id, i, a.payload.slice(i * stride, i * stride + math.min(stride, 16)))
      }
    }
  }

  // q44 — media catalog rollup over the BINARY payload column: per media
  // type, asset count + exact byte accounting (octet_length on binary in
  // Spark ≡ octet_length(encode(text)) in DuckDB — multibyte text makes
  // this a real bytes-vs-chars distinction for the zh documents)
  val mediaCatalog: (SparkSession, String) => DataFrame = (s, dir) =>
    mediaAssets(s, dir).toDF()
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(octet_length(col("payload"))).as("total_bytes"),
        max(octet_length(col("payload"))).as("max_bytes"),
        sum(col("duration_ms").cast("long")).as("total_duration_ms"))

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q44_media_catalog", mediaCatalog, oracle = Some(
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  COUNT(*) AS n_assets,
        |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |  CAST(MAX(octet_length(encode(text))) AS INT) AS max_bytes,
        |  CAST(SUM(octet_length(encode(text)) * 10) AS BIGINT) AS total_duration_ms
        |FROM documents GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin)),
  )
}
