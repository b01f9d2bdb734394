package graft.lake

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

import scala.jdk.CollectionConverters._

/** One immutable data file tracked by a snapshot.
  *
  * `seq` is the commit sequence number that added the file; merge-on-read
  * delete files apply only to data rows with a strictly smaller sequence
  * (same rule as Iceberg v2 sequence numbers — reference tables are
  * format-version 2 with merge-on-read delete/update/merge modes,
  * olake-config/destination.json:80-94).
  *
  * `splits` records the parquet row-group byte ranges (start, length) —
  * Iceberg's `split_offsets` — captured once at commit time so read
  * planning can fan a file out across tasks WITHOUT reopening footers on
  * the driver. Empty on metadata written before this field existed;
  * readers fall back to a footer read.
  */
final case class DataFile(
    path: String,
    seq: Long,
    partition: Map[String, String],
    bytes: Long,
    splits: Seq[(Long, Long)] = Nil)

/** A merge-on-read delete-key file: parquet of primary-key columns plus a
  * constant `_dseq` column = the commit sequence of the delete. */
final case class DeleteFile(path: String, seq: Long, bytes: Long)

/** One committed table version. Carries the FULL file listing (not a delta):
  * metadata stays O(files), which is fine up to ~10^5 files per table; at
  * larger counts the natural evolution is Iceberg-style manifest deltas —
  * the read/commit protocol here would not change. */
final case class Snapshot(
    seq: Long,
    parent: Option[Long],
    timestampMs: Long,
    operation: String,
    schemaVersion: Int,
    dataFiles: Seq[DataFile],
    deleteFiles: Seq[DeleteFile],
) {
  def totalBytes: Long = dataFiles.map(_.bytes).sum
}

/** Immutable table definition, written once at CREATE TABLE time. Schema
  * lives NEXT to this (meta/schema-v*.json) and is versioned per snapshot,
  * so ALTER TABLE is a metadata-only commit. */
final case class TableMeta(
    name: String,
    partitionSpec: Seq[PartitionField],
    clusterBy: Seq[String],
    primaryKey: Seq[String],
)

/** Hand-rolled (de)serialization over Jackson (ships with Spark).
  * The layout mirrors Iceberg's public metadata shape at 1/100 the surface:
  * table.json + schema-v{N}.json + snap-{seq}.json + version-hint.text. */
object MetaJson {
  private val M = new ObjectMapper()

  def writeTableMeta(t: TableMeta): String = {
    val root = M.createObjectNode()
    root.put("name", t.name)
    root.put("formatVersion", 1)
    val spec = root.putArray("partitionSpec")
    t.partitionSpec.foreach { pf =>
      val f = spec.addObject()
      f.put("source", pf.source); f.put("transform", pf.transform.name); f.put("name", pf.name)
    }
    putStrings(root, "clusterBy", t.clusterBy)
    putStrings(root, "primaryKey", t.primaryKey)
    root.toPrettyString
  }

  def readTableMeta(s: String): TableMeta = {
    val root = M.readTree(s)
    TableMeta(
      name = root.get("name").asText(),
      partitionSpec = arr(root, "partitionSpec").map { f =>
        PartitionField(f.get("source").asText(), Transform.parse(f.get("transform").asText()), f.get("name").asText())
      },
      clusterBy = strings(root, "clusterBy"),
      primaryKey = strings(root, "primaryKey"),
    )
  }

  def writeSnapshot(s: Snapshot): String = {
    val root = M.createObjectNode()
    root.put("seq", s.seq)
    s.parent.foreach(p => root.put("parent", p))
    root.put("timestampMs", s.timestampMs)
    root.put("operation", s.operation)
    root.put("schemaVersion", s.schemaVersion)
    val dfs = root.putArray("dataFiles")
    s.dataFiles.foreach { df =>
      val f = dfs.addObject()
      f.put("path", df.path); f.put("seq", df.seq); f.put("bytes", df.bytes)
      val p = f.putObject("partition")
      df.partition.foreach { case (k, v) => p.put(k, v) }
      if (df.splits.nonEmpty) {
        val sp = f.putArray("splits")
        df.splits.foreach { case (start, len) =>
          val pair = sp.addArray(); pair.add(start); pair.add(len)
        }
      }
    }
    val dels = root.putArray("deleteFiles")
    s.deleteFiles.foreach { d =>
      val f = dels.addObject()
      f.put("path", d.path); f.put("seq", d.seq); f.put("bytes", d.bytes)
    }
    root.toPrettyString
  }

  def readSnapshot(s: String): Snapshot = {
    val root = M.readTree(s)
    Snapshot(
      seq = root.get("seq").asLong(),
      parent = Option(root.get("parent")).map(_.asLong()),
      timestampMs = root.get("timestampMs").asLong(),
      operation = root.get("operation").asText(),
      schemaVersion = root.get("schemaVersion").asInt(),
      dataFiles = arr(root, "dataFiles").map { f =>
        DataFile(
          path = f.get("path").asText(),
          seq = f.get("seq").asLong(),
          partition = Option(f.get("partition")).map { p =>
            p.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
          }.getOrElse(Map.empty),
          bytes = f.get("bytes").asLong(),
          splits = arr(f, "splits").map(pair =>
            (pair.get(0).asLong(), pair.get(1).asLong())),
        )
      },
      deleteFiles = arr(root, "deleteFiles").map { f =>
        DeleteFile(f.get("path").asText(), f.get("seq").asLong(), f.get("bytes").asLong())
      },
    )
  }

  def writeSchema(schema: StructType): String = schema.json
  def readSchema(s: String): StructType = DataType.fromJson(s).asInstanceOf[StructType]

  private def putStrings(root: ObjectNode, field: String, vs: Seq[String]): Unit = {
    val a = root.putArray(field); vs.foreach(a.add)
  }
  private def strings(root: JsonNode, field: String): Seq[String] =
    arr(root, field).map(_.asText())
  private def arr(root: JsonNode, field: String): Seq[JsonNode] =
    Option(root.get(field)).map(_.asInstanceOf[ArrayNode].elements().asScala.toSeq).getOrElse(Nil)
}
