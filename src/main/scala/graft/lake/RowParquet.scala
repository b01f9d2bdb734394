package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

import java.time.{Instant, LocalDateTime, ZoneOffset}
import scala.collection.mutable

/** Task-side parquet row writing shared by the DSv2 batch writer and the
  * imperative staging path: each write task streams its rows straight into
  * parquet files (one per partition value it owns) through the public
  * parquet-column Group API, rendering partition transforms per row and
  * folding per-file EXACT column sums AS THE ROWS PASS — so a commit's
  * manifest stats cost zero read-back I/O (the Iceberg writer discipline:
  * metrics are a by-product of the write, never a second scan).
  *
  * The physical parquet types match what Spark's own writer produces for
  * the same schema (including non-legacy decimal encodings), so files from
  * either writer read back interchangeably.
  */
object RowParquet {

  /** Column types this writer can encode (flat scalars, the lake's SQL
    * surface). Anything else routes the caller to the DataFrame writer. */
  def writable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | FloatType | BooleanType |
         StringType | TimestampType | TimestampNTZType | DateType => true
    case d: DecimalType => d.precision <= 38
    case _ => false
  }

  def supports(schema: StructType): Boolean = schema.fields.forall(f => writable(f.dataType))

  /** Transform/source-type pairs the per-row renderer reproduces
    * byte-identically to the DataFrame writer's directory values.
    * `bucket[n]` qualifies for every type since r18: the derivation is
    * [[Transform.bucketOf]]'s own Murmur3 over the Catalyst-internal
    * value, computed identically on both write routes. */
  def renderSupported(tr: Transform, dt: DataType): Boolean = tr match {
    case Transform.Identity => dt match {
      case StringType | LongType | IntegerType | BooleanType => true
      case _ => false
    }
    case Transform.Year | Transform.Month | Transform.Day => dt match {
      case TimestampType | TimestampNTZType | DateType => true
      case _ => false
    }
    case Transform.Truncate(_) => dt == StringType
    // any type: the bucket derivation is Murmur3 over the Catalyst-
    // internal value ([[Transform.bucketOf]]), defined for every type
    // Spark's hash expression accepts
    case Transform.Bucket(_) => true
    case _ => false
  }

  /** Two's-complement byte width Spark uses for FIXED_LEN_BYTE_ARRAY
    * decimals of the given precision (same computation as Spark's
    * `Decimal.minBytesForPrecision`, which is private[sql]). */
  def minBytesForPrecision(precision: Int): Int = {
    var numBytes = 1
    while (math.pow(2.0, 8 * numBytes - 1) < math.pow(10.0, precision)) numBytes += 1
    numBytes
  }

  /** StructType (+ the commit-seq column) → parquet MessageType matching
    * what Spark's own parquet writer produces for these flat types
    * (decimals: INT32 ≤ 9 digits, INT64 ≤ 18, else FIXED_LEN_BYTE_ARRAY),
    * so the imperative `spark.read.schema(storage)` scan reads these files
    * interchangeably with DataFrame-written ones. */
  def toParquetSchema(schema: StructType, seqCol: String = LakeTable.SeqCol): MessageType = {
    val b = Types.buildMessage()
    (schema.fields :+ StructField(seqCol, LongType, nullable = false)).foreach { field =>
      val t: PrimitiveType = field.dataType match {
        case LongType => Types.optional(PrimitiveTypeName.INT64).named(field.name)
        case IntegerType => Types.optional(PrimitiveTypeName.INT32).named(field.name)
        case DoubleType => Types.optional(PrimitiveTypeName.DOUBLE).named(field.name)
        case FloatType => Types.optional(PrimitiveTypeName.FLOAT).named(field.name)
        case BooleanType => Types.optional(PrimitiveTypeName.BOOLEAN).named(field.name)
        case StringType => Types.optional(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(field.name)
        case TimestampType => Types.optional(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.MICROS))
          .named(field.name)
        case TimestampNTZType => Types.optional(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.MICROS))
          .named(field.name)
        case DateType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.dateType()).named(field.name)
        case d: DecimalType if d.precision <= 9 =>
          Types.optional(PrimitiveTypeName.INT32)
            .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision)).named(field.name)
        case d: DecimalType if d.precision <= 18 =>
          Types.optional(PrimitiveTypeName.INT64)
            .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision)).named(field.name)
        case d: DecimalType =>
          Types.optional(PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY)
            .length(minBytesForPrecision(d.precision))
            .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision)).named(field.name)
        case other => throw new UnsupportedOperationException(
          s"task parquet write supports flat scalar columns; got $other for ${field.name}")
      }
      b.addField(t)
    }
    b.named("graft_lake_row")
  }

  def toGroup(factory: SimpleGroupFactory, schema: StructType, row: InternalRow, seq: Long,
      offset: Int = 0, seqCol: String = LakeTable.SeqCol): Group = {
    val g = factory.newGroup()
    schema.fields.zipWithIndex.foreach { case (field, idx) =>
      val i = idx + offset
      if (!row.isNullAt(i)) field.dataType match {
        case LongType => g.add(field.name, row.getLong(i))
        case IntegerType => g.add(field.name, row.getInt(i))
        case DoubleType => g.add(field.name, row.getDouble(i))
        case FloatType => g.add(field.name, row.getFloat(i))
        case BooleanType => g.add(field.name, row.getBoolean(i))
        case StringType => g.add(field.name, Binary.fromString(row.getUTF8String(i).toString))
        case TimestampType | TimestampNTZType => g.add(field.name, row.getLong(i))
        case DateType => g.add(field.name, row.getInt(i))
        case d: DecimalType =>
          val dec = row.getDecimal(i, d.precision, d.scale)
          if (d.precision <= 9) g.add(field.name, dec.toUnscaledLong.toInt)
          else if (d.precision <= 18) g.add(field.name, dec.toUnscaledLong)
          else {
            val unscaled = dec.toJavaBigDecimal.unscaledValue()
            val minimal = unscaled.toByteArray // two's complement, minimal
            val width = minBytesForPrecision(d.precision)
            val fixed = new Array[Byte](width)
            if (unscaled.signum < 0) java.util.Arrays.fill(fixed, -1: Byte)
            System.arraycopy(minimal, 0, fixed, width - minimal.length, minimal.length)
            g.add(field.name, Binary.fromConstantByteArray(fixed))
          }
        case other => throw new UnsupportedOperationException(s"$other")
      }
    }
    g.add(seqCol, seq)
    g
  }

  /** Row-level partition-transform rendering, matching the directory
    * values the DataFrame-API writer produces. An EMPTY rendered string
    * also maps to the null sentinel — Spark's directory rendering
    * (ExternalCatalogUtils.getPartitionPathString) conflates null and ""
    * into __HIVE_DEFAULT_PARTITION__, and partition-scoped delete
    * sidecars are matched against data-file partition values recorded by
    * EITHER writer, so the two renderings must agree byte-for-byte. */
  def renderPartition(tr: Transform, row: InternalRow, idx: Int, dt: DataType): String = {
    def utcOf(micros: Long): LocalDateTime =
      LocalDateTime.ofInstant(Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L), ZoneOffset.UTC)
    lazy val temporal: Option[LocalDateTime] = dt match {
      case TimestampType | TimestampNTZType => Some(utcOf(row.getLong(idx)))
      case DateType => Some(java.time.LocalDate.ofEpochDay(row.getInt(idx).toLong).atStartOfDay)
      case _ => None
    }
    def hive(s: String): String =
      if (s.isEmpty) PartitionValues.NullSentinel else s
    tr match {
      // bucket BEFORE the null short-circuit: the engine-side derivation
      // ([[Transform.Bucket.apply]]) hashes a null key to the seed —
      // bucket pmod(42, n), never a null partition — and the DSv2 write,
      // the imperative write, and SPJ key-grouping must all agree
      case Transform.Bucket(n) =>
        val v = if (row.isNullAt(idx)) null else row.get(idx, dt)
        Transform.bucketOf(n, v, dt).toString
      case _ if row.isNullAt(idx) => PartitionValues.NullSentinel
      case Transform.Identity => dt match {
        case StringType => hive(row.getUTF8String(idx).toString)
        case LongType => row.getLong(idx).toString
        case IntegerType => row.getInt(idx).toString
        case BooleanType => row.getBoolean(idx).toString
        case other => throw new UnsupportedOperationException(
          s"task parquet write: identity partition on $other")
      }
      case Transform.Year => temporal.get.format(java.time.format.DateTimeFormatter.ofPattern("yyyy"))
      case Transform.Month => temporal.get.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM"))
      case Transform.Day => temporal.get.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd"))
      case Transform.Truncate(w) =>
        // code points, like Spark's substring and Transform.valueOf —
        // String.take counts UTF-16 units and would render a different
        // prefix for supplementary characters (false pruning)
        val s = row.getUTF8String(idx).toString
        hive(if (s.codePointCount(0, s.length) <= w) s
        else s.substring(0, s.offsetByCodePoints(0, w)))
      case other => throw new UnsupportedOperationException(s"task parquet write: $other")
    }
  }

  /** Open a Group writer honoring the SAME size knobs Spark's own writer
    * reads from the Hadoop conf (`parquet.block.size` / `parquet.page.size`)
    * — the direct ParquetWriter builder otherwise silently pins its 128 MB
    * default and multi-row-group splitting never happens. */
  def openWriter(path: Path, conf: Configuration, schema: MessageType): ParquetWriter[Group] =
    ExampleParquetWriter.builder(
        org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(path, conf))
      .withType(schema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .withRowGroupSize(conf.getLong("parquet.block.size", ParquetWriter.DEFAULT_BLOCK_SIZE.toLong))
      .withPageSize(conf.getInt("parquet.page.size", ParquetWriter.DEFAULT_PAGE_SIZE))
      .build()

  // ------------------------------------------------------ per-file sums

  /** Exact per-file sums of the summable schema columns, folded row by row
    * in the write task in unbounded java BigDecimal (cannot overflow; the
    * manifest stores plain strings). Rendering matches
    * [[ColumnSums.compute]]'s read-back format bit for bit, so readers
    * cannot tell which writer recorded a file's stats. */
  final class FileSums(schema: StructType, offset: Int) {
    private val fields: Array[(Int, StructField)] = schema.fields.zipWithIndex.collect {
      case (f, i) if f.name != LakeTable.SeqCol && ColumnSums.summable(f.dataType) =>
        (i + offset, f)
    }
    private val acc = new Array[java.math.BigDecimal](fields.length)

    def add(row: InternalRow): Unit = {
      var k = 0
      while (k < fields.length) {
        val (i, f) = fields(k)
        if (!row.isNullAt(i)) {
          val v = f.dataType match {
            case ByteType => java.math.BigDecimal.valueOf(row.getByte(i).toLong)
            case ShortType => java.math.BigDecimal.valueOf(row.getShort(i).toLong)
            case IntegerType => java.math.BigDecimal.valueOf(row.getInt(i).toLong)
            case LongType => java.math.BigDecimal.valueOf(row.getLong(i))
            case d: DecimalType => row.getDecimal(i, d.precision, d.scale).toJavaBigDecimal
            case other => throw new IllegalStateException(s"unsummable $other")
          }
          acc(k) = if (acc(k) == null) v else acc(k).add(v)
        }
        k += 1
      }
    }

    /** Column → sum string; all-null columns are omitted (readers key off
      * the recorded non-null count, which is 0 for them). */
    def result: Map[String, String] = fields.zipWithIndex.collect {
      case ((_, f), k) if acc(k) != null =>
        f.name -> acc(k).stripTrailingZeros.toPlainString
    }.toMap
  }

  // ------------------------------------------------ imperative task write

  /** One staged file's descriptor, returned from the write tasks to the
    * driver (tiny: name + partition tuple + counts). */
  final case class StagedDesc(
      rel: String, partition: Map[String, String], rows: Long, sums: Map[String, String])

  /** Write one task's rows (already arranged by the caller) into staged
    * parquet files — one per partition value the task owns — folding sums
    * as rows pass. Returns the descriptors; only files from SUCCESSFUL
    * attempts are referenced (the driver moves files by descriptor, and
    * staging is deleted wholesale afterward, so a lost speculative
    * attempt's files never leak into the table). */
  def writeTask(
      stagingDir: String,
      confEntries: Map[String, String],
      schema: StructType,
      seq: Long,
      spec: Seq[(Int, Transform, String)], // (source field idx, transform, partition name)
      taskUid: String,
      rows: Iterator[InternalRow],
      recordSums: Boolean): Iterator[StagedDesc] = {
    val conf = new Configuration(false)
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    val parquetSchema = toParquetSchema(schema)
    val factory = new SimpleGroupFactory(parquetSchema)
    val open = mutable.LinkedHashMap.empty[Map[String, String],
      (ParquetWriter[Group], String, FileSums, Array[Long])]
    try {
      rows.foreach { row =>
        val partition = spec.map { case (srcIdx, tr, name) =>
          name -> renderPartition(tr, row, srcIdx, schema.fields(srcIdx).dataType)
        }.toMap
        val (w, _, sums, count) = open.getOrElseUpdate(partition, {
          val rel = s"$taskUid-${open.size}.parquet"
          val writer = openWriter(new Path(stagingDir, rel), conf, parquetSchema)
          (writer, rel, new FileSums(schema, 0), Array(0L))
        })
        w.write(toGroup(factory, schema, row, seq))
        if (recordSums) sums.add(row)
        count(0) += 1
      }
      open.values.foreach(_._1.close())
      open.map { case (partition, (_, rel, sums, count)) =>
        StagedDesc(rel, partition, count(0), if (recordSums) sums.result else Map.empty)
      }.iterator
    } catch {
      case e: Throwable =>
        open.values.foreach(w => try w._1.close() catch { case _: Exception => })
        throw e
    }
  }
}
