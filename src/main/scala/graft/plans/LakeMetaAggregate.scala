package graft.plans

import graft.lake.{ColBound, PartitionValues, Transform}
import graft.sources.{GraftLakeScanBuilder, GraftLakeV2Table}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Answers GROUP BY aggregates over lake tables from SNAPSHOT METADATA
  * when the grouping is derivable from recorded partition tuples — the
  * per-partition rollup then plans as a driver LocalRelation: zero tasks,
  * zero data I/O at any table size (the Iceberg metadata-count idea
  * extended to grouped aggregates over partition TRANSFORMS).
  *
  * The DSv2 aggregate-pushdown API already serves `GROUP BY <identity
  * partition source>` (GraftLakeScanBuilder.answerGroupedFromMetadata),
  * but Spark cannot translate `month(ts)` / `year(ts)` / `date_format`
  * into connector expressions, so q2-shaped per-month rollups never reach
  * that path. This optimizer rule (injected via [[GraftExtensions]], runs
  * BEFORE V2 pushdown) recognizes the shapes directly in the logical plan:
  *
  *   Aggregate(groupings, results, [alias-only Project,] Relation(lake T))
  *
  * where every grouping is one of
  *  - a bare identity-partition-source column,
  *  - `year(d)` / `month(d)` / `dayofmonth(d)` over a year/month/day-
  *    partitioned temporal source (rendered tuples are "yyyy[-MM[-dd]]" —
  *    the value parses straight out of the prefix),
  *  - `date_format(d, 'yyyy' | 'yyyy-MM' | 'yyyy-MM-dd')` at or above the
  *    transform's granularity,
  *  - `substring(s, 1, w)` over a truncate(w)-partitioned string,
  * and every result is a grouping key, COUNT(*) (recorded row counts),
  * MIN/MAX of a column with exact recorded bounds, COUNT(col) (recorded
  * non-null counts), or SUM/AVG of an integral/decimal column with exact
  * recorded per-file sums ([[graft.lake.ColumnSums]] — AVG only in the
  * provably exact double regime).
  *
  * A WHERE clause is admitted when every conjunct classifies every file
  * as wholly-in or wholly-out (per-file tri-state; any undecidable file
  * declines the whole rewrite):
  *  - `=` / `IN` on an identity partition source (the tuple determines
  *    the value; sentinel files are wholly-out for non-null, non-empty
  *    literals — an empty-string literal declines, the sentinel conflates
  *    it with null);
  *  - `>=` / `<` on a year/month/day-partitioned temporal source whose
  *    boundary is EXACTLY aligned to the transform period (a month file
  *    is wholly >= its own first instant; unaligned boundaries decline —
  *    `>` / `<=` always decline, their boundary instant splits a file);
  *  - `IS [NOT] NULL` on a source with any null-preserving recorded
  *    transform (identity/year/month/day/truncate — null rows land in
  *    the sentinel tuple; bucket does not witness null-ness, and a
  *    string sentinel file declines: it conflates null with "").
  *
  * Declines conservatively — merge-on-read tombstones, missing row
  * counts, files whose spec predates a grouping/filter field, non-UTC
  * embedded time zones (rendered tuples are UTC), and string groupings
  * whose files carry the Hive directory sentinel (it conflates null with
  * "") all fall through to the real scan. Null temporal partition values
  * group as NULL keys, matching `month(null)`. */
class LakeMetaAggregate(spark: SparkSession) extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate => answer(agg).getOrElse(agg)
  }

  private type FileKey = graft.lake.DataFile => Any

  private def answer(agg: Aggregate): Option[LogicalPlan] = {
    // peel alias-only Projects and at most one Filter layer between the
    // aggregate and the relation, collecting alias bindings + conjuncts
    var aliases = Map.empty[ExprId, Expression]
    var conjuncts: Seq[Expression] = Nil
    var relOpt: Option[DataSourceV2Relation] = None
    var cur = agg.child
    var ok = true
    var depth = 0
    while (ok && relOpt.isEmpty && depth < 6) {
      depth += 1
      cur match {
        case Project(list, c)
            if list.forall(e => e.isInstanceOf[Alias] || e.isInstanceOf[AttributeReference]) =>
          aliases ++= list.collect { case a: Alias => a.toAttribute.exprId -> a.child }
          cur = c
        case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, c) =>
          conjuncts ++= splitConjunctivePredicates(cond)
          cur = c
        case r: DataSourceV2Relation => relOpt = Some(r)
        case _ => ok = false
      }
    }
    // ungrouped-AND-unfiltered aggregates already fold through the V2
    // aggregate-pushdown API (answerFromMetadata); this rule adds the
    // grouped shapes, the filtered ungrouped ones the API declines, and
    // any query carrying a DISTINCT count (never pushed to connectors)
    val hasDistinctCount = agg.aggregateExpressions.exists(_.exists {
      case AggregateExpression(_: Count, _, true, _, _) => true
      case _ => false
    })
    if (agg.groupingExpressions.isEmpty && conjuncts.isEmpty && !hasDistinctCount)
      return None
    val rel = relOpt.getOrElse(return None)
    val tbl = rel.table match {
      case v: GraftLakeV2Table if !v.raw && !v.changelog => v
      case _ => return None
    }
    val t = tbl.t
    val snap = tbl.snap
    if (snap.deleteFiles.nonEmpty) return None // MoR merge could drop rows
    if (!snap.dataFiles.forall(_.rows >= 0)) return None
    // zero-row committed files (legal, e.g. an overwrite that emptied a
    // partition) contribute NOTHING a real scan would produce — keeping
    // them would surface phantom group tuples / distinct values
    val files = snap.dataFiles.filter(_.rows > 0)
    // 100-TB safety valve (VERDICT r15 #6): the fold below is a DRIVER
    // loop over kept files × result columns, fine at the 10²-10⁴ files a
    // maintained table holds but a planner-latency cliff on a NEGLECTED
    // table (10⁵-10⁶ pre-compaction files). Above the threshold the rule
    // DECLINES and the query runs as a normal distributed scan-agg —
    // slower but executor-parallel and never driver-bound. The entries
    // themselves are already snapshot-resident (scan planning is O(files)
    // regardless); this bounds the extra serve-path work, keeping the
    // 10-50 ms interactive-serve contract honest.
    val maxFiles = spark.conf.getOption("spark.graft.lake.metaAggMaxFiles")
      .map(_.toInt).getOrElse(LakeMetaAggregate.DefaultMaxFiles)
    if (files.size > maxFiles) return None
    val spec = t.specFieldsThrough(snap.specVersion)
    val schema = t.schema(snap.schemaVersion)

    def inline(e: Expression): Expression = e.transformUp {
      case a: AttributeReference if aliases.contains(a.exprId) => aliases(a.exprId)
    }
    def relAttr(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference if rel.outputSet.contains(a) => Some(a)
      case _ => None
    }
    // require the zone to be PRESENT and UTC: analysis fills timeZoneId on
    // timezone-aware expressions, so an absent id means an unresolved or
    // hand-copied expression whose effective zone this rule cannot know —
    // decline rather than assume (serving UTC-rendered tuples under a
    // non-UTC session would silently corrupt group keys)
    def utcOk(tz: Option[String]): Boolean = tz.contains("UTC")
    // `d` (temporal source) possibly under a session-tz cast to date
    def temporalSource(e: Expression): Option[AttributeReference] = e match {
      case c: Cast if c.dataType == DateType =>
        relAttr(c.child).filter(a => a.dataType match {
          case TimestampType => utcOk(c.timeZoneId)
          case TimestampNTZType | DateType => true
          case _ => false
        })
      case _ => relAttr(e).filter(_.dataType == DateType)
    }
    // a partition field of `source` whose transform is in `allowed` and
    // whose tuple value EVERY file records
    def recordedField(source: String, allowed: Transform => Boolean): Option[String] =
      spec.find(pf => pf.source.equalsIgnoreCase(source) && allowed(pf.transform) &&
        files.forall(_.partition.contains(pf.name))).map(_.name)
    val S = PartitionValues.NullSentinel

    // resolve one grouping expression to (output type, per-file key value);
    // the DataFrame API (`groupBy(year(c).as("y"))`) aliases the grouping
    // expression in place rather than through a child Project
    def resolveGroup(g: Expression): Option[(DataType, FileKey)] = g match {
      case al: Alias => resolveGroup(al.child)
      case a: AttributeReference if rel.outputSet.contains(a) => // identity source
        val field = schema.fields.find(_.name.equalsIgnoreCase(a.name)).getOrElse(return None)
        val pname = recordedField(a.name, _ == Transform.Identity).getOrElse(return None)
        val parse = GraftLakeScanBuilder.identityValueParser(field.dataType).getOrElse(return None)
        if (field.dataType == StringType && files.exists(_.partition(pname) == S))
          return None // sentinel conflates null with ""
        Some((field.dataType, f => f.partition(pname) match {
          case S => null; case s => parse(s)
        }))
      case Year(e) =>
        val a = temporalSource(e).getOrElse(return None)
        val pname = recordedField(a.name,
          tr => tr == Transform.Year || tr == Transform.Month || tr == Transform.Day)
          .getOrElse(return None)
        Some((IntegerType, f => f.partition(pname) match {
          case S => null; case s => s.substring(0, 4).toInt
        }))
      case Month(e) =>
        val a = temporalSource(e).getOrElse(return None)
        val pname = recordedField(a.name,
          tr => tr == Transform.Month || tr == Transform.Day).getOrElse(return None)
        Some((IntegerType, f => f.partition(pname) match {
          case S => null; case s => s.substring(5, 7).toInt
        }))
      case DayOfMonth(e) =>
        val a = temporalSource(e).getOrElse(return None)
        val pname = recordedField(a.name, _ == Transform.Day).getOrElse(return None)
        Some((IntegerType, f => f.partition(pname) match {
          case S => null; case s => s.substring(8, 10).toInt
        }))
      case df: DateFormatClass =>
        val a = (df.left match {
          case c: Cast => relAttr(c.child) // date source cast up to timestamp
          case other => relAttr(other)
        }).filter(x => x.dataType match {
          case TimestampType => utcOk(df.timeZoneId)
          case TimestampNTZType | DateType => true
          case _ => false
        }).getOrElse(return None)
        val pattern = df.right match {
          case Literal(p: UTF8String, StringType) => p.toString
          case _ => return None
        }
        val allowed: Transform => Boolean = pattern match {
          case "yyyy" => tr => tr == Transform.Year || tr == Transform.Month || tr == Transform.Day
          case "yyyy-MM" => tr => tr == Transform.Month || tr == Transform.Day
          case "yyyy-MM-dd" => tr => tr == Transform.Day
          case _ => return None
        }
        val pname = recordedField(a.name, allowed).getOrElse(return None)
        Some((StringType, f => f.partition(pname) match {
          case S => null
          case s => UTF8String.fromString(s.substring(0, pattern.length))
        }))
      case Substring(strE, Literal(1, IntegerType), Literal(w: Int, IntegerType)) =>
        val a = relAttr(strE).filter(_.dataType == StringType).getOrElse(return None)
        val pname = recordedField(a.name, _ == Transform.Truncate(w)).getOrElse(return None)
        if (files.exists(_.partition(pname) == S)) return None // null/"" conflation
        Some((StringType, f => UTF8String.fromString(f.partition(pname))))
      case _ => None
    }

    // ---- WHERE conjuncts: per-file wholly-in/wholly-out classification.
    // Any conjunct (or file) that cannot be decided exactly declines.
    def renderIdentity(dt: DataType, v: Any): Option[String] = (dt, v) match {
      case (_, null) => None
      case (StringType, s: UTF8String) =>
        val str = s.toString
        if (str.isEmpty) None else Some(str) // "" conflates with the sentinel
      case (LongType, x: Long) => Some(x.toString)
      case (IntegerType, x: Int) => Some(x.toString)
      case (BooleanType, x: Boolean) => Some(x.toString)
      case _ => None // temporal identity renderings are writer-internal
    }
    // first instant of the literal's transform period, rendered — only
    // when the literal IS that first instant (period-aligned)
    def alignedPeriod(tr: Transform, dt: DataType, v: Any): Option[String] = {
      import java.time.{Instant, LocalDateTime, ZoneOffset}
      val ldt: LocalDateTime = (dt, v) match {
        case (TimestampType | TimestampNTZType, micros: Long) =>
          LocalDateTime.ofInstant(Instant.ofEpochSecond(
            Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L),
            ZoneOffset.UTC)
        case (DateType, days: Int) =>
          java.time.LocalDate.ofEpochDay(days.toLong).atStartOfDay
        case _ => return None
      }
      import java.time.format.DateTimeFormatter.ofPattern
      tr match {
        case Transform.Year if ldt.getDayOfYear == 1 && ldt.toLocalTime == java.time.LocalTime.MIDNIGHT =>
          Some(ldt.format(ofPattern("yyyy")))
        case Transform.Month if ldt.getDayOfMonth == 1 && ldt.toLocalTime == java.time.LocalTime.MIDNIGHT =>
          Some(ldt.format(ofPattern("yyyy-MM")))
        case Transform.Day if ldt.toLocalTime == java.time.LocalTime.MIDNIGHT =>
          Some(ldt.format(ofPattern("yyyy-MM-dd")))
        case _ => None
      }
    }
    // per-file keep/drop decision for one conjunct; None = undecidable
    def resolveFilter(c: Expression): Option[graft.lake.DataFile => Option[Boolean]] = {
      def identityEq(a: AttributeReference, values: Seq[Any]): Option[graft.lake.DataFile => Option[Boolean]] = {
        val pname = recordedField(a.name, _ == Transform.Identity).getOrElse(return None)
        val rendered = values.map(v => renderIdentity(a.dataType, v))
        if (rendered.exists(_.isEmpty)) return None // null/""/unrenderable literal
        val set = rendered.flatten.toSet
        Some(f => f.partition(pname) match {
          case S => Some(false) // sentinel rows are null (or ""): no non-empty literal matches
          case v => Some(set.contains(v))
        })
      }
      def temporalRange(a: AttributeReference, lit: Any, ge: Boolean): Option[graft.lake.DataFile => Option[Boolean]] = {
        if (lit == null) return None
        val trs: Seq[Transform] = Seq(Transform.Year, Transform.Month, Transform.Day)
        trs.view.flatMap { tr =>
          recordedField(a.name, _ == tr).flatMap { pname =>
            alignedPeriod(tr, a.dataType, lit).map { p0 =>
              (f: graft.lake.DataFile) => f.partition(pname) match {
                case S => Some(false) // null fails any comparison
                // fixed-width renderings: lexicographic == chronological
                case p => Some(if (ge) p >= p0 else p < p0)
              }
            }
          }
        }.headOption
      }
      // null-ness per file from ANY null-preserving recorded transform of
      // the source (identity/year/month/day/truncate map null -> the
      // sentinel; bucket does NOT — Spark's hash(null) is the seed, so a
      // bucket tuple never witnesses null-ness). A STRING source's
      // sentinel conflates null with "" (an IS NOT NULL keeps the ""
      // rows), so a string sentinel file is undecidable and declines.
      def nullness(a: AttributeReference, wantNull: Boolean): Option[graft.lake.DataFile => Option[Boolean]] = {
        val nullPreserving: Transform => Boolean = {
          case Transform.Identity | Transform.Year | Transform.Month | Transform.Day => true
          case Transform.Truncate(_) => true
          case _ => false
        }
        val pname = recordedField(a.name, nullPreserving).getOrElse(return None)
        val stringy = a.dataType == StringType
        Some(f => f.partition(pname) match {
          case S => if (stringy) None else Some(wantNull)
          case _ => Some(!wantNull)
        })
      }
      c match {
        case IsNotNull(a: AttributeReference) if rel.outputSet.contains(a) =>
          nullness(a, wantNull = false)
        case IsNull(a: AttributeReference) if rel.outputSet.contains(a) =>
          nullness(a, wantNull = true)
        case EqualTo(a: AttributeReference, l: Literal) if rel.outputSet.contains(a) =>
          identityEq(a, Seq(l.value))
        case EqualTo(l: Literal, a: AttributeReference) if rel.outputSet.contains(a) =>
          identityEq(a, Seq(l.value))
        case In(a: AttributeReference, lits) if rel.outputSet.contains(a) &&
            lits.forall(_.isInstanceOf[Literal]) =>
          identityEq(a, lits.map(_.asInstanceOf[Literal].value))
        case GreaterThanOrEqual(a: AttributeReference, l: Literal) if rel.outputSet.contains(a) =>
          temporalRange(a, l.value, ge = true)
        case LessThanOrEqual(l: Literal, a: AttributeReference) if rel.outputSet.contains(a) =>
          temporalRange(a, l.value, ge = true) // lit <= a  ==  a >= lit
        case LessThan(a: AttributeReference, l: Literal) if rel.outputSet.contains(a) =>
          temporalRange(a, l.value, ge = false)
        case GreaterThan(l: Literal, a: AttributeReference) if rel.outputSet.contains(a) =>
          temporalRange(a, l.value, ge = false) // lit > a  ==  a < lit
        case _ => None
      }
    }
    val filterFns = conjuncts.map(c => resolveFilter(inline(c)))
    if (filterFns.exists(_.isEmpty)) return None
    val keptFiles = {
      val decided = files.map { f =>
        val ds = filterFns.map(_.get(f))
        if (ds.exists(_.isEmpty)) None else Some(ds.forall(_.get))
      }
      if (decided.exists(_.isEmpty)) return None // an undecidable file
      files.zip(decided).collect { case (f, Some(true)) => f }
    }

    val groupIn = agg.groupingExpressions.map(inline)
    val resolved = groupIn.map(resolveGroup)
    if (resolved.exists(_.isEmpty)) return None
    val keyFns = resolved.map(_.get._2)

    // each result column: a grouping key, COUNT(*), exact MIN/MAX, or an
    // additive aggregate over recorded per-file sums/non-null counts
    sealed trait Out
    case class Key(i: Int) extends Out
    case object CountStar extends Out
    case class Bound(field: StructField, isMin: Boolean) extends Out
    case class SumCol(field: StructField) extends Out
    case class CountCol(field: StructField) extends Out
    case class AvgCol(field: StructField) extends Out
    /** COUNT(DISTINCT <identity source>): the partition tuples ENUMERATE
      * the distinct values — every row of a file carries exactly the
      * file's recorded value, so the distinct set of a group is the
      * distinct set of its files' tuples (nulls excluded, like SQL).
      * String sources decline when a kept file carries the sentinel (it
      * conflates null — excluded — with "" — counted). */
    case class DistinctKey(field: StructField, pname: String) extends Out
    def fieldOf(a: AttributeReference): Option[StructField] =
      schema.fields.find(_.name.equalsIgnoreCase(a.name))
    def resolveResult(e: NamedExpression): Option[Out] = {
      val in = inline(e match { case Alias(c, _) => c; case other => other })
      // a reference to an in-place grouping alias (DataFrame-API shape)
      val byAliasId = in match {
        case a: AttributeReference =>
          agg.groupingExpressions.zipWithIndex.collectFirst {
            case (al: Alias, i) if al.exprId == a.exprId => Key(i)
          }
        case _ => None
      }
      byAliasId
        .orElse(groupIn.zipWithIndex.find(_._1.semanticEquals(in)).map(p => Key(p._2)))
        .orElse(in match {
        case AggregateExpression(Count(Seq(l: Literal)), _, false, None, _) if l.value != null =>
          Some(CountStar)
        case AggregateExpression(Count(Seq(a: AttributeReference)), _, false, None, _)
            if rel.outputSet.contains(a) =>
          fieldOf(a).map(CountCol)
        case AggregateExpression(Count(Seq(a: AttributeReference)), _, true, None, _)
            if rel.outputSet.contains(a) =>
          for {
            field <- fieldOf(a)
            pname <- recordedField(a.name, _ == Transform.Identity)
            if !(field.dataType == StringType && keptFiles.exists(_.partition(pname) == S))
          } yield DistinctKey(field, pname)
        case AggregateExpression(Min(a: AttributeReference), _, false, None, _)
            if rel.outputSet.contains(a) =>
          fieldOf(a).map(Bound(_, isMin = true))
        case AggregateExpression(Max(a: AttributeReference), _, false, None, _)
            if rel.outputSet.contains(a) =>
          fieldOf(a).map(Bound(_, isMin = false))
        case AggregateExpression(s: aggregate.Sum, _, false, None, _) =>
          s.child match {
            case a: AttributeReference if rel.outputSet.contains(a) => fieldOf(a).map(SumCol)
            case _ => None
          }
        case AggregateExpression(av: aggregate.Average, _, false, None, _) =>
          av.child match {
            case a: AttributeReference if rel.outputSet.contains(a) => fieldOf(a).map(AvgCol)
            case _ => None
          }
        case _ => None
      })
    }
    val outs = agg.aggregateExpressions.map(resolveResult)
    if (outs.exists(_.isEmpty)) return None

    // ungrouped (filtered): exactly ONE row, even over zero kept files
    // (count = 0, bounds = NULL), matching a global Aggregate's semantics
    val grouped =
      if (groupIn.isEmpty) Seq(Seq.empty[Any] -> keptFiles)
      else keptFiles.groupBy(f => keyFns.map(_(f))).toSeq
    // served value types must equal the Aggregate's own result types (a
    // precision/type mismatch would corrupt the LocalRelation) — decline
    // on any divergence
    val outTypes = agg.aggregateExpressions.map(_.dataType)
    val rows = grouped.map { case (keys, fs) =>
      val values = outs.map(_.get).zip(outTypes).map {
        case (Key(i), _) => keys(i)
        case (CountStar, _) => fs.map(_.rows).sum: Any
        case (Bound(field, isMin), _) =>
          LakeMetaAggregate.boundValue(field, fs, isMin).getOrElse(return None)
        case (SumCol(field), rt) =>
          val (dt, v) = graft.lake.ColumnSums.serveSum(field, fs).getOrElse(return None)
          if (dt != rt) return None
          v
        case (CountCol(field), _) =>
          graft.lake.ColumnSums.serveCount(field, fs).getOrElse(return None): Any
        case (AvgCol(field), rt) =>
          val (dt, v) = graft.lake.ColumnSums.serveAvg(field, fs).getOrElse(return None)
          if (dt != rt) return None
          v
        case (DistinctKey(_, pname), _) =>
          fs.iterator.map(_.partition(pname)).filter(_ != S).toSet.size.toLong: Any
      }
      InternalRow.fromSeq(values)
    }
    Some(LocalRelation(agg.output, rows))
  }
}

object LakeMetaAggregate {
  /** Default `spark.graft.lake.metaAggMaxFiles`: the driver-fold serve
    * path declines above this many kept data files (shared with the DSv2
    * ungrouped pushdown — see GraftLakeSource.answerFromMetadata). 200k
    * entries fold in ~10² ms; a 10⁶-file neglected table falls through
    * to the distributed aggregate instead of stalling the planner. */
  val DefaultMaxFiles = 200000

  /** Exact min/max of `field` across `files` from recorded bounds, as a
    * Catalyst value (None = not answerable — missing bounds, rounded
    * float bounds, unbounded types). Mirrors the scan builder's boundOf. */
  private[plans] def boundValue(
      field: StructField, files: Seq[graft.lake.DataFile], isMin: Boolean): Option[Any] = {
    if (files.isEmpty) return Some(null)
    val bounds: Seq[Option[ColBound]] = files.map(_.bounds.get(field.name))
    if (bounds.exists(_.isEmpty)) return None
    val bs = bounds.flatten
    def pick(vals: Seq[BigDecimal]): BigDecimal = if (isMin) vals.min else vals.max
    field.dataType match {
      case LongType | TimestampType | TimestampNTZType =>
        if (bs.exists(_.kind != "n")) None
        else {
          val vs = bs.map(b => BigDecimal(if (isMin) b.min else b.max))
          if (vs.exists(!_.isValidLong)) None else Some(pick(vs).toLong)
        }
      case IntegerType | DateType =>
        if (bs.exists(_.kind != "n")) None
        else {
          val vs = bs.map(b => BigDecimal(if (isMin) b.min else b.max))
          if (vs.exists(!_.isValidInt)) None else Some(pick(vs).toInt)
        }
      case StringType =>
        if (bs.exists(_.kind != "s")) None
        else {
          val vs = bs.map(b => UTF8String.fromString(if (isMin) b.min else b.max))
          Some(vs.reduce((a, b) => if ((a.compareTo(b) <= 0) == isMin) a else b))
        }
      // decimals below the 30-significant-digit bound rounding are recorded
      // EXACT (scaled by the parquet decimal annotation, under kind "d" —
      // INT32/INT64-backed for precision <= 18, two's-complement
      // FIXED_LEN_BYTE_ARRAY beyond); precision > 30 could have been
      // floor/ceil-rounded, decline. Kind "n" on a decimal column means
      // PRE-scaled-fix bounds in the unscaled domain: never serve those.
      case dt: DecimalType if dt.precision <= 30 =>
        if (bs.exists(_.kind != "d")) None
        else {
          val vs = bs.map(b => BigDecimal(if (isMin) b.min else b.max))
          val v = pick(vs)
          if (v.scale > dt.scale) None
          else {
            val d = Decimal(v)
            if (d.changePrecision(dt.precision, dt.scale)) Some(d) else None
          }
        }
      case _ => None
    }
  }
}
