package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator is registered as a [[NamedQuery]] in one of the
  * operator modules; this object only aggregates the registries.
  */
object SparkEntry {

  /** All implemented, oracle-checkable query units. */
  def registry: Seq[NamedQuery] =
    operators.RelationalOps.all ++ operators.LakeOps.all ++ operators.SqlCatalogOps.all ++
      operators.DedupOps.all ++ operators.VectorOps.all ++ operators.TextOps.all ++
      operators.MultimodalOps.all ++ operators.StreamingOps.all ++ diff.DiffOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.RelationalOps.ordersByStatus(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap

  /** Headline subset timed by Bench. */
  def benchQueries: Seq[NamedQuery] = registry.filter(_.bench)
}
