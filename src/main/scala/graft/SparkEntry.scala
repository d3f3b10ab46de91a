package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator family registers its queries (Spark impl +
  * DuckDB oracle SQL) as `graft.Q` values; this object is just the
  * aggregation point the driver calls into.
  */
object SparkEntry {

  /** All registered queries, in declaration order. */
  def registry: Seq[Q] =
    ops.Relational.all ++ ops.Caliper.all ++ ops.TextAnalysis.all ++
      ops.Dedup.all ++ ops.Similarity.all ++ ops.EventWindows.all ++
      ops.StreamingQueries.all ++ ops.Curation.all ++ ops.Multimodal.all ++
      ops.EtlQueries.all ++ ops.Graph.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core dataflow end-to-end: event construction →
    * group-by-attempt → collect_list (SURVEY §3.1).
    */
  def entry(spark: SparkSession): DataFrame =
    ops.Caliper.c2GroupedAttempts.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
