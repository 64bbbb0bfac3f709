package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator battery (Layer A engine semantics,
  * Layer B relational surface, Layer C LLM-pipeline operators); every
  * deterministic/SQL-expressible entry has a DuckDB oracle in
  * `oracleSql`. Keys absent from `oracleSql` (HLL sketches, MinHash /
  * SimHash / LSH approximations) get the driver's rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape — the SURVEY §7 step-1 aggregate. */
  def entry(spark: SparkSession): DataFrame =
    QueriesRelational.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesRelational.queries ++ QueriesEngine.queries ++ QueriesLlm.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueriesRelational.oracles ++ QueriesEngine.oracles ++ QueriesLlm.oracles
}
