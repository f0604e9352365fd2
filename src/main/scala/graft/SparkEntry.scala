package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{NorthStar, ParseRoute, Relational, Scalars}

/** Driver contract — see /root/repo/SURVEY.md §2.3 (normative inventory).
  *
  * `queries` maps each declared operator id to a function
  * `(spark, sfDir) => DataFrame`; `oracleSql` carries the DuckDB twin for
  * every oracle-checked op (no-oracle ops: q36 HLL estimates, q06 sink
  * layout — ScalaTest-verified instead).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q30AggQ1(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ ParseRoute.queries ++ Scalars.queries ++
      NorthStar.queries

  def oracleSql: Map[String, String] =
    Relational.oracle ++ ParseRoute.oracle ++ Scalars.oracle ++
      NorthStar.oracle
}
