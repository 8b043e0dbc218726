package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY.md §2 plus the
  * LLM-data-pipeline surface) to a DataFrame program over the sfDir parquet
  * tables; `oracleSql` carries an equivalent DuckDB query for the driver's
  * hash-compare. Registries live next to their implementations:
  * [[graft.queries.Relational]], [[graft.queries.LlmText]],
  * [[graft.queries.VectorOps]], [[graft.queries.WdiQueries]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue by region: scan->filter->join star schema->two-level agg. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d)
      .withColumn("revenue", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    li.join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(sum(col("revenue")).as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy("r_name")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Olap.queries ++
      graft.queries.TpchMore.queries ++
      graft.queries.Curation.queries ++
      graft.queries.Warehouse.queries ++
      graft.queries.LlmText.queries ++
      graft.queries.VectorOps.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.WdiQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Olap.oracles ++
      graft.queries.TpchMore.oracles ++
      graft.queries.Curation.oracles ++
      graft.queries.Warehouse.oracles ++
      graft.queries.LlmText.oracles ++
      graft.queries.VectorOps.oracles ++
      graft.queries.MultimodalQueries.oracles ++
      graft.queries.WdiQueries.oracles
}
