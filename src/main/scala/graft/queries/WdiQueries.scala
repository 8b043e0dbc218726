package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WDI pipeline end-to-end queries checked against the reference's committed
  * golden CSVs (filled in as the wdi pipeline modules land). */
object WdiQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracles: Map[String, String] = Map()
}
