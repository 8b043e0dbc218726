package graft.wdi

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The shared back half: per-country moment statistics over the cycle
  * columns, then per-region mean/sd re-aggregation
  * (detrendandstat_quad.R:170-291, dtrendandstat_dlog.R:97-219).
  *
  * Generic over output column names so one implementation serves all four
  * variants (sd_Y vs sd_dlogY etc). Both aggregation levels are plain
  * hash aggregations; level 2 runs over 45 rows.
  */
object WdiStats {

  /** A3 + A9: sd×100 of each cycle series by (country, region), plus the
    * consumption/investment volatility ratios. `names` maps the four cycle
    * columns to output names in golden-header order. */
  def sdByCountry(cycles: DataFrame, names: Seq[(String, String)]): DataFrame = {
    val aggs = names.map { case (c, out) => (stddev_samp(col(c)) * 100).as(out) }
    val sdY = names.head._2 // Y first by convention
    val sdC = names(1)._2
    val sdI = names(2)._2
    cycles
      .groupBy(col("Country Code"), col("Region"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("sdC_over_sdY", col(sdC) / col(sdY))
      .withColumn("sdI_over_sdY", col(sdI) / col(sdY))
  }

  /** A5: the six pairwise Pearson correlations of the four cycle series
    * (complete.obs ≡ Spark corr's null-pair skipping). */
  def corrByCountry(cycles: DataFrame): DataFrame = {
    val pairs = Seq(
      ("Y_cyc", "C_cyc", "corr_Y_C"), ("Y_cyc", "I_cyc", "corr_Y_I"),
      ("Y_cyc", "TB_cyc", "corr_Y_TB"), ("C_cyc", "I_cyc", "corr_C_I"),
      ("C_cyc", "TB_cyc", "corr_C_TB"), ("I_cyc", "TB_cyc", "corr_I_TB"))
    val aggs = pairs.map { case (a, b, out) => corr(col(a), col(b)).as(out) }
    cycles.groupBy(col("Country Code"), col("Region")).agg(aggs.head, aggs.tail: _*)
  }

  /** W4 + A6: lag-1 autocorrelation of each cycle series in year order. */
  def acfByCountry(cycles: DataFrame): DataFrame = {
    val w = Window.partitionBy("Country Code").orderBy("Year")
    val cols = Seq("Y_cyc" -> "acf_Y", "C_cyc" -> "acf_C",
      "I_cyc" -> "acf_I", "TB_cyc" -> "acf_TB")
    val lagged = cols.foldLeft(cycles) { case (df, (c, _)) =>
      df.withColumn(s"${c}_lag", lag(col(c), 1).over(w))
    }
    val aggs = cols.map { case (c, out) => corr(col(c), col(s"${c}_lag")).as(out) }
    lagged.groupBy(col("Country Code"), col("Region")).agg(aggs.head, aggs.tail: _*)
  }

  /** A4 + A3: region-level mean and sample sd of each country moment,
    * emitted as `<col>_mean`, `<col>_sd` pairs in input order. */
  def byRegion(countryStats: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(avg(col(c)).as(s"${c}_mean"), stddev_samp(col(c)).as(s"${c}_sd"))
    }
    countryStats.groupBy(col("Region")).agg(aggs.head, aggs.tail: _*)
  }
}
