package graft.wdi

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale-shape check: the WDI pipeline on ~100x the reference's country
  * count (5,000 synthetic countries x 5 variables x 60 years = 1.5M cells).
  * Verifies the plan completes with per-group kernels distributed across
  * partitions and produces exactly one cycle row per (country, year) — the
  * property that must hold when countries no longer fit one executor. */
class WdiScaleSpec extends SparkSpec {

  test("front half + quad/HP kernels at 5,000 countries") {
    import spark.implicits._
    val nCountries = 5000
    // deterministic synthetic series: positive, trending, with a leading
    // invalid run for every 7th country (exercises the run-length gate)
    val long = spark.range(nCountries.toLong * 5 * 60).select(
      concat(lit("C"), format_string("%04d", (col("id") / 300).cast("int")))
        .as("Country Code"),
      element_at(
        array(lit("Y"), lit("Cper"), lit("Iper"), lit("Xper"), lit("Mper")),
        ((col("id") / 60) % 5 + 1).cast("int")).as("Variable"),
      (col("id") % 60 + 1960).cast("int").as("Year"),
      when(floor(col("id") / 300) % 7 === 0 && col("id") % 60 < 25,
        lit(null).cast("double")) // 25-year hole => run of 35 still survives
        .otherwise(lit(100.0) + (col("id") % 60) * 1.5 +
          pmod(col("id") * 2654435761L, lit(97)).cast("double")).as("Value"))

    val cleaned = WdiEtl.cleanRuns(long)
    val wide = WdiEtl.toWide(spark, WdiEtl.allVarsOnly(cleaned))
    val quad = WdiCycles.quad(wide)
    val n = quad.count()
    // every 7th country keeps only its 35-year run; the rest keep 60 years
    val holey = (0 until nCountries).count(_ % 7 == 0)
    val expect = (nCountries - holey) * 60L + holey * 35L
    assert(n == expect, s"quad cycle rows $n != $expect")
    val hpRows = WdiCycles.hp(wide, 100.0)
      .filter(col("Y_cyc").isNotNull).count()
    assert(hpRows == expect, s"hp cycle rows $hpRows != $expect")
    // kernels ran across >1 partition (distributed, not driver-collected)
    assert(quad.rdd.getNumPartitions > 1)
  }
}
