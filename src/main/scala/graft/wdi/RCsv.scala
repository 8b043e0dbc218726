package graft.wdi

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.{col, udf}
import org.apache.spark.sql.types.DoubleType

/** CSV sink with R `readr::write_csv` numeric formatting (S2,
  * detrendandstat_quad.R:214-216): shortest round-trip digits, fixed vs
  * scientific chosen by exponent range (fixed for 1e-3 <= |v| < 1e15 —
  * the boundary the golden files pin, e.g. `-0.0010895572142160998`
  * fixed vs `-6.060884346639502e-4` sci),
  * unpadded exponent, integers without a trailing `.0`, nulls as `NA`.
  */
object RCsv {

  def formatDouble(d: Double): String = {
    if (java.lang.Double.isNaN(d)) return "NA"
    if (d == Double.PositiveInfinity) return "Inf"
    if (d == Double.NegativeInfinity) return "-Inf"
    if (d == 0.0) return "0"
    val neg = d < 0
    val (digits, exp10) = Grisu2.digits(math.abs(d))
    // fixed for 1e-3 <= |v| < 1e15, scientific outside — the boundary the
    // goldens pin: -0.0010895572142160998 fixed, -6.060884346639502e-4 sci.
    val body =
      if (exp10 >= -3 && exp10 < 15) fixedRepr(digits, exp10)
      else sciRepr(digits, exp10)
    if (neg) "-" + body else body
  }

  private def fixedRepr(digits: String, exp10: Int): String =
    if (exp10 >= digits.length - 1)
      digits + "0" * (exp10 - digits.length + 1)
    else if (exp10 >= 0)
      digits.substring(0, exp10 + 1) + "." + digits.substring(exp10 + 1)
    else
      "0." + "0" * (-exp10 - 1) + digits

  private def sciRepr(digits: String, exp10: Int): String = {
    val mant =
      if (digits.length == 1) digits
      else digits.substring(0, 1) + "." + digits.substring(1)
    val es = if (exp10 < 0) s"-${-exp10}" else s"+$exp10"
    s"${mant}e$es"
  }

  private val fmt = udf((d: java.lang.Double) =>
    if (d == null) "NA" else formatDouble(d))

  /** Write `df` as ONE header CSV file at `path` (like `write_csv`); double
    * columns formatted R-style. Driver-side single-file rename — the row
    * volume of these sinks is per-country statistics, never the raw data. */
  def write(df: DataFrame, path: String): Unit = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == DoubleType) fmt(col(s"`${f.name}`")).as(f.name)
      else col(s"`${f.name}`")
    }
    val tmp = java.nio.file.Files.createTempDirectory("rcsv").toString
    df.select(cols.toIndexedSeq: _*)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .option("header", true)
      .option("emptyValue", "")
      .csv(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
      .getOrElse(sys.error(s"no part file in $tmp"))
    val target = java.nio.file.Paths.get(path)
    if (target.getParent != null) java.nio.file.Files.createDirectories(target.getParent)
    java.nio.file.Files.move(part.toPath, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
  }
}
