package graft.ts

import graft.SparkSpec
import org.apache.spark.SparkException

/** The group-size guard: a series kernel buffers its whole group in one
  * task, so a group longer than maxGroupRows must fail LOUDLY (pointed
  * IllegalStateException) instead of silently OOMing an executor.
  */
object GroupKernelsSpec {
  // standalone so the closure doesn't capture the (non-serializable) suite
  val identityKernel: (Array[Double], Array[Double]) => Array[Double] =
    (_, y) => y
}

class GroupKernelsSpec extends SparkSpec {
  import GroupKernelsSpec.identityKernel

  test("withKernel passes groups under the cap and preserves values") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1.0, 10.0), ("a", 2.0, 20.0), ("b", 1.0, 5.0))
      .toDF("k", "t", "v")
    val out = GroupKernels
      .withKernel(df, Seq("k"), "t", Seq("v" -> "o"), identityKernel,
        maxGroupRows = 2)
      .select("k", "t", "o").as[(String, Double, Double)].collect().sorted
    assert(out.toSeq == Seq(("a", 1.0, 10.0), ("a", 2.0, 20.0), ("b", 1.0, 5.0)))
  }

  test("withKernel fails loudly when a group exceeds maxGroupRows") {
    val s = spark
    import s.implicits._
    val df = (1 to 10).map(i => ("hot", i.toDouble, i.toDouble)).toDF("k", "t", "v")
    val e = intercept[SparkException] {
      GroupKernels
        .withKernel(df, Seq("k"), "t", Seq("v" -> "o"), identityKernel,
          maxGroupRows = 4)
        .collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("exceeds 4 rows"))
  }
}
