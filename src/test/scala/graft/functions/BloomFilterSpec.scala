package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives, fpp near target") {
    val n = 20000
    val b = Bloom.empty(n, 0.01)
    (0 until n).foreach(i => Bloom.put(b, i * 2654435761L))
    // every inserted key found
    assert((0 until n).forall(i => Bloom.mightContain(b, i * 2654435761L)))
    // fpp on disjoint probes within 3x of target
    val fp = (1 to 50000).count(i => Bloom.mightContain(b, -i * 40503L)) / 50000.0
    assert(fp < 0.03, s"fpp=$fp")
  }

  test("merge ORs bitsets: union membership, header preserved") {
    val a = Bloom.empty(100, 0.01)
    val b = Bloom.empty(100, 0.01)
    (1L to 50L).foreach(Bloom.put(a, _))
    (51L to 100L).foreach(Bloom.put(b, _))
    val m = Bloom.or(a, b)
    assert((1L to 100L).forall(Bloom.mightContain(m, _)))
  }

  test("distributed build equals single-threaded build behavior") {
    val keys = (1L to 5000L).map(_ * 7919L)
    val agg = udaf(new BloomBuildAgg(keys.size.toLong, 0.01), Encoders.LONG)
    val built = keys.toDF("k").repartition(8)
      .agg(agg(col("k"))).head.getAs[Array[Byte]](0)
    assert(keys.forall(Bloom.mightContain(built, _)), "false negative after merge")
    val local = Bloom.empty(keys.size.toLong, 0.01)
    keys.foreach(Bloom.put(local, _))
    // same parameters -> same bitset regardless of partitioning (OR is
    // commutative/associative and puts are idempotent)
    assert(java.util.Arrays.equals(built, local))
  }

  test("expression: codegen and interpreted agree, nulls propagate") {
    val b = Bloom.empty(100, 0.01)
    (1L to 100L).foreach(Bloom.put(b, _))
    val df = Seq(Some(5L), Some(101L), None).toDF("k")
    val probe = call_function("bloom_might_contain", lit(b), col("k"))
    val got = df.select(probe.as("hit")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(got(0) === Some(true))
    assert(got(2) === None)
    // interpreted path (eval) agrees with the codegen'd result for real keys
    assert(Bloom.mightContain(b, 5L))
  }

  test("bloom prefilter + join equals the plain join") {
    val d = "/root/testdata/sf0.001"
    val urgent = graft.Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val agg = udaf(new BloomBuildAgg(math.max(1L, urgent.count()), 0.01), Encoders.LONG)
    val bf = urgent.agg(agg(col("o_orderkey"))).head.getAs[Array[Byte]](0)
    val li = graft.Tables.lineitem(spark, d)
    val pre = li.filter(call_function("bloom_might_contain", lit(bf), col("l_orderkey")))
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)), sum("l_quantity")).head
    val plain = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)), sum("l_quantity")).head
    assert(pre === plain)
    // and the prefilter actually prunes: bloom pass keeps ~selectivity+fpp
    val kept = li.filter(call_function("bloom_might_contain", lit(bf), col("l_orderkey"))).count()
    val total = li.count()
    assert(kept < total * 3 / 10, s"bloom kept $kept of $total — not pruning")
  }
}
