package graft.queries

import graft.SparkSpec
import org.apache.spark.SparkException
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-shape checks for the LLM-pipeline curation operators:
  *  - packSequences' sharded two-phase prefix sum must equal the naive
  *    single-window-per-language form on millions of rows while actually
  *    spreading each language over many window partitions;
  *  - blockedJaccard's bucket-cardinality guard must fail loudly on a hot
  *    bucket and stay invisible on a cold one. */
class LlmScaleSpec extends SparkSpec {

  test("packSequences: sharded prefix sum == naive per-lang window on 5M rows") {
    val n = 5000000L
    // deterministic synthetic corpus: 4 languages interleaved by doc_id,
    // token counts varying 1..7 so bin boundaries land irregularly
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      element_at(array(lit("en"), lit("de"), lit("es"), lit("fr")),
        (col("id") % 4 + 1).cast("int")).as("lang"),
      concat_ws(" ", expr("array_repeat('tok', cast(id % 7 + 1 as int))"))
        .as("text"))

    val sharded = LlmText.packSequences(docs, budget = 2048L, shardSize = 1024L)

    // shard key fans each language out over many window partitions
    val shardsPerLang = docs
      .groupBy(col("lang"), floor(col("doc_id") / 1024).as("shard"))
      .count().groupBy("lang").count().agg(min("count")).head().getLong(0)
    assert(shardsPerLang > 1000, s"expected thousands of shards per lang, got $shardsPerLang")

    val naiveW = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(naiveW))
      .select(col("doc_id"),
        floor((col("cum_tokens") - 1) / 2048).cast("long").as("naive_bin"))

    val mismatches = sharded.join(naive, "doc_id")
      .filter(col("bin_id") =!= col("naive_bin")).count()
    assert(mismatches == 0L, s"$mismatches docs binned differently")
    assert(sharded.count() == n)
  }

  test("repetitionGrams survives ANSI mode on documents shorter than 3 tokens") {
    // plain element_at would abort the job under Spark 4's default ANSI
    // mode for 1- and 2-token docs; try_element_at + concat_ws must match
    // DuckDB's [i] + concat_ws semantics instead
    val docs = spark.createDataFrame(Seq(
      (1L, "one"), (2L, "two words"), (3L, "three word doc"))).toDF("doc_id", "text")
    val grams = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("g", LlmText.repetitionGrams)
      .select("doc_id", "g")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(grams(1L) == Seq("one"))
    assert(grams(2L) == Seq("two words"))
    assert(grams(3L) == Seq("three word doc"))
  }

  test("piiScrub redacts emails, phones, and IPs and counts them") {
    // the corpus testdata carries no PII, so the driver hash-check alone
    // would pass vacuously — this pins the patterns actually firing
    val docs = spark.createDataFrame(Seq(
      (1L, "contact bob.smith+x@example.co.uk or call +1 555 867-5309 now"),
      (2L, "server at 192.168.0.1 and 10.0.0.255 mirrors a@b.io"),
      (3L, "no pii here at all"))).toDF("doc_id", "text")
    val out = LlmText.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out(1L) == (("contact <EMAIL> or call <PHONE> now", 1L, 1L, 0L)), out(1L))
    assert(out(2L) == (("server at <IP> and <IP> mirrors <EMAIL>", 1L, 0L, 2L)), out(2L))
    assert(out(3L) == (("no pii here at all", 0L, 0L, 0L)))
  }

  test("events_asof tie assumption: (user_id, ts) is collision-free in testdata") {
    // events_asof's hash parity with DuckDB's ASOF JOIN rests on no two
    // events of a user sharing a timestamp (at a tie, Spark's (ts, event_id)
    // window order and DuckDB's c.ts >= p.ts could legitimately differ).
    // Pin that data property at the SFs the driver verifies at, so
    // regenerated testdata flips this test instead of a silent hash mismatch.
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val dups = graft.Tables.events(spark, sf)
        .groupBy("user_id", "ts").count().filter(col("count") > 1).count()
      assert(dups == 0L, s"$sf has $dups (user_id, ts) collisions — " +
        "events_asof's DuckDB-ASOF oracle parity is no longer guaranteed")
    }
  }

  test("blockedJaccard: hot bucket fails with a routing message, cold bucket works") {
    // 50 docs in one length bucket (n_chars=100 -> bkt 1), two exact dups
    val docs = spark.range(50).select(
      col("id").as("doc_id"),
      lit(100L).as("n_chars"),
      when(col("id") < 2, lit("alpha beta gamma delta"))
        .otherwise(concat(lit("doc "), col("id"), lit(" unique words here")))
        .as("text"))

    // cold: cap above bucket size -> runs, finds exactly the planted dup pair
    val pairs = LlmText.blockedJaccard(spark, docs, maxBucketDocs = 100L)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L)),
      s"expected only the planted (0,1) dup, got ${pairs.mkString(",")}")

    // hot: cap below bucket size -> the in-plan guard must abort the job
    val e = intercept[SparkException] {
      LlmText.blockedJaccard(spark, docs, maxBucketDocs = 20L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m =>
      m != null && m.contains("dedup_blocked_jaccard: length bucket")),
      s"guard message missing from: ${messages(e).mkString(" | ")}")
  }

  test("boilerplate flags shared 8-grams and handles short docs") {
    val shared = (1 to 9).map(i => s"w$i").mkString(" ") // 9 words = two 8-grams
    val docs = spark.createDataFrame(Seq(
      (0L, s"$shared alpha beta gamma delta epsilon zeta eta theta"),
      (1L, s"$shared iota kappa lambda mu nu xi omicron pi"),
      (2L, "each word here is unique to doc two entirely and never repeats"),
      (3L, "too short") // < 8 tokens: zero grams, ratio 0
    )).toDF("doc_id", "text")
    val r = LlmText.boilerplate(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    // docs 0/1: 17 tokens -> 10 grams; grams starting at 1..2 live fully
    // inside the shared 9-word prefix and appear in both docs
    assert(r(0L) == ((10L, 2L, 0.2)), s"doc0: ${r(0L)}")
    assert(r(1L) == ((10L, 2L, 0.2)), s"doc1: ${r(1L)}")
    assert(r(2L) == ((5L, 0L, 0.0)), s"doc2: ${r(2L)}")
    assert(r(3L) == ((0L, 0L, 0.0)), s"doc3: ${r(3L)}")
  }
}
