package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the curation operators that the hash-compare can't express:
  * chunk coverage/overlap arithmetic, split totality and stability, and the
  * contamination check's self-consistency on a planted quote.
  */
class CurationSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  test("text_chunk covers every token: sum of stride-adjusted chunk sizes") {
    val docs = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val chunks = graft.SparkEntry.queries("text_chunk")(spark, Sf)
    // Per doc: last chunk ends at n (no orphaned tail), first starts at 1,
    // and consecutive chunks overlap by exactly 16 tokens (64 - 48) except
    // a short final chunk.
    val j = chunks.groupBy("doc_id")
      .agg(max(col("chunk_id") * 48 + col("n_tok")).as("covered"),
        count(lit(1)).as("nch"))
      .join(docs, "doc_id")
    val bad = j.filter(col("covered") < col("n")).count()
    assert(bad == 0, s"$bad docs have uncovered tail tokens")
    // chunk count formula: 1 + ceil((n-64)/48) for n>64 else 1
    val badCount = j.filter(
      col("nch") =!= when(col("n") <= 64, 1)
        .otherwise(lit(1) + ceil((col("n") - 64).cast("double") / 48.0))).count()
    assert(badCount == 0, s"$badCount docs have wrong chunk count")
  }

  test("sample_split is total, deterministic, and ~80/10/10") {
    val split1 = graft.SparkEntry.queries("sample_split")(spark, Sf)
    val n = graft.Tables.documents(spark, Sf).count()
    assert(split1.count() == n, "split must assign every document")
    val frac = split1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / n).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, s"train frac ${frac("train")}")
    assert(frac.values.sum > 0.999, "fractions must sum to 1")
    // determinism: a second evaluation assigns identically
    val split2 = graft.SparkEntry.queries("sample_split")(spark, Sf)
    assert(split1.exceptAll(split2).isEmpty && split2.exceptAll(split1).isEmpty)
  }

  test("sample_stratified keeps the non-dominant strata at a higher rate") {
    val docs = graft.Tables.documents(spark, Sf)
    val kept = graft.SparkEntry.queries("sample_stratified")(spark, Sf)
    val rates = kept.groupBy("lang").count().withColumnRenamed("count", "k")
      .join(docs.groupBy("lang").count(), "lang")
      .select(col("lang"), col("k").cast("double") / col("count"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("en") < 0.25, s"en rate ${rates("en")} should be ~0.1")
    val others = rates.filter(_._1 != "en").values
    assert(others.forall(r => r > 0.25 && r < 0.75),
      s"non-en rates $others should be ~0.5")
  }

  test("contamination flags a doc that quotes the benchmark verbatim") {
    import spark.implicits._
    // Planted corpus: doc 100 is benchmark (id % 100 == 0); doc 7 quotes 6
    // of its words verbatim; doc 8 shares no 3-gram with it.
    val docs = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (7L, "xx alpha beta gamma delta epsilon zeta yy"),
      (8L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    // Re-run the operator's logic inline against the planted table.
    val t = docs.withColumn("tk", split(col("text"), " "))
      .select(col("doc_id"), col("text"),
        array_distinct(transform(sequence(lit(0), size(col("tk")) - 3),
          i => concat_ws(" ", element_at(col("tk"), i + 1),
            element_at(col("tk"), i + 2), element_at(col("tk"), i + 3)))).as("w"))
    val bench = t.filter(col("doc_id") % 100 === 0)
      .select(explode(col("w")).as("s")).distinct()
    val hits = t.filter(col("doc_id") % 100 =!= 0)
      .select(col("doc_id"), explode(col("w")).as("s"))
      .join(broadcast(bench), "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.getOrElse(7L, 0L) == 4L,
      s"quoting doc should overlap in 4 shingles, got ${hits.get(7L)}")
    assert(!hits.contains(8L), "clean doc must not be flagged")
  }

  test("sample_dsir selects 100 docs, deterministically, biased toward the target") {
    val sel = graft.SparkEntry.queries("sample_dsir")(spark, Sf).collect()
    assert(sel.length == 100)
    assert(sel.map(_.getAs[Long]("rnk")).toSeq == (1L to 100L).toSeq,
      "ranks must be contiguous 1..100")
    val scores = sel.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "Gumbel-perturbed scores must be non-increasing in rank")
    // deterministic redraw: the Gumbel noise is a pure doc_id function
    val again = graft.SparkEntry.queries("sample_dsir")(spark, Sf)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(again == sel.map(_.getAs[Long]("doc_id")).toSeq,
      "resampling must reproduce the identical draw")
    // importance weighting must overrepresent the target domain (lang=en)
    // relative to its corpus share (fixed data: 43 vs ~38.6 at sf0.001)
    val enSel = sel.count(_.getAs[String]("lang") == "en")
    val docs = graft.Tables.documents(spark, Sf)
    val enShare = docs.filter(col("lang") === "en").count().toDouble / docs.count()
    assert(enSel > enShare * 100,
      s"selected en count $enSel not above corpus share ${enShare * 100}")
  }
}
