package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data curation operators beyond the dedup/quality families in
  * [[LlmText]]: deterministic dataset splitting, per-stratum sampling,
  * fixed-window chunking with overlap, benchmark-contamination detection,
  * and the nested-type function families (higher-order array functions,
  * map-based pivot aggregation).
  *
  * Determinism convention: anything "random" is a hex-lexicographic
  * threshold on an md5 slice (same function, same text, both engines — the
  * [[LlmText]] `sample_hash` trick), so assignments are reproducible,
  * shard-stable, and oracle-checkable. No rand(), no seed state.
  *
  * Scale notes (100 TB): every operator here is a single scan plus at most
  * one key-partitioned exchange. Splits/sampling are per-row expressions
  * (no shuffle at all until the diagnostic count). Chunking explodes each
  * doc into ceil(n/stride) rows — output-proportional, no joins. The
  * contamination check broadcasts the benchmark's distinct shingle set
  * (benchmarks are MBs against a 100 TB corpus) and streams the corpus
  * through one explode+hash-join — never a corpus-corpus join.
  */
object Curation {

  /** Tokens of the synthetic corpus are space-separated words. */
  private def toks: Column = split(col("text"), " ")

  /** Distinct 3-word shingles, degenerate docs (<3 tokens) fall back to the
    * whole text — mirrors the dedup_ngram_jaccard convention so oracle SQL
    * stays aligned across the text family. */
  private def shingles(tk: Column): Column =
    when(size(tk) < 3, array(col("text")))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(tk) - 3),
        i => concat_ws(" ",
          element_at(tk, i + 1), element_at(tk, i + 2), element_at(tk, i + 3)))))

  /** The stateless per-row curation verdicts — language ID, the C4 gate,
    * the deterministic hash hold-out, and the content digest — shared
    * verbatim by the batch pipeline (`curation_e2e`) and the streaming
    * drain (`stream_curation`), so the two surfaces cannot drift. Input
    * needs (doc_id, text, n_chars); output (doc_id, lang_id, c4_verdict,
    * sampled, digest). */
  private[graft] def stagedVerdicts(docs: DataFrame): DataFrame = {
    def score(words: Seq[String]) =
      size(expr(s"filter(split(text, ' '), x -> x IN ${LlmText.inList(words)})"))
    val sDe = score(LlmText.LangStops("de")); val sEn = score(LlmText.LangStops("en"))
    val sEs = score(LlmText.LangStops("es")); val sFr = score(LlmText.LangStops("fr"))
    val g = greatest(sDe, sEn, sEs, sFr)
    val langId = when(g === 0, "und")
      .when(sDe === g, "de").when(sEn === g, "en")
      .when(sEs === g, "es").otherwise("fr")
    val nTok = size(toks)
    val meanLen = (col("n_chars") - (nTok - 1)).cast("double") / nTok
    val c4 = when(nTok < 30, "too_short")
      .when(nTok > 2000, "too_long")
      .when(meanLen < 2.0, "words_too_short")
      .when(meanLen > 12.0, "words_too_long")
      .otherwise("keep")
    docs.select(col("doc_id"), langId.as("lang_id"), c4.as("c4_verdict"),
      (substring(md5(col("text")), 1, 2) < "e0").as("sampled"),
      md5(col("text")).as("digest"))
  }

  /** The composed curation pipeline, factored so both the standalone entry
    * and the SQL front door register the SAME plan. */
  private[queries] def curationE2e(s: SparkSession, d: String): DataFrame = {
    val staged = stagedVerdicts(Tables.documents(s, d))
    val firstOfDigest = staged.groupBy("digest")
      .agg(min(col("doc_id")).as("first_id"))
    val comp = VectorOps
      .starComponents(VectorOps.minhashPairs(s, d).select("id_a", "id_b"))
      .withColumnRenamed("id", "doc_id")
    // no broadcast hints: both the digest map and the component map are
    // corpus-population-sized in the worst case — Catalyst broadcasts
    // them while small and shuffles on the high-cardinality key when not
    staged.join(firstOfDigest, Seq("digest"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang_id"), col("c4_verdict"),
        (col("doc_id") === col("first_id")).as("exact_first"),
        (coalesce(col("rep"), col("doc_id")) === col("doc_id"))
          .as("near_kept"),
        col("sampled"))
      .withColumn("final_keep",
        col("lang_id") =!= "und" && col("c4_verdict") === "keep" &&
          col("exact_first") && col("near_kept") && col("sampled"))
      .orderBy("doc_id")
  }

  /** Shared ANSI SQL for the curation front door: executed VERBATIM by
    * Spark (over the `curation_verdicts` temp view) and by DuckDB (over
    * the same name bound to the composed oracle CTEs) — the yield report
    * a curation run ends with, per (language, quality-gate) cell. Stays
    * inside the dialect intersection (CASE, CAST, count(*), GROUP BY). */
  private[graft] val SqlCurationReport: String =
    """SELECT lang_id, c4_verdict,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN final_keep THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept,
      |  CAST(sum(CASE WHEN exact_first THEN 0 ELSE 1 END) AS BIGINT)
      |    AS n_exact_dups,
      |  CAST(sum(CASE WHEN near_kept THEN 0 ELSE 1 END) AS BIGINT)
      |    AS n_near_dups
      |FROM curation_verdicts
      |GROUP BY lang_id, c4_verdict
      |ORDER BY lang_id, c4_verdict""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- the WHOLE preprocessing pipeline as ONE call ----
    // What "switch to this library" means for a training-data user: the
    // standard curation chain — language ID, C4-style quality gate, exact
    // dedup (first occurrence per content digest), near-dup resolution to
    // a canonical survivor (banded MinHash -> star CC), deterministic
    // hash hold-out — composed into a single per-document verdict table
    // with `final_keep` as the conjunction. Every stage is an operator
    // that is ALSO independently registered and oracled; the composed
    // oracle chains the same SQL fragments, so a drift in any stage OR in
    // the composition fails the hash. Plan shape: per-row codegen for
    // langid/C4/sample, one md5-keyed agg+join for exact dedup, the
    // shared pair-graph artifact + the component-map join for near-dup
    // — the union of the stages' own scale shapes, nothing extra.
    "curation_e2e" -> ((s, d) => curationE2e(s, d)),

    // ---- the data-loader END PRODUCT: curated train-split epoch manifest --
    // What a training job actually mounts: canonical near-dup survivors,
    // restricted to the train hash-split, in the reproducible shuffled
    // epoch order, packed greedily into 2048-token contexts — (doc_id,
    // pos, n_tokens, bin_id), composed from the engine's own stages
    // (dedup_canonical ∘ sample_split ∘ corpus_shuffle ∘ pack_sequences).
    // Scale shape: the union of the stages' own shapes — shared pair-graph
    // artifact + component map join, per-row split/hash expressions, the
    // range-exchange rank (never a one-reducer window), and the sharded
    // two-phase prefix sum in POS order (pos is dense, so the range shard
    // is order-preserving exactly like pack_sequences' doc_id shard; the
    // offset roll-up window sorts one row per shard — corpus/1024 rows,
    // not the corpus). The composed oracle chains the stages' own SQL.
    "train_manifest" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val comp = VectorOps.starComponents(
          VectorOps.minhashPairs(s, d).select("id_a", "id_b"))
        .withColumnRenamed("id", "doc_id")
      val train = docs.join(comp, Seq("doc_id"), "left")
        .filter(coalesce(col("rep"), col("doc_id")) === col("doc_id") &&
          substring(md5(col("text")), 1, 2) < "cc")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          ((col("doc_id") % 16777216L) * 2654435761L % 16777216L).as("h"))
      val ranked = Ranking.globalRank(train, Seq(col("h"), col("doc_id")),
        partitions = 32, rankCol = "pos")
      val t = ranked.withColumn("shard", floor(col("pos") / 1024L))
      val localW = org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy("pos")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val offW = org.apache.spark.sql.expressions.Window.orderBy("shard")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val offsets = t.groupBy("shard").agg(sum("n_tokens").as("st"))
        .withColumn("offset", coalesce(sum("st").over(offW), lit(0L)))
        .select("shard", "offset")
      t.withColumn("local_cum", sum("n_tokens").over(localW))
        .join(broadcast(offsets), Seq("shard"))
        .withColumn("cum", col("offset") + col("local_cum"))
        .select(col("doc_id"), col("pos"), col("n_tokens"),
          floor((col("cum") - 1) / 2048L).cast("long").as("bin_id"))
        .orderBy("doc_id")
    }),

    // ---- the curation chain THROUGH the SQL front door ----
    // sql_front_door proves SQL parity for relational shapes; this entry
    // extends the same contract to the LLM extension surface: the
    // composed verdict table registers as a temp view and ONE shared SQL
    // text (the per-(lang, quality) yield report a curation run ends
    // with) executes verbatim on both engines. The Spark plan under the
    // outer aggregate is curation_e2e's own — per-row verdict codegen,
    // the digest agg-join, the pair-graph component map — so the SQL
    // door reaches the full chain, not just TPC-H shapes.
    "sql_front_door_curation" -> ((s, d) => {
      curationE2e(s, d).createOrReplaceTempView("curation_verdicts")
      s.sql(SqlCurationReport)
    }),

    // ---- the curation chain ONLINE: 12th streaming drain ----
    // Stateless verdicts per arriving doc + digest-keyed state for exact
    // first-occurrence; shares stagedVerdicts with curation_e2e verbatim.
    // See EventStreams.drainCuration for the determinism argument.
    "stream_curation" -> ((s, d) =>
      graft.streaming.EventStreams.drainCuration(s, d)),

    // ---- deterministic train/val/test split (~80/10/10) ----
    // Content-hash bucketing, not row numbering: the assignment is a pure
    // per-row expression (no shuffle, no global state), stable under
    // repartitioning, re-ingestion, and incremental appends — the property
    // a training pipeline actually needs from a split.
    "sample_split" -> ((s, d) => {
      val h = substring(md5(col("text")), 1, 2) // hex-lex == numeric on [00,ff]
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
            .as("split"))
        .orderBy("doc_id")
    }),

    // ---- per-stratum hash sampling (downsample one stratum) ----
    // The language-rebalancing primitive: keep ~10% of the dominant
    // language (en) and ~50% of the rest. Same determinism as above; a
    // different md5 slice keeps it independent of sample_split's buckets.
    "sample_stratified" -> ((s, d) => {
      val thr = when(col("lang") === "en", lit("1a")).otherwise(lit("80"))
      Tables.documents(s, d)
        .filter(substring(md5(col("text")), 3, 2) < thr)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // ---- fixed-size chunking with overlap (context-window packing prep) --
    // 64-token windows, stride 48 (16-token overlap). One generator per
    // doc; chunk count is 1 + ceil((n-64)/48) so every token lands in >=1
    // chunk and the tail is never orphaned. Output keys are (doc_id,
    // chunk_id); the chunk text is carried as md5 so the compare stays
    // row-sized.
    "text_chunk" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), toks.as("tk"))
        .withColumn("n", size(col("tk")))
        .withColumn("nch",
          expr("1 + (CASE WHEN n <= 64 THEN 0 ELSE (n - 64 + 47) div 48 END)"))
        .select(col("doc_id"), col("n"),
          posexplode(expr(
            "transform(sequence(0, nch - 1)," +
              " i -> array_join(slice(tk, i * 48 + 1, 64), ' '))"))
            .as(Seq("chunk_id", "chunk")))
        .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
          least(lit(64), col("n") - col("chunk_id") * 48).cast("long").as("n_tok"),
          md5(col("chunk")).as("h"))
        .orderBy("doc_id", "chunk_id")),

    // ---- benchmark contamination check ----
    // "Is any training doc quoting the eval set?" Benchmark = every 100th
    // doc (stand-in for a held-out eval corpus). Its distinct 3-gram set is
    // broadcast; the corpus streams through explode -> hash join -> count.
    // Output: per corpus doc, how many of its distinct shingles appear in
    // the benchmark (docs with zero overlap are absent).
    "text_contamination" -> ((s, d) => {
      // tk is materialized in its own projection BEFORE the shingle lambda
      // references it: inlining split() into the lambda body re-evaluates
      // the split per element (O(n^2) per doc — the blowup the engine-wide
      // InferFiltersFromGenerate exclusion exists for).
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("text")).withColumn("tk", toks)
        .withColumn("w", shingles(col("tk")))
      val bench = t.filter(col("doc_id") % 100 === 0)
        .select(explode(col("w")).as("s")).distinct()
      t.filter(col("doc_id") % 100 =!= 0)
        .select(col("doc_id"), explode(col("w")).as("s"))
        .join(broadcast(bench), "s")
        .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
        .orderBy("doc_id")
    }),

    // ---- NEAR-dup benchmark contamination (the MinHash variant) ----
    // text_contamination counts exact shared 3-grams, so a lightly
    // PARAPHRASED benchmark passage — same content, a few words swapped —
    // slips through. This is the screen a real curation pipeline runs:
    // MinHash-band BOTH sides (32 bands x 2 rows from the shared signature
    // pass — at the 0.8 jaccard threshold a qualifying pair misses all 32
    // bands with p = (1-0.8²)^32 ≈ 6e-15), candidates are train docs
    // sharing any (band, sig) with any benchmark doc, and exact shingle
    // jaccard verifies candidates only. The benchmark side is 5% of the
    // corpus (doc_id % 20 — the 1% slice has no planted near-dups at the
    // driver's sf0.01 gate, which would make the entry vacuous), so its
    // band rows broadcast; the train side streams through one signature
    // pass + one equi-join — never train x bench pairs. The
    // oracle IS the all-pairs scan the banding avoids, so any lost
    // candidate fails the hash compare.
    "text_contamination_fuzzy" -> ((s, d) => {
      val bands = VectorOps.minhashBandRows(s, d, nBands = 32, rowsPerBand = 2)
      val bench = bands.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("bench_id"), col("band_id"), col("sig"))
      val cand = bands.filter(col("doc_id") % 20 =!= 0)
        .join(broadcast(bench), Seq("band_id", "sig"))
        .select(col("doc_id"), col("bench_id")).distinct()
      val docs = VectorOps.shingleSets(s, d)
      val wt = docs.select(col("doc_id"), col("w").as("wt"))
      val wb = docs.select(col("doc_id").as("bench_id"), col("w").as("wb"))
      cand.join(wt, "doc_id").join(broadcast(wb), "bench_id")
        .withColumn("jac",
          size(array_intersect(col("wt"), col("wb"))).cast("double") /
            size(array_union(col("wt"), col("wb"))))
        .filter(col("jac") >= 0.8)
        .select(col("doc_id"), col("bench_id"), round(col("jac"), 6).as("jac"))
        .orderBy("doc_id", "bench_id")
    }),

    // ---- fuzzy string self-join (edit distance <= 1) ----
    // The FastSS deletion-neighborhood trick, over the corpus's source
    // identifiers (the fuzzy entity-resolution shape: near-identical
    // codes/IDs): strings within levenshtein 1 necessarily share an
    // element of {s} ∪ {s minus one char}, so candidates come from an
    // equi-join on the exploded neighborhood (≈|s|+1 thin variant rows
    // per string) and exact levenshtein runs on candidates only — never
    // the key×key pair space. The key set is corpus-bounded, so this
    // survives any corpus size.
    "fuzzy_word_join" -> ((s, d) => {
      val vocab = Tables.documents(s, d)
        .select(col("source").as("w")).distinct()
      val variants = vocab.select(col("w"), explode(array_distinct(concat(
          array(col("w")),
          expr("transform(sequence(1, length(w))," +
            " i -> concat(substring(w, 1, i - 1), substring(w, i + 1, length(w))))")
        ))).as("v"))
      variants.as("a").join(variants.as("b"), Seq("v"))
        .filter(col("a.w") < col("b.w"))
        .select(col("a.w").as("w1"), col("b.w").as("w2"))
        .distinct()
        .filter(levenshtein(col("w1"), col("w2")) <= 1)
        .select(col("w1"), col("w2"),
          levenshtein(col("w1"), col("w2")).cast("long").as("dist"))
        .orderBy("w1", "w2")
    }),

    // ---- unigram log-prob scoring (perplexity-proxy quality filter) ----
    // Score each doc by the mean negative log-probability of its tokens
    // under the corpus's own unigram distribution — the cheap stand-in for
    // an LM perplexity filter. Two shuffles total: the vocabulary count
    // (partial-agg'd, vocab-sized) broadcasts back onto one exploded pass.
    // ln() can differ by an ulp across engines, so the score is rounded to
    // 6 decimals — the mean of ~hundreds of ulp-sized diffs stays far
    // below that.
    "text_unigram_logprob" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(toks).as("w"))
      val vocab = tok.groupBy("w").agg(count(lit(1)).as("cnt"))
      val total = tok.agg(count(lit(1)).as("n_total"))
      tok.join(broadcast(vocab), "w")
        .crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(round(avg(-log(col("cnt").cast("double") / col("n_total"))), 6)
          .as("avg_neg_logp"))
        .orderBy("doc_id")
    }),

    // ---- perplexity-bucketed mixture sampling ----
    // The curation move behind perplexity-filtered corpora: score every
    // doc with the unigram perplexity proxy, cut the corpus into score
    // QUARTILES (exact interpolating percentiles), and keep the
    // mid-perplexity half fully while downsampling both tails to 25%
    // (too-predictable ≈ boilerplate, too-surprising ≈ noise) via the
    // deterministic md5-slice draw. Both the rounded scores and the
    // rounded thresholds are 6-dp values proven identical across engines,
    // so bucket boundaries can't flip; one vocab broadcast + one
    // percentile agg broadcast back — no extra corpus passes.
    "sample_perplexity_mixture" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(toks).as("w"))
      val vocab = tok.groupBy("w").agg(count(lit(1)).as("cnt"))
      val total = tok.agg(count(lit(1)).as("n_total"))
      val sc = tok.join(broadcast(vocab), "w")
        .crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(round(avg(-log(col("cnt").cast("double") / col("n_total"))), 6)
          .as("score"))
      val th = sc.agg(
        round(percentile(col("score"), lit(0.25)), 6).as("t25"),
        round(percentile(col("score"), lit(0.5)), 6).as("t50"),
        round(percentile(col("score"), lit(0.75)), 6).as("t75"))
      sc.crossJoin(broadcast(th))
        .withColumn("bucket",
          when(col("score") <= col("t25"), 0)
            .when(col("score") <= col("t50"), 1)
            .when(col("score") <= col("t75"), 2).otherwise(3))
        .join(Tables.documents(s, d).select(col("doc_id"), col("text")),
          "doc_id")
        .filter(col("bucket").isin(1, 2) ||
          substring(md5(col("text")), 5, 2) < "40")
        .select(col("doc_id"), col("score"), col("bucket").cast("int"))
        .orderBy("doc_id")
    }),

    // ---- interpolated bigram log-prob (the CCNet-style LM filter) ----
    // One step past the unigram proxy: each in-doc bigram (w_{i-1}, w_i) is
    // scored p = 0.7·c(w_{i-1}w_i)/c(w_{i-1}) + 0.3·c(w_i)/N — a Jelinek-
    // Mercer interpolated bigram LM trained on the corpus itself — and the
    // doc's score is the mean negative log. Shapes at 100 TB: bigram pairs
    // leave the scan as (p, c) string pairs, the bigram count table is one
    // hash groupBy (partial-agg'd) joined back by a shuffle equi-join on
    // the pair, and the two unigram lookups broadcast (vocab-sized, like
    // text_unigram_logprob). Docs with <2 tokens have no bigrams and drop
    // out on both engines (sequence guard here, range() emptiness there).
    "text_bigram_logprob" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), toks.as("t"))
      val pairs = docs
        .filter(size(col("t")) >= 2) // sequence(1,0) would step BACKWARD
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("t")) - 1),
          i => struct(element_at(col("t"), i).as("p"),
            element_at(col("t"), i + 1).as("c")))).as("b"))
        .select(col("doc_id"), col("b.p").as("p"), col("b.c").as("c"))
      val tok = Tables.documents(s, d).select(explode(toks).as("w"))
      val uni = tok.groupBy("w").agg(count(lit(1)).as("uc"))
      val total = tok.agg(count(lit(1)).as("n_total"))
      val bc = pairs.groupBy("p", "c").agg(count(lit(1)).as("bc"))
      pairs.join(bc, Seq("p", "c"))
        .join(broadcast(uni.select(col("w").as("p"), col("uc").as("pu"))), Seq("p"))
        .join(broadcast(uni.select(col("w").as("c"), col("uc").as("cu"))), Seq("c"))
        .crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(round(avg(-log(
          lit(0.7) * col("bc") / col("pu") +
            lit(0.3) * col("cu") / col("n_total"))), 6).as("avg_neg_logp"))
        .orderBy("doc_id")
    }),

    // ---- DSIR-style importance resampling toward a target domain ----
    // Data Selection via Importance Resampling (Xie et al. 2023): score
    // every raw doc by how target-like it is — log w(x) = log p_t(x) -
    // log p_r(x) under add-1-smoothed unigram LMs fit on the target slice
    // (lang = 'en', the domain to upweight) and on the whole corpus — then
    // draw WITHOUT replacement via Gumbel-top-k: rank by lw + Gumbel noise
    // and keep the top 100. The Gumbel uses the same deterministic
    // multiplicative-hash uniform as sample_mixture (exact integer
    // arithmetic, identical both engines), so the "random" draw is
    // reproducible, shard-stable, and oracle-checkable. Scale shape: both
    // LMs are one vocab-sized groupBy broadcast back onto a single exploded
    // pass; scoring is per-row; selection is a global top-k (TakeOrdered —
    // never a full sort); the 100-row window ranks AFTER the limit.
    "sample_dsir" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tok = docs.select(col("doc_id"), col("lang"), explode(toks).as("w"))
      // ONE counting pass builds both LMs: a conditional count per word
      // gives the target counts alongside the raw counts, and the
      // normalizers (token totals, |V|) are an aggregate OF THE VOCAB
      // table — the corpus is tokenized twice total (count, then score),
      // not four times
      val lm = tok.groupBy("w").agg(
        count(lit(1)).as("cr"),
        count(when(col("lang") === "en", 1)).as("ct"))
      val st = lm.agg(sum("cr").as("nr"), sum("ct").as("nt"),
        count(lit(1)).as("v"))
      val lw = tok.join(broadcast(lm), "w").crossJoin(broadcast(st))
        .groupBy("doc_id")
        .agg(sum(
          log((col("ct") + 1).cast("double") / (col("nt") + col("v"))) -
            log((col("cr") + 1).cast("double") / (col("nr") + col("v")))).as("lw"))
      val u = ((col("doc_id") % 16777216L) * 2654435761L % 16777216L +
        lit(0.5)) / lit(16777216.0)
      val scored = lw.join(docs.select("doc_id", "lang"), "doc_id")
        .withColumn("score", round(col("lw") - log(-log(u)), 6))
        .select("doc_id", "lang", "score")
      scored.orderBy(col("score").desc, col("doc_id")).limit(100)
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("score").desc, col("doc_id"))).cast("long"))
        .orderBy("rnk")
    }),

    // ---- per-source winsorized robust stats (outlier-clipped moments) ----
    // The curation primitive for length-outlier handling: per source, find
    // the exact p05/p95 of n_chars (Spark `percentile` and DuckDB
    // `quantile_cont` both linearly interpolate — the proven a13 pairing),
    // clip every doc's length into [p05, p95], and report the winsorized
    // mean/sd. Scale shape: the percentile pass is one groupBy over the
    // handful of sources, its 3-column result broadcasts back onto the
    // corpus scan (no second shuffle of the fact side), and the moment agg
    // partial-aggregates. round(6) absorbs float-path ulps, as in a3/a13.
    "text_winsorize" -> ((s, d) => {
      val p = Tables.documents(s, d).groupBy("source")
        .agg(percentile(col("n_chars"), lit(0.05)).as("p05"),
          percentile(col("n_chars"), lit(0.95)).as("p95"))
      val clipped = least(greatest(col("n_chars").cast("double"),
        col("p05")), col("p95"))
      Tables.documents(s, d).join(broadcast(p), Seq("source"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(min(col("p05")), 6).as("p05"),
          round(min(col("p95")), 6).as("p95"),
          round(avg(clipped), 6).as("win_mean"),
          round(stddev_samp(clipped), 6).as("win_sd"))
        .orderBy("source")
    }),

    // ---- F8: higher-order array functions (transform / filter /
    // aggregate / exists / array_max) — all codegen-friendly lambda
    // expressions over a per-row array, zero shuffles. ----
    "f8_higher_order_fns" -> ((s, d) =>
      // The lens array is materialized once per row; referencing the
      // transform(split(...)) expression from all five aggregates would
      // re-tokenize the document per output column.
      Tables.documents(s, d)
        .select(col("doc_id"), transform(toks, x => length(x)).as("lens"))
        .select(
          col("doc_id"),
          size(col("lens")).cast("long").as("n_tok"),
          aggregate(col("lens"), lit(0), (a, x) => a + x).cast("long").as("sum_len"),
          size(filter(col("lens"), _ > 4)).cast("long").as("n_long"),
          array_max(col("lens")).cast("long").as("max_len"),
          exists(col("lens"), _ >= 8).as("has8"))
        .orderBy("doc_id")),

    // ---- F12: JSON round-trip (to_json → from_json/path-extract → agg) --
    // The semi-structured surface: serialize a nested struct + array per
    // event, parse it back BOTH ways (schema'd from_json and path-style
    // get_json_object), and aggregate the extracted fields. Each engine
    // serializes and parses its own JSON (wire formats differ in spacing),
    // so the hash compare pins the round-tripped VALUES — parse fidelity,
    // nested/array access, and numeric extraction. Pure per-row codegen
    // expressions + one hash agg; JSON never shuffles (only the extracted
    // columns do).
    "f12_json_roundtrip" -> ((s, d) => {
      // r17 (guide §2.5): widened — the serialize/parse round-trip is
      // per-row-expensive and ran fused into the one-row-group scan's
      // single task; spread first it runs on every core, and the groupBy's
      // partial aggregation keeps the post-projection exchange thin.
      // No-op gate at any realistic input size (Tables.widened).
      val js = Tables.widened(s, Tables.events(s, d))
        .select(col("event_id"),
          to_json(struct(
            col("user_id").as("u"),
            col("event_type").as("ty"),
            array(concat(lit("t_"), col("event_type")), lit("v2"))
              .as("tags"))).as("j"))
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "u BIGINT, ty STRING, tags ARRAY<STRING>")
      js.select(
          from_json(col("j"), schema).as("p"),
          get_json_object(col("j"), "$.tags[0]").as("tag0"))
        .groupBy(col("p.ty").as("ty"))
        .agg(count(lit(1)).as("n"),
          sum(col("p.u")).as("sum_u"),
          min(col("tag0")).as("tag0"),
          max(element_at(col("p.tags"), 2)).as("tag1"))
        .orderBy("ty")
    }),

    // ---- cross-corpus dedup (drop training docs matching the eval set) --
    // Content-identity companion of text_contamination: corpus A (90%) is
    // checked against held-out corpus B (doc_id % 10 == 0) on the sorted
    // token-set digest (the dedup_tokenset fingerprint — word-order- and
    // repetition-insensitive, so reshuffled near-copies still match). B's
    // digests broadcast (held-out sets are small); A streams through one
    // semi-join — never an A x B comparison.
    "dedup_cross_corpus" -> ((s, d) => {
      def fp: Column = md5(concat_ws(" ",
        array_sort(array_distinct(split(col("text"), " ")))))
      val digests = Tables.documents(s, d)
        .filter(col("doc_id") % 10 === 0)
        .select(fp.as("digest")).distinct()
      Tables.documents(s, d)
        .filter(col("doc_id") % 10 =!= 0)
        .withColumn("digest", fp)
        .join(broadcast(digests), Seq("digest"), "left_semi")
        .select("doc_id")
        .orderBy("doc_id")
    }),

    // ---- corpus-level n-gram statistics (top-50 bigrams) ----
    // The LM-data diagnostic: explode word bigrams, one partial-agg'd
    // count keyed by gram, per-partition top-k via TakeOrderedAndProject.
    // At 100 TB the gram key set is vocabulary^2-bounded and the shuffle
    // carries (gram, partial count) rows, not token occurrences.
    "text_ngram_counts" -> ((s, d) =>
      Tables.documents(s, d)
        .select(toks.as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(tk) - 1)," +
            " i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1)))"))
          .as("gram"))
        .groupBy("gram")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("gram"))
        .limit(50)),

    // ---- C4-style composite keep/drop filter with reasons ----
    // The curation DECISION op: each rule is a cheap per-row predicate and
    // the verdict records the FIRST failing rule (ordered by cost), so a
    // pipeline can both filter and report drop-reason distributions from
    // one pass. Pure expressions, no shuffle before the diagnostic sort.
    "text_c4_filter" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"), toks.as("tk"))
        .withColumn("n_tok", size(col("tk")))
        .withColumn("mean_len",
          (col("n_chars") - (col("n_tok") - 1)).cast("double") / col("n_tok"))
      t.select(col("doc_id"),
          when(col("n_tok") < 30, "too_short")
            .when(col("n_tok") > 2000, "too_long")
            .when(col("mean_len") < 2.0, "words_too_short")
            .when(col("mean_len") > 12.0, "words_too_long")
            .otherwise("keep").as("verdict"))
        .orderBy("doc_id")
    }),

    // ---- ordered event-path analysis (top navigation sequences) ----
    // Per-user first-5 event-type path, then path frequencies — the
    // product-analytics "common journeys" op. The per-user sequence is a
    // sort_array over a collect_list of (ts, event_id, type) structs: the
    // struct sort gives a total event-time order without a window, so the
    // whole op is two hash aggs on user_id then path. At 100 TB the
    // collect_list is bounded per user (cap first: the slice keeps 5).
    "events_paths" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(array_join(
          slice(transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))),
            x => x.getField("event_type")), 1, 5), ">").as("path"))
        .groupBy("path")
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))),

    // ---- F9: map-typed pivot aggregation ----
    // Per-user event-type counts collected into a MAP column (sorted
    // entries so the map is deterministic), then point lookups — the
    // "dynamic pivot" shape for when the column set isn't known at plan
    // time. The oracle pins the lookup semantics with FILTER counts.
    "f9_map_pivot" -> ((s, d) => {
      val counts = Tables.events(s, d)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      counts.groupBy("user_id")
        .agg(map_from_entries(
          array_sort(collect_list(struct(col("event_type"), col("c")))))
          .as("m"))
        .select(col("user_id"),
          coalesce(element_at(col("m"), "click"), lit(0L)).as("n_click"),
          coalesce(element_at(col("m"), "purchase"), lit(0L)).as("n_purchase"),
          size(col("m")).cast("long").as("n_types"))
        .orderBy("user_id")
    }),
  )

  /** The composed curation pipeline's oracle, split into its CTE chain and
    * final verdict select so curation_e2e (ordered verdict rows) and
    * sql_front_door_curation (the shared report text over the same
    * verdicts) provably replay ONE pipeline. */
  private def curationOracleCtes: String = {
    def sc(l: String) =
      s"len(list_filter(string_split(text, ' '), x -> x IN ${LlmText.inList(LlmText.LangStops(l))}))"
    s"""comp AS MATERIALIZED (
      |${VectorOps.CcFixpointOracle.linesIterator.map("  " + _).mkString("\n")}
      |),
      |st AS MATERIALIZED (
      |  SELECT doc_id, n_chars, md5(text) AS digest,
      |    substring(md5(text), 1, 2) < 'e0' AS sampled,
      |    len(string_split(text, ' ')) AS n_tok,
      |    CAST(n_chars - (len(string_split(text, ' ')) - 1) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS mean_len,
      |    ${sc("de")} AS s_de, ${sc("en")} AS s_en,
      |    ${sc("es")} AS s_es, ${sc("fr")} AS s_fr
      |  FROM documents),
      |fd AS (SELECT digest, min(doc_id) AS first_id FROM st GROUP BY digest),
      |v AS (
      |  SELECT st.doc_id,
      |    CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
      |         WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
      |         WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
      |         WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
      |         ELSE 'fr' END AS lang_id,
      |    CASE WHEN n_tok < 30 THEN 'too_short'
      |         WHEN n_tok > 2000 THEN 'too_long'
      |         WHEN mean_len < 2.0 THEN 'words_too_short'
      |         WHEN mean_len > 12.0 THEN 'words_too_long'
      |         ELSE 'keep' END AS c4_verdict,
      |    st.doc_id = fd.first_id AS exact_first,
      |    coalesce(c.cluster_rep, st.doc_id) = st.doc_id AS near_kept,
      |    st.sampled
      |  FROM st JOIN fd USING (digest)
      |  LEFT JOIN comp c USING (doc_id))""".stripMargin
  }

  private def curationOracleSelect: String =
    """SELECT doc_id, lang_id, c4_verdict, exact_first, near_kept, sampled,
      |  (lang_id != 'und' AND c4_verdict = 'keep' AND exact_first
      |   AND near_kept AND sampled) AS final_keep
      |FROM v""".stripMargin

  val oracles: Map[String, String] = Map(
    // streaming == batch: the drained verdicts must equal the batch rule
    // (first occurrence = min doc_id per digest), near-dup stage absent
    "stream_curation" -> {
      def sc(l: String) =
        s"len(list_filter(string_split(text, ' '), x -> x IN ${LlmText.inList(LlmText.LangStops(l))}))"
      s"""WITH st AS MATERIALIZED (
        |  SELECT doc_id, md5(text) AS digest,
        |    substring(md5(text), 1, 2) < 'e0' AS sampled,
        |    len(string_split(text, ' ')) AS n_tok,
        |    CAST(n_chars - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS mean_len,
        |    ${sc("de")} AS s_de, ${sc("en")} AS s_en,
        |    ${sc("es")} AS s_es, ${sc("fr")} AS s_fr
        |  FROM documents),
        |fd AS (SELECT digest, min(doc_id) AS first_id FROM st GROUP BY digest),
        |v AS (
        |  SELECT st.doc_id,
        |    CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
        |         WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
        |         WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
        |         WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
        |         ELSE 'fr' END AS lang_id,
        |    CASE WHEN n_tok < 30 THEN 'too_short'
        |         WHEN n_tok > 2000 THEN 'too_long'
        |         WHEN mean_len < 2.0 THEN 'words_too_short'
        |         WHEN mean_len > 12.0 THEN 'words_too_long'
        |         ELSE 'keep' END AS c4_verdict,
        |    st.doc_id = fd.first_id AS exact_first,
        |    st.sampled
        |  FROM st JOIN fd USING (digest))
        |SELECT doc_id, lang_id, c4_verdict, exact_first, sampled,
        |  (lang_id != 'und' AND c4_verdict = 'keep' AND exact_first
        |   AND sampled) AS final_keep
        |FROM v ORDER BY doc_id""".stripMargin
    },
    // the composed pipeline: each CTE is the SAME SQL fragment that
    // oracles the stage's standalone entry, chained
    "curation_e2e" ->
      s"""WITH $curationOracleCtes
        |$curationOracleSelect ORDER BY doc_id""".stripMargin,
    // the SAME composed CTEs bound to the view name, then the SHARED
    // front-door text verbatim — exactly what the Spark entry executes
    // over its temp view
    "sql_front_door_curation" ->
      s"""WITH $curationOracleCtes,
        |curation_verdicts AS MATERIALIZED ($curationOracleSelect)
        |$SqlCurationReport""".stripMargin,
    // composed loader manifest: canonical survivors (component fixpoint) ∘
    // train hash-split ∘ shuffle rank ∘ running-sum packing — each stage
    // the same SQL its standalone entry oracles with
    "train_manifest" ->
      s"""WITH comp AS MATERIALIZED (
        |${VectorOps.CcFixpointOracle.linesIterator.map("  " + _).mkString("\n")}
        |),
        |tr AS MATERIALIZED (
        |  SELECT d.doc_id,
        |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
        |    ((d.doc_id % 16777216) * 2654435761) % 16777216 AS h
        |  FROM documents d LEFT JOIN comp c USING (doc_id)
        |  WHERE coalesce(c.cluster_rep, d.doc_id) = d.doc_id
        |    AND substring(md5(d.text), 1, 2) < 'cc'),
        |rk AS MATERIALIZED (
        |  SELECT doc_id, n_tokens,
        |    CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS pos
        |  FROM tr)
        |SELECT doc_id, pos, n_tokens,
        |  CAST(floor((sum(n_tokens) OVER (ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
        |    / 2048.0) AS BIGINT) AS bin_id
        |FROM rk ORDER BY doc_id""".stripMargin,
    "sample_split" ->
      """SELECT doc_id, lang,
        |  CASE WHEN substring(md5(text), 1, 2) < 'cc' THEN 'train'
        |       WHEN substring(md5(text), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substring(md5(text), 3, 2) <
        |  (CASE WHEN lang = 'en' THEN '1a' ELSE '80' END)
        |ORDER BY doc_id""".stripMargin,
    "text_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, w, n,
        |    unnest(range(0, 1 + (CASE WHEN n <= 64 THEN 0
        |                         ELSE (n - 64 + 47) // 48 END))) AS chunk_id
        |  FROM t)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(least(64, n - chunk_id * 48) AS BIGINT) AS n_tok,
        |  md5(array_to_string(list_slice(w, chunk_id * 48 + 1,
        |                                 chunk_id * 48 + 64), ' ')) AS h
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "text_contamination" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN len(string_split(text, ' ')) < 3 THEN [text]
        |         ELSE list_distinct(list_transform(
        |            range(1, len(string_split(text, ' ')) - 1),
        |            i -> string_split(text, ' ')[i] || ' ' ||
        |                 string_split(text, ' ')[i + 1] || ' ' ||
        |                 string_split(text, ' ')[i + 2]))
        |    END AS w
        |  FROM documents),
        |b AS (SELECT DISTINCT unnest(w) AS s FROM t WHERE doc_id % 100 = 0),
        |c AS (SELECT doc_id, unnest(w) AS s FROM t WHERE doc_id % 100 <> 0)
        |SELECT c.doc_id, count(*) AS n_overlap
        |FROM c JOIN b USING (s)
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    // the all-pairs train x benchmark scan the MinHash banding avoids:
    // banded candidates + exact verify must reproduce it exactly
    "text_contamination_fuzzy" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN len(string_split(text, ' ')) < 3 THEN [text]
        |         ELSE list_distinct(list_transform(
        |            range(1, len(string_split(text, ' ')) - 1),
        |            i -> string_split(text, ' ')[i] || ' ' ||
        |                 string_split(text, ' ')[i + 1] || ' ' ||
        |                 string_split(text, ' ')[i + 2]))
        |    END AS w
        |  FROM documents),
        |b AS (SELECT doc_id AS bench_id, w AS wb FROM t WHERE doc_id % 20 = 0),
        |c AS (SELECT doc_id, w AS wt FROM t WHERE doc_id % 20 <> 0)
        |SELECT c.doc_id, b.bench_id,
        |  round(len(list_intersect(wt, wb))::DOUBLE
        |        / len(list_distinct(wt || wb)), 6) AS jac
        |FROM c CROSS JOIN b
        |WHERE len(list_intersect(wt, wb))::DOUBLE
        |      / len(list_distinct(wt || wb)) >= 0.8
        |ORDER BY c.doc_id, b.bench_id""".stripMargin,
    "fuzzy_word_join" ->
      """WITH v AS (SELECT DISTINCT source AS w FROM documents)
        |SELECT a.w AS w1, b.w AS w2,
        |  CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
        |FROM v a JOIN v b ON a.w < b.w
        |WHERE levenshtein(a.w, b.w) <= 1
        |ORDER BY w1, w2""".stripMargin,
    "text_unigram_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |v AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
        |t AS (SELECT count(*) AS n_total FROM tok)
        |SELECT doc_id,
        |  round(avg(-ln(CAST(cnt AS DOUBLE) / n_total)), 6) AS avg_neg_logp
        |FROM tok JOIN v USING (w), t
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "sample_perplexity_mixture" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |v AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
        |t AS (SELECT count(*) AS n_total FROM tok),
        |sc AS (
        |  SELECT doc_id,
        |    round(avg(-ln(CAST(cnt AS DOUBLE) / n_total)), 6) AS score
        |  FROM tok JOIN v USING (w), t GROUP BY doc_id),
        |th AS (SELECT round(quantile_cont(score, 0.25), 6) AS t25,
        |              round(quantile_cont(score, 0.5), 6) AS t50,
        |              round(quantile_cont(score, 0.75), 6) AS t75 FROM sc),
        |b AS (
        |  SELECT doc_id, score,
        |    CASE WHEN score <= t25 THEN 0 WHEN score <= t50 THEN 1
        |         WHEN score <= t75 THEN 2 ELSE 3 END AS bucket
        |  FROM sc, th)
        |SELECT b.doc_id, b.score, CAST(b.bucket AS INTEGER) AS bucket
        |FROM b JOIN documents d ON d.doc_id = b.doc_id
        |WHERE b.bucket IN (1, 2) OR substring(md5(d.text), 5, 2) < '40'
        |ORDER BY b.doc_id""".stripMargin,
    "text_winsorize" ->
      """WITH p AS (
        |  SELECT source,
        |    quantile_cont(n_chars, 0.05) AS p05,
        |    quantile_cont(n_chars, 0.95) AS p95
        |  FROM documents GROUP BY source)
        |SELECT source,
        |  count(*) AS n_docs,
        |  round(min(p05), 6) AS p05,
        |  round(min(p95), 6) AS p95,
        |  round(avg(least(greatest(CAST(n_chars AS DOUBLE), p05), p95)), 6)
        |    AS win_mean,
        |  round(stddev_samp(least(greatest(CAST(n_chars AS DOUBLE), p05), p95)), 6)
        |    AS win_sd
        |FROM documents JOIN p USING (source)
        |GROUP BY source ORDER BY source""".stripMargin,
    "text_bigram_logprob" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |pairs AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(2, len(t) + 1), i -> t[i - 1])) AS p,
        |    unnest(list_transform(range(2, len(t) + 1), i -> t[i])) AS c
        |  FROM t),
        |bc AS (SELECT p, c, count(*) AS bc FROM pairs GROUP BY p, c),
        |tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |uni AS (SELECT w, count(*) AS uc FROM tok GROUP BY w),
        |tot AS (SELECT count(*) AS n_total FROM tok)
        |SELECT doc_id,
        |  round(avg(-ln(0.7 * bc.bc / pu.uc + 0.3 * cu.uc / n_total)), 6)
        |    AS avg_neg_logp
        |FROM pairs
        |JOIN bc USING (p, c)
        |JOIN uni pu ON pairs.p = pu.w
        |JOIN uni cu ON pairs.c = cu.w, tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "sample_dsir" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |raw AS (SELECT w, count(*) AS cr FROM tok GROUP BY w),
        |tgt AS (SELECT w, count(*) AS ct FROM tok WHERE lang = 'en'
        |        GROUP BY w),
        |st AS (SELECT (SELECT count(*) FROM tok) AS nr,
        |              (SELECT count(*) FROM tok WHERE lang = 'en') AS nt,
        |              (SELECT count(*) FROM raw) AS v),
        |lm AS (SELECT raw.w, raw.cr, coalesce(tgt.ct, 0) AS ct
        |       FROM raw LEFT JOIN tgt USING (w)),
        |lw AS (
        |  SELECT t.doc_id,
        |    sum(ln(CAST(lm.ct + 1 AS DOUBLE) / (st.nt + st.v)) -
        |        ln(CAST(lm.cr + 1 AS DOUBLE) / (st.nr + st.v))) AS lw
        |  FROM tok t JOIN lm ON t.w = lm.w, st GROUP BY t.doc_id),
        |k AS (
        |  SELECT d.doc_id, d.lang,
        |    round(lw.lw - ln(-ln(
        |      ((d.doc_id % 16777216) * 2654435761 % 16777216 + 0.5)
        |        / 16777216.0)), 6) AS score
        |  FROM lw JOIN documents d USING (doc_id))
        |SELECT doc_id, lang, score, rnk FROM (
        |  SELECT doc_id, lang, score,
        |    row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
        |  FROM k) WHERE rnk <= 100 ORDER BY rnk""".stripMargin,
    "f8_higher_order_fns" ->
      """SELECT doc_id,
        |  CAST(len(l) AS BIGINT) AS n_tok,
        |  CAST(list_sum(l) AS BIGINT) AS sum_len,
        |  CAST(len(list_filter(l, x -> x > 4)) AS BIGINT) AS n_long,
        |  CAST(list_max(l) AS BIGINT) AS max_len,
        |  len(list_filter(l, x -> x >= 8)) > 0 AS has8
        |FROM (SELECT doc_id,
        |        list_transform(string_split(text, ' '), x -> len(x)) AS l
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "f12_json_roundtrip" ->
      """WITH j AS (
        |  SELECT to_json(struct_pack(u := user_id, ty := event_type,
        |           tags := [concat('t_', event_type), 'v2']))::VARCHAR AS j
        |  FROM events)
        |SELECT json_extract_string(j, '$.ty') AS ty,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(json_extract(j, '$.u') AS BIGINT)) AS BIGINT) AS sum_u,
        |  min(json_extract_string(j, '$.tags[0]')) AS tag0,
        |  max(json_extract_string(j, '$.tags[1]')) AS tag1
        |FROM j GROUP BY ty ORDER BY ty""".stripMargin,
    "dedup_cross_corpus" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    md5(list_aggregate(list_sort(list_distinct(string_split(text, ' '))),
        |        'string_agg', ' ')) AS digest
        |  FROM documents)
        |SELECT a.doc_id FROM f a
        |WHERE a.doc_id % 10 <> 0
        |  AND EXISTS (SELECT 1 FROM f b
        |              WHERE b.doc_id % 10 = 0 AND b.digest = a.digest)
        |ORDER BY a.doc_id""".stripMargin,
    "text_ngram_counts" ->
      """WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT unnest(list_transform(range(1, len(w)),
        |        i -> w[i] || ' ' || w[i + 1])) AS gram
        |      FROM t WHERE len(w) >= 2)
        |SELECT gram, count(*) AS n FROM g
        |GROUP BY gram ORDER BY n DESC, gram LIMIT 50""".stripMargin,
    "text_c4_filter" ->
      """SELECT doc_id,
        |  CASE WHEN n_tok < 30 THEN 'too_short'
        |       WHEN n_tok > 2000 THEN 'too_long'
        |       WHEN mean_len < 2.0 THEN 'words_too_short'
        |       WHEN mean_len > 12.0 THEN 'words_too_long'
        |       ELSE 'keep' END AS verdict
        |FROM (SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
        |        CAST(n_chars - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |          / len(string_split(text, ' ')) AS mean_len
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "events_paths" ->
      """WITH p AS (
        |  SELECT user_id,
        |    array_to_string(list(event_type ORDER BY ts, event_id)[1:5], '>')
        |      AS path
        |  FROM events GROUP BY user_id)
        |SELECT path, count(*) AS n_users FROM p
        |GROUP BY path ORDER BY n_users DESC, path""".stripMargin,
    "f9_map_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS n_click,
        |  count(*) FILTER (event_type = 'purchase') AS n_purchase,
        |  count(DISTINCT event_type) AS n_types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
