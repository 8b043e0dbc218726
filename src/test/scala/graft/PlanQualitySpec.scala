package graft

/** Plan-shape regression net over every registered query: no query may plan
  * a cartesian product, and nested-loop joins are allowed only where they
  * are the intended shape (a broadcast query-sample joined on a non-equi
  * condition). This is the failure mode that silently turns a banded join
  * into all-pairs when join keys stop resolving.
  */
class PlanQualitySpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  // non-equi broadcast joins by design: tiny broadcast side (query sample /
  // 8-byte signatures), plus the verification gates that intentionally
  // recompute an exact baseline to certify the approximate scale path
  private val nestedLoopAllowed = Set(
    // projected-space brute force: same deliberate broadcast-query-sample
    // non-equi shape as sim_cosine_topk, over 4x narrower vectors
    "sim_projected_topk",
    // the clustered JL recall gate runs the SAME broadcast-query-sample
    // non-equi top-1 scan in both spaces (full derived + projected) —
    // the brute-force certificate is the gate's point
    "proj_cluster_recall_gate",
    "sim_cosine_topk", "sim_knn_classify", "ann_lsh_topk", "ann_ivf_topk",
    "ann_ivf_append_topk", // same query path as ann_ivf_topk
    "ann_pq_topk", "ann_pq_recall_gate", "ann_sq_topk", "ann_sq_recall_gate",
    "ann_lsh_recall_gate", "ann_ivf_recall_gate", "dedup_simhash_exact_gate",
    // single-row corpus-count broadcasts (idf denominator; CMS N bound;
    // Q22's scalar average-balance threshold; Q11's scalar global-value
    // threshold; Q15's scalar max-revenue subquery)
    "text_tfidf_topk", "x5_countmin_gate", "tpch_q22", "tpch_q11", "tpch_q15",
    // composed IVF+PQ: candidate scoring is an equi-join on cell id, but
    // the recall gate re-runs the brute-force exact baseline by design
    "ann_ivfpq_topk", "ann_ivfpq_recall_gate",
    // X7 joins two single-row aggregates (exact count x unioned sketch);
    // the unigram/bigram scorers broadcast their single-row corpus totals;
    // the pHash gate joins its two one-row certificate aggregates
    "x7_hll_union_gate", "text_unigram_logprob", "text_bigram_logprob",
    "mm_phash_dedup_gate",
    // mixture_report shares sample_mixture's one-row weight-normalizer
    "mixture_report",
    // BM25 broadcasts its one-row (n_docs, total-token) corpus stats; the
    // RRF fusion inherits both BM25's stats broadcast and the exact-cosine
    // side's non-equi query-sample broadcast
    "sim_bm25_topk", "sim_bm25_append_topk", "sim_rrf_topk", "sim_hard_negatives", "sim_mmr_topk",
    // the weights-refresh maintenance verb inherits BM25's one-row
    // (n_docs, total-token) stats broadcast
    "bm25_maintain_weights",
    // the sampled swap gate inherits the exact-dense side's non-equi
    // query-sample broadcast (now over the 1-in-500 subsample)
    "sim_rrf_swap_sampled_gate",
    "sql_front_door_retrieval", "sim_rrf_ann_topk", "sim_rrf_swap_overlap",
    // the swap gate aggregates the SAME two fused pipelines as the
    // overlap report — it inherits the exact-dense side's query-sample
    // broadcast unchanged
    "sim_rrf_swap_gate",
    // the eval operator's ground truth IS the brute-force exact scan
    // (the offline-eval cost every retrieval benchmark pays); the
    // system side is the cell-pruned IVF equi-join
    "sim_eval_rank_metrics",
    // the store-fidelity gate re-runs the brute-force baseline (the same
    // tiny-broadcast inequality join) against its durable parquet copy
    "ann_index_store_gate",
    // mixture sampling broadcasts its one-row weight-normalizer aggregate;
    // basket lift cross-joins its one-row basket-count aggregate;
    // perplexity bucketing broadcasts its one-row quartile thresholds (and
    // the unigram LM's one-row token total); hybrid retrieval broadcasts
    // the query sample on a non-equi self-pairing like sim_cosine_topk
    "sample_mixture", "events_basket_lift", "sample_perplexity_mixture",
    "sim_hybrid_topk",
    // the z-order layout pass broadcasts its one-row octile cut-point
    // table onto the scan; the gate joins its two one-row span averages;
    // the t-test joins its two one-row group-moment branches; the drift
    // monitor broadcasts its one-row base-bounds and totals aggregates
    "layout_zorder", "layout_zorder_gate", "a16_welch_ttest", "dq_drift",
    // the vector-side drift monitor and the retrain gate broadcast the
    // same one-row cell-totals aggregate as dq_drift's totals
    "dq_drift_embed", "ann_retrain_gate",
    // DSIR broadcasts its one-row LM-normalizer totals (nr/nt/|V|);
    // the anchored filtered ANN, cluster report, and balanced sample all
    // score every vector against the 16-row broadcast anchor table (the
    // assignment pass of any IVF build)
    "sample_dsir", "ann_anchor_filtered_topk", "embed_cluster_stats",
    "sample_cluster_balanced")

  test("filters are pushed into the parquet scan") {
    val plan = SparkEntry.queries("p2_filter_in")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(l_returnflag"),
      s"IN-list not pushed to scan:\n$plan")
  }

  test("projections prune the scan schema to referenced columns only") {
    // 2-3 column projections over wide tables: the scan must not read the
    // full row (the brief's canonical anti-pattern)
    val cases = Seq(
      ("p1_project", Set("l_orderkey", "l_linenumber", "l_quantity")),
      ("text_quality", Set("doc_id", "text")),
      ("sample_hash", Set("doc_id", "lang", "n_chars", "text")))
    cases.foreach { case (name, want) =>
      val plan = SparkEntry.queries(name)(spark, Sf)
        .queryExecution.executedPlan.toString
      val got = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan)
        .map(_.group(1).split(",").map(_.split(":")(0)).toSet)
        .getOrElse(Set.empty[String])
      assert(got == want, s"$name scan reads $got, expected $want")
    }
  }

  test("ranked quota selection pushes the group limit below the shuffle") {
    Seq("strat_topn", "text_tfidf_topk").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, Sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"$name: rank filter not pushed to per-partition top-k:\n$plan")
    }
  }

  test("dimension lookups broadcast instead of shuffling the fact side") {
    val plan = SparkEntry.queries("j2_lookup_join")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"region dimension not broadcast:\n$plan")
  }

  test("grouping lattices expand below the partial aggregation") {
    // rollup/cube/grouping-sets must plan Expand + partial HashAggregate
    // under the exchange: the shuffle carries group rows, not an
    // |input| x |grouping sets| blowup.
    Seq("a10_rollup", "a11_cube", "a12_grouping_sets", "u9_cube").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, Sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Expand"), s"$name: no Expand in plan:\n$plan")
      val expandIdx = plan.indexOf("Expand")
      val exchangeIdx = plan.indexOf("Exchange")
      assert(exchangeIdx >= 0 && exchangeIdx < expandIdx,
        s"$name: Expand not below the exchange (partial agg missing)")
    }
  }

  test("the banded range join plans as an equi-join on the bucket key") {
    val plan = SparkEntry.queries("j5_range_join")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join degenerated to nested-loop:\n$plan")
    assert(plan.contains("Join") && plan.contains("bucket"),
      s"bucket equi-join missing:\n$plan")
  }

  test("the naive inequality band join is rewritten by the optimizer rule") {
    val plan = SparkEntry.queries("j6_range_join_auto")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"BandedRangeJoinRule did not fire:\n$plan")
    assert(plan.contains("__graft_band"),
      s"band helper columns missing from plan:\n$plan")
  }

  test("TPC-H star joins broadcast their dimension sides") {
    Seq("tpch_q3", "tpch_q5", "tpch_q7", "tpch_q8", "tpch_q10", "tpch_q14",
        "tpch_q17", "tpch_q19", "tpch_q11", "tpch_q15", "tpch_q20")
      .foreach { name =>
        val plan = SparkEntry.queries(name)(spark, Sf)
          .queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastHashJoin"),
          s"$name: no broadcast dimension join:\n$plan")
      }
  }

  test("Q20's semi-joins never shuffle the supplier dimension") {
    // the dimension side reads tiny; both semi-joins must be broadcast,
    // so the only exchange keys on the fact aggregate
    val plan = SparkEntry.queries("tpch_q20")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"),
      s"q20 lost its broadcast semi-join shape:\n$plan")
  }

  test("partitioned layout prunes the scan to the predicate's partition") {
    val plan = SparkEntry.queries("s6_partitioned_scan")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"partition predicate not pushed to directory pruning:\n$plan")
    assert(!plan.contains("PushedFilters: [IsNotNull(event_type"),
      s"event_type should prune partitions, not filter rows:\n$plan")
  }

  test("bucketed tables co-locate their join: no exchange on either join side") {
    val plan = SparkEntry.queries("s4_bucketed_join")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    // The only exchanges allowed are the post-join agg/sort ones — never a
    // hash partitioning on the join keys (that's what bucketing elides).
    assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
      !plan.contains("Exchange hashpartitioning(c_custkey"),
      s"join-side shuffle not elided by bucketing:\n$plan")
  }

  test("keyset pagination pushes its cursor predicate and takes one ordered page") {
    val plan = SparkEntry.queries("o5_keyset_page")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(o_orderkey,1000)"),
      s"cursor predicate not pushed into the parquet scan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"page should be a per-partition heap take, not a global sort:\n$plan")
  }

  test("composite keyset cursor pushes the row-value disjunction and takes one page") {
    val plan = SparkEntry.queries("o6_keyset_multi")(spark, Sf)
      .queryExecution.executedPlan.toString
    // the (date, key) > (d0, k0) row-value cursor must reach the scan as
    // Or(GreaterThan(date), And(EqualTo(date), GreaterThan(key))) — a cast
    // above the scan (e.g. a TZ literal coercing the NTZ column) breaks this
    // (the rendered PushedFilters list truncates mid-expression, so assert
    // the two leading conjuncts rather than the full inner GreaterThan)
    assert(plan.contains("PushedFilters: [Or(GreaterThan(o_orderdate") &&
      plan.contains("And(EqualTo(o_orderdate"),
      s"row-value cursor disjunction not pushed into the parquet scan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"page should be a per-partition heap take, not a global sort:\n$plan")
  }

  test("no query sorts an unbounded low-cardinality window partition") {
    // The events_gini failure mode: row_number() OVER (PARTITION BY k ...)
    // where k has O(1) distinct values sorts each key's ENTIRE slice of the
    // data in one task — a full-partition sort whose size grows with the
    // corpus, not with a bounded calendar. The net: walk every registered
    // query's optimized plan and flag any Window whose sort partitions
    // solely on known O(1)-cardinality columns of the test schema (or on
    // nothing at all — the global-sort window), unless the optimizer
    // bounded it with a WindowGroupLimit below (then each partition's
    // sorted slice is <= k rows per group and the shape is safe: that is
    // exactly why strat_topn may partition by lang but events_gini could
    // not rank by event_type).
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Window => LWindow, WindowGroupLimit}
    val lowCard = Set("event_type", "l_returnflag", "l_linestatus",
      "o_orderstatus", "r_name", "r_regionkey", "lang", "label")
    // windows over frames the plan has already REDUCED to a bounded size in
    // a way the structural checks below cannot see: the sequence-packing
    // offset roll-up sorts one row per (lang, shard) — corpus/shardSize
    // rows, not the corpus (LlmText.packSequences step 3)
    // train_manifest's offset roll-up is the same shape over per-shard rows
    val reducedFrameAllowed =
      Set("pack_sequences", "pack_sequences_bpe", "train_manifest")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        if (reducedFrameAllowed(name)) None
        else {
          val plan = fn(spark, Sf).queryExecution.optimizedPlan
          plan.collect {
            case w: LWindow
                if w.orderSpec.nonEmpty &&
                  // a WindowGroupLimit below caps each partition's sorted
                  // slice at k rows; a Limit below caps the whole frame
                  w.child.collectFirst {
                    case g: WindowGroupLimit => g
                    case l: GlobalLimit => l
                  }.isEmpty &&
                  w.partitionSpec.forall(
                    _.references.forall(a => lowCard(a.name))) =>
              val part =
                if (w.partitionSpec.isEmpty) "<global>"
                else w.partitionSpec.flatMap(_.references.map(_.name)).mkString(",")
              s"$name: ordered window over [$part]"
          }.headOption
        }
    }
    assert(offenders.isEmpty,
      "full-partition sort windows over O(1)-cardinality keys (use " +
        "Ranking.globalRank's range-exchange rank instead):\n" +
        offenders.mkString("\n"))
  }

  test("the sampled swap gate's % 500 sample reaches the query scans") {
    // r15 CONFIRMED plan bug: the 1-in-500 sample filtered ABOVE the RRF
    // fusion lands on coalesce(qid, qid) of the FullOuter USING join,
    // which Catalyst cannot push — the exact side stayed all-queries x
    // corpus (quadratic) and the 400k certificate aborted. The sample is
    // now threaded into the inputs as the query schedule; this pin holds
    // the fix: the % 500 predicate must appear in the DataFilters of the
    // embeddings AND documents query-sample scans, and no residual
    // coalesce-guarded sample filter may sit above the fusion.
    val plan = SparkEntry.queries("sim_rrf_swap_sampled_gate")(spark, Sf)
      .queryExecution.executedPlan.toString
    val embPushed =
      """DataFilters: \[[^\]]*\(vec_id#\d+L? % 500\)[^\]]*\], Format: Parquet, Location: [^,]*embeddings""".r
        .findFirstIn(plan).isDefined
    val docPushed =
      """DataFilters: \[[^\]]*\(doc_id#\d+L? % 500\)[^\]]*\], Format: Parquet, Location: [^,]*documents""".r
        .findFirstIn(plan).isDefined
    val unpushedResidue =
      """coalesce\([^)]*\) % 500""".r.findFirstIn(plan).isDefined
    assert(embPushed,
      s"% 500 sample not in the embeddings query scan's DataFilters:\n$plan")
    assert(docPushed,
      s"% 500 sample not in the documents query scan's DataFilters:\n$plan")
    assert(!unpushedResidue,
      s"unpushed coalesce-guarded sample filter above the fusion:\n$plan")
  }

  test("BM25 brute fold rides the doc_id repartition — no match-row exchange") {
    // r16 reshape (guide §2.3/§2.4): the weight index is repartitioned by
    // doc_id below the broadcast term join, so the (qid, doc_id) score fold
    // satisfies its clustered distribution with NO exchange of the exploded
    // match rows. This pin holds that shape: the plan must carry the
    // explicit doc_id repartition (REPARTITION_BY_NUM — an AQE-coalescing-
    // exempt user repartition) and must NOT re-grow an
    // Exchange hashpartitioning(qid, doc_id) of partial-agg match rows.
    val plan = SparkEntry.queries("sim_bm25_topk")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert("""hashpartitioning\(doc_id#\d+L?, \d+\), REPARTITION_BY_NUM""".r
      .findFirstIn(plan).isDefined,
      s"weight-side doc_id repartition missing from the brute plan:\n$plan")
    assert("""hashpartitioning\(qid#\d+L?, doc_id#\d+L?""".r
      .findFirstIn(plan).isEmpty,
      s"match-row (qid, doc_id) exchange re-appeared in the brute plan:\n$plan")
  }

  test("the mm dedup gate runs exactly two codec passes") {
    // r16 restructure: signature rows CARRY their four pHash segments
    // through the segment-equality join and n_media counts documents
    // directly, so the opaque mapPartitions codec pass appears exactly
    // twice (the self-join's two sides) — the old shape re-derived the
    // pHash table five times. Each codec pass is one MapPartitions node.
    val plan = SparkEntry.queries("mm_phash_dedup_gate")(spark, Sf)
      .queryExecution.executedPlan.toString
    val n = "MapPartitions".r.findAllIn(plan).size
    assert(n == 2,
      s"mm_phash_dedup_gate plans $n codec passes, expected 2:\n$plan")
  }

  test("no registered query plans a cartesian product") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, Sf).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
        !nestedLoopAllowed.contains(name)
      if (cartesian || bnlj) Some(s"$name: ${if (cartesian) "CartesianProduct" else "BroadcastNestedLoopJoin"}")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
