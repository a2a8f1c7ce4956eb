package graft

/** Physical-plan shape regression tests: the scale promises (pushdown,
  * broadcast dims, partial aggregation, top-K without global sort) must
  * fail CI if a refactor silently loses them — not just show up as a bench
  * regression. Complements graft.tools.PlanAudit (interactive sweep).
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  /** Real shuffle count: Exchange operator lines only — a ReusedExchange
    * line embeds its child as ", Exchange ..." and must not count.
    */
  private def nExchanges(p: String): Int =
    "(?m)^[\\s:+\\-*()0-9]*Exchange ".r.findAllIn(p).size

  test("q2 filter+projection reach the parquet scan") {
    val p = plan("q2_filter_project")
    assert("PushedFilters: \\[[^\\]]".r.findFirstIn(p).isDefined, p.take(500))
    assert(!p.contains("Exchange"))
  }

  test("q3/q5 star joins broadcast the dimension sides") {
    assert(plan("q3_revenue_by_segment").contains("BroadcastHashJoin"))
    assert(plan("q5_nation_volume").contains("BroadcastHashJoin"))
  }

  // Forced broadcast of an SF-scaled table (customer grows to ~15M rows at
  // sf100) OOMs at scale; only true dims (nation/region/supplier) may carry
  // an explicit hint. AQE may still *choose* broadcast at small SF — so this
  // asserts on the logical-plan hints, not the physical strategy.
  test("no broadcast hint is forced onto SF-scaled (customer-derived) inputs") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    Seq("q3_revenue_by_segment", "q5_nation_volume", "q29_above_own_avg").foreach { q =>
      val analyzed = SparkEntry.queries(q)(spark, sf0001).queryExecution.analyzed
      val hinted = analyzed.collect { case h: ResolvedHint => h }
      val badHint = hinted.exists { h =>
        val scans = h.child.collectLeaves().map(_.toString.toLowerCase)
        scans.exists(s => s.contains("customer") || s.contains("orders") ||
          s.contains("lineitem"))
      }
      assert(!badHint, s"$q forces broadcast of an SF-scaled input")
    }
  }

  test("q1 aggregation is partial (map-side) before the shuffle") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("partial_"), p.take(500))
    assert(nExchanges(p) === 1)
  }

  test("q10 global top-K plans as TakeOrdered, not a full sort") {
    val p = plan("q10_topk")
    assert(p.contains("TakeOrdered"), p.take(500))
    assert(!p.contains("Exchange"))
  }

  test("q8 per-group top-N shuffles once on the partition key") {
    val p = plan("q8_window_topn_per_group")
    assert(nExchanges(p) === 1, p.take(800))
  }

  test("map-only text analysis stays zero-exchange and codegen'd") {
    Seq("text_quality", "text_langid", "dedup_simhash", "text_repetition",
        "text_pii").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q grew a shuffle:\n${p.take(400)}")
      assert(p.contains("*("), s"$q fell out of codegen")
    }
  }

  test("dedup_vs_ref_near corpus pass is zero-exchange (suite broadcasts at build)") {
    // the reference side collapses to a broadcast inverted index at
    // DataFrame-build time; the remaining plan must be a single map-only
    // corpus scan — any KEY exchange means the decontamination pass
    // started shuffling the 100 TB side. The one allowed Exchange is
    // ensureParallelism's round-robin input-split fan-out (a no-op at
    // warehouse scale, where the input arrives pre-split).
    val p = plan("dedup_vs_ref_near")
    val keyExchanges = "(?m)^[\\s:+\\-*()0-9]*Exchange (?!RoundRobinPartitioning)"
      .r.findAllIn(p).size
    assert(keyExchanges === 0,
      s"vs-reference pass grew a key shuffle:\n${p.take(600)}")
  }

  test("e3 generic unpivot plans as a map-only Expand (zero exchange)") {
    val p = plan("e3_key_values")
    assert(p.contains("Expand"), p.take(400))
    assert(!p.contains("Exchange"), s"unpivot grew a shuffle:\n${p.take(400)}")
  }

  test("q31 range join is an equi-join with the bin in the key, no nested loop") {
    val p = plan("q31_range_join")
    assert(!p.contains("NestedLoop"), p.take(800))
    assert(!p.contains("Cartesian"), p.take(800))
    // the event_type filters must reach the parquet scan
    assert(p.contains("PushedFilters: [IsNotNull(event_type)"), p.take(800))
  }

  test("sequence packing pays exactly one exchange (the shard window)") {
    Seq("pack_sequences", "pack_chunks").foreach { q =>
      val p = plan(q)
      assert(nExchanges(p) === 1,
        s"$q should shuffle once on shard:\n${p.take(800)}")
    }
  }

  test("corpus_shuffle global rank is hash-partitioned, never SinglePartition") {
    // a naive global row_number() window would plan Exchange SinglePartition
    // and die at corpus scale; the bucketed form must keep the window
    // partitioned and pay no single-partition exchange anywhere
    val p = plan("corpus_shuffle")
    assert(p.contains("Window"), p.take(500))
    assert(!p.contains("SinglePartition"),
      s"global rank fell back to a single-partition sort:\n${p.take(800)}")
  }

  test("text_span_corrupt window is doc-partitioned; quality_nb joins without cartesian") {
    val p = plan("text_span_corrupt")
    assert(p.contains("Window"), p.take(500))
    assert(!p.contains("SinglePartition"),
      s"span ids fell into a single-partition window:\n${p.take(800)}")
    // audit the NB OPERATOR's plan directly: the quality_nb query now
    // reads the StageMemo'd fit (a checkpoint scan by design), which
    // would hide the fit's plan from this assertion
    val q = graft.llm.Classifier.naiveBayesSelfScore(
        graft.Tables(spark, sf0001).documents, "doc_id", "text",
        org.apache.spark.sql.functions.col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(!q.contains("CartesianProduct"),
      s"NB scoring planned a cartesian:\n${q.take(800)}")
    assert(q.contains("partial"), q.take(500)) // map-side combine on counts
  }

  test("pack_length_buckets rank is range-partitioned, never SinglePartition") {
    val p = plan("pack_length_buckets")
    assert(!p.contains("SinglePartition"),
      s"bucket rank fell back to a single-partition sort:\n${p.take(800)}")
  }

  test("pack_shards snake rank is range-partitioned, never SinglePartition") {
    val p = plan("pack_shards")
    assert(p.contains("Window"), p.take(500))
    assert(!p.contains("SinglePartition"),
      s"snake rank fell back to a single-partition sort:\n${p.take(800)}")
  }

  test("q36 profiling is one pass: single Expand, no SinglePartition agg") {
    // the exact multi-column ndv must plan ONE Expand over one scan —
    // a per-column plan would rescan lineitem 11 times
    val p = plan("q36_profile")
    assert("(?m)^[\\s:+\\-*()0-9]*Expand".r.findAllIn(p).size === 1, p.take(800))
    assert("FileScan".r.findAllIn(p).size === 1,
      s"profiling rescans the table:\n${p.take(800)}")
  }

  test("q35 funnel keys every stage on user_id — no window, no sort-merge") {
    // conditional-min stages must stay hash aggregations over user_id
    // joins; a window-based funnel would add per-user sorts
    val p = plan("q35_funnel")
    assert(!p.contains("Window"), p.take(800))
  }

  test("text_lm_score model joins never plan a nested loop or cartesian") {
    val p = plan("text_lm_score")
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the single-row vocab count is the only nested-loop (broadcast) join
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(800))
  }

  test("sel_cap_per_source pushes the cap below the exchange (WindowGroupLimit)") {
    val p = plan("sel_cap_per_source")
    // the rank<=n filter must run on the map side too: partial
    // WindowGroupLimit before the exchange, so the shuffle carries
    // O(groups·n) rows, not the corpus
    assert(p.contains("WindowGroupLimit"), p.take(800))
    assert(nExchanges(p) === 1, p.take(800))
  }

  test("q25 builds both HLL legs from ONE lineitem scan") {
    // the fused two-element explode reads the fact table once; the
    // per-leg hllEstimate form this replaced scanned it twice — at
    // 100 TB the scan IS the cost
    val p = plan("q25_approx_distinct")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 1, s"q25: $scans lineitem scans\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("q33's bottom-k hash sample prunes map-side (WindowGroupLimit)") {
    // the rn <= 32 filter over (md5(id), id) must become a partial
    // WindowGroupLimit: each map task keeps ≤ 32 rows per group BEFORE
    // the shuffle, so the sample never sorts a whole group — the
    // bounded-state shape that makes the deterministic hash-sample a
    // legitimate stand-in for a KLL sketch at 100 TB
    val p = plan("q33_approx_percentiles")
    assert(p.contains("WindowGroupLimit"), p.take(800))
  }

  test("selection/mixture output plans scan the corpus exactly once") {
    // the histogram pass reads a slim localCheckpoint, not the source, so
    // the caller's final plan must contain a single documents FileScan
    // (the kept-id side is a checkpoint RDD scan) — the three-scan
    // union-of-branches shape this replaced had two, plus the histogram's
    for (name <- Seq("quality_gate", "token_budget", "mixture_resample",
        "mixture_tokens")) {
      val p = plan(name)
      val scans = "Scan parquet".r.findAllIn(p).size
      assert(scans === 1, s"$name: $scans source scans\n${p.take(1200)}")
      assert(p.contains("LeftSemi"), s"$name misses the semi join")
    }
  }

  test("text_html_clean is a zero-exchange codegen'd scan") {
    val p = plan("text_html_clean")
    assert(!p.contains("Exchange"), s"html clean grew a shuffle:\n${p.take(400)}")
    assert(p.contains("*("), "html clean fell out of codegen")
  }

  test("curriculum_order global rank is never SinglePartition") {
    // the schedule_pos rank must come from the range-partition + offset
    // trick — a plain global window would die at corpus scale
    val p = plan("curriculum_order")
    assert(p.contains("Window"), p.take(500))
    assert(!p.contains("SinglePartition"),
      s"curriculum rank fell back to a single partition:\n${p.take(800)}")
  }

  test("sim_hard_negatives broadcasts the query side, prunes rank early") {
    // the θ-condition (id ≠, label ≠) forces a nested-loop join — it must
    // be the BROADCAST kind (tiny query set) so the corpus side streams,
    // and the top-k must prune map-side via WindowGroupLimit
    val p = plan("sim_hard_negatives")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size === 1, p.take(800))
    assert(p.contains("WindowGroupLimit"), p.take(800))
  }

  test("dsir model joins never plan a cartesian; totals are the only BNLJs") {
    val p = plan("dsir_weights")
    assert(!p.contains("CartesianProduct"), p.take(800))
    // two single-row totals (target, raw) are the only nested-loop joins
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p.take(800))
  }

  test("gopher_quality_gate: no cartesian, partial aggregation everywhere") {
    val p = plan("gopher_quality_gate")
    assert(!p.contains("CartesianProduct"), p.take(800))
    // every groupBy must combine map-side before its exchange
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"gopher aggregation lost its partial phase:\n${p.take(800)}")
  }

  test("ret_bm25_topk: idf model broadcasts, no cartesian, top-k prunes early") {
    // the pack query returns the StageMemo'd checkpoint (r13 shared-fit
    // sweep), so the SHAPE pin targets the underlying operator directly
    val p = graft.llm.Retrieval.bm25TopK(
        Tables(spark, sf0001).documents, "doc_id", "text",
        graft.queries.CurationOps.Bm25Queries, 10)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the query-term/idf model joins postings as a broadcast hash join —
    // the corpus-sized posting side must stream, never shuffle against a
    // few dozen model rows
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    // per-query top-k prunes below the exchange
    assert(p.contains("WindowGroupLimit"), p.take(800))
  }

  test("cluster_kmeans: final assignment is a map-only kernel — no join, " +
      "no exchange") {
    // r17: the per-iteration crossJoin(broadcast(centroids)) + argmin
    // aggregation became a mapPartitions kernel closing over the k
    // centroids (two shuffles/iteration removed); the final-assignment
    // plan must stay join-free AND exchange-free
    val p = plan("cluster_kmeans")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("Join"), p.take(800))
    assert(!p.contains("Exchange"), p.take(800))
    assert(p.contains("MapPartitions"), p.take(800))
  }

  test("text_collocations: top-k is TakeOrdered, never a global sort") {
    val p = plan("text_collocations")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("text_lm_backoff: index lookups hash-join; the 1-row total is the only BNLJ") {
    val p = plan("text_lm_backoff")
    assert(!p.contains("CartesianProduct"), p.take(800))
    // five level-key lookups against the n-gram index must be hash joins
    // (model-sized frames, never nested loops over the vocab)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      p.take(800))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(800))
  }

  test("text_ppl_buckets: tercile window partitions by language, never globally") {
    val p = plan("text_ppl_buckets")
    // the ntile window spec itself must carry the language partition key
    // (the only SinglePartition allowed elsewhere is the 1-row vocab count)
    assert(p.contains("windowspecdefinition(lang"),
      s"per-language ntile degraded to a global window:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("ret_hybrid_rrf: seeds broadcast against the corpus; fusion has no cartesian") {
    val p = plan("ret_hybrid_rrf")
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the |queries|-row quantized seed side must broadcast into the dense
    // scoring cross join — the corpus side streams
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("image/audio hash pairing is an equi-join on chunks, never cartesian") {
    import spark.implicits._
    val media = (0L until 8L)
      .map(i => (i, graft.llm.ImageHash.synthPng(i, 64, 48)))
      .toDF("media_id", "media")
    val ip = graft.llm.ImageHash.nearDupPairs(
        graft.llm.ImageHash.imageHashes(media, "media_id", "media"))
      .queryExecution.executedPlan.toString
    assert(!ip.contains("CartesianProduct") &&
      !ip.contains("BroadcastNestedLoopJoin"), ip.take(800))
    val clips = (0L until 8L)
      .map(i => (i, graft.llm.AudioHash.synthWav(i, 22050)))
      .toDF("media_id", "media")
    val ap = graft.llm.AudioHash.nearDupPairs(
        graft.llm.AudioHash.audioHashes(clips, "media_id", "media"))
      .queryExecution.executedPlan.toString
    assert(!ap.contains("CartesianProduct") &&
      !ap.contains("BroadcastNestedLoopJoin"), ap.take(800))
  }

  test("dedup_fuzzy: candidate generation is an equi-join on (segment, slot, length)") {
    val p = plan("dedup_fuzzy")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("snap_diff: one keyed join over digests, no cartesian") {
    val p = plan("snap_diff")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    // digests are computed map-side: the join keys/payload are
    // (doc_id, md5), never the document body
    assert(p.contains("md5"), p.take(800))
  }

  test("tok_oov_rate: the vocab joins as a broadcast membership flag") {
    val p = plan("tok_oov_rate")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("rank_bt: MM rounds are hash joins on ids, never cartesian") {
    val p = plan("rank_bt")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("sample_es_k: the top-k rank pushes below the exchange") {
    val p = plan("sample_es_k")
    assert(p.contains("WindowGroupLimit"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("cms_counts and hll_distinct aggregate with map-side partials, no cartesian") {
    Seq("cms_counts", "hll_distinct").foreach { q =>
      val p = plan(q)
      assert(p.contains("partial_"), s"$q: ${p.take(800)}")
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(800)}")
    }
  }

  test("shard_manifest is one partial-agg'd aggregation — a single exchange") {
    val p = plan("shard_manifest")
    assert(nExchanges(p) === 1, p.take(800))
    assert(p.contains("partial_"), p.take(800))
  }

  test("text_scripts is map-only: zero exchanges, zero joins") {
    val p = plan("text_scripts")
    assert(nExchanges(p) === 0, p.take(800))
    assert(!p.contains("Join"), p.take(800))
  }

  test("dedup_rougel: broadcast suite + map-only corpus pass — no join operator at all") {
    // the reference pool rides a driver-collected broadcast inside the
    // kernel, so the PLAN has no join node and no corpus-keyed exchange
    // (only the ensureParallelism repartition of the scan may appear)
    val p = plan("dedup_rougel")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      p.take(800))
  }

  test("quality_perceptron: training rounds are hash joins, never cartesian") {
    val p = plan("quality_perceptron")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("label_krippendorff and tok_fertility: slim keyed aggregations, no cartesian") {
    Seq("label_krippendorff", "tok_fertility").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(800)}")
    }
  }

  test("skew/salt/ess/zipf diagnostics: keyed aggregations, no cartesian") {
    Seq("q39_skew", "q40_saltplan", "sel_ess", "vocab_zipf").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q: ${p.take(800)}")
    }
  }

  test("video queries: bucket equi-joins and broadcast kernels, never cartesian") {
    Seq("mm_video_neardup", "mm_video_decon").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(800)}")
    }
  }

  test("corpus_datacard health sheet: lang-keyed joins, partitioned windows, " +
      "no cartesian") {
    val p = plan("corpus_datacard")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    // every window in the panel is partitioned (the script-mode pick by
    // lang, the globalSortRank legs by their range-partition id) — a
    // SinglePartition window would pin a language's vocab to one task
    assert(!p.contains("SinglePartition"), p.take(800))
    assert(p.contains("partial_"), p.take(800)) // map-side combine
  }

  test("per-group gini/zipf components: range-partitioned ranks, no cartesian") {
    Seq("q41_gini_group", "vocab_zipf_lang").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q: ${p.take(800)}")
      assert(!p.contains("SinglePartition"), s"$q: ${p.take(800)}")
    }
  }

  test("sim_ann_ivf: the probe side broadcasts — the corpus assignment " +
      "never shuffles on the nCells-ary cid key") {
    // The IVF candidate join keys on cid, which has only nCells distinct
    // values: a shuffle join would funnel the whole corpus assignment
    // through nCells reducer keys (a guaranteed hotspot at scale). The
    // bounded (queries × nProbe) probe side must broadcast instead, and
    // no shuffle in the plan may hash-partition on cid alone.
    val p = plan("sim_ann_ivf")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!"hashpartitioning\\(cid#\\d+, ".r.findFirstIn(p).isDefined,
      s"corpus assignment shuffles on the low-cardinality cid key:\n${p.take(800)}")
  }

  test("dedup_substring_runs: spans frame stays UNCACHED; self-join reuses " +
      "one exchange") {
    // The r10 4×-probe OOM lesson (CorpusStats.maximalSharedRuns): the
    // spans frame is corpus-token-sized, and pinning it (localCheckpoint
    // blocks are unevictable) starves the self-join sorts of execution
    // memory. Nothing but this pin guard stops a refactor from re-adding
    // the checkpoint: a checkpointed frame surfaces as a Scan ExistingRDD
    // leaf, so the plan must have NONE — and the two identical window-hash
    // subplans must instead collapse into a ReusedExchange, which is what
    // makes the uncached recompute cheap. At sf0.001 AQE broadcasts the
    // tiny self-join (no exchange to reuse), so the reuse half is pinned
    // under the at-scale shape: broadcast off, AQE off for this plan only.
    val p = plan("dedup_substring_runs")
    assert(!p.contains("ExistingRDD"),
      s"spans frame got pinned (localCheckpoint scan found):\n${p.take(800)}")
    val conf = spark.conf
    val (abt, aqe) = (conf.get("spark.sql.autoBroadcastJoinThreshold"),
      conf.get("spark.sql.adaptive.enabled"))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      val pScale = plan("dedup_substring_runs")
      assert(!pScale.contains("ExistingRDD"),
        s"spans frame pinned at scale shape:\n${pScale.take(800)}")
      assert(pScale.contains("ReusedExchange"),
        s"self-join no longer reuses the spans exchange:\n${pScale.take(800)}")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
      conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }

  test("GLOBAL schema sweep: no narrow numeric output columns anywhere") {
    // The driver contract normalizes integer outputs to BIGINT and
    // floating outputs to DOUBLE on both engines (OracleSafe scaladoc):
    // an int32 (Spark `year()`, a raw parquet int) or float32 column
    // hash-mismatches DuckDB even when values agree — it cost
    // text_lm_score two red rounds. Sweep every query's OUTPUT schema so
    // the next narrow column fails CI, not the round artifact.
    import org.apache.spark.sql.types.{ByteType, FloatType, IntegerType, ShortType}
    val narrow: Set[org.apache.spark.sql.types.DataType] =
      Set(IntegerType, ShortType, ByteType, FloatType)
    val failures = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      SparkEntry.queries(name)(spark, sf0001).schema.fields.collect {
        case f if narrow(f.dataType) => s"$name.${f.name}: ${f.dataType}"
      }
    }
    assert(failures.isEmpty,
      "narrow numeric output columns (cast to BIGINT/DOUBLE):\n" +
        failures.mkString("\n"))
  }

  test("GLOBAL plan sweep: every query plans; no CartesianProduct anywhere; " +
      "partition-less windows only in the documented bounded set") {
    // The per-query pins above check the plans we worried about; this
    // sweep locks the two unconditional 100 TB invariants across the
    // WHOLE pack, so a new query (or a refactor of a shared helper)
    // cannot quietly introduce an all-pairs product or pin a corpus to
    // one task through an unpartitioned window. Tree-walk on the
    // pre-AQE physical plan (incl. subquery plans) — string matching
    // can't tell a 1-row aggregate's SinglePartition exchange (fine)
    // from an unpartitioned window (not fine).
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    // the ONLY two partition-less windows in the pack, both over frames
    // bounded by construction, never by data volume:
    //  - feat_category_index ranks the DISTINCT category dimension
    //    (ml/Features.categoryIndex — category-cardinality rows)
    //  - text_collocations ranks AFTER `.limit(k)` (CorpusStats
    //    .collocations — ≤ k rows)
    val partitionlessOk = Set("feat_category_index", "text_collocations")
    val failures = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      try {
        val p = SparkEntry.queries(name)(spark, sf0001)
          .queryExecution.sparkPlan
        val carts = p.collectWithSubqueries {
          case c: CartesianProductExec => c.nodeName
        }
        val windows = p.collectWithSubqueries {
          case w: WindowExec if w.partitionSpec.isEmpty => "Window"
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
            "WindowGroupLimit"
        }
        carts.map(c => s"$name: $c") ++
          (if (partitionlessOk(name)) Nil
           else windows.map(w => s"$name: partition-less $w"))
      } catch {
        case e: Throwable => Seq(s"$name: failed to plan — ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("ivfTopK(boundedQueries = false): AQE skew-split FIRES on the " +
      "cid probe join when one cell holds half the corpus (runtime " +
      "proof), and the red case shows the knob is load-bearing") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    // The unbounded corpus-mining mode's scaladoc (Similarity.scala)
    // leans on "AQE's skew split handles a hot cell" — this proves the
    // claim at runtime (the r13 skew-join idiom, f69cd9c, extended to
    // the actual operator): plant a degenerate geometry where HALF the
    // corpus shares one direction (identical int8 quantization → one
    // k-means cell), run the shuffled probe join, and assert the
    // executed adaptive plan split the hot cid partition instead of
    // landing it on one straggler task. Thresholds are lowered so
    // probe-scale bytes qualify (the ratios are what a cluster tunes);
    // broadcast is disabled because at the 100 TB contract NEITHER side
    // fits — AQE upgrading this test's small sides to broadcast would
    // bypass the very machinery under proof.
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // ids < 20000: one shared direction (identical vectors → identical
      // q8 → one cell); ids ≥ 20000: spread across varied directions
      def geom(nHot: Int, nRest: Int, idOffset: Long) =
        spark.range(nHot + nRest)
          .select((col("id") + idOffset).as("vec_id"), col("id").as("i"))
          .withColumn("embedding", expr(
            s"""CASE WHEN i < $nHot
               |  THEN transform(sequence(0, 15), j ->
               |    CAST(CASE WHEN j = 0 THEN 100.0 ELSE 1.0 END AS DOUBLE))
               |  ELSE transform(sequence(0, 15), j ->
               |    CAST(pmod(i * (j + 7), 97) AS DOUBLE) - 48.0)
               |END""".stripMargin))
          .drop("i")
      val corpus = geom(20000, 20000, 0L).localCheckpoint()
      val queries = geom(200, 200, 1000000L).localCheckpoint()
      def run() = {
        val res = graft.llm.Similarity.ivfTopK(queries, corpus, k = 4,
          nCells = 8, nProbe = 2, boundedQueries = false)
        assert(res.collect().nonEmpty)
        res.queryExecution.executedPlan.toString
      }
      val finalPlan = run()
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(300))
      val skewLines = finalPlan.split("\n").filter(_.contains("skew=true"))
      assert(skewLines.nonEmpty,
        "the hot cell's partition was NOT split — AQE skew handling " +
          s"never fired on the probe join:\n${finalPlan.take(1500)}")
      // attribution: the split is on the cid-keyed probe join, not some
      // incidental high-cardinality join
      assert(skewLines.exists(_.contains("cid")),
        s"skew=true fired, but not on the cid probe join:\n" +
          skewLines.mkString("\n"))
      // red case: with the knob off the same geometry must NOT split —
      // proving the green case measured the knob, not a plan accident
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      assert(!run().contains("skew=true"),
        "skew=true with skewJoin.enabled=false — the green assertion " +
          "is not measuring AQE skew handling")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("the bench calibration probe executes the machinery it times") {
    // v1 of the probe consumed its plan via count(): EliminateSorts
    // dropped the orderBy and column pruning removed the sum/count
    // aggregates, so the probe timed a plan with the very machinery
    // under measurement optimized away (review finding, r16). v2
    // collect()s and checksums the 4096 sorted rows — the checksum
    // require inside calibrate() fails if the aggregates or ordering
    // ever stop executing, and this case drives it under a live session
    val s = Bench.calibrate(spark)
    assert(s > 0.0 && s < 60.0, s"calibration probe read $s s")
  }

  test("AQE skew-join ENGAGES under the session config (runtime proof)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{concat, lit, pmod, when}
    // GraftSession turns spark.sql.adaptive.skewJoin.enabled on; this
    // proves the knob actually FIRES at runtime — a skewed sort-merge
    // join must show skew=true in the final adaptive plan, meaning the
    // hot partition was split instead of landing on one straggler task.
    // Thresholds are lowered so probe-scale bytes qualify as skew (the
    // ratios, not the absolute sizes, are what a real cluster tunes);
    // broadcast is disabled to force the SMJ that skew handling targets.
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val pad = "x" * 64
      // key 0 carries ~100x the rows of every other key
      val left = spark.range(120000)
        .select((when($"id" < 100000L, 0L).otherwise(pmod($"id", lit(100))))
          .as("k"), concat(lit(pad), $"id".cast("string")).as("payload"))
      val right = spark.range(100)
        .select($"id".as("k"), concat(lit("r"), $"id").as("rv"))
      val joined = left.join(right, "k")
      // collect() drives THIS DataFrame's own queryExecution — count()
      // would execute a different plan instance and leave the inspected
      // adaptive plan unexecuted (isFinalPlan=false)
      assert(joined.collect().length === 120000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(300))
      assert(finalPlan.contains("skew=true"),
        "the skewed partition was NOT split — AQE skew-join never " +
          s"fired:\n${finalPlan.take(1200)}")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
