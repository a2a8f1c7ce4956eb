package graft

import graft.tools.ScanAudit

/** CI form of the repeated-scan audit (r12 verdict ask #1): every pack
  * query's per-table FileScan count is asserted against a recorded
  * bound, so the r12 scan fixes (text_lm_backoff 20×→checkpointed,
  * scd2_merge 7×→slim-join, q35_funnel 6×→3, q25→1, the lm_score /
  * collocations chains) cannot silently regress to their old shapes.
  *
  * The default bound is 1 — a pack query may scan each source table
  * once. Every exception lives in [[allowed]] with the measured count
  * and the reason family from the ScanAudit triage doctrine:
  *
  *  - SPLIT: the query genuinely consumes two slices of one table under
  *    different filters (ANN query/corpus splits, holdout/corpus
  *    decontamination, train/apply classifier legs, set-op branches,
  *    self-joins). Two pruned scans of disjoint row sets are the plan
  *    we want — fusing them would trade two pushed-filter scans for one
  *    full scan plus an Expand.
  *  - TEXT: the substring/span/ngram family re-reads the pruned text
  *    column per stage because corpus-sized TEXT frames stay
  *    deliberately uncached (r11 PlanSpec pin: a localCheckpoint of a
  *    100 TB text column is a full copy; pruned parquet re-reads are
  *    cheaper). Bounded by the stage count of each algorithm.
  *  - WIDTH: per-branch scans each read a DIFFERENT column set
  *    (dq_report's checks, datacard panels) — per-branch pruned scans
  *    beat one full-width materialization.
  *  - MEASURED: a single-scan variant exists and was benched SLOWER
  *    (dedup_substring_bpe's checkpoint re-ran 4× slower than the
  *    codegen'd BPE kernel per branch — reverted in r12, e8bdce4).
  *
  * When a fix lowers a count below its bound the spec stays green but
  * reports the slack, so bounds can be ratcheted down in the same
  * change that earns them.
  */
class ScanAuditSpec extends SparkSpec {

  // (query -> table -> max allowed FileScan count); absent = 1
  private val allowed: Map[String, Map[String, Int]] = Map(
    // SPLIT — two filtered slices / legs of one table
    "decontaminate_sem" -> Map("embeddings" -> 2), // corpus vs eval slice
    "dedup_against_ref" -> Map("documents" -> 3), // fresh vs ref + apply
    "dedup_apply" -> Map("documents" -> 2), // pairs leg + survivor apply
    "dedup_exact" -> Map("documents" -> 2), // winner ids + row fetch
    "dedup_keep_central" -> Map("documents" -> 2),
    "dedup_winnow_apply" -> Map("documents" -> 2),
    "feat_category_index" -> Map("events" -> 2), // vocab fit + encode
    "feat_minmax" -> Map("lineitem" -> 2), // bounds fit + apply
    "feat_standardize" -> Map("lineitem" -> 2), // moments fit + apply
    "gopher_quality_gate" -> Map("documents" -> 2), // stats + gate
    "hll_distinct" -> Map("documents" -> 2), // sketch + exact compare
    "pipeline_rlhf" -> Map("documents" -> 2), // chosen vs rejected legs
    "privacy_l_div" -> Map("orders" -> 2), // group audit + row slice
    "q12_setops" -> Map("customer" -> 2), // EXCEPT branches
    "q16_scalar_subquery" -> Map("orders" -> 2), // subquery + outer
    "q21_asof_join" -> Map("orders" -> 2), // as-of self-pair
    "q29_above_own_avg" -> Map("orders" -> 2), // per-key avg + rows
    "q30_setops_all" -> Map("customer" -> 2, "orders" -> 2), // ALL branches
    "q31_range_join" -> Map("events" -> 2), // range self-join
    "q37_retention" -> Map("events" -> 2), // cohort vs return slice
    "quality_blocklist" -> Map("documents" -> 3), // list fit + two gates
    // quality_perceptron: ONE scan since r14 (shared feats feed train
    // AND score), so the default bound of 1 applies
    "sample_es_k" -> Map("documents" -> 2), // reservoir + row fetch
    "sim_ann_ivf" -> Map("embeddings" -> 2), // query vs corpus slice
    "sim_ann_lsh" -> Map("embeddings" -> 2),
    "sim_hard_negatives" -> Map("embeddings" -> 2),
    "sim_semdedup" -> Map("embeddings" -> 2),
    "sim_topk_brute" -> Map("embeddings" -> 2),
    "ret_hybrid_ann" -> Map("embeddings" -> 2),
    "ret_hybrid_rrf" -> Map("embeddings" -> 2),
    "snap_diff" -> Map("documents" -> 3), // old vs new snapshot + diff
    "split_leakage_free" -> Map("documents" -> 2), // split vs leak check
    "sql_curate" -> Map("documents" -> 2), // curation + audit legs

    // TEXT — pruned text-column re-reads per algorithm stage
    "bpe_encode" -> Map("documents" -> 2),
    "cms_counts" -> Map("documents" -> 2),
    "decontaminate" -> Map("documents" -> 4),
    "dedup_common_span" -> Map("documents" -> 4),
    "dedup_ngram_jaccard" -> Map("documents" -> 2),
    "dedup_span_removal" -> Map("documents" -> 4),
    "dedup_substring" -> Map("documents" -> 4),
    "dedup_substring_runs" -> Map("documents" -> 4),
    "text_commonness" -> Map("documents" -> 2),
    "text_novelty" -> Map("documents" -> 4),
    "text_para_dedup" -> Map("documents" -> 4),
    "text_tfidf" -> Map("documents" -> 2),
    "tok_oov_rate" -> Map("documents" -> 2),
    "wordpiece_encode" -> Map("documents" -> 2),
    "dedup_keep_best" -> Map("documents" -> 6), // pairs + score + apply

    // WIDTH — branches each scan a different pruned column set
    "corpus_datacard" -> Map("documents" -> 4),
    "dq_report" -> Map("documents" -> 5),

    // MEASURED — single-scan variant benched slower and was reverted
    "dedup_substring_bpe" -> Map("documents" -> 12)
  )

  /** Per-query shuffle-Exchange bound (r13, the scan audit's sibling):
    * at 100 TB every shuffle is a full repartition of its frame over the
    * wire, so a query growing a shuffle is the same silent regression
    * class as a query growing a scan. Counting follows
    * [[ScanAudit.shuffleCount]]: BroadcastExchange is NOT a shuffle (it
    * is the fix), ReusedExchange is NOT counted (its shuffle already
    * counted once). Absent = 0 — zero-shuffle queries (65 of the pack)
    * stay pinned at zero. The recorded numbers are the measured sf0.001
    * plans after the r13 broadcast-hint pass (slim per-group legs —
    * datacard panel joins, heldout report legs, ANN query/seed sides —
    * are broadcast EXPLICITLY instead of riding size estimates, which
    * flip to sort-merge at real scale). The big counts are dominated by
    * partial-agg'd slim exchanges (per-language cells, vocab tables,
    * (query,item) top-k lists), not corpus-width rows; the remaining
    * SortMergeJoins in the pack are honest corpus-scale joins (anti-join
    * drop lists, full-outer snapshot diff, event funnels) that no
    * broadcast can absorb.
    */
  private val shuffleBound: Map[String, Int] = Map(
    "bpe_encode" -> 2, "c7_sql_frontend" -> 1,
    "cluster_kmeans" -> 1, "cms_counts" -> 4,
    "corpus_datacard" -> 19, "corpus_shuffle" -> 1,
    "curation_funnel" -> 2, "curriculum_order" -> 1,
    "decontaminate" -> 6, "decontaminate_report" -> 6,
    "decontaminate_sem" -> 1, "dedup_against_ref" -> 1,
    "dedup_common_span" -> 6, "dedup_exact" -> 1,
    "dedup_keep_best" -> 6,
    "dedup_keep_central" -> 10, "dedup_ngram_jaccard" -> 2,
    "dedup_rougel" -> 1, "dedup_span_removal" -> 4,
    "dedup_substring" -> 3, "dedup_substring_bpe" -> 10,
    "dedup_vs_ref_near" -> 1, "dq_report" -> 8,
    "emb_centroids" -> 1, "feat_category_index" -> 2,
    "feat_minmax" -> 1, "feat_standardize" -> 1,
    "gopher_quality_gate" -> 9, "hll_distinct" -> 4,
    "label_fleiss" -> 3, "label_kappa" -> 4,
    "label_krippendorff" -> 4, "mixture_alpha_select" -> 1,
    "mixture_resample" -> 1, "mixture_tokens" -> 1,
    "mixture_unimax_select" -> 1, "pack_chunks" -> 1,
    "pack_length_buckets" -> 3, "pack_sequences" -> 1,
    "pack_shards" -> 1, "pipeline_curate" -> 2,
    "pipeline_curate2" -> 8, "pipeline_multimodal" -> 1,
    "pipeline_rlhf" -> 3, "pipeline_sft" -> 2,
    "privacy_dp_counts" -> 1, "privacy_k_anon" -> 1,
    "privacy_l_div" -> 2, "privacy_suppress" -> 1,
    "q11_distinct" -> 1, "q12_setops" -> 2,
    "q13_rollup" -> 1, "q14_time_buckets" -> 1,
    "q15_cube" -> 1, "q16_scalar_subquery" -> 1,
    "q19_conditional_agg" -> 1, "q1_pricing_summary" -> 1,
    "q20_group_having" -> 1, "q21_asof_join" -> 2,
    "q22_percentiles" -> 1, "q23_exact_stats" -> 1,
    "q24_pivot" -> 2, "q25_approx_distinct" -> 3,
    "q26_sessionize" -> 1, "q27_union" -> 1,
    "q28_window_misc" -> 1, "q29_above_own_avg" -> 1,
    "q30_setops_all" -> 3, "q32_grouping_sets" -> 1,
    "q33_approx_percentiles" -> 1, "q34_range_frame" -> 1,
    "q35_funnel" -> 2, "q36_profile" -> 2,
    "q37_retention" -> 3, "q38_histogram" -> 1,
    "q39_skew" -> 2, "q3_revenue_by_segment" -> 1,
    "q40_saltplan" -> 1, "q41_gini_group" -> 4,
    "q4_semi_join_agg" -> 1, "q5_nation_volume" -> 1,
    "q7_theta_left_join" -> 1, "q8_window_topn_per_group" -> 1,
    "q9_window_running" -> 1, "quality_blocklist" -> 2,
    "quality_gate" -> 1, "quality_nb_buckets" -> 1,
    "quality_perceptron" -> 2,
    // ret_bitext_ann: the candidate-FED mining plan deliberately trades
    // the all-pairs path's broadcasts for shuffles because NOTHING is
    // bounded at 100 TB sides — two ivf re-rank windows, the
    // direction-union distinct, candidate-to-vector hash joins, two
    // k-NN-sum windows + joins, two max_by argmax aggregates and the
    // mutual-best semi join, every one over k-bounded slim frames
    "ret_bitext_ann" -> 11,
    // ret_bitext_lsh: the same candidate-fed mining tail (windows, k-NN
    // sum joins, argmax aggregates, mutual-best semi join) fed by two
    // hyperplane-LSH lists — per side: bucket-cap aggregate, candidate
    // distinct, re-rank window over id-keyed hash joins. All slim,
    // k-bounded frames; nothing corpus-sized shuffles twice
    "ret_bitext_lsh" -> 11,
    // ret_bitext_pq: the same candidate-fed mining tail over per-side
    // product-quantized lists — per direction the compressed code scan
    // joins shuffled LUT rows (the unbounded-queries contract: nothing
    // broadcast-bounded), partial-agg'd to slim (query, neighbor,
    // approx) rows, then the shared windows/k-NN/argmax/semi tail
    "ret_bitext_pq" -> 11,
    // ret_bitext_ingest: the SAME state-fed candidate + mining tail as
    // ret_bitext_lsh (one shared lshTopKCore + margin core), read from
    // the loop's persisted per-side parquet state instead of in-session
    // checkpoints — identical 11-shuffle shape, nothing extra
    "ret_bitext_ingest" -> 11,
    // ret_bitext_mine: two per-side k-NN windows + sums and the two
    // mutual-best windows, all over the slim checkpointed pair frame
    // (3 BIGINTs/row); the semi join and k-NN-sum joins broadcast
    "ret_bitext_mine" -> 6,
    "ret_hybrid_ann" -> 5, "ret_hybrid_rrf" -> 3,
    "s1_text_lineage" -> 1, "sample_es_k" -> 1,
    "sample_per_group" -> 1, "sel_cap_per_source" -> 1,
    "sel_ess" -> 1, "sel_pref_pairs" -> 1,
    "sft_chat_format" -> 1, "sft_loss_mask" -> 1,
    "sft_validate" -> 1, "shard_manifest" -> 1,
    "sim_ann_ivf" -> 1, "sim_ann_lsh" -> 3,
    "sim_ann_pq" -> 2, "sim_hard_negatives" -> 1,
    "sim_neardup_cosine" -> 4, "sim_semdedup" -> 12,
    "sim_topk_brute" -> 1, "snap_diff" -> 2,
    "sql_curate" -> 2, "t3_batcher_bykey" -> 1,
    "t5_pipeline_copy" -> 1, "text_boilerplate" -> 2,
    "text_collocations" -> 2, "text_commonness" -> 2,
    "text_entropy" -> 2, "text_lm_backoff" -> 3,
    "text_ppl_buckets" -> 1, "text_novelty" -> 2,
    "text_para_dedup" -> 4,
    "text_span_corrupt" -> 1, "text_tfidf" -> 4,
    "text_vocab_topk" -> 1, "text_vocab_topk_mg" -> 1,
    "text_winnow" -> 1, "tok_fertility" -> 1,
    "tok_oov_rate" -> 2, "token_budget" -> 1,
    "vocab_zipf" -> 1, "wordpiece_encode" -> 2
  )

  /** Every executedPlan string fired while `body` runs — INCLUDING the
    * eager localCheckpoint materializations, which the final plan string
    * hides behind ExistingRDD scans. The QueryExecutionListener bus is
    * async, so drain by polling for a stable count. */
  private def capturedPlans(body: => Unit): Seq[String] = {
    val plans = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      body
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var last = -1
      while (plans.size() != last && System.nanoTime() < deadline) {
        last = plans.size()
        Thread.sleep(500)
      }
    } finally spark.listenerManager.unregister(l)
    import scala.jdk.CollectionConverters._
    plans.asScala.toSeq
  }

  test("ret_bitext_ann (the candidate-fed 100 TB bitext path) has no " +
      "cartesian product or nested-loop join in ANY executed stage") {
    // THE scale claim of r15 ask #1: all-pairs bitextMine's candidate
    // stage is a documented bounded-sides crossJoin; the candidate-fed
    // path must be free of cartesians end to end — checkpointed ivf and
    // pair stages included, which is why this captures every execution
    // rather than reading the (checkpoint-truncated) final plan string.
    for (q <- Seq("ret_bitext_ann", "ret_bitext_lsh")) {
      val annPlans = capturedPlans(
        SparkEntry.queries(q)(spark, sf0001).collect())
      assert(annPlans.nonEmpty)
      val hits = annPlans.flatMap(_.split("\n")).filter(l =>
        l.contains("CartesianProduct") ||
          l.contains("BroadcastNestedLoopJoin"))
      assert(hits.isEmpty, s"$q: " + hits.mkString("\n"))
    }
    // and the all-pairs sibling still IS the documented cartesian (in
    // its checkpointed pair stage) — if this flips, the two queries no
    // longer cover distinct shapes and the ann query proves nothing
    val minePlans = capturedPlans(
      SparkEntry.queries("ret_bitext_mine")(spark, sf0001).collect())
    assert(minePlans.exists(p => p.contains("BroadcastNestedLoopJoin") ||
      p.contains("CartesianProduct")), minePlans.mkString("\n===\n"))
  }

  test("allowlist names only live pack queries") {
    val unknown = (allowed.keySet ++ shuffleBound.keySet) --
      SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"stale allowlist entries: $unknown")
  }

  test("every pack query's scan and shuffle counts are within bounds, " +
      "and the generated baseline ratchets automatically") {
    val violations = Seq.newBuilder[String]
    val slack = Seq.newBuilder[String]
    val measured = scala.collection.mutable.TreeMap[
      String, (Map[String, Int], Int)]()
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val plan =
        try SparkEntry.queries(name)(spark, sf0001)
          .queryExecution.executedPlan.toString
        catch {
          case e: Throwable =>
            violations += s"$name: plan failed: ${e.getMessage}"
            ""
        }
      val scans = ScanAudit.tableScanCounts(plan)
      scans.foreach { case (table, n) =>
        val bound = allowed.getOrElse(name, Map.empty).getOrElse(table, 1)
        if (n > bound)
          violations += s"$name: $table scanned ${n}x (bound $bound)"
        else if (n < bound)
          slack += s"$name: $table ${n}x under bound $bound"
      }
      if (plan.nonEmpty) {
        val sh = ScanAudit.shuffleCount(plan)
        val bound = shuffleBound.getOrElse(name, 0)
        if (sh > bound)
          violations += s"$name: $sh shuffles (bound $bound)"
        else if (sh < bound)
          slack += s"$name: $sh shuffles under bound $bound"
        measured(name) = (scans, sh)
      }
    }
    val s = slack.result()
    if (s.nonEmpty)
      info(s"ratchet candidates (count under bound): ${s.mkString("; ")}")

    // ---- the generated EXACT baseline (r13 VERDICT ask #7): the
    // reason-family maps above are hand-edited CEILINGS; this file pins
    // the exact measured counts, so slack under a ceiling is no longer
    // headroom for silent regression. ANY increase over the recorded
    // count fails; a decrease REWRITES the file in place (the ratchet
    // tightens in the same change that earned it — commit the diff).
    // Loosening is only possible explicitly: raise the reasoned ceiling
    // AND regenerate with SCAN_BASELINE_REGEN=1.
    val basePath = java.nio.file.Paths.get("scan_baseline.json")
    def render(m: collection.Map[String, (Map[String, Int], Int)]): String =
      m.map { case (q, (scans, sh)) =>
        val scanJson = scans.toSeq.sorted
          .map { case (t, n) => s""""$t":$n""" }.mkString("{", ",", "}")
        s"""  "$q": {"scans":$scanJson,"shuffles":$sh}"""
      }.mkString("{\n", ",\n", "\n}\n")
    val regen = sys.env.contains("SCAN_BASELINE_REGEN")
    if (!java.nio.file.Files.exists(basePath) || regen) {
      java.nio.file.Files.write(basePath, render(measured).getBytes("UTF-8"))
      info(s"scan_baseline.json ${if (regen) "regenerated" else "created"} " +
        s"(${measured.size} queries)")
    } else {
      import org.json4s._
      val base = org.json4s.jackson.JsonMethods.parse(new String(
          java.nio.file.Files.readAllBytes(basePath), "UTF-8"))
        .asInstanceOf[JObject].obj.toMap.map { case (q, v) =>
          val o = v.asInstanceOf[JObject].obj.toMap
          val scans = o("scans").asInstanceOf[JObject].obj.map {
            case (t, JInt(n)) => t -> n.toInt
            case (t, other) => fail(s"bad baseline scan count $t=$other")
          }.toMap
          val JInt(sh) = o("shuffles"): @unchecked
          q -> ((scans, sh.toInt))
        }
      var tightened = false
      measured.foreach { case (q, (scans, sh)) =>
        base.get(q) match {
          case None => tightened = true // new query: join the baseline
          case Some((bScans, bSh)) =>
            scans.foreach { case (t, n) =>
              val b = bScans.getOrElse(t, 0)
              if (n > b) violations += s"$q: $t scanned ${n}x, baseline $b" +
                " (raise the reasoned ceiling AND SCAN_BASELINE_REGEN=1)"
              else if (n < b) tightened = true
            }
            if (sh > bSh) violations += s"$q: $sh shuffles, baseline $bSh" +
              " (raise the reasoned ceiling AND SCAN_BASELINE_REGEN=1)"
            else if (sh < bSh) tightened = true
            if (bScans.keySet != scans.keySet) tightened = true
        }
      }
      if (base.keySet != measured.keySet) tightened = true // prune stale
      if (tightened && violations.result().isEmpty) {
        java.nio.file.Files.write(basePath,
          render(measured).getBytes("UTF-8"))
        info("scan_baseline.json ratcheted down — commit the diff")
      }
    }

    val v = violations.result()
    assert(v.isEmpty,
      s"plan-shape regressions (fix the plan or document the bound):\n" +
        v.mkString("\n"))
  }
}
