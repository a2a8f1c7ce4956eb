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
    "dsir_select" -> Map("documents" -> 2), // target vs raw slice
    "dsir_weights" -> Map("documents" -> 2),
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
    "quality_perceptron" -> Map("documents" -> 2), // train + score legs
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
    "decontaminate" -> Map("documents" -> 5),
    "dedup_common_span" -> Map("documents" -> 4),
    "dedup_fuzzy" -> Map("documents" -> 4),
    "dedup_ngram_jaccard" -> Map("documents" -> 2),
    "dedup_span_removal" -> Map("documents" -> 4),
    "dedup_substring" -> Map("documents" -> 4),
    "dedup_substring_runs" -> Map("documents" -> 4),
    "ret_bm25_topk" -> Map("documents" -> 4),
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

  test("allowlist names only live pack queries") {
    val unknown = allowed.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"stale allowlist entries: $unknown")
  }

  test("every pack query's per-table scan count is within its bound") {
    val violations = Seq.newBuilder[String]
    val slack = Seq.newBuilder[String]
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val counts =
        try ScanAudit.scanCounts(spark, sf0001, name)
        catch {
          case e: Throwable =>
            violations += s"$name: plan failed: ${e.getMessage}"
            Map.empty[String, Int]
        }
      counts.foreach { case (table, n) =>
        val bound = allowed.getOrElse(name, Map.empty).getOrElse(table, 1)
        if (n > bound)
          violations += s"$name: $table scanned ${n}x (bound $bound)"
        else if (n < bound)
          slack += s"$name: $table ${n}x under bound $bound"
      }
    }
    val s = slack.result()
    if (s.nonEmpty)
      info(s"ratchet candidates (count under bound): ${s.mkString("; ")}")
    val v = violations.result()
    assert(v.isEmpty,
      s"scan-count regressions (fuse the scan or document the bound):\n" +
        v.mkString("\n"))
  }
}
