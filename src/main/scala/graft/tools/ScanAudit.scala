package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Repeated-scan audit: flags every pack query whose physical plan
  * scans the SAME source table more than once. A repeated fact-table
  * scan is the q25 shape this tool was born from (two per-leg HLL
  * estimates each reading lineitem — fused to one scan in r12): at
  * 100 TB the scan IS the cost, so every multi-scan row here is either
  * a fusion candidate or needs a documented reason (self-joins on
  * different column sets, StageMemo'd intermediates, broadcast dims
  * re-read per branch).
  *
  * Usage: runMain graft.tools.ScanAudit [sfDir]
  * Output: one line per (query, table) with scans > 1, then a summary.
  *
  * The counting logic lives in [[tableScanCounts]] so ScanAuditSpec can
  * assert every (query, table) count against a recorded bound in CI —
  * the r12 scan fixes regressing silently was the r12 verdict's #1 ask.
  *
  * r12 triage of the initial 62 rows — what got fixed vs what stays:
  *  - FIXED (value-identical, re-verified hash-exact): text_lm_backoff
  *    20× → gone (single-scan ngramIndex + index/perDoc checkpoints),
  *    scd2_merge 7× → 3× (the full-outer join no longer executes twice),
  *    q35_funnel 6× → 3× (stage cascade), text_collocations and
  *    text_lm_score / ppl chains (slim count-table checkpoints), q25.
  *  - REVERTED on measurement (the noise-banded bench gate): the
  *    dedup_substring_bpe 12× → 4× checkpoint made the query 4× slower
  *    (re-running the codegen'd BPE kernel per lazy branch beats
  *    serializing the encoded corpus), so 12× stands as measured-best.
  *  - BY DESIGN (do not "fix"): 2× ANN rows are query/corpus splits of
  *    one table under different filters; the substring/span family
  *    re-reads pruned columns because corpus-sized TEXT frames stay
  *    deliberately uncached (the r11 PlanSpec pin — a localCheckpoint of
  *    a 100 TB text column is a full copy, pruned parquet re-reads are
  *    cheaper); dq_report's checks each read a different column set, so
  *    per-check pruned scans beat one full-width materialization.
  *  The rule of thumb the fixes followed: checkpoint SLIM multiply-
  *  consumed frames (count tables, id+key aggregates, join outputs),
  *  never corpus-sized text.
  */
object ScanAudit {

  private val TableRe = "([a-z_0-9]+)\\.parquet".r

  /** Per-source-table FileScan count in a physical plan's string form.
    * ReusedExchange embeds its child textually but not as a separate
    * scan line, so reuse does not double-count; localCheckpoint reads
    * are not parquet scans and do not appear at all.
    */
  def tableScanCounts(executedPlan: String): Map[String, Int] =
    executedPlan.linesIterator
      .filter(l => l.contains("Scan parquet") || l.contains("FileScan"))
      .flatMap(l => TableRe.findFirstMatchIn(l).map(_.group(1)))
      .toSeq.groupBy(identity).view.mapValues(_.size).toMap

  /** Shuffle-Exchange count in a physical plan's string form: one per
    * `Exchange <partitioning>` operator line. BroadcastExchange is NOT
    * counted — a broadcast of a small side is the shape we WANT instead
    * of a shuffle, so counting it would penalize the fix. ReusedExchange
    * is NOT counted: the shuffle it references was already counted at
    * its definition site and costs nothing again at runtime (its line
    * also textually embeds the reused `Exchange …`, hence the whole-line
    * exclusion). At 100 TB every unit here is a full repartition of a
    * corpus-sized frame over the wire — the audit exists because shuffle
    * count, like scan count, is a plan property that silently regresses.
    */
  def shuffleCount(executedPlan: String): Int =
    executedPlan.linesIterator.count { l =>
      val i = l.indexOf("Exchange ")
      i >= 0 && !l.contains("ReusedExchange") &&
        (i == 0 || !l.charAt(i - 1).isLetter) // excludes BroadcastExchange
    }

  /** Scan counts for one pack query's executed plan at `sfDir`. Eager
    * construction steps (localCheckpoint, bounded collects) run as a
    * side effect of planning — that is the price of auditing the plan
    * the engine actually executes.
    */
  def scanCounts(spark: SparkSession, sfDir: String,
      name: String): Map[String, Int] =
    tableScanCounts(SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8, "scan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    var shuffles = 0
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      try {
        val plan = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan.toString
        tableScanCounts(plan)
          .filter(_._2 > 1).toSeq.sortBy(_._1).foreach { case (t, n) =>
            flagged += 1
            println(s"[scan-audit] $name: $t scanned ${n}x")
          }
        val sh = shuffleCount(plan)
        shuffles += sh
        println(s"[shuffle-audit] $name: $sh")
      } catch {
        case e: Throwable =>
          println(s"[scan-audit] $name: PLAN FAILED ${e.getMessage}")
      }
    }
    println(s"[scan-audit] == ${flagged} multi-scan (query, table) rows, " +
      s"$shuffles shuffles across the pack ==")
    spark.stop()
  }
}
