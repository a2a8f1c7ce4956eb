package graft.tools

import graft.{GraftSession, SparkEntry}

/** Repeated-scan audit: prints every pack query whose physical plan
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
  * r12 triage of the initial 62 rows — what got fixed vs what stays:
  *  - FIXED (value-identical, re-verified hash-exact): text_lm_backoff
  *    20× → gone (single-scan ngramIndex + index/perDoc checkpoints),
  *    dedup_substring_bpe 12× → 4× (BPE encode materialized once),
  *    scd2_merge 7× → 3× (the full-outer join no longer executes twice),
  *    q35_funnel 6× → 3× (stage cascade), text_collocations and
  *    text_lm_score / ppl chains (slim count-table checkpoints), q25.
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
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8, "scan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    val table = "([a-z_0-9]+)\\.parquet".r
    var flagged = 0
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      try {
        val p = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan.toString
        // count FileScan operator lines per source table; ReusedExchange
        // embeds its child textually but not as a separate scan line
        val scans = p.linesIterator
          .filter(l => l.contains("Scan parquet") || l.contains("FileScan"))
          .flatMap(l => table.findFirstMatchIn(l).map(_.group(1)))
          .toSeq.groupBy(identity).view.mapValues(_.size)
        scans.filter(_._2 > 1).toSeq.sortBy(_._1).foreach { case (t, n) =>
          flagged += 1
          println(s"[scan-audit] $name: $t scanned ${n}x")
        }
      } catch {
        case e: Throwable =>
          println(s"[scan-audit] $name: PLAN FAILED ${e.getMessage}")
      }
    }
    println(s"[scan-audit] == ${flagged} multi-scan (query, table) rows ==")
    spark.stop()
  }
}
