package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Cross-commit bench ratchet (r14 VERDICT ask #6), the timing twin of
  * the scan ratchet: `bench_baseline.json` records every pack query's
  * warm MEDIAN at the commit that earned it, and this spec fails CI when
  * the latest full-scale bench run (`bench_out.json`, refreshed by the
  * driver each round) exceeds a query's recorded median by the same
  * noise-banded threshold [[Bench.flaggedRegressions]] uses inside one
  * run (1.5× + 0.3 s + that query's own measured spread) — so a query
  * drifting a little every round, each step inside the adjacent-round
  * band, still trips once it leaves the band around its recorded best.
  *
  * Discipline mirrors `scan_baseline.json`: a FASTER median rewrites the
  * file in place (commit the diff — the ratchet tightens in the same
  * change that earned it); new queries join on the same rewrite; a
  * violation can only be accepted explicitly by regenerating with
  * `BENCH_BASELINE_REGEN=1` alongside a reasoned commit message.
  *
  * Scale guard: comparisons only run when bench_out.json's `sf` matches
  * the baseline's recorded sf — a local sf0.001 smoke run must neither
  * fail the gate nor silently rewrite the sf0.1 baseline with garbage.
  */
class BenchBaselineSpec extends AnyFunSuite {
  private implicit val formats: Formats = DefaultFormats

  private def readJson(p: String): Option[JValue] = {
    val path = java.nio.file.Paths.get(p)
    if (!java.nio.file.Files.exists(path)) None
    else Some(JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(path), "UTF-8")))
  }

  private def qmap(j: JValue, field: String): Map[String, Double] =
    (j \ field).asInstanceOf[JObject].obj.map {
      case (k, v) => k -> v.extract[Double]
    }.toMap

  private def render(sf: String, qs: Map[String, Double],
      calib: Option[(Double, Int)]): String = {
    val items = qs.toSeq.sortBy(_._1)
    val calibLine = calib.map { case (c, ver) =>
      s"""  "calib_sec": ${Bench.fmt(c, 3)},\n""" +
        s"""  "calib_probe_version": $ver,\n""" }.getOrElse("")
    items.map { case (k, v) => s"""    "$k": ${Bench.fmt(v, 3)}""" }
      .mkString(s"""{\n  "sf": "$sf",\n$calibLine  "queries": {\n""",
        ",\n", "\n  }\n}\n")
  }

  test("per-query warm medians are within the recorded baseline band " +
      "across commits; faster medians ratchet the baseline down") {
    val baseJ = readJson("bench_baseline.json").getOrElse(
      fail("bench_baseline.json missing — regenerate from a full-scale " +
        "bench_out.json and commit it"))
    val outJ = readJson("bench_out.json").getOrElse(
      cancel("no bench_out.json in the working tree"))
    val baseSf = (baseJ \ "sf").extract[String]
    val outSf = (outJ \ "sf").extract[String]
    if (outSf != baseSf)
      cancel(s"bench_out.json is a $outSf run; baseline records $baseSf " +
        "— local smoke runs are not comparable and must not ratchet")
    val baseline = qmap(baseJ, "queries").filter(_._2 >= 0)
    val cur = qmap(outJ, "queries")
    val spread = qmap(outJ, "spread")
    // host-calibration discount (r15 VERDICT ask #1): both files may
    // carry a fixed-work probe reading; a run whose probe is slower than
    // the recorded one is on a slow/contended host, and every timing is
    // divided by the ratio before the band check (Bench.baselineViolations
    // annotates flagged queries with the applied discount). Absent on
    // either side → scale 1 (the pre-calib behavior, the strict direction).
    // readings are only comparable at the SAME probe version: a probe
    // shape change (e.g. the v2 count()→collect() fix — v1 timed a plan
    // with the sort and aggregates optimized away) makes old calibs
    // incomparable, and a cross-version ratio could mis-scale the gate
    // in the LOOSE direction. Version mismatch → no discount (strict),
    // and the next rewrite replaces the recording with the current
    // version's.
    val baseCalib = for {
      c <- (baseJ \ "calib_sec").extractOpt[Double] if c > 0
      v <- (baseJ \ "calib_probe_version").extractOpt[Int]
        .orElse(Some(1))
    } yield (c, v)
    val curCalib = for {
      c <- (outJ \ "calib_median_sec").extractOpt[Double] if c > 0
      v <- (outJ \ "calib_probe_version").extractOpt[Int].orElse(Some(1))
    } yield (c, v)
    val calibScale = (for ((b, bv) <- baseCalib; (c, cv) <- curCalib
      if bv == cv) yield c / b).getOrElse(1.0)
    if (calibScale > 1.0)
      info(f"host calib discount ×$calibScale%.2f (run " +
        f"${curCalib.get._1}%.3f s vs recorded ${baseCalib.get._1}%.3f s)")
    if (calibScale > Bench.MaxCalibDiscount)
      info(f"WARNING: calib ratio ×$calibScale%.2f exceeds the " +
        f"×${Bench.MaxCalibDiscount}%.1f discount cap — the discount is " +
        "CLAMPED there. Either the host is pathologically contended or " +
        "an engine-global regression is inflating probe and queries " +
        "alike (the probe shares the session and cannot tell the two " +
        "apart); investigate before accepting any violation")
    for ((b, bv) <- baseCalib; (_, cv) <- curCalib if bv != cv)
      info(s"calib probe version changed ($bv → $cv): no discount " +
        "applied; the recording refreshes on the next rewrite")
    val violations = Bench.baselineViolations(baseline, cur, spread,
      calibScale)
    // recorded calib follows the recorded medians: regen records the
    // run's probe outright; a ratchet-down keeps the FASTEST host seen
    // (min) at matching versions — the medians being merged are mins
    // across runs, so the matching host reference is the fastest one,
    // and the discount stays conservative. A version change always
    // adopts the current reading (old ones are incomparable).
    def mergedCalib: Option[(Double, Int)] = (baseCalib, curCalib) match {
      case (Some((b, bv)), Some((c, cv))) if bv == cv =>
        Some((math.min(b, c), cv))
      case (b, c) => c.orElse(b)
    }
    if (sys.env.contains("BENCH_BASELINE_REGEN")) {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_baseline.json"),
        render(baseSf, cur.filter(_._2 >= 0), curCalib.orElse(baseCalib))
          .getBytes("UTF-8"))
      info(s"bench_baseline.json regenerated (${cur.size} queries)")
    } else {
      assert(violations.isEmpty,
        "bench regressions vs the committed per-query baseline (fix the " +
          "plan, or accept explicitly with BENCH_BASELINE_REGEN=1 and a " +
          "reasoned commit):\n" + violations.mkString("\n"))
      // ratchet down: faster medians, new queries, pruned stale keys,
      // and a first-time / faster calib recording
      val tightened = cur.filter(_._2 >= 0).exists { case (n, v) =>
        baseline.get(n).forall(b => v < b)
      } || (baseline.keySet -- cur.keySet).nonEmpty ||
        mergedCalib != baseCalib
      if (tightened) {
        val merged = cur.filter(_._2 >= 0).map { case (n, v) =>
          n -> math.min(v, baseline.getOrElse(n, v))
        }
        java.nio.file.Files.write(
          java.nio.file.Paths.get("bench_baseline.json"),
          render(baseSf, merged, mergedCalib).getBytes("UTF-8"))
        info("bench_baseline.json ratcheted down — commit the diff")
      }
    }
  }

  test("red case: a deliberate slowdown past the band is flagged, inside " +
      "the band is not") {
    val baseline = Map("qa" -> 2.0, "qb" -> 0.4)
    val spread = Map("qa" -> 0.2, "qb" -> 0.1)
    // qa band: 1.5*2.0 + 0.3 + 0.2 = 3.5; qb band: 0.6 + 0.3 + 0.1 = 1.0
    val flagged = Bench.baselineViolations(baseline,
      Map("qa" -> 3.6, "qb" -> 0.9), spread)
    assert(flagged.size === 1 && flagged.head.startsWith("qa:"), flagged)
    assert(Bench.baselineViolations(baseline,
      Map("qa" -> 3.4, "qb" -> 0.9), spread).isEmpty)
    // failed queries (-1 sentinels) never compare
    assert(Bench.baselineViolations(Map("qc" -> -1.0),
      Map("qc" -> 99.0), Map.empty).isEmpty)
  }

  test("red case: a slow-host (calib-inflated) run never trips the " +
      "gate, but a real +3x query on that same host flags exactly itself") {
    val baseline = Map("qa" -> 2.0, "qb" -> 0.4, "qc" -> 1.0)
    val spread = Map("qa" -> 0.1, "qb" -> 0.05, "qc" -> 0.1)
    // the whole run inflated 1.8x by host contention (the r15 driver-run
    // signature: uniform scaling, zero localized moves; 1.8 rather than
    // the verdict's illustrative 1.5 because the band's own 1.5x+0.3
    // allowance absorbs an EXACTLY-1.5x uniform inflation by
    // construction) — the big queries trip the unscaled band, nothing
    // survives the calib discount
    val slowHost = Map("qa" -> 3.6, "qb" -> 0.72, "qc" -> 1.8)
    assert(Bench.baselineViolations(baseline, slowHost, spread).nonEmpty,
      "fixture must trip WITHOUT the discount, or it proves nothing")
    assert(Bench.baselineViolations(baseline, slowHost, spread,
      calibScale = 1.8).isEmpty)
    // same slow host, but qa ALSO genuinely regressed 3x: 2.0*3*1.8 = 10.8
    // raw; after the 1.8x discount it reads 6.0 = 3x its recorded median
    // — still past the 1.5x+0.3+spread band. Exactly qa flags.
    val slowHostRealRegression = slowHost + ("qa" -> 10.8)
    val flagged = Bench.baselineViolations(baseline, slowHostRealRegression,
      spread, calibScale = 1.8)
    assert(flagged.size === 1 && flagged.head.startsWith("qa:"), flagged)
    assert(flagged.head.contains("÷1.80 host calib"), flagged)
    // the discount never runs backwards: a FASTER host (scale < 1) must
    // not deflate the band — scale clamps at 1
    assert(Bench.baselineViolations(baseline, Map("qa" -> 3.6),
      Map("qa" -> 0.2), calibScale = 0.5).nonEmpty)
    // and it never runs PAST MaxCalibDiscount (r16 advice): the probe
    // shares the session, so an engine-global 4x regression inflates
    // probe and queries alike — uncapped, scale 4 would read qa as
    // 8.0/4 = 2.0 (inside the 3.35 band) and wave the regression
    // through; clamped at 2x it reads 4.0 and flags
    val engineWide = Bench.baselineViolations(Map("qa" -> 2.0),
      Map("qa" -> 8.0), Map("qa" -> 0.1), calibScale = 4.0)
    assert(engineWide.nonEmpty,
      "a uniform 4x engine regression fully self-discounted — the " +
        "MaxCalibDiscount clamp is not applied")
    // the spread is discounted CONSISTENTLY with cur (review finding):
    // both are measured in the same host-inflated units, and a raw
    // spread would widen the band twice — here a real 3x regression
    // (2.0*3*1.8 = 10.8 raw) carrying its own inflated 3.0 s spread
    // must still trip (scaled: 6.0 vs band 3.0+0.3+3.0/1.8 = 4.97;
    // unscaled spread would read 6.0 vs 6.3 and hide it)
    assert(Bench.baselineViolations(Map("qa" -> 2.0), Map("qa" -> 10.8),
      Map("qa" -> 3.0), calibScale = 1.8).nonEmpty,
      "a regression hid inside its own host-inflated spread")
  }
}
