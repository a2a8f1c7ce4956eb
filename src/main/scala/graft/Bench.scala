package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one machine-parseable JSON line with per-query seconds.
  *
  * Methodology (round 3, statistical power rebuilt round 14): one cold pass
  * pays one-time costs (JVM JIT, codegen compilation, parquet footer caches,
  * StageMemo'd shared fits), then `SPARK_GRAFT_WARM_REPS` (default 5) warm
  * passes; the reported per-query number is the *median* across warm reps,
  * so a single container-load spike cannot masquerade as a plan regression
  * (the round-2 harness could not tell the two apart). The headline `value`
  * is the sum of warm medians (the "best-of" total); `median_total_sec` is
  * the median of the rep totals — a single-pass cost a user would actually
  * observe — reported beside it.
  *
  * Round-14 noise methodology (r13 VERDICT ask #1 — the old floor, max−min
  * of rep totals, DOUBLED to 14.25 s as the pack shrank to 80 s, eroding
  * the round-over-round gate's power): (a) warm reps rise 3→5, preceded
  * by `SPARK_GRAFT_WARMUP_REPS` (default 1) UNRECORDED warmup passes —
  * one cold pass does not absorb the JIT ramp at high thread counts; (b) each
  * warm rep runs the queries in a DIFFERENT deterministic order
  * ([[repOrder]], md5-keyed — no JVM RNG), so per-query spreads capture
  * scheduling/neighbor noise instead of a fixed-order bias (safe for
  * attribution: StageMemo'd shared fits are cold-pass costs, hits in every
  * warm rep regardless of order); (c) `noise_total_sec` is now the
  * JACKKNIFE RANGE of the headline — recompute the sum-of-medians leaving
  * each rep out, take max−min — which measures exactly the judge's stated
  * hazard ("the verdict is one noisy rep away from meaningless"): how far
  * the reported total can move if any single rep were luck. With 5 reps a
  * leave-one-out median shifts at most between adjacent order statistics,
  * so the floor honestly shrinks as reps grow, unlike the old rep-total
  * spread (kept as `rep_total_spread_sec` for continuity), which can only
  * widen with more samples and measured single-PASS variance, not the
  * variance of the median-aggregated statistic anyone compares.
  *
  * Artifact contract (round 5): the driver keeps only the LAST 2000 chars of
  * stdout (measured from BENCH_r01/r02/r04 `tail` fields), and sbt's
  * `[success] Total time…` footer eats ~80 of them — so the parseable line
  * must be (a) the final thing we print, after `spark.stop()`, and (b) under
  * ~1.9k chars total. With 91 queries the sum of full query names alone is
  * ~1.3k chars, so the printed line abbreviates `qNN_description` keys to
  * `qNN` (the format the driver's own example uses: `"queries":{"q1":sec}`)
  * and strips trailing zeros; if growth ever pushes past the budget it
  * degrades to 2-decimal values before giving up. The full artifact — full
  * names, cold pass, every warm rep, medians — is written to
  * `bench_out.json`, and a full-name line is still printed early for the
  * driver's scrollback.
  */
object Bench {

  /** Key abbreviation for the printed line (full names stay in
    * bench_out.json): explicit overrides for long outliers, then
    * `<code>NN_description` → `<code>NN` (the driver's own `"q1"` example
    * format, generalized to the reference-row codes s1/t3/o5/…), then
    * mechanical family-prefix compressions. BenchArtifactSpec asserts the
    * worst-case line fits the tail window and the keys stay
    * collision-free.
    */
  private val Overrides = Map(
    "feat_category_index" -> "fc",
    "sim_neardup_cosine" -> "sn",
    "dedup_ngram_jaccard" -> "dj",
    "dedup_span_removal" -> "dz",
    "dedup_against_ref" -> "dr",
    "dedup_vs_ref_near" -> "dv",
    "mm_binary_stats" -> "mms",
    "mm_neardup" -> "n",
    "mm_image_meta" -> "i",
    "mm_audio_neardup" -> "u",
    "mm_audio_meta" -> "a",
    "privacy_k_anon" -> "b",
    "privacy_dp_counts" -> "d",
    "privacy_suppress" -> "e",
    "privacy_l_div" -> "m",
    "privacy_generalize" -> "t",
    "sql_curate" -> "q",
    "sft_chat_format" -> "h",
    "sft_loss_mask" -> "l",
    "sft_validate" -> "v",
    "snap_diff" -> "s",
    "dq_report" -> "j",
    "wordpiece_vocab" -> "w",
    "wordpiece_encode" -> "y",
    "tok_oov_rate" -> "o",
    "label_kappa" -> "k",
    "url_canonicalize" -> "x",
    "sel_pref_pairs" -> "p",
    "dedup_fuzzy" -> "g",
    "dedup_fuzzy_apply" -> "f",
    "sel_cap_per_source" -> "sel",
    "sel_mmr" -> "mm",
    "dedup_keep_best" -> "db",
    "text_fingerprint" -> "tf",
    "feat_standardize" -> "fts",
    "text_para_dedup" -> "xp",
    "d2_json_decode" -> "d2d",
    "d2_json_props" -> "d2p",
    "text_token_stats" -> "tt",
    "chunk_sliding" -> "ch",
    "decontaminate" -> "dn",
    "decontaminate_report" -> "dnr",
    "dedup_components" -> "dc",
    "sim_topk_brute" -> "stk",
    "text_repetition" -> "tr",
    "emb_quantize" -> "emq",
    "pack_sequences" -> "pk",
    "sample_per_group" -> "sg",
    "text_normalize" -> "tn",
    "mixture_resample" -> "mxd",
    "mm_features" -> "mf",
    "sample_weighted" -> "sw",
    "sim_semdedup" -> "sdd",
    "gopher_quality_gate" -> "gp",
    "dsir_weights" -> "dsw",
    "dsir_select" -> "dsk",
    "sim_hard_negatives" -> "shn",
    "curriculum_order" -> "cu",
    "text_html_clean" -> "xh",
    "ret_bm25_topk" -> "bm",
    "ret_hybrid_rrf" -> "rf",
    "ret_hybrid_ann" -> "rfa",
    "text_collocations" -> "clc",
    "mixture_unimax" -> "um",
    "mixture_unimax_select" -> "umx",
    "bpe_merges" -> "bpe",
    "bpe_encode" -> "bp",
    "text_winnow" -> "wi",
    "text_ppl_buckets" -> "pl",
    "text_novelty" -> "nv",
    "text_lm_backoff" -> "lb",
    "text_entropy" -> "en",
    "dedup_winnow" -> "dw",
    "dedup_winnow_apply" -> "dwa",
    "quality_blocklist" -> "qb",
    "graph_pagerank" -> "pr",
    "dedup_keep_central" -> "dkc",
    "mixture_alpha" -> "ma",
    "mixture_alpha_select" -> "mas",
    "quality_nb" -> "nb",
    "quality_nb_buckets" -> "nbq",
    "unigram_vocab" -> "uv",
    "unigram_encode" -> "ue",
    "text_span_corrupt" -> "sk",
    "dedup_exact" -> "de",
    "dedup_apply" -> "da",
    "dedup_minhash" -> "dm",
    "dedup_simhash" -> "ds",
    "text_langid" -> "tl",
    "text_pii" -> "tp",
    "text_quality" -> "tq",
    "text_redact" -> "td",
    "text_tfidf" -> "ti",
    "sample_split" -> "ss",
    "sim_ann_lsh" -> "sal",
    "sim_ann_ivf" -> "sai",
    "sim_ann_pq" -> "sap",
    "pack_chunks" -> "pc",
    "pack_shards" -> "ps",
    "pack_length_buckets" -> "lk",
    "cluster_kmeans" -> "km",
    "scd2_merge" -> "s2",
    "text_boilerplate" -> "xb",
    "text_commonness" -> "xc",
    "mixture_tokens" -> "mxt",
    "ml_score_linear" -> "mll",
    "corpus_shuffle" -> "csh",
    "corpus_datacard" -> "dcd",
    "emb_centroids" -> "emc",
    "sample_stratified" -> "sf",
    "dedup_common_span" -> "dcs",
    "pipeline_curate" -> "pp",
    "pipeline_curate2" -> "pq",
    "pipeline_sft" -> "z",
    "rank_bt" -> "r",
    "cms_counts" -> "c",
    "hll_distinct" -> "hl",
    "sample_es_k" -> "es",
    "pipeline_rlhf" -> "rh",
    "shard_manifest" -> "sh",
    "curation_funnel" -> "cf",
    "decontaminate_sem" -> "dse",
    "label_fleiss" -> "lf",
    "split_leakage_free" -> "spl",
    "text_vocab_topk" -> "xv",
    "text_vocab_topk_mg" -> "xm",
    "token_budget" -> "tb",
    "quality_gate" -> "qg",
    "label_krippendorff" -> "kr",
    "dedup_rougel" -> "dg",
    "quality_perceptron" -> "qp",
    "tok_fertility" -> "fy",
    "text_scripts" -> "xs",
    "sel_ess" -> "se",
    "vocab_zipf" -> "vz",
    "mm_video_neardup" -> "vn",
    "mm_video_meta" -> "vm",
    "mm_video_decon" -> "vd",
    // single-char digit keys: the 26 letters were exhausted at r9 and the
    // tail-line budget prices every key char; digits/uppercase are the
    // remaining 1-char namespace for r10+ queries
    "ret_bitext_mine" -> "5",
    "dedup_substring" -> "0",
    "dedup_substring_runs" -> "1",
    "pipeline_multimodal" -> "2",
    "vocab_zipf_lang" -> "3",
    "q41_gini_group" -> "4")
  private val codePrefix = "^([a-z]\\d+)_.*$".r
  private val FamilyAbbrev = Seq(
    "dedup_" -> "dd_", "text_" -> "tx_", "sim_" -> "si_",
    "sample_" -> "sm_", "mixture_" -> "mx_", "pack_" -> "pk_",
    "feat_" -> "ft_", "ml_score_" -> "ml_")
  def shortName(n: String): String = Overrides.getOrElse(n, n match {
    case codePrefix(p) => p
    case _ => FamilyAbbrev.collectFirst {
      case (long, short) if n.startsWith(long) =>
        short + n.stripPrefix(long)
    }.getOrElse(acronym(n))
  })

  /** r15 fallback (VERDICT ask #8) replacing the exhausted 1-char
    * digit/uppercase namespace: a new query's key is the first letter of
    * each underscore word (`ret_bitext_ann` → `rba`) — deterministic,
    * greppable, and still 2–4 chars of tail budget. Frozen keys are
    * untouched: every pre-r15 name resolves via Overrides / codePrefix /
    * FamilyAbbrev before reaching here (BenchArtifactSpec pins the full
    * mapping), and a future acronym collision fails BenchArtifactSpec's
    * uniqueness pin, forcing an explicit override in the same change. */
  private def acronym(n: String): String = {
    val a = n.split('_').filter(_.nonEmpty).map(_.head).mkString
    if (a.length >= 2) a else n
  }

  /** The collision-RESOLVED name → short-key map both the tail line and
    * the bench_out.json legend use: a key collision must not kill the
    * round's bench artifact, so colliding entries fall back to their
    * full names (the line may then exceed the tail window, but every
    * non-colliding round still parses — and the legend describes what
    * the tail actually keys by). */
  private[graft] def shortKeys(names: Seq[String]): Map[String, String] = {
    val proposed: Map[String, String] =
      names.map(n => n -> shortName(n)).toMap
    val collided = proposed.groupBy(_._2).filter(_._2.size > 1).keySet
    proposed.map { case (n, s) => n -> (if (collided(s)) n else s) }
  }
  /** Fixed-work calibration probe (r15 VERDICT ask #1): a constant-size,
    * plan-stable, IO-free task timed once per warm rep, published as
    * `calib_sec` (per rep) in bench_out.json and as the median `calib`
    * field in the parseable tail. Its purpose is to make the round
    * artifact SELF-ADJUDICATING: the r15 driver bench read 107.6 s while
    * the same commit measured 71.5 s (builder) and 78.6 s (judge), and
    * nothing in the artifact could prove which runs were contaminated.
    * The probe's work never changes (pinned row count, pinned input
    * partitions, modular keys, no IO, no AQE-sensitive skew), so its
    * timing moves ONLY with host conditions — a run whose calib is 1.5×
    * the recorded baseline is a slow/contended host, not a plan
    * regression, and [[BenchBaselineSpec]] scales the per-query band
    * check by exactly that ratio (a genuinely regressed query still
    * trips: a real 3× sits at 2× even after a 1.5× host discount).
    * Shape: range → per-row projection → hash-agg partial → exchange →
    * final agg → sort of the 4096 group rows → driver collect. The
    * result is CONSUMED via collect(), not count() — a count() here let
    * Catalyst prune the sum/count aggregates and EliminateSorts drop
    * the sort entirely (verified against the optimized plan in review),
    * leaving a probe that never exercised the machinery its contract
    * documents. The checksum fold over the collected rows both defeats
    * dead-code elimination and pins the probe's ARITHMETIC: a changed
    * checksum means the probe's work changed and recorded calibs are no
    * longer comparable (CalibProbeVersion must bump). ~0.3 s at the
    * bench's local[4]; five probes cost ~1.5 s of a ~75 s run.
    *
    * Attribution caveat (r16 advice): the probe runs through the SAME
    * Spark session as the benchmarked queries, so its timing tracks
    * host conditions AND any engine-global condition — codegen
    * disabled, a session-wide planner slowdown, a shuffle-config
    * change would inflate probe and queries alike, and an uncapped
    * discount would wave such a uniform real regression through as
    * "host contention". That is why [[baselineViolations]] clamps the
    * discount at [[MaxCalibDiscount]]: past it the run is treated as
    * at-most-2×-contended and anything beyond must answer to the band
    * undivided. Observed host contention (r15/r16 driver runs) sits at
    * 1.4–1.6×, comfortably inside the cap; a >2× probe reading is
    * loud in the artifact either way (`calib_median_sec`).
    *
    * [[CalibProbeVersion]] stamps every recorded reading: the baseline
    * gate only applies a host discount when the versions match — a
    * probe-shape change (like the count()→collect() fix this version
    * number exists for) makes old readings incomparable, and comparing
    * across versions could mis-scale the gate in the LOOSE direction.
    */
  private[graft] val CalibRows = 20000000L
  private[graft] val CalibParts = 16
  private[graft] val CalibProbeVersion = 2
  private[graft] def calibrate(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val t0 = System.nanoTime()
    val rows = spark.range(0L, CalibRows, 1L, CalibParts)
      .selectExpr("id % 4096 AS g", "id AS v")
      .groupBy("g")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .orderBy(col("s").desc, col("g").asc)
      .collect()
    var check = 0L
    var i = 0
    while (i < rows.length) {
      check = check * 31 + rows(i).getLong(1) + rows(i).getLong(2)
      i += 1
    }
    require(rows.length == 4096 && check == 321488248504609152L,
      s"calibration probe result drifted (n=${rows.length}, " +
        s"check=$check) — its work is no longer the recorded work; " +
        "bump CalibProbeVersion and re-record bench_baseline.json")
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_WARM_REPS", "5").toInt.max(1)
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.keys.toSeq.sorted

    // a failed query must be visibly failed (-1), never a fast-looking timing
    def runAll(order: Seq[String]): Map[String, Double] = order.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val secs =
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        }
      name -> secs
    }.toMap

    def freshPass(order: Seq[String]): Map[String, Double] = {
      spark.sharedState.cacheManager.clearCache() // every pass re-reads inputs
      runAll(order)
    }

    val cold = runAll(names)
    // unrecorded warmup pass(es) between cold and the recorded reps: one
    // cold pass does not fully absorb JIT/codegen ramp at high thread
    // counts (a 5-rep r14 calibration run showed a monotone 139→105 s
    // rep-total trend — drift the jackknife floor cannot damp away, only
    // avoid). Default 2 since the r15 A/B calibration (4 sf0.1 runs,
    // order-balanced): at warmup=1 the cleanest run still carried a
    // +7.7 s rep-1 excess over its median (3× its 2.6 s jackknife noise;
    // the r14 recorded run carried +21 s), while NEITHER warmup=2 run
    // showed a positive rep-1 excess beyond noise (+0.5 s and −8.5 s
    // against 3.1/4.1 s floors) — the second pass buys the first
    // recorded rep's integrity for one unrecorded pass's wall cost.
    // (Caveat recorded with the numbers: hour-scale ambient drift on the
    // bench host spanned 70→92 s run totals that afternoon, so the
    // within-run rep-1-vs-median statistic is the only signal the
    // decision rests on.) SPARK_GRAFT_WARMUP_REPS overrides.
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP_REPS", "2").toInt
      .max(0)
    (0 until warmup).foreach(i => freshPass(repOrder(names, -1 - i)))
    // each warm rep runs a different deterministic order (see scaladoc):
    // per-query spreads then price scheduling/neighbor effects, not a
    // fixed-order bias
    // one calibration probe per recorded rep, timed immediately after the
    // rep's queries under the same ambient conditions (see [[calibrate]]).
    // One unrecorded probe first: the probe's own codegen/JIT ramp must
    // not contaminate rep 0's reading (the warmup-pass stance, applied
    // to the instrument itself)
    calibrate(spark)
    val calibs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val warmReps = (0 until reps).map { i =>
      val r = freshPass(repOrder(names, i))
      calibs += calibrate(spark)
      r
    }

    // a query that failed in any pass is failed, full stop
    val warmMed = names.map { n =>
      val vs = warmReps.map(_(n))
      n -> (if (cold(n) < 0 || vs.exists(_ < 0)) -1.0 else median(vs))
    }.toMap

    // measured noise (r11 ask #5, rebuilt r14 — see scaladoc): per-query
    // spread = max − min across the warm reps of ONE run (feeds
    // [[flaggedRegressions]]' widened band), headline noise = the
    // jackknife range of the sum-of-medians total.
    val warmSpread = names.map { n =>
      val vs = warmReps.map(_(n))
      n -> (if (cold(n) < 0 || vs.exists(_ < 0)) -1.0 else vs.max - vs.min)
    }.toMap
    // rep totals over the INTERSECTION of queries that succeeded in every
    // pass (warmMed >= 0 ⇔ cold and all warm reps succeeded): a query
    // failing in some reps but not others would otherwise make the rep
    // totals cover different query sets, inflating the reported spreads
    val okNames = names.filter(n => warmMed(n) >= 0)
    val repTotals = warmReps.map(r => okNames.map(r).sum)
    val repSpread = repTotals.max - repTotals.min
    val medianTotal = median(repTotals)
    val jack = jackknifeTotals(okNames, warmReps)
    val noise = if (jack.isEmpty) 0.0 else jack.max - jack.min

    def fmt(v: Double, decimals: Int): String = Bench.fmt(v, decimals)
    def f3(v: Double): String = fmt(v, 3)
    def qjson(m: Map[String, Double]): String =
      names.map(n => s"\"$n\":${f3(m(n))}").mkString("{", ",", "}")
    val total = warmMed.values.filter(_ >= 0).sum
    val coldTotal = cold.values.filter(_ >= 0).sum
    val calibMed = median(calibs.toSeq)
    val line = s"""{"metric":"total","value":${f3(total)},"unit":"sec","cold_total_sec":${f3(coldTotal)},"median_total_sec":${f3(medianTotal)},"warm_reps":$reps,"noise_total_sec":${f3(noise)},"calib_median_sec":${f3(calibMed)},"rep_total_spread_sec":${f3(repSpread)},"queries":${qjson(warmMed)},"sf":"$sfDir"}"""

    // short-key → full-name legend (r15 VERDICT ask #7): BENCH_r{N}.json's
    // parsed.queries uses the abbreviated tail keys, and six frozen digit
    // keys ("5", "0", …) are opaque without this map — publish the whole
    // mapping here where bytes are free (the tail window never carries
    // it). Built from the SAME collision-resolved map tailLine keys by
    // (raw shortName would emit duplicate JSON keys on a collision while
    // the tail falls back to full names — the legend must describe the
    // tail, not the ideal)
    val legend = shortKeys(names).toSeq.sortBy(_._1)
      .map { case (n, s) => s"""\"$s\":\"$n\"""" }.mkString("{", ",", "}")
    val full = s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir","warm_reps":$reps,"warmup_reps":$warmup,
                  |"rep_totals":[${repTotals.map(f3).mkString(",")}],
                  |"median_total_sec":${f3(medianTotal)},
                  |"jackknife_totals":[${jack.map(f3).mkString(",")}],
                  |"noise_total_sec":${f3(noise)},
                  |"calib_sec":[${calibs.map(f3).mkString(",")}],
                  |"calib_median_sec":${f3(calibMed)},
                  |"calib_probe_version":$CalibProbeVersion,
                  |"rep_total_spread_sec":${f3(repSpread)},
                  |"keys":$legend,
                  |"cold":${qjson(cold)},
                  |${warmReps.zipWithIndex.map { case (r, i) => s"\"warm_rep$i\":${qjson(r)}" }.mkString(",\n")},
                  |"spread":${qjson(warmSpread)},
                  |"queries":${qjson(warmMed)}}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      full.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // full-name line for scrollback/humans; NOT the one the driver parses
    println(line)
    Console.out.flush()
    spark.stop()

    // The driver keeps only the last ~2000 chars of stdout, so the line it
    // parses must be final AND short: keys abbreviate via Bench.shortName
    // (full names are in bench_out.json and the early line above), and
    // precision degrades adaptively when the pack outgrows the budget —
    // see [[tailLine]]. basename minus the constant "sf" prefix: the full
    // dir is in the early line + bench_out.json, every tail char is priced
    val sfShort = sfDir.split('/').filter(_.nonEmpty).lastOption
      .getOrElse(sfDir).stripPrefix("sf")
    println(tailLine(names, warmMed, total, sfShort, noise, calibMed))
    Console.out.flush()
  }

  private[graft] def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** Deterministic per-rep query order: sort by md5 of `"$rep:$name"`.
    * Different reps get effectively independent permutations, the same rep
    * always gets the same one (reproducible artifacts, no JVM RNG), and
    * rep indices never collide with the sorted cold-pass order.
    */
  private[graft] def repOrder(names: Seq[String], rep: Int): Seq[String] =
    names.sortBy { n =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$rep:$n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    }

  /** Leave-one-rep-out totals of the headline statistic: entry `i` is the
    * sum over `names` of each query's median across every warm rep EXCEPT
    * rep `i`. Their range (max − min) is the reported `noise_total_sec` —
    * the exact sensitivity of the published total to any single rep. A
    * single-rep run has no leave-one-out sample; it degrades to the rep
    * totals themselves (range 0 — one rep cannot estimate its own noise,
    * and a 0 floor makes the regression gate maximally strict, the safe
    * failure direction).
    */
  private[graft] def jackknifeTotals(names: Seq[String],
      warmReps: Seq[Map[String, Double]]): Seq[Double] =
    if (warmReps.size < 2) warmReps.map(r => names.map(r).sum)
    else warmReps.indices.map { i =>
      val rest = warmReps.patch(i, Nil, 1)
      names.map(n => median(rest.map(_(n)))).sum
    }

  /** Round-over-round regression verdicts with the measured noise floor
    * priced in: query `n` is flagged when
    * `cur(n) > 1.5 · prev(n) + 0.3 + spread(n)` — the judge's established
    * 1.5×+0.3 s band widened by that query's OWN warm-rep spread from the
    * current run, so a move that the run's reps already cover (pure
    * machine noise) can never read as a plan regression, while a real
    * slowdown still trips the band. Failed entries (−1) never flag. */
  private[graft] def flaggedRegressions(prev: Map[String, Double],
      cur: Map[String, Double],
      spread: Map[String, Double]): Seq[String] =
    prev.keySet.intersect(cur.keySet).toSeq.sorted.filter { n =>
      prev(n) >= 0 && cur(n) >= 0 &&
        cur(n) > 1.5 * prev(n) + 0.3 + spread.getOrElse(n, 0.0).max(0.0)
    }

  /** Cross-COMMIT form of [[flaggedRegressions]] (r14 VERDICT ask #6):
    * the same noise-banded threshold, but `baseline` comes from the
    * committed `bench_baseline.json` (per-query warm medians recorded at
    * the commit that earned them) instead of an adjacent in-run round —
    * so a query drifting slowly across rounds, each step inside the
    * band, still trips once it exceeds the band around its RECORDED
    * best. Returns human-readable violation strings; BenchBaselineSpec
    * enforces them in CI with the scan-ratchet discipline (decrease
    * rewrites in place, loosening needs a reasoned edit + regen env).
    */
  /** Ceiling on the calibration host discount (r16 advice): the probe
    * shares the benchmarked session, so an ENGINE-global regression
    * (codegen off, planner slowdown) inflates probe and queries by the
    * same factor and would self-discount without a cap. 2× covers every
    * observed contention reading (1.4–1.6×) with headroom; beyond it
    * the excess is NOT discounted and the band check sees it.
    */
  private[graft] val MaxCalibDiscount = 2.0

  private[graft] def baselineViolations(baseline: Map[String, Double],
      cur: Map[String, Double],
      spread: Map[String, Double],
      calibScale: Double = 1.0): Seq[String] = {
    // calibScale > 1 = the run's fixed-work calibration probe read that
    // much slower than the baseline's recorded host (r15 ask #1): divide
    // every current timing by it before the band check, so a uniformly
    // slow/contended host never trips the gate while a genuinely
    // regressed query still does (a real 3× reads 2× after a 1.5× host
    // discount — still past the 1.5× band). Never scale DOWN (< 1 would
    // loosen the gate on a fast host, the unsafe direction), and never
    // discount past MaxCalibDiscount (an uncapped ratio would let an
    // engine-global real regression fully self-discount — the probe
    // rides the same session; see the calibrate scaladoc).
    val s = calibScale.max(1.0).min(MaxCalibDiscount)
    val scaled = cur.map { case (n, v) => n -> (if (v < 0) v else v / s) }
    // the spread is measured on the SAME host-inflated reps as cur, so
    // it must be discounted consistently — leaving it raw would widen
    // the band twice on a slow host and let a real regression hide
    // inside its own inflated spread (review finding, r16)
    val scaledSpread = spread.map {
      case (n, v) => n -> (if (v < 0) v else v / s)
    }
    flaggedRegressions(baseline, scaled, scaledSpread).map { n =>
      f"$n: ${cur(n)}%.3f s (÷$s%.2f host calib = ${scaled(n)}%.3f) vs " +
        f"recorded median ${baseline(n)}%.3f s " +
        f"(band ${1.5 * baseline(n) + 0.3 + scaledSpread.getOrElse(n, 0.0).max(0.0)}%.3f)"
    }
  }

  // Locale.ROOT: the f-interpolator uses the JVM default locale, and a
  // comma-decimal locale would render 12.345 as "12,345" — invalid JSON
  private[graft] def fmt(v: Double, decimals: Int): String =
    if (v < 0) "-1"
    else {
      val s = String.format(java.util.Locale.ROOT, s"%.${decimals}f",
        Double.box(v))
      val t = s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
      if (t.isEmpty) "0" else t
    }

  /** Tail-line budget: the driver keeps the last 2000 chars of stdout and
    * the sbt success footer printed after the line measured 73–74 chars in
    * BENCH_r07–r09 tails (worst realistic shape ~76), leaving ≥ 1924 for
    * the line itself — 1910 keeps ≥ 14 chars of slack, 7× the observed
    * footer variance.
    */
  private[graft] val TailBudget = 1910

  /** The machine-parseable tail line, built at the highest precision the
    * budget allows. Ladder: uniform 3 → 2 → 1 decimals; when even the
    * uniform 1-decimal map overflows (the pack crossed ~195 entries at
    * r10), precision degrades PER ENTRY, largest values first — stripping
    * the decimal from a 45 s entry is a ≤ 1.1 % quantization, stripping
    * it from a 0.4 s entry is 100 %, so sub-10 s entries keep sub-second
    * resolution until every larger entry is already integer. (Full
    * 3-decimal values always live in bench_out.json; the adaptive rung
    * only prices the driver's tail window.) A pack so large that even
    * all-integer overflows ships the headline total alone — the driver
    * then loses per-query detail, never the round's bench artifact.
    */
  private[graft] def tailLine(names: Seq[String], med: Map[String, Double],
      total: Double, sfShort: String, noise: Double = 0.0,
      calib: Double = -1.0): String = {
    val shortKey = shortKeys(names)
    // no warm_reps here: the tail budget is the scarce resource and the
    // rep count is in bench_out.json + the early full-name line. "noise"
    // (≤ ~12 chars, 1 decimal) is the one diagnostics field worth a tail
    // price: it lets the round artifact alone say how much of a total
    // move is machine noise (per-query spreads are in bench_out.json's
    // "spread" map) — but it ranks BELOW per-query resolution: the
    // adaptive rung drops the field before it would demote any sub-10 s
    // entry past the large-value tier, so the r10 resolution guarantee
    // is unchanged.
    // "calib" (median fixed-work probe seconds, 2 decimals — the per-rep
    // array is in bench_out.json) shares the noise field's tier: the two
    // together let the round artifact alone separate host contamination
    // from plan regressions (r15's 107.6 s driver read vs 71.5/78.6 s
    // same-commit), and both rank BELOW per-query resolution — phase 2
    // sacrifices them before demoting any sub-10 s entry
    def wrap(q: String, d: Int, withNoise: Boolean): String = {
      val nz = if (withNoise) s""""noise":${fmt(noise, 1)},""" else ""
      val cz = if (withNoise && calib >= 0)
        s""""calib":${fmt(calib, 2)},""" else ""
      s"""{"metric":"total","value":${fmt(total, d)},"unit":"sec",$nz$cz"queries":$q,"sf":"$sfShort"}"""
    }
    def qmap(dec: String => Int): String =
      names.map(n => s"\"${shortKey(n)}\":${fmt(med(n), dec(n))}")
        .mkString("{", ",", "}")
    val uniform = Seq(3, 2, 1).view
      .map(d => wrap(qmap(_ => d), d, withNoise = true))
      .find(_.length <= TailBudget)
    def adaptive: Option[String] = {
      val order = names.sortBy(n => (-med(n), n))
      val dec = scala.collection.mutable.Map(names.map(_ -> 1): _*)
      // phase 1: demote the large tier (integer seconds there is a ≤ 1 %
      // quantization), noise kept
      val big = order.iterator.filter(n => med(n) >= 10.0)
      var line = wrap(qmap(dec), 1, withNoise = true)
      while (line.length > TailBudget && big.hasNext) {
        dec(big.next()) = 0
        line = wrap(qmap(dec), 1, withNoise = true)
      }
      if (line.length <= TailBudget) Some(line)
      else {
        // phase 2: sacrifice the noise field, then (only if still over)
        // demote remaining entries largest-first
        line = wrap(qmap(dec), 1, withNoise = false)
        val rest = order.iterator.filter(n => med(n) < 10.0)
        while (line.length > TailBudget && rest.hasNext) {
          dec(rest.next()) = 0
          line = wrap(qmap(dec), 1, withNoise = false)
        }
        Option.when(line.length <= TailBudget)(line)
      }
    }
    def headlineOnly = wrap("{}", 3, withNoise = false)
    uniform.orElse(adaptive).getOrElse(headlineOnly)
  }
}
