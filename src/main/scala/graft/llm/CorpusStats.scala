package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.functions._

/** Corpus-model text operators: statistics fitted over the whole corpus and
  * applied back to every document — TF-IDF keyword extraction, a smoothed
  * bigram language-model score (the CCNet-style "how much does this doc look
  * like the corpus" quality signal), and exact repeated-span removal (the
  * span-level half of exact-substring dedup, Lee et al. 2022).
  *
  * Everything here is defined in EXACT integer / rational arithmetic so a SQL
  * engine reproduces the result bit-for-bit (driver contract): ranks compare
  * integer-scaled rationals (`tf·10⁹ div df`), and the LM score accumulates
  * `floor(ln(p)·10⁶)` per bigram as BIGINT — summation order can't change a
  * BIGINT sum, and the `ln` itself is [[graft.functions.PortableMath]]'s
  * engine-exact staged expression (integer argument reduction + an IEEE
  * basic-ops polynomial), not a libm/JVM `log` whose last-ulp disagreement
  * can flip the floor (it did, once, at sf0.01 — see PortableMath's scaladoc).
  *
  * Scale notes (100 TB stance): every shuffle below carries slim
  * (token/hash, count) or (doc, pos, hash) rows, never document text; spans
  * shuffle as md5 hex (32 B) regardless of span width; model tables (vocab,
  * bigram counts, frequent spans) are aggregated with partial (map-side)
  * combine before any join. Joins of exploded-tokens ⋈ model are plain
  * shuffle joins on the model key — Spark/AQE broadcasts them when the model
  * side is small, and degrades to hash join (not driver collect) when a 100 TB
  * corpus makes the vocab itself large.
  */
object CorpusStats extends Serializable {

  // working column names; an idCol that collides would silently join wrong.
  // Includes bigramLmScore's per-doc multiplicity columns (m, lpm) and the
  // PortableMath.microLnStages working columns; CorpusStatsSpec keeps this
  // set in sync with the code by grepping the working-column usages.
  private val Reserved = Set("term", "tf", "df", "tfidf_key", "rank",
    "tercile", "bucket",
    "w3", "tg", "c3", "cp", "cb2", "cm", "cw", "ntot", "lp3", "lp2", "lpu",
    "ng", "cnt", "k3", "kp", "kb", "km", "kw", "n_novel", "novelty_micro",
    "n_trigrams", "sb_nll_micro", "avg_sb_nll_micro",
    "w1", "w2", "bg", "c1", "c2", "vocab", "lp", "n_bigrams", "nll_micro",
    "tk", "sp", "pos", "h", "span_df", "p", "p0", "tok", "n_kept",
    "n_tokens", "n_removed", "clean_text", "m", "lpm", "avg_nll_micro",
    "para", "para_df", "n_paras",
    // collocations working columns (incl. the signed-log stages)
    "w", "bb", "tt", "c1a", "c1b", "lp_first", "pmi_micro",
    // vocabTopKSketch working/output columns
    "token", "freq",
    // oovRate working/output columns
    "word", "n_oov", "oov_micro",
    // count-min sketch working/output columns
    "row", "rb", "freq_est",
    // shardManifest working/output columns
    "__sm_h", "n_docs", "content_xor",
    // zipfAlpha working/output columns (incl. the signed-log stages)
    "fk", "ke", "k_eff", "f_k", "sum_ln_micro", "hill_alpha_micro",
    // exact-substring dedup working/output columns
    "n_occ", "keep_id", "id_a", "id_b", "pos_a", "pos_b", "diag", "island",
    "run_len",
    // zipfAlphaByGroup per-group rank working columns
    "__zg", "__zr", "__z0",
    // datacard panel working/output columns (docStats facts + legs;
    // the group/id columns keep their CALLER names and are guarded)
    "n_toks", "q6", "text_md5", "dominant",
    "total_tokens", "mean_quality", "n_unique", "n_long", "__dc", "__dr",
    "dom_script", "n_nonlatin_dom", "__in_v", "__nt", "__no",
    "zipf_alpha_micro", "len_gini_micro",
    // frozen-tokenizer fertility facts + leg (r11)
    "fert_words", "fert_pieces", "fertility_micro", "__fw", "__fp") ++
    graft.functions.PortableMath.microLnColumns ++
    graft.functions.PortableMath.microLnSignedColumns

  private def guard(idCol: String): Unit =
    require(!Reserved(idCol),
      s"idCol '$idCol' collides with a CorpusStats working column")

  /** Per-document top-k distinctive keywords by TF-IDF.
    *
    * The rank key is `tf · 10⁹ div df` (BIGINT floor division) — the corpus
    * size N is constant within a corpus, so ranking by tf/df is exactly
    * ranking by tf·(N/df), and staying in integers sidesteps the
    * engine-dependent rounding a float idf would inject into rank ties.
    * Ties break (key desc, term asc): fully deterministic on any engine or
    * cluster layout.
    *
    * Output: (id, term, tf, df, tfidf_key, rank), rank ≤ k.
    */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    guard(idCol)
    val toks = df.select(col(idCol),
      explode(TextOps.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // document frequency: tf is already (doc, term)-distinct, so count(*)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .withColumn("tfidf_key", expr("tf * CAST(1000000000 AS BIGINT) div df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf_key").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("tfidf_key"), col("rank"))
  }

  /** Persisted term document-frequency index: (term, df) over a corpus —
    * the TF-IDF state an ingestion loop keeps between batches. Merge
    * batches with [[mergeTermDfIndex]]: ids are disjoint across batches,
    * so summed per-batch distinct counts equal the distinct count over
    * the union (exact, not approximate — the same argument as
    * [[spanDfIndex]]).
    */
  def termDfIndex(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    guard(idCol)
    df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(countDistinct(col(idCol)).as("df"))
  }

  /** Additive merge of term-df indexes built over DISJOINT doc sets. */
  def mergeTermDfIndex(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("term").agg(sum(col("df")).as("df"))

  /** Incremental TF-IDF keywords for continuous ingestion: rank a `fresh`
    * batch's terms against the corpus-wide document frequencies — the
    * batch's own df PLUS the persisted `existingIndex` ([[termDfIndex]]
    * rows, disjoint ids) — without re-scanning historical text.
    * Byte-identical on the fresh rows to running [[tfidfKeywords]] over
    * (existing ∪ fresh), because summed disjoint distinct counts ARE the
    * union's document frequencies and tf/rank are per-document.
    *
    * Returns (fresh keywords, the fresh batch's own index rows) so the
    * loop can [[mergeTermDfIndex]] and persist without re-tokenizing.
    * Same streaming caveat as the span index: already-ranked batches are
    * immutable; a term that becomes common later is only devalued from
    * that batch on.
    */
  def tfidfKeywordsIncremental(existingIndex: DataFrame, fresh: DataFrame,
      idCol: String, textCol: String, k: Int): (DataFrame, DataFrame) = {
    require(k > 0, s"k must be positive, got $k")
    guard(idCol)
    val tf = fresh.select(col(idCol),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    // tf is (doc, term)-distinct, so count(*) is the batch's df — and
    // Catalyst reuses the exchange under the same "term" partitioning
    val freshIndex = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val merged = mergeTermDfIndex(existingIndex, freshIndex)
    val scored = tf.join(merged, "term")
      .withColumn("tfidf_key", expr("tf * CAST(1000000000 AS BIGINT) div df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf_key").desc, col("term").asc)
    val kw = scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("tfidf_key"), col("rank"))
    (kw, freshIndex)
  }

  /** Add-one-smoothed bigram LM negative log-likelihood per document, fitted
    * on the corpus itself: for each adjacent token pair,
    * `p = (c(w1,w2) + 1) / (c(w1) + V)` with V = |vocab|, accumulated as
    * `-Σ floor(ln(p)·10⁶)` (BIGINT — order-independent). High `avg_nll`
    * means "unlike the corpus": the classic perplexity-bucket quality
    * signal. Documents with fewer than 2 tokens have no bigrams and are
    * omitted (their perplexity is undefined).
    *
    * Output: (id, n_bigrams, nll_micro, avg_nll_micro).
    *
    * Bigrams are derived positionally from the token array (map-only
    * explode — no positional self-join); counts and V come from two partial
    * aggs; scoring joins on (w1,w2) then w1, both slim keys.
    */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    guard(idCol)
    val tk = TextOps.tokens(col(textCol))
    // adjacent pairs as zip(tk[1..n-1], tk[2..n]) — slice/arrays_zip are
    // plain codegen'd array ops, ~2× the throughput of an interpreted
    // per-index transform() lambda on this hot path. The filter keeps
    // 1-token docs away from zero-length slices.
    val bigrams = df.filter(size(tk) >= 2).select(col(idCol), explode(
      arrays_zip(slice(tk, lit(1), size(tk) - 1),
        slice(tk, lit(2), size(tk) - 1))).as("bg"))
      .select(col(idCol), col("bg")("0").as("w1"), col("bg")("1").as("w2"))
    // reduce instances to per-doc DISTINCT bigrams first: the scoring join
    // then moves (doc, w1, w2, multiplicity) rows instead of every token
    // pair. perDoc feeds BOTH the corpus bigram counts and the final
    // multiplicity join, and uni feeds BOTH the model join and the vocab
    // total — one slim materialization each, or every consumer re-scans
    // the source (the r12 scan audit read text_lm_score at 4 scans;
    // now 2: one bigram pass, one unigram pass)
    val perDoc = bigrams.groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("m"))
      .localCheckpoint()
    val c2 = perDoc.groupBy("w1", "w2").agg(sum(col("m")).as("c2"))
    val uni = df.select(explode(tk).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
      .localCheckpoint()
    val v = uni.agg(count(lit(1)).as("vocab"))
    // model-sized joins build (w1, w2, lp); instances join the model ONCE.
    // lp = floor(ln((c2+1)/(c1+V))·10⁶) via PortableMath's engine-exact
    // staged expression — a bare ln() here is JVM-vs-libm dependent at floor
    // boundaries and broke the cross-engine oracle hash at sf0.01.
    val lnStages = graft.functions.PortableMath.microLnStages(
      "c2 + 1", "c1 + vocab", graft.functions.PortableMath.sparkShiftLeft)
    val model = lnStages.foldLeft(
        c2.join(uni, Seq("w1")).crossJoin(broadcast(v))) {
        case (d, (name, sql)) => d.withColumn(name, expr(sql))
      }
      .select(col("w1"), col("w2"), col("lp"))
    perDoc.join(model, Seq("w1", "w2"))
      .select(col(idCol), col("m"), (col("m") * col("lp")).as("lpm"))
      .groupBy(col(idCol))
      .agg(sum(col("m")).as("n_bigrams"), (-sum(col("lpm"))).as("nll_micro"))
      .withColumn("avg_nll_micro", expr("nll_micro div n_bigrams"))
  }

  /** Fixed-point `floor(ln(0.4)·10⁶)` — the stupid-backoff discount in the
    * same micro-log space as the staged portable log, computed once on the
    * JVM and embedded as a literal on BOTH engines (a constant, so
    * cross-engine exactness is by construction).
    */
  val StupidBackoffDiscountMicro: Long =
    graft.functions.PortableMath.microLnSignedRef(2, 5)

  /** Trigram LM scoring with stupid backoff (Brants et al. 2007) — the
    * web-scale LM-filtering shape: score FRESH documents against a
    * REFERENCE corpus LM (two corpora, unlike [[bigramLmScore]]'s
    * self-trained add-one model), backing off trigram → bigram → unigram
    * with the 0.4 discount where the reference has no count:
    *
    *   S(w3|w1w2) = c3/c(w1w2)                 if the trigram is attested
    *              = 0.4 · c(w2w3)/c(w2)        else if the bigram is
    *              = 0.4² · c(w3)/N             else (unseen w3 ⇒ count 1)
    *
    * All in fixed-point micro-log space: each level's log-ratio is the
    * engine-exact staged log, the discount is
    * [[StupidBackoffDiscountMicro]], and the per-doc sum is an exact
    * BIGINT — hash-identical on any engine.
    *
    * Scale shape: the model is built over the DISTINCT trigram vocabulary
    * of the scored corpus (not instances) and joined to slim per-doc
    * (trigram, multiplicity) rows; train-side tables shuffle as
    * (ngram, count). Docs with < 3 tokens carry no score row.
    *
    * Output: (idCol, n_trigrams, sb_nll_micro, avg_sb_nll_micro).
    */
  def stupidBackoffScore(train: DataFrame, fresh: DataFrame, idCol: String,
      textCol: String): DataFrame =
    stupidBackoffScoreAgainstIndex(fresh, idCol, textCol,
      ngramIndex(train, textCol))

  /** Additive n-gram count index for [[stupidBackoffScoreAgainstIndex]]:
    * one (ng, cnt) row per distinct reference n-gram, level-prefixed —
    * `"3:w1 w2 w3"`, `"2:w1 w2"`, `"1:w"`. Tokens are whitespace-split so
    * the keys are collision-free, and the token total N is Σ cnt over
    * `1:` rows — no sentinel needed. Indexes over DISJOINT corpora merge
    * by summing per key ([[mergeNgramIndex]]): the state a streaming
    * LM-scoring loop persists between batches.
    */
  def ngramIndex(df: DataFrame, textCol: String): DataFrame = {
    val t = TextOps.tokens(col(textCol))
    // three codegen'd branch scans, deliberately: a single-scan form via
    // transform(sequence, i -> element_at...) was tried in r12 and cost
    // text_lm_backoff 2.1 s -> 10 s — Catalyst higher-order functions are
    // INTERPRETED, and arrays_zip/slice are not. Three pruned scans of
    // one text column beat one interpreted pass; the multi-CONSUMER
    // blowup (the audit's real 20-scan term) is fixed downstream by
    // materializing the index once in stupidBackoffScoreAgainstIndex.
    val tri = df.filter(size(t) >= 3).select(explode(arrays_zip(
        slice(t, lit(1), size(t) - 2),
        slice(t, lit(2), size(t) - 2),
        slice(t, lit(3), size(t) - 2))).as("tg"))
      .select(concat(lit("3:"), col("tg")("0"), lit(" "), col("tg")("1"),
        lit(" "), col("tg")("2")).as("ng"))
    val big = df.filter(size(t) >= 2).select(explode(arrays_zip(
        slice(t, lit(1), size(t) - 1),
        slice(t, lit(2), size(t) - 1))).as("bg"))
      .select(concat(lit("2:"), col("bg")("0"), lit(" "),
        col("bg")("1")).as("ng"))
    val uni = df.select(explode(t).as("w"))
      .select(concat(lit("1:"), col("w")).as("ng"))
    tri.unionByName(big).unionByName(uni)
      .groupBy("ng").agg(count(lit(1)).as("cnt"))
  }

  /** Merge two [[ngramIndex]] frames over disjoint corpora (counts add). */
  def mergeNgramIndex(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("ng").agg(sum(col("cnt")).as("cnt"))

  /** The streaming-scoring form of [[stupidBackoffScore]]: reference
    * counts come from an [[ngramIndex]] frame (possibly accumulated over
    * many batches) instead of a corpus scan. Identical output values for
    * an index built over the same reference corpus.
    */
  /** Per-doc trigram instances (cols..., w1, w2, w3); docs with < 3 tokens
    * yield none. Shared by the backoff scorer and the novelty signal.
    */
  private def docTrigrams(d: DataFrame, textCol: String,
      cols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val t = TextOps.tokens(col(textCol))
    d.filter(size(t) >= 3).select(cols :+ explode(arrays_zip(
        slice(t, lit(1), size(t) - 2),
        slice(t, lit(2), size(t) - 2),
        slice(t, lit(3), size(t) - 2))).as("tg"): _*)
      .select(cols ++ Seq(col("tg")("0").as("w1"), col("tg")("1").as("w2"),
        col("tg")("2").as("w3")): _*)
  }

  def stupidBackoffScoreAgainstIndex(fresh: DataFrame, idCol: String,
      textCol: String, index0: DataFrame): DataFrame = {
    guard(idCol)
    import graft.functions.PortableMath
    val ln04 = StupidBackoffDiscountMicro

    // one materialization each for the two multiply-consumed frames: the
    // index feeds FIVE level-key joins plus the token total, and perDoc
    // feeds the model vocabulary AND the final multiplicity join — left
    // lazy, every consumer re-derives its input (the r12 scan audit
    // measured text_lm_backoff at TWENTY source scans: 6 index consumers
    // × 3 branch scans + 2 fresh scans; now 1 + 1). Slim columns only —
    // (ng, cnt) and (id, w1..w3, m) — the established checkpoint shape.
    val index = index0.localCheckpoint()

    def trigrams(d: DataFrame, cols: Seq[org.apache.spark.sql.Column]) =
      docTrigrams(d, textCol, cols)
    val ntot = index.filter(col("ng").startsWith("1:"))
      .agg(sum(col("cnt")).as("ntot"))

    // scored side: per-doc trigram multiplicities; the model evaluates on
    // the DISTINCT trigram vocabulary only, joined to the index by
    // level-prefixed keys
    val perDoc = trigrams(fresh, Seq(col(idCol)))
      .groupBy(col(idCol), col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("m"))
      .localCheckpoint()
    val v3 = perDoc.select("w1", "w2", "w3").distinct()
    // ONE tagged-key lookup instead of five per-level joins (r17, guide
    // §2.4): the five keys unpivot to (w1,w2,w3, tag, ng) rows, hit the
    // index in a single equi-join, and a max(when) pivot rebuilds the
    // c3/cp/cb2/cm/cw columns — the index is shuffled ONCE instead of
    // five times, and the pivot's (w1,w2,w3) grouping leaves the model
    // pre-partitioned for the final perDoc join. Values are identical:
    // the index is unique per ng, so each tagged key matches ≤ 1 row and
    // max(when) over the 5-row group reads off exactly the left-join
    // results the five joins produced.
    val keyed = v3.select(col("w1"), col("w2"), col("w3"),
      explode(map(
        lit("c3"), concat(lit("3:"), col("w1"), lit(" "), col("w2"),
          lit(" "), col("w3")),
        lit("cp"), concat(lit("2:"), col("w1"), lit(" "), col("w2")),
        lit("cb2"), concat(lit("2:"), col("w2"), lit(" "), col("w3")),
        lit("cm"), concat(lit("1:"), col("w2")),
        lit("cw"), concat(lit("1:"), col("w3"))))
        .as(Seq("__tag", "ng")))
    def pick(tag: String) = max(when(col("__tag") === tag, col("cnt")))
    val m0 = keyed.join(index, Seq("ng"), "left")
      .groupBy(col("w1"), col("w2"), col("w3"))
      .agg(pick("c3").as("c3"), pick("cp").as("cp"), pick("cb2").as("cb2"),
        pick("cm").as("cm"), pick("cw").as("cw"))
      .crossJoin(broadcast(ntot))
    // three staged-log chains, working columns selected away between them
    def chain(d: DataFrame, a: String, b: String, out: String,
        keep: Seq[String]): DataFrame =
      PortableMath.microLnSignedStages(a, b, PortableMath.sparkShiftLeft)
        .foldLeft(d) { case (acc, (n, s)) => acc.withColumn(n, expr(s)) }
        .select((keep :+ "lp").map(col): _*)
        .withColumnRenamed("lp", out)
    val base = Seq("w1", "w2", "w3", "c3", "cp", "cb2", "cm", "cw", "ntot")
    val mt = chain(m0, "c3", "cp", "lp3", base)
    val mb = chain(mt, "cb2", "cm", "lp2",
      Seq("w1", "w2", "w3", "c3", "cb2", "cw", "ntot", "lp3"))
    val model = chain(
      mb, "coalesce(cw, 1)", "ntot", "lpu",
      Seq("w1", "w2", "w3", "c3", "cb2", "lp3", "lp2"))
      .withColumn("lp",
        when(col("c3").isNotNull, col("lp3"))
          .when(col("cb2").isNotNull, col("lp2") + ln04)
          .otherwise(col("lpu") + 2 * ln04))
      .select(col("w1"), col("w2"), col("w3"), col("lp"))
    perDoc.join(model, Seq("w1", "w2", "w3"))
      .select(col(idCol), col("m"), (col("m") * col("lp")).as("lpm"))
      .groupBy(col(idCol))
      .agg(sum(col("m")).as("n_trigrams"),
        (-sum(col("lpm"))).as("sb_nll_micro"))
      .withColumn("avg_sb_nll_micro", expr("sb_nll_micro div n_trigrams"))
  }

  /** Per-document n-gram novelty against a reference corpus: the fraction
    * of a doc's trigram INSTANCES whose trigram the reference has never
    * seen — the cheap "how much of this is new text vs recombination"
    * signal (high novelty + low LM score ≈ gibberish; low novelty ≈
    * near-copy of the reference). Reference counts come from the same
    * additive [[ngramIndex]] the backoff scorer uses (only `3:` rows are
    * consulted), so one persisted index serves both signals — including
    * in the streaming loop.
    *
    * Exact integers: `novelty_micro = n_novel·10⁶ div n_trigrams`. Docs
    * with < 3 tokens carry no row.
    *
    * Output: (idCol, n_trigrams, n_novel, novelty_micro).
    */
  def ngramNovelty(fresh: DataFrame, idCol: String, textCol: String,
      index: DataFrame): DataFrame = {
    guard(idCol)
    val inst = docTrigrams(fresh, textCol, Seq(col(idCol)))
      .withColumn("k3", concat(lit("3:"), col("w1"), lit(" "), col("w2"),
        lit(" "), col("w3")))
    inst.join(index.select(col("ng").as("k3"), col("cnt")), Seq("k3"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("cnt").isNull, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_micro",
        expr("(n_novel * 1000000) div n_trigrams"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): per language,
    * documents are split into head/middle/tail terciles of the LM-score
    * distribution — the standard way web corpora are stratified by fluency
    * before sampling (head = most in-domain-fluent third). The score is
    * [[bigramLmScore]]'s engine-exact fixed-point avg NLL, and the tercile
    * is `ntile(3)` over the TOTAL order (avg_nll asc, id asc), so bucket
    * membership is deterministic and hash-comparable across engines —
    * unlike CCNet's float-perplexity thresholds.
    *
    * Docs with < 2 tokens carry no LM score and are absent (same contract
    * as bigramLmScore). The window partitions by language — never a
    * global sort; per-language ordering is the corpus-wide stage, one
    * shuffle on the language key.
    *
    * Output: (idCol, langCol, avg_nll_micro, tercile 1..3, bucket
    * head|middle|tail).
    */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame =
    perplexityBucketsFromScores(df, idCol, langCol,
      bigramLmScore(df, idCol, textCol))

  /** [[perplexityBuckets]] from a precomputed [[bigramLmScore]] frame —
    * the shared-fit entry point: one LM fit feeds both the per-doc score
    * query and the bucket assignment instead of two corpus fits.
    */
  def perplexityBucketsFromScores(df: DataFrame, idCol: String,
      langCol: String, scored: DataFrame): DataFrame = {
    guard(idCol)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(langCol))
      .orderBy(col("avg_nll_micro").asc, col(idCol).asc)
    df.select(col(idCol), col(langCol))
      .join(scored.select(col(idCol), col("avg_nll_micro")), Seq(idCol))
      .withColumn("tercile", ntile(3).over(w).cast("long"))
      .withColumn("bucket",
        when(col("tercile") === 1, "head")
          .when(col("tercile") === 2, "middle").otherwise("tail"))
      .select(col(idCol), col(langCol), col("avg_nll_micro"),
        col("tercile"), col("bucket"))
  }

  /** Exact repeated-span removal: delete every token covered by a
    * `spanTokens`-token window whose exact text occurs in more than `maxDf`
    * distinct documents — the span-level exact-substring dedup of
    * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better"), with corpus document-frequency as the dup criterion. For
    * the paper's own any-duplicated-substring criterion (cut whenever ANY
    * other doc shares, keep one occurrence) use
    * [[removeDuplicateSubstrings]]; for the maximal runs themselves use
    * [[maximalSharedRuns]].
    *
    * Output: (id, n_tokens, n_removed, clean_text) — one row per input doc;
    * a fully-covered doc keeps the row with clean_text = ''.
    *
    * Spans shuffle as md5 hashes (32 B, span-width-independent); covered
    * positions are (doc, pos) pairs bounded by corpus token count; the
    * rebuild aggregates (pos, token) pairs per doc — the only stage that
    * carries token text, and it carries each token once.
    */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int, maxDf: Int): DataFrame = {
    require(spanTokens > 0, s"spanTokens must be positive, got $spanTokens")
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    guard(idCol)
    val base = tokenized(df, idCol, textCol)
    val spans = spanFrame(base, idCol, spanTokens)
    val frequent = spans.groupBy("h")
      .agg(countDistinct(col(idCol)).as("span_df"))
      .filter(col("span_df") > maxDf)
      .select("h")
    cutCovered(base, spans, frequent, idCol, spanTokens)
  }

  /** Persisted span document-frequency index: (h, span_df) over a corpus —
    * the boilerplate-tracking state an ingestion loop keeps between
    * batches. Merge batches with [[mergeSpanDfIndex]]: ids are disjoint
    * across batches, so summed per-batch distinct counts equal the
    * distinct count over the union (exact, not approximate).
    */
  def spanDfIndex(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int): DataFrame = {
    guard(idCol)
    spanFrame(tokenized(df, idCol, textCol), idCol, spanTokens)
      .groupBy("h").agg(countDistinct(col(idCol)).as("span_df"))
  }

  /** Additive merge of span-df indexes built over DISJOINT doc sets. */
  def mergeSpanDfIndex(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("h").agg(sum(col("span_df")).as("span_df"))

  /** Persisted keep-one substring index: (h, keep_id, n_occ) per L-token
    * window hash — the exact-substring-dedup state an ingestion loop
    * keeps between batches ([[removeDuplicateSubstrings]]' keeper table,
    * without the ≥2 filter so single occurrences are remembered for
    * future matches). Merge with [[mergeSubstrKeeperIndex]]: keep_id
    * folds by min and occurrence counts add (ids are disjoint across
    * batches), so merged state equals the index built over the union.
    */
  /** The keeper state is typed BIGINT: the streaming id contract orders
    * ids numerically across batches, and a silent string→long cast would
    * null out and disable the cut — refuse loudly instead.
    */
  private def requireIntegralId(df: DataFrame, idCol: String,
      op: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(idCol).dataType
    require(Seq(LongType, IntegerType, ShortType, ByteType).contains(dt),
      s"$op keeper state requires an integral id column; '$idCol' is $dt")
  }

  def substrKeeperIndex(df: DataFrame, idCol: String, textCol: String,
      minRunTokens: Int): DataFrame = {
    guard(idCol)
    requireIntegralId(df, idCol, "substrKeeperIndex")
    spanFrame(tokenized(df, idCol, textCol), idCol, minRunTokens)
      .groupBy("h").agg(min(col(idCol)).cast("long").as("keep_id"),
        count(lit(1)).as("n_occ"))
  }

  /** (min, sum) merge of keeper indexes built over DISJOINT doc sets. */
  def mergeSubstrKeeperIndex(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("h")
      .agg(min(col("keep_id")).as("keep_id"), sum(col("n_occ")).as("n_occ"))

  /** Incremental keep-one exact-substring dedup for continuous ingestion:
    * clean a `fresh` batch against the corpus-wide window keepers — the
    * batch's own windows PLUS the persisted `existingIndex`
    * ([[substrKeeperIndex]] rows built with the same minRunTokens,
    * disjoint ids) — without re-scanning historical text. Byte-identical
    * on the fresh rows to [[removeDuplicateSubstrings]] over
    * (existing ∪ fresh) under the ingest id contract (fresh ids exceed
    * every indexed id — the immutable-batch ordering every dedup ingest
    * here assumes): the min-id keeper of any window then always lives in
    * the earliest batch that saw it, so no already-emitted doc is ever
    * retroactively cut.
    */
  def removeDuplicateSubstringsIncremental(existingIndex: DataFrame,
      fresh: DataFrame, idCol: String, textCol: String,
      minRunTokens: Int): (DataFrame, DataFrame) = {
    require(minRunTokens > 0,
      s"minRunTokens must be positive, got $minRunTokens")
    guard(idCol)
    requireIntegralId(fresh, idCol, "removeDuplicateSubstringsIncremental")
    val base = tokenized(fresh, idCol, textCol)
    val spans = spanFrame(base, idCol, minRunTokens)
    val freshIndex = spans.groupBy("h")
      .agg(min(col(idCol)).cast("long").as("keep_id"),
        count(lit(1)).as("n_occ"))
    val keeper = mergeSubstrKeeperIndex(existingIndex, freshIndex)
      .filter(col("n_occ") >= 2).select(col("h"), col("keep_id"))
    val covered = spans.join(keeper, "h")
      .filter(col(idCol) > col("keep_id"))
      .select(col(idCol), explode(sequence(col("pos"),
        col("pos") + (minRunTokens - 1))).as("p"))
      .distinct()
    (cutFromPositions(base, covered, idCol), freshIndex)
  }

  /** Incremental repeated-span removal for continuous ingestion: clean a
    * `fresh` batch against the corpus-wide span frequencies — the batch's
    * own spans PLUS the persisted `existingIndex` ([[spanDfIndex]] rows
    * built with the same spanTokens, disjoint ids) — without re-scanning
    * historical text. Byte-identical on the fresh rows to running
    * [[removeRepeatedSpans]] over (existing ∪ fresh), because summed
    * disjoint distinct counts ARE the union's document frequencies.
    *
    * Returns (cleaned fresh rows, the fresh batch's own index rows) so the
    * loop can [[mergeSpanDfIndex]] and persist without recomputing spans.
    */
  def removeRepeatedSpansIncremental(existingIndex: DataFrame,
      fresh: DataFrame, idCol: String, textCol: String, spanTokens: Int,
      maxDf: Int): (DataFrame, DataFrame) = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    guard(idCol)
    val base = tokenized(fresh, idCol, textCol)
    val spans = spanFrame(base, idCol, spanTokens)
    val freshIndex = spans.groupBy("h")
      .agg(countDistinct(col(idCol)).as("span_df"))
    val merged = mergeSpanDfIndex(existingIndex, freshIndex)
    val frequent = merged.filter(col("span_df") > maxDf).select("h")
    (cutCovered(base, spans, frequent, idCol, spanTokens), freshIndex)
  }

  /** Exact-substring dedup at FULL suffix-array semantics (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): delete
    * every token that lies inside a substring of ≥ `minRunTokens` tokens
    * shared with a LOWER-id document, keeping the lowest-id occurrence —
    * the ExactSubstr criterion, where [[removeRepeatedSpans]] is the
    * weaker corpus-frequency variant (cut only when > maxDf docs share).
    *
    * No suffix array and no pair materialization are needed, because
    * window coverage IS run membership: a token position p in doc d lies
    * inside a maximal run of R ≥ L tokens shared with doc d' **iff** some
    * L-token window containing p matches d' (⇐: the window itself is a
    * shared L-substring through p; ⇒: the run's windows start at
    * [a, a+R−L] and `min(p, a+R−L)` starts one that covers p). So the
    * exact removal set falls out of a per-window-hash `min(id)`: an
    * occurrence is cut iff its doc id exceeds the hash's minimum doc id.
    * The reference's span machinery only ever probed one fixed window
    * length for a *frequency* criterion; this closes the acknowledged gap
    * to true longest-match substring dedup for the removal side, and
    * [[maximalSharedRuns]] reports the maximal runs themselves.
    *
    * Semantics notes: cross-document only — a substring repeated WITHIN
    * one doc (and nowhere lower) is kept intact (within-doc repetition is
    * the Gopher rules' job); "lowest id" keeps ALL of that doc's
    * occurrences. Docs shorter than `minRunTokens` have no qualifying
    * substring and pass through untouched.
    *
    * Output: (id, n_tokens, n_removed, clean_text) — one row per input
    * doc, same contract as [[removeRepeatedSpans]].
    *
    * Scale (100 TB stance): ONE window-hash aggregation (md5, 32 B rows,
    * map-side combined) → rejoin → position cut. No pairing stage, so a
    * boilerplate substring shared by n docs costs n rows, never n²; the
    * rebuild carries each kept token exactly once. Caps are unnecessary —
    * every stage is linear in corpus token count.
    */
  def removeDuplicateSubstrings(df: DataFrame, idCol: String,
      textCol: String, minRunTokens: Int): DataFrame = {
    require(minRunTokens > 0,
      s"minRunTokens must be positive, got $minRunTokens")
    guard(idCol)
    val base = tokenized(df, idCol, textCol)
    val spans = spanFrame(base, idCol, minRunTokens)
    // keep_id per window hash; HAVING n_occ >= 2 only shrinks the join
    // side (a single-occurrence window can never satisfy id > keep_id)
    val keeper = spans.groupBy("h")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
      .select(col("h"), col("keep_id"))
    val covered = spans.join(keeper, "h")
      .filter(col(idCol) > col("keep_id"))
      .select(col(idCol), explode(sequence(col("pos"),
        col("pos") + (minRunTokens - 1))).as("p"))
      .distinct()
    cutFromPositions(base, covered, idCol)
  }

  /** MAXIMAL shared token runs between document pairs — the report form of
    * exact-substring dedup: every maximal-length match of ≥ `minRunTokens`
    * whitespace tokens shared by two distinct documents, as
    * (id_a, id_b, pos_a, pos_b, run_len) with id_a < id_b and 1-based
    * token positions. "Maximal" is exact: the run extends neither left nor
    * right (a 70-token shared footer reports ONE row of run_len 70, not 51
    * window hits), which is what [[commonSpanPairs]]' fixed-window pair
    * output cannot say.
    *
    * Algorithm — seed-and-island, the distributed equivalent of reading
    * maximal repeats off a suffix array: (1) every L-token window hashes
    * to (id, pos, h); (2) occurrence pairs per hash (id_a < id_b) are the
    * window matches; (3) per (id_a, id_b, diagonal = pos_a − pos_b),
    * CONTIGUOUS pos_a stretches are exactly the maximal runs (a run of R
    * tokens matches all R−L+1 of its windows on one diagonal, and one
    * token of extension would extend the window stretch too), each
    * reported as run_len = stretch_count + L − 1. All three stages are
    * hash/position rows — document text never shuffles.
    *
    * Scale: pairing is per-window-hash and `maxOccPerSpan` caps the
    * degenerate boilerplate bucket (n occurrences of one window text →
    * n²/2 seed pairs; buckets past the cap are dropped, loudly visible in
    * the cap parameter — same contract as the LSH families). Run
    * assembly is a window function partitioned by (pair, diagonal) — at
    * most one run's windows per partition key. Use the removal form
    * ([[removeDuplicateSubstrings]]) when only coverage is needed: it has
    * no pair stage at all.
    */
  def maximalSharedRuns(df: DataFrame, idCol: String, textCol: String,
      minRunTokens: Int, maxOccPerSpan: Int = 10000): DataFrame = {
    require(minRunTokens > 0,
      s"minRunTokens must be positive, got $minRunTokens")
    require(maxOccPerSpan >= 2, s"maxOccPerSpan must be >= 2, got $maxOccPerSpan")
    guard(idCol)
    // deliberately UNCACHED: the spans frame is corpus-token-sized (34M
    // rows at the 200k-doc probe), and pinning it (localCheckpoint blocks
    // are unevictable) starves the self-join sorts of execution memory —
    // it OOMed exactly that way at the 4× probe size. Recomputing the
    // map-only scan for the cap agg and the join side costs two cheap
    // scans; the self-join's two identical wf subplans collapse into one
    // shuffle via ReusedExchange. Only the post-cap wf rows (pairs-worth,
    // tiny once boilerplate buckets drop) flow beyond the scans.
    val spans = spanFrame(tokenized(df, idCol, textCol), idCol, minRunTokens)
    val okH = spans.groupBy("h").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ").between(2, maxOccPerSpan))
      .select("h")
    val wf = spans.join(okH, "h")
    val seeds = wf.select(col("h"), col(idCol).cast("long").as("id_a"),
        col("pos").cast("long").as("pos_a"))
      .join(wf.select(col("h"), col(idCol).cast("long").as("id_b"),
        col("pos").cast("long").as("pos_b")), "h")
      .filter(col("id_a") < col("id_b"))
    val byDiag = Window
      .partitionBy(col("id_a"), col("id_b"), col("diag"))
      .orderBy(col("pos_a"))
    seeds
      .withColumn("diag", col("pos_a") - col("pos_b"))
      .withColumn("island", col("pos_a") - row_number().over(byDiag))
      .groupBy("id_a", "id_b", "diag", "island")
      .agg(min("pos_a").as("pos_a"), min("pos_b").as("pos_b"),
        (count(lit(1)) + (minRunTokens - 1)).as("run_len"))
      .select("id_a", "id_b", "pos_a", "pos_b", "run_len")
  }

  /** Paragraph-level exact dedup (the CCNet recipe's first pass): delete
    * every paragraph whose exact trimmed text occurs in more than `maxDf`
    * distinct documents. The line/paragraph analog of
    * [[removeRepeatedSpans]] — site chrome (nav blocks, cookie banners,
    * legal footers) repeats VERBATIM as whole paragraphs, and hashing one
    * unit per paragraph is far cheaper than one per token position; run
    * the span form after this for the partial-overlap tail.
    *
    * Output: (id, n_paras, n_removed, clean_text) — one row per input doc;
    * kept paragraphs rejoin with a single newline in original order, and a
    * fully-boilerplate doc keeps its row with clean_text = ''. Paragraphs
    * are `sep`-delimited (default: any newline run); blank paragraphs are
    * dropped from both counts and rebuild.
    *
    * Scale: paragraphs shuffle as md5 hex (32 B) for the frequency agg
    * (partial map-side combine); paragraph TEXT only moves doc → its own
    * rebuild group. One row per (doc, paragraph), never per token.
    */
  def dropRepeatedParagraphs(df: DataFrame, idCol: String, textCol: String,
      maxDf: Int, sep: String = "\\n+"): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    guard(idCol)
    val paras = paraFrame(df, idCol, textCol, sep)
    val frequent = paras.groupBy("h")
      .agg(countDistinct(col(idCol)).as("para_df"))
      .filter(col("para_df") > maxDf)
      .select("h")
    cutParas(df, paras, frequent, idCol)
  }

  /** Persisted paragraph document-frequency index: (h, para_df) over a
    * corpus — the boilerplate-paragraph state an ingestion loop keeps
    * between batches (the paragraph analog of [[spanDfIndex]]). Merge
    * batches with [[mergeParaDfIndex]]: ids are disjoint across batches,
    * so summed per-batch distinct counts equal the distinct count over
    * the union (exact, not approximate).
    */
  def paraDfIndex(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\\n+"): DataFrame = {
    guard(idCol)
    paraFrame(df, idCol, textCol, sep)
      .groupBy("h").agg(countDistinct(col(idCol)).as("para_df"))
  }

  /** Additive merge of paragraph-df indexes built over DISJOINT doc sets. */
  def mergeParaDfIndex(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("h").agg(sum(col("para_df")).as("para_df"))

  /** Incremental paragraph dedup for continuous ingestion: clean a `fresh`
    * batch against the corpus-wide paragraph frequencies — the batch's own
    * paragraphs PLUS the persisted `existingIndex` ([[paraDfIndex]] rows
    * built with the same `sep`, disjoint ids) — without re-scanning
    * historical text. Byte-identical on the fresh rows to running
    * [[dropRepeatedParagraphs]] over (existing ∪ fresh), because summed
    * disjoint distinct counts ARE the union's document frequencies.
    *
    * Returns (cleaned fresh rows, the fresh batch's own index rows) so the
    * loop can [[mergeParaDfIndex]] and persist without recomputing hashes.
    */
  def dropRepeatedParagraphsIncremental(existingIndex: DataFrame,
      fresh: DataFrame, idCol: String, textCol: String, maxDf: Int,
      sep: String = "\\n+"): (DataFrame, DataFrame) = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    guard(idCol)
    val paras = paraFrame(fresh, idCol, textCol, sep)
    val freshIndex = paras.groupBy("h")
      .agg(countDistinct(col(idCol)).as("para_df"))
    val merged = mergeParaDfIndex(existingIndex, freshIndex)
    val frequent = merged.filter(col("para_df") > maxDf).select("h")
    (cutParas(fresh, paras, frequent, idCol), freshIndex)
  }

  /** (id, p0, para, h): one row per non-blank trimmed paragraph, with its
    * original position and md5. Shared by the batch, index, and
    * incremental paragraph-dedup forms.
    */
  private def paraFrame(df: DataFrame, idCol: String, textCol: String,
      sep: String): DataFrame =
    df.select(col(idCol),
        posexplode(split(col(textCol), sep)).as(Seq("p0", "para")))
      .select(col(idCol), col("p0"), trim(col("para")).as("para"))
      .filter(col("para") =!= "")
      .withColumn("h", md5(col("para").cast("binary")))

  /** Drop `frequent` paragraphs and rebuild each doc's text in original
    * order: (id, n_paras, n_removed, clean_text), one row per input doc.
    */
  private def cutParas(df: DataFrame, paras: DataFrame, frequent: DataFrame,
      idCol: String): DataFrame = {
    val kept = paras.join(frequent, Seq("h"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws("\n", transform(array_sort(collect_list(struct(col("p0"),
          col("para")))), s => s("para"))).as("clean_text"))
    val stats = paras.groupBy(col(idCol)).agg(count(lit(1)).as("n_paras"))
    df.select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_paras"), lit(0L)).as("n_paras"),
        (coalesce(col("n_paras"), lit(0L)) -
          coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  private def tokenized(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("tk"))

  /** (id, pos, h): every spanTokens-token window's md5, 1-based positions.
    * Docs shorter than one span contribute no spans (filter BEFORE
    * sequence() — sequence(1, 0) is a descending [1, 0], not empty).
    */
  private def spanFrame(base: DataFrame, idCol: String, L: Int): DataFrame =
    base.filter(size(col("tk")) >= L).select(col(idCol), explode(
      transform(sequence(lit(1), size(col("tk")) - (L - 1)),
        i => struct(i.as("pos"),
          md5(array_join(slice(col("tk"), i, lit(L)), " ").cast("binary"))
            .as("h")))).as("sp"))
      .select(col(idCol), col("sp.pos"), col("sp.h"))

  /** Cut every token covered by a frequent-span occurrence and rebuild the
    * text from the kept (pos, token) pairs.
    */
  private def cutCovered(base: DataFrame, spans: DataFrame,
      frequent: DataFrame, idCol: String, L: Int): DataFrame =
    cutFromPositions(base, spans.join(frequent, "h")
      .select(col(idCol), explode(sequence(col("pos"),
        col("pos") + (L - 1))).as("p"))
      .distinct(), idCol)

  /** Rebuild each doc's text from the tokens NOT listed in `covered`
    * ((id, p) rows, 1-based token positions). Shared by the
    * frequency-criterion cut ([[cutCovered]]) and the keep-lowest-id cut
    * ([[removeDuplicateSubstrings]]).
    */
  private def cutFromPositions(base: DataFrame, covered: DataFrame,
      idCol: String): DataFrame = {
    val toksPos = base.select(col(idCol),
      posexplode(col("tk")).as(Seq("p0", "tok")))
      .select(col(idCol), (col("p0") + 1).as("p"), col("tok"))
    val kept = toksPos.join(covered, Seq(idCol, "p"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("p"),
          col("tok")))), s => s("tok")), " ").as("clean_text"))
    base.select(col(idCol), size(col("tk")).cast("long").as("n_tokens"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Top-k adjacent-token collocations by pointwise mutual information —
    * the classic phrase-mining signal (Church & Hanks 1990; word2vec's
    * phrase pass uses the same score shape) for tokenizer vocabularies and
    * corpus datacards.
    *
    * PMI = ln( p(ab) / (p(a)p(b)) ) = ln( c₂·T² / (B·c₁(a)·c₁(b)) ) with T
    * = corpus token instances and B = corpus bigram instances. `c₂·T²`
    * overflows 2^52 long before the counts themselves do, so the ratio is
    * split into two exactly-representable factors, each through the signed
    * staged log:
    *
    *   pmi_micro = floor(ln(c₂·T/(B·c₁a))·10⁶) + floor(ln(T/c₁b)·10⁶)
    *
    * The sum of the two floors is the DEFINITION here (within 2·10⁻⁶ of
    * true PMI — two grid floors), evaluated identically by the DuckDB
    * oracle, so ranking and hashes are engine-exact. Needs
    * `c₂·T < 2^52` and `B·c₁a < 2^52` — fine to ~10⁸ tokens per scoring
    * run; shard the corpus beyond that.
    *
    * One corpus scan feeds both the bigram and unigram aggregations
    * (slim (token, count) shuffles); the model join is |bigram-types|
    * rows; the final top-k is (pmi desc, w1, w2) via TakeOrdered — no
    * global sort. `minCount` keeps noise bigrams (hapax pairs score
    * highest under PMI) out of the ranking.
    */
  def collocations(df: DataFrame, textCol: String, minCount: Long,
      k: Int): DataFrame = {
    require(k > 0 && minCount >= 1, s"need k > 0, minCount >= 1; got $k, $minCount")
    val tk = TextOps.tokens(col(textCol))
    val bigrams = df.filter(size(tk) >= 2).select(explode(
        arrays_zip(slice(tk, lit(1), size(tk) - 1),
          slice(tk, lit(2), size(tk) - 1))).as("bg"))
      .select(col("bg")("0").as("w1"), col("bg")("1").as("w2"))
    // one materialization each: c2 feeds its own total AND the PMI join,
    // uni feeds its total AND both word-side joins — left lazy, the
    // corpus tokenizes five times (r12 scan audit; now twice). Both are
    // aggregate-sized (vocab / distinct bigrams), never corpus-sized.
    val c2 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .localCheckpoint()
    val uni = df.select(explode(tk).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
      .localCheckpoint()
    val totB = c2.agg(sum(col("c2")).as("bb"))
    val totT = uni.agg(sum(col("c1")).as("tt"))
    val joined = c2.filter(col("c2") >= minCount)
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c1", "c1a"), "w1")
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c1", "c1b"), "w2")
      .crossJoin(broadcast(totB)).crossJoin(broadcast(totT))
    val chainA = graft.functions.PortableMath.microLnSignedStages(
      "c2 * tt", "bb * c1a", graft.functions.PortableMath.sparkShiftLeft)
    val chainB = graft.functions.PortableMath.microLnSignedStages(
      "tt", "c1b", graft.functions.PortableMath.sparkShiftLeft)
    val afterA = chainA.foldLeft(joined) {
        case (d, (n, s)) => d.withColumn(n, expr(s))
      }
      .select(col("w1"), col("w2"), col("c2"), col("c1a"), col("c1b"),
        col("tt"), col("bb"), col("lp").as("lp_first"))
    val scored = chainB.foldLeft(afterA) {
        case (d, (n, s)) => d.withColumn(n, expr(s))
      }
      .select(col("w1"), col("w2"), col("c2"),
        (col("lp_first") + col("lp")).as("pmi_micro"))
    scored.orderBy(col("pmi_micro").desc, col("w1").asc, col("w2").asc)
      .limit(k)
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy(col("pmi_micro").desc, col("w1").asc, col("w2").asc))
        .cast("long"))
  }

  /** Exact top-`k` corpus tokens, Misra-Gries-pruned (Misra & Gries 1982):
    * the heavy-hitter answer to "plain `groupBy(token)` shuffles one row
    * per distinct token per partition, and web-scale text is ~half hapax
    * legomena, so that's ~N/2 shuffled rows at 100 TB". Instead each
    * partition keeps an m-counter Misra-Gries summary (one map-only pass,
    * amortized O(1) per token) and shuffles AT MOST m rows — candidates ∝
    * partitions, not corpus.
    *
    * Exactness, certified not hoped-for: the output is ALWAYS the exact
    * top-k (same rows and counts as [[text-vocab-topk]]'s plain
    * aggregation, `(freq desc, token asc)` order, ties at rank k cut
    * identically).
    *  - No partition ever evicted → the summaries ARE exact partial
    *    counts; summing them is the plain aggregation with a bounded
    *    dictionary.
    *  - Evictions happened → a second map-only scan exact-counts ONLY the
    *    candidate tokens (broadcast semi join), and the MG bound certifies
    *    the result: any token with global freq > N/(m+1) survives in some
    *    partition's summary (pigeonhole over partitions), so if the k-th
    *    exact candidate count clears N/(m+1), no non-candidate can reach
    *    the top k.
    *  - Certification fails (k-th count at/below the bound, or fewer than
    *    k certified candidates) → loud stderr note and an exact full
    *    aggregation fallback. Size `sketchCapacity` ≈ k · skew-margin so
    *    this stays the cold path; the default 4096 certifies a top-100
    *    whenever the 100th token holds > 0.024% of corpus tokens.
    *
    * The candidate SET depends on partition layout; the OUTPUT never does —
    * every path returns the same exact top-k, which is what makes this
    * oracle-checkable against the plain-SQL aggregation.
    */
  def vocabTopKSketch(corpus: DataFrame, textCol: String, k: Int = 100,
      sketchCapacity: Int = 4096): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    // capacity below k is legal — certification simply fails and the
    // exact fallback runs — but pointless; size m ≫ k for the fast path
    require(sketchCapacity >= 1,
      s"sketchCapacity must be positive, got $sketchCapacity")
    val spark = corpus.sparkSession
    import spark.implicits._
    val m = sketchCapacity
    def toks = corpus.select(explode(TextOps.tokens(col(textCol))).as("token"))
    def exactTopK(counts: DataFrame): DataFrame =
      counts.orderBy(col("freq").desc, col("token").asc).limit(k)
    def fullAgg: DataFrame =
      exactTopK(toks.groupBy("token").agg(count(lit(1)).as("freq")))

    // pass 1, map-only: per-partition MG summaries. Rows carry the
    // partition's evicted flag so the certifier can tell "exact partial
    // counts" from "lossy residuals" without a second structure.
    val summ = toks.as[String].mapPartitions { it =>
      val counts = new java.util.HashMap[String, Long](m * 2)
      var evicted = false
      while (it.hasNext) {
        val t = it.next()
        val cur = counts.get(t) // 0L when absent
        if (cur > 0L) counts.put(t, cur + 1L)
        else if (counts.size < m) counts.put(t, 1L)
        else {
          // decrement-all sweep (the new token's implicit 1 is consumed
          // too); amortized O(1) — each sweep cancels m+1 increments
          evicted = true
          val jt = counts.entrySet().iterator()
          while (jt.hasNext) {
            val e = jt.next()
            if (e.getValue == 1L) jt.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      val out = Vector.newBuilder[(String, Long, Boolean)]
      counts.forEach((t, c) => out += ((t, c, evicted)))
      out.result().iterator
    }.toDF("token", "resid", "evicted").localCheckpoint()

    val anyEvictRow = summ.agg(max(col("evicted"))).collect()(0)
    if (anyEvictRow.isNullAt(0)) return fullAgg // empty corpus
    if (!anyEvictRow.getBoolean(0))
      return exactTopK(summ.groupBy("token").agg(sum("resid").as("freq")))

    // lossy summaries: exact-count candidates only (second map-only scan),
    // then certify against the MG bound
    val cand = summ.select("token").distinct()
    val top = exactTopK(
      toks.join(broadcast(cand), Seq("token"), "left_semi")
        .groupBy("token").agg(count(lit(1)).as("freq")))
      .localCheckpoint()
    // ungrouped aggregates return exactly one row — the certification
    // cutoff reads ride the BoundedCollect registry like every other
    // driver-side collect (r16 ask #8)
    val n = graft.tools.BoundedCollect(corpus
        .select(coalesce(sum(size(TextOps.tokens(col(textCol)))), lit(0L))),
        1L, "an ungrouped SUM aggregate returns exactly one row")(0)
      .getLong(0)
    val got = top.count()
    val kth = if (got < k) -1L
      else graft.tools.BoundedCollect(top.agg(min(col("freq"))), 1L,
        "an ungrouped MIN aggregate returns exactly one row")(0)
        .getLong(0)
    if (got >= k && kth * (m + 1L) > n) top
    else {
      // certification failed — pathological skew for this capacity; the
      // answer must stay exact, so pay the full aggregation and say so
      System.err.println(s"[graft] vocabTopKSketch: cannot certify top-$k " +
        s"at capacity $m (kth=$kth, N=$n) — falling back to full aggregation")
      fullAgg
    }
  }

  /** Per-document out-of-vocabulary rate against a `vocab` frame (one
    * `word` column) — the tokenizer-coverage audit a corpus release runs
    * before committing to a vocabulary: how much of each document would
    * fall outside it. Output: (idCol, n_tokens, n_oov, oov_micro) with
    * `oov_micro = n_oov·10⁶ div n_tokens` (exact integer; both operands
    * non-negative so truncation IS floor on every engine).
    *
    * Scale: the vocab is vocabulary-sized by contract and BROADCASTS as a
    * membership flag; the corpus pass is one slim (id, token) explode +
    * one aggregation on the document key — no corpus-side shuffle beyond
    * the groupBy.
    */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    require(!Set("word", "n_tokens", "n_oov", "oov_micro")(idCol),
      s"idCol '$idCol' collides with an oovRate working/output column")
    val words = df.select(col(idCol),
      explode(TextOps.tokens(col(textCol))).as("word"))
    val flagged = vocab.select(col("word").cast("string").as("word"))
      .distinct().withColumn("__in_vocab", lit(1L))
    words.join(broadcast(flagged), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_micro",
        expr("n_oov * 1000000 DIV n_tokens"))
  }

  /** Per-row CMS bucket: first 40 bits of md5("row:token") modulo `width` —
    * the mm_features nibble idiom, deterministic and replayable in any
    * engine with md5 (the oracle decodes the same 10 hex chars). */
  private def cmsBucket(row: Int, token: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$row:"), token)), 1, 10), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Count-Min sketch of the corpus token frequencies (Cormode &
    * Muthukrishnan 2005): `depth` hash rows × `width` buckets, cell =
    * Σ counts of the tokens landing there. Returns `(row, bucket, cnt)` —
    * at most depth·width rows of bounded, MERGEABLE state: sketches of two
    * corpus halves sum cell-wise to the sketch of the union (it's a linear
    * projection of the count vector), which is what makes this the
    * frequency-tracking primitive for sharded and streaming ingest where
    * [[vocabTopKSketch]]'s per-partition MG summaries answer only top-k.
    *
    * Point estimates read `min` over the token's `depth` cells —
    * overcount-only (≤ N·e/width error at depth ln(1/δ) rows, the classic
    * bound); [[cmsEstimates]] wires that lookup. Hashing is md5-derived
    * (engine-portable, no seed state), so the whole sketch is
    * oracle-hash-exact — not merely approximately right.
    *
    * Scale: one explode → one (token, count) aggregation with map-side
    * combine, then a map-only expand to `depth` (row, bucket) keys and a
    * second aggregation onto depth·width cells — shuffles carry token
    * counts, never text, and the result is O(depth·width) regardless of
    * corpus size.
    */
  def countMinSketch(corpus: DataFrame, textCol: String, depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val counts = corpus
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    counts
      .select(explode(array((0 until depth).map(r =>
          struct(lit(r.toLong).as("row"),
            cmsBucket(r, col("token"), width).as("bucket"))): _*)).as("rb"),
        col("cnt"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Per-shard reproducibility manifest: `(shardCol, n_docs, n_tokens,
    * content_xor)` — the attestation a 100 TB corpus needs after every
    * replication, migration, or recompaction: recompute the manifest on
    * the copy and diff two tiny tables instead of the corpora.
    * `content_xor` is the XOR-fold of each doc's 60-bit md5 of
    * `id:text` — order-insensitive and overflow-free by construction
    * (unlike a SUM, XOR cannot wrap, so Spark and a SQL oracle agree
    * with no width gymnastics), sensitive to any single-document change,
    * insertion, or deletion. The one blind spot, inherent to XOR: a
    * row duplicated an EVEN number of times cancels out — pair the
    * manifest with `n_docs` (it counts every row) as done here, which
    * catches any pure duplication because the count moves even when the
    * fold does not.
    *
    * Scale: map-only hash + one aggregation with map-side combine;
    * output is |shards| rows. The manifest of a union is NOT derivable
    * from the parts' folds alone unless shards are disjoint — which is
    * exactly the sharding contract.
    */
  def shardManifest(df: DataFrame, shardCol: String, idCol: String,
      textCol: String): DataFrame = {
    guard(idCol)
    df.select(col(shardCol), col(idCol),
        TextOps.tokenCount(col(textCol)).as("n_tokens"),
        conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
          col(textCol))), 1, 15), 16, 10).cast("long").as("__sm_h"))
      .groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        expr("bit_xor(__sm_h)").as("content_xor"))
  }

  /** CMS point estimates for the exact top-`k` tokens: `(token, freq,
    * freq_est)` with `freq_est = min` over the token's `depth` sketch
    * cells — est ≥ freq always, and the pairing makes the sketch's
    * accuracy itself a checked output rather than a claim. The top-k side
    * is the [[vocabTopKSketch]] aggregation; the lookup joins k·depth slim
    * probe rows against the depth·width cell table (broadcast-sized both
    * sides).
    */
  def cmsEstimates(corpus: DataFrame, textCol: String, k: Int = 20,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val cells = countMinSketch(corpus, textCol, depth, width)
    val top = corpus
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(k)
    top
      .select(col("token"), col("freq"),
        explode(array((0 until depth).map(r =>
          struct(lit(r.toLong).as("row"),
            cmsBucket(r, col("token"), width).as("bucket"))): _*)).as("rb"))
      .join(cells, col("rb.row") === cells("row") &&
        col("rb.bucket") === cells("bucket"))
      .groupBy(col("token"))
      .agg(max(col("freq")).as("freq"), min(col("cnt")).as("freq_est"))
  }

  /** Zipf tail index of the vocabulary — the Hill (1975) MLE over the
    * top-k token frequencies, the vocabulary-health diagnostic (a healthy
    * natural-language corpus sits near α ≈ 1; boilerplate/spam floods
    * flatten the head, template storms steepen it). With f₁ ≥ … ≥ f_k
    * the k largest frequencies (ties at the boundary broken by token
    * asc — deterministic on both engines):
    *
    *   hill_alpha_micro = floor(10¹² · k / Σᵢ floor(10⁶·ln(fᵢ/f_k)))
    *
    * Each log term is the engine-exact staged micro-ln
    * ([[graft.functions.PortableMath.microLnSignedStages]], the BM25 idf
    * convention: per-term floors, then exact integer division). A
    * degenerate head (all top-k frequencies equal — Σ = 0) pins 0: no
    * tail decay is measurable.
    *
    * Output: ONE row (k_eff, f_k, sum_ln_micro, hill_alpha_micro).
    * Scale: one partial-agg'd vocabulary count, a TakeOrdered top-k, the
    * staged-ln map over ≤ k rows, one 1-row total.
    */
  def zipfAlpha(df: DataFrame, textCol: String, k: Int = 64): DataFrame = {
    require(k >= 2, s"zipfAlpha needs k >= 2, got $k")
    val freqs = df
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc).limit(k)
      .localCheckpoint()
    val head = freqs.agg(count(lit(1)).as("ke"),
      coalesce(min(col("freq")), lit(0L)).as("fk")).head()
    val (kEff, fk) = (head.getLong(0), head.getLong(1))
    require(kEff >= 2, s"zipfAlpha: vocabulary has $kEff tokens (< 2)")
    val chain = graft.functions.PortableMath.microLnSignedStages(
      "freq", "fk", graft.functions.PortableMath.sparkShiftLeft)
    val withLp = chain.foldLeft(freqs.withColumn("fk", lit(fk))) {
      case (acc, (n, s)) => acc.withColumn(n, expr(s))
    }
    withLp
      .agg(coalesce(sum(col("lp")), lit(0L)).as("sum_ln_micro"))
      .select(lit(kEff).as("k_eff"), lit(fk).as("f_k"),
        col("sum_ln_micro"),
        when(col("sum_ln_micro") === 0, lit(0L))
          .otherwise(expr(s"(1000000000000 * $kEff) DIV sum_ln_micro"))
          .as("hill_alpha_micro"))
  }

  /** Per-group [[zipfAlpha]] — the Hill tail index of EACH group's own
    * vocabulary (one corpus-health row per language for the datacard).
    * Same estimator, same staged micro-ln, but NOTHING collects: the
    * per-group top-k is cut with [[graft.etl.Transforms.globalSortRank]]
    * over (group, freq desc, token asc) minus the group's min rank — a
    * range-partitioned exact rank, never a per-group window that would
    * pin a 100 TB group's whole vocabulary to one task. Groups whose
    * vocabulary has < 2 tokens, or a flat top-k (Σln = 0), report 0 —
    * the global form's `require` becomes a value here because one thin
    * group must not fail the whole datacard.
    *
    * Output: one row per group — (groupCol, k_eff, sum_ln_micro,
    * hill_alpha_micro).
    */
  def zipfAlphaByGroup(df: DataFrame, groupCol: String, textCol: String,
      k: Int = 64): DataFrame = {
    require(!Reserved(groupCol),
      s"groupCol '$groupCol' collides with a zipfAlpha working column")
    zipfAlphaByGroupFreqs(
      df.select(col(groupCol).as("__zg"),
          explode(TextOps.tokens(col(textCol))).as("token"))
        .groupBy(col("__zg"), col("token")).agg(count(lit(1)).as("freq")),
      "__zg", "token", "freq", k)
      .withColumnRenamed("__zg", groupCol)
  }

  /** [[zipfAlphaByGroup]] over a PRE-AGGREGATED (group, token, freq)
    * table — the fused-pipeline form: a caller that already owns the
    * per-group term frequencies (the datacard builds ONE such table and
    * feeds the Zipf, OOV, and vocabulary legs from it) skips a second
    * full-corpus tokenize + shuffle. Same estimator, same output.
    */
  def zipfAlphaByGroupFreqs(freqTable: DataFrame, groupCol: String,
      tokenCol: String, freqCol: String, k: Int = 64): DataFrame = {
    require(k >= 2, s"zipfAlphaByGroupFreqs needs k >= 2, got $k")
    require(groupCol == "__zg" || !Reserved(groupCol),
      s"groupCol '$groupCol' collides with a zipfAlpha working column")
    val freqs = freqTable.select(col(groupCol).as("__zg"),
      col(tokenCol).as("token"), col(freqCol).cast("long").as("freq"))
    val ranked = graft.etl.Transforms.globalSortRank(freqs,
      Seq(col("__zg").asc, col("freq").desc, col("token").asc), "__zr")
    val base = ranked.groupBy(col("__zg")).agg(min(col("__zr")).as("__z0"))
    val topk = ranked.join(base, Seq("__zg"))
      .filter(col("__zr") - col("__z0") < k)
      .select(col("__zg"), col("freq"))
    val heads = topk.groupBy(col("__zg"))
      .agg(count(lit(1)).as("ke"), min(col("freq")).as("fk"))
    val chain = graft.functions.PortableMath.microLnSignedStages(
      "freq", "fk", graft.functions.PortableMath.sparkShiftLeft)
    val withLp = chain.foldLeft(topk.join(heads, Seq("__zg"))) {
      case (acc, (n, s)) => acc.withColumn(n, expr(s))
    }
    withLp.groupBy(col("__zg"))
      .agg(max(col("ke")).as("k_eff"),
        coalesce(sum(col("lp")), lit(0L)).as("sum_ln_micro"))
      .select(col("__zg").as(groupCol), col("k_eff"), col("sum_ln_micro"),
        when(col("k_eff") < 2 || col("sum_ln_micro") === 0, lit(0L))
          .otherwise(expr("(1000000000000 * k_eff) DIV sum_ln_micro"))
          .as("hill_alpha_micro"))
  }

  // ---- the corpus-datacard panel, assembled from slim mergeable state
  //      so the batch query and the streaming ingest share one truth ----

  /** Slim per-document datacard facts — everything the health panel needs
    * except token frequencies, ~40 bytes/doc with the text dropped:
    * (lang, doc_id, n_toks, q6, text_md5, dominant). q6 is the quality
    * score pre-cast to DECIMAL(18,6), the exact summand the panel's
    * order-insensitive mean divides — storing the cast value is what
    * makes a re-aggregation over persisted state bit-identical.
    *
    * `frozenPieces` (a fixed (piece, lp_micro) table — e.g. a persisted
    * [[Tokenizer.unigramPieces]] vocabulary) additionally carries the
    * tokenizer-fertility facts per doc: (fert_words, fert_pieces) from
    * the frozen-table unigram encode. Frozen is what makes the leg
    * MERGEABLE: a corpus-trained tokenizer changes with every batch, but
    * a fixed broadcast table gives per-doc counts that sum additively —
    * so the streaming datacard can finally include fertility
    * ([[graft.streaming.Pipelines.datacardIngest]]; r10 VERDICT ask #3).
    */
  def datacardDocStats(docs: DataFrame, idCol: String, textCol: String,
      langCol: String,
      frozenPieces: Option[DataFrame] = None): DataFrame = {
    guard(idCol); guard(langCol)
    // a string id would silently cast to null and poison persisted
    // streaming state — same loud refusal as substrKeeperIndex (r10 ADVICE)
    requireIntegralId(docs, idCol, "datacardDocStats")
    val base = docs.select(col(langCol), col(idCol).cast("long").as(idCol),
      TextOps.tokenCount(col(textCol)).as("n_toks"),
      TextOps.qualityScore(col(textCol))
        .cast(DecimalType(18, 6)).as("q6"),
      md5(col(textCol).cast("binary")).as("text_md5"),
      TextOps.dominantScript(col(textCol)).as("dominant"))
    frozenPieces.fold(base) { pieces =>
      val fert = Tokenizer.unigramEncodeCounts(docs, idCol, textCol, pieces)
        .select(col(idCol).cast("long").as(idCol),
          col("n_words").as("fert_words"),
          col("n_pieces").as("fert_pieces"))
      base.join(fert, Seq(idCol), "left")
        .select(base.columns.map(col) :+
          coalesce(col("fert_words"), lit(0L)).as("fert_words") :+
          coalesce(col("fert_pieces"), lit(0L)).as("fert_pieces"): _*)
    }
  }

  /** Per-(language, token) frequency table — the one tokenize + shuffle
    * the panel's vocabulary, OOV, and Zipf legs share. Additive across
    * disjoint doc sets ([[mergeLangTokenFreqs]]).
    */
  def langTokenFreqs(docs: DataFrame, textCol: String,
      langCol: String): DataFrame = {
    guard(langCol)
    docs.select(col(langCol),
      explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy(col(langCol), col("word")).agg(count(lit(1)).as("freq"))
  }

  /** Additive merge of frequency tables built over DISJOINT doc sets. */
  def mergeLangTokenFreqs(a: DataFrame, b: DataFrame,
      langCol: String = "lang"): DataFrame =
    a.unionByName(b).groupBy(col(langCol), col("word"))
      .agg(sum(col("freq")).as("freq"))

  /** The per-language corpus health panel: base counts + order-insensitive
    * mean quality, modal dominant script + non-latin share, OOV vs the
    * global top-`vocabK` vocabulary, each language's own Zipf tail, and
    * the length Gini — all from [[datacardDocStats]] facts and a
    * [[langTokenFreqs]] table, so a STREAMED corpus (merged slim state,
    * text never re-read) produces the bit-identical panel to a batch
    * recompute. Every leg collapses to language cardinality before the
    * joins; the only windows are the bounded (lang × ≤8 scripts) mode
    * pick and the range-partitioned globalSortRank inside the components.
    *
    * Fertility is schema-driven: when `docStats` carries the
    * frozen-tokenizer facts (fert_words, fert_pieces — see
    * [[datacardDocStats]]), the panel appends `fertility_micro` =
    * ⌊Σpieces·10⁶ / Σwords⌋ per language (additive sums, so streamed
    * state replays it exactly); CORPUS-trained fertility has no mergeable
    * form and stays a batch-side join (the corpus_datacard query).
    */
  def datacardPanel(docStats: DataFrame, ltf: DataFrame,
      langCol: String = "lang", idCol: String = "doc_id", vocabK: Int = 20,
      zipfK: Int = 64): DataFrame = {
    guard(idCol); guard(langCol)
    val dec = DecimalType(38, 0)
    def fdiv(nm: Column, dn: Column): Column =
      ((nm - pmod(nm, dn)) / dn).cast("long")
    val base = docStats.groupBy(col(langCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_toks")).as("total_tokens"),
      (sum(col("q6")).cast("double") / count(lit(1))).as("mean_quality"),
      countDistinct(col("text_md5")).as("n_unique"),
      sum(when(col("n_toks") >= 100, 1L).otherwise(0L)).as("n_long"))
    val domW = Window.partitionBy(col(langCol))
      .orderBy(col("__dc").desc, col("dominant").asc)
    val domMode = docStats.groupBy(col(langCol), col("dominant"))
      .agg(count(lit(1)).as("__dc"))
      .withColumn("__dr", row_number().over(domW))
      .filter(col("__dr") === 1)
      .select(col(langCol), col("dominant").as("dom_script"))
    val nonLatin = docStats.groupBy(col(langCol))
      .agg(sum(when(col("dominant") =!= "latin", 1L).otherwise(0L))
        .as("n_nonlatin_dom"))
    val vocab = ltf.groupBy(col("word"))
      .agg(sum(col("freq")).as("freq"))
      .orderBy(col("freq").desc, col("word").asc).limit(vocabK)
      .select(col("word"), lit(1L).as("__in_v"))
    val oov = ltf.join(broadcast(vocab), Seq("word"), "left")
      .groupBy(col(langCol))
      .agg(sum(col("freq")).as("__nt"),
        sum(when(col("__in_v").isNull, col("freq")).otherwise(0L))
          .as("__no"))
      .select(col(langCol),
        fdiv(col("__no").cast(dec) * lit(1000000L),
          col("__nt").cast(dec)).as("oov_micro"))
    val zipf = zipfAlphaByGroupFreqs(ltf, langCol, "word", "freq", zipfK)
      .select(col(langCol), col("hill_alpha_micro").as("zipf_alpha_micro"))
    val gini = graft.etl.Profile.giniByGroup(
      docStats.select(col(langCol), col("n_toks"), col(idCol)),
      langCol, "n_toks", idCol)
      .select(col(langCol), col("gini_micro").as("len_gini_micro"))
    // every leg is ≤ language-cardinality rows — broadcast EXPLICITLY
    // rather than riding size estimates (aggregate estimates flip to
    // sort-merge at real corpus scale, shuffling both sides on lang for
    // frames that are bounded by #languages regardless of corpus size)
    val joined = base.join(broadcast(domMode), Seq(langCol), "left")
      .join(broadcast(nonLatin), Seq(langCol), "left")
      .join(broadcast(oov), Seq(langCol), "left")
      .join(broadcast(zipf), Seq(langCol), "left")
      .join(broadcast(gini), Seq(langCol), "left")
      .select(col(langCol), col("n_docs"), col("total_tokens"),
        col("mean_quality"), col("n_unique"), col("n_long"),
        coalesce(col("dom_script"), lit("none")).as("dom_script"),
        coalesce(col("n_nonlatin_dom"), lit(0L)).as("n_nonlatin_dom"),
        coalesce(col("oov_micro"), lit(0L)).as("oov_micro"),
        coalesce(col("zipf_alpha_micro"), lit(0L)).as("zipf_alpha_micro"),
        coalesce(col("len_gini_micro"), lit(0L)).as("len_gini_micro"))
    if (!docStats.columns.contains("fert_pieces")) joined
    else {
      val fert = docStats.groupBy(col(langCol))
        .agg(sum(col("fert_words")).as("__fw"),
          sum(col("fert_pieces")).as("__fp"))
        .select(col(langCol),
          when(col("__fw") === 0, lit(0L))
            .otherwise(fdiv(col("__fp").cast(dec) * lit(1000000L),
              col("__fw").cast(dec))).as("fertility_micro"))
      joined.join(broadcast(fert), Seq(langCol), "left")
        .select(joined.columns.map(col) :+
          coalesce(col("fertility_micro"), lit(0L))
            .as("fertility_micro"): _*)
    }
  }
}
