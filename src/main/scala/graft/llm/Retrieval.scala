package graft.llm

import graft.functions.PortableMath
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval over the corpus: BM25 scoring and top-k search.
  *
  * Training-data pipelines use lexical retrieval constantly — targeted
  * data selection ("find documents about X for the curriculum"), eval-set
  * mining, and as the sparse half of hybrid (BM25 + dense) search. The
  * reference engine (etl-tools-rs) delegates search-shaped work to external
  * SQL (athena, `job/src/handler.rs`); here it is a first-class distributed
  * operator.
  *
  * Determinism: BM25 is usually float math; this implementation is exact
  * integer arithmetic end-to-end so results hash-identically on any engine.
  * With the classic parameters k1 = 6/5 (1.2) and b = 3/4 (0.75):
  *
  *   - idf (Lucene form, always positive):  ln(1 + (N−df+0.5)/(df+0.5))
  *     = ln((2N+2)/(2df+1)) — an integer ratio, evaluated as
  *     `idf_micro = floor(ln((2N+2)/(2df+1))·10⁶)` via
  *     [[PortableMath.microLnSignedStages]] (ratio > 1, so the signed form).
  *   - tf saturation:  tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl) with
  *     avgdl = T/N (T = corpus tokens, N = docs). Multiplying numerator and
  *     denominator by 20·T clears every fraction:
  *       num = 44·T·tf
  *       den = 20·T·tf + 6·T + 18·dl·N
  *   - per-term score: `(idf_micro · num) div den` — BIGINT, truncating
  *     division (Spark `div` and DuckDB `//` agree on non-negatives).
  *   - doc score: Σ over matched query terms — order-independent BIGINT sum.
  *
  * Overflow bound: `idf_micro ≤ ln(2N+2)·10⁶` and `num = 44·T·tf`, so the
  * product needs `44·T·tf·ln(2N+2)·10⁶ < 2^63` — fine to ~10⁹ corpus tokens
  * per scoring shard; beyond that, pre-divide num/den by their gcd or score
  * per-partition. Documented rather than guarded: the driver corpus is far
  * inside the bound.
  *
  * Scale shape: the query-term table (a few dozen rows) broadcasts and
  * SEMI-prunes the posting lists before any wide work — only documents
  * containing at least one query term are scored. Postings shuffle as slim
  * (term, doc, tf) rows; document length and corpus totals join by slim
  * keys; the final top-k is a per-query window that WindowGroupLimit prunes
  * to k rows per partition before the shuffle (same plan shape as
  * [[Similarity.hardNegatives]]).
  */
object Retrieval extends Serializable {

  /** Tokenized (query_id, term) pairs for a literal query set — distinct
    * terms per query, whitespace tokenization matching [[TextOps.tokens]].
    */
  private def queryTerms(spark: SparkSession,
      queries: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    queries.toDF("query_id", "qtext")
      .select(col("query_id"), explode(TextOps.tokens(col("qtext"))).as("term"))
      .distinct()
  }

  private def guard(idCol: String): Unit = {
    // both the internal working columns AND the output columns: an idCol of
    // 'query_id' or 'score_micro' passes any working-column check but then
    // collides in scoreAgg's groupBy/select (and 'item_id'/'rrf_micro'/
    // 'n_lists' would collide for rankings fed onward to rrfFuse).
    val reserved = (PortableMath.microLnSignedColumns ++
      Seq("term", "tf", "df", "dl", "n", "t", "num", "den", "ts",
        "query_id", "n_terms", "score_micro", "rank",
        "item_id", "n_lists", "rrf_micro")).toSet
    require(!reserved(idCol), s"idCol '$idCol' clashes with a working column")
  }

  /** Sentinel index keys for corpus totals — they contain spaces, which no
    * whitespace-split token can, so they can never collide with a term.
    */
  val DocCountKey = " N "
  val TokenCountKey = " T "

  /** The additive BM25 corpus index over `df`: one (term, df) row per term
    * plus the [[DocCountKey]]/[[TokenCountKey]] sentinel rows carrying the
    * document and token totals. Indexes over DISJOINT doc sets merge by
    * summing `df` per term (document frequencies, doc counts and token
    * counts are all additive across disjoint corpora) — the state an
    * ingestion loop persists between batches.
    */
  def bm25Index(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    guard(idCol)
    val tf = df.select(col(idCol),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    dfq.unionByName(dl.agg(count(lit(1)).as("df"))
        .select(lit(DocCountKey).as("term"), col("df")))
      .unionByName(dl.agg(sum(col("dl")).as("df"))
        .select(lit(TokenCountKey).as("term"), col("df")))
  }

  /** BM25 per-(query, doc) aggregates for the `fresh` documents, with
    * corpus statistics (df/N/T) taken from `index` ([[bm25Index]] rows —
    * possibly accumulated over many batches) rather than from `fresh`
    * itself. Output: (query_id, idCol, n_terms, score_micro) — unranked,
    * which is the streaming-scoring form (rank against whatever top-k
    * state the caller keeps).
    */
  def bm25ScoreAgainstIndex(fresh: DataFrame, idCol: String, textCol: String,
      queries: Seq[(String, String)], index: DataFrame): DataFrame = {
    guard(idCol)
    val spark = fresh.sparkSession
    val tf = fresh.select(col(idCol),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val dfq = index.filter(col("term") =!= DocCountKey &&
      col("term") =!= TokenCountKey)
    // fail fast on a malformed index (missing sentinel rows would otherwise
    // propagate NULL totals into every score); the check rides inside the
    // totals row itself, so it costs nothing extra at execution
    val missing = s"malformed BM25 index: missing '$DocCountKey'/'$TokenCountKey'" +
      " sentinel totals (was it built by bm25Index?)"
    val tot = index.groupBy()
      .agg(sum(when(col("term") === DocCountKey, col("df"))).as("n"),
        sum(when(col("term") === TokenCountKey, col("df"))).as("t"))
      .select(
        when(col("n").isNull, raise_error(lit(missing))).otherwise(col("n")).as("n"),
        when(col("t").isNull, raise_error(lit(missing))).otherwise(col("t")).as("t"))
    scoreAgg(spark, tf, dl, dfq, tot, idCol, queries)
  }

  /** BM25 top-k: for each (query_id, query_text), the `k` highest-scoring
    * documents. Output: (query_id, doc_id, n_terms, score_micro, rank) —
    * n_terms = matched query terms, score_micro = Σ floor'd fixed-point
    * per-term BM25 contributions, rank 1..k by (score desc, doc asc).
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queries: Seq[(String, String)], k: Int): DataFrame = {
    require(queries.nonEmpty && k > 0, "need at least one query and k > 0")
    guard(idCol)
    val spark = df.sparkSession

    // postings: one corpus scan → (doc, term, tf); dl re-aggregates from tf
    // (Catalyst reuses nothing across the two groupings, but both shuffle
    // slim keyed rows, never text)
    val tf = df.select(col(idCol),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val tot = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("t"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))

    val agg = scoreAgg(spark, tf, dl, dfq, tot, idCol, queries)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col(idCol).asc)
    agg.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("n_terms"),
        col("score_micro"), col("rank"))
  }

  /** The shared scoring core: postings ⋈ (broadcast) staged-idf model ⋈
    * doc lengths → per-(query, doc) BIGINT aggregates.
    */
  private def scoreAgg(spark: SparkSession, tf: DataFrame, dl: DataFrame,
      dfq: DataFrame, tot: DataFrame, idCol: String,
      queries: Seq[(String, String)]): DataFrame = {
    // model-sized idf: |query terms| rows through the staged portable log
    val qt = broadcast(queryTerms(spark, queries))
    val idfStages = PortableMath.microLnSignedStages(
      "2 * n + 2", "2 * df + 1", PortableMath.sparkShiftLeft)
    val idf = idfStages.foldLeft(
        qt.join(dfq, Seq("term")).crossJoin(broadcast(tot))) {
        case (d, (name, sql)) => d.withColumn(name, expr(sql))
      }
      .select(col("query_id"), col("term"), col("df"), col("n"), col("t"),
        col("lp"))

    // instance scoring: postings ⋈ (broadcast) idf model ⋈ dl
    tf.join(broadcast(idf), Seq("term"))
      .join(dl, Seq(idCol))
      .withColumn("num", expr("44 * t * tf"))
      .withColumn("den", expr("20 * t * tf + 6 * t + 18 * dl * n"))
      .withColumn("ts", expr("(lp * num) div den"))
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum(col("ts")).as("score_micro"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to
    * combine heterogeneous rankings (lexical BM25 + dense ANN = hybrid
    * search) without comparable scores: each list contributes
    * `1/(rrfK + rank)` per item, here as the exact integer
    * `1000000 div (rrfK + rank)` so fused scores are order-independent
    * BIGINTs and engine-exact.
    *
    * Every input ranking must have columns (query_id, item_id, rank). The
    * fusion itself is one slim union + groupBy on (query, item) — rank
    * lists are k-bounded per query, so the shuffle is |queries|·k·|lists|
    * rows regardless of corpus size.
    *
    * Output: (query_id, item_id, n_lists, rrf_micro, rank 1..k by
    * (rrf desc, item asc)).
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Long = 60L): DataFrame = {
    require(rankings.nonEmpty && k > 0 && rrfK >= 0,
      "need rankings, k > 0, rrfK >= 0")
    val cols = Seq("query_id", "item_id", "rank")
    val u = rankings.map(_.select(cols.map(col): _*)).reduce(_ unionByName _)
    val fused = u
      .withColumn("contrib", expr(s"1000000 div ($rrfK + rank)"))
      .groupBy(col("query_id"), col("item_id"))
      .agg(count(lit(1)).as("n_lists"), sum(col("contrib")).as("rrf_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_micro").desc, col("item_id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019 — the standard
    * parallel-corpus mining step behind CCMatrix/WikiMatrix-scale
    * multilingual pretraining sets): mine aligned cross-lingual pairs by
    * the RATIO margin — a candidate (x, y) scores its cosine relative to
    * the mean of each side's k-nearest-neighbor cosines, which suppresses
    * "hub" vectors that are close to everything:
    *
    *   margin(x, y) = cos(x, y) / ((Σ_kNN(x)/cS + Σ_kNN(y)/cT) / 2)
    *
    * kept when x and y are MUTUAL bests by margin (the paper's
    * intersection strategy) and margin ≥ threshold.
    *
    * Determinism contract (driver oracle): similarities are the exact
    * int8-quantized micro cosine ([[Similarity.intCosineMicro]] — BIGINT,
    * −2·10⁶ zero-norm sentinel); k-NN sums take the k highest sims with
    * ties to the lower id; the margin is one exact integer division
    *   margin_micro = (2 · sim · cS · cT · 10⁶) div (ΣS·cT + ΣT·cS)
    * evaluated only where sim > 0 and the denominator is positive (a
    * non-positive cosine or neighborhood mean can never be a mined pair,
    * and restricting to positives makes truncating `div` ≡ flooring `//`
    * across engines). Overflow bound: 2·10⁶·k²·10⁶ ≪ 2⁶³ for any sane k.
    *
    * Scale shape: the all-pairs stage here is the CANDIDATE GENERATOR for
    * bounded sides (the smaller side broadcasts — one map-only scan of
    * the larger). At 100 TB use [[bitextMineFromCandidates]]: the same
    * margin arithmetic over ANN candidate lists ([[Similarity.ivfTopK]] /
    * [[Similarity.annTopK]]) — the mining math is already k-bounded per
    * vector, so only the candidate generator changes. The pair frame is
    * slim (3 BIGINTs), localCheckpoint'ed because three stages consume it
    * (two k-NN sums + the margin join).
    *
    * Inputs: two (id, vec) frames (source and target language sides).
    * Output: (src_id, tgt_id, sim_micro, margin_micro), one row per mined
    * pair.
    */
  def bitextMine(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int = 4,
      marginThresholdMicro: Long = 1000000L): DataFrame = {
    requireBitextK(k)
    // materialize both slim q8 sides BEFORE the all-pairs join (r17): a
    // quantize projection left fused into the broadcast-nested-loop stage
    // re-evaluates per PAIR (measured 2× the stage in an interleaved A/B:
    // kernel-fused 1.9–3.0 s, kernel+checkpoint 0.74–0.87 s at sf0.1) —
    // the checkpoint pins one quantization per row and the n² stage then
    // reads primitive int arrays
    val s = q8Side(src, idCol, vecCol, "src_id").localCheckpoint()
    val t = q8Side(tgt, idCol, vecCol, "tgt_id").localCheckpoint()
    val pairs = s.crossJoin(broadcast(t))
      .select(col("src_id"), col("tgt_id"),
        Similarity.intCosineMicro(col("__qsrc_id"), col("__qtgt_id"))
          .as("sim"))
      .localCheckpoint()
    mineFromPairs(pairs, k, marginThresholdMicro, boundedSides = true)
  }

  /** The margin numerator `2·sim·cS·cT·10⁶` is exact BIGINT arithmetic
    * evaluated only where sim > 0 (the filter precedes the expression),
    * so its magnitude is ≤ 2·10⁶·k²·10⁶ = 2·10¹²·k²; that stays under
    * 2⁶³ ≈ 9.22·10¹⁸ iff k ≤ 2147. Enforce 2000 — comfortably inside the
    * exact bound, and far beyond any useful neighborhood (the paper uses
    * k = 4). Without this guard an oversized k silently wraps the margin
    * into garbage, violating the repo's loud-failure stance. */
  private def requireBitextK(k: Int): Unit =
    require(k >= 1 && k <= 2000,
      s"bitextMine: k must be in [1, 2000] (margin-overflow bound), got $k")

  /** The margin family's two SQL fragments, extracted as the single
    * source of truth so PropertySpec can sweep the EXACT production
    * expression (not a re-typed copy) against a BigInt driver model over
    * adversarial sims / sentinel values / max-k counts. `sim` is the
    * micro cosine of a (src, tgt) pair; `__sum*` / `__cnt*` are that
    * side's top-k neighborhood sum and size. */
  private[graft] val MarginKeepExpr: String =
    "sim > 0 AND __sumsrc_id * __cnttgt_id + __sumtgt_id * __cntsrc_id > 0"
  private[graft] val MarginMicroExpr: String =
    "(2 * sim * __cntsrc_id * __cnttgt_id * 1000000) div " +
      "(__sumsrc_id * __cnttgt_id + __sumtgt_id * __cntsrc_id)"

  private def q8Side(df: DataFrame, idCol: String, vecCol: String,
      out: String): DataFrame = df.select(
    col(idCol).cast("long").as(out),
    Similarity.quantizeInt8(col(vecCol).cast("array<double>"))
      .as(s"__q$out"))

  /** Shared margin-mining core over a scored pair frame `(src_id,
    * tgt_id, sim)`: per-side top-k neighborhood sums, the exact integer
    * ratio margin, mutual-best intersection, threshold. Both candidate
    * generators ([[bitextMine]]'s bounded-sides cartesian and
    * [[bitextMineFromCandidates]]'s ANN lists) funnel here so the
    * determinism contract lives in exactly one place. */
  private def mineFromPairs(pairs: DataFrame, k: Int,
      marginThresholdMicro: Long, boundedSides: Boolean): DataFrame = {
    def knnSums(part: String, other: String) = {
      val w = Window.partitionBy(col(part))
        .orderBy(col("sim").desc, col(other).asc)
      pairs.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k)
        .groupBy(col(part))
        .agg(sum(col("sim")).as(s"__sum$part"),
          count(lit(1)).as(s"__cnt$part"))
    }
    // Per-vector aggregates (one slim row per side vector) and bwd's
    // one-row-per-target argmax broadcast ONLY under the bounded-sides
    // contract (the estimate-robust stance: a size estimate flipping
    // these to sort-merge would shuffle the pair frame for nothing). In
    // the candidate-fed scale path the sides are unbounded, so the same
    // joins must stay shuffled hash joins on the id keys — AQE still
    // upgrades them when a side happens to be small.
    def hint(df: DataFrame) = if (boundedSides) broadcast(df) else df
    val m = pairs
      .join(hint(knnSums("src_id", "tgt_id")), "src_id")
      .join(hint(knnSums("tgt_id", "src_id")), "tgt_id")
      .filter(expr(MarginKeepExpr))
      .select(col("src_id"), col("tgt_id"), col("sim"),
        expr(MarginMicroExpr).as("margin"))
    // argmax via max_by hash aggregates, NOT rank-1 windows: a window
    // must SORT every partition to discard all but one row, while max_by
    // is a partial-aggregating single pass (2 full sorts of the pair
    // frame saved, measured 3.2→2.x s at sf0.1). The ordering struct
    // (margin, −id) is unique within a group, so ties resolve exactly
    // like (margin DESC, id ASC) — the oracle's row_number ordering.
    val fwd = m.groupBy(col("src_id"))
      .agg(max_by(struct(col("tgt_id"), col("sim"), col("margin")),
        struct(col("margin"), -col("tgt_id"))).as("__b"))
      .select(col("src_id"), col("__b.tgt_id").as("tgt_id"),
        col("__b.sim").as("sim"), col("__b.margin").as("margin"))
    val bwd = m.groupBy(col("tgt_id"))
      .agg(max_by(col("src_id"),
        struct(col("margin"), -col("src_id"))).as("src_id"))
      .select(col("src_id"), col("tgt_id"))
    fwd.join(hint(bwd), Seq("src_id", "tgt_id"), "left_semi")
      .filter(col("margin") >= marginThresholdMicro)
      .select(col("src_id"), col("tgt_id"), col("sim").as("sim_micro"),
        col("margin").as("margin_micro"))
  }

  /** Candidate-fed margin mining — the 100 TB path [[bitextMine]]'s
    * scaladoc promises: identical margin / mutual-best / threshold math,
    * but the pair frame comes from per-side ANN top-k candidate lists
    * ([[Similarity.ivfTopK]] / [[Similarity.annTopK]] / any frame with
    * `(query_id, neighbor_id)`) instead of a cartesian product, so the
    * scored pairs are ≤ 2·k'·(|S|+|T|) rows regardless of side sizes and
    * NO stage is quadratic or broadcast-bounded.
    *
    * Semantics (Artetxe & Schwenk 2019 §"margin-based scoring at scale"):
    *   - `srcCands` lists, per SOURCE vector (as `query_id`), its
    *     retrieved target neighbors (`neighbor_id`); `tgtCands` the
    *     reverse direction. Extra columns (sim, rank) are ignored — the
    *     micro cosine is recomputed exactly here so the determinism
    *     contract (int8 quantization, −2·10⁶ sentinel, truncating-div
    *     margin) is bit-identical to the all-pairs path on the same
    *     pairs.
    *   - the scored pair set is the DISTINCT union of both directions;
    *     each side's k-NN sum takes the top-k sims within that retrieved
    *     neighborhood (ties to the lower id). When the candidate lists
    *     are the exact top-k (recall 1), the union's windowed top-k
    *     equals the global top-k — the forward list is a subset of the
    *     union — so the whole output is provably equal to [[bitextMine]]
    *     wherever all-pairs argmaxes land inside the retrieved
    *     neighborhood (CurationSpec proves both equalities on planted
    *     geometry, incl. an `ivfTopK(nProbe = nCells)` structural-recall-1
    *     feed).
    *
    * Scale shape: candidates join back to the two quantized sides as
    * shuffled hash joins on the id keys (both sides unbounded — nothing
    * broadcast); the k-NN windows sort k-bounded partitions; the
    * per-vector aggregate joins and the mutual-best semi-join shuffle on
    * ids. localCheckpoint on the slim pair frame for the same
    * three-consumer reason as the all-pairs path. When generating the
    * candidate lists with [[Similarity.ivfTopK]], pass
    * `boundedQueries = false` — here the "queries" are a whole corpus
    * side, and the search contract's query-side broadcast would OOM
    * (the ScaleProbe `bitext` row and the `bitext_mine` config op both
    * run that mode; [[Similarity.annTopK]] never broadcasts a query
    * side). Pass `excludeSelf = false` on BOTH generators: the sides
    * are separate corpora whose id spaces may collide (each numbered
    * from 0), so `query_id = neighbor_id` is a legitimate cross-side
    * candidate that the self-search default would silently erase —
    * all-pairs [[bitextMine]] scores such pairs, and CurationSpec's
    * colliding-id case pins the equality.
    *
    * Behavior at recall < 1 (MEASURED, r16 — CurationSpec pins this
    * exact curve on 40 planted pairs + 60 distractors/side, ivf lists
    * at nCells = 8, k = 4, threshold 1.02):
    * {{{
    *   nProbe   mined   ∩ all-pairs   recovered planted   spurious
    *      8      69         69               34               0
    *      6      69         69               34               0
    *      4      70         68               34               2
    *      2      70         66               32               4
    *      1      71         65               32               6
    * }}}
    * Two findings worth the table. (1) Planted-pair recovery decays
    * GENTLY and monotonically (94% survives single-probe retrieval) —
    * the mining tail is robust to imperfect lists because a true pair
    * only needs both endpoints retrieved once across the two
    * directions. (2) The mined set is NOT a subset of the all-pairs
    * result below full recall — the intuitive "margins only shrink when
    * neighbors are missing" is FALSE: a missed neighbor shrinks the
    * retrieved k-NN SUM, which sits in the margin's DENOMINATOR, so
    * sparse neighborhoods INFLATE margins and push borderline
    * distractor pairs over the threshold. The extras are
    * distractor-side artifacts (no planted source is ever mis-mined to
    * a wrong target at any probe count), and they grow as probes
    * shrink; production settings choosing nProbe are trading exactly
    * this inflation tail against probe cost, not just recall.
    */
  def bitextMineFromCandidates(src: DataFrame, tgt: DataFrame,
      idCol: String, vecCol: String,
      srcCands: DataFrame, tgtCands: DataFrame, k: Int = 4,
      marginThresholdMicro: Long = 1000000L): DataFrame =
    mineFromCandidateFrames(
      q8Side(src, idCol, vecCol, "src_id"),
      q8Side(tgt, idCol, vecCol, "tgt_id"),
      srcCands, tgtCands, k, marginThresholdMicro)

  /** The candidate-fed mining tail over PRE-QUANTIZED sides — `s` is a
    * `(src_id, __qsrc_id)` frame, `t` a `(tgt_id, __qtgt_id)` frame
    * (the [[q8Side]] shapes). [[bitextMineFromCandidates]] quantizes
    * then delegates here; the continuous bitext loop's read path
    * ([[graft.streaming.Pipelines.bitextRetroMine]]) enters directly
    * with persisted int8 state (quantization is per-row deterministic,
    * so persisted rows are bit-identical to a fresh [[q8Side]] pass —
    * one tail, no drift).
    */
  private[graft] def mineFromCandidateFrames(s: DataFrame, t: DataFrame,
      srcCands: DataFrame, tgtCands: DataFrame, k: Int,
      marginThresholdMicro: Long): DataFrame = {
    requireBitextK(k)
    val cand = srcCands.select(
        col("query_id").cast("long").as("src_id"),
        col("neighbor_id").cast("long").as("tgt_id"))
      .unionByName(tgtCands.select(
        col("neighbor_id").cast("long").as("src_id"),
        col("query_id").cast("long").as("tgt_id")))
      .distinct()
    val pairs = cand.join(s, "src_id").join(t, "tgt_id")
      .select(col("src_id"), col("tgt_id"),
        Similarity.intCosineMicro(col("__qsrc_id"), col("__qtgt_id"))
          .as("sim"))
      .localCheckpoint()
    mineFromPairs(pairs, k, marginThresholdMicro, boundedSides = false)
  }
}
