package graft.llm

import graft.functions.PortableMath
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained quality classification — the fastText/CCNet filtering
  * shape (Joulin et al. 2017; Wenzek et al. 2020): train a cheap text
  * classifier on labeled corpora (curated vs crawl, target language vs
  * rest), score every document, filter or bucket on the margin. The model
  * here is multinomial Naive Bayes with add-one smoothing over whitespace
  * tokens: its training IS a count aggregation, so the distributed fit is
  * exact (no SGD order-dependence anywhere — a deterministic-by-
  * construction stand-in for fastText's epoch-sequential training, same
  * feature family), and scoring is the engine-exact staged micro-log, so
  * margins are bit-identical on any engine (the bigramLmScore stance).
  *
  * Scale shape: training = one corpus scan into a vocab-sized
  * (token, c_pos, c_neg) table with map-side partial aggregation; scoring
  * joins slim per-doc (token, multiplicity) rows against the model (AQE
  * broadcasts a small model, hash-joins a large one) — text never rides a
  * shuffle. The model is ADDITIVE across disjoint corpora (counts sum), so
  * ingestion loops can accumulate it exactly like the BM25/n-gram indexes.
  */
object Classifier extends Serializable {

  /** Sentinel model rows: keys contain spaces, which no whitespace-split
    * token can, so they can never collide with a real token (the bm25Index
    * convention). (c_pos, c_neg) carry the pair named by the key.
    */
  val TokenTotalsKey = " NP "
  val VocabKey = " V "
  val DocTotalsKey = " DC "

  private val Reserved: Set[String] =
    (PortableMath.microLnColumns ++ PortableMath.microLnSignedColumns ++
      Seq("token", "m", "c_pos", "c_neg", "ap", "an", "bp", "bn", "lp_pos",
        "contrib", "n_tokens", "nb_margin_micro", "nb_pos")).toSet

  private def guard(idCol: String): Unit =
    require(!Reserved(idCol),
      s"idCol '$idCol' collides with a Classifier working/output column")

  /** Fit the Naive Bayes model: one (token, c_pos, c_neg) row per distinct
    * token of `corpus` — occurrence counts in the positive (`label` true)
    * and negative class — plus the [[TokenTotalsKey]] (class token
    * totals), [[VocabKey]] (vocabulary size, both columns) and
    * [[DocTotalsKey]] (class document counts) sentinel rows. Null labels
    * count as negative (cast semantics made explicit). Models over
    * DISJOINT corpora merge by summing counts per token, recomputing only
    * the vocab sentinel.
    */
  def naiveBayesTrain(corpus: DataFrame, textCol: String,
      label: Column): DataFrame = {
    val lab = corpus.select(
      coalesce(label.cast("boolean"), lit(false)).as("__pos"),
      col(textCol).as("__text"))
    val tok = lab.select(col("__pos"),
      explode(TextOps.tokens(col("__text"))).as("token"))
    val counts = tok.groupBy("token").agg(
      sum(when(col("__pos"), 1L).otherwise(0L)).as("c_pos"),
      sum(when(!col("__pos"), 1L).otherwise(0L)).as("c_neg"))
    val totals = counts.agg(
        coalesce(sum("c_pos"), lit(0L)).as("c_pos"),
        coalesce(sum("c_neg"), lit(0L)).as("c_neg"))
      .select(lit(TokenTotalsKey).as("token"), col("c_pos"), col("c_neg"))
    val vocab = counts.agg(count(lit(1)).as("v"))
      .select(lit(VocabKey).as("token"), col("v").as("c_pos"),
        col("v").as("c_neg"))
    val docs = lab.agg(
        coalesce(sum(when(col("__pos"), 1L).otherwise(0L)), lit(0L))
          .as("c_pos"),
        coalesce(sum(when(!col("__pos"), 1L).otherwise(0L)), lit(0L))
          .as("c_neg"))
      .select(lit(DocTotalsKey).as("token"), col("c_pos"), col("c_neg"))
    counts.unionByName(totals).unionByName(vocab).unionByName(docs)
  }

  /** Score `corpus` against a [[naiveBayesTrain]] model: per document, the
    * add-one-smoothed log-odds margin in micro-nats,
    *
    *   margin = Σ_t m_t · [ln((c_pos_t+1)/(N_pos+V)) −
    *                       ln((c_neg_t+1)/(N_neg+V))] + ln(d_pos/d_neg)
    *
    * every `ln` the engine-exact staged log (the class prior, a single
    * data-dependent ratio, uses the JVM reference `microLnSignedRef`,
    * which the staged SQL provably equals — PropertySpec). Tokens absent
    * from the model score as unseen (count 0, smoothing floor). Documents
    * with no tokens carry the bare prior. Fails fast on a model missing
    * its sentinel totals (a malformed index must not score NULL — the
    * bm25ScoreAgainstIndex lesson).
    *
    * Output: (idCol, n_tokens, nb_margin_micro, nb_pos).
    */
  def naiveBayesScore(corpus: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    guard(idCol)
    // a well-formed naiveBayesTrain model carries exactly ONE row per
    // sentinel key — more means the frame is not a trained model (or
    // two models were unioned), and growing a driver map from it would
    // mask that
    val sentinels = graft.tools.BoundedCollect(model
        .filter(col("token").isin(TokenTotalsKey, VocabKey, DocTotalsKey)),
        3L, "a naiveBayesTrain model has exactly one row per sentinel " +
          "total (3 keys) — duplicates mean the frame is not one model")
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    require(Set(TokenTotalsKey, VocabKey, DocTotalsKey)
        .subsetOf(sentinels.keySet),
      "malformed NB model: sentinel totals missing — not a naiveBayesTrain output?")
    val (np, nn) = sentinels(TokenTotalsKey)
    val (v, _) = sentinels(VocabKey)
    val (dp, dn) = sentinels(DocTotalsKey)
    require(v > 0, "NB model has an empty vocabulary")
    require(dp > 0 && dn > 0,
      s"NB model needs both classes non-empty (docs: pos=$dp neg=$dn)")
    val priorMicro = PortableMath.microLnSignedRef(dp, dn)

    val dt = corpus
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("m"))
    val joined = dt
      .join(model.filter(!col("token")
        .isin(TokenTotalsKey, VocabKey, DocTotalsKey)), Seq("token"), "left")
      .select(col(idCol), col("m"),
        (coalesce(col("c_pos"), lit(0L)) + 1L).as("ap"),
        (coalesce(col("c_neg"), lit(0L)) + 1L).as("an"),
        lit(np + v).as("bp"), lit(nn + v).as("bn"))
    val chainP = PortableMath.microLnStages("ap", "bp",
      PortableMath.sparkShiftLeft)
    val chainN = PortableMath.microLnStages("an", "bn",
      PortableMath.sparkShiftLeft)
    val afterP = chainP.foldLeft(joined) {
        case (d, (n, s)) => d.withColumn(n, expr(s))
      }
      .select(col(idCol), col("m"), col("an"), col("bn"),
        col("lp").as("lp_pos"))
    val scored = chainN.foldLeft(afterP) {
        case (d, (n, s)) => d.withColumn(n, expr(s))
      }
      .select(col(idCol), col("m"),
        (col("m") * (col("lp_pos") - col("lp"))).as("contrib"))
    val sums = scored.groupBy(col(idCol))
      .agg(sum(col("m")).as("n_tokens"), sum(col("contrib")).as("s"))
    corpus.select(col(idCol))
      .join(sums, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (coalesce(col("s"), lit(0L)) + priorMicro).as("nb_margin_micro"))
      .withColumn("nb_pos", col("nb_margin_micro") > 0L)
  }

  /** Train-and-score in one call (self-scored corpus — the usual "label by
    * a cheap proxy, learn token evidence, rank everything" loop).
    */
  def naiveBayesSelfScore(corpus: DataFrame, idCol: String, textCol: String,
      label: Column): DataFrame =
    naiveBayesScore(corpus, idCol, textCol,
      naiveBayesTrain(corpus, textCol, label).localCheckpoint())

  // ---------------------------------------------------------------------
  // Keyed (2-column) model encoding — the additive (key, cnt) form the
  // streaming indexed-ingest engine persists: key = "+ <token>" /
  // "- <token>" (class prefix; tokens cannot contain a space, so prefixes
  // never collide), cnt = the class count. The data-dependent VocabKey
  // sentinel is DROPPED in keyed form (summing per-batch vocab sizes would
  // double-count shared tokens) and recomputed on decode.
  // ---------------------------------------------------------------------

  /** Encode a [[naiveBayesTrain]] model as additive (key, cnt) rows. */
  def toKeyedModel(model: DataFrame): DataFrame = {
    val m = model.filter(col("token") =!= VocabKey)
    m.select(concat(lit("+ "), col("token")).as("key"),
        col("c_pos").as("cnt"))
      .unionByName(m.select(concat(lit("- "), col("token")).as("key"),
        col("c_neg").as("cnt")))
  }

  /** Merge two keyed models: counts sum per key (exact, order-free). */
  def mergeKeyedModels(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("key").agg(sum(col("cnt")).as("cnt"))

  /** Decode a keyed model back to [[naiveBayesScore]]'s 3-column form,
    * recomputing the vocab sentinel from the decoded token set.
    */
  def fromKeyedModel(keyed: DataFrame): DataFrame = {
    val m = keyed
      .select(substring(col("key"), 1, 2).as("cls"),
        expr("substring(key, 3)").as("token"), col("cnt"))
      .groupBy("token").agg(
        sum(when(col("cls") === "+ ", col("cnt")).otherwise(0L)).as("c_pos"),
        sum(when(col("cls") === "- ", col("cnt")).otherwise(0L)).as("c_neg"))
    val vocab = m
      .filter(!col("token").isin(TokenTotalsKey, DocTotalsKey))
      .agg(count(lit(1)).as("v"))
      .select(lit(VocabKey).as("token"), col("v").as("c_pos"),
        col("v").as("c_neg"))
    m.unionByName(vocab)
  }

  /** Cohen's κ agreement between two label columns (Cohen 1960) — the
    * label-QA audit for classifier-labeled corpora: chance-corrected
    * agreement between two annotators (a declared label vs a model's
    * prediction, or two model generations). Exact integer micro units:
    *
    *   κ·10⁶ = floor(10⁶ · (n·agree − S) / (n² − S)),
    *   S = Σ_label  countA(label)·countB(label)
    *
    * (the classic (p_o − p_e)/(1 − p_e) multiplied through by n².) The
    * products run in DECIMAL(38,0), exact past 10³⁰ — no overflow at any
    * corpus size — and the floor division is the explicit pmod form, so
    * negative κ (worse-than-chance) floors identically on every engine.
    * The degenerate n² = S case (both columns constant and equal — p_e=1)
    * reports 10⁶. NULL labels agree with nothing and group as their own
    * marginal, never joining across annotators (SQL join semantics, both
    * engines).
    *
    * Output: ONE row (n, agree, s_joint, kappa_micro). Scale: two
    * label-cardinality aggregations + a label-sized join — corpus touches
    * one scan.
    */
  def cohenKappaMicro(df: DataFrame, colA: String, colB: String): DataFrame = {
    val slim = df.select(col(colA).cast("string").as("__ck_a"),
      col(colB).cast("string").as("__ck_b")).localCheckpoint()
    val tot = slim.agg(count(lit(1)).as("n"),
      coalesce(sum(when(col("__ck_a") === col("__ck_b"), 1L).otherwise(0L)),
        lit(0L)).as("agree"))
    val ca = slim.groupBy(col("__ck_a").as("lbl"))
      .agg(count(lit(1)).as("na"))
    val cb = slim.groupBy(col("__ck_b").as("lbl"))
      .agg(count(lit(1)).as("nb"))
    val s = ca.join(cb, "lbl")
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("s_joint"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    tot.crossJoin(s)
      .withColumn("__nm", lit(1000000L).cast(dec) *
        (col("n").cast(dec) * col("agree") - col("s_joint")))
      .withColumn("__dn", col("n").cast(dec) * col("n") - col("s_joint"))
      .select(col("n"), col("agree"), col("s_joint"),
        when(col("__dn") === 0, lit(1000000L))
          .otherwise(((col("__nm") - pmod(col("__nm"), col("__dn"))) /
            col("__dn")).cast("long"))
          .as("kappa_micro"))
  }

  /** Fleiss' κ (Fleiss 1971) — [[cohenKappaMicro]]'s multi-rater
    * generalization: chance-corrected agreement when every item carries
    * the SAME number `n` of categorical ratings (n raters, or n repeated
    * annotations). One row per rating in; one audit row out:
    * `(n_items, n_raters, sa, s2, kappa_micro)` where
    * `sa = Σᵢⱼ n_ij(n_ij−1)` (within-item agreement mass) and
    * `s2 = Σⱼ c_j²` (label-marginal mass). κ is computed as one exact
    * integer rational — with `M = N·n` and `B = N·n(n−1)`,
    * `κ = (sa·M² − s2·B) / (B·(M² − s2))` — in DECIMAL(38,0) with the
    * same explicit-pmod floor as Cohen, so negative κ floors identically
    * on both engines; the degenerate all-one-label case (P_e = 1) pins
    * κ = 1e6 by the Cohen convention. Practical overflow bound: exact
    * through ~3e11 total ratings at n ≤ 1000 (sa·M² stays inside 38
    * digits).
    *
    * Ragged inputs fail loudly (the equal-n precondition IS the Fleiss
    * model; silently dropping items would bias κ) — the check is a
    * 2-row bounded collect of distinct per-item counts.
    *
    * Scale: two label/item-keyed aggregations over slim string pairs and
    * two 1-row totals; nothing corpus-sized ever sits on the driver.
    */
  def fleissKappaMicro(df: DataFrame, itemCol: String, labelCol: String)
      : DataFrame =
    fleissKappaFromCells(
      df.select(col(itemCol).cast("string").as("__fk_i"),
          col(labelCol).cast("string").as("__fk_l"))
        .groupBy(col("__fk_i"), col("__fk_l")).agg(count(lit(1)).as("nij")),
      "__fk_i", "__fk_l", "nij")

  /** Fleiss' κ from a PRE-AGGREGATED (item, label, n) cell table — the
    * mergeable-state form: grouped rating counts are ADDITIVE, so cell
    * tables over rating batches sum to the union's cells and a streaming
    * loop ([[graft.streaming.Pipelines.agreementIngest]]) keeps only
    * |items × labels| rows and refits on demand. Output is identical to
    * [[fleissKappaMicro]] over the expanded rows (duplicate cells are
    * re-summed here, so an un-merged multi-batch table is also fine).
    */
  def fleissKappaFromCells(cells0: DataFrame, itemCol: String,
      labelCol: String, nCol: String): DataFrame = {
    val cell = cells0
      .select(col(itemCol).cast("string").as("__fk_i"),
        col(labelCol).cast("string").as("__fk_l"),
        col(nCol).cast("long").as("nij"))
      .groupBy(col("__fk_i"), col("__fk_l")).agg(sum(col("nij")).as("nij"))
      .localCheckpoint()
    val perItem = cell.groupBy(col("__fk_i")).agg(sum(col("nij")).as("ni"))
      .localCheckpoint()
    val distinctNs = perItem.select(col("ni")).distinct().limit(2).collect()
    require(distinctNs.nonEmpty, "fleissKappaMicro: empty input")
    require(distinctNs.length == 1,
      "fleissKappaMicro: every item must carry the same number of " +
        "ratings (the Fleiss model); found items with differing counts — " +
        "rank-and-filter to a fixed n upstream")
    val n = distinctNs.head.getLong(0)
    require(n >= 2, s"fleissKappaMicro needs >= 2 ratings per item, got $n")
    val nItems = perItem.count()
    val sa = cell.agg(
      coalesce(sum(col("nij") * (col("nij") - 1L)), lit(0L)).as("sa"))
    val s2 = cell.groupBy(col("__fk_l")).agg(sum(col("nij")).as("cj"))
      .agg(coalesce(sum(col("cj") * col("cj")), lit(0L)).as("s2"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val m = lit(nItems).cast(dec) * lit(n)
    val b = lit(nItems).cast(dec) * lit(n) * lit(n - 1L)
    sa.crossJoin(s2)
      .withColumn("__nm", lit(1000000L).cast(dec) *
        (col("sa").cast(dec) * m * m - col("s2").cast(dec) * b))
      .withColumn("__dn", b * (m * m - col("s2").cast(dec)))
      .select(lit(nItems).as("n_items"), lit(n).as("n_raters"),
        col("sa"), col("s2"),
        when(col("__dn") === 0, lit(1000000L))
          .otherwise(((col("__nm") - pmod(col("__nm"), col("__dn"))) /
            col("__dn")).cast("long"))
          .as("kappa_micro"))
  }

  /** Hashed token-count features (the hashing trick, Weinberger et al.
    * 2009): token → first 40 md5 bits (the [[Sketches]] nibble idiom,
    * replayable engine-exactly) folded into [0, dim). One slim
    * (id, f, cnt) row per distinct (doc, bucket) — the feature table
    * every linear model here consumes. Collisions are the hashing
    * trick's documented trade-off, not an error: both engines collide
    * identically.
    */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    require(dim >= 1 && dim <= (1 << 20),
      s"hashedFeatures: dim must sit in [1, 2^20], got $dim")
    df.select(col(idCol).cast("long").as("id"),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .select(col("id"),
        pmod(conv(substring(md5(col("token")), 1, 10), 16, 10)
          .cast("long"), lit(dim.toLong)).as("f"))
      .groupBy("id", "f").agg(count(lit(1)).as("cnt"))
  }

  /** Batch perceptron over hashed features — a TRAINED linear quality /
    * domain classifier whose distributed fit is exact (Rosenblatt 1958;
    * the full-batch variant is subgradient descent on the summed
    * perceptron loss). Per round, with integer weights w and labels
    * y ∈ {−1, +1}:
    *
    *   margin_i = Σ_f w_f · cnt_if ;  mistakes = { i : y_i·margin_i ≤ 0 }
    *   w ← w + Σ_{mistakes} y_i · cnt_i        (unit learning rate)
    *
    * Every update is a commutative integer SUM over misclassified docs,
    * so — unlike epoch-sequential SGD — the fit is order-independent and
    * bit-identical on any engine and any partitioning; round 1 from
    * w = 0 marks every doc mistaken (y·0 ≤ 0), making the whole
    * trajectory a closed-form CTE chain for the oracle.
    *
    * Scale shape: each round is one hash join of the slim feature table
    * against the ≤dim-row weight table, one doc-keyed aggregation, one
    * feature-keyed aggregation — O(iterations) shuffles of feature-sized
    * rows, per-round localCheckpoint (the btStrengths loop shape).
    * Overflow is guarded loudly: iterations · total-token-count ·
    * max-doc-length must fit BIGINT margins.
    *
    * Returns the (f, w) model; weights are ADDITIVE only within a fit
    * (not across corpora — the mistake set depends on w), so continuous
    * ingestion refits from merged feature state like the NB loop.
    */
  def perceptronTrain(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, dim: Int = 256, iterations: Int = 3,
      maxMarginBound: Long = 8000000000000000000L): DataFrame =
    perceptronTrainOnFeatures(
      hashedFeatures(df, idCol, textCol, dim),
      df.select(col(idCol).cast("long").as("id"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(-1L).as("y")),
      iterations, maxMarginBound)

  /** The fit over pre-built feature/label state — `feats` = (id, f, cnt),
    * `lab` = (id, y ∈ {−1, +1}). This is the entry point for continuous
    * ingestion: labeled feature counts are ADDITIVE across disjoint
    * batches (unlike the fitted weights), so a streaming loop persists
    * them and refits from the merged state.
    */
  def perceptronTrainOnFeatures(featsIn: DataFrame, labIn: DataFrame,
      iterations: Int = 3,
      maxMarginBound: Long = 8000000000000000000L): DataFrame = {
    require(iterations >= 1, "perceptronTrain: iterations must be >= 1")
    val feats = featsIn.select(col("id"), col("f"), col("cnt"))
      .localCheckpoint()
    val lab = labIn.select(col("id"), col("y")).localCheckpoint()
    // ONE aggregation job answers both overflow-guard questions (r17 —
    // total tokens is the sum of the per-doc sums, so the separate
    // whole-table sum was a second pass for the same number)
    val guardRow = feats.groupBy(col("id")).agg(sum(col("cnt")).as("s"))
      .agg(coalesce(sum(col("s")), lit(0L)), coalesce(max(col("s")), lit(0L)))
      .head()
    val totTok = guardRow.getLong(0)
    val maxDoc = guardRow.getLong(1)
    require(totTok > 0, "perceptronTrain: empty corpus")
    require(BigInt(iterations) * totTok * maxDoc <= BigInt(maxMarginBound),
      s"perceptronTrain: iterations·totalTokens·maxDocLen = " +
        s"${BigInt(iterations) * totTok * maxDoc} would overflow BIGINT " +
        s"margins (bound $maxMarginBound) — lower iterations, cap doc " +
        "length, or shard the corpus")
    // Round 1 in closed form (r17): from w = 0 every margin is 0, so
    // y·0 ≤ 0 marks EVERY labeled doc mistaken (the scaladoc's oracle
    // observation, now also the execution) — the round's margin join and
    // mistake filter are dead work, and w₁ is directly
    // Σ_{docs in lab} y·cnt per feature over the full feature domain
    // (features whose docs all sit outside `lab` keep w = 0, exactly as
    // the join-with-mistakes form left them).
    val delta1 = feats.join(lab.select(col("id"), col("y")), "id")
      .groupBy(col("f")).agg(sum(col("y") * col("cnt")).as("d"))
    var w = feats.select(col("f")).distinct()
      .join(delta1, Seq("f"), "left")
      .select(col("f"), coalesce(col("d"), lit(0L)).as("w"))
      .localCheckpoint()
    var i = 1
    while (i < iterations) {
      val margins = feats.join(w, "f").groupBy(col("id"))
        .agg(sum(col("cnt") * col("w")).as("margin"))
      val mistakes = lab.join(margins, Seq("id"), "left")
        .filter(coalesce(col("margin"), lit(0L)) * col("y") <= 0)
        .select(col("id"), col("y"))
      val delta = feats.join(mistakes, "id").groupBy(col("f"))
        .agg(sum(col("y") * col("cnt")).as("d"))
      w = w.join(delta, Seq("f"), "left")
        .select(col("f"), (col("w") + coalesce(col("d"), lit(0L))).as("w"))
        .localCheckpoint()
      i += 1
    }
    w
  }

  /** Labeled feature evidence as ADDITIVE (key, cnt) rows for the shared
    * base/delta ingest engine: key = "y id f" (space-separated — ids and
    * buckets are numeric, so the key is unambiguous). Disjoint batches
    * produce disjoint id sets, so merging is a plain count-sum union and
    * the merged state equals [[hashedFeatures]] of the union corpus.
    */
  def toPerceptronState(df: DataFrame, idCol: String, textCol: String,
      labelExpr: Column, dim: Int): DataFrame =
    hashedFeatures(df, idCol, textCol, dim)
      .join(df.select(col(idCol).cast("long").as("id"),
        when(labelExpr.cast("boolean"), 1L).otherwise(-1L).as("y")), "id")
      .select(concat_ws(" ", col("y"), col("id"), col("f")).as("key"),
        col("cnt"))

  /** Decode [[toPerceptronState]] rows back to the (feats, lab) pair
    * [[perceptronTrainOnFeatures]] consumes. */
  def fromPerceptronState(state: DataFrame): (DataFrame, DataFrame) = {
    val parts = state.select(
      split(col("key"), " ").getItem(0).cast("long").as("y"),
      split(col("key"), " ").getItem(1).cast("long").as("id"),
      split(col("key"), " ").getItem(2).cast("long").as("f"),
      col("cnt"))
    (parts.select(col("id"), col("f"), col("cnt")),
      parts.select(col("id"), col("y")).distinct())
  }

  /** Margins of a [[perceptronTrain]] model over a corpus: one row per
    * doc `(id, margin, pred)` — the same slim feature join as training
    * (docs outside the model's vocabulary score 0, pred = false).
    */
  def perceptronScore(df: DataFrame, model: DataFrame, idCol: String,
      textCol: String, dim: Int = 256): DataFrame =
    perceptronScoreOnFeatures(hashedFeatures(df, idCol, textCol, dim),
      df.select(col(idCol).cast("long").as("id")), model)

  /** [[perceptronScore]] from a prebuilt (id, f, cnt) feature table —
    * the one-tokenize path: a caller that trains AND scores the same
    * corpus builds `hashedFeatures` once (checkpointed) and feeds both
    * legs, instead of paying the tokenize+hash+aggregate pass twice.
    * `ids` carries one row per doc (featureless docs score margin 0,
    * pred = false — the same left-join stance as the df form).
    */
  def perceptronScoreOnFeatures(feats: DataFrame, ids: DataFrame,
      model: DataFrame): DataFrame = {
    val margins = feats
      .join(model.select(col("f"), col("w")), "f")
      .groupBy(col("id")).agg(sum(col("cnt") * col("w")).as("margin"))
    ids.select(col("id"))
      .join(margins, Seq("id"), "left")
      .select(col("id"), coalesce(col("margin"), lit(0L)).as("margin"))
      .withColumn("pred", col("margin") > 0)
  }

  /** Krippendorff's α, nominal data (Krippendorff 2004) — the agreement
    * coefficient for RAGGED annotation tables, where [[fleissKappaMicro]]'s
    * fixed-n precondition fails: raters may skip items, so items carry
    * different rating counts. NULL labels are missing data (dropped before
    * counting) and items left with fewer than 2 ratings are unpairable
    * (excluded, the standard treatment) — exactly the cases Fleiss must
    * reject loudly.
    *
    * With m_u ratings on pairable item u, n_uc of them in category c,
    * n = Σ m_u and n_c the category marginals:
    *
    *   D_o = (1/n) Σ_u [ Σ_c n_uc (m_u − n_uc) ] / (m_u − 1)
    *   D_e = Σ_c n_c (n − n_c) / (n (n − 1)),   α = 1 − D_o / D_e
    *
    * The per-item denominators (m_u − 1) are the exactness hazard; they
    * are cleared by P = Π (m − 1) over the DISTINCT m values (each
    * (m − 1) divides P, so every per-m term scales to an integer):
    *
    *   α·10⁶ = 10⁶ − floor(10⁶ · doNumP · (n − 1) / (P · deNum)),
    *   doNumP = Σ_m  [Σ_{cells at m} n_uc (m − n_uc)] · P/(m − 1)
    *
    * — one exact DECIMAL(38,0) rational with the explicit-pmod floor, so
    * worse-than-chance α floors identically on both engines. Degenerate
    * deNum = 0 (every rating one category — D_e = 0) pins 10⁶, the Cohen
    * convention. Exactness guard: ≤ 64 distinct rating counts and
    * P ≤ 10¹², enforced loudly (a labeling panel has a handful of rater
    * counts; a table that trips this is not an annotation table).
    *
    * Output: ONE row (n_items, n_ratings, m_kinds, alpha_micro). Scale:
    * item- and label-keyed aggregations over slim string pairs; the only
    * driver collect is the ≤ 65-row distinct-m probe.
    */
  def krippendorffAlphaMicro(df: DataFrame, itemCol: String,
      labelCol: String): DataFrame =
    krippendorffAlphaFromCells(
      df.filter(col(labelCol).isNotNull)
        .select(col(itemCol).cast("string").as("__ka_i"),
          col(labelCol).cast("string").as("__ka_l"))
        .groupBy(col("__ka_i"), col("__ka_l")).agg(count(lit(1)).as("nuc")),
      "__ka_i", "__ka_l", "nuc")

  /** Krippendorff's α from a PRE-AGGREGATED (item, label, n) cell table —
    * the mergeable-state form ([[fleissKappaFromCells]]'s contract): cell
    * counts over rating batches SUM to the union's cells, so a streaming
    * annotation loop refits from |items × labels| rows without re-reading
    * a single rating. NULL labels are dropped here exactly as the row
    * form drops them; duplicate cells re-sum, so an un-merged multi-batch
    * table is also fine. Output identical to [[krippendorffAlphaMicro]]
    * over the expanded rows.
    */
  def krippendorffAlphaFromCells(cells0: DataFrame, itemCol: String,
      labelCol: String, nCol: String): DataFrame = {
    val cellT = cells0
      .filter(col(labelCol).isNotNull)
      .select(col(itemCol).cast("string").as("__ka_i"),
        col(labelCol).cast("string").as("__ka_l"),
        col(nCol).cast("long").as("nuc"))
      .groupBy(col("__ka_i"), col("__ka_l")).agg(sum(col("nuc")).as("nuc"))
      .localCheckpoint()
    val perItem = cellT.groupBy(col("__ka_i")).agg(sum(col("nuc")).as("mi"))
      .filter(col("mi") >= 2).localCheckpoint()
    val ms = perItem.select(col("mi")).distinct().limit(65).collect()
      .map(_.getLong(0))
    require(ms.nonEmpty,
      "krippendorffAlphaMicro: no pairable items (every item has < 2 " +
        "non-null ratings)")
    require(ms.length <= 64,
      "krippendorffAlphaMicro: > 64 distinct per-item rating counts — " +
        "not an annotation table; bucket rating counts upstream")
    val p = ms.map(m => BigInt(m - 1)).product
    require(p <= BigInt(10).pow(12),
      s"krippendorffAlphaMicro: Π(m−1) over distinct rating counts = $p " +
        "exceeds 1e12 — the exact-rational clearing denominator would " +
        "overflow; bucket rating counts upstream")
    val pLong = p.toLong
    val nItems = perItem.count()
    val cells = cellT
      .join(perItem.withColumnRenamed("__ka_i", "__ka_j"),
        col("__ka_i") === col("__ka_j"))
      .select(col("__ka_i"), col("mi"), col("__ka_l"), col("nuc"))
      .localCheckpoint()
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // P/(m−1) per distinct m, computed exactly on the driver (each m−1
    // divides P by construction) and planted as a CASE literal — no
    // decimal division anywhere.
    val factor = ms.tail.foldLeft(
      when(col("mi") === ms.head, lit((p / BigInt(ms.head - 1)).toLong))) {
      (acc, m) => acc.when(col("mi") === m, lit((p / BigInt(m - 1)).toLong))
    }
    val doNumP = cells
      .groupBy(col("mi"))
      .agg(coalesce(sum(col("nuc") * (col("mi") - col("nuc"))), lit(0L))
        .cast(dec).as("dsum"))
      .agg(coalesce(sum(col("dsum") * factor.cast(dec)),
        lit(0L).cast(dec)).as("do_num_p"))
    val nTot = cells.agg(coalesce(sum(col("nuc")), lit(0L)).as("n"))
      .head().getLong(0)
    val deNum = cells.groupBy(col("__ka_l"))
      .agg(sum(col("nuc")).as("ncj"))
      .agg(coalesce(sum(col("ncj").cast(dec) *
          (lit(nTot).cast(dec) - col("ncj").cast(dec))),
        lit(0L).cast(dec)).as("de_num"))
    doNumP.crossJoin(deNum)
      .withColumn("__nm", lit(1000000L).cast(dec) * col("do_num_p") *
        lit(nTot - 1L).cast(dec))
      .withColumn("__dn", lit(pLong).cast(dec) * col("de_num"))
      .select(lit(nItems).as("n_items"), lit(nTot).as("n_ratings"),
        lit(ms.length.toLong).as("m_kinds"),
        when(col("__dn") === 0, lit(1000000L))
          .otherwise(lit(1000000L) -
            ((col("__nm") - pmod(col("__nm"), col("__dn"))) /
              col("__dn")).cast("long"))
          .as("alpha_micro"))
  }
}
