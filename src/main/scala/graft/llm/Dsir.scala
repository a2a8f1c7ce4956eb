package graft.llm

import graft.functions.PortableMath
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023), the
  * hashed-n-gram form of Moore-Lewis (2010) cross-entropy-difference
  * selection: score every raw document by how much more likely its hashed
  * unigram+bigram features are under a TARGET distribution (e.g. a
  * high-quality or in-domain subset) than under the RAW corpus
  * distribution, then keep the top-weight documents. This is the standard
  * "make the 100 TB crawl look like the target domain" pretraining
  * selection step; the reference engine has no selection surface, so this
  * extends its Transformer filter step (etl-core/src/transformer.rs:13-36)
  * the way a training-data pipeline needs.
  *
  * Determinism contract (driver oracle): features hash to one of 4096
  * buckets via the first [[BucketHexLen]] hex chars of md5 (a plain string
  * key — no engine-specific integer conversion); both log-probabilities
  * are [[PortableMath.microLnStages]] fixed-point integers, and the
  * per-document weight is a BIGINT sum `Σ m_f · (lp_target − lp_raw)` —
  * order-independent, bit-identical on any engine.
  *
  * Scale notes (100 TB stance): the corpus is tokenized ONCE into a slim
  * locally-checkpointed (id, bucket, count) projection (the same
  * one-scan economics as [[Selection]]); the raw and target distributions
  * are partial-aggregated from it (4096-row model tables); the weight
  * table joins back on the bucket key, where AQE broadcasts the model
  * side. Distributions are plain additive counts, so an ingestion loop
  * can persist them as indexes and merge batches with
  * [[mergeFeatureDist]] without re-tokenizing history (the same disjoint-
  * batch argument as `CorpusStats.mergeTermDfIndex` — counts, not
  * distincts, so batches need not even be disjoint... only non-
  * overlapping if each doc must count once).
  */
object Dsir extends Serializable {

  /** Hex chars of md5 used as the feature bucket: 3 → 16³ = 4096 buckets
    * (the paper's hashed feature space, sized so the model table is
    * broadcast-trivial while bucket collisions stay rare on n-gram
    * vocabularies).
    */
  val BucketHexLen = 3

  /** Number of hash buckets = 16^[[BucketHexLen]]. */
  val Buckets: Long = 1L << (4 * BucketHexLen)

  private val Reserved = Set("g", "bg", "bkt", "m", "ct", "cr", "tt", "tr",
    "lpt", "lpr", "lw", "n_feats", "weight_micro", "__a") ++
    PortableMath.microLnColumns

  private def guard(idCol: String): Unit =
    require(!Reserved(idCol),
      s"idCol '$idCol' collides with a Dsir working column")

  /** (id, bkt, m): hashed unigram+bigram feature counts per document.
    * Bigrams are positional (map-only zip of adjacent tokens — the same
    * shape as `CorpusStats.bigramLmScore`); the bucket is the md5-prefix
    * string, so the shuffle key is (id, 3 hex chars).
    */
  def hashedFeatures(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    guard(idCol)
    val tk = TextOps.tokens(col(textCol))
    val unis = df.select(col(idCol), explode(tk).as("g"))
    val bis = df.filter(size(tk) >= 2).select(col(idCol), explode(
      arrays_zip(slice(tk, lit(1), size(tk) - 1),
        slice(tk, lit(2), size(tk) - 1))).as("bg"))
      .select(col(idCol),
        concat_ws(" ", col("bg")("0"), col("bg")("1")).as("g"))
    unis.unionByName(bis)
      .select(col(idCol),
        substring(md5(col("g").cast("binary")), 1, BucketHexLen).as("bkt"))
      .groupBy(col(idCol), col("bkt")).agg(count(lit(1)).as("m"))
  }

  /** Collapse per-doc features to a (bkt, cnt) distribution — the
    * persistable model state.
    */
  def featureDist(features: DataFrame): DataFrame =
    features.groupBy("bkt").agg(sum(col("m")).as("cnt"))

  /** Additive merge of feature distributions from disjoint doc batches. */
  def mergeFeatureDist(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bkt").agg(sum(col("cnt")).as("cnt"))

  /** Per-document DSIR importance weight against a target subset of the
    * corpus itself: `targetPred` rows define the target distribution.
    * Output: (id, n_feats, weight_micro) — micro-scaled fixed-point
    * `Σ m_f · (ln p_target(f) − ln p_raw(f))`, add-one smoothed over
    * [[Buckets]]; higher = more target-like. One corpus scan.
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column): DataFrame = {
    guard(idCol)
    val feats = hashedFeatures(df, idCol, textCol).localCheckpoint()
    val targetIds = df.filter(targetPred).select(col(idCol))
    val rawDist = featureDist(feats).withColumnRenamed("cnt", "cr")
    val tgtDist = featureDist(feats.join(targetIds, Seq(idCol), "left_semi"))
      .withColumnRenamed("cnt", "ct")
    weightsOfFeatures(feats, rawDist, tgtDist, idCol)
  }

  /** [[importanceWeights]] from precomputed model state — the incremental
    * form: `rawDist`/`tgtDist` are [[featureDist]] tables (possibly
    * [[mergeFeatureDist]]-accumulated across batches) with columns
    * renamed to (bkt, cr) / (bkt, ct); `feats` are the rows to score.
    * Every bucket of `feats` must appear in `rawDist` (true whenever the
    * scored docs are part of the raw distribution) — and the precondition
    * is ENFORCED: a feats bucket absent from `rawDist` raise_errors
    * instead of being silently dropped, because an inner join would
    * corrupt n_feats/weight_micro for the affected docs (the r13 ADVICE
    * concurrent-reader scenario: feats batch committed, dist delta not
    * yet) — the same loud stance as the empty-target guard below.
    */
  def weightsOfFeatures(feats: DataFrame, rawDist: DataFrame,
      tgtDist: DataFrame, idCol: String): DataFrame = {
    // single-row totals; the raise_error lives INSIDE the tt expression
    // (a dangling assert column would be pruned away by the optimizer)
    // so an empty target fails loudly instead of nulling every weight
    val tTot = tgtDist.agg(sum(col("ct")).as("tt"))
      .select(when(col("tt").isNull,
          raise_error(lit("dsir: target corpus is empty")).cast("long"))
        .otherwise(col("tt")).as("tt"))
    val rTot = rawDist.agg(sum(col("cr")).as("tr"))
    val dists = rawDist.join(tgtDist, Seq("bkt"), "left")
      .withColumn("ct", coalesce(col("ct"), lit(0L)))
      .crossJoin(broadcast(tTot))
      .crossJoin(broadcast(rTot))
    val tgtStages = PortableMath.microLnStages(
      "ct + 1", s"tt + $Buckets", PortableMath.sparkShiftLeft)
    val rawStages = PortableMath.microLnStages(
      "cr + 1", s"tr + $Buckets", PortableMath.sparkShiftLeft)
    val afterTgt = tgtStages.foldLeft(dists) {
        case (d, (name, sql)) => d.withColumn(name, expr(sql))
      }
      .select(col("bkt"), col("ct"), col("cr"), col("tt"), col("tr"),
        col("lp").as("lpt"))
    val weights = rawStages.foldLeft(afterTgt) {
        case (d, (name, sql)) => d.withColumn(name, expr(sql))
      }
      .select(col("bkt"), (col("lpt") - col("lp")).as("lw"))
    // left join + in-expression guard, NOT an inner join: an uncovered
    // bucket must fail loudly, and the raise_error lives inside the
    // aggregated expression so the optimizer cannot prune it away
    val lwGuarded = when(col("lw").isNull,
        raise_error(concat(lit("dsir: feats bucket "), col("bkt"),
          lit(" absent from rawDist — scored docs are not part of the " +
            "raw distribution"))).cast("long"))
      .otherwise(col("lw"))
    feats.join(weights, Seq("bkt"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("m")).as("n_feats"),
        sum(col("m") * lwGuarded).as("weight_micro"))
  }

  /** Keep the `k` most target-like documents: exact top-k by
    * (weight desc, id asc) — a TakeOrdered per-partition heap, never a
    * global sort. Returns (id, n_feats, weight_micro) rows.
    */
  def selectTopK(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    importanceWeights(df, idCol, textCol, targetPred)
      .orderBy(col("weight_micro").desc, col(idCol).asc)
      .limit(k)
  }
}
