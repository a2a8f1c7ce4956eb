package graft.queries

import graft.Tables
import graft.ml.{Features, Scoring}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feature-engineering + in-warehouse model scoring — ML inference pushed
  * into the query plan as fused Catalyst expressions (no UDFs, no per-row
  * interpreter), with exact cross-engine semantics so every query has a
  * DuckDB oracle: decimal-exact moments for standardization, fixed
  * evaluation order for the float chains (IEEE ops are correctly rounded,
  * so written order = bit-identical results), and a ranked DISTINCT
  * dimension for category indices.
  */
object MlOps extends QueryPack {
  import OracleSafe._

  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  /** The one demo tree, shared by the Spark query and the SQL oracle. */
  private val DemoTree: Scoring.Node = Scoring.Split("l_quantity", 25.0,
    Scoring.Split("l_discount", 0.05,
      Scoring.Leaf(0, 0.2), Scoring.Leaf(1, 0.8)),
    Scoring.Split("l_tax", 0.04,
      Scoring.Leaf(2, 0.5), Scoring.Leaf(3, 0.9)))

  private val DemoWeights =
    Seq("l_quantity" -> 0.05, "l_discount" -> -3.0, "l_tax" -> 1.5)
  private val DemoBias = -0.6

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- per-group z-score standardization: decimal-exact μ/σ, one
    //      stats shuffle joined back (no broadcast hint — stats scale
    //      with group cardinality), map-only after ----
    "feat_standardize" -> ((s, dir) =>
      Features.standardize(t(s, dir).lineitem, "l_returnflag", "l_quantity",
        "z_qty")
        .select(col("l_orderkey"), col("l_linenumber").cast("long")
          .as("l_linenumber"), col("l_returnflag"), col("z_qty"))),

    // ---- per-group min-max scaling into [0,1] ----
    "feat_minmax" -> ((s, dir) =>
      Features.minMaxScale(t(s, dir).lineitem, "l_returnflag",
        "l_extendedprice", "mm_price")
        .select(col("l_orderkey"), col("l_linenumber").cast("long")
          .as("l_linenumber"), col("l_returnflag"), col("mm_price"))),

    // ---- deterministic category index: rank over the DISTINCT dimension
    //      (category-cardinality sort), joined back — the fact table
    //      never sorts ----
    "feat_category_index" -> ((s, dir) =>
      Features.categoryIndex(t(s, dir).events, "event_type", "cat_idx")
        .select(col("event_id"), col("event_type"), col("cat_idx"),
          col("cat_idx_n"))),

    // ---- fused linear scorer: one arithmetic Column inside the scan
    //      projection, margin + thresholded label ----
    "ml_score_linear" -> ((s, dir) =>
      Scoring.scoreLinear(t(s, dir).lineitem, DemoWeights, DemoBias, "score")
        .select(col("l_orderkey"), col("l_linenumber").cast("long")
          .as("l_linenumber"), col("score"), col("score_label"))),

    // ---- decision tree compiled to nested CASE: leaf id + leaf value,
    //      zero shuffles, codegen-resident ----
    "ml_score_tree" -> ((s, dir) =>
      Scoring.scoreTree(t(s, dir).lineitem, DemoTree, "pred")
        .select(col("l_orderkey"), col("l_linenumber").cast("long")
          .as("l_linenumber"), col("pred_leaf"), col("pred"))),

    // ---- privacy family: releasability checks over quasi-identifiers.
    //      k-anonymity audit (window count on the QI tuple) ----
    "privacy_k_anon" -> ((s, dir) =>
      graft.llm.Privacy.kAnonymity(t(s, dir).customer,
          Seq("c_nationkey", "c_mktsegment"), k = 10)
        .select(col("c_custkey"), col("qi_group_n"), col("k_anon"))),

    // ---- small-group suppression: the release gate form. documents
    //      (lang, source) groups span 1–16 rows at the gate scales, so
    //      k = 5 yields a MIXED outcome (some groups suppressed, some
    //      released) rather than a degenerate all-or-nothing ----
    "privacy_suppress" -> ((s, dir) =>
      graft.llm.Privacy.suppressSmallGroups(t(s, dir).documents,
          Seq("lang", "source"), k = 5)
        .select(col("doc_id"))),

    // ---- l-diversity: distinct non-null sensitive values per QI group,
    //      exact two-phase distinct + null-safe join back ----
    "privacy_l_div" -> ((s, dir) =>
      graft.llm.Privacy.lDiversity(t(s, dir).orders,
          Seq("o_orderstatus", "o_orderpriority"), "o_custkey", l = 100)
        .select(col("o_orderkey"), col("l_div"), col("l_ok"))),

    // ---- generalize-to-k ladder: the whole power-of-2 width ladder
    //      evaluated in one exploded aggregation; smallest width whose
    //      every (event_type, bucket) group reaches k wins ----
    "privacy_generalize" -> ((s, dir) =>
      graft.llm.Privacy.generalizeToK(t(s, dir).events,
          Seq("event_type"), "user_id", k = 50, maxExp = 24)
        .select(col("event_id"), col("event_type"), col("qi_bucket"),
          col("gen_width"))),

    // ---- ε-DP noisy release counts: deterministic md5-keyed Laplace
    //      via the PortableMath staged log — the oracle replays the
    //      identical bit stream, so even the NOISE is engine-exact ----
    "privacy_dp_counts" -> ((s, dir) =>
      graft.llm.Privacy.dpNoisyCounts(t(s, dir).customer,
          Seq("c_mktsegment"), epsilonMicro = 500000L, seed = "graft-r9")
        .select(col("c_mktsegment"), col("n"), col("noisy_n")))
  )

  override def oracles: Map[String, String] = Map(
    "feat_standardize" ->
      s"""WITH st AS (
         |  SELECT l_returnflag AS g, ${sqlDavg("l_quantity")} AS mu,
         |    ${sqlDavg("l_quantity * l_quantity")} AS musq
         |  FROM lineitem GROUP BY 1),
         |s2 AS (SELECT g, mu,
         |  sqrt(greatest(musq - mu * mu, 0.0)) AS sigma FROM st)
         |SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         |  l_returnflag,
         |  CASE WHEN sigma > 0 THEN (l_quantity - mu) / sigma
         |       ELSE 0.0 END AS z_qty
         |FROM lineitem JOIN s2 ON l_returnflag = g""".stripMargin,

    "feat_minmax" ->
      """WITH st AS (
        |  SELECT l_returnflag AS g, min(l_extendedprice) AS lo,
        |    max(l_extendedprice) AS hi
        |  FROM lineitem GROUP BY 1)
        |SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_returnflag,
        |  CASE WHEN hi > lo THEN (l_extendedprice - lo) / (hi - lo)
        |       ELSE 0.0 END AS mm_price
        |FROM lineitem JOIN st ON l_returnflag = g""".stripMargin,

    "feat_category_index" ->
      """WITH dim AS (
        |  SELECT event_type,
        |    CAST(row_number() OVER (ORDER BY event_type) - 1 AS BIGINT)
        |      AS cat_idx,
        |    count(*) OVER () AS cat_idx_n
        |  FROM (SELECT DISTINCT event_type FROM events))
        |SELECT event_id, event_type, cat_idx, cat_idx_n
        |FROM events JOIN dim USING (event_type)""".stripMargin,

    "ml_score_linear" -> {
      val expr = Scoring.linearSql(DemoWeights, DemoBias)
      s"""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         |  CAST($expr AS DOUBLE) AS score,
         |  CAST(CASE WHEN $expr > 0 THEN 1 ELSE 0 END AS BIGINT)
         |    AS score_label
         |FROM lineitem""".stripMargin
    },

    "ml_score_tree" -> {
      val leaf = Scoring.treeSql(DemoTree, asValue = false)
      val value = Scoring.treeSql(DemoTree, asValue = true)
      s"""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         |  CAST($leaf AS BIGINT) AS pred_leaf,
         |  CAST($value AS DOUBLE) AS pred
         |FROM lineitem""".stripMargin
    },

    "privacy_k_anon" ->
      """SELECT c_custkey,
        |  CAST(count(*) OVER (PARTITION BY c_nationkey, c_mktsegment)
        |    AS BIGINT) AS qi_group_n,
        |  count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) >= 10
        |    AS k_anon
        |FROM customer""".stripMargin,

    "privacy_suppress" ->
      """SELECT doc_id FROM (
        |  SELECT doc_id,
        |    count(*) OVER (PARTITION BY lang, source) AS n
        |  FROM documents) WHERE n >= 5""".stripMargin,

    "privacy_l_div" ->
      """WITH d AS (
        |  SELECT o_orderstatus, o_orderpriority,
        |         CAST(count(DISTINCT o_custkey) AS BIGINT) AS l_div
        |  FROM orders WHERE o_custkey IS NOT NULL
        |  GROUP BY o_orderstatus, o_orderpriority)
        |SELECT o_orderkey, coalesce(d.l_div, 0) AS l_div,
        |       coalesce(d.l_div, 0) >= 100 AS l_ok
        |FROM orders o LEFT JOIN d
        |  ON o.o_orderstatus IS NOT DISTINCT FROM d.o_orderstatus
        | AND o.o_orderpriority IS NOT DISTINCT FROM d.o_orderpriority""".stripMargin,

    "privacy_dp_counts" -> {
      val lnCtes = graft.functions.PortableMath.duckCteChain(
        graft.functions.PortableMath.microLnStages("dpr", "dpd",
          graft.functions.PortableMath.duckShiftLeft), "d")
      s"""WITH c AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n
         |           FROM customer GROUP BY c_mktsegment),
         |h AS (SELECT *, md5(c_mktsegment || chr(1) || 'graft-r9') AS dph
         |      FROM c),
         |d AS (SELECT *,
         |  CAST(list_sum(list_transform(range(1, 13), j ->
         |    CAST(strpos('0123456789abcdef',
         |      substr(dph, CAST(j AS INTEGER), 1)) - 1 AS BIGINT)
         |    * (CAST(1 AS BIGINT) << CAST(4 * (12 - j) AS INTEGER))))
         |    AS BIGINT) + 1 AS dpr,
         |  CAST(281474976710656 AS BIGINT) AS dpd,
         |  CASE WHEN (strpos('0123456789abcdef', substr(dph, 13, 1)) - 1) % 2 = 1
         |       THEN 1 ELSE -1 END AS dps
         |  FROM h),
         |$lnCtes
         |SELECT c_mktsegment, n,
         |  CAST(n + dps * ((0 - lp) * 1 // 500000) AS BIGINT) AS noisy_n
         |FROM lnfin""".stripMargin
    },

    "privacy_generalize" ->
      """WITH w AS (SELECT CAST(1 AS BIGINT) << CAST(i AS INTEGER) AS wd
        |           FROM (SELECT unnest(range(0, 25)) AS i)),
        |g AS (SELECT wd, event_type,
        |        user_id - ((user_id % wd + wd) % wd) AS b, count(*) AS n
        |      FROM events, w GROUP BY wd, event_type, b),
        |m AS (SELECT wd, min(n) AS mn FROM g GROUP BY wd),
        |pick AS (SELECT coalesce(
        |    (SELECT min(wd) FROM m WHERE mn >= 50),
        |    (SELECT max(wd) FROM w)) AS wd)
        |SELECT event_id, event_type,
        |  CAST(user_id - ((user_id % pick.wd + pick.wd) % pick.wd)
        |    AS BIGINT) AS qi_bucket,
        |  CAST(pick.wd AS BIGINT) AS gen_width
        |FROM events, pick""".stripMargin
  )
}
