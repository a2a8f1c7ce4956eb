package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog distinct counting (Flajolet et al. 2007) —
  * the cardinality companion to [[CorpusStats.countMinSketch]]'s frequency
  * sketch. Spark's own `approx_count_distinct` is HLL++ with an
  * implementation-defined hash, so its outputs are engine-private
  * (rows-only in the driver gate); this formulation fixes the hash to the
  * md5 nibble idiom and keeps the whole estimator in integer arithmetic,
  * so registers AND estimates are bit-identical on any engine — an
  * approximate algorithm with an exact, oracle-checkable answer.
  *
  * State is 2^p max-registers per group: MERGEABLE by element-wise max
  * (union semantics), the property that makes HLL the distinct-counting
  * primitive for sharded corpora and streaming ingest. No pre-distinct is
  * needed — duplicates cannot move a max — so the register build is one
  * map-side-combined aggregation over raw values, never a shuffle of the
  * distinct set itself.
  */
object Sketches extends Serializable {

  /** Max rho: 40 hash bits − 8 index bits leave a 32-bit window, so an
    * all-zero window reads rank 33. Fixed because p is fixed below. */
  private val RMax = 33

  /** Integer alpha_m in micro units: `721300·1e6 DIV (1e6 + 1079000 DIV m)`
    * — the standard 0.7213/(1 + 1.079/m) bias constant (valid m ≥ 128)
    * with both divisions floored, so the oracle can inline the same
    * literal. */
  def alphaMicro(m: Int): Long =
    721300000000L / (1000000L + 1079000L / m)

  /** 40-bit md5-derived item hash — identical to
    * [[CorpusStats.countMinSketch]]'s bucket source and replayable as
    * nibble arithmetic in any SQL engine. */
  private def hash40(value: Column): Column =
    conv(substring(md5(value.cast("string")), 1, 10), 16, 10).cast("long")

  /** Per-group HLL registers at p=8 (m=256): `(groupCol, j, mj)` with
    * `j = h mod 256` and `mj` = max over items of the rank of the first
    * set bit in the remaining 32-bit window (`RMax` when the window is
    * zero). p is fixed rather than a parameter: 256 registers give ~6.5%
    * standard error — the web-corpus monitoring regime — and a fixed m
    * keeps the alpha constant, the overflow analysis, and the unrolled
    * oracle all literal. Absent registers are semantically `mj = 0`;
    * [[hllEstimate]] accounts for them without materializing a grid.
    *
    * Scale: one narrow projection + one (group, j)-keyed max aggregation
    * with map-side combine — output is ≤ 256 rows per group regardless of
    * input size, and sketches of corpus shards union by `groupBy(g, j)
    * .max(mj)` without touching the data again.
    */
  def hllRegisters(df: DataFrame, groupCol: String, value: Column)
      : DataFrame = {
    val w = expr("__hll_h DIV 256")
    df.select(col(groupCol), hash40(value).as("__hll_h"))
      .select(col(groupCol), pmod(col("__hll_h"), lit(256L)).as("j"),
        when(w === 0L, lit(RMax))
          .otherwise(lit(RMax) - length(bin(w))).cast("int").as("rho"))
      .groupBy(col(groupCol), col("j"))
      .agg(max(col("rho")).as("mj"))
  }

  /** Working/output columns of [[hllEstimate]]; a groupCol that collides
    * would silently misjoin (the CorpusStats guard pattern). */
  private val Reserved = Set("j", "mj", "rho", "raw", "n_hll",
    "__hll_h", "__hll_s", "__hll_v") ++
    graft.functions.PortableMath.microLnColumns

  /** HLL estimate per group: `(groupCol, n_hll)` with the raw harmonic
    * estimator
    * {{{
    *   S   = Σ_present 2^(RMax − mj)  +  (256 − present) · 2^RMax
    *   raw = (alpha_micro · ((256² · 2^RMax) DIV S)) DIV 1e6
    * }}}
    * rearranged so every intermediate is an exact BIGINT (max S =
    * 256·2^33 < 2^42; the alpha product tops out at ~1.6e18 when every
    * register saturates), plus the standard small-range correction: when
    * `raw ≤ 2.5·m` and some registers are empty, linear counting
    * `m·ln(m/V)` (V = empty registers) replaces the badly-biased raw
    * value — computed as `((−lp)·256) DIV 1e6` over
    * [[graft.functions.PortableMath.microLnStages]]'s engine-exact staged
    * `lp = floor(ln(V/m)·1e6)`, so even the corrected branch replays
    * bit-identically in the oracle (a bare `ln()` would not — see the
    * bigramLmScore history).
    */
  def hllEstimate(df: DataFrame, groupCol: String, value: Column)
      : DataFrame = {
    require(!Reserved(groupCol),
      s"groupCol '$groupCol' collides with a Sketches working column")
    hllEstimateFromRegisters(hllRegisters(df, groupCol, value), groupCol)
  }

  /** The estimator half of [[hllEstimate]], applied to an existing
    * `(groupCol, j, mj)` register table — the entry point for merged
    * sketches (shard union via `groupBy(g, j).max(mj)`, streaming
    * ingest's max-merge-on-read). */
  def hllEstimateFromRegisters(registers: DataFrame, groupCol: String)
      : DataFrame = {
    val a = alphaMicro(256)
    val num = 256L * 256L * (1L << RMax)
    val agg0 = registers
      .groupBy(col(groupCol))
      .agg((sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RMax - mj)")) +
        (lit(256L) - count(lit(1))) * lit(1L << RMax)).as("__hll_s"),
        (lit(256L) - count(lit(1))).as("__hll_v"))
      .withColumn("raw", expr(s"($a * ($num DIV __hll_s)) DIV 1000000"))
    // greatest(V, 1): the stages need a >= 1; the V = 0 branch selects raw
    graft.functions.PortableMath
      .microLnStages("greatest(__hll_v, 1)", "256",
        graft.functions.PortableMath.sparkShiftLeft)
      .foldLeft(agg0) { case (d, (n, s)) => d.withColumn(n, expr(s)) }
      .select(col(groupCol),
        expr("CASE WHEN raw <= 640 AND __hll_v > 0 " +
          "THEN ((-lp) * 256) DIV 1000000 ELSE raw END").as("n_hll"))
  }
}
