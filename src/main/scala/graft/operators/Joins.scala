package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond Catalyst's built-ins.
  *
  * The reference's only join is a block-nested-loop left theta join
  * (`etl-core/src/joins.rs:15-185`), which Catalyst subsumes. These are the
  * *scale* joins a training-data warehouse actually needs on top.
  */
object Joins {

  /** As-of join: for every left row, the single latest right row with the
    * same key and `rightTs <= leftTs` (time-series point-in-time lookup).
    *
    * Spark has no native as-of join; the naive formulation
    * (`l JOIN r ON key AND r.ts <= l.ts` + max-per-group) explodes into a
    * range join. This implementation is the scalable union+window form:
    * tag both sides, union (no join at all), sort within key by
    * (ts, side) — right rows first on ties so `rightTs == leftTs` matches,
    * like DuckDB/QuestDB ASOF semantics — and carry the latest right
    * attributes forward with `last_value(ignoreNulls)`. Exactly ONE
    * shuffle (hash partition by key) regardless of data size or time
    * skew; no candidate explosion.
    *
    * Right columns (except key/ts) are appended nullable; left rows with
    * no prior right row keep nulls (left-outer as-of).
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String): DataFrame = {
    val rightVals = right.columns.filter(c => c != keyCol && c != rightTsCol)
    val leftCols = left.columns

    // All right value columns travel as ONE struct, carried forward with a
    // single last(ignoreNulls). Carrying columns independently would
    // back-fill a null field of the latest right row from an OLDER row —
    // fabricating a right row that never existed.
    val taggedLeft = left
      .withColumn("__ts", col(leftTsCol))
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightVals.map(c => right.schema(c)))))
      .select(Seq(col(keyCol), col("__ts"), col("__side"), col("__rv")) ++
        leftCols.filter(_ != keyCol).map(col): _*)
    val taggedRight = right
      .withColumn("__ts", col(rightTsCol))
      .withColumn("__side", lit(0))
      .withColumn("__rv", struct(rightVals.map(col): _*))
      .select(Seq(col(keyCol), col("__ts"), col("__side"), col("__rv")) ++
        leftCols.filter(_ != keyCol).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.unionByName(taggedRight)
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightVals.map(c => col(s"__rv.$c").as(c)): _*)
  }

  /** Range (interval) join: all (left, right) pairs with equal `keys` and
    * `right.rightVal - left.leftVal` in `[lo, hi]` — the attribution /
    * windowed-correlation join ("purchases within 30 min of a click").
    *
    * Spark plans the naive `l JOIN r ON key AND r.v BETWEEN l.v+lo AND l.v+hi`
    * as a hash join on key with a residual — fine until a key is hot, at
    * which point one task owns the whole key's cross product. This binned
    * form adds the time dimension to the shuffle key: left rows are
    * duplicated into each covered bin of width `binWidth` (≤ `(hi-lo)/
    * binWidth + 2` bins ⇒ 2 when `binWidth >= hi-lo`), right rows hash to
    * their own bin, and the equi-join on `keys :+ bin` bounds every task's
    * work by bin occupancy — no per-key hotspot, no nested-loop fallback
    * when `keys` is empty.
    *
    * `leftVal`/`rightVal` must be long-valued (e.g. `unix_micros(ts)`), with
    * `rightVal >= 0` (long `div` truncates toward zero, so negative right
    * values could land below a left row's covered bin range; the residual
    * filter keeps the join exact either way — only completeness needs the
    * bound). Column names must be disjoint apart from `keys`.
    */
  def rangeJoinBinned(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftVal: String, rightVal: String, lo: Long, hi: Long,
      binWidth: Long): DataFrame = {
    require(lo <= hi, s"empty range [$lo, $hi]")
    require(binWidth > 0, "binWidth must be positive")
    // __bin is a working column; an input already carrying one would be
    // silently overwritten and dropped — reject it like any other collision
    require(!(left.columns ++ right.columns).contains("__bin"),
      "inputs must not contain a __bin column (reserved working name)")
    val l = left.withColumn("__bin", explode(sequence(
      expr(s"(`$leftVal` + ${lo}L) div ${binWidth}L"),
      expr(s"(`$leftVal` + ${hi}L) div ${binWidth}L"))))
    val r = right.withColumn("__bin", expr(s"`$rightVal` div ${binWidth}L"))
    l.join(r, keys :+ "__bin", "inner")
      .filter(col(rightVal) >= col(leftVal) + lo &&
        col(rightVal) <= col(leftVal) + hi)
      .drop("__bin")
  }

  /** Salted equi-join for skewed keys: the hot keys of the big side are
    * split across `saltBuckets` sub-keys and the small side is replicated
    * per bucket — turning one straggler partition into `saltBuckets`
    * parallel ones. AQE's skew-join handles sort-merge skew adaptively;
    * explicit salting is for when the skew is known and extreme (a single
    * key holding >1 partition of data).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    // replication of the small side is only sound when unmatched
    // small-side rows never surface (they would appear saltBuckets times)
    require(Set("inner", "left", "leftouter")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only, got $joinType")
    require(!(big.columns ++ small.columns).contains("__salt"),
      "inputs must not contain a __salt column (reserved working name)")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
