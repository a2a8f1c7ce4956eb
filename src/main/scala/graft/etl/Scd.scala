package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) merge — the versioned-upsert shape
  * the reference's MySQL output covers with ON DUPLICATE KEY UPDATE
  * (`etl-mysql/src/datastore.rs:214-244`), extended to keep history:
  * instead of overwriting a changed row, the open version is closed and a
  * new one appended, so every key's attribute timeline stays queryable.
  */
object Scd {

  /** Merge a snapshot of `updates` into the versioned dimension `current`.
    *
    * Contract: `current` has columns `keyCols ++ trackCols ++ (validFrom,
    * validTo)` where open rows have NULL `validTo`; `updates` has
    * `keyCols ++ trackCols` with at most one row per key. Result (same
    * schema as `current`):
    *  - closed historical rows pass through untouched;
    *  - an open row whose tracked attributes equal its update (or that has
    *    no update) passes through;
    *  - a changed key yields its old version closed at `effective` plus a
    *    new open version;
    *  - a key only in `updates` yields a new open version.
    *
    * Scale mechanics: one equi-join of the OPEN slice against the update
    * snapshot — closed history (the bulk of a long-lived dimension) never
    * enters the join, and a small daily snapshot broadcasts under AQE. All
    * row fates are decided by null-safe comparisons inside the join
    * projection: no window, no second shuffle, no driver-side state.
    */
  def scd2Merge(current: DataFrame, updates: DataFrame, keyCols: Seq[String],
      trackCols: Seq[String], effective: Column,
      validFrom: String = "valid_from", validTo: String = "valid_to"): DataFrame = {
    require(keyCols.nonEmpty && trackCols.nonEmpty,
      "scd2Merge needs at least one key and one tracked column")
    val outCols = keyCols ++ trackCols :+ validFrom :+ validTo
    val closed = current.filter(col(validTo).isNotNull).select(outCols.map(col): _*)
    // presence markers, NOT key nullability: the join itself is null-safe
    // (<=>), so a row with a NULL key value is a legitimate participant —
    // testing a key column for null would misread it as "side absent" and
    // silently drop it from the merge
    // project BEFORE the join: downstream branches only ever read
    // keyCols ++ trackCols ++ dates from each side, so the checkpointed
    // join output stays slim even when the caller's dimension carries
    // wide payload columns the merge never touches
    val open = current.filter(col(validTo).isNull)
      .select(outCols.map(col): _*)
      .withColumn("__in_cur", lit(true)).alias("o")
    val upd = updates.select((keyCols ++ trackCols).map(col): _*)
      .withColumn("__in_upd", lit(true)).alias("u")

    val joinCond = keyCols.map(k => col(s"o.$k") <=> col(s"u.$k")).reduce(_ && _)
    // one materialization: the merged frame feeds BOTH the surviving-old
    // and fresh-open branches — left lazy, the full-outer join (and every
    // scan under it) executes twice (the r12 scan audit read scd2_merge
    // at 7 source scans; both sides are projected to key+track+date rows
    // above, so the checkpointed frame is slim by construction)
    val j = open.join(upd, joinCond, "full_outer").localCheckpoint()
    val inOld = col("o.__in_cur").isNotNull
    val inNew = col("u.__in_upd").isNotNull
    val changed = trackCols.map(c => !(col(s"o.$c") <=> col(s"u.$c"))).reduce(_ || _)

    // surviving old versions: every open row, closed at `effective` when
    // its tracked attributes changed
    val oldRows = j.filter(inOld).select(
      keyCols.map(k => col(s"o.$k")) ++ trackCols.map(c => col(s"o.$c")) ++ Seq(
        col(s"o.$validFrom"),
        when(inNew && changed, effective).otherwise(col(s"o.$validTo"))
          .as(validTo)): _*)
    // fresh open versions: changed keys + brand-new keys
    val newRows = j.filter(inNew && (!inOld || changed)).select(
      keyCols.map(k => col(s"u.$k")) ++ trackCols.map(c => col(s"u.$c")) ++ Seq(
        effective.as(validFrom),
        lit(null).cast(current.schema(validTo).dataType).as(validTo)): _*)

    closed.unionByName(oldRows).unionByName(newRows)
  }
}
