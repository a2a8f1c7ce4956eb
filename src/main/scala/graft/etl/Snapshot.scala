package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diffing — the dataset-versioning primitive: given two keyed
  * snapshots of the same table, report exactly which keys were added,
  * removed, or changed. The audit step of every incremental pipeline
  * ("what did this run actually change?"), and the precursor to targeted
  * upserts ([[Writers.upsertPartitionedParquet]] applies a delta; `diff`
  * derives one).
  *
  * Scale: each side collapses to (key, 32-char digest) map-side — document
  * bodies never shuffle; the full-outer join moves slim digest rows only,
  * and snapshots bucketed/partitioned on the key co-locate it entirely.
  * Unchanged keys (the overwhelming majority at 100 TB) are dropped by the
  * post-join filter, so the OUTPUT is delta-sized, not corpus-sized.
  *
  * Determinism: the digest is md5 over the non-key columns in SORTED
  * column-name order, each value cast to string with chr(1) separators and
  * a chr(2) NULL marker — engine-reproducible (the DuckDB oracle computes
  * the identical digest). NULL keys never equi-join, so a NULL-keyed row
  * surfaces as removed+added rather than matching — same semantics on both
  * engines; keyed snapshots should not carry NULL keys.
  */
object Snapshot {

  /** Deterministic row digest over `cols` in the given order. */
  def rowDigest(cols: Seq[String]): Column =
    md5(concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*))

  /** Diff two keyed snapshots. Output: key columns + (change ∈
    * 'added'|'removed'|'changed', old_hash, new_hash); unchanged keys are
    * dropped. Both inputs must share the same column set; `keyCols` must
    * identify rows uniquely on each side (duplicate keys would
    * cross-multiply in the join, exactly as in any keyed merge).
    */
  def diff(old: DataFrame, cur: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must not be empty")
    require(old.columns.sorted.sameElements(cur.columns.sorted),
      s"snapshot schemas differ: ${old.columns.sorted.mkString(",")} vs " +
        cur.columns.sorted.mkString(","))
    val reserved = Seq("change", "old_hash", "new_hash")
    val clash = reserved.filter(old.columns.contains)
    require(clash.isEmpty,
      s"input must not contain reserved column(s) ${clash.mkString(", ")}")
    val compareCols = old.columns.filterNot(keyCols.contains).sorted.toSeq
    require(compareCols.nonEmpty, "snapshots have no non-key columns to compare")
    val o = old.select(keyCols.map(col) :+
      rowDigest(compareCols).as("old_hash"): _*)
    val c = cur.select(keyCols.map(col) :+
      rowDigest(compareCols).as("new_hash"): _*)
    o.join(c, keyCols, "full_outer")
      .withColumn("change",
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") =!= col("new_hash"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change") :+ col("old_hash") :+
        col("new_hash"): _*)
  }
}
