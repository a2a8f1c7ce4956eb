package graft.tools

import org.apache.spark.sql.Dataset

/** Runtime contract for driver-side collects (r15 VERDICT ask #8): every
  * `collect()` in this library is bounded BY CONSTRUCTION — a count gate,
  * a top-k limit, a group-cardinality argument, a bounded-queries
  * contract — but most of those bounds lived in comments. This helper
  * turns the prose into an enforced contract: the plan is capped at
  * `maxRows + 1` BEFORE collection (so a violated bound allocates one
  * sentinel row past the cap on the driver, never the unbounded result),
  * and one row past the bound raises, naming the site's documented
  * reason. The failure mode it retires is the quiet one: input growth or
  * an upstream semantics change turning a "small by construction" frame
  * into a driver OOM with no attribution.
  *
  * Discipline: `why` states WHAT bounds the frame (the invariant, not
  * the call site); a tripped bound means that invariant broke — fix the
  * invariant or re-reason the bound, never just raise the number.
  */
object BoundedCollect {
  def apply[T](ds: Dataset[T], maxRows: Long, why: String): Array[T] = {
    require(maxRows > 0 && maxRows < Int.MaxValue,
      s"BoundedCollect: nonsensical bound $maxRows ($why)")
    val rows = ds.limit(maxRows.toInt + 1).collect()
    require(rows.length <= maxRows,
      s"BoundedCollect: '$why' produced more than its documented bound " +
        s"of $maxRows rows — the bounding invariant broke; refusing to " +
        "grow driver state (re-reason the bound, don't just raise it)")
    rows
  }
}
