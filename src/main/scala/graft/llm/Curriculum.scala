package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-order curriculum via stride scheduling
  * (Waldspurger & Weihl 1995, applied to data mixing): interleave groups
  * (languages, sources, quality buckets) so that every prefix of the
  * schedule contains each group in proportion to its weight — the
  * "don't front-load one domain" ordering a pretraining run wants after
  * mixture sampling has fixed the counts.
  *
  * Group g's r-th document (r = 1, 2, … ordered by id) is emitted at
  * integer virtual time `ticket = r·10⁹ div w_g`; sorting by
  * (ticket, group, id) yields the schedule. All-integer arithmetic —
  * BIGINT multiply, floor division — so the schedule is engine- and
  * partitioning-independent (oracle-hash-exact).
  *
  * Scale notes: tickets are map-only after one per-group row_number
  * (WindowGroupLimit-free but partitioned by group — groups are few);
  * the global position comes from
  * [[graft.etl.Transforms.globalSortRank]]'s range-partition + offset
  * trick, never a SinglePartition window.
  */
object Curriculum extends Serializable {

  private val Reserved = Set("__w", "__r", "ticket", "schedule_pos")

  /** Schedule rows (id, group, ticket, schedule_pos), schedule_pos = 1… in
    * emission order. `weights` are positive integers per group value (its
    * STRING form); every group present in `df` must have a weight — a
    * missing group fails loudly rather than silently starving.
    */
  def interleave(df: DataFrame, groupCol: String, idCol: String,
      weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty, "interleave needs at least one group weight")
    require(weights.values.forall(_ > 0),
      s"group weights must be positive: $weights")
    Seq(groupCol, idCol).foreach(c => require(!Reserved(c),
      s"column '$c' collides with a Curriculum working column"))
    val wmap = typedLit(weights)
    val w = coalesce(element_at(wmap, col(groupCol).cast("string")),
      raise_error(concat(lit("curriculum: no weight for group '"),
        col(groupCol).cast("string"), lit("'"))).cast("long"))
    val perGroup = Window.partitionBy(col(groupCol)).orderBy(col(idCol).asc)
    val ticketed = df
      .select(col(idCol), col(groupCol))
      .withColumn("__w", w)
      .withColumn("__r", row_number().over(perGroup).cast("long"))
      .withColumn("ticket", expr("__r * CAST(1000000000 AS BIGINT) div __w"))
      .drop("__w", "__r")
    graft.etl.Transforms.globalSortRank(ticketed,
        Seq(col("ticket").asc, col(groupCol).asc, col(idCol).asc),
        "schedule_pos")
      .select(col(idCol), col(groupCol), col("ticket"), col("schedule_pos"))
  }
}
