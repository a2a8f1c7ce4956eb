package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixture rebalancing: downsample groups (language, domain, source)
  * to a target weight distribution — the pretraining "data mixture" op.
  * Everything is integer arithmetic over a content-hash order, so the
  * selected set is exact, engine-reproducible (the DuckDB oracle computes
  * the identical set), and independent of cluster layout.
  */
object Mixture extends Serializable {

  /** Keep the largest subset realizing `weights` as exact proportions,
    * downsampling only (no row is duplicated): with W = Σ weights, the
    * achievable total is T = min_g floor(n_g·W / w_g) and each group keeps
    * its first floor(T·w_g / W) rows in (md5(id), id) order. Groups absent
    * from `weights` are dropped; a weighted group absent from `df` simply
    * doesn't constrain T.
    *
    * Scale mechanics: selection-by-rank normally costs a full per-group
    * sort — a corpus-sized group makes that a giant single-partition sort.
    * Instead a 256-cell md5-prefix histogram per group (one partial agg,
    * |groups|×256 rows collected — bounded like the IVF centroid collect)
    * locates each group's boundary bucket; rows below it are kept with a
    * map-side comparison and ONLY the boundary bucket (~1/256 of the
    * group) pays the row_number window. The histogram walk and the plain
    * per-group rank produce the same set because the bucket is the hash's
    * own prefix: (bucket, hash, id) order IS (hash, id) order.
    */
  def resampleToMixture(df: DataFrame, groupCol: String,
      weights: Map[String, Long], idCol: String): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    // reserved working names — silently overwriting + dropping a caller's
    // column would corrupt the output (same contract as Joins' __bin/__salt)
    val reserved = Seq("__mxb", "__mxbb", "__mxneed").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"input must not contain reserved column(s) ${reserved.mkString(", ")}")
    val bigW = weights.values.sum
    val hash = md5(col(idCol).cast("string"))
    val bucket = substring(hash, 1, 2)
    val inMix = df.filter(col(groupCol).isInCollection(weights.keys.toSeq))

    // |groups|×256 rows — bounded, the only driver-side state
    val hist = inMix.groupBy(col(groupCol).as("g"), bucket.as("b"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    if (hist.isEmpty) return inMix // no weighted group present

    val counts = hist.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val total = counts.map { case (g, n) => n * bigW / weights(g) }.min
    // boundary bucket + residual rank inside it, per group
    val bounds = counts.keys.toSeq.map { g =>
      val target = total * weights(g) / bigW
      val cells = hist.filter(_._1 == g).sortBy(_._2)
      var cum = 0L
      var i = 0
      while (i < cells.length && cum + cells(i)._3 < target) {
        cum += cells(i)._3; i += 1
      }
      // target <= n_g, so the walk always lands on a real bucket (or the
      // group keeps nothing and any bucket with need 0 works)
      val bb = if (i < cells.length) cells(i)._2 else "zz"
      (g, bb, target - cum)
    }
    val spark = df.sparkSession
    val boundsDf = broadcast(
      spark.createDataFrame(bounds).toDF(groupCol, "__mxbb", "__mxneed"))

    val j = inMix.withColumn("__mxb", bucket).join(boundsDf, groupCol)
    val low = j.filter(col("__mxb") < col("__mxbb"))
    val w = Window.partitionBy(col(groupCol)).orderBy(hash.asc, col(idCol).asc)
    val boundary = j.filter(col("__mxb") === col("__mxbb"))
      .withColumn("__mxrn", row_number().over(w))
      .filter(col("__mxrn") <= col("__mxneed"))
      .drop("__mxrn")
    low.unionByName(boundary).drop("__mxb", "__mxbb", "__mxneed")
  }

  /** TOKEN-weighted mixture: pretraining mixtures are specified in tokens,
    * not documents — realize `weights` as exact token proportions, keeping
    * each group's hash-prefix documents while its running token total stays
    * within the group's share. With G = Σ tokens_g·(achievable scale), the
    * achieved total is T = min_g floor(tokens_g·W / w_g) and group g keeps
    * docs in (md5(id), id) order while cum_tokens ≤ T·w_g / W — greedy
    * prefix semantics like [[Selection.tokenBudgetByScore]], selection
    * order and histogram pruning like [[resampleToMixture]] (the boundary
    * bucket's window carries the residual token budget; only it sorts).
    * Deterministic, engine-reproducible, downsampling-only.
    *
    * `tokenCount` must be a non-null positive Column (e.g.
    * `TextOps.tokenCount(col("text"))`).
    */
  def resampleToTokenMixture(df: DataFrame, groupCol: String,
      tokenCount: org.apache.spark.sql.Column, weights: Map[String, Long],
      idCol: String): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val reserved = Seq("__mxb", "__mxbb", "__mxneed", "__mxtk", "__mxcum")
      .filter(df.columns.contains)
    require(reserved.isEmpty,
      s"input must not contain reserved column(s) ${reserved.mkString(", ")}")
    val bigW = weights.values.sum
    val hash = md5(col(idCol).cast("string"))
    val bucket = substring(hash, 1, 2)
    val inMix = df.filter(col(groupCol).isInCollection(weights.keys.toSeq))
      .withColumn("__mxtk", tokenCount)

    val hist = inMix.groupBy(col(groupCol).as("g"), bucket.as("b"))
      .agg(sum(col("__mxtk")).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    if (hist.isEmpty) return inMix.drop("__mxtk")

    val totals = hist.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val total = totals.map { case (g, n) => n * bigW / weights(g) }.min
    val bounds = totals.keys.toSeq.map { g =>
      val target = total * weights(g) / bigW
      val cells = hist.filter(_._1 == g).sortBy(_._2)
      var cum = 0L
      var i = 0
      while (i < cells.length && cum + cells(i)._3 < target) {
        cum += cells(i)._3; i += 1
      }
      if (i < cells.length) (g, cells(i)._2, target - cum) else (g, "zz", 0L)
    }
    val spark = df.sparkSession
    val boundsDf = broadcast(
      spark.createDataFrame(bounds).toDF(groupCol, "__mxbb", "__mxneed"))

    val j = inMix.withColumn("__mxb", bucket).join(boundsDf, groupCol)
    val low = j.filter(col("__mxb") < col("__mxbb"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hash.asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = j.filter(col("__mxb") === col("__mxbb"))
      .withColumn("__mxcum", sum(col("__mxtk")).over(w))
      .filter(col("__mxcum") <= col("__mxneed"))
      .drop("__mxcum")
    low.unionByName(boundary)
      .drop("__mxb", "__mxbb", "__mxneed", "__mxtk")
  }
}
