package graft.tools

import graft.GraftSession
import graft.llm.CorpusStats
import org.apache.spark.sql.functions._

/** One-off stage dissection of tfidfKeywords at scale-probe sizes (run
  * after ScaleProbe materialized /tmp/graft_scale_<n>): times the tf agg,
  * the df join, and the full window separately, and prints whether the
  * rank-limit pushdown (WindowGroupLimit) made it into the plan.
  */
object TfidfPlanProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = GraftSession.local(32, "tfidf-plan-probe")
    spark.sparkContext.setLogLevel("WARN")
    args.lift(1).foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
    val docs = spark.read.parquet(s"/tmp/graft_scale_$n/documents.parquet")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tfidf] $label%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($r)")
    }
    val toks = docs.select(col("doc_id"),
      explode(graft.llm.TextOps.tokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    t("explode")(toks.count())
    t("tf_agg")(tf.count())
    t("df_agg")(dfreq.count())
    t("joined")(tf.join(dfreq, "term").count())
    val full = CorpusStats.tfidfKeywords(docs, "doc_id", "text", k = 5)
    t("full")(full.count())
    val plan = full.queryExecution.executedPlan.toString
    println("[tfidf] WindowGroupLimit in plan: " + plan.contains("WindowGroupLimit"))
    println("[tfidf] joins: " + Seq("BroadcastHashJoin", "SortMergeJoin",
      "ShuffledHashJoin").map(j => s"$j=${j.r.findAllIn(plan).size}").mkString(" "))
    spark.stop()
  }
}
