package graft.tools

import graft.GraftSession
import graft.llm.{Dedup, TextOps}
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the minhash pipeline at a given SF dir. */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "minhash-profile")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mh] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet").select($"doc_id", $"text")
    val toks = split(trim($"text"), "\\s+")
    val trunc = docs.select(($"doc_id" + 100000).as("doc_id"),
      array_join(slice(toks, lit(1), floor(size(toks) * 0.8).cast("int")), " ").as("text"))
    val base = docs.unionByName(trunc)
    val shingled = base.select($"doc_id", $"text",
      TextOps.wordShingles($"text", 3).as("__shingles"))
    time("shingle")(shingled.select(sum(size($"__shingles"))).head())
    val cands = time("candidates (build)")(
      Dedup.lshCandidates(shingled, "doc_id", "__shingles", 128, 64))
    val nc = time("candidates (count)")(cands.count())
    println(s"[mh] n_candidates = $nc")
    val verified = Dedup.jaccardVerify(cands, shingled, "doc_id", "__shingles", 0.5)
    println(s"[mh] n_verified = ${time("verify")(verified.count())}")
    spark.stop()
  }
}
