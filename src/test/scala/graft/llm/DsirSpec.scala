package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // 3 target docs in fruit vocabulary, 3 raw docs in metal vocabulary,
  // plus one raw doc of each vocabulary to rank
  private def corpus = Seq(
    (1L, "apple banana cherry apple banana", "t"),
    (2L, "banana cherry apple banana cherry", "t"),
    (3L, "cherry apple banana cherry apple", "t"),
    (4L, "iron copper zinc iron copper", "r"),
    (5L, "copper zinc iron copper zinc", "r"),
    (6L, "zinc iron copper zinc iron", "r"),
    (10L, "apple banana cherry banana apple", "r"), // target-like
    (11L, "iron copper zinc copper iron", "r") // raw-like
  ).toDF("doc_id", "text", "grp")

  test("target-like docs outweigh raw-like docs") {
    val w = Dsir.importanceWeights(corpus, "doc_id", "text",
      col("grp") === "t")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(10L) > w(11L),
      s"fruit-vocab doc should be more target-like: $w")
    // every fruit doc outweighs every metal doc
    assert(Seq(1L, 2L, 3L, 10L).map(w).min >
      Seq(4L, 5L, 6L, 11L).map(w).max)
  }

  test("identical documents get identical weights") {
    val df = Seq(
      (1L, "same tokens here", "t"),
      (2L, "same tokens here", "r"),
      (3L, "other words now", "r")).toDF("doc_id", "text", "grp")
    val w = Dsir.importanceWeights(df, "doc_id", "text", col("grp") === "t")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(1L) === w(2L))
  }

  test("selectTopK keeps exactly k rows, ties broken by id") {
    val top = Dsir.selectTopK(corpus, "doc_id", "text",
      col("grp") === "t", k = 4).collect().map(_.getLong(0))
    assert(top.length === 4)
    assert(top.toSet.subsetOf(Set(1L, 2L, 3L, 10L)),
      s"top-4 must all be fruit-vocab docs: ${top.toSeq}")
  }

  test("incremental: merged per-batch dists reproduce the batch weights") {
    val batch1 = corpus.filter(col("doc_id") <= 4)
    val batch2 = corpus.filter(col("doc_id") > 4)
    // full recompute
    val full = Dsir.importanceWeights(corpus, "doc_id", "text",
      col("grp") === "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // per-batch feature dists, merged, then scored via weightsOfFeatures
    def featsOf(df: org.apache.spark.sql.DataFrame) =
      Dsir.hashedFeatures(df, "doc_id", "text")
    val rawDist = Dsir.mergeFeatureDist(
        Dsir.featureDist(featsOf(batch1)), Dsir.featureDist(featsOf(batch2)))
      .withColumnRenamed("cnt", "cr")
    val tgtDist = Dsir.featureDist(
        featsOf(corpus.filter(col("grp") === "t")))
      .withColumnRenamed("cnt", "ct")
    val inc = Dsir.weightsOfFeatures(featsOf(corpus), rawDist, tgtDist,
        "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc === full)
  }

  test("empty target corpus fails loudly") {
    val e = intercept[Exception] {
      Dsir.importanceWeights(corpus, "doc_id", "text", col("grp") === "nope")
        .collect()
    }
    assert(e.getMessage.contains("target corpus is empty"))
  }

  test("idCol colliding with a working column is rejected loudly") {
    val df = Seq(("x", "text here")).toDF("bkt", "text")
    val e = intercept[IllegalArgumentException] {
      Dsir.hashedFeatures(df, "bkt", "text")
    }
    assert(e.getMessage.contains("collides"))
  }
}
