package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query set
  * against a full scan of the corpus: map-only except the final per-query
  * top-k (TakeOrdered-style, no global sort). Correct at any scale where the
  * query set is small; cost is one corpus pass per batch of queries.
  *
  * Scale path: random-hyperplane LSH (SimHash for cosine, Charikar'02):
  * L independent tables of `bits` hyperplane signs; neighbor candidates are
  * corpus vectors sharing a bucket in ANY table — a bucket equi-join, shuffle
  * bounded by bucket sizes, never n². Planes are pseudo-random but fully
  * deterministic (xxhash64 of (table, bit, dim)), so results are reproducible
  * across runs and cluster layouts.
  */
object Similarity {

  /** Cosine similarity between two array<float/double> columns, computed in
    * double. Per-row IEEE arithmetic — deterministic, engine-comparable.
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Queries are broadcast; ranking is windowed
    * per query with a deterministic tiebreak on the rounded similarity.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        col("rank").cast("long").as("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (table, bit, dim):
    * uniform in [-1, 1), derived from xxhash64 — no RNG state, reproducible
    * on any executor.
    */
  private def planeComponent(table: Column, bit: Column, dim: Column): Column =
    (pmod(xxhash64(concat_ws("_", table.cast("string"), bit.cast("string"),
      dim.cast("string"))), lit(2001)).cast("double") - 1000.0) / 1000.0

  /** LSH bucket ids for a vector: one bucket per table, each bucket the
    * `bits`-bit sign pattern of hyperplane dot products.
    */
  def lshBuckets(vec: Column, tables: Int, bits: Int): Column =
    transform(sequence(lit(0), lit(tables - 1)), t =>
      aggregate(sequence(lit(0), lit(bits - 1)), lit(0L), (acc, b) => {
        val dotp = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, d) => x.cast("double") * planeComponent(t, b, d)),
          lit(0.0), (a2, v) => a2 + v)
        acc * 2 + when(dotp > 0, 1L).otherwise(0L)
      }))

  /** ANN top-k via hyperplane LSH: candidates share a bucket in any table;
    * exact cosine re-ranking on the candidate set.
    */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      tables: Int = 8, bits: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def withBuckets(df: DataFrame, id: String, v: String) =
      df.select(col(idCol).as(id), col(vecCol).as(v),
          posexplode(lshBuckets(col(vecCol), tables, bits)).as(Seq("table", "bucket")))
    val q = withBuckets(queries, "query_id", "qv")
    val c = withBuckets(corpus, "neighbor_id", "cv")
    val cands = q.join(c,
        Seq("table", "bucket")).where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("qv"), col("neighbor_id"), col("cv"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        col("rank").cast("long").as("rank"))
  }

  /** Embedding near-dup pairs: all corpus pairs with cosine ≥ threshold.
    * Candidate generation via LSH buckets (any shared bucket), verification
    * by exact cosine — output-bounded, no n² stage.
    */
  def cosineNearDups(df: DataFrame, threshold: Double,
      tables: Int = 8, bits: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      posexplode(lshBuckets(col(vecCol), tables, bits)).as(Seq("table", "bucket")))
    b.as("l").join(b.as("r"),
        col("l.table") === col("r.table") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.v").as("va"), col("r.v").as("vb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("sim", round(cosine(col("va"), col("vb")), 4))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
