package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora.
  *
  * Shapes (all shuffle-bounded, no O(n²) stage):
  *  - exact: hash-groupBy on content digest — one shuffle on the digest,
  *    partial aggregation map-side; at 100 TB this is the cheapest possible
  *    dedup and the digest shuffle is ~32 bytes/doc.
  *  - MinHash+LSH: shingle → signature (map-only) → explode to (band,
  *    bandHash) → shuffle by band bucket → pairs emerge only inside buckets
  *    (candidate generation is output-bounded, not n²) → exact-Jaccard
  *    verification join. The standard distributed near-dup pipeline
  *    (Broder minhashing; used by every large corpus cleanup).
  *  - blocked Jaccard join: exact pairwise similarity restricted to cheap
  *    blocking keys (lang, length bucket) — for modest block sizes; LSH is
  *    the unbounded-scale path.
  *
  * Candidate hashing uses xxhash64 (codegen'd, Spark-native): hash choice
  * only affects LSH recall, never the verified output values, so DuckDB
  * oracles compare against brute-force exact Jaccard.
  */
object Dedup {

  /** Exact dedup: group by content digest, keep the minimum id as survivor. */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature over a shingle-array column: `numHashes` independent
    * permutation-min approximations, each hash seeded by index.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), h =>
      array_min(transform(shingles, s => xxhash64(concat(h.cast("string"), lit("_"), s)))))

  /** LSH candidate pairs: band the signature, bucket-join within bands.
    * Returns distinct (id_a, id_b) with id_a < id_b.
    *
    * `df` must carry (idCol: numeric, shinglesCol: array<string>).
    */
  def lshCandidates(df: DataFrame, idCol: String, shinglesCol: String,
      numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = df.select(col(idCol).as("id"),
      minhashSignature(col(shinglesCol), numHashes).as("sig"))
    val banded = sig.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(concat_ws("_",
            b.cast("string"),
            array_join(transform(slice(col("sig"), b * rows + 1, lit(rows)),
              _.cast("string")), "_"))))).as(Seq("band", "bucket")))
      .select(col("id"), col("band"), col("bucket"))
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard verification of candidate pairs against distinct shingle
    * sets. Returns (id_a, id_b, jaccard) for pairs meeting the threshold.
    */
  def jaccardVerify(candidates: DataFrame, df: DataFrame, idCol: String,
      shinglesCol: String, threshold: Double): DataFrame = {
    val sets = df.select(col(idCol).as("id"),
      array_distinct(col(shinglesCol)).as("set"))
    candidates
      .join(sets.select(col("id").as("id_a"), col("set").as("set_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("set").as("set_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jac", col("inter").cast("double") /
        (size(col("set_a")) + size(col("set_b")) - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
  }

  /** Full MinHash+LSH near-dup pipeline: text → word n-gram shingles → LSH
    * candidates → exact-Jaccard verified pairs.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 128, bands: Int = 64,
      threshold: Double = 0.5): DataFrame = {
    val shingled = df.select(col(idCol), col(textCol),
      TextOps.wordShingles(col(textCol), shingleN).as("__shingles"))
    val cands = lshCandidates(shingled, idCol, "__shingles", numHashes, bands)
    jaccardVerify(cands, shingled, idCol, "__shingles", threshold)
  }

  /** Blocked exact-Jaccard similarity join over token sets: candidate pairs
    * limited to equal blocking keys. For bounded block sizes only — the
    * LSH pipeline is the unbounded-scale path.
    */
  def jaccardJoinBlocked(df: DataFrame, idCol: String, tokensCol: String,
      blockCols: Seq[String], threshold: Double): DataFrame = {
    val sets = df.select((col(idCol).as("id") +: blockCols.map(col)) :+
      array_distinct(col(tokensCol)).as("set"): _*)
    val joinCond = blockCols.map(c => col(s"l.$c") === col(s"r.$c"))
      .reduce(_ && _) && col("l.id") < col("r.id")
    sets.as("l").join(sets.as("r"), joinCond)
      .withColumn("inter", size(array_intersect(col("l.set"), col("r.set"))))
      .withColumn("jac", col("inter").cast("double") /
        (size(col("l.set")) + size(col("r.set")) - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), col("jac"))
  }

  /** SimHash near-dup pairs: 64-bit fingerprints, pairs within `maxHamming`.
    * Candidate generation blocks on 4 16-bit fingerprint chunks (pigeonhole:
    * any pair within hamming distance 3 shares at least one exact chunk), so
    * no O(n²) stage.
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol).as("id"),
      TextOps.simhash64(textCol).as("fp"))
    // chunk extraction via SQL form: the shift amount is lambda-bound
    val chunks = fp.selectExpr("id", "fp",
      "posexplode(transform(sequence(0, 3), c -> (shiftrightunsigned(fp, c * 16) & 65535))) AS (chunk_idx, chunk)")
    chunks.as("l").join(chunks.as("r"),
        col("l.chunk_idx") === col("r.chunk_idx") && col("l.chunk") === col("r.chunk") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.fp").as("fp_a"), col("r.fp").as("fp_b"))
      .distinct()
      .withColumn("hamming", TextOps.hamming64(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
