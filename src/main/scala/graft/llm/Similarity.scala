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
object Similarity extends Serializable {

  /** Cosine similarity between two array<float/double> columns, computed in
    * double. Per-row IEEE arithmetic — deterministic, engine-comparable.
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Symmetric per-vector int8 quantization: `q_i = floor(x_i * 127 / amax
    * + 0.5)` with `amax = max |x_i|` — a 4× (vs float32) storage cut for
    * embedding columns at corpus scale. `floor(+0.5)` rather than `round`
    * because engines disagree on round-half semantics; floor is IEEE-exact
    * everywhere. An all-zero vector quantizes to zeros (amax guard).
    * Map-only Column expression — no shuffle, no UDF.
    */
  def quantizeInt8(v: Column): Column = {
    val amax = array_max(transform(v, x => abs(x.cast("double"))))
    when(amax === 0.0, transform(v, _ => lit(0)))
      .otherwise(transform(v,
        x => floor(x.cast("double") * 127.0 / amax + 0.5).cast("int")))
  }

  /** Inverse of [[quantizeInt8]]: `x_i ≈ q_i * amax / 127` using the amax of
    * the ORIGINAL vector column (store it alongside the int8 payload).
    */
  def dequantizeInt8(q: Column, amax: Column): Column =
    transform(q, i => i.cast("double") * amax / 127.0)

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Queries are broadcast; ranking is windowed
    * per query with a deterministic tiebreak on the rounded similarity.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // native codegen'd cosine expression (same accumulation order as the
    // HOF `cosine`, but fused into whole-stage codegen)
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(
        graft.functions.GraftFunctions.graftCosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        col("rank").cast("long").as("rank"))
  }

  /** Semantic decontamination report — the embedding-space twin of
    * [[Dedup.decontaminate]]'s lexical span matching: for every corpus
    * vector, the nearest REFERENCE (eval-suite) vector and whether its
    * cosine clears `threshold`. Catches paraphrased benchmark leakage
    * that exact-span matching misses (the SemDeDup observation applied to
    * the decontamination problem).
    *
    * Scale shape: the eval suite is the broadcast side (thousands of
    * vectors — the corpus streams map-only against it, the mirror of the
    * lexical path's broadcast inverted index); the per-corpus-vector
    * argmax is a GROUP-BY max over a (sim, −eval_id) struct, not a
    * window — partial aggregation collapses each corpus vector's |ref|
    * candidate rows map-side, so the shuffle carries one row per corpus
    * vector. Ties break to the smaller eval id; sims are rounded to 4
    * decimals (the bruteForceTopK determinism idiom).
    *
    * Output: `(vec_id, eval_id, sim, contaminated)` for every corpus
    * vector (self-pairs excluded if ids overlap).
    */
  def semanticContamination(corpus: DataFrame, ref: DataFrame,
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("__sc_v"))
    val r = ref.select(col(idCol).as("eval_id"),
      col(vecCol).cast("array<double>").as("__sc_r"))
    c.join(broadcast(r), col("vec_id") =!= col("eval_id"))
      .withColumn("sim", round(
        graft.functions.GraftFunctions.graftCosine(col("__sc_v"),
          col("__sc_r")), 4))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("sim"), (-col("eval_id")).as("negid"))).as("__m"))
      .select(col("vec_id"), (-col("__m.negid")).as("eval_id"),
        col("__m.sim").as("sim"),
        (col("__m.sim") >= threshold).as("contaminated"))
  }

  /** Fixed max dimensionality of the precomputed hyperplane set. */
  private val MaxDim = 256

  /** Deterministic hyperplanes (java.util.Random is a specified LCG →
    * identical on every JVM, every executor, every run). Indexed as
    * planes[table][bit][dim].
    */
  private def planesArray(tables: Int, bits: Int): Array[Array[Array[Double]]] = {
    val rng = new java.util.Random(0x9E3779B9L)
    Array.tabulate(tables, bits, MaxDim)((_, _, _) => rng.nextDouble() * 2 - 1)
  }

  /** JIT-compiled bucket kernel: sign pattern of hyperplane dot products. */
  private def bucketsScala(v: Seq[Double], planes: Array[Array[Array[Double]]],
      tables: Int, bits: Int): Array[Long] = {
    val arr = v.toArray
    require(arr.length <= MaxDim,
      s"lshIndex supports embeddings up to $MaxDim dims, got ${arr.length}; raise MaxDim")
    Array.tabulate(tables) { t =>
      var acc = 0L
      var b = 0
      while (b < bits) {
        val plane = planes(t)(b)
        var dot = 0.0
        var d = 0
        while (d < arr.length) { dot += arr(d) * plane(d); d += 1 }
        acc = acc * 2 + (if (dot > 0) 1L else 0L)
        b += 1
      }
      acc
    }
  }

  /** (id, table, bucket) rows for every vector — the LSH index relation.
    * Heavy arithmetic runs as primitive Scala inside mapPartitions (Catalyst
    * higher-order functions are interpreted, ~50× slower here); the result
    * feeds ordinary equi-joins.
    */
  def lshIndex(df: DataFrame, tables: Int, bits: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    lshFromVecs(
      df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>")),
      tables, bits, idCol)

  /** LSH kernel over an already-narrow (id: long, vec: array<double>)
    * frame — lets callers that materialized the projection (e.g.
    * [[cosineNearDups]]) index it without re-deriving from source.
    */
  private def lshFromVecs(vecs: DataFrame, tables: Int, bits: Int,
      idCol: String): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val planes = planesArray(tables, bits)
    vecs.as[(Long, Seq[Double])]
      .mapPartitions(_.flatMap { case (id, v) =>
        bucketsScala(v, planes, tables, bits).iterator.zipWithIndex
          .map { case (bk, t) => (id, t, bk) }
      })
      .toDF(idCol, "table", "bucket")
  }

  /** JIT-compiled exact cosine over (a, b, va, vb) pair rows. Same
    * left-to-right accumulation order and formula as the `cosine` expression
    * → bit-identical doubles, oracle-safe.
    */
  private def cosineOfPairs(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col(aCol).cast("long"), col(bCol).cast("long"),
        col("va"), col("vb"))
      .as[(Long, Long, Seq[Double], Seq[Double])]
      .mapPartitions(_.map { case (a, b, va, vb) =>
        val x = va.toArray; val y = vb.toArray
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < x.length) {
          dot += x(i) * y(i); na += x(i) * x(i); nb += y(i) * y(i); i += 1
        }
        (a, b, dot / (math.sqrt(na) * math.sqrt(nb)))
      })
      .toDF(aCol, bCol, "sim_raw")
  }

  private def vectorsOf(df: DataFrame, idCol: String, vecCol: String,
      asId: String, asVec: String): DataFrame =
    df.select(col(idCol).cast("long").as(asId),
      col(vecCol).cast("array<double>").as(asVec))

  /** ANN top-k via hyperplane LSH: candidates share a bucket in any table;
    * exact cosine re-ranking on the candidate set.
    *
    * `multiProbe` (on by default) additionally probes, per table, every
    * bucket that differs from the query's in ONE bit — the standard
    * multi-probe trick (Lv et al., VLDB'07): a near neighbor that fell just
    * on the other side of a single hyperplane is still found. The expansion
    * is QUERY-side only (bits+1 probes per table), so the corpus index,
    * its shuffle, and the per-bucket cap are untouched; cost scales with
    * the (small) query set, recall roughly triples on unclustered data.
    *
    * `maxBucketSize` drops corpus-side buckets above the cap BEFORE the
    * candidate join — the same degenerate-bucket guard every other LSH path
    * carries. Without it, one boilerplate bucket (near-identical template
    * vectors) multiplies candidates for EVERY query that lands in it,
    * unbounded by k. Queries keep their other `tables − 1` buckets, so a
    * dropped mega-bucket costs recall only on vectors findable nowhere else.
    */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      tables: Int = 8, bits: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucketSize: Int = 10000, multiProbe: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qExact = lshIndex(queries, tables, bits, idCol, vecCol)
      .withColumnRenamed(idCol, "query_id")
    val q =
      if (!multiProbe) qExact
      else qExact.select(col("query_id"), col("table"),
        explode(array((lit(0L) +: (0 until bits).map(b => lit(1L << b)))
          .map(m => col("bucket").bitwiseXOR(m)): _*)).as("bucket"))
    // localCheckpoint: the index feeds BOTH the bucket-size audit and the
    // candidate join — without it the whole-corpus hyperplane kernel (the
    // dominant cost) would execute twice
    val cFull = lshIndex(corpus, tables, bits, idCol, vecCol)
      .withColumnRenamed(idCol, "neighbor_id")
      .localCheckpoint()
    val okBuckets = cFull.groupBy("table", "bucket")
      .agg(count(lit(1)).as("__bsz"))
      .where(col("__bsz") <= maxBucketSize)
      .select(col("table"), col("bucket"))
    val c = cFull.join(okBuckets, Seq("table", "bucket"))
    val cands = q.join(c, Seq("table", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id")).distinct()
      .join(vectorsOf(queries, idCol, vecCol, "query_id", "va"), "query_id")
      .join(vectorsOf(corpus, idCol, vecCol, "neighbor_id", "vb"), "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cosineOfPairs(cands, "query_id", "neighbor_id")
      .withColumn("sim", round(col("sim_raw"), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        col("rank").cast("long").as("rank"))
  }

  /** L2-normalized copy of a vector (all-zero input stays zero). */
  private def normalizeVec(x: Array[Double]): Array[Double] = {
    var n = 0.0; var i = 0
    while (i < x.length) { n += x(i) * x(i); i += 1 }
    val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
    val y = new Array[Double](x.length)
    i = 0; while (i < x.length) { y(i) = x(i) * inv; i += 1 }
    y
  }

  /** Deterministic hash-ordered training sample: the `n` vectors with the
    * smallest id hash. orderBy+limit plans as TakeOrdered (per-partition
    * heap + driver merge of n rows), never a global single-partition sort —
    * a bounded collect, the standard stance for codebook training (100 TB
    * never passes through training; FAISS trains on a sample too).
    */
  private def trainSample(vecs: DataFrame, n: Int): Array[Array[Double]] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    vecs.orderBy(xxhash64(col("id")).asc, col("id").asc)
      .limit(n)
      .select(col("v")).as[Seq[Double]].collect().map(_.toArray)
  }

  /** Deterministic driver-side Lloyd iterations. `spherical` assigns by
    * max dot product and re-normalizes the cluster means (the cosine /
    * unit-sphere variant); otherwise plain Euclidean k-means. Init is the
    * first `k` samples (hash-ordered upstream → reproducible); an empty
    * cluster keeps its previous centroid. Cost is O(iters·|sample|·k·dim)
    * on the driver — milliseconds at the bounded sample sizes used here,
    * with no per-iteration cluster job.
    */
  /** Nearest centroid of x (max dot for spherical, min L2 otherwise) —
    * shared by the driver and distributed Lloyd paths.
    */
  private def nearestCentroid(cents: Array[Array[Double]], x: Array[Double],
      spherical: Boolean): Int = {
    var best = 0
    var bestScore = if (spherical) Double.NegativeInfinity else Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      var s = 0.0; var i = 0
      if (spherical) { while (i < x.length) { s += x(i) * ct(i); i += 1 } }
      else { while (i < x.length) { val t = x(i) - ct(i); s += t * t; i += 1 } }
      if (if (spherical) s > bestScore else s < bestScore) { bestScore = s; best = c }
      c += 1
    }
    best
  }

  private def centroidsFromSums(prev: Array[Array[Double]],
      sums: Array[Array[Double]], counts: Array[Long],
      spherical: Boolean): Array[Array[Double]] =
    Array.tabulate(prev.length) { c =>
      if (counts(c) == 0) prev(c) // empty cluster keeps its centroid
      else {
        val dim = prev(c).length
        val mean = new Array[Double](dim)
        var i = 0; while (i < dim) { mean(i) = sums(c)(i) / counts(c); i += 1 }
        if (spherical) normalizeVec(mean) else mean
      }
    }

  private def lloyd(samples: Array[Array[Double]], k: Int, iters: Int,
      spherical: Boolean): Array[Array[Double]] = {
    require(samples.nonEmpty, "lloyd: empty training sample")
    val dim = samples.head.length
    var cents = samples.take(k).map(_.clone)
    for (_ <- 0 until iters) {
      val sums = Array.fill(cents.length, dim)(0.0)
      val counts = new Array[Long](cents.length)
      samples.foreach { x =>
        val best = nearestCentroid(cents, x, spherical)
        var i = 0; while (i < dim) { sums(best)(i) += x(i); i += 1 }
        counts(best) += 1
      }
      cents = centroidsFromSums(cents, sums, counts, spherical)
    }
    cents
  }

  /** Fixed-point scale for the distributed Lloyd accumulators: components
    * are in [-1, 1] after normalization, so a scaled value fits 2^40 and a
    * sum over the ≤ 2^22-row training sample stays far below Long overflow.
    * Integer addition is associative — the aggregated sums (hence the
    * centroids) are bit-identical under any partitioning or merge order,
    * which double accumulation cannot guarantee.
    */
  private val LloydScale = 1L << 40
  private val LloydMaxSample = 1L << 22

  /** Distributed deterministic Lloyd: one `treeAggregate` pass over a
    * DataFrame sample per iteration, per-cell sums carried as scaled longs.
    * The scale path when `k` needs more training rows than a driver-side
    * loop can afford (driver Lloyd is O(iters·sample·k·dim)): assignment
    * cost spreads across the cluster and only k·dim longs come back per
    * partition.
    */
  private def lloydDistributed(sample: DataFrame, init: Array[Array[Double]],
      iters: Int, spherical: Boolean): Array[Array[Double]] = {
    require(init.nonEmpty, "lloydDistributed: empty init")
    val spark = sample.sparkSession
    import spark.implicits._
    val k = init.length
    val dim = init.head.length
    // persist the normalized sample: every iteration re-reads it, and
    // without this each treeAggregate would re-scan the corpus, re-apply
    // the sampling filter, and re-normalize from scratch
    val rdd = sample.select(col("v")).as[Seq[Double]].rdd
      .map(v => normalizeVec(v.toArray))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents = init
    try for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val (sums, counts) = rdd.treeAggregate(
        (Array.fill(k)(new Array[Long](dim)), new Array[Long](k)))(
        seqOp = { case ((s, c), x) =>
          val best = nearestCentroid(bc.value, x, spherical)
          var i = 0
          while (i < dim) { s(best)(i) += math.round(x(i) * LloydScale); i += 1 }
          c(best) += 1
          (s, c)
        },
        combOp = { case ((s1, c1), (s2, c2)) =>
          var cc = 0
          while (cc < k) {
            var i = 0
            while (i < dim) { s1(cc)(i) += s2(cc)(i); i += 1 }
            c1(cc) += c2(cc)
            cc += 1
          }
          (s1, c1)
        })
      bc.destroy()
      val dsums = sums.map(_.map(_.toDouble / LloydScale))
      cents = centroidsFromSums(cents, dsums, counts, spherical)
    } finally rdd.unpersist(blocking = false)
    cents
  }

  /** Train `k` centroids over `vecs` (columns id, v), picking the path by
    * training-volume: when the FAISS-style guideline of ~39 rows per
    * centroid fits `trainSampleSize`, the sample collects and Lloyd runs
    * on the driver (no cluster jobs); otherwise a deterministic
    * hash-thresholded sample of ~39·k rows stays DISTRIBUTED and each
    * iteration is one treeAggregate — so auto-sized indexes (√n cells,
    * clamped at 4096) train on 39·k real rows instead of silently
    * degenerating to an untrained 4096-row sample, without ever putting
    * O(iters·sample·k·dim) on the driver.
    */
  private def trainCentroids(vecs: DataFrame, k: Int, iters: Int,
      spherical: Boolean, trainSampleSize: Int,
      nRows: Long = -1L): Array[Array[Double]] = {
    val targetRows = 39L * k
    if (targetRows <= trainSampleSize || iters == 0)
      lloyd(trainSample(vecs, math.max(k, trainSampleSize)).map(normalizeVec),
        k, iters, spherical)
    else {
      val n = if (nRows >= 0) nRows else vecs.count()
      require(targetRows <= LloydMaxSample,
        s"training sample $targetRows exceeds the fixed-point bound $LloydMaxSample")
      val init = trainSample(vecs, k).map(normalizeVec)
      // deterministic content-hash threshold: ~targetRows rows, layout-free
      val sample =
        if (n <= targetRows) vecs
        else {
          val m = 1L << 20
          val keep = math.max(1L, targetRows * m / n)
          vecs.where(pmod(xxhash64(col("id")), lit(m)) < keep)
        }
      lloydDistributed(sample, init, iters, spherical)
    }
  }

  /** IVF-flat ANN (the coarse-quantizer scale path, complementing LSH):
    * `nCells` centroids are trained with `trainIters` deterministic
    * spherical-Lloyd iterations over a bounded hash-sample of the corpus
    * (`trainIters = 0` reproduces the untrained sampled-centroid stand-in),
    * every corpus vector is assigned to its nearest centroid cell (map-only
    * with broadcast centroids), and a query probes its `nProbe` nearest
    * cells with exact cosine re-ranking inside them. Cell assignment cost
    * is O(n·nCells·dim) map-only; query cost is bounded by probed-cell
    * population, never n².
    *
    * `nCells = 0` (the default) auto-sizes the index from the corpus count
    * with the standard `√n` rule (what FAISS documents for IVF-flat),
    * clamped to [16, 4096] — the clamp keeps driver-side training bounded
    * (Lloyd is O(iters·sample·cells·dim)) and mean cell population at
    * `n / cells = √n`, so probed-candidate cost grows with √corpus rather
    * than staying fixed as data scales. `nProbe = 0` likewise auto-sizes
    * to `max(4, √cells)`: the probed FRACTION shrinks as the index grows
    * (the actual scale win) while small indexes keep enough probes for
    * usable recall. Explicit values override both knobs exactly as before.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCells: Int = 0, nProbe: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainIters: Int = 8, trainSampleSize: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = vectorsOf(corpus, idCol, vecCol, "id", "v")
    // one count against the corpus scan; feeds the auto codebook size and
    // the trainer's sampling fraction, so it runs once per build
    val nKnown = if (nCells > 0) -1L else vecs.count()
    val cells =
      if (nCells > 0) nCells
      else math.max(16, math.min(4096,
        math.round(math.sqrt(nKnown.toDouble)).toInt))
    val probe =
      if (nProbe > 0) nProbe
      else math.max(4, math.round(math.sqrt(cells.toDouble)).toInt)
    // trained unit centroids: cosine ranking below is scale-invariant, so
    // normalizing them changes nothing about assignment semantics. The
    // trainer scales its sample with the cell count (39·cells rows,
    // distributed Lloyd when that exceeds the driver budget) — a 4096-cell
    // auto-sized index trains on 160k real rows, not a degenerate
    // one-sample-per-centroid collect.
    val centroids = trainCentroids(vecs, cells, trainIters,
      spherical = true, trainSampleSize, nRows = nKnown)

    def nearestCells(v: Seq[Double], m: Int): Seq[Int] = {
      val x = v.toArray
      centroids.indices.map { c =>
        val p = centroids(c)
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < x.length) { dot += x(i) * p(i); na += x(i) * x(i); nb += p(i) * p(i); i += 1 }
        c -> dot / (math.sqrt(na) * math.sqrt(nb))
      }.sortBy { case (c, s) => (-s, c) }.take(m).map(_._1)
    }

    val assigned = vecs.as[(Long, Seq[Double])]
      .mapPartitions(_.map { case (id, v) => (id, v, nearestCells(v, 1).head) })
      .toDF("neighbor_id", "vb", "cell")
    val probes = vectorsOf(queries, idCol, vecCol, "query_id", "va")
      .as[(Long, Seq[Double])]
      .mapPartitions(_.flatMap { case (id, v) =>
        nearestCells(v, probe).map(c => (id, v, c))
      })
      .toDF("query_id", "va", "cell")
    val cands = probes.join(assigned, "cell")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("va"), col("vb"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cosineOfPairs(cands, "query_id", "neighbor_id")
      .withColumn("sim", round(col("sim_raw"), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        col("rank").cast("long").as("rank"))
  }

  /** Product-quantization ANN top-k: dimensions split into `m` subspaces,
    * each corpus vector encoded as `m` codebook indices (the compressed
    * scan representation real 100 TB vector search uses — the code scan
    * touches m bytes per vector instead of 4·d, and raw vectors are read
    * only for the final `rerank` candidates per query).
    *
    * Codebooks are k-means-trained per subspace: `trainIters` deterministic
    * Euclidean-Lloyd iterations over a bounded hash-sample of corpus
    * subvectors, driver-side (no iterative cluster job; `trainIters = 0`
    * reproduces the untrained sampled-codebook stand-in). Scoring is
    * asymmetric: each query precomputes a LUT of subspace dot products
    * against the codebooks (broadcast, `queries × m × codebookSize`
    * doubles), the corpus code scan accumulates approximate similarity with
    * `m` table lookups per vector, and per-partition bounded heaps emit
    * only `queries × rerank` rows per partition — never the full
    * query × corpus cross product. Exact cosine re-ranks the global
    * top-`rerank` candidates down to `k`.
    *
    * All vectors are unit-normalized before encoding, so approximate inner
    * product ranks like cosine. Recall < 1 by design (rows-only check;
    * recall is pinned by SimilaritySpec's planted duplicates).
    *
    * NOTE: round 3 retuned the defaults (8 subspaces when the dim allows,
    * codebookSize 16 → 32; recall 0.42 → 0.83 on the uniform worst case).
    * `m = 0` (the default) auto-picks the largest of 8/4/2/1 dividing the
    * embedding dim, so any even dim keeps working; an explicit `m` must
    * divide the dim exactly.
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 0, codebookSize: Int = 32, rerank: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainIters: Int = 8, trainSampleSize: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = corpus.sparkSession
    import spark.implicits._
    def normalize(x: Array[Double]): Array[Double] = normalizeVec(x)

    val vecs = vectorsOf(corpus, idCol, vecCol, "id", "v")
    // deterministic bounded training sample (normalized, like the encode path)
    val samples = trainSample(vecs, math.max(codebookSize, trainSampleSize))
      .map(normalize)
    require(samples.nonEmpty, "pqTopK: corpus is empty — no codebook sample")
    val dim = samples.head.length
    // m = 0 auto-picks the largest standard subspace count dividing dim,
    // so default-arg callers keep working on any even dim
    val mm = if (m > 0) m else Seq(8, 4, 2, 1).find(dim % _ == 0).get
    require(dim % mm == 0, s"m=$mm must divide dim=$dim")
    val sub = dim / mm
    // codebooks(j) = per-subspace Euclidean k-means over the sample's j-th
    // subvectors; codebooks(j)(c) is the c-th centroid of subspace j
    val codebooks: Array[Array[Array[Double]]] =
      Array.tabulate(mm) { j =>
        val subvecs = samples.map(s =>
          java.util.Arrays.copyOfRange(s, j * sub, (j + 1) * sub))
        lloyd(subvecs, codebookSize, trainIters, spherical = false)
      }

    def encode(xn: Array[Double]): Array[Int] =
      Array.tabulate(mm) { j =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < codebooks(j).length) {
          val cb = codebooks(j)(c)
          var d = 0.0; var i = 0
          while (i < sub) {
            val t = xn(j * sub + i) - cb(i); d += t * t; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }

    val codes = vecs.as[(Long, Seq[Double])]
      .mapPartitions(_.map { case (id, v) => (id, encode(normalize(v.toArray))) })
      .toDF("neighbor_id", "code")

    // per-query LUTs, broadcast with the closure (queries are a small set —
    // same stance as bruteForceTopK)
    val qluts: Array[(Long, Array[Array[Double]])] =
      vectorsOf(queries, idCol, vecCol, "query_id", "va")
        .as[(Long, Seq[Double])].collect()
        .map { case (qid, q) =>
          val qn = normalize(q.toArray)
          qid -> Array.tabulate(mm, codebooks(0).length) { (j, c) =>
            val cb = codebooks(j)(c)
            var s = 0.0; var i = 0
            while (i < sub) { s += qn(j * sub + i) * cb(i); i += 1 }
            s
          }
        }

    val approx = codes.as[(Long, Seq[Int])]
      .mapPartitions { it =>
        // bounded per-(partition, query) heaps: emit rerank rows per query,
        // not the full code scan
        val heaps = qluts.map { case (qid, _) =>
          qid -> new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
            Ordering.by[(Double, Long), Double](_._1).reverse) // min-heap
        }.toMap
        it.foreach { case (nid, codeSeq) =>
          val code = codeSeq.toArray
          qluts.foreach { case (qid, lut) =>
            if (qid != nid) {
              var s = 0.0; var j = 0
              while (j < mm) { s += lut(j)(code(j)); j += 1 }
              val h = heaps(qid)
              if (h.size < rerank) h.enqueue((s, nid))
              else if (s > h.head._1) { h.dequeue(); h.enqueue((s, nid)) }
            }
          }
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.iterator.map { case (s, nid) => (qid, nid, s) }
        }
      }
      .toDF("query_id", "neighbor_id", "approx")

    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id").asc)
    val cands = approx
      .withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= rerank)
      .select(col("query_id"), col("neighbor_id"))
      .join(vectorsOf(queries, idCol, vecCol, "query_id", "va"), "query_id")
      .join(vectorsOf(corpus, idCol, vecCol, "neighbor_id", "vb"), "neighbor_id")

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cosineOfPairs(cands, "query_id", "neighbor_id")
      .withColumn("sim", round(col("sim_raw"), 4))
      .withColumn("rank", row_number().over(w))
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
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucketSize: Int = 10000): DataFrame = {
    // one materialization of the narrow (id, vec) frame: the LSH kernel
    // and BOTH pair-side joins read it instead of three source scans
    // (same pattern as semDedup; compact binary, no lineage)
    val vecs = vectorsOf(df, idCol, vecCol, "__cnd_id", "__cnd_v")
      .localCheckpoint()
    val idx = lshFromVecs(vecs, tables, bits, idCol)
    // bucket-local pair generation: one shuffle of slim (table, bucket, id)
    // rows instead of a two-sided self-join; a pair colliding in up to
    // `tables` buckets still reaches distinct() only as (id_a, id_b) longs
    val cands = Dedup.pairsWithinBuckets(idx, Seq("table", "bucket"), idCol,
      maxBucketSize)
      .join(vecs.select(col("__cnd_id").as("id_a"),
        col("__cnd_v").as("va")), "id_a")
      .join(vecs.select(col("__cnd_id").as("id_b"),
        col("__cnd_v").as("vb")), "id_b")
    cosineOfPairs(cands, "id_a", "id_b")
      .withColumn("sim", round(col("sim_raw"), 4))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** SemDeDup — semantic dedup by embedding clustering (Abbas et al. 2023,
    * arXiv:2303.09540): spherical k-means centroids trained on a bounded
    * hash-sample, every vector assigned to its nearest centroid (map-only,
    * broadcast centroids — same kernel as [[ivfTopK]]'s cell assignment),
    * near-dup candidates generated ONLY within clusters, verified by exact
    * cosine. A vector is dropped when any LOWER-ID vector in its cluster
    * sits at cosine ≥ threshold (min-id survivor — deterministic given the
    * centroids, reproducible across layouts). Returns the surviving rows.
    *
    * Scale mechanics: no cross-cluster pair is ever considered, so pair
    * volume is O(Σ cluster²) bounded by `maxClusterSize` and per-task
    * bounded by the shared chunked pair machinery
    * ([[Dedup.pairsWithinBuckets]]); `nClusters = 0` auto-sizes to √n
    * like IVF, keeping mean cluster population at √n. Like all clustered
    * dedup, recall < 1 by design: a dup pair straddling a centroid
    * boundary is missed (the paper accepts the same trade) — so this is
    * rows-only checked, with recall pinned on planted dups in LlmSpec.
    *
    * A cluster LARGER than `maxClusterSize` is skipped wholesale (the
    * degenerate-bucket cap all LSH paths share) — its members pass
    * through undeduplicated. With auto-sizing (√n clusters clamped at
    * 4096) mean population stays under the 10k default only while
    * n ≲ 4·10⁷ vectors; beyond that raise `maxClusterSize` / `nClusters`
    * or the cap swallows typical clusters. The skip is never silent: the
    * count of over-cap clusters is checked eagerly and logged to stderr.
    */
  def semDedup(df: DataFrame, threshold: Double, nClusters: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainIters: Int = 8, trainSampleSize: Int = 4096,
      maxClusterSize: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // one eager materialization of the narrow (id, vec) projection: every
    // downstream stage — count, each Lloyd treeAggregate, assignment, and
    // both pair-side joins — would otherwise rescan and re-project the
    // SOURCE per job (~13 scans for 8 training iters). Iterative ML input
    // is the textbook localCheckpoint case; the checkpoint is compact
    // binary on executor-local disk and carries no lineage.
    val vecs = vectorsOf(df, idCol, vecCol, "id", "v").localCheckpoint()
    val nKnown = if (nClusters > 0) -1L else vecs.count()
    val cells =
      if (nClusters > 0) nClusters
      else math.max(16, math.min(4096,
        math.round(math.sqrt(nKnown.toDouble)).toInt))
    val centroids = trainCentroids(vecs, cells, trainIters,
      spherical = true, trainSampleSize, nRows = nKnown)

    def nearest(v: Seq[Double]): Int = {
      val x = v.toArray
      var best = 0; var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < centroids.length) {
        val p = centroids(c)
        var dot = 0.0; var na = 0.0
        var i = 0
        while (i < x.length) { dot += x(i) * p(i); na += x(i) * x(i); i += 1 }
        val s = if (na == 0.0) 0.0 else dot / math.sqrt(na)
        if (s > bestScore) { bestScore = s; best = c }
        c += 1
      }
      best
    }

    val assigned = vecs.as[(Long, Seq[Double])]
      .mapPartitions(_.map { case (id, v) => (id, nearest(v)) })
      .toDF("id", "cell")
      // read twice (over-cap audit + pair generation): localCheckpoint
      // materializes once with no lingering cache entry to release
      .localCheckpoint()
    // over-cap clusters are SKIPPED by the pair generator — that must
    // never happen silently (it means the corpus outgrew the cap and the
    // op is quietly under-deduplicating)
    val oversize = assigned.groupBy("cell").count()
      .filter(col("count") > maxClusterSize).count()
    if (oversize > 0) System.err.println(
      s"[graft] semDedup: $oversize cluster(s) exceed maxClusterSize=" +
        s"$maxClusterSize and are NOT deduplicated — raise maxClusterSize " +
        "or nClusters")
    val pairs = Dedup.pairsWithinBuckets(assigned, Seq("cell"), "id",
      maxClusterSize)
      .join(vecs.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
    // pairsWithinBuckets emits sorted (id_a < id_b): the higher id drops
    val dropIds = cosineOfPairs(pairs, "id_a", "id_b")
      .filter(round(col("sim_raw"), 4) >= threshold)
      .select(col("id_b").as("__drop")).distinct()
    df.join(dropIds, df(idCol).cast("long") === dropIds("__drop"), "left_anti")
  }

  /** Hard-negative mining for contrastive training (the in-batch-negative
    * upgrade of DPR, Karpukhin et al. 2020 §3.2): for each query vector,
    * the `k` most-similar corpus vectors carrying a DIFFERENT label — the
    * near-misses that make the strongest training negatives — with
    * similarity capped at `maxSim` to exclude probable false negatives
    * (mislabeled true matches).
    *
    * Output: (query_id, neighbor_id, sim, rank), rank ≤ k per query by
    * (sim desc, neighbor_id asc). Same execution shape as
    * [[bruteForceTopK]]: queries broadcast, codegen'd cosine, one
    * WindowGroupLimit-pruned rank — the corpus side streams, never
    * shuffles more than the per-query candidates.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
      maxSim: Double = 1.0, idCol: String = "vec_id",
      vecCol: String = "embedding", labelCol: String = "label"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"k must be positive, got $k")
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("__ql"), col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("__nl"), col(vecCol).cast("array<double>").as("cv"))
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") &&
        !(col("__ql") <=> col("__nl")))
      .withColumn("sim", round(
        graft.functions.GraftFunctions.graftCosine(col("qv"), col("cv")), 4))
      .filter(col("sim") <= maxSim)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        col("rank").cast("long").as("rank"))
  }

  /** Deterministic integer k-means over int8-quantized embeddings — the
    * clustering primitive behind cluster-balanced sampling and SemDeDup-style
    * curation, made engine-exact so the full assignment is oracle-checkable
    * (float Lloyd iterations never are: summation order changes centroids).
    *
    * Mechanics: vectors quantize via [[quantizeInt8]] (values in [-127,127]);
    * distances are exact BIGINT squared-L2; centroid updates are per-dimension
    * `sum div count` (truncating integer division — Spark `div` and DuckDB
    * `//` agree, including on negative sums); assignment ties break to the
    * lowest centroid index; empty clusters keep their previous centroid.
    * Initialization is the `k` vectors with the smallest ids. Every step is
    * a total order on integers, so the trajectory is identical on any engine
    * and any parallelism.
    *
    * Scale shape: per iteration, ONE broadcast of the k×dim centroid table
    * against the corpus (map-side distance + min), then a slim
    * (cluster, dim, partial-sum) aggregation — k·dim rows collected to the
    * driver (the [[ivfTopK]] centroid-collect pattern; bounded, never
    * corpus-sized). The quantized vectors are localCheckpoint'ed once and
    * reused across iterations.
    *
    * Output: (idCol, cluster, dist) — final assignment with its squared-L2
    * distance to the winning centroid.
    */
  def kmeansInt8(df: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0; got $k, $iters")
    val vecs = df.select(col(idCol).as("__kid"),
        quantizeInt8(col(vecCol).cast("array<double>")).as("__kq"))
      .localCheckpoint()

    // init: the k smallest ids, cluster index in id order — deterministic
    var centroids: Array[(Int, Seq[Int])] = vecs.orderBy(col("__kid"))
      .limit(k).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Int](1)) }
    val spark = df.sparkSession

    def assigned(): DataFrame = {
      import spark.implicits._
      val cents = broadcast(centroids.toIndexedSeq.toDF("__kc", "__kcv"))
      val dist = aggregate(
        zip_with(col("__kq"), col("__kcv"),
          (a, b) => (a - b).cast("long") * (a - b)),
        lit(0L), (acc, x) => acc + x)
      vecs.crossJoin(cents)
        .withColumn("__kd", dist)
        .groupBy(col("__kid"))
        .agg(min(struct(col("__kd"), col("__kc"))).as("__kbest"))
        .select(col("__kid"), col("__kbest.__kc").as("__kc"),
          col("__kbest.__kd").as("__kd"))
    }

    for (_ <- 1 to iters) {
      // k×dim bounded collect; sums fit easily (127 · n per cell)
      val sums = assigned().join(vecs, "__kid")
        .select(col("__kc"), posexplode(col("__kq")).as(Seq("__kp", "__kv")))
        .groupBy(col("__kc"), col("__kp"))
        .agg(sum(col("__kv")).as("__ks"), count(lit(1)).as("__kn"))
        .collect()
        .map(r => (r.getInt(0), (r.getInt(1), r.getLong(2), r.getLong(3))))
        .groupBy(_._1)
      centroids = centroids.map { case (c, prev) =>
        sums.get(c) match {
          case Some(rows) =>
            // truncating div matches DuckDB's `//` on negatives too
            (c, rows.map(_._2).sortBy(_._1)
              .map { case (_, s, n) => (s / n).toInt }.toSeq)
          case None => (c, prev) // empty cluster: keep previous centroid
        }
      }
    }
    assigned().select(col("__kid").as(idCol),
      col("__kc").cast("long").as("cluster"), col("__kd").as("dist"))
  }
}
