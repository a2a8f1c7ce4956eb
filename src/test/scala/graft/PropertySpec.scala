package graft

import graft.functions.GraftFunctions
import graft.llm.Similarity
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generator-driven invariants for the numeric kernels: one Spark job per
  * property over a scalacheck-generated batch (per-case Spark jobs would be
  * prohibitively slow; the batch keeps the property seeds deterministic).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val vecGen: Gen[Seq[Double]] = for {
    d <- Gen.choose(4, 64)
    v <- Gen.listOfN(d, Gen.choose(-10.0, 10.0))
    if v.exists(x => math.abs(x) > 1e-9) // all-zero has no direction
  } yield v

  test("property: int8 quantization keeps values in [-127,127] and cosine ≥ 0.999") {
    GraftFunctions.register(spark)
    val vecs = sample(vecGen, 200).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = vecs.toDF("id", "v")
      .withColumn("amax", array_max(transform($"v", x => abs(x))))
      .withColumn("q", Similarity.quantizeInt8($"v"))
    val bad = df.filter(exists($"q", i => i > 127 || i < -127)).count()
    assert(bad === 0L)
    val minCos = df
      .select(GraftFunctions.graftCosine($"v",
        Similarity.dequantizeInt8($"q", $"amax")).as("c"))
      .agg(min($"c")).head().getDouble(0)
    assert(minCos >= 0.999, s"worst reconstruction cosine $minCos")
  }

  test("property: star-contraction components match a local union-find on random graphs") {
    // the riskiest distributed algorithm in the dedup family gets an exact
    // independent oracle: survivorAssignment vs a driver-side union-find,
    // over scalacheck-generated graphs (random density, multi-edges,
    // reversed duplicates, chains and cliques alike)
    val edgeGen: Gen[Seq[(Long, Long)]] = for {
      nEdges <- Gen.choose(1, 40)
      edges <- Gen.listOfN(nEdges,
        Gen.zip(Gen.choose(0L, 25L), Gen.choose(0L, 25L)))
    } yield edges.filter { case (a, b) => a != b }
    sample(edgeGen, 12).filter(_.nonEmpty).zipWithIndex.foreach { case (edges, gi) =>
      // local union-find ground truth (min id per component)
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      // union by min is not guaranteed by rank-less union-find path order;
      // normalize: min id of each root's member set
      val members = parent.keys.toSeq.groupBy(find)
      val want = members.flatMap { case (_, ids) =>
        val m = ids.min; ids.map(_ -> m)
      }.toMap
      val got = graft.llm.Dedup.survivorAssignment(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"graph #$gi mismatch (edges: $edges)")
    }
  }

  test("property: hamming64 is symmetric, zero on the diagonal, ≤ 64") {
    GraftFunctions.register(spark)
    val longs = sample(Gen.choose(Long.MinValue, Long.MaxValue), 100)
    val df = longs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("id", "x")
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        col("a.x").as("xa"), col("b.x").as("xb"))
      .withColumn("hab", call_function("graft_hamming64", $"xa", $"xb"))
      .withColumn("hba", call_function("graft_hamming64", $"xb", $"xa"))
    assert(pairs.filter($"hab" =!= $"hba").count() === 0L)
    assert(pairs.filter($"ia" === $"ib" && $"hab" =!= 0L).count() === 0L)
    assert(pairs.filter($"hab" > 64L || $"hab" < 0L).count() === 0L)
  }

  private val textGen: Gen[String] = for {
    n <- Gen.choose(1, 60)
    words <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaLowerStr.map(_.take(8)).suchThat(_.nonEmpty),
      Gen.const("w."), Gen.const("x,y"), Gen.const("Z!")))
  } yield words.mkString(" ")

  test("property: shingle counts follow max(tokens - n + 1, 1); normalize is idempotent") {
    import graft.llm.TextOps
    val texts = sample(textGen, 150).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("id", "text")
    val checked = df.select(
      size(TextOps.tokens($"text")).as("ntok"),
      size(TextOps.wordShingles($"text", 3)).as("nsh3"),
      size(TextOps.charShingles($"text", 16)).as("nch"),
      length($"text").as("len"),
      TextOps.normalize($"text").as("norm1"),
      TextOps.normalize(TextOps.normalize($"text")).as("norm2"))
    val bad = checked.filter(
      $"nsh3" =!= greatest($"ntok" - 2, lit(1)) ||
      $"nch" =!= greatest($"len" - 15, lit(1)) ||
      $"norm1" =!= $"norm2").count()
    assert(bad === 0L)
  }

  test("property: cosine is symmetric, 1.0 on self, scale-invariant") {
    GraftFunctions.register(spark)
    val vecs = sample(vecGen, 100).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = vecs.toDF("id", "v")
    val self = df.select(abs(GraftFunctions.graftCosine($"v", $"v") - 1.0).as("d"))
      .agg(max($"d")).head().getDouble(0)
    assert(self < 1e-12, s"self-cosine deviates by $self")
    // positive scaling must not change the angle (beyond fp rounding)
    val scaled = df
      .withColumn("w", transform($"v", x => x * 3.7))
      .select(abs(GraftFunctions.graftCosine($"v", $"w") - 1.0).as("d"))
      .agg(max($"d")).head().getDouble(0)
    assert(scaled < 1e-9, s"scaled-cosine deviates by $scaled")
  }
}
