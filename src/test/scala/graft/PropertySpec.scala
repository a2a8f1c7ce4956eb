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
      val got = graft.llm.Dedup.survivorAssignment(edges.toDF("id_a", "id_b"),
        localThreshold = if (gi % 2 == 0) 0 else 2000000L)
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

  test("property: histogram-pruned selection equals the plain window on random corpora") {
    import org.apache.spark.sql.expressions.Window
    // random group counts, tie-heavy scores (coarse grid forces many exact
    // ties and boundary-cell collisions), random token weights
    val rowGen: Gen[(Long, String, Double, Long)] = for {
      id <- Gen.choose(0L, 100000L)
      g <- Gen.oneOf("a", "b", "c", "d")
      s <- Gen.choose(0, 20).map(_ / 20.0)
      t <- Gen.choose(1L, 30L)
    } yield (id, g, s, t)
    val rows = sample(rowGen, 400).distinctBy(_._1)
    val df = rows.toDF("doc_id", "grp", "score", "ntok")
    val w = Window.partitionBy($"grp").orderBy($"score".desc, $"doc_id".asc)

    val fracGot = graft.llm.Selection
      .topFractionByScore(df, "grp", $"score", "doc_id", 2, 3)
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    val counts = df.groupBy($"grp").agg(count(lit(1)).as("n"))
    val fracWant = df.join(counts, "grp")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= $"n" * 2 / 3)
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    assert(fracGot.toSeq === fracWant.toSeq)

    val cumW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budGot = graft.llm.Selection
      .tokenBudgetByScore(df, "grp", $"score", $"ntok", "doc_id", 500L)
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    val budWant = df.withColumn("cum", sum($"ntok").over(cumW))
      .filter($"cum" <= 500L)
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    assert(budGot.toSeq === budWant.toSeq)
  }

  test("property: scd2Merge preserves closed history and yields one open row per surviving key") {
    val d = java.sql.Date.valueOf(_: String)
    // random dimension: some keys with history, random update coverage
    // (changed / unchanged / absent / brand-new)
    val keyGen = Gen.choose(0L, 30L)
    val segGen = Gen.oneOf("s1", "s2", "s3")
    val curKeys = sample(keyGen, 40).distinct
    val updRows = sample(Gen.zip(keyGen, segGen), 25).distinctBy(_._1)
    val openRows = curKeys.map(k => (k, s"s${(k % 3) + 1}",
      d("2020-01-01"), null.asInstanceOf[java.sql.Date]))
    val closedRows = curKeys.filter(_ % 4 == 0).map(k =>
      (k, "old", d("2018-01-01"), d("2020-01-01")))
    val current = (openRows ++ closedRows).toDF("k", "seg", "valid_from", "valid_to")
    val updates = updRows.toDF("k", "seg")
    val out = graft.etl.Scd.scd2Merge(current, updates, Seq("k"), Seq("seg"),
      lit(d("2024-06-01"))).collect()
      .map(r => (r.getLong(0), r.getString(1), String.valueOf(r.getDate(2)),
        Option(r.getDate(3)).map(_.toString)))

    // closed history passes through untouched
    val closedOut = out.filter(_._2 == "old")
    assert(closedOut.map(_._1).sorted.toSeq === closedRows.map(_._1).sorted)
    assert(closedOut.forall(r => r._3 == "2018-01-01" && r._4.contains("2020-01-01")))
    // exactly ONE open row (valid_to null) per surviving key
    val openPerKey = out.filter(_._4.isEmpty).groupBy(_._1).view.mapValues(_.length)
    assert(openPerKey.values.forall(_ == 1),
      s"keys with != 1 open row: ${openPerKey.filter(_._2 != 1)}")
    // every key present in current or updates still has an open row
    val allKeys = (curKeys ++ updRows.map(_._1)).distinct.sorted
    assert(openPerKey.keys.toSeq.sorted === allKeys)
    // a changed key carries exactly one closed-at-effective row
    val updMap = updRows.toMap
    val changed = curKeys.filter(k => updMap.get(k).exists(_ != s"s${(k % 3) + 1}"))
    val closedAtEff = out.filter(_._4.contains("2024-06-01")).map(_._1).sorted
    assert(closedAtEff.toSeq === changed.sorted)
  }

  private val corpusGen: Gen[Seq[(Long, String)]] = {
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    for {
      nDocs <- Gen.choose(5, 15)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(3, 30)
        ws <- Gen.listOfN(len, Gen.oneOf(vocab))
      } yield ws.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  test("property: removeRepeatedSpans matches a local reference on random corpora") {
    import graft.llm.CorpusStats
    val L = 3; val maxDf = 2
    sample(corpusGen, 8).zipWithIndex.foreach { case (docs, gi) =>
      val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }.toMap
      val spans = toks.toSeq.flatMap { case (id, tk) =>
        tk.sliding(L).filter(_.size == L).zipWithIndex
          .map { case (s, i) => (id, i, s.mkString(" ")) }
      }
      val freq = spans.groupBy(_._3).view
        .mapValues(_.map(_._1).distinct.size).filter(_._2 > maxDf).keySet
      val expect = docs.map { case (id, _) =>
        val tk = toks(id)
        val covered = spans.filter(p => p._1 == id && freq(p._3))
          .flatMap(p => p._2 until p._2 + L).toSet
        val kept = tk.zipWithIndex.collect { case (w, i) if !covered(i) => w }
        (id, tk.size.toLong, (tk.size - kept.size).toLong, kept.mkString(" "))
      }.sortBy(_._1)
      val got = CorpusStats.removeRepeatedSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", L, maxDf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .sortBy(_._1)
      assert(got.toSeq === expect, s"corpus $gi: $docs")
    }
  }

  test("property: tfidfKeywords matches a local reference on random corpora") {
    import graft.llm.CorpusStats
    val k = 3
    sample(corpusGen, 8).zipWithIndex.foreach { case (docs, gi) =>
      val tf = docs.flatMap { case (id, t) =>
        t.trim.split("\\s+").toSeq.map(w => (id, w))
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val dfq = tf.keySet.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val expect = tf.toSeq
        .map { case ((id, w), n) => (id, w, n, dfq(w), n * 1000000000L / dfq(w)) }
        .groupBy(_._1).toSeq.flatMap { case (_, ts) =>
          ts.sortBy(t => (-t._5, t._2)).take(k).zipWithIndex
            .map { case (t, i) => (t._1, t._2, t._3, t._4, t._5, (i + 1).toLong) }
        }.sortBy(t => (t._1, t._6))
      val got = CorpusStats.tfidfKeywords(
        docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
        .sortBy(t => (t._1, t._6))
      assert(got.toSeq === expect, s"corpus $gi: $docs")
    }
  }

  test("property: PortableMath microLn SQL stages match the JVM reference, including floor-boundary cases") {
    import graft.functions.PortableMath
    // random (c2, c1, V) triples in the LM-score shape (a = c2+1 ≤ b = c1+V)
    val triGen: Gen[(Long, Long, Long)] = for {
      c1 <- Gen.choose(1L, 10000000L)
      c2 <- Gen.choose(0L, math.min(c1, 1000000L))
      v <- Gen.choose(1L, 1000000L)
    } yield (c2, c1, v)
    val random = sample(triGen, 2000)
    // plant cases where true ln(a/b)·10⁶ sits within 1e-6 of a floor
    // boundary — exactly where a last-ulp engine disagreement in a bare
    // ln() flips the fixed-point value (the round-5 correctness failure)
    val boundary = (for {
      b <- 2L to 4000L
      a <- 1L to math.min(b, 80L)
      t = math.log(a.toDouble / b) * 1e6
      if math.abs(t - math.rint(t)) < 1e-3
    } yield (a - 1, b - 1, 1L)).take(500)
    val all = (random ++ boundary).distinct
    val expect = all.map { case (c2, c1, v) =>
      (c2, c1, v, PortableMath.microLnRef(c2 + 1, c1 + v))
    }
    val stages = PortableMath.microLnStages(
      "c2 + 1", "c1 + vocab", PortableMath.sparkShiftLeft)
    val got = stages.foldLeft(all.toDF("c2", "c1", "vocab")) {
        case (d, (n, s)) => d.withColumn(n, expr(s))
      }
      .select($"c2", $"c1", $"vocab", $"lp")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(boundary.size > 50, "boundary hunt found too few planted cases")
    assert(got.toSeq.sorted === expect.sorted)
    // and the polynomial stays within the 1e-6 fixed-point granularity of
    // the true logarithm (semantics check, not just determinism)
    expect.foreach { case (c2, c1, v, lp) =>
      val t = math.log((c2 + 1).toDouble / (c1 + v))
      assert(math.abs(t - lp / 1e6) <= 1.000001e-6,
        s"($c2,$c1,$v): lp=$lp true=$t")
    }
  }

  test("property: incremental hamming pairs equal the batch pairs touching fresh ids") {
    import graft.llm.Dedup
    // clustered fingerprints (shared high bits) so hamming ≤ 3 pairs are
    // common, across random fresh/existing splits
    val fpGen: Gen[(Long, Long)] = for {
      base <- Gen.oneOf(0x1111222233330000L, 0x0F0F0F0F00000000L,
        0x7777000011110000L, -1L)
      flip <- Gen.choose(0, 63)
      more <- Gen.choose(0, 63)
    } yield (base ^ (1L << flip), base ^ (1L << flip) ^ (1L << more))
    val fps = sample(fpGen, 60).flatMap(p => Seq(p._1, p._2))
      .distinct.zipWithIndex.map { case (fp, i) => (i.toLong, fp) }
    val (freshRows, existRows) = fps.partition(_._1 % 3 == 0)
    val fresh = freshRows.toDF("id", "fp")
    val existing = existRows.toDF("id", "fp")
    val freshIds = freshRows.map(_._1).toSet
    val inc = Dedup.hamming64PairsIncremental(fresh, existing, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = Dedup.hamming64Pairs(fresh.unionByName(existing), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter(p => freshIds(p._1) || freshIds(p._2)).toSet
    assert(inc === full)
    assert(inc.nonEmpty, "degenerate property run: no pairs generated")
  }

  test("property: generalizeToK picks a satisfying width no coarser than needed") {
    import graft.llm.Privacy
    val rowGen: Gen[(String, Long)] = for {
      g <- Gen.oneOf("a", "b")
      v <- Gen.choose(-64L, 64L)
    } yield (g, v)
    val rows = sample(rowGen, 120).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }
    val df = rows.toDF("id", "grp", "v")
    val k = 7L
    val out = Privacy.generalizeToK(df, Seq("grp"), "v", k, maxExp = 10)
    val w = out.select($"gen_width").head().getLong(0)
    def minGroup(width: Long): Long =
      rows.groupBy(r => (r._2, r._3 - java.lang.Math.floorMod(r._3, width)))
        .map(_._2.size.toLong).min
    // the chosen width satisfies k (unless it is the ladder fallback)…
    if (w < (1L << 10)) assert(minGroup(w) >= k, s"width $w min ${minGroup(w)}")
    // …and no strictly finer ladder width would have
    if (w > 1) assert(minGroup(w / 2) < k,
      s"width ${w / 2} already satisfies k — $w is not minimal")
    // buckets in the output really are floor-aligned at the chosen width
    val misaligned = out
      .filter($"qi_bucket" =!= ($"v".cast("long") -
        pmod($"v".cast("long"), lit(w)))).count()
    assert(misaligned === 0L)
  }

  test("property: giniByGroup matches a local rank-identity reference on " +
      "random grouped values") {
    import graft.etl.Profile
    val grpGen: Gen[Seq[(String, Long)]] = for {
      n <- Gen.choose(1, 30)
      vs <- Gen.listOfN(n,
        Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0L, 50L)))
    } yield vs
    sample(grpGen, 10).filter(_.nonEmpty).zipWithIndex.foreach {
      case (rows, gi) =>
        val df = rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
          .toDF("g", "v", "id")
        val got = Profile.giniByGroup(df, "g", "v", "id").collect()
          .map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
        val exp = rows.groupBy(_._1).map { case (g, gs) =>
          val vs = gs.map(_._2).sorted
          val n = vs.size.toLong
          val tot = vs.sum
          val a = vs.zipWithIndex.map { case (v, i) => (i + 1L) * v }.sum
          val gini = if (n == 1 || tot == 0) 0L
            else Math.floorDiv((2 * a - (n + 1) * tot) * 1000000L, n * tot)
          g -> ((n, tot, gini))
        }
        assert(got === exp, s"case $gi: $rows")
    }
  }

  test("property: zipfAlphaByGroupFreqs matches a local Hill reference on " +
      "random frequency tables") {
    import graft.functions.PortableMath
    import graft.llm.CorpusStats
    val tblGen: Gen[Seq[(String, String, Long)]] = for {
      n <- Gen.choose(1, 25)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("g1", "g2")
        t <- Gen.choose(0, 15).map(i => s"t$i")
        f <- Gen.choose(1L, 40L)
      } yield (g, t, f))
    } yield rows.groupBy(r => (r._1, r._2))
      .map { case ((g, t), rs) => (g, t, rs.map(_._3).sum) }.toSeq
    val k = 4
    sample(tblGen, 10).filter(_.nonEmpty).zipWithIndex.foreach {
      case (rows, gi) =>
        val got = CorpusStats.zipfAlphaByGroupFreqs(
          rows.toDF("g", "tok", "f"), "g", "tok", "f", k)
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
        val exp = rows.groupBy(_._1).map { case (g, rs) =>
          val top = rs.map(r => (r._2, r._3))
            .sortBy { case (t, f) => (-f, t) }.take(k)
          val ke = top.size.toLong
          val fk = top.map(_._2).min
          val s = top.map { case (_, f) =>
            PortableMath.microLnSignedRef(f, fk) }.sum
          val hill = if (ke < 2 || s == 0L) 0L
            else (1000000000000L * ke) / s
          g -> ((ke, s, hill))
        }
        assert(got === exp, s"case $gi: $rows")
    }
  }
  // ---------------- r13 VERDICT ask #6: kernel property sweep ----------

  test("property: int8 kernels — interpreted eval ≡ codegen ≡ driver model " +
      "over random arrays (nulls at random positions, ±127 extremes, " +
      "zero length)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, IntegerType}
    import graft.functions.{IntCosineMicro, IntCosineSim, IntSqDistL2}
    val elemGen: Gen[Any] = Gen.frequency(
      (8, Gen.choose(-127, 127).map(x => x: Any)),
      (1, Gen.const(null: Any)),
      (1, Gen.oneOf(-127, 127).map(x => x: Any)))
    val pairGen: Gen[(Seq[Any], Seq[Any])] = for {
      n <- Gen.frequency((1, Gen.const(0)), (9, Gen.choose(1, 32)))
      a <- Gen.listOfN(n, elemGen)
      b <- Gen.listOfN(n, elemGen)
    } yield (a, b)
    val cases = sample(pairGen, 140)
    assert(cases.size >= 100, s"generator under-produced: ${cases.size}")
    assert(cases.exists(_._1.isEmpty), "no zero-length case generated")
    assert(cases.exists(c => c._1.contains(null) || c._2.contains(null)),
      "no null-element case generated")
    // independent driver model of the documented semantics
    def dots(a: Seq[Any], b: Seq[Any]): Option[(Long, Long, Long)] = {
      var dot = 0L; var na = 0L; var nb = 0L
      a.zip(b).foreach { case (x, y) =>
        if (x == null || y == null) return None
        val xv = x.asInstanceOf[Int].toLong
        val yv = y.asInstanceOf[Int].toLong
        dot += xv * yv; na += xv * xv; nb += yv * yv
      }
      Some((dot, na, nb))
    }
    def refCos(a: Seq[Any], b: Seq[Any]): Any = dots(a, b) match {
      case None => null
      case Some((d, na, nb)) =>
        if (na == 0L || nb == 0L) -2.0d
        else d.toDouble / math.sqrt((na * nb).toDouble)
    }
    def refMicro(a: Seq[Any], b: Seq[Any]): Any = dots(a, b) match {
      case None => null
      case Some((d, na, nb)) =>
        if (na == 0L || nb == 0L) -2000000L
        else math.floor(d.toDouble / math.sqrt((na * nb).toDouble)
          * 1000000.0d).toLong
    }
    def refSq(a: Seq[Any], b: Seq[Any]): Any = {
      var acc = 0L
      a.zip(b).foreach { case (x, y) =>
        if (x == null || y == null) return null
        val d = (x.asInstanceOf[Int] - y.asInstanceOf[Int]).toLong
        acc += d * d
      }
      acc
    }
    // engine path 1: whole-stage CODEGEN over a DataFrame column
    val df = cases.zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, a.map(x => Option(x).map(_.asInstanceOf[Int])),
        b.map(x => Option(x).map(_.asInstanceOf[Int])))
    }.toDF("i", "a", "b")
      // repartition barrier: ConvertToLocalRelation would otherwise fold
      // the whole projection at optimize time (interpreted), and the
      // point here is driving the GENERATED code path
      .repartition(2)
    val sel = df.select($"i",
      GraftFunctions.intCosineCol($"a", $"b").as("c"),
      GraftFunctions.intCosineMicroCol($"a", $"b").as("m"),
      GraftFunctions.intSqDistCol($"a", $"b").as("s"))
    val gen = sel.collect().map(r => r.getLong(0) ->
      ((if (r.isNullAt(1)) null else r.getDouble(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3)))).toMap
    // post-execution: the FINAL adaptive plan must show the projection
    // inside a WholeStageCodegen span (pre-execution AQE plans hide it)
    assert(sel.queryExecution.executedPlan.toString.contains("*("),
      "kernel column path fell out of whole-stage codegen")
    // engine path 2: INTERPRETED eval via Literal inputs
    def bits(v: Any): Any = v match {
      case d: Double => java.lang.Double.doubleToLongBits(d)
      case d: java.lang.Double => java.lang.Double.doubleToLongBits(d)
      case x => x
    }
    cases.zipWithIndex.foreach { case ((a, b), i) =>
      val al = Literal.create(a, ArrayType(IntegerType))
      val bl = Literal.create(b, ArrayType(IntegerType))
      val ic = IntCosineSim(al, bl).eval(null)
      val im = IntCosineMicro(al, bl).eval(null)
      val is = IntSqDistL2(al, bl).eval(null)
      assert(bits(ic) === bits(refCos(a, b)), s"case $i cos interp: $a $b")
      assert(im === refMicro(a, b), s"case $i micro interp: $a $b")
      assert(is === refSq(a, b), s"case $i sqdist interp: $a $b")
      val (gc, gm, gs) = gen(i.toLong)
      assert(bits(gc) === bits(refCos(a, b)), s"case $i cos codegen: $a $b")
      assert(gm === refMicro(a, b), s"case $i micro codegen: $a $b")
      assert(gs === refSq(a, b), s"case $i sqdist codegen: $a $b")
    }
    // length mismatch refuses loudly on BOTH paths
    val a1 = Literal.create(Seq[Any](1), ArrayType(IntegerType))
    val b2 = Literal.create(Seq[Any](1, 2), ArrayType(IntegerType))
    intercept[IllegalArgumentException] { IntCosineSim(a1, b2).eval(null) }
    intercept[Exception] {
      Seq((Seq(1), Seq(1, 2))).toDF("a", "b")
        .select(GraftFunctions.intSqDistCol($"a", $"b")).collect()
    }
  }

  test("property: double cosine kernel — interpreted ≡ codegen ≡ driver " +
      "model bit-for-bit (incl. NaN on zero norms)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    import graft.functions.CosineSim
    val elemGen: Gen[Any] = Gen.frequency(
      (9, Gen.choose(-10.0, 10.0).map(x => x: Any)),
      (1, Gen.const(null: Any)))
    val pairGen: Gen[(Seq[Any], Seq[Any])] = for {
      n <- Gen.frequency((1, Gen.const(0)), (9, Gen.choose(1, 24)))
      a <- Gen.listOfN(n, elemGen)
      b <- Gen.listOfN(n, elemGen)
    } yield (a, b)
    val cases = sample(pairGen, 110) :+
      ((Seq[Any](0.0, 0.0), Seq[Any](1.0, 2.0))) // zero norm → NaN, pinned
    // reference: the retired HOF semantics (left-to-right accumulation)
    def ref(a: Seq[Any], b: Seq[Any]): Any = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.zip(b).foreach { case (x, y) =>
        if (x == null || y == null) return null
        val xv = x.asInstanceOf[Double]; val yv = y.asInstanceOf[Double]
        dot += xv * yv; na += xv * xv; nb += yv * yv
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def bits(v: Any): Any = v match {
      case d: Double => java.lang.Double.doubleToLongBits(d)
      case d: java.lang.Double => java.lang.Double.doubleToLongBits(d)
      case x => x
    }
    val df = cases.zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, a.map(x => Option(x).map(_.asInstanceOf[Double])),
        b.map(x => Option(x).map(_.asInstanceOf[Double])))
    }.toDF("i", "a", "b").repartition(2) // see the int8 sweep's barrier
    val sel = df.select($"i", GraftFunctions.cosineCol($"a", $"b").as("c"))
    val gen = sel.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(sel.queryExecution.executedPlan.toString.contains("*("))
    cases.zipWithIndex.foreach { case ((a, b), i) =>
      val al = Literal.create(a, ArrayType(DoubleType))
      val bl = Literal.create(b, ArrayType(DoubleType))
      val interp = CosineSim(al, bl).eval(null)
      assert(bits(interp) === bits(ref(a, b)), s"case $i interp: $a $b")
      assert(bits(gen(i.toLong)) === bits(ref(a, b)), s"case $i codegen")
    }
  }

  // -------------- r14 VERDICT ask #7: bitext margin overflow sweep -----

  test("property: the bitext margin division — the EXACT production " +
      "expression vs a BigInt model over adversarial sims, sentinels " +
      "and max-k counts (the k ≤ 2000 overflow bound pinned)") {
    import graft.llm.Retrieval
    // the adversarial envelope of mineFromPairs' inputs: sim is a micro
    // cosine in [−10⁶, 10⁶] or the −2·10⁶ zero-norm sentinel; counts are
    // 1..k with k at the enforced 2000 ceiling; each sum is a top-cnt
    // neighborhood total, so |sum| ≤ cnt·2·10⁶ (sentinel-heavy
    // neighborhoods drive sums deeply negative — the keep filter must
    // drop those, never divide by them)
    val simGen: Gen[Long] = Gen.frequency(
      (6, Gen.choose(-1000000L, 1000000L)),
      (2, Gen.oneOf(1000000L, 999999L, 1L, 0L, -1L)),
      (2, Gen.const(-2000000L)))
    val caseGen: Gen[(Long, Long, Long, Long, Long)] = for {
      sim <- simGen
      cS <- Gen.frequency((3, Gen.choose(1L, 2000L)),
        (2, Gen.oneOf(1L, 2000L)))
      cT <- Gen.frequency((3, Gen.choose(1L, 2000L)),
        (2, Gen.oneOf(1L, 2000L)))
      sS <- Gen.choose(-2000000L * cS, 1000000L * cS)
      sT <- Gen.choose(-2000000L * cT, 1000000L * cT)
    } yield (sim, sS, cS, sT, cT)
    val cases = (sample(caseGen, 450) ++ Seq(
      // pinned extremes: the documented worst case (max sim, max k,
      // minimal positive denominator) and both just-outside-keep edges
      (1000000L, 1L, 2000L, 0L, 2000L),
      (1000000L, 2000000000L, 2000L, 2000000000L, 2000L),
      (1L, 1L, 1L, 0L, 1L),
      (0L, 5L, 1L, 5L, 1L), // sim = 0 → dropped
      (5L, -5L, 1L, 5L, 1L), // den = 0 → dropped
      (5L, -6L, 1L, 5L, 1L), // den < 0 → dropped
      (-2000000L, 1L, 2000L, 1L, 2000L))).distinct
    assert(cases.size >= 400, s"generator under-produced: ${cases.size}")
    // BigInt driver model of keep + margin — overflow-free by
    // construction, so any Long wrap in the engine expression shows up
    // as an exact-value mismatch
    def model(c: (Long, Long, Long, Long, Long)): Option[BigInt] = {
      val (sim, sS, cS, sT, cT) = c
      val den = BigInt(sS) * cT + BigInt(sT) * cS
      if (sim > 0 && den > 0)
        // Spark's BIGINT div truncates toward zero; both operands are
        // positive here (the keep filter), so BigInt / matches exactly
        Some(BigInt(2) * sim * cS * cT * 1000000 / den)
      else None
    }
    val df = cases.zipWithIndex.map { case ((sim, sS, cS, sT, cT), i) =>
      (i.toLong, sim, sS, cS, sT, cT)
    }.toDF("i", "sim", "__sumsrc_id", "__cntsrc_id",
        "__sumtgt_id", "__cnttgt_id")
      .repartition(2) // codegen barrier, as in the kernel sweeps above
    val got = df.filter(expr(Retrieval.MarginKeepExpr))
      .select($"i", expr(Retrieval.MarginMicroExpr).as("margin"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.zipWithIndex.foreach { case (c, i) =>
      model(c) match {
        case None => assert(!got.contains(i.toLong),
          s"case $i $c: kept a row the keep filter must drop")
        case Some(m) =>
          assert(m.isValidLong,
            s"case $i $c: model margin $m exceeds Long — the k ≤ 2000 " +
              "bound is wrong")
          assert(got.get(i.toLong) === Some(m.toLong),
            s"case $i $c: engine ${got.get(i.toLong)} vs model $m")
      }
    }
    // the bound is TIGHT at the contract edge: numerator at k = 2000 is
    // 2·10⁶·2000²·10⁶ = 8·10¹⁸ < 2⁶³ ≈ 9.22·10¹⁸, but k = 2200 would
    // overflow — the guard's ceiling is load-bearing, not decorative
    assert(BigInt(2) * 1000000L * 2000L * 2000L * 1000000L <
      BigInt(Long.MaxValue))
    assert(BigInt(2) * 1000000L * 2200L * 2200L * 1000000L >
      BigInt(Long.MaxValue))
  }
}
