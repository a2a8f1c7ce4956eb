package graft

import graft.functions.GraftFunctions
import graft.llm.Similarity
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("CosineSim expression matches the HOF cosine bit-for-bit") {
    GraftFunctions.register(spark)
    val e = Tables(spark, sf0001).embeddings.limit(100)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id")).limit(500)
      .select(col("a.v").as("va"), col("b.v").as("vb"))
    // the retired interpreted Similarity.cosine formula, reproduced
    // VERBATIM as the reference (Similarity.cosine now delegates to the
    // kernel, so pinning against it would compare the kernel to itself)
    def hofDot(x: org.apache.spark.sql.Column,
        y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val hofCos = hofDot($"va", $"vb") /
      (sqrt(hofDot($"va", $"va")) * sqrt(hofDot($"vb", $"vb")))
    val diff = pairs.select(
        (GraftFunctions.graftCosine($"va", $"vb") - hofCos).as("d"))
      .agg(max(abs($"d"))).head().getDouble(0)
    assert(diff === 0.0) // identical accumulation order → identical doubles
    // and the delegating Similarity.cosine IS the kernel now
    val dz = pairs.select(
        (Similarity.cosine($"va", $"vb") -
          GraftFunctions.graftCosine($"va", $"vb")).as("d"))
      .agg(max(abs($"d"))).head().getDouble(0)
    assert(dz === 0.0)
  }

  test("graft functions are SQL-visible after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c, " +
        "graft_hamming64(7L, 1L) AS h").head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getLong(1) === 2L)
  }

  test("GraftExtensions builders evaluate standalone (injection hook wiring)") {
    new graft.functions.GraftExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions) // must not throw
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val ham = graft.functions.GraftFunctions.all.toMap
      .apply("graft_hamming64")(Seq(Literal(255L), Literal(0L)))
    assert(ham.eval(null) === 8L)
    val arr = Literal.create(Array(3.0, 4.0), ArrayType(DoubleType))
    val cos = graft.functions.GraftFunctions.all.toMap
      .apply("graft_cosine")(Seq(arr, arr))
    assert(cos.eval(null) === 1.0)
  }

  test("literal graft_cosine calls constant-fold at plan time") {
    GraftFunctions.register(spark)
    val plan = spark.sql(
      "SELECT graft_hamming64(7L, 1L) AS h FROM range(3)")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("2 AS h"), plan) // folded to a literal, no per-row eval
  }

  test("CosineSim participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    val e = Tables(spark, sf0001).embeddings.limit(10)
      .select($"embedding".cast("array<double>").as("v"))
    val plan = e.select(GraftFunctions.graftCosine($"v", $"v").as("c"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_cosine"))
  }

  test("bridged llm scalar functions equal their Column-API originals") {
    GraftFunctions.register(spark)
    val docs = Seq((1L, "The QUICK  brown fox, and the dog!"),
      (2L, "a b c d e f g h i j k l m n o p"), (3L, "  x1 y2!  "))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("bridge_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_normalize(text) AS n,
        |  graft_token_count(text) AS tc, graft_bpe_token_count(text) AS bc,
        |  graft_quality(text) AS q, size(graft_tokens(text)) AS nt
        |FROM bridge_docs""".stripMargin)
    val viaCol = docs.select($"doc_id",
      graft.llm.TextOps.normalize($"text").as("n"),
      graft.llm.TextOps.tokenCount($"text").as("tc"),
      graft.llm.TextOps.bpeTokenCount($"text").as("bc"),
      graft.llm.TextOps.qualityScore($"text").as("q"),
      size(graft.llm.TextOps.tokens($"text")).as("nt"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
    // int8 quantization bridges too (array-returning)
    val qzSql = spark.sql(
      "SELECT graft_quantize_int8(array(1.0d, -1.0d, 0.5d)) AS q").collect().toSeq
    val qzCol = spark.range(1).select(graft.llm.Similarity
      .quantizeInt8(typedLit(Seq(1.0, -1.0, 0.5))).as("q")).collect().toSeq
    assert(qzSql === qzCol)
    // exact quantized cosine: identical vectors score exactly 1.0 (the
    // perfect-square sqrt is exact), zero-norm scores the −2.0 sentinel,
    // and a hand case matches the driver-side arithmetic
    val ic = spark.sql(
      """SELECT graft_int_cosine(array(3, 4), array(3, 4)) AS same,
        |  graft_int_cosine(array(0, 0), array(3, 4)) AS zero,
        |  graft_int_cosine(array(1, 0), array(0, 1)) AS orth""".stripMargin)
      .collect().head
    assert(ic.getDouble(0) === 1.0)
    assert(ic.getDouble(1) === -2.0)
    assert(ic.getDouble(2) === 0.0)
  }

  test("int8 kernels match the interpreted HOF forms bit-for-bit") {
    GraftFunctions.register(spark)
    // the r13 native expressions replaced aggregate(zip_with(...)) chains;
    // this is the regression pin that they compute the IDENTICAL values —
    // the old HOF formulas are reproduced verbatim as the reference
    val q8 = Tables(spark, sf0001).embeddings.limit(100)
      .select($"vec_id",
        Similarity.quantizeInt8($"embedding".cast("array<double>")).as("q"))
    val pairs = q8.as("a").join(q8.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .limit(800).select(col("a.q").as("qa"), col("b.q").as("qb"))
      .localCheckpoint()
    val hofCos = expr("CASE WHEN aggregate(qa, CAST(0 AS BIGINT)," +
      " (a, x) -> a + CAST(x AS BIGINT) * x) = 0 OR" +
      " aggregate(qb, CAST(0 AS BIGINT), (a, x) -> a + CAST(x AS BIGINT) * x) = 0" +
      " THEN CAST(-2.0 AS DOUBLE) ELSE" +
      " CAST(aggregate(zip_with(qa, qb, (x, y) -> CAST(x AS BIGINT) * y)," +
      " CAST(0 AS BIGINT), (a, x) -> a + x) AS DOUBLE) /" +
      " sqrt(CAST(aggregate(qa, CAST(0 AS BIGINT), (a, x) -> a + CAST(x AS BIGINT) * x) *" +
      " aggregate(qb, CAST(0 AS BIGINT), (a, x) -> a + CAST(x AS BIGINT) * x) AS DOUBLE)) END")
    val cosDiff = pairs
      .select((Similarity.intCosine($"qa", $"qb") - hofCos).as("d"))
      .agg(max(abs($"d"))).head().getDouble(0)
    assert(cosDiff === 0.0)
    val hofMicro = expr("CASE WHEN aggregate(qa, CAST(0 AS BIGINT)," +
      " (a, x) -> a + CAST(x AS BIGINT) * x) = 0 OR" +
      " aggregate(qb, CAST(0 AS BIGINT), (a, x) -> a + CAST(x AS BIGINT) * x) = 0" +
      " THEN CAST(-2000000 AS BIGINT) ELSE" +
      " CAST(floor(CAST(aggregate(zip_with(qa, qb, (x, y) -> CAST(x AS BIGINT) * y)," +
      " CAST(0 AS BIGINT), (a, x) -> a + x) AS DOUBLE) /" +
      " sqrt(CAST(aggregate(qa, CAST(0 AS BIGINT), (a, x) -> a + CAST(x AS BIGINT) * x) *" +
      " aggregate(qb, CAST(0 AS BIGINT), (a, x) -> a + CAST(x AS BIGINT) * x) AS DOUBLE)) *" +
      " CAST(1000000 AS DOUBLE)) AS BIGINT) END")
    val microBad = pairs
      .filter(Similarity.intCosineMicro($"qa", $"qb") =!= hofMicro).count()
    assert(microBad === 0L)
    val hofSq = expr("aggregate(zip_with(qa, qb," +
      " (a, b) -> CAST(a - b AS BIGINT) * (a - b)), CAST(0 AS BIGINT)," +
      " (acc, x) -> acc + x)")
    val sqBad = pairs
      .filter(GraftFunctions.intSqDistCol($"qa", $"qb") =!= hofSq).count()
    assert(sqBad === 0L)
  }

  test("QuantizeInt8 kernel matches the retired HOF combinator bit-for-bit") {
    GraftFunctions.register(spark)
    // the r17 native expression replaced the Column combinator
    // (array_max(transform(abs)) + two transforms); this is the regression
    // pin that it computes IDENTICAL values — the old formula is
    // reproduced verbatim as the reference (Similarity.quantizeInt8 now
    // delegates to the kernel, so pinning against it would compare the
    // kernel to itself)
    def hofQuantize(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val amax = array_max(transform(v, x => abs(x.cast("double"))))
      when(amax === 0.0, transform(v, _ => lit(0)))
        .otherwise(transform(v,
          x => floor(x.cast("double") * 127.0 / amax + 0.5).cast("int")))
    }
    // real corpus vectors
    val e = Tables(spark, sf0001).embeddings
      .select($"embedding".cast("array<double>").as("v"))
    val bad = e.filter(!(Similarity.quantizeInt8($"v") <=> hofQuantize($"v")))
      .count()
    assert(bad === 0L)
    // adversarial shapes: all-zero, negatives, round-half boundaries,
    // single element, empty array, null element, null array
    val edge = Seq(
      Seq(0.0, 0.0, 0.0), Seq(-1.0, 2.0, -4.0), Seq(0.5, -0.5, 1.0),
      Seq(3.7), Seq.empty[Double], null.asInstanceOf[Seq[Double]])
      .toDF("v")
      .unionByName(spark.sql(
        "SELECT array(1.0d, CAST(NULL AS DOUBLE), -2.0d) AS v")
        .unionByName(spark.sql(
          "SELECT array(CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)) AS v")))
    val badEdge = edge
      .filter(!(Similarity.quantizeInt8($"v") <=> hofQuantize($"v")))
      .count()
    assert(badEdge === 0L)
    // the kernel runs inside whole-stage codegen on a column path
    val plan = e.select(Similarity.quantizeInt8($"v").as("q"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_quantize_int8"), plan)
    // and its generated Java actually COMPILES — UnsafeProjection.create
    // silently falls back to interpreted eval on a codegen error (the
    // plan string above cannot catch that), while a direct generate()
    // throws. Regression pin for the r17 stripMargin line-leading-`||`
    // codegen bug, which shipped correct values at interpreted speed.
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
      .generate(Seq(graft.functions.QuantizeInt8(
        BoundReference(0, ArrayType(DoubleType), nullable = true))),
        subexpressionEliminationEnabled = false)
  }

  test("int8 kernels: sentinels, nulls, mismatches, codegen, SQL registry") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_int_cosine_micro(array(3, 4), array(3, 4)) AS same,
        |  graft_int_cosine_micro(array(0, 0), array(3, 4)) AS zero,
        |  graft_int_sqdist(array(1, 2, 3), array(4, 6, 8)) AS sq,
        |  graft_int_cosine_micro(array(1, CAST(NULL AS INT)), array(1, 2)) AS ne
        |""".stripMargin).collect().head
    assert(r.getLong(0) === 1000000L)
    assert(r.getLong(1) === -2000000L)
    assert(r.getLong(2) === (9L + 16L + 25L))
    assert(r.isNullAt(3)) // null element → null, the HOF stance
    // length mismatch refuses loudly (silent nulls would hide a broken
    // quantization upstream)
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_int_cosine_micro(array(1), array(1, 2))")
        .collect()
    }
    assert(ex.getMessage != null)
    // the kernels run inside whole-stage codegen on a column path
    val q8 = Tables(spark, sf0001).embeddings.limit(10)
      .select(Similarity.quantizeInt8($"embedding".cast("array<double>")).as("q"))
    val plan = q8.select(Similarity.intCosineMicro($"q", $"q").as("m"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
  }

  test("kernels implicitly coerce numeric element types (the retired HOF contract)") {
    GraftFunctions.register(spark)
    // the retired Column/HOF forms cast elements to BIGINT, so SQL callers
    // passing array<tinyint>/array<smallint>/array<bigint> worked; the
    // native kernels must keep that public surface (r13 ADVICE) — the
    // analyzer inserts the element cast via ImplicitCastInputTypes
    val r = spark.sql(
      """SELECT
        |  graft_int_cosine(CAST(array(3, 4) AS ARRAY<TINYINT>),
        |                   CAST(array(3, 4) AS ARRAY<TINYINT>)) AS tiny,
        |  graft_int_cosine(CAST(array(3, 4) AS ARRAY<BIGINT>),
        |                   CAST(array(3, 4) AS ARRAY<SMALLINT>)) AS mixed,
        |  graft_int_sqdist(CAST(array(1, 2) AS ARRAY<BIGINT>),
        |                   CAST(array(4, 6) AS ARRAY<BIGINT>)) AS sq,
        |  graft_cosine(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |               CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS fcos
        |""".stripMargin).collect().head
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 1.0)
    assert(r.getLong(2) === (9L + 16L))
    assert(r.getDouble(3) === 1.0)
    // non-numeric element types still refuse at analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_int_cosine(array('a'), array('b'))").collect()
    }
  }

  test("array<bigint> elements outside Int32 are LOSSLESS in the int8 " +
      "kernels (r14 ADVICE: no silent narrowing wrap on the SQL surface)") {
    GraftFunctions.register(spark)
    // 2.2·10⁹ does not fit Int32: the first kernel cut coerced bigint
    // arrays to array<int>, wrapping it to −2 094 967 296 and returning
    // a confidently wrong (negative!) similarity. The TypeCollection
    // signature reads the longs directly: cos([2.2e9],[1]) = 1 exactly
    // (dot = 2.2e9, √(na·nb) = √(4.84e18) = 2.2e9 — a perfect square),
    // interpreted AND codegen (the repartition barrier forces the
    // generated path). One big side only: na·nb must stay inside BIGINT,
    // the same arithmetic envelope the retired BIGINT HOF had.
    val sql =
      """SELECT
        |  graft_int_cosine(CAST(array(2200000000) AS ARRAY<BIGINT>),
        |                   CAST(array(1) AS ARRAY<BIGINT>)) AS c,
        |  graft_int_cosine_micro(CAST(array(2200000000) AS ARRAY<BIGINT>),
        |                         CAST(array(1) AS ARRAY<BIGINT>)) AS m,
        |  graft_int_sqdist(CAST(array(3000000000) AS ARRAY<BIGINT>),
        |                   CAST(array(0) AS ARRAY<BIGINT>)) AS s
        |""".stripMargin
    val interp = spark.sql(sql).collect().head
    assert(interp.getDouble(0) === 1.0)
    assert(interp.getLong(1) === 1000000L)
    assert(interp.getLong(2) === 9000000000000000000L)
    val gen = spark.sql(s"SELECT * FROM VALUES (1) AS t(i)")
      .repartition(2).selectExpr(
        "graft_int_cosine(CAST(array(2200000000) AS ARRAY<BIGINT>)," +
          " CAST(array(1) AS ARRAY<BIGINT>)) AS c",
        "graft_int_sqdist(CAST(array(3000000000) AS ARRAY<BIGINT>)," +
          " CAST(array(0) AS ARRAY<BIGINT>)) AS s")
      .collect().head
    assert(gen.getDouble(0) === 1.0)
    assert(gen.getLong(1) === 9000000000000000000L)
    // and the engine-exact array<int> path keeps its cast-free plan: a
    // kernel call over int arrays must not grow a cast node
    val plan = spark.sql(
      "SELECT graft_int_cosine(CAST(array(3, 4) AS ARRAY<INT>), " +
        "CAST(array(3, 4) AS ARRAY<INT>)) AS c")
      .queryExecution.analyzed.toString
    // an analyzer-inserted coercion would show as a DOUBLE cast wrapping
    // the explicit one
    assert(!plan.toLowerCase.contains("cast(cast("), plan)
  }
}
