package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for the vector hot path.
  *
  * Spark's higher-order array functions are interpreted (no codegen), so a
  * 64-dim cosine via `aggregate(zip_with(...))` pays boxed per-element eval.
  * These expressions generate a primitive Java loop inside whole-stage
  * codegen — the preferred shape for scalar kernels per the project design
  * rules (custom `Expression` with `doGenCode` beats a UDF, which beats
  * interpreted HOFs).
  */

/** cosine(a, b) over array<double> columns, computed in one fused loop with
  * left-to-right accumulation (bit-compatible with the documented oracle
  * semantics in graft.llm.Similarity).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_cosine requires array<double> inputs, got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null array elements → null result
  // literal inputs fold at plan time via Catalyst's own ConstantFolding —
  // no custom optimizer rule needed
  override def foldable: Boolean = left.foldable && right.foldable
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"graft_cosine: array lengths differ ($n vs ${y.numElements()})")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // match HOF null semantics
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_cosine: array lengths differ (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** hamming(a, b) over two int64 fingerprints (simhash64 distance). */
case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_hamming64 requires bigint inputs, got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = LongType
  override def foldable: Boolean = left.foldable && right.foldable
  override def prettyName: String = "graft_hamming64"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long]).toLong

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (long) java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Registration: per-session temp functions plus a `SparkSessionExtensions`
  * hook for `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {

  // Column-helper bridge: the llm surface is written as Column combinators
  // over codegen'd built-ins; ExpressionUtils round-trips them so delegated-
  // SQL users (the C7 Athena-replacement path) reach the same expression
  // DAGs by name — identical plans, identical hashes, no UDFs.
  private def colFn(f: Seq[Column] => Column): Seq[Expression] => Expression =
    es => org.apache.spark.sql.graftshim.ColumnBridge.expression(
      f(es.map(org.apache.spark.sql.graftshim.ColumnBridge.column)))

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> (es => CosineSim(es(0), es(1))),
    "graft_hamming64" -> (es => Hamming64(es(0), es(1))),
    // Spark's own runtime-filter predicate (codegen'd), exposed as a
    // callable function: arg0 = a constant BINARY bloom sketch in
    // `BloomFilter.writeTo` format, arg1 = a BIGINT key (e.g. xxhash64).
    // Powers graft.llm.Dedup.dropIfInReference's map-side pre-filter.
    "graft_bloom_contains" -> (es =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        es(0), es(1))),
    // ---- the LLM-curation scalar surface, SQL-visible ----
    "graft_normalize" -> colFn { case Seq(c) => graft.llm.TextOps.normalize(c) },
    "graft_tokens" -> colFn { case Seq(c) => graft.llm.TextOps.tokens(c) },
    "graft_token_count" -> colFn { case Seq(c) => graft.llm.TextOps.tokenCount(c) },
    "graft_bpe_token_count" -> colFn { case Seq(c) =>
      graft.llm.TextOps.bpeTokenCount(c) },
    "graft_quality" -> colFn { case Seq(c) => graft.llm.TextOps.qualityScore(c) },
    "graft_quantize_int8" -> colFn { case Seq(c) =>
      graft.llm.Similarity.quantizeInt8(c) },
    // exact quantized cosine (r11 engine-exact ANN arithmetic): the
    // SQL-frontend form of Similarity.intCosine — BIGINT dot/norms over
    // int8 vectors, one exactly-rounded IEEE division, −2.0 on zero norm
    "graft_int_cosine" -> colFn { case Seq(a, b) =>
      graft.llm.Similarity.intCosine(a, b) })

  def register(spark: SparkSession): Unit = all.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
  }

  /** Column-API forms (require register(spark) once per session). */
  def graftCosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
  def graftHamming64(a: Column, b: Column): Column = call_function("graft_hamming64", a, b)
  def graftBloomContains(bloom: Column, key: Column): Column =
    call_function("graft_bloom_contains", bloom, key)
}

/** `spark.sql.extensions`-loadable function injection. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
}
