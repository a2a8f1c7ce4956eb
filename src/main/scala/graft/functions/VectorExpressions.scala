package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

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
    extends BinaryExpression with ImplicitCastInputTypes {

  // ImplicitCastInputTypes (not a bare type check): the retired HOF form
  // cast elements to DOUBLE implicitly, so SQL callers passing
  // array<float>/array<int> keep working — the analyzer inserts the same
  // element cast; exact array<double> inputs get no cast node at all.
  // (Inferred return type via TypeShim: AbstractDataType is private[sql].)
  override def inputTypes = org.apache.spark.sql.graftshim.TypeShim.arrayDoublePair
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

/** Shared base for the int8-vector kernels: array<int> × array<int> input
  * checks and the fused BIGINT dot/norm loop, with the [[CosineSim]]
  * null/mismatch stance (null element → null result, length mismatch →
  * loud IllegalArgumentException — dims are uniform by construction, and
  * a silent null would hide a broken quantization upstream).
  */
sealed trait IntVecKernel extends ImplicitCastInputTypes { self: BinaryExpression =>
  // ImplicitCastInputTypes over a TypeCollection(array<int>, array<bigint>)
  // (r13 ADVICE, tightened by r14 ADVICE): the retired Column/HOF forms
  // widened elements to BIGINT losslessly, so SQL callers passing any
  // integral array kept working; the first cut of this trait coerced
  // everything to array<int>, which silently WRAPPED bigint elements
  // outside Int32 — a silent-wrong-answer path on the public SQL
  // surface. The collection fixes that: array<int> matches member 1 and
  // array<bigint> matches member 2, each CAST-FREE (the kernel reads the
  // physical element width directly, so big values accumulate exactly
  // like the retired BIGINT HOF), while tinyint/smallint still widen
  // implicitly to array<int> — lossless. Committed engine plans are
  // byte-identical: every engine path feeds exact array<int>.
  // (Inferred return type via TypeShim: AbstractDataType is private[sql].)
  override def inputTypes =
    org.apache.spark.sql.graftshim.TypeShim.arrayIntOrLongPair
  override def nullable: Boolean = true
  override def foldable: Boolean = left.foldable && right.foldable

  /** Physical element width of a side, resolved from the static type —
    * ArrayData accessors are not polymorphic across int/long storage. */
  protected final def longElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** (dot, na, nb) over the two int arrays, or null-marker on a null
    * element. Exact BIGINT accumulation — no overflow at int8 × 2¹⁵ dims
    * (bigint inputs inherit the retired HOF's plain BIGINT arithmetic,
    * including its wrap beyond ±2⁶³ products — the int8 contract never
    * gets near it). */
  protected final def dotNorms(a: Any, b: Any): (Long, Long, Long, Boolean) = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xl = longElems(left); val yl = longElems(right)
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: array lengths differ ($n vs ${y.numElements()})")
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return (0L, 0L, 0L, true)
      val xv = if (xl) x.getLong(i) else x.getInt(i).toLong
      val yv = if (yl) y.getLong(i) else y.getInt(i).toLong
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    (dot, na, nb, false)
  }

  /** Width-correct element accessor for generated code. */
  protected final def genElem(e: Expression, arr: String,
      idx: String): String =
    if (longElems(e)) s"$arr.getLong($idx)" else s"(long) $arr.getInt($idx)"

  /** Shared codegen prelude: declares `<p>dot/<p>na/<p>nb` longs. */
  protected final def genDotNorms(ctx: CodegenContext, ev: ExprCode,
      a: String, b: String, p: String): String = {
    s"""
       |int ${p}n = $a.numElements();
       |if (${p}n != $b.numElements()) {
       |  throw new IllegalArgumentException(
       |    "$prettyName: array lengths differ (" + ${p}n + " vs " + $b.numElements() + ")");
       |}
       |long ${p}dot = 0L, ${p}na = 0L, ${p}nb = 0L;
       |for (int ${p}i = 0; ${p}i < ${p}n; ${p}i++) {
       |  if ($a.isNullAt(${p}i) || $b.isNullAt(${p}i)) { ${ev.isNull} = true; break; }
       |  long ${p}x = ${genElem(left, a, s"${p}i")};
       |  long ${p}y = ${genElem(right, b, s"${p}i")};
       |  ${p}dot += ${p}x * ${p}y; ${p}na += ${p}x * ${p}x; ${p}nb += ${p}y * ${p}y;
       |}
     """.stripMargin
  }
}

/** Symmetric per-vector int8 quantization over array<double> —
  * `q_i = floor(x_i · 127 / amax + 0.5)` with `amax = max |x_i|`, all-zero
  * → zeros — EXACTLY the arithmetic of the Column combinator it replaces
  * (`array_max(transform(abs))` + two `transform`s, r17: three chained
  * higher-order functions are INTERPRETED and this projection runs per
  * corpus row on every ANN path) and of the retired `q8Of` mapPartitions
  * kernel (which additionally paid a serialize/deserialize boundary that
  * broke whole-stage codegen around the scan). Semantics preserved
  * bit-for-bit (FunctionsSpec pins both equalities):
  *   - null array → null;
  *   - amax skips null elements (array_max semantics, NaN greatest);
  *   - amax = 0 → ALL positions 0 (the zero-branch `transform(_ => 0)`
  *     maps null elements too);
  *   - otherwise null elements stay null, values are
  *     `(int) floor(x·127/amax + 0.5)` — the same IEEE double ops, with
  *     Spark's non-ANSI double→int truncation.
  */
case class QuantizeInt8(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = org.apache.spark.sql.graftshim.TypeShim.arrayDoubleSingle
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def nullable: Boolean = true
  override def foldable: Boolean = child.foldable
  override def prettyName: String = "graft_quantize_int8"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var has = false
    var anyNull = false
    var amax = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) anyNull = true
      else {
        val v = math.abs(x.getDouble(i))
        if (!has) { amax = v; has = true }
        else if (v > amax || (v.isNaN && !amax.isNaN)) amax = v
      }
      i += 1
    }
    // the common (no null elements) case returns a PRIMITIVE-backed
    // array: a fused consumer (e.g. the cosine kernel inside the same
    // whole-stage-codegen span) then reads ints directly, where a boxed
    // GenericArrayData would unbox per element per access — measured as
    // a +1.4 s regression on ret_bitext_mine's pair stage, which reads
    // each stream row's vector once per broadcast-side row
    if (!anyNull) {
      val out = new Array[Int](n)
      if (!(has && amax == 0.0)) {
        i = 0
        while (i < n) {
          out(i) = math.floor(x.getDouble(i) * 127.0 / amax + 0.5).toInt
          i += 1
        }
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      if (has && amax == 0.0) {
        i = 0; while (i < n) { out(i) = 0; i += 1 }
      } else {
        i = 0
        while (i < n) {
          if (!x.isNullAt(i))
            out(i) = math.floor(x.getDouble(i) * 127.0 / amax + 0.5).toInt
          i += 1
        }
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.freshName("qz")
      s"""
         |int ${p}n = $a.numElements();
         |boolean ${p}has = false;
         |boolean ${p}anyNull = false;
         |double ${p}amax = 0.0D;
         |for (int ${p}i = 0; ${p}i < ${p}n; ${p}i++) {
         |  if ($a.isNullAt(${p}i)) { ${p}anyNull = true; }
         |  else {
         |    double ${p}v = java.lang.Math.abs($a.getDouble(${p}i));
         |    if (!${p}has) { ${p}amax = ${p}v; ${p}has = true; }
         |    else if (${p}v > ${p}amax ||
         |        (java.lang.Double.isNaN(${p}v) &&
         |            !java.lang.Double.isNaN(${p}amax))) ${p}amax = ${p}v;
         |  }
         |}
         |if (!${p}anyNull) {
         |  int[] ${p}prim = new int[${p}n];
         |  if (!(${p}has && ${p}amax == 0.0D)) {
         |    for (int ${p}i = 0; ${p}i < ${p}n; ${p}i++) {
         |      ${p}prim[${p}i] = (int) java.lang.Math
         |        .floor($a.getDouble(${p}i) * 127.0D / ${p}amax + 0.5D);
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray(${p}prim);
         |} else {
         |  Object[] ${p}out = new Object[${p}n];
         |  if (${p}has && ${p}amax == 0.0D) {
         |    for (int ${p}i = 0; ${p}i < ${p}n; ${p}i++) {
         |      ${p}out[${p}i] = java.lang.Integer.valueOf(0);
         |    }
         |  } else {
         |    for (int ${p}i = 0; ${p}i < ${p}n; ${p}i++) {
         |      if (!$a.isNullAt(${p}i)) {
         |        ${p}out[${p}i] = java.lang.Integer.valueOf((int) java.lang.Math
         |          .floor($a.getDouble(${p}i) * 127.0D / ${p}amax + 0.5D));
         |      }
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(${p}out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact quantized cosine over array<int> (int8-quantized) vectors —
  * BIGINT dot/norms, ONE correctly-rounded IEEE division over one
  * correctly-rounded sqrt (`CAST(dot AS DOUBLE) / sqrt(CAST(na*nb AS
  * DOUBLE))`), −2.0 on a zero norm: bit-identical to the documented
  * oracle semantics the interpreted `aggregate(zip_with(...))` form
  * computed, now inside whole-stage codegen.
  */
case class IntCosineSim(left: Expression, right: Expression)
    extends BinaryExpression with IntVecKernel {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_int_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (dot, na, nb, isNull) = dotNorms(a, b)
    if (isNull) null
    else if (na == 0L || nb == 0L) -2.0d
    else dot.toDouble / math.sqrt((na * nb).toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val p = ctx.freshName("ic")
      s"""
         |${genDotNorms(ctx, ev, a, b, p)}
         |if (!${ev.isNull}) {
         |  ${ev.value} = (${p}na == 0L || ${p}nb == 0L) ? -2.0D
         |    : (double) ${p}dot / java.lang.Math.sqrt((double) (${p}na * ${p}nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `⌊cosine · 10⁶⌋` over array<int> vectors as BIGINT, −2000000 on a zero
  * norm — the engine-exact micro similarity of the MMR / SemDeDup family
  * (`floor(CAST(dot AS DOUBLE) / sqrt(CAST(na·nb AS DOUBLE)) · 10⁶)`,
  * the floor of an exactly-rounded IEEE double on exact inputs, so any
  * engine replays it bit-identically). Same values as the interpreted
  * HOF chain it replaces, fused into whole-stage codegen.
  */
case class IntCosineMicro(left: Expression, right: Expression)
    extends BinaryExpression with IntVecKernel {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_int_cosine_micro"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (dot, na, nb, isNull) = dotNorms(a, b)
    if (isNull) null
    else if (na == 0L || nb == 0L) -2000000L
    else math.floor(dot.toDouble / math.sqrt((na * nb).toDouble)
      * 1000000.0d).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val p = ctx.freshName("im")
      s"""
         |${genDotNorms(ctx, ev, a, b, p)}
         |if (!${ev.isNull}) {
         |  ${ev.value} = (${p}na == 0L || ${p}nb == 0L) ? -2000000L
         |    : (long) java.lang.Math.floor((double) ${p}dot
         |        / java.lang.Math.sqrt((double) (${p}na * ${p}nb)) * 1000000.0D);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Exact BIGINT squared L2 distance `Σ(a−b)²` over array<int> vectors —
  * the k-means assignment kernel (same values as the interpreted
  * `aggregate(zip_with(...))` form it replaces).
  */
case class IntSqDistL2(left: Expression, right: Expression)
    extends BinaryExpression with IntVecKernel {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_int_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: array lengths differ ($n vs ${y.numElements()})")
    val xl = longElems(left); val yl = longElems(right)
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = (if (xl) x.getLong(i) else x.getInt(i).toLong) -
        (if (yl) y.getLong(i) else y.getInt(i).toLong)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val p = ctx.freshName("sq")
      s"""
         |int ${p}n = $a.numElements();
         |if (${p}n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: array lengths differ (" + ${p}n + " vs " + $b.numElements() + ")");
         |}
         |long ${p}acc = 0L;
         |for (int ${p}i = 0; ${p}i < ${p}n; ${p}i++) {
         |  if ($a.isNullAt(${p}i) || $b.isNullAt(${p}i)) { ${ev.isNull} = true; break; }
         |  long ${p}d = ${genElem(left, a, s"${p}i")} - ${genElem(right, b, s"${p}i")};
         |  ${p}acc += ${p}d * ${p}d;
         |}
         |if (!${ev.isNull}) { ${ev.value} = ${p}acc; }
       """.stripMargin
    })

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
    // native codegen'd quantizer (r17) — the Column-combinator form it
    // replaces chained three interpreted HOFs per corpus row
    "graft_quantize_int8" -> (es => QuantizeInt8(es(0))),
    // exact quantized int8-vector kernels (r11 engine-exact ANN
    // arithmetic; native codegen'd since r13 — the interpreted
    // aggregate(zip_with(...)) forms they replace produced identical
    // values but paid boxed per-element eval on corpus-sized paths)
    "graft_int_cosine" -> (es => IntCosineSim(es(0), es(1))),
    "graft_int_cosine_micro" -> (es => IntCosineMicro(es(0), es(1))),
    "graft_int_sqdist" -> (es => IntSqDistL2(es(0), es(1))))

  def register(spark: SparkSession): Unit = all.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
  }

  /** Column-API forms (require register(spark) once per session). */
  def graftCosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
  def graftHamming64(a: Column, b: Column): Column = call_function("graft_hamming64", a, b)
  def graftBloomContains(bloom: Column, key: Column): Column =
    call_function("graft_bloom_contains", bloom, key)

  /** Registration-free Column forms of the int8 kernels (direct
    * expression construction — usable inside library code that never
    * touches the SQL function registry). */
  private def direct(e: Expression): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(e)
  private def ex(c: Column): Expression =
    org.apache.spark.sql.graftshim.ColumnBridge.expression(c)
  def cosineCol(a: Column, b: Column): Column = direct(CosineSim(ex(a), ex(b)))
  def quantizeInt8Col(v: Column): Column = direct(QuantizeInt8(ex(v)))
  def intCosineCol(a: Column, b: Column): Column = direct(IntCosineSim(ex(a), ex(b)))
  def intCosineMicroCol(a: Column, b: Column): Column = direct(IntCosineMicro(ex(a), ex(b)))
  def intSqDistCol(a: Column, b: Column): Column = direct(IntSqDistL2(ex(a), ex(b)))
}

/** `spark.sql.extensions`-loadable function injection. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
}
