package graft.functions

/** Engine-portable fixed-point math: SQL expression generators whose results
  * are bit-identical on any engine that implements IEEE 754 basic operations
  * with correct rounding (Spark/JVM, DuckDB, Postgres, ...).
  *
  * The motivating case is [[microLnStages]]: `floor(ln(a/b)·10⁶)` as used by
  * the bigram LM quality score. A bare `ln` is NOT portable — JVM `Math.log`
  * and libm `log` may differ in the last ulp, and with enough distinct
  * probabilities some land within 1 ulp of a `floor` boundary, flipping the
  * fixed-point value between engines (observed in practice at sf0.01:
  * ~380k distinct bigram probabilities produced one such flip). The fix is
  * to compute the log from operations that ARE correctly rounded everywhere:
  *
  *  1. integer argument reduction — find e with `m = (a·2^e)/b ∈ [1, 2)`
  *     using only `length(bin(x))` (exact integer bit length) and left
  *     shifts; the one division `m = CAST(a·2^e AS DOUBLE)/CAST(b AS DOUBLE)`
  *     divides two exactly-representable integers (requires `b < 2^52`) and
  *     IEEE division is correctly rounded, so every engine gets the same
  *     double `m`;
  *  2. `ln(m) = 2·atanh(s)` with `s = (m-1)/(m+1) ∈ [0, 1/3)`, evaluated as
  *     a fixed 11-term Horner polynomial in `s²` whose coefficients are
  *     written as `CAST(1 AS DOUBLE)/k` (correctly-rounded divisions, not
  *     decimal literals that dialects may type differently);
  *  3. `ln(a/b) = ln(m) − e·ln2` with ln2 the double literal parsed from a
  *     string cast (string→double casts are correctly rounded in both
  *     engines; bare decimal literals would be DECIMAL-typed in both Spark
  *     and DuckDB with dialect-dependent double conversion).
  *
  * Every intermediate is either an exact integer op or one correctly-rounded
  * IEEE op on identical inputs, so the expression DAG evaluates to the same
  * bits on every compliant engine; `floor(·)` of the same double is the same
  * integer. Truncation error vs true ln is < 5e-13 (next Horner term is
  * `s²³/23 ≤ 3⁻²³/23`), far inside the 1e-6 fixed-point granularity, so the
  * score keeps true-logarithm semantics. Verified against 208k random and
  * boundary-adjacent (c2, c1, V) triples on both engines with zero
  * disagreements.
  *
  * Reference behavior: etl-tools-rs has no LM scorer; this supports the
  * CCNet-style corpus quality signal (graft.llm.CorpusStats.bigramLmScore)
  * under the driver's cross-engine oracle-hash contract.
  */
object PortableMath {

  /** Spark dialect left shift (shiftleft requires an INT shift amount). */
  val sparkShiftLeft: (String, String) => String =
    (x, d) => s"shiftleft($x, CAST($d AS INT))"

  /** DuckDB dialect left shift. */
  val duckShiftLeft: (String, String) => String =
    (x, d) => s"($x << $d)"

  /** Working column names produced by [[microLnStages]] (callers must keep
    * user columns away from these).
    */
  val microLnColumns: Seq[String] =
    Seq("lna", "lnb", "lnd", "lnad", "lne", "lnm", "lns", "lnu", "lnp", "lp")

  /** Ordered (columnName, sqlExpr) stages computing
    * `lp = floor(ln(a/b)·10⁶)` as BIGINT from integer SQL expressions `a`
    * and `b` with `1 ≤ a ≤ b < 2^52`. Apply in order (each stage may
    * reference earlier columns); the final stage is `lp`. `shiftLeft`
    * renders the dialect's integer left shift.
    */
  def microLnStages(a: String, b: String,
      shiftLeft: (String, String) => String): Seq[(String, String)] =
    lnStages(a, b, shiftLeft) :+
      ("lp" -> s"CAST(floor($lnDoubleSql * CAST(1000000 AS DOUBLE)) AS BIGINT)")

  /** The pre-floor staged double `ln(a/b)` in terms of the working columns
    * emitted by [[lnStages]]. The parenthesization fixes evaluation order:
    * `(2·s·p) − e·ln2`, each step one correctly-rounded IEEE op.
    */
  private val lnDoubleSql: String =
    "((CAST(2 AS DOUBLE) * lns * lnp) - " +
      "CAST(lne AS DOUBLE) * CAST('0.6931471805599453' AS DOUBLE))"

  /** All stages except the final floor — shared by the unsigned and signed
    * forms.
    */
  private def lnStages(a: String, b: String,
      shiftLeft: (String, String) => String): Seq[(String, String)] = {
    // Horner in u = s²: p = 1 + u(1/3 + u(1/5 + ... + u(1/21)))
    val horner = (19 to 3 by -2).foldLeft("(CAST(1 AS DOUBLE) / 21)") {
      (p, k) => s"(CAST(1 AS DOUBLE) / $k + lnu * $p)"
    }
    Seq(
      "lna" -> s"($a)",
      "lnb" -> s"($b)",
      // bit-length gap: a·2^lnd has b's bit length, so a·2^lnd/b ∈ (1/2, 2)
      "lnd" -> "(length(bin(lnb)) - length(bin(lna)))",
      "lnad" -> shiftLeft("lna", "lnd"),
      "lne" -> "(CASE WHEN lnad >= lnb THEN lnd ELSE lnd + 1 END)",
      "lnm" -> s"(CAST(CASE WHEN lnad >= lnb THEN lnad ELSE ${shiftLeft("lnad", "1")} END AS DOUBLE) / CAST(lnb AS DOUBLE))",
      "lns" -> "((lnm - CAST(1 AS DOUBLE)) / (lnm + CAST(1 AS DOUBLE)))",
      "lnu" -> "(lns * lns)",
      "lnp" -> s"(CAST(1 AS DOUBLE) + lnu * $horner)")
  }

  /** Signed variant of [[microLnStages]]: `lp = floor(ln(a/b)·10⁶)` for ANY
    * positive integers `a`, `b < 2^52` — the ratio may exceed 1 (positive
    * log). The unsigned stages run on `(least, greatest)` (ratio ≤ 1, the
    * domain they're verified on) and the final floor takes `±1 ·` the staged
    * double: negation via ±1 multiplication is exact in IEEE, and the
    * left-to-right product `(sign · d) · 10⁶` matches [[microLnSignedRef]],
    * so the result is still bit-identical across engines. Motivating case:
    * BM25's Robertson idf `ln((N−df+0.5)/(df+0.5))`, positive for any term
    * appearing in less than half the corpus.
    */
  def microLnSignedStages(a: String, b: String,
      shiftLeft: (String, String) => String): Seq[(String, String)] =
    Seq("lpa" -> s"($a)", "lpb" -> s"($b)") ++
      lnStages("least(lpa, lpb)", "greatest(lpa, lpb)", shiftLeft) :+
      ("lp" -> ("CAST(floor((CASE WHEN lpa >= lpb THEN CAST(-1 AS DOUBLE) " +
        s"ELSE CAST(1 AS DOUBLE) END) * $lnDoubleSql * " +
        "CAST(1000000 AS DOUBLE)) AS BIGINT)"))

  /** Working column names produced by [[microLnSignedStages]]. */
  val microLnSignedColumns: Seq[String] = Seq("lpa", "lpb") ++ microLnColumns

  /** Render a stage list as a DuckDB CTE chain starting from CTE `from`,
    * one CTE per stage, ending in `<prefix>fin` which carries `from`'s
    * columns plus every stage column. Sharing the generator between the
    * Spark fold and the oracle SQL is what makes cross-engine hashes exact —
    * both engines evaluate the identical expression DAG.
    */
  def duckCteChain(stages: Seq[(String, String)], from: String,
      prefix: String = "ln"): String = {
    val (ctes, last) = stages.zipWithIndex.foldLeft(
        (Vector.empty[String], from)) {
      case ((acc, prev), ((name, sql), i)) =>
        val cte = if (i == stages.size - 1) s"${prefix}fin" else s"$prefix$i"
        (acc :+ s"$cte AS (SELECT *, $sql AS $name FROM $prev)", cte)
    }
    require(last == s"${prefix}fin")
    ctes.mkString(",\n")
  }

  /** Pure-JVM reference for [[microLnSignedStages]]. */
  def microLnSignedRef(a: Long, b: Long): Long = {
    require(a >= 1 && b >= 1, s"positive args required, got a=$a b=$b")
    val (lo, hi) = (math.min(a, b), math.max(a, b))
    val d = microLnDoubleRef(lo, hi)
    math.floor((if (a >= b) -d else d) * 1000000.0).toLong
  }

  /** The staged double `ln(a/b)` (pre-floor) for `1 ≤ a ≤ b < 2^52`. */
  private def microLnDoubleRef(a: Long, b: Long): Double = {
    val lnd = (64 - java.lang.Long.numberOfLeadingZeros(b)) -
      (64 - java.lang.Long.numberOfLeadingZeros(a))
    val lnad = a << lnd
    val (lne, mnum) = if (lnad >= b) (lnd, lnad) else (lnd + 1, lnad << 1)
    val m = mnum.toDouble / b.toDouble
    val s = (m - 1.0) / (m + 1.0)
    val u = s * s
    val p0 = (19 to 3 by -2).foldLeft(1.0 / 21) { (p, k) => 1.0 / k + u * p }
    val p = 1.0 + u * p0
    (2.0 * s * p) - lne.toDouble * 0.6931471805599453
  }

  /** Pure-JVM reference implementation of [[microLnStages]] — the same
    * operation sequence in Scala doubles (JVM is strict IEEE since Java 17).
    * Specs assert the SQL stages evaluate to exactly this.
    */
  def microLnRef(a: Long, b: Long): Long = {
    require(a >= 1 && b >= a && b < (1L << 52),
      s"microLn requires 1 <= a <= b < 2^52, got a=$a b=$b")
    val lnd = (64 - java.lang.Long.numberOfLeadingZeros(b)) -
      (64 - java.lang.Long.numberOfLeadingZeros(a))
    val lnad = a << lnd
    val (lne, mnum) = if (lnad >= b) (lnd, lnad) else (lnd + 1, lnad << 1)
    val m = mnum.toDouble / b.toDouble
    val s = (m - 1.0) / (m + 1.0)
    val u = s * s
    val p0 = (19 to 3 by -2).foldLeft(1.0 / 21) { (p, k) => 1.0 / k + u * p }
    val p = 1.0 + u * p0
    math.floor(((2.0 * s * p) - lne.toDouble * 0.6931471805599453) *
      1000000.0).toLong
  }
}
