package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hllRegisters: mergeable — element-wise max of half sketches equals the union sketch") {
    val a = (1 to 400).map(i => ("g", s"tok$i")).toDF("g", "v")
    val b = (200 to 600).map(i => ("g", s"tok$i")).toDF("g", "v")
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df, "g", $"v")
        .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    val ra = regs(a); val rb = regs(b); val ru = regs(a.unionByName(b))
    val merged = (ra.keySet ++ rb.keySet).map { j =>
      j -> math.max(ra.getOrElse(j, 0), rb.getOrElse(j, 0))
    }.toMap
    assert(merged === ru)
  }

  test("hllRegisters: duplicates cannot move the sketch (no pre-distinct needed)") {
    val once = (1 to 300).map(i => ("g", s"t$i")).toDF("g", "v")
    val dup = (1 to 300).flatMap(i => Seq.fill(5)(("g", s"t$i")))
      .toDF("g", "v").repartition(13)
    val r1 = Sketches.hllRegisters(once, "g", $"v")
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    val r5 = Sketches.hllRegisters(dup, "g", $"v")
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(r1 === r5)
  }

  test("hllEstimate: within 15% of truth on both the corrected and raw regimes") {
    // per-group cardinalities spanning linear counting (small) and the
    // raw harmonic estimator (past 2.5m = 640)
    val truths = Map("s" -> 40, "m" -> 500, "l" -> 5000, "xl" -> 20000)
    val rows = truths.toSeq.flatMap { case (g, n) =>
      (1 to n).map(i => (g, s"item_${g}_$i"))
    }
    val est = Sketches.hllEstimate(rows.toDF("g", "v"), "g", $"v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truths.foreach { case (g, n) =>
      val e = est(g).toDouble
      assert(math.abs(e - n) / n <= 0.15,
        s"group $g: est $e vs true $n exceeds 15% (m=256 → ~6.5% σ)")
    }
  }

  test("hllEstimate is layout-independent and guards reserved group columns") {
    val rows = (1 to 1000).map(i => ("g", s"x$i"))
    val e1 = Sketches.hllEstimate(rows.toDF("g", "v"), "g", $"v")
      .collect().map(r => r.getLong(1)).head
    val e2 = Sketches.hllEstimate(rows.toDF("g", "v").repartition(17), "g",
      $"v").collect().map(r => r.getLong(1)).head
    assert(e1 === e2)
    val err = intercept[IllegalArgumentException] {
      Sketches.hllEstimate(Seq(("a", "b")).toDF("mj", "v"), "mj", $"v")
    }
    assert(err.getMessage.contains("collides"))
  }

  test("register ranks replay an independent md5 reference") {
    val vals = (1 to 50).map(i => s"w$i")
    val got = Sketches.hllRegisters(vals.map(("g", _)).toDF("g", "v"), "g",
      $"v").collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    val ref = scala.collection.mutable.Map.empty[Long, Int]
    vals.foreach { v =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 10)
      val hv = java.lang.Long.parseLong(hex, 16)
      val j = hv % 256
      val w = hv / 256
      val rho =
        if (w == 0) 33 else 33 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      ref(j) = math.max(ref.getOrElse(j, 0), rho)
    }
    assert(got === ref.toMap)
  }
}
