package graft.llm

import graft.SparkSpec
import graft.functions.PortableMath
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, true, "good clean prose"),
    (2L, true, "good text"),
    (3L, false, "spam spam buy"),
    (4L, false, "buy now"),
    (5L, false, "now")).toDF("doc_id", "pos", "text")

  test("naiveBayesScore reproduces the hand-computed add-one margin") {
    val model = Classifier.naiveBayesTrain(docs, "text", col("pos"))
    val got = Classifier.naiveBayesScore(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap

    // counts: pos tokens = {good:2, clean:1, prose:1, text:1} N_pos=5;
    // neg = {spam:2, buy:2, now:2} N_neg=6; V=7 → bp=12, bn=13;
    // docs: dp=2, dn=3
    def ln(a: Long, b: Long) = PortableMath.microLnSignedRef(a, b)
    val prior = ln(2, 3)
    def term(cp: Long, cn: Long) = ln(cp + 1, 12) - ln(cn + 1, 13)
    val m1 = term(2, 0) + term(1, 0) + term(1, 0) + prior // good clean prose
    assert(got(1L) === ((3L, m1, m1 > 0)))
    val m3 = 2 * term(0, 2) + term(0, 2) + prior // spam spam buy
    assert(got(3L) === ((3L, m3, m3 > 0)))
    // polarity sanity
    assert(got(1L)._3 && got(2L)._3 && !got(3L)._3 && !got(4L)._3)
  }

  test("NB models over disjoint corpora merge additively (sans vocab sentinel)") {
    val half1 = docs.filter(col("doc_id") <= 2)
    val half2 = docs.filter(col("doc_id") > 2)
    val merged = Classifier.naiveBayesTrain(half1, "text", col("pos"))
      .unionByName(Classifier.naiveBayesTrain(half2, "text", col("pos")))
      .filter(col("token") =!= Classifier.VocabKey)
      .groupBy("token").agg(sum("c_pos").as("c_pos"), sum("c_neg").as("c_neg"))
    val full = Classifier.naiveBayesTrain(docs, "text", col("pos"))
      .filter(col("token") =!= Classifier.VocabKey)
    assert(merged.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).toSet ===
      full.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).toSet)
  }

  test("scoring fails fast on a model without sentinels and on one-class models") {
    val bare = Seq(("tokenx", 1L, 0L)).toDF("token", "c_pos", "c_neg")
    val e1 = intercept[IllegalArgumentException] {
      Classifier.naiveBayesScore(docs, "doc_id", "text", bare)
    }
    assert(e1.getMessage.contains("malformed NB model"))
    val onClass = Classifier.naiveBayesTrain(docs, "text", lit(true))
    val e2 = intercept[IllegalArgumentException] {
      Classifier.naiveBayesScore(docs, "doc_id", "text", onClass)
    }
    assert(e2.getMessage.contains("both classes"))
  }

  test("unseen tokens score at the smoothing floor, not NULL") {
    val model = Classifier.naiveBayesTrain(docs, "text", col("pos"))
      .localCheckpoint()
    val fresh = Seq((9L, "zzz unseen words")).toDF("doc_id", "text")
    val r = Classifier.naiveBayesScore(fresh, "doc_id", "text", model)
      .collect()(0)
    def ln(a: Long, b: Long) = PortableMath.microLnSignedRef(a, b)
    // three unseen tokens: each scores the smoothing floor for BOTH
    // classes, ln(1/12) - ln(1/13)
    assert(r.getLong(2) === 3 * (ln(1, 12) - ln(1, 13)) + ln(2, 3))
    assert(r.getLong(1) === 3L)
  }

  test("cohenKappaMicro: hand-computed agreement extremes") {
    def kappa(rows: Seq[(String, String)]): Seq[Long] =
      Classifier.cohenKappaMicro(rows.toDF("a", "b"), "a", "b")
        .collect()(0).toSeq.map(_.asInstanceOf[Long])

    // perfect agreement, non-degenerate marginals: κ = 1
    assert(kappa(Seq(("x", "x"), ("y", "y"))) === Seq(2L, 2L, 2L, 1000000L))
    // both constant and equal: p_e = 1 (degenerate) → convention 10⁶
    assert(kappa(Seq(("x", "x"), ("x", "x"))) === Seq(2L, 2L, 4L, 1000000L))
    // classic 2x2: n=4, agree=2, S = 2·2 + 2·2 = 8 → κ = (8-8)/(16-8) = 0
    assert(kappa(Seq(("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")))
      === Seq(4L, 2L, 8L, 0L))
    // total systematic disagreement: n=2, agree=0, S = 1·1 + 1·1 = 2
    // → κ·10⁶ = floor(10⁶·(0 − 2)/(4 − 2)) = −10⁶ (floor, not trunc)
    assert(kappa(Seq(("x", "y"), ("y", "x"))) === Seq(2L, 0L, 2L, -1000000L))
    // floor on a non-divisible negative: n=3, agree=0, marginals
    // a: x2 y1 / b: y2 x1 → S = 2·1 + 1·2 = 4; κ·10⁶ =
    // floor(10⁶·(0−4)/(9−4)) = floor(−800000) = −800000
    assert(kappa(Seq(("x", "y"), ("x", "y"), ("y", "x")))
      === Seq(3L, 0L, 4L, -800000L))
  }

  test("fleissKappaMicro: hand values, conventions, ragged-input guard") {
    import spark.implicits._
    def fleiss(rows: Seq[(String, String)]) =
      Classifier.fleissKappaMicro(rows.toDF("item", "label"), "item",
        "label").collect()(0).toSeq.map(_.asInstanceOf[Long])

    // two items × 3 ratings: A = x,x,x; B = x,y,y →
    // sa = 6 + 2 = 8; c_x = 4, c_y = 2 → s2 = 20; M = 6, B = 12;
    // κ = (8·36 − 20·12)/(12·(36 − 20)) = 48/192 = 0.25
    assert(fleiss(Seq(("A", "x"), ("A", "x"), ("A", "x"),
      ("B", "x"), ("B", "y"), ("B", "y")))
      === Seq(2L, 3L, 8L, 20L, 250000L))
    // unanimous single label: P_e = 1 (degenerate) → convention 10⁶
    assert(fleiss(Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "x")))
      === Seq(2L, 2L, 4L, 16L, 1000000L))
    // perfect per-item agreement, split marginals: κ = 1
    assert(fleiss(Seq(("A", "x"), ("A", "x"), ("B", "y"), ("B", "y")))
      === Seq(2L, 2L, 4L, 8L, 1000000L))
    // worst within-item disagreement: A,B each split x/y → sa = 0,
    // s2 = 8, M = 4, B = 4 → κ = (0 − 32)/(4·8) = −1 exactly
    assert(fleiss(Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "y")))
      === Seq(2L, 2L, 0L, 8L, -1000000L))
    // ragged counts refuse loudly — silently dropping items would bias κ
    val e = intercept[IllegalArgumentException] {
      fleiss(Seq(("A", "x"), ("A", "x"), ("B", "x")))
    }
    assert(e.getMessage.contains("same number of ratings"))
  }

  test("perceptron: separable convergence, collision arithmetic, layout independence") {
    import spark.implicits._
    // separable, big dim → no collisions: round 1 marks everything
    // mistaken, w picks up +1 on "good"'s bucket and −1 on "bad"'s;
    // round 2 has no mistakes, so the model is already stable
    val docs = Seq((1L, "good", true), (2L, "bad", false))
      .toDF("doc_id", "text", "is_en")
    val model = Classifier.perceptronTrain(docs, "doc_id", "text", "is_en",
      dim = 1024, iterations = 3)
    val scored = Classifier.perceptronScore(docs, model, "doc_id", "text",
      dim = 1024).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(scored === Map(1L -> ((1L, true)), 2L -> ((-1L, false))))
    // dim = 1 forces total collision — the fit oscillates, and the exact
    // integer trajectory is hand-checkable: w1 = 2−1 = 1 (all mistaken);
    // round 2 margins (2, 1) → only doc 2 mistaken → w2 = 0; round 3
    // margins (0, 0) → all mistaken again → w3 = 1
    val clash = Seq((1L, "a a", true), (2L, "b", false))
      .toDF("doc_id", "text", "is_en")
    val w3 = Classifier.perceptronTrain(clash, "doc_id", "text", "is_en",
      dim = 1, iterations = 3).collect()
    assert(w3.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((0L, 1L)))
    // batch updates are commutative sums → partitioning never changes
    // the model
    val wide = (1L to 40L).map(i =>
      (i, s"tok${i % 7} tok${i % 5} tok${i % 3}", i % 2 == 0))
      .toDF("doc_id", "text", "is_en")
    def fit(df: org.apache.spark.sql.DataFrame) =
      Classifier.perceptronTrain(df, "doc_id", "text", "is_en",
        dim = 16, iterations = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(fit(wide.repartition(1)) === fit(wide.repartition(13)))
    // the margin-overflow guard refuses loudly (bound parameterized so
    // the trip is testable — the PageRank maxNodes pattern)
    val e = intercept[IllegalArgumentException] {
      Classifier.perceptronTrain(clash, "doc_id", "text", "is_en",
        dim = 4, iterations = 3, maxMarginBound = 10L)
    }
    assert(e.getMessage.contains("overflow"))
  }

  test("krippendorffAlphaMicro: hand values, missing data, conventions") {
    import spark.implicits._
    def alpha(rows: Seq[(String, String)]) =
      Classifier.krippendorffAlphaMicro(rows.toDF("item", "label"), "item",
        "label").collect()(0).toSeq.map(_.asInstanceOf[Long])

    // ragged counts are the POINT: A = x,x,y (m=3), B = x,y (m=2),
    // C = z (m=1, unpairable → dropped). n = 5; P = (3−1)(2−1) = 2;
    // doNumP = [2·1 + 1·2]·(P/2) + [1·1 + 1·1]·(P/1) = 4 + 4 = 8;
    // marginals x:3 y:2 → deNum = 3·2 + 2·3 = 12.
    // α = 1 − (8/2/5)/(12/20) = 1 − 4/3 → 10⁶ − floor(10⁶·8·4/24)
    // = 10⁶ − 1333333 = −333333 (floor, not trunc)
    assert(alpha(Seq(("A", "x"), ("A", "x"), ("A", "y"),
      ("B", "x"), ("B", "y"), ("C", "z")))
      === Seq(2L, 5L, 2L, -333333L))
    // exact rational with missing data: A = a,a,b; B = a,a; C = b,b;
    // D = a (dropped); one NULL rating (dropped). D_o = 2/7, D_e = 4/7
    // → α = 1/2 exactly
    assert(alpha(Seq(("A", "a"), ("A", "a"), ("A", "b"),
      ("B", "a"), ("B", "a"), ("C", "b"), ("C", "b"),
      ("D", "a"), ("D", null)))
      === Seq(3L, 7L, 2L, 500000L))
    // perfect per-item agreement, split marginals, ragged m: α = 1
    assert(alpha(Seq(("A", "x"), ("A", "x"),
      ("B", "y"), ("B", "y"), ("B", "y")))
      === Seq(2L, 5L, 2L, 1000000L))
    // every rating one category: D_e = 0 (degenerate) → convention 10⁶
    assert(alpha(Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "x")))
      === Seq(2L, 4L, 1L, 1000000L))
    // nothing pairable refuses loudly
    val e = intercept[IllegalArgumentException] {
      alpha(Seq(("A", "x"), ("B", "y")))
    }
    assert(e.getMessage.contains("no pairable items"))
  }
}
