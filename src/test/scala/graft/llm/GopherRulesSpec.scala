package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.Row

class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def signalsOf(text: String): Row = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    GopherRules.repetitionSignals(df, "doc_id", "text").collect().head
  }

  test("line repetition: duplicate instances and their chars are counted") {
    // 4 lines, 'dup line' twice → 1 repeat instance of 8 chars;
    // all-chars = 8 + 8 + 6 + 7 = 29
    val r = signalsOf("dup line\nunique\nanother\ndup line")
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    assert(m("n_lines") === 4L)
    assert(m("dup_line_frac") === 0.25)
    assert(m("dup_line_char_frac") === 8.0 / 29.0)
  }

  test("bullet and ellipsis line fractions count every instance") {
    val r = signalsOf("- one\n- two\nplain\nwait...")
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    assert(m("bullet_line_frac") === 0.5)
    assert(m("ellipsis_line_frac") === 0.25)
  }

  test("top n-gram mass: most frequent bigram, ties to smallest gram") {
    // bigrams: 'b a' ×2, 'a b' ×2 ('a b a b a b' → a-b, b-a, a-b, b-a, a-b)
    // counts: 'a b' 3, 'b a' 2 → top2 = 3 × len('a b')=3 / len(text)=11
    val r = signalsOf("a b a b a b")
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    assert(m("top_2gram_char_frac") === 9.0 / 11.0)
  }

  test("docs with fewer than n tokens get 0 top-n-gram mass") {
    val r = signalsOf("one two three")
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    assert(m("top_4gram_char_frac") === 0.0)
    // 3 tokens → exactly one 3-gram with count 1
    assert(m("top_3gram_char_frac") === 13.0 / 13.0)
  }

  test("repeated 5-gram coverage covers every position of both instances") {
    // 'v w x y z' twice with distinct middles: spans repeat, covering all
    // 10 tokens of the two instances but not the separators
    val text = "v w x y z sep1 sep2 v w x y z"
    val r = signalsOf(text)
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    // covered chars = 2 × (1+1+1+1+1) = 10; total = 10 + 4 + 4 = 18
    assert(m("dup_5gram_char_frac") === 10.0 / 18.0)
  }

  test("no within-doc repetition → zero repetition signals") {
    val r = signalsOf("all tokens here are fully distinct words")
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    assert(m("dup_line_frac") === 0.0)
    assert(m("dup_5gram_char_frac") === 0.0)
    assert(m("n_lines") === 1L)
  }

  test("stopword presence counts distinct stopwords, not instances") {
    val r = signalsOf("the the the cat sat with with a dog")
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    assert(m("n_stopwords_present") === 2L) // the, with
  }

  test("gate applies every threshold conjunctively") {
    // 60 distinct words (no repeated n-grams) + 3 stopwords
    val longGood =
      (1 to 60).map(i => s"word$i").mkString(" ") + " the of and"
    val df = Seq(
      (1L, longGood), // > 50 words, varied, stopwords present
      (2L, "short text the of"), // fails minWords
      (3L, ("spam " * 60).trim) // fails stopwords + top-n-gram mass
    ).toDF("doc_id", "text")
    val out = GopherRules.gate(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        r.getBoolean(r.fieldIndex("gopher_keep"))).toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("idCol colliding with a working column is rejected loudly") {
    val df = Seq(("x", "some text")).toDF("gram", "text")
    val e = intercept[IllegalArgumentException] {
      GopherRules.repetitionSignals(df, "gram", "text")
    }
    assert(e.getMessage.contains("collides"))
  }
}
