package graft.etl

/** Reference test fixtures, reproduced verbatim-semantics (FIXTURES.md).
  *
  * `ndjson10`: `etl-job/tests/test_data/10_lines.ndjson` — line index 2
  * renames `index` → `index_cause_error`, producing exactly 9 ok / 1 err
  * under a strict (index, words) schema (`etl-job/tests/decoder_fs.rs:70-72`).
  *
  * `csv14`: `etl-job/tests/test_data/14_good_lines.csv` — header + 14 clean
  * quoted rows → 14 ok / 0 err (`decoder_fs.rs:130-132`).
  *
  * `malformedJsonStream`: `etl-job/tests/simple-pipeline.rs:148-174` — 3
  * valid records + 2 literal garbage lines → 3 ok / 2 err.
  */
object Fixtures {

  val ndjson10: Seq[String] = (0 until 10).map { i =>
    val words = Seq("zero", "one", "two", "three", "four", "five", "six",
      "seven", "eight", "nine")(i)
    val key = if (i == 2) "index_cause_error" else "index"
    s"""{"$key":"$i","words":"$words"}"""
  }

  val csv14: Seq[String] =
    "index,words" +: (0 until 14).map(i => s""""$i","word$i"""")

  /** csv14 with two malformed tails: an extra-column row and a short row. */
  val csvWithErrors: Seq[String] =
    csv14 ++ Seq(""""14","word14","extra-column"""", """"15"""")

  val malformedJsonStream: Seq[String] = Seq(
    """{"name":"alice","todo":["a","b"],"id":"id0"}""",
    """1 this is a malformed json""",
    """{"name":null,"todo":[],"id":"id1"}""",
    """2 this is a malformed json""",
    """{"name":"bob","todo":["c"],"id":"id2"}"""
  )

  /** Quoted-comma CSV from `etl-job/tests/run-stream-handler.rs:80-95`. */
  val quotedCsv: Seq[String] = Seq(
    "id,name,notes",
    """4f,"McDondald, John",needs to register""",
    """10q,"Tim Dawes","testing complete"""",
    """11r,"Tim Jones",""")
}
