package graft.etl

/** 1:1 mapping of the reference's CSV read/write options onto Spark reader /
  * writer options.
  *
  * Reference: `CsvReadOptions` (`etl-core/src/datastore/mod.rs:266-312`) —
  * delimiter, has_headers, flexible, quote, escape, comment, terminator —
  * and `CsvWriteOptions` (`mod.rs:284-296`).
  *
  * `flexible=true` (tolerate arity mismatches) maps to PERMISSIVE mode with a
  * corrupt-record column — Spark's errors-as-data path, matching the
  * reference semantic where a malformed record flows downstream as an `Err`
  * element instead of killing the stream (`etl-core/src/datastore/mod.rs:28`).
  */
final case class CsvReadOptions(
    delimiter: Char = ',',
    hasHeaders: Boolean = true,
    flexible: Boolean = true,
    quote: Char = '"',
    escape: Option[Char] = None,
    comment: Option[Char] = None) {

  def toSpark: Map[String, String] = Map(
    "sep" -> delimiter.toString,
    "header" -> hasHeaders.toString,
    "quote" -> quote.toString,
    "mode" -> (if (flexible) "PERMISSIVE" else "FAILFAST"),
    "columnNameOfCorruptRecord" -> ErrorTolerant.CorruptCol
  ) ++ escape.map("escape" -> _.toString) ++ comment.map("comment" -> _.toString)
}

final case class CsvWriteOptions(
    delimiter: Char = ',',
    writeHeaders: Boolean = true,
    quote: Char = '"',
    escape: Option[Char] = None) {

  def toSpark: Map[String, String] = Map(
    "sep" -> delimiter.toString,
    "header" -> writeHeaders.toString,
    "quote" -> quote.toString
  ) ++ escape.map("escape" -> _.toString)
}
