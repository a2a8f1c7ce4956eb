package graft.queries

import graft.Tables
import graft.etl._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
import java.sql.DriverManager

/** Typed-row slice of lineitem for the T1 typed-transform demo. */
case class LineSlim(l_orderkey: Long, l_linenumber: Int, l_quantity: Double,
    l_extendedprice: Double, l_discount: Double)
case class LineNet(l_orderkey: Long, l_linenumber: Long, net_price: Double)

/** ETL dataflow parity queries (reference §2.1–§2.6).
  *
  * Each entry exercises one reference operator through its Spark-native
  * equivalent and is checked against a DuckDB oracle — literal `VALUES`
  * oracles for the fixed fixtures (the reference's own test inputs), SQL
  * oracles over the sf tables elsewhere.
  */
object Etl extends QueryPack {
  import OracleSafe._

  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  private val fixtureSchema = StructType(Seq(
    StructField("idx", StringType), StructField("words", StringType)))

  /** Write the reference fixture files to a deterministic temp dir (S1 file
    * source inputs). Idempotent.
    */
  private def fixtureDir(): String = {
    val dir = Paths.get(sys.props("java.io.tmpdir"), "graft_fixtures")
    Files.createDirectories(dir)
    Files.write(dir.resolve("10_lines.ndjson"),
      Fixtures.ndjson10.mkString("\n").getBytes("UTF-8"))
    Files.write(dir.resolve("14_good_lines.csv"),
      Fixtures.csv14.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- D2: NDJSON decode, errors-as-data (9 ok / 1 err fixture) ----
    "d2_json_decode" -> ((s, dir) => {
      import s.implicits._
      val renamed = StructType(Seq(StructField("index", StringType),
        StructField("words", StringType)))
      val dec = ErrorTolerant.json(s, s.createDataset(Fixtures.ndjson10), renamed)
      // serde-strict parity: a row missing the required `index` field counts
      // as an error, like the reference's `index_cause_error` line.
      dec.all.select(
        $"index".as("idx"), $"words",
        ($"index".isNull || col(ErrorTolerant.CorruptCol).isNotNull).as("error"))
    }),

    // ---- D1: CSV decode with arity errors (flexible/PERMISSIVE) ----
    "d1_csv_decode" -> ((s, dir) => {
      import s.implicits._
      val dec = ErrorTolerant.csv(s, s.createDataset(Fixtures.csvWithErrors),
        StructType(Seq(StructField("index", StringType), StructField("words", StringType))),
        CsvReadOptions())
      dec.all.select($"index".as("idx"), $"words",
        col(ErrorTolerant.CorruptCol).isNotNull.as("error"))
    }),

    // ---- D2 over real data: from_json on the events.props JSON column ----
    "d2_json_props" -> ((s, dir) => {
      import s.implicits._
      t(s, dir).events.select(
        $"event_id",
        from_json($"props", StructType(Seq(StructField("k", IntegerType))))
          .getField("k").cast("long").as("k"))
    }),

    // ---- S7: enumerate/generator source ----
    "s7_generator" -> ((s, dir) => {
      import s.implicits._
      s.range(1000).select(
        $"id",
        ($"id" % 13).as("bucket"),
        md5($"id".cast("string")).as("id_hash"))
    }),

    // ---- S1: file lines with per-file lineage counters ----
    "s1_text_lineage" -> ((s, dir) => {
      val fd = fixtureDir()
      TextSource.perFileCounts(TextSource.lines(s,
        Seq(s"$fd/10_lines.ndjson", s"$fd/14_good_lines.csv")))
    }),

    // ---- E1: CSV encode (typed rows → csv lines) ----
    "e1_csv_encode" -> ((s, dir) => {
      import s.implicits._
      t(s, dir).nation.select(
        $"n_nationkey".cast("long").as("n_nationkey"),
        to_csv(struct($"n_nationkey", $"n_name", $"n_regionkey")).as("line"))
    }),

    // ---- E3: key_values row flattening (row → (column, value) pairs) via
    //      the schema-generic unpivot (reference flattens ANY serde row) ----
    "e3_key_values" -> ((s, dir) => {
      import s.implicits._
      graft.etl.Transforms.unpivot(
        t(s, dir).nation.select($"n_nationkey".cast("long").as("n_nationkey"),
          $"n_name", $"n_regionkey".cast("long").as("n_regionkey")),
        Seq("n_nationkey"))
    }),

    // ---- O5: content-hash dedup id (SQS FIFO md5(payload) semantics) ----
    "o5_dedup_id" -> ((s, dir) => {
      import s.implicits._
      t(s, dir).region.select(
        $"r_regionkey".cast("long").as("r_regionkey"),
        md5(to_json(struct($"r_regionkey", $"r_name"))).as("dedup_id"))
    }),

    // ---- SCD2 versioned dimension merge (beyond-reference ETL op: the
    //      keep-history form of the reference's ON DUPLICATE KEY upsert).
    //      Synthetic dimension: open rows for every customer + closed
    //      history for %11 keys; updates change segment on %7 keys and
    //      add brand-new %13 keys. ----
    "scd2_merge" -> ((s, dir) => {
      val cust = t(s, dir).customer
      val k = col("c_custkey").cast("long")
      val open = cust.select(k.as("k"), col("c_mktsegment").as("seg"),
        lit(java.sql.Date.valueOf("2020-01-01")).as("valid_from"),
        lit(null).cast("date").as("valid_to"))
      val closedHist = cust.filter(k % 11 === 0)
        .select(k.as("k"), lit("OLDSEG").as("seg"),
          lit(java.sql.Date.valueOf("2018-01-01")).as("valid_from"),
          lit(java.sql.Date.valueOf("2020-01-01")).as("valid_to"))
      val updates = cust.select(k.as("k"),
          when(k % 7 === 0, lit("UPDATED")).otherwise(col("c_mktsegment")).as("seg"))
        .unionByName(cust.filter(k % 13 === 0)
          .select((k + 1000000L).as("k"), lit("NEWKEY").as("seg")))
      Scd.scd2Merge(open.unionByName(closedHist), updates,
        Seq("k"), Seq("seg"), lit(java.sql.Date.valueOf("2024-06-01")))
    }),

    // ---- snapshot diff (dataset versioning): documents vs a mutated
    //      next-day snapshot — %17 keys removed, %13 texts changed, %11
    //      keys re-added under new ids. Bodies never shuffle; the join
    //      moves (key, digest) only and unchanged keys drop out ----
    "snap_diff" -> ((s, dir) => {
      val old = t(s, dir).documents
      val k = col("doc_id")
      val cur = old.filter(k % 17 =!= 0)
        .withColumn("text", when(k % 13 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
        .unionByName(old.filter(k % 11 === 0).select(
          (k + 1000000L).as("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars")))
      Snapshot.diff(old, cur, Seq("doc_id"))
    }),

    // ---- data-quality expectation suite: row rules fused into one scan,
    //      uniqueness via exact distinct counts, referential integrity via
    //      semi-join — the pre-release assertion report ----
    "dq_report" -> ((s, dir) => {
      import s.implicits._
      import Expectations.Expectation
      val d = t(s, dir).documents
      val ref = Seq("en", "fr", "es", "de").toDF("lang") // zh intentionally out
      Expectations.report(d,
        rows = Seq(
          Expectation("text_not_null", col("text").isNotNull),
          Expectation("lang_in_set",
            col("lang").isInCollection(Seq("en", "fr", "es", "de", "zh"))),
          Expectation("n_chars_positive", col("n_chars") > 0),
          Expectation("n_chars_min_100", col("n_chars") >= 100),
          Expectation("text_lowercase_ascii", col("text").rlike("^[a-z ]*$"))),
        uniques = Seq(("doc_id_unique", Seq("doc_id")),
          ("text_unique", Seq("text"))),
        refs = Seq(("lang_ref_integrity", Seq("lang"), ref, Seq("lang"))))
    }),

    // ---- T1: typed Transformer (map + Option filter) ----
    "t1_transformer" -> ((s, dir) => {
      import s.implicits._
      val slim = t(s, dir).lineitem
        .select($"l_orderkey", $"l_linenumber", $"l_quantity",
          $"l_extendedprice", $"l_discount").as[LineSlim]
      Transforms.transformer(slim) { l =>
        if (l.l_quantity >= 30.0)
          Some(LineNet(l.l_orderkey, l.l_linenumber.toLong,
            l.l_extendedprice * (1.0 - l.l_discount)))
        else None
      }.toDF()
    }),

    // ---- T2: 1→N expansion (the case the reference panics on) ----
    "t2_expand" -> ((s, dir) => {
      import s.implicits._
      t(s, dir).documents.select(
        $"doc_id",
        explode(slice(split($"text", " "), 1, 5)).as("token"))
    }),

    // ---- T3: key-bounded batching (ordered per-key batches) ----
    "t3_batcher_bykey" -> ((s, dir) => {
      import s.implicits._
      t(s, dir).events
        .groupBy($"user_id")
        .agg(
          count(lit(1)).as("n_events"),
          concat_ws(",", transform(
            array_sort(collect_list(struct($"ts", $"event_id", $"event_type"))),
            x => x.getField("event_type"))).as("batch"))
    }),

    // ---- T5: pipeline copy (read → write → read back). The observed count
    //      from the write action (Observation metrics, zero extra jobs) is
    //      emitted alongside the read-back count — the oracle equating them
    //      proves single-pass stats match reality. ----
    "t5_pipeline_copy" -> ((s, dir) => {
      import s.implicits._
      val out = sys.props("java.io.tmpdir") + "/graft_pipeline_copy"
      val observed = Transforms.copyPipeline(t(s, dir).lineitem,
        df => df.write.mode("overwrite").parquet(out))
      s.read.parquet(out).agg(
        count(lit(1)).as("rows_copied"),
        dsum($"l_quantity").as("sum_qty"))
        .withColumn("observed_rows", lit(observed))
    }),

    // ---- S3/O3: JDBC roundtrip on embedded Derby with dead-letter sink ----
    "o3_jdbc_roundtrip" -> ((s, dir) => {
      import s.implicits._
      sys.props.getOrElseUpdate("derby.system.home",
        sys.props("java.io.tmpdir")) // keep derby.log out of the CWD
      val db = sys.props("java.io.tmpdir") + "/graft_derby_" +
        java.util.UUID.randomUUID().toString.take(8)
      val url = s"jdbc:derby:$db;create=true"
      val conn = DriverManager.getConnection(url)
      try conn.createStatement().execute(
        "CREATE TABLE info (id INT PRIMARY KEY, resource_type VARCHAR(100))")
      finally conn.close()
      val rows = Generators.enumerate(s, 100)(i => (i.toInt, s"type${i % 5}"))
        .toDF("id", "resource_type")
      val dups = Seq((5, "duplicate"), (7, "duplicate")).toDF("id", "resource_type")
      val dead = Jdbc.writeBatchedWithDeadLetter(rows.union(dups), url, "info", 7)
      val nDead = dead.count()
      dead.unpersist() // quarantine frame is pinned by contract; release it
      val result = Jdbc.read(s, url, "SELECT COUNT(*) AS N FROM info")
        .select(col("N").cast("long").as("rows_written"))
        .withColumn("dead_letters", lit(nDead))
        .cache()
      result.count() // materialize before tearing the database down
      try DriverManager.getConnection(s"jdbc:derby:$db;shutdown=true")
      catch { case _: java.sql.SQLException => () } // shutdown always "throws"
      val dir = java.nio.file.Paths.get(db)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
      result
    })
  )

  override def oracles: Map[String, String] = Map(
    "d2_json_decode" -> // fixture is fixed → literal expected stream
      """SELECT * FROM (VALUES
        |  ('0','zero',false),('1','one',false),(NULL,'two',true),
        |  ('3','three',false),('4','four',false),('5','five',false),
        |  ('6','six',false),('7','seven',false),('8','eight',false),
        |  ('9','nine',false)) AS t(idx, words, error)""".stripMargin,

    "d1_csv_decode" ->
      """SELECT * FROM (VALUES
        |  ('0','word0',false),('1','word1',false),('2','word2',false),
        |  ('3','word3',false),('4','word4',false),('5','word5',false),
        |  ('6','word6',false),('7','word7',false),('8','word8',false),
        |  ('9','word9',false),('10','word10',false),('11','word11',false),
        |  ('12','word12',false),('13','word13',false),
        |  ('14','word14',true),('15',NULL,true)) AS t(idx, words, error)""".stripMargin,

    "d2_json_props" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
        |FROM events""".stripMargin,

    "s7_generator" ->
      """SELECT CAST(range AS BIGINT) AS id,
        |  CAST(range % 13 AS BIGINT) AS bucket,
        |  md5(CAST(range AS VARCHAR)) AS id_hash
        |FROM range(1000)""".stripMargin,

    "s1_text_lineage" ->
      """SELECT * FROM (VALUES
        |  ('10_lines.ndjson', CAST(10 AS BIGINT)),
        |  ('14_good_lines.csv', CAST(15 AS BIGINT))) AS t(file, n_lines)""".stripMargin,

    "e1_csv_encode" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |  n_nationkey || ',' || n_name || ',' || n_regionkey AS line
        |FROM nation""".stripMargin,

    "e3_key_values" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |  'n_name' AS col, n_name AS val FROM nation
        |UNION ALL
        |SELECT CAST(n_nationkey AS BIGINT), 'n_regionkey',
        |  CAST(n_regionkey AS VARCHAR) FROM nation""".stripMargin,

    "o5_dedup_id" ->
      """SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey,
        |  md5('{"r_regionkey":' || r_regionkey || ',"r_name":"' || r_name || '"}') AS dedup_id
        |FROM region""".stripMargin,

    "scd2_merge" ->
      """WITH cur_open AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS k, c_mktsegment AS seg,
        |    DATE '2020-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
        |  FROM customer),
        |cur_closed AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS k, 'OLDSEG' AS seg,
        |    DATE '2018-01-01' AS valid_from, DATE '2020-01-01' AS valid_to
        |  FROM customer WHERE c_custkey % 11 = 0),
        |upd AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS k,
        |    CASE WHEN c_custkey % 7 = 0 THEN 'UPDATED' ELSE c_mktsegment END AS seg
        |  FROM customer
        |  UNION ALL
        |  SELECT CAST(c_custkey AS BIGINT) + 1000000, 'NEWKEY'
        |  FROM customer WHERE c_custkey % 13 = 0),
        |chg AS (
        |  SELECT o.k FROM cur_open o JOIN upd u USING (k) WHERE o.seg <> u.seg)
        |SELECT k, seg, valid_from, valid_to FROM cur_closed
        |UNION ALL
        |SELECT k, seg, valid_from,
        |  CASE WHEN k IN (SELECT k FROM chg) THEN DATE '2024-06-01'
        |       ELSE valid_to END
        |FROM cur_open
        |UNION ALL
        |SELECT k, seg, DATE '2024-06-01', CAST(NULL AS DATE)
        |FROM upd
        |WHERE k IN (SELECT k FROM chg)
        |   OR k NOT IN (SELECT k FROM cur_open)""".stripMargin,

    "snap_diff" ->
      """WITH oldd AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id, md5(concat_ws(chr(1),
        |    coalesce(CAST(lang AS VARCHAR), chr(2)),
        |    coalesce(CAST(n_chars AS VARCHAR), chr(2)),
        |    coalesce(CAST(source AS VARCHAR), chr(2)),
        |    coalesce(CAST(text AS VARCHAR), chr(2)))) AS old_hash
        |  FROM documents),
        |cur0 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text,
        |    lang, source, n_chars
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, source, n_chars
        |  FROM documents WHERE doc_id % 11 = 0),
        |curd AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id, md5(concat_ws(chr(1),
        |    coalesce(CAST(lang AS VARCHAR), chr(2)),
        |    coalesce(CAST(n_chars AS VARCHAR), chr(2)),
        |    coalesce(CAST(source AS VARCHAR), chr(2)),
        |    coalesce(CAST(text AS VARCHAR), chr(2)))) AS new_hash
        |  FROM cur0)
        |SELECT coalesce(o.doc_id, c.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN c.doc_id IS NULL THEN 'removed'
        |       ELSE 'changed' END AS change,
        |  o.old_hash, c.new_hash
        |FROM oldd o FULL OUTER JOIN curd c ON o.doc_id = c.doc_id
        |WHERE o.doc_id IS NULL OR c.doc_id IS NULL
        |   OR o.old_hash <> c.new_hash""".stripMargin,

    "dq_report" ->
      """SELECT rule, checked, violations,
        |  CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass
        |FROM (
        |  SELECT 'text_not_null' AS rule, CAST(count(*) AS BIGINT) AS checked,
        |    CAST(coalesce(sum(CASE WHEN text IS NOT NULL THEN 0 ELSE 1 END), 0)
        |      AS BIGINT) AS violations FROM documents
        |  UNION ALL
        |  SELECT 'lang_in_set', CAST(count(*) AS BIGINT),
        |    CAST(coalesce(sum(CASE WHEN lang IN ('en','fr','es','de','zh')
        |      THEN 0 ELSE 1 END), 0) AS BIGINT) FROM documents
        |  UNION ALL
        |  SELECT 'n_chars_positive', CAST(count(*) AS BIGINT),
        |    CAST(coalesce(sum(CASE WHEN n_chars > 0 THEN 0 ELSE 1 END), 0)
        |      AS BIGINT) FROM documents
        |  UNION ALL
        |  SELECT 'n_chars_min_100', CAST(count(*) AS BIGINT),
        |    CAST(coalesce(sum(CASE WHEN n_chars >= 100 THEN 0 ELSE 1 END), 0)
        |      AS BIGINT) FROM documents
        |  UNION ALL
        |  SELECT 'text_lowercase_ascii', CAST(count(*) AS BIGINT),
        |    CAST(coalesce(sum(CASE WHEN regexp_matches(text, '^[a-z ]*$')
        |      THEN 0 ELSE 1 END), 0) AS BIGINT) FROM documents
        |  UNION ALL
        |  SELECT 'doc_id_unique', CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(DISTINCT coalesce(CAST(doc_id AS VARCHAR),
        |      chr(2))) AS BIGINT) FROM documents
        |  UNION ALL
        |  SELECT 'text_unique', CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(DISTINCT coalesce(CAST(text AS VARCHAR),
        |      chr(2))) AS BIGINT) FROM documents
        |  UNION ALL
        |  SELECT 'lang_ref_integrity', CAST(count(*) AS BIGINT),
        |    CAST(coalesce(sum(CASE WHEN lang IN ('en','fr','es','de')
        |      THEN 0 ELSE 1 END), 0) AS BIGINT) FROM documents
        |)""".stripMargin,

    "t1_transformer" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS net_price
        |FROM lineitem
        |WHERE l_quantity >= 30.0""".stripMargin,

    "t2_expand" ->
      """SELECT doc_id, unnest(list_slice(string_split(text, ' '), 1, 5)) AS token
        |FROM documents""".stripMargin,

    "t3_batcher_bykey" ->
      """SELECT user_id, count(*) AS n_events,
        |  string_agg(event_type, ',' ORDER BY ts, event_id) AS batch
        |FROM events
        |GROUP BY user_id""".stripMargin,

    "t5_pipeline_copy" ->
      s"""SELECT count(*) AS rows_copied, ${sqlDsum("l_quantity")} AS sum_qty,
         |  count(*) AS observed_rows
         |FROM lineitem""".stripMargin,

    "o3_jdbc_roundtrip" ->
      """SELECT CAST(100 AS BIGINT) AS rows_written,
        |  CAST(2 AS BIGINT) AS dead_letters""".stripMargin
  )
}
