package graft.queries

/** Unrolled DuckDB oracles for the engine-exact integer ANN family
  * (r10 VERDICT ask #1): every stage of [[graft.llm.Similarity]]'s LSH /
  * IVF / PQ / SemDeDup paths — md5-derived hyperplanes, integer k-means
  * trajectories, probe selection, candidate generation and the final
  * quantized-cosine ranking — is exact integer (or single-rounding IEEE)
  * arithmetic, so the full approximate result replays bit-identically as
  * SQL. The builders here are the SQL mirror of those fixed-parameter pack
  * calls, composed from the proven idioms: the int8 quantization CTE and
  * exact-cosine CASE from hybridRrfSql, the unrolled-trajectory k-means
  * from kmeansSql, and the md5-nibble hash decode from winnowSql.
  *
  * The constants below are THE pack parameters: the query lambdas in
  * LlmOps/CurationOps pass them to the Scala implementations, and the SQL
  * here inlines the same values — one definition, no drift.
  */
object AnnOracleSql {

  /** Embedding dimensionality of the driver's embeddings table. The Scala
    * kernels read the dim from the data; the unrolled SQL must inline it
    * (the kmeansSql `range(1, 65)` precedent). */
  val Dim = 64

  /** Queries = corpus vectors with `vec_id < NQueries` (the pack's ANN
    * query predicate). */
  val NQueries = 5

  /** Top-k of every ANN pack query. */
  val AnnK = 10

  // LSH: tables × bits of md5-integer hyperplanes, multi-probe on,
  // degenerate-bucket cap
  val LshTables = 8
  val LshBits = 8
  val LshMaxBucket = 10000

  // IVF: integer-cosine k-means coarse quantizer
  val IvfCells = 32
  val IvfProbe = 6
  val IvfIters = 2

  // PQ: per-subspace integer-L2 codebooks
  val PqM = 8
  val PqCb = 32
  val PqRerank = 64
  val PqIters = 2

  // SemDeDup: integer-cosine clusters, within-cluster verification
  val SemClusters = 32
  val SemIters = 2
  val SemMaxCluster = 10000
  val SemThreshold = 0.99

  // near-dup pairs: any-shared-bucket candidates over the same
  // LshTables × LshBits md5-integer index, exact quantized-cosine
  // verification at this threshold
  val NearDupThreshold = 0.99

  /** Deterministic training-sample size shared by IVF / PQ / SemDeDup
    * (md5-ordered `LIMIT` — covers the whole test corpus, samples at
    * scale). */
  val TrainSample = 4096

  /** Exact BIGINT dot product of two BIGINT-list columns. */
  private def listDot(a: String, b: String, d: Int = Dim): String =
    s"CAST(list_sum(list_transform(range(1, ${d + 1}), " +
      s"li -> $a[li] * $b[li])) AS BIGINT)"

  /** Exact BIGINT squared L2 of two BIGINT-list columns. */
  private def listL2(a: String, b: String, d: Int): String =
    s"CAST(list_sum(list_transform(range(1, ${d + 1}), " +
      s"li -> ($a[li] - $b[li]) * ($a[li] - $b[li]))) AS BIGINT)"

  /** The exact quantized-cosine over precomputed (dot, na, nb) BIGINTs —
    * verbatim the hybridRrfSql idiom: one exact cast, one correctly-rounded
    * sqrt, one correctly-rounded division. */
  private val SimCase =
    "CASE WHEN na = 0 OR nb = 0 THEN CAST(-2.0 AS DOUBLE) " +
      "ELSE CAST(dot AS DOUBLE) / sqrt(CAST(na * nb AS DOUBLE)) END"

  /** int8 quantization CTE `qz(vec_id, q)` over a `(vec_id, v DOUBLE[])`
    * CTE — verbatim the hybridRrfSql/kmeansSql replay of
    * [[graft.llm.Similarity.quantizeInt8]]. */
  private def qzCte(src: String): String =
    s"""qz AS (SELECT vec_id,
       |         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
       |           THEN list_transform(v, x -> CAST(0 AS BIGINT))
       |           ELSE list_transform(v, x -> CAST(floor(x * 127.0 /
       |             list_max(list_transform(v, y -> abs(y))) + 0.5) AS BIGINT))
       |         END AS q
       |       FROM $src)""".stripMargin

  /** Top-`topN` centroid assignment CTE `$p(vec_id, cid)` of vector CTE
    * `vecsCte(vec_id, q)` against centroid CTE `centsCte(cid, q)` by
    * quantized cosine, ties to the lower cid — the SQL mirror of
    * Similarity.assignCells. */
  private def assignCtes(p: String, vecsCte: String, centsCte: String,
      topN: Int): String =
    s"""${p}0 AS (SELECT z.vec_id AS vec_id, c.cid AS cid,
       |    ${listDot("z.q", "c.q")} AS dot,
       |    ${listDot("z.q", "z.q")} AS na,
       |    ${listDot("c.q", "c.q")} AS nb
       |  FROM $vecsCte z CROSS JOIN $centsCte c),
       |$p AS (SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY ($SimCase) DESC, cid ASC) AS rn
       |    FROM ${p}0) WHERE rn <= $topN)""".stripMargin

  /** Unrolled integer-cosine k-means over `qz`: md5-ordered sample
    * `${p}smp`, id-ordered init `${p}c0`, then `iters` rounds of
    * (cosine-argmax assignment, truncating-integer-mean update; an empty
    * cell keeps its centroid). Final centroids CTE: `${p}c<iters>`. The
    * kmeansSql trajectory pattern at cosine metric — the SQL mirror of
    * Similarity.intCentroids. */
  private def kmeansCtes(p: String, k: Int, iters: Int,
      vecsCte: String = "qz"): String = {
    val smp =
      s"""${p}smp AS (SELECT vec_id, q FROM $vecsCte
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $TrainSample)""".stripMargin
    val c0 =
      s"""${p}c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
         |    AS BIGINT) AS cid, q
         |  FROM (SELECT vec_id, q FROM ${p}smp ORDER BY vec_id LIMIT $k))""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""${assignCtes(s"${p}a$i", s"${p}smp", s"${p}c${i - 1}", 1)},
         |${p}c$i AS (SELECT pp.cid, coalesce(nc.q, pp.q) AS q
         |  FROM ${p}c${i - 1} pp LEFT JOIN (
         |    SELECT cid, list(sq // cn ORDER BY pos) AS q FROM (
         |      SELECT a.cid AS cid, pos, CAST(sum(z.q[pos]) AS BIGINT) AS sq,
         |             CAST(count(*) AS BIGINT) AS cn
         |      FROM ${p}a$i a JOIN ${p}smp z USING (vec_id),
         |           unnest(range(1, ${Dim + 1})) AS u(pos)
         |      GROUP BY 1, 2) GROUP BY cid) nc ON pp.cid = nc.cid)""".stripMargin
    }
    (smp +: c0 +: rounds).mkString(",\n")
  }

  /** Exact quantized-cosine re-rank of candidate CTE `candCte(query_id,
    * neighbor_id)` to top-`k` per query — CTE `$p(query_id, neighbor_id,
    * sim, rank)`. */
  private def rerankCtes(p: String, candCte: String, k: Int): String =
    s"""${p}0 AS (SELECT c.query_id AS query_id, c.neighbor_id AS neighbor_id,
       |    ${listDot("a.q", "b.q")} AS dot,
       |    ${listDot("a.q", "a.q")} AS na,
       |    ${listDot("b.q", "b.q")} AS nb
       |  FROM $candCte c JOIN qz a ON a.vec_id = c.query_id
       |                  JOIN qz b ON b.vec_id = c.neighbor_id),
       |${p}1 AS (SELECT query_id, neighbor_id, $SimCase AS sim FROM ${p}0),
       |$p AS (SELECT query_id, neighbor_id, sim, CAST(rn AS BIGINT) AS rank
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |          ORDER BY sim DESC, neighbor_id ASC) AS rn FROM ${p}1)
       |  WHERE rn <= $k)""".stripMargin

  private val EmbCte =
    "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"

  /** md5-integer hyperplane bucket CTEs over `qz`: plane decode (first
    * md5 byte − 128, the planeInt replay), exact BIGINT dots, sign-bit
    * buckets — final CTE `bk(vec_id, t, bucket)`. Shared by sim_ann_lsh
    * and sim_neardup_cosine (the Similarity.intLshFromVecs mirror). */
  private def lshBucketCtes: String =
    s"""pl0 AS (SELECT t, b, d,
       |    substr(md5('lsh:' || t || ':' || b || ':' || d), 1, 2) AS h
       |  FROM range(0, $LshTables) AS tt(t), range(0, $LshBits) AS bb(b),
       |       range(0, $Dim) AS dd(d)),
       |pl AS (SELECT t, b, d,
       |    CAST(16 * (strpos('0123456789abcdef', substr(h, 1, 1)) - 1)
       |       + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)
       |       - 128 AS BIGINT) AS p
       |  FROM pl0),
       |dots AS (SELECT z.vec_id AS vec_id, p.t AS t, p.b AS b,
       |    CAST(sum(z.q[p.d + 1] * p.p) AS BIGINT) AS dt
       |  FROM qz z CROSS JOIN pl p GROUP BY 1, 2, 3),
       |bk AS (SELECT vec_id, t,
       |    CAST(sum((CASE WHEN dt > 0 THEN 1 ELSE 0 END)
       |      * (CAST(1 AS BIGINT) << (${LshBits - 1} - b))) AS BIGINT) AS bucket
       |  FROM dots GROUP BY 1, 2)""".stripMargin

  /** sim_ann_lsh: md5-integer hyperplane buckets, query-side 1-bit
    * multi-probe, degenerate-bucket cap, exact quantized-cosine re-rank. */
  def lshSql: String =
    s"""WITH $EmbCte,
       |${qzCte("e")},
       |$lshBucketCtes,
       |msk AS (SELECT CAST(0 AS BIGINT) AS mv
       |        UNION ALL
       |        SELECT CAST(1 AS BIGINT) << mb.b FROM range(0, $LshBits) AS mb(b)),
       |prb AS (SELECT k0.vec_id AS query_id, k0.t AS t,
       |    xor(k0.bucket, m.mv) AS bucket
       |  FROM bk k0 CROSS JOIN msk m WHERE k0.vec_id < $NQueries),
       |ok AS (SELECT t, bucket FROM bk GROUP BY 1, 2
       |       HAVING count(*) <= $LshMaxBucket),
       |cand AS (SELECT DISTINCT p.query_id AS query_id, c.vec_id AS neighbor_id
       |  FROM prb p JOIN bk c ON p.t = c.t AND p.bucket = c.bucket
       |             JOIN ok o ON c.t = o.t AND c.bucket = o.bucket
       |  WHERE p.query_id <> c.vec_id),
       |${rerankCtes("res", "cand", AnnK)}
       |SELECT query_id, neighbor_id, sim, rank FROM res""".stripMargin

  /** sim_neardup_cosine: DISTINCT within-bucket pairs (id_a < id_b) over
    * the md5-integer LSH index — the Dedup.pairsWithinBuckets mirror —
    * with degenerate buckets dropped, verified by the exact quantized
    * cosine at ≥ NearDupThreshold. Replays the engine's CANDIDATE SET
    * end to end, retiring the last structural-recall hash-pass (r11
    * VERDICT ask #1). */
  def nearDupSql: String =
    s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |            FROM embeddings),
       |e AS (SELECT * FROM e0
       |      UNION ALL
       |      SELECT vec_id + 100000, list_transform(v, x -> x * 1.1) FROM e0),
       |${qzCte("e")},
       |$lshBucketCtes,
       |ok AS (SELECT t, bucket FROM bk GROUP BY 1, 2
       |       HAVING count(*) <= $LshMaxBucket),
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM bk a JOIN bk b ON a.t = b.t AND a.bucket = b.bucket
       |            AND a.vec_id < b.vec_id
       |            JOIN ok o ON a.t = o.t AND a.bucket = o.bucket),
       |p0 AS (SELECT id_a, id_b,
       |    ${listDot("pa.q", "pb.q")} AS dot,
       |    ${listDot("pa.q", "pa.q")} AS na,
       |    ${listDot("pb.q", "pb.q")} AS nb
       |  FROM cand JOIN qz pa ON pa.vec_id = id_a
       |            JOIN qz pb ON pb.vec_id = id_b)
       |SELECT id_a, id_b, sim
       |FROM (SELECT id_a, id_b, $SimCase AS sim FROM p0)
       |WHERE sim >= $NearDupThreshold""".stripMargin

  /** IVF candidate CTEs over `qz` with query vectors in `queryVecsCte`:
    * trained centroids, top-1 corpus assignment, top-`IvfProbe` query
    * probing, in-cell candidates — final CTE `ivcand(query_id,
    * neighbor_id)`. Shared by sim_ann_ivf and ret_hybrid_ann. */
  private def ivfAnnCtes(queryVecsCte: String): String = Seq(
    kmeansCtes("iv", IvfCells, IvfIters),
    assignCtes("ivasg", "qz", s"ivc$IvfIters", 1),
    assignCtes("ivprb", queryVecsCte, s"ivc$IvfIters", IvfProbe),
    s"""ivcand AS (SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id
       |  FROM ivprb p JOIN ivasg a ON p.cid = a.cid
       |  WHERE p.vec_id <> a.vec_id)""".stripMargin
  ).mkString(",\n")

  /** sim_ann_ivf: integer-cosine k-means cells, probed search, exact
    * re-rank. */
  def ivfSql: String =
    s"""WITH $EmbCte,
       |${qzCte("e")},
       |qv AS (SELECT vec_id, q FROM qz WHERE vec_id < $NQueries),
       |${ivfAnnCtes("qv")},
       |${rerankCtes("res", "ivcand", AnnK)}
       |SELECT query_id, neighbor_id, sim, rank FROM res""".stripMargin

  /** One PQ retrieval direction over `(vec_id, q)` CTEs: per-subspace
    * integer codebooks trained on the CORPUS side's md5-ordered sample
    * (grouped unrolled k-means keyed by subspace), corpus encode,
    * query-side integer LUT, asymmetric-score aggregation (optionally
    * self-excluding — the engine's `excludeSelf` knob), top-`PqRerank`
    * candidates, exact re-rank to `k` in CTE `${p}k`. Shared by
    * [[pqSql]] (self-search: queries ⊂ corpus, excludeSelf) and
    * [[bitextPqSql]] (one direction per side, no self-exclusion) — one
    * builder, the mirror of the one engine path both call. */
  private def pqDirectionCtes(p: String, queriesCte: String,
      corpusCte: String, k: Int, excludeSelf: Boolean): String = {
    val sub = Dim / PqM
    def l2(a: String, b: String) = listL2(a, b, sub)
    val rounds = (1 to PqIters).map { i =>
      s"""${p}a$i AS (SELECT vec_id, j, cid FROM (
         |    SELECT s.vec_id AS vec_id, s.j AS j, c.cid AS cid,
         |      row_number() OVER (PARTITION BY s.vec_id, s.j
         |        ORDER BY ${l2("s.sq", "c.sq")} ASC, c.cid ASC) AS rn
         |    FROM ${p}sj s JOIN ${p}c${i - 1} c ON s.j = c.j) WHERE rn = 1),
         |${p}c$i AS (SELECT pp.j, pp.cid, coalesce(nc.sq, pp.sq) AS sq
         |  FROM ${p}c${i - 1} pp LEFT JOIN (
         |    SELECT j, cid, list(sv // cn ORDER BY pos) AS sq FROM (
         |      SELECT a.j AS j, a.cid AS cid, pos,
         |        CAST(sum(s.sq[pos]) AS BIGINT) AS sv,
         |        CAST(count(*) AS BIGINT) AS cn
         |      FROM ${p}a$i a JOIN ${p}sj s
         |        ON a.vec_id = s.vec_id AND a.j = s.j,
         |           unnest(range(1, ${sub + 1})) AS u(pos)
         |      GROUP BY 1, 2, 3) GROUP BY j, cid) nc
         |    ON pp.j = nc.j AND pp.cid = nc.cid)""".stripMargin
    }
    val selfFilter =
      if (excludeSelf) "\n  WHERE l.query_id <> n.vec_id" else ""
    Seq(
      s"""${p}smp AS (SELECT vec_id, q FROM $corpusCte
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $TrainSample)""".stripMargin,
      s"""${p}sj AS (SELECT vec_id, j,
         |    list_slice(q, j * $sub + 1, j * $sub + $sub) AS sq
         |  FROM ${p}smp, range(0, $PqM) AS jj(j))""".stripMargin,
      s"""${p}c0 AS (SELECT j, CAST(row_number() OVER (PARTITION BY j
         |      ORDER BY vec_id) - 1 AS BIGINT) AS cid, sq
         |  FROM ${p}sj WHERE vec_id IN
         |    (SELECT vec_id FROM ${p}smp ORDER BY vec_id LIMIT $PqCb))""".stripMargin,
      rounds.mkString(",\n"),
      s"""${p}cj AS (SELECT vec_id, j,
         |    list_slice(q, j * $sub + 1, j * $sub + $sub) AS sq
         |  FROM $corpusCte, range(0, $PqM) AS jj(j))""".stripMargin,
      s"""${p}enc AS (SELECT vec_id, j, cid FROM (
         |    SELECT s.vec_id AS vec_id, s.j AS j, c.cid AS cid,
         |      row_number() OVER (PARTITION BY s.vec_id, s.j
         |        ORDER BY ${l2("s.sq", "c.sq")} ASC, c.cid ASC) AS rn
         |    FROM ${p}cj s JOIN ${p}c$PqIters c ON s.j = c.j) WHERE rn = 1)""".stripMargin,
      s"""${p}qj AS (SELECT vec_id, j,
         |    list_slice(q, j * $sub + 1, j * $sub + $sub) AS sq
         |  FROM $queriesCte, range(0, $PqM) AS jj(j))""".stripMargin,
      s"""${p}lut AS (SELECT qs.vec_id AS query_id, c.j AS j, c.cid AS cid,
         |    ${listDot("qs.sq", "c.sq", sub)} AS dv
         |  FROM ${p}qj qs JOIN ${p}c$PqIters c ON qs.j = c.j)""".stripMargin,
      s"""${p}apx AS (SELECT l.query_id AS query_id, n.vec_id AS neighbor_id,
         |    CAST(sum(l.dv) AS BIGINT) AS approx
         |  FROM ${p}enc n JOIN ${p}lut l ON n.j = l.j AND n.cid = l.cid$selfFilter
         |  GROUP BY 1, 2)""".stripMargin,
      s"""${p}cand AS (SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY approx DESC, neighbor_id ASC) AS rn
         |    FROM ${p}apx) WHERE rn <= $PqRerank)""".stripMargin,
      rerankCtes(s"${p}k", s"${p}cand", k)
    ).mkString(",\n")
  }

  /** sim_ann_pq: per-subspace integer codebooks (grouped unrolled k-means
    * keyed by subspace), integer asymmetric-LUT scoring, top-`PqRerank`
    * candidates, exact re-rank. */
  def pqSql: String =
    s"""WITH $EmbCte,
       |${qzCte("e")},
       |pqv AS (SELECT vec_id, q FROM qz WHERE vec_id < $NQueries),
       |${pqDirectionCtes("pq", "pqv", "qz", AnnK, excludeSelf = true)}
       |SELECT query_id, neighbor_id, sim, rank FROM pqk""".stripMargin

  /** `ret_bitext_pq`: the candidate-fed mining replay over per-side
    * PRODUCT-QUANTIZED lists (r16 VERDICT ask #5 — PQ symmetry): one
    * codebook set trained per CORPUS side (forward trains on the target
    * vectors and scans with source LUTs, backward the reverse — the
    * engine's `pqTopK(boundedQueries = false, excludeSelf = false)`
    * mirror at fixed `PqM`/`PqCb`/`PqRerank`/`PqIters`), exact
    * quantized-cosine re-rank to the top-`BitextK` lists, DISTINCT
    * union of directions, and the identical margin tail as every other
    * bitext replay. */
  def bitextPqSql: String =
    s"""WITH $EmbCte,
       |${qzCte("e")},
       |s AS (SELECT vec_id, q FROM qz WHERE vec_id % 2 = 0),
       |tt AS (SELECT vec_id, q FROM qz WHERE vec_id % 2 = 1),
       |${pqDirectionCtes("xf", "s", "tt", BitextK, excludeSelf = false)},
       |${pqDirectionCtes("xb", "tt", "s", BitextK, excludeSelf = false)},
       |cand AS (SELECT query_id AS src_id, neighbor_id AS tgt_id FROM xfk
       |  UNION
       |  SELECT neighbor_id AS src_id, query_id AS tgt_id FROM xbk),
       |p0 AS (SELECT c.src_id, c.tgt_id,
       |    ${listDot("a.q", "b.q")} AS dot,
       |    ${listDot("a.q", "a.q")} AS na,
       |    ${listDot("b.q", "b.q")} AS nb
       |  FROM cand c JOIN qz a ON a.vec_id = c.src_id
       |              JOIN qz b ON b.vec_id = c.tgt_id),
       |p AS (SELECT src_id, tgt_id, $SimMicroCase AS sim FROM p0),
       |$bitextMarginTail""".stripMargin

  /** sim_semdedup: integer-cosine clusters over the planted-dup union,
    * within-cluster pairs under the size cap, quantized-cosine threshold,
    * min-id survivors. */
  def semDedupSql: String =
    s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |            FROM embeddings),
       |e AS (SELECT * FROM e0
       |      UNION ALL
       |      SELECT vec_id + 100000, list_transform(v, x -> x * 1.1) FROM e0),
       |${qzCte("e")},
       |${kmeansCtes("sd", SemClusters, SemIters)},
       |${assignCtes("sdasg", "qz", s"sdc$SemIters", 1)},
       |szok AS (SELECT cid FROM sdasg GROUP BY cid
       |         HAVING count(*) <= $SemMaxCluster),
       |prs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM sdasg a JOIN sdasg b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE a.cid IN (SELECT cid FROM szok)),
       |ps0 AS (SELECT id_a, id_b,
       |    ${listDot("pa.q", "pb.q")} AS dot,
       |    ${listDot("pa.q", "pa.q")} AS na,
       |    ${listDot("pb.q", "pb.q")} AS nb
       |  FROM prs JOIN qz pa ON pa.vec_id = id_a
       |           JOIN qz pb ON pb.vec_id = id_b),
       |drp AS (SELECT DISTINCT id_b
       |  FROM (SELECT id_a, id_b, $SimCase AS sim FROM ps0)
       |  WHERE sim >= $SemThreshold)
       |SELECT vec_id FROM e
       |WHERE vec_id NOT IN (SELECT id_b FROM drp)""".stripMargin

  /** ret_hybrid_ann: the hybridRrfSql fusion shape with the dense leg
    * produced by the REAL unrolled IVF index, seeded per query by its
    * top-1 lexical hit. `bm25Ctes` must provide a `bmr(query_id, doc_id,
    * rnk)` CTE (CurationOps passes its shared BM25 fragment). */
  def hybridAnnSql(bm25Ctes: String, bm25K: Int): String =
    s"""WITH $bm25Ctes,
       |br AS (SELECT query_id, doc_id AS item_id,
       |         CAST(rnk AS BIGINT) AS rank FROM bmr),
       |seed AS (SELECT query_id, item_id FROM br WHERE rank = 1),
       |$EmbCte,
       |${qzCte("e")},
       |hqv AS (SELECT vec_id, q FROM qz
       |        WHERE vec_id IN (SELECT item_id FROM seed)),
       |${ivfAnnCtes("hqv")},
       |${rerankCtes("hres", "ivcand", bm25K)},
       |dr AS (SELECT s.query_id AS query_id, h.neighbor_id AS item_id, h.rank
       |       FROM hres h JOIN seed s ON h.query_id = s.item_id),
       |u AS (SELECT * FROM br UNION ALL SELECT * FROM dr),
       |f AS (SELECT query_id, item_id, CAST(count(*) AS BIGINT) AS n_lists,
       |        CAST(sum(1000000 // (60 + rank)) AS BIGINT) AS rrf_micro
       |      FROM u GROUP BY 1, 2)
       |SELECT query_id, item_id AS doc_id, n_lists, rrf_micro,
       |  CAST(rn AS BIGINT) AS rank
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY rrf_micro DESC, item_id ASC) AS rn FROM f)
       |WHERE rn <= $bm25K""".stripMargin

  // Bitext mining (Artetxe & Schwenk 2019, ratio margin): k-NN pool size
  // and the mutual-best acceptance threshold in margin-micro units
  // (1.05 = the pair's cosine must beat its neighborhood means by 5%).
  val BitextK = 4
  val BitextThresholdMicro = 1050000L

  /** The exact int8 MICRO cosine over precomputed (dot, na, nb) BIGINTs —
    * the [[graft.functions.IntCosineMicro]] replay (floor of one
    * correctly-rounded IEEE division, −2·10⁶ zero-norm sentinel). */
  private val SimMicroCase =
    "CASE WHEN na = 0 OR nb = 0 THEN CAST(-2000000 AS BIGINT) " +
      "ELSE CAST(floor(CAST(dot AS DOUBLE) / sqrt(CAST(na * nb AS DOUBLE))" +
      " * 1000000.0) AS BIGINT) END"

  /** `ret_bitext_mine`: the full margin-mining replay — parity-split
    * sides, int8 quantization, exact micro-cosine pairs, per-side top-k
    * sims (ties to the lower id), the exact integer ratio margin (pairs
    * restricted to sim > 0 and positive denominators, so DuckDB's
    * flooring `//` ≡ Spark's truncating `div`), mutual-best, threshold.
    */
  def bitextSql: String =
    s"""WITH $EmbCte,
       |${qzCte("e")},
       |s AS (SELECT vec_id AS src_id, q FROM qz WHERE vec_id % 2 = 0),
       |tt AS (SELECT vec_id AS tgt_id, q FROM qz WHERE vec_id % 2 = 1),
       |p0 AS (SELECT s.src_id, tt.tgt_id,
       |    ${listDot("s.q", "tt.q")} AS dot,
       |    ${listDot("s.q", "s.q")} AS na,
       |    ${listDot("tt.q", "tt.q")} AS nb
       |  FROM s CROSS JOIN tt),
       |p AS (SELECT src_id, tgt_id, $SimMicroCase AS sim FROM p0),
       |$bitextMarginTail""".stripMargin

  /** The shared margin / mutual-best / threshold tail over a pair CTE
    * `p(src_id, tgt_id, sim)` — per-side top-k sums (ties to the lower
    * id), the exact integer ratio margin on sim > 0 / positive
    * denominators, row_number argmax both ways, intersection, threshold.
    * Verbatim the [[graft.llm.Retrieval]] `mineFromPairs` contract, so
    * both candidate generators replay through one SQL tail exactly like
    * both engine paths funnel through one Scala core. */
  private def bitextMarginTail: String =
    s"""ks AS (SELECT src_id, CAST(sum(sim) AS BIGINT) AS s_sum,
       |         CAST(count(*) AS BIGINT) AS s_cnt
       |  FROM (SELECT src_id, sim, row_number() OVER (PARTITION BY src_id
       |          ORDER BY sim DESC, tgt_id ASC) AS rn FROM p)
       |  WHERE rn <= $BitextK GROUP BY src_id),
       |kt AS (SELECT tgt_id, CAST(sum(sim) AS BIGINT) AS t_sum,
       |         CAST(count(*) AS BIGINT) AS t_cnt
       |  FROM (SELECT tgt_id, sim, row_number() OVER (PARTITION BY tgt_id
       |          ORDER BY sim DESC, src_id ASC) AS rn FROM p)
       |  WHERE rn <= $BitextK GROUP BY tgt_id),
       |m AS (SELECT p.src_id, p.tgt_id, p.sim,
       |    CAST((2 * p.sim * ks.s_cnt * kt.t_cnt * 1000000)
       |      // (ks.s_sum * kt.t_cnt + kt.t_sum * ks.s_cnt) AS BIGINT)
       |      AS margin
       |  FROM p JOIN ks USING (src_id) JOIN kt USING (tgt_id)
       |  WHERE p.sim > 0
       |    AND ks.s_sum * kt.t_cnt + kt.t_sum * ks.s_cnt > 0),
       |fwd AS (SELECT src_id, tgt_id, sim, margin
       |  FROM (SELECT m.*, row_number() OVER (PARTITION BY src_id
       |          ORDER BY margin DESC, tgt_id ASC) AS rn FROM m)
       |  WHERE rn = 1),
       |bwd AS (SELECT src_id, tgt_id
       |  FROM (SELECT src_id, tgt_id, row_number() OVER (PARTITION BY tgt_id
       |          ORDER BY margin DESC, src_id ASC) AS rn FROM m)
       |  WHERE rn = 1)
       |SELECT CAST(f.src_id AS BIGINT) AS src_id,
       |  CAST(f.tgt_id AS BIGINT) AS tgt_id,
       |  f.sim AS sim_micro, f.margin AS margin_micro
       |FROM fwd f JOIN bwd b ON f.src_id = b.src_id AND f.tgt_id = b.tgt_id
       |WHERE f.margin >= $BitextThresholdMicro""".stripMargin

  /** `ret_bitext_lsh`: the candidate-fed mining replay over hyperplane-LSH
    * lists (r15 VERDICT ask #3 — the one candidate generator that had no
    * driver-checked row): ONE md5-hyperplane index over all vectors (the
    * planes are data-independent, so both sides share `bk` — exactly how
    * the engine hashes each side with the same [[graft.llm.Similarity]]
    * `intLshFromVecs` planes), then per direction: query-side 1-bit
    * multi-probe, corpus-side degenerate-bucket cap, in-bucket candidates
    * with NO self-exclusion (the engine feed runs
    * `annTopK(excludeSelf = false)` — colliding cross-side ids are
    * legitimate), exact quantized-cosine re-rank to the top-`BitextK`
    * lists, DISTINCT union of directions, and the identical margin tail
    * as [[bitextSql]]/[[bitextAnnSql]].
    */
  def bitextLshSql: String = {
    def direction(p: String, queries: String, corpus: String): String =
      Seq(
        s"""${p}prb AS (SELECT k0.vec_id AS query_id, k0.t AS t,
           |    xor(k0.bucket, m.mv) AS bucket
           |  FROM bk k0 JOIN $queries sq ON k0.vec_id = sq.vec_id
           |  CROSS JOIN msk m)""".stripMargin,
        s"""${p}cidx AS (SELECT k0.vec_id AS vec_id, k0.t AS t,
           |    k0.bucket AS bucket
           |  FROM bk k0 JOIN $corpus sc ON k0.vec_id = sc.vec_id)""".stripMargin,
        s"""${p}ok AS (SELECT t, bucket FROM ${p}cidx GROUP BY 1, 2
           |  HAVING count(*) <= $LshMaxBucket)""".stripMargin,
        s"""${p}cand AS (SELECT DISTINCT pr.query_id AS query_id,
           |    c.vec_id AS neighbor_id
           |  FROM ${p}prb pr JOIN ${p}cidx c
           |    ON pr.t = c.t AND pr.bucket = c.bucket
           |  JOIN ${p}ok o ON c.t = o.t AND c.bucket = o.bucket)""".stripMargin,
        rerankCtes(s"${p}k", s"${p}cand", BitextK)
      ).mkString(",\n")
    s"""WITH $EmbCte,
       |${qzCte("e")},
       |$lshBucketCtes,
       |msk AS (SELECT CAST(0 AS BIGINT) AS mv
       |        UNION ALL
       |        SELECT CAST(1 AS BIGINT) << mb.b FROM range(0, $LshBits) AS mb(b)),
       |s AS (SELECT vec_id FROM qz WHERE vec_id % 2 = 0),
       |tt AS (SELECT vec_id FROM qz WHERE vec_id % 2 = 1),
       |${direction("xf", "s", "tt")},
       |${direction("xb", "tt", "s")},
       |cand AS (SELECT query_id AS src_id, neighbor_id AS tgt_id FROM xfk
       |  UNION
       |  SELECT neighbor_id AS src_id, query_id AS tgt_id FROM xbk),
       |p0 AS (SELECT c.src_id, c.tgt_id,
       |    ${listDot("a.q", "b.q")} AS dot,
       |    ${listDot("a.q", "a.q")} AS na,
       |    ${listDot("b.q", "b.q")} AS nb
       |  FROM cand c JOIN qz a ON a.vec_id = c.src_id
       |              JOIN qz b ON b.vec_id = c.tgt_id),
       |p AS (SELECT src_id, tgt_id, $SimMicroCase AS sim FROM p0),
       |$bitextMarginTail""".stripMargin
  }

  /** `ret_bitext_ann`: the candidate-fed (100 TB-shaped) mining replay —
    * per-side IVF-flat top-k retrieval (one integer-k-means index PER
    * SIDE: forward trains on the target vectors and probes with the
    * source, backward the reverse — the
    * [[graft.llm.Similarity.ivfTopK]] mirror at fixed
    * `IvfCells`/`IvfProbe`/`IvfIters`), exact double-cosine re-rank to
    * the top-`BitextK` lists, DISTINCT union of both directions as the
    * scored pair set, then the identical margin tail as [[bitextSql]].
    */
  def bitextAnnSql: String = {
    def direction(p: String, queries: String, corpus: String): String =
      Seq(
        kmeansCtes(p, IvfCells, IvfIters, corpus),
        assignCtes(s"${p}asg", corpus, s"${p}c$IvfIters", 1),
        assignCtes(s"${p}prb", queries, s"${p}c$IvfIters", IvfProbe),
        // NO self-exclusion filter: the engine's bitext feed runs
        // ivfTopK(excludeSelf = false) — queries and corpus are separate
        // sides whose id spaces may collide, so query_id = neighbor_id is
        // a legitimate cross-side candidate (vacuous on the disjoint
        // even/odd fixture, kept faithful to the engine plan)
        s"""${p}cand AS (SELECT pr.vec_id AS query_id, a.vec_id AS neighbor_id
           |  FROM ${p}prb pr JOIN ${p}asg a ON pr.cid = a.cid)""".stripMargin,
        rerankCtes(s"${p}k", s"${p}cand", BitextK)
      ).mkString(",\n")
    s"""WITH $EmbCte,
       |${qzCte("e")},
       |s AS (SELECT vec_id, q FROM qz WHERE vec_id % 2 = 0),
       |tt AS (SELECT vec_id, q FROM qz WHERE vec_id % 2 = 1),
       |${direction("xf", "s", "tt")},
       |${direction("xb", "tt", "s")},
       |cand AS (SELECT query_id AS src_id, neighbor_id AS tgt_id FROM xfk
       |  UNION
       |  SELECT neighbor_id AS src_id, query_id AS tgt_id FROM xbk),
       |p0 AS (SELECT c.src_id, c.tgt_id,
       |    ${listDot("a.q", "b.q")} AS dot,
       |    ${listDot("a.q", "a.q")} AS na,
       |    ${listDot("b.q", "b.q")} AS nb
       |  FROM cand c JOIN qz a ON a.vec_id = c.src_id
       |              JOIN qz b ON b.vec_id = c.tgt_id),
       |p AS (SELECT src_id, tgt_id, $SimMicroCase AS sim FROM p0),
       |$bitextMarginTail""".stripMargin
  }
}
