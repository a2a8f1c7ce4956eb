package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate documents in a
  * deterministic order and chunk the token stream into fixed-`budget`
  * sequences (the GPT-style "concat-and-chunk" batcher). A document may
  * straddle a sequence boundary; every token lands in exactly one
  * (shard, seq, position) slot, so downstream sharded loaders can
  * reconstruct training batches without coordination.
  *
  * Reference analog: the Batcher operator family
  * (etl-core/src/transformer.rs:131-196) batches by count/predicate;
  * this is the token-budget variant a training pipeline needs.
  *
  * Scale: one hash exchange on `shard` plus a per-shard sort — the same
  * cost as any windowed aggregate. Shards are the parallelism unit:
  * size `nShards` to the cluster (each shard's window sorts corpus/nShards
  * rows, spilling if needed). The assignment is a pure function of
  * (doc_id, tokens) — independent of cluster layout, partition count, or
  * input order, and reproducible across engines (the DuckDB oracle
  * computes it with the same window arithmetic).
  *
  * Cumulative token positions are computed in DECIMAL(38,0), so chunk
  * arithmetic stays exact far past the 2^53 doubles cap — a 100 TB corpus
  * is ~25e12 tokens, within double, but the decimal path removes the cliff.
  */
object Packing {

  /** Per-document packing assignment.
    *
    * Output: (idCol, shard, n_tokens, seq_first, seq_last, tok_offset) —
    * the document's tokens occupy sequences [seq_first, seq_last] of its
    * shard, starting at position `tok_offset` inside seq_first. Zero-token
    * documents are clamped to one token so every document owns a slot
    * (and the oracle arithmetic never produces an empty span).
    *
    * @param tokensCol token count per row (e.g. `TextOps.tokenCount(col("text"))`)
    * @param budget    tokens per packed sequence
    * @param nShards   independent packing streams (ids are sharded by
    *                  `id mod nShards`; use a multiple of the loader's
    *                  data-parallel world size)
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: Column,
      budget: Int, nShards: Int): DataFrame = {
    require(budget >= 1, "budget must be >= 1 token")
    require(nShards >= 1, "nShards must be >= 1")
    val shard = pmod(col(idCol).cast("long"), lit(nShards.toLong))
    val n = greatest(tokensCol.cast("long"), lit(1L))
    val w = Window.partitionBy(shard).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val beforeL = coalesce(sum(n).over(w), lit(0L))
    val before = beforeL.cast("decimal(38,0)")
    df.select(
      col(idCol),
      shard.as("shard"),
      n.as("n_tokens"),
      floor(before / budget).cast("long").as("seq_first"),
      floor((before + n - 1) / budget).cast("long").as("seq_last"),
      pmod(beforeL, lit(budget.toLong)).as("tok_offset"))
  }

  /** Token-balanced shard assignment by boustrophedon ("snake") ordering:
    * rank documents by (token count desc, id asc), then deal rank blocks
    * of `nShards` alternately forward and backward across the shards —
    * the classic balanced-sharding pattern (snake draft): each
    * back-and-forth pass gives every shard one big and one small pick, so
    * shard token totals stay within ~one document of each other without
    * any sequential greedy state. Use it to cut a corpus into equal-work
    * training shards when [[packSequences]]'s id-hash sharding would let
    * a skewed length distribution unbalance epochs.
    *
    * Scale: the global rank is [[graft.etl.Transforms.globalSortRank]] —
    * range-partitioned sort + broadcast prefix offsets, never the
    * SinglePartition window a naive global `row_number()` plans
    * (PlanSpec-pinned). Everything after the rank is a map-only
    * projection. The assignment is a pure function of (id, token count):
    * layout-independent, engine-reproducible (window-SQL oracle).
    *
    * Output: (idCol, n_tokens, shard), shard ∈ [0, nShards).
    */
  def shardBalanced(df: DataFrame, idCol: String, tokensCol: Column,
      nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    // an idCol named like a working/output column would silently corrupt
    // the slim projection (the Retrieval.guard contract)
    require(!Set("n_tokens", "shard", "__snake_r")(idCol),
      s"idCol '$idCol' collides with a shardBalanced working/output column")
    val slim = df.select(col(idCol), tokensCol.cast("long").as("n_tokens"))
    val ranked = graft.etl.Transforms.globalSortRank(slim,
      Seq(col("n_tokens").desc, col(idCol).asc), "__snake_r")
    ranked.select(col(idCol), col("n_tokens"),
      expr(s"""CAST(CASE
        | WHEN ((__snake_r - 1) DIV $nShards) % 2 = 0
        |   THEN (__snake_r - 1) % $nShards
        | ELSE $nShards - 1 - ((__snake_r - 1) % $nShards)
        | END AS BIGINT)""".stripMargin).as("shard"))
  }

  /** Length-bucketed batch assignment for inference/eval serving: group
    * documents into power-of-two token-length buckets (floor(log2 n)) and
    * deal fixed-size batches within each bucket in (length, id) order —
    * batchmates have near-equal lengths, so padding waste per batch is
    * bounded by the bucket's 2× spread instead of the corpus-wide max
    * (the standard bucketed-batching trade).
    *
    * Scale: the within-bucket rank rides
    * [[graft.etl.Transforms.globalSortRank]] on (bucket, n_tokens, id) —
    * range-partitioned, never a per-bucket SinglePartition window even
    * when one bucket holds most of the corpus — and bucket offsets are a
    * ≤64-row collect. Assignment is a pure function of (id, token count):
    * layout-independent, window-SQL oracle.
    *
    * Output: (idCol, n_tokens, bucket, batch_idx) — `batch_idx` is
    * 0-based within the bucket.
    */
  def lengthBucketBatches(df: DataFrame, idCol: String, tokensCol: Column,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    require(!Set("n_tokens", "bucket", "batch_idx", "__lb_r", "o")(idCol),
      s"idCol '$idCol' collides with a lengthBucketBatches working/output column")
    val slim = df.select(col(idCol),
      greatest(tokensCol.cast("long"), lit(1L)).as("n_tokens"))
      // floor(log2 n) EXACTLY, via bit length (the PortableMath idiom) —
      // a float log2 could waver at exact powers of two across engines
      .withColumn("bucket",
        (length(bin(col("n_tokens"))) - 1).cast("long"))
    val ranked = graft.etl.Transforms.globalSortRank(slim,
      Seq(col("bucket").asc, col("n_tokens").asc, col(idCol).asc),
      "__lb_r")
    val offsets = ranked.groupBy(col("bucket")).agg(min(col("__lb_r")).as("o"))
    ranked.join(broadcast(offsets), Seq("bucket"))
      .select(col(idCol), col("n_tokens"), col("bucket"),
        expr(s"CAST((__lb_r - o) DIV $batchSize AS BIGINT)").as("batch_idx"))
  }

  /** Exploded per-chunk view of [[packSequences]]: one row per
    * (document, sequence) intersection with the in-document token range
    * that lands in that sequence — what a copy kernel actually consumes.
    *
    * Output: (idCol, shard, seq, tok_start, tok_len); `tok_start` is
    * 0-based within the document, Σ tok_len per document = n_tokens, and
    * Σ tok_len per (shard, seq) = budget for every sequence but each
    * shard's last. Map-only on top of packSequences (explode + arithmetic
    * — no extra exchange).
    */
  def packChunks(df: DataFrame, idCol: String, tokensCol: Column,
      budget: Int, nShards: Int): DataFrame = {
    val packed = packSequences(df, idCol, tokensCol, budget, nShards)
    // global position of the doc's first token within its shard's stream
    val g0 = col("__g0")
    packed
      .select(col(idCol), col("shard"), col("n_tokens"),
        (col("seq_first") * budget + col("tok_offset")).cast("decimal(38,0)")
          .as("__g0"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq"))
      .select(
        col(idCol),
        col("shard"),
        col("seq"),
        (greatest(col("seq").cast("decimal(38,0)") * budget, g0) - g0)
          .cast("long").as("tok_start"),
        (least((col("seq") + 1).cast("decimal(38,0)") * budget, g0 + col("n_tokens"))
          - greatest(col("seq").cast("decimal(38,0)") * budget, g0))
          .cast("long").as("tok_len"))
  }
}
