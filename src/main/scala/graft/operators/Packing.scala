package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data EXPORT operators: the deterministic global-order steps a
  * corpus build runs after filtering/dedup, when documents become
  * training sequences and shards — concat-and-chunk sequence packing
  * (the GPT-style "tokenize, concatenate, split every `budget` tokens"
  * assignment) and deterministic global shuffle + fixed-size shard
  * assignment.
  *
  * Both need an EXCLUSIVE PREFIX SUM over a global deterministic order —
  * the one primitive naive implementations get wrong at scale by writing
  * `sum(...).over(Window.orderBy(...))` with no partition, which Spark
  * executes as a SINGLE-partition window: the whole corpus funnels
  * through one task. [[prefixSum]] is the scalable two-phase shape
  * instead (per-range partial sums + a tiny range-offset frame), the
  * classic distributed scan. Order keys are salted portable md5 hashes,
  * so the "shuffle" is reproducible across runs, task retries, and
  * engines — and a different salt draws an independent permutation.
  *
  * SNAPSHOT-SCOPED by design, unlike [[TextAnalysis.splitAssign]]'s
  * grow-stable membership: ranks and offsets are COMPACT, so adding or
  * removing one document shifts every later rank — inherent to any
  * gapless packing/sharding, not an implementation choice. Run the
  * export against a frozen corpus version (an azof as-of scan gives
  * exactly that coordinate) and record (version, salt) with the
  * artifacts; an incremental re-export is a new (version, salt) pair,
  * not an in-place patch.
  */
object Packing {

  /** Portable salted order hash: first 14 hex digits of
    * `md5(prefix || id)` as a long (56 bits, non-negative) — the same
    * construction as the split/sample/cap operators, so any engine can
    * replay it: `CAST('0x' || substr(md5(prefix || id), 1, 14) AS BIGINT)`.
    */
  def orderHash(prefix: String, id: Column): Column =
    conv(substring(md5(concat(lit(prefix), id.cast("string"))), 1, 14),
      16, 10).cast("long")

  /** Exclusive prefix sum of `_w` over the global order `(_h asc, _tid
    * asc)`, without a single-partition window. Input must carry columns
    * `_h` (long order hash, < 2^56), `_tid` (a unique tiebreak of any
    * orderable type — callers pass the id column UNCAST, so a numeric
    * id breaks 56-bit hash ties numerically exactly like an oracle's
    * `ORDER BY h, id`, and azof string keys order lexicographically)
    * and `_w` (long weight); the result adds `_prefix`.
    *
    * Two-phase distributed scan:
    *
    *  1. rows bucket by the TOP `bucketBits` bits of `_h` — a prefix of
    *     the order key, so buckets are contiguous ranges of the global
    *     order by construction;
    *  2. per-bucket totals aggregate (one partial-agg shuffle of
    *     ≤ 2^bucketBits rows), and each bucket's base offset is a
    *     running sum over that TINY frame — the only unpartitioned
    *     window in the plan, bounded at 2^bucketBits rows regardless of
    *     corpus size;
    *  3. bases broadcast-join back and a `partitionBy(_bk)` window adds
    *     the within-bucket running sum — each bucket sorts ~N/2^bucketBits
    *     rows in its own task.
    *
    * At 1000 executors raise `bucketBits` so 2^bucketBits ≳ total cores
    * (12 bits → 4096 ranges); the tiny frame stays tiny.
    */
  def prefixSum(rows: DataFrame, bucketBits: Int = 8): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 20, s"bad bucketBits $bucketBits")
    val bucketed = rows.withColumn("_bk", shiftright(col("_h"), 56 - bucketBits))
    val totals = bucketed.groupBy("_bk").agg(sum(col("_w")).as("_bt"))
    // constant-valued partition key: this frame IS meant to run in one
    // task (it is ≤ 2^bucketBits aggregated rows); the key says so
    // explicitly instead of tripping Spark's no-partition-defined WARN
    // on every run. `pmod(_bk, 1)` not `lit(0)` — a foldable key is
    // optimized out of the partition spec and the WARN returns.
    val wBase = Window.partitionBy(pmod(col("_bk"), lit(1)))
      .orderBy(col("_bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = totals
      .withColumn("_base", coalesce(sum(col("_bt")).over(wBase), lit(0L)))
      .drop("_bt")
    val wIn = Window.partitionBy(col("_bk"))
      .orderBy(col("_h").asc, col("_tid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(bases), Seq("_bk"))
      .withColumn("_prefix",
        col("_base") + sum(col("_w")).over(wIn) - col("_w"))
      .drop("_bk", "_base")
  }

  /** Concat-and-chunk sequence packing: documents concatenate in the
    * salted-hash global order and the token stream splits into training
    * sequences of exactly `budget` tokens; each document maps to its
    * absolute token offset and the sequence range it lands in —
    * `(doc_id, n_tokens, tok_offset, start_seq, end_seq, n_seqs)`.
    * Integer `div` arithmetic throughout (never a double), so the
    * mapping is exact at any corpus size.
    *
    * This is the assignment step: a writer joins it back to the token
    * stream to emit per-sequence rows. Documents with null text are
    * excluded (they contribute no tokens).
    */
  def packSequences(
      df: DataFrame, text: Column, id: Column, budget: Long,
      salt: String = "p1", bucketBits: Int = 8): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val rows = df.where(text.isNotNull).select(
      id.as("doc_id"),
      size(TextAnalysis.words(text)).cast("long").as("n_tokens"),
      orderHash(s"pack#$salt#", id).as("_h"),
      id.as("_tid"))
      .withColumn("_w", col("n_tokens"))
    prefixSum(rows, bucketBits)
      .withColumn("tok_offset", col("_prefix"))
      .withColumn("start_seq", expr(s"tok_offset div ${budget}L"))
      .withColumn("end_seq",
        expr(s"(tok_offset + n_tokens - 1) div ${budget}L"))
      .withColumn("n_seqs", col("end_seq") - col("start_seq") + 1)
      .select("doc_id", "n_tokens", "tok_offset",
        "start_seq", "end_seq", "n_seqs")
  }

  /** The EMITTER for [[packSequences]] — materializes the actual
    * training sequences: every document's tokens land at their absolute
    * positions in the concatenated stream and group into `budget`-token
    * sequences, docs split mid-sequence exactly where the assignment
    * says. Output: `(seq_id, seq_text, n_tokens)` with `n_tokens =
    * budget` for every sequence but the last.
    *
    * This step necessarily materializes the token stream (it IS the
    * export); the shapes keep it linear: the assignment join is a hash
    * join on doc_id, the explode is narrow with position arithmetic,
    * and the one shuffle groups by seq_id with group size bounded at
    * `budget` tokens (plus the ≤ 2 docs straddling each boundary).
    */
  def emitSequences(
      df: DataFrame, text: Column, id: Column, budget: Long,
      salt: String = "p1", bucketBits: Int = 8): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    // the token arrays ride THROUGH the prefix sum instead of joining
    // the assignment back to a second read of the input: one scan of
    // the corpus, not two (the offsets are a function of sizes only,
    // but recomputing them on a re-read doubles the dominant cost —
    // the text scan)
    val rows = df.where(text.isNotNull).select(
      id.as("doc_id"),
      TextAnalysis.words(text).as("_toks"),
      orderHash(s"pack#$salt#", id).as("_h"),
      id.as("_tid"))
      .withColumn("_w", size(col("_toks")).cast("long"))
    prefixSum(rows, bucketBits)
      .select(col("doc_id"), col("_prefix").as("_off"),
        posexplode(col("_toks")).as(Seq("_p", "_tok")))
      .withColumn("_tp", col("_off") + col("_p"))
      .withColumn("seq_id", expr(s"_tp div ${budget}L"))
      .groupBy("seq_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("_tp"), col("_tok")))),
          x => x("_tok")), " ").as("seq_text"),
        count(lit(1)).as("n_tokens"))
  }

  /** Deterministic global shuffle + fixed-size shard assignment: every
    * document gets its rank in the salted-hash permutation and the
    * `(shard_id, shard_pos)` cell of a `shardSize`-row shard layout —
    * `(doc_id, shuffle_rank, shard_id, shard_pos)`. Every shard is
    * exactly `shardSize` docs except the last; membership is a pure
    * function of (corpus, salt), so reruns and engines agree and a
    * writer can emit shard files independently per shard_id.
    */
  def shardAssign(
      df: DataFrame, id: Column, shardSize: Long,
      salt: String = "p1", bucketBits: Int = 8): DataFrame = {
    require(shardSize >= 1, "shardSize must be >= 1")
    val rows = df.select(
      id.as("doc_id"),
      orderHash(s"shard#$salt#", id).as("_h"),
      id.as("_tid"))
      .withColumn("_w", lit(1L))
    prefixSum(rows, bucketBits)
      .withColumn("shuffle_rank", col("_prefix"))
      .withColumn("shard_id", expr(s"shuffle_rank div ${shardSize}L"))
      .withColumn("shard_pos", pmod(col("shuffle_rank"), lit(shardSize)))
      .select("doc_id", "shuffle_rank", "shard_id", "shard_pos")
  }
}
