package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType, TimestampType}

/** Z-order (Morton) interleaving for multi-dimension file clustering.
  *
  * Why it exists: on a MULTI-VERSION view, value-range skipping is
  * gated by the dedup-soundness key-range closure
  * ([[graft.format.ValueStats.prune]]), and for a value predicate
  * uncorrelated with key the closure re-adds everything — no layout
  * can beat that, because the matching keys genuinely live everywhere.
  * The place value clustering pays is the SINGLE-VERSION view a
  * compaction produces (at most one row per key ⇒ the closure is
  * unnecessary; `Delta.unique` provenance proves it to the pruner).
  * There, a pure value clustering would maximize value pruning but
  * destroy the per-file key ranges point lookups prune on; pure key
  * clustering does the reverse. Z-ordering `(key, value-cols)` bounds
  * BOTH dimensions per file, so one layout serves key lookups AND
  * closure-free value predicates.
  *
  * Mechanics: each dimension maps to a 16-hex-char ORDER-PRESERVING
  * code (longs/timestamps sign-flipped to unsigned hex, strings by
  * their first 8 UTF-8 bytes, booleans 0/1; NULL sorts first as
  * all-zeros), and the z-value is the byte-granular interleave of the
  * codes — 2-hex-char groups round-robin across dimensions, a plain
  * string whose lexical order IS the z-curve order, so
  * `repartitionByRange` on it needs nothing custom. Byte (not bit)
  * granularity keeps the expression tree flat and codegen-friendly;
  * the clustering loss vs bit-interleave is a constant factor the
  * file-level stats absorb.
  *
  * All narrow, per-row, whole-stage-codegen expressions — the only
  * exchange a z-order rewrite costs is the `repartitionByRange` the
  * rewrite needs anyway.
  *
  * Known limitation (inherent to prefix codes, not this
  * implementation): a STRING dimension clusters by its LEADING bytes.
  * Values sharing a long common prefix ("https://…" URLs, "user_…"
  * ids) put their entropy past the 8-byte window and the dimension
  * degrades toward constant — pick higher-entropy dimensions, or
  * strip the shared prefix into the value upstream. The same holds
  * for the key dimension.
  */
object Zorder {

  /** 16-hex-char order-preserving code for one dimension. NULL maps to
    * all-zeros (sorts first, clusters together — the useful behavior
    * for a layout; ValueStats already ignores NULLs in ranges).
    */
  def dimCode(c: Column, dt: DataType): Column = {
    val code = dt match {
      case LongType =>
        format_string("%016x", c.bitwiseXOR(lit(Long.MinValue)))
      case TimestampType =>
        format_string("%016x", unix_millis(c).bitwiseXOR(lit(Long.MinValue)))
      case BooleanType =>
        when(c, lit("0000000000000001")).otherwise(lit("0000000000000000"))
      case StringType =>
        // first 8 UTF-8 bytes, upper-hex (both hex alphabets are
        // monotone byte→chars maps, and codes never compare across
        // dimensions), right-padded: a short string sorts before every
        // extension of it, matching string order
        rpad(hex(substring(encode(c, "UTF-8"), 1, 8)), 16, "0")
      case other => throw new IllegalArgumentException(
        s"z-order does not support ${other.simpleString} dimensions " +
          "(azof columns are STRING, BIGINT, BOOLEAN, or TIMESTAMP)")
    }
    coalesce(code, lit("0000000000000000"))
  }

  /** The interleaved z-value of `dims` (each a column with its Spark
    * type), as a lexically-ordered string.
    */
  def zValue(dims: Seq[(Column, DataType)]): Column = {
    require(dims.nonEmpty, "z-order needs at least one dimension")
    val codes = dims.map { case (c, t) => dimCode(c, t) }
    concat((0 until 8).flatMap(i =>
      codes.map(_.substr(2 * i + 1, 2))): _*)
  }
}
