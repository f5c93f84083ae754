package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-shape HYPERLOGLOG sketch for the views' APPROX-DISTINCT
  * columns (Flajolet et al.'s estimator, the classic mergeable
  * register array): m = 4096 registers (p = 12), each register the
  * max leading-zero rank seen among values hashing into it, stored as
  * ONE printable ASCII char (`'A' + rank`, rank ≤ 53) so the whole
  * sketch is a 4096-char string column — azof's type system has no
  * binary, and the char encoding keeps per-register MAX equal to
  * plain string `greatest` per position.
  *
  * Everything is deterministic and engine-only: `xxhash64` over the
  * value's canonical string (same seed everywhere), integer bit-length
  * via `length(bin(w))` (the idf trick — no floating point in the
  * register math), and the estimate computed only at SERVE time
  * (linear counting below 2.5m with zero registers, the raw
  * `α·m²/Σ2^-r` harmonic mean above). The sketch MERGE (`old ∪ new`,
  * and the subset-rollup merge across view rows) is per-position max —
  * associative, commutative, idempotent — which is exactly why the
  * column is maintainable append-only: a DELETE or revision has no
  * inverse in a max-register array, so refreshes REFUSE any pre-imaged
  * batch loudly (the epoch rebuild is the remedy), and the serve is an
  * explicit API/CLI face, never an automatic rewrite (the rewrite
  * contract is exactness; an estimate that differs from Spark's own
  * `approx_count_distinct` would silently change query results).
  *
  * Scale shape: sketches ride the view's own rows — O(groups) storage
  * at ANY value cardinality (the exact `__dv` support table is
  * O(distinct values); this is its bounded-size sibling), batch
  * sketches are two churn-sized aggregations, and every merge/estimate
  * expression is a codegen'd functions-only pipeline (no UDFs).
  */
object Hll {

  /** Register-count exponent / registers / max rank (64 − p + 1). */
  val P = 12
  val M = 4096
  val MaxRank: Int = 64 - P + 1

  /** Bias-corrected α for m = 4096. */
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)

  /** The sketch's standard-error bound (`1.04/√m` ≈ 1.6%): the
    * opt-in approx rewrite serves `approx_count_distinct(c[, rsd])`
    * only when the REQUESTED rsd is no stricter than this — the served
    * estimate is then at least as precise as the query asked for.
    */
  val RelativeSD: Double = 1.04 / math.sqrt(M.toDouble)

  private val Base = 'A'.toInt

  /** The all-zero sketch (every register 'A'). */
  val Empty: String = "A" * M

  /** The view column name carrying `c`'s sketch. */
  def colName(c: String): String = s"hll_$c"

  /** Register index / rank contributions of one value column. */
  private def idx(c: Column): Column =
    xxhash64(c.cast("string")).bitwiseAND(lit((M - 1).toLong))
  private def rank(c: Column): Column = {
    val w = shiftrightunsigned(xxhash64(c.cast("string")), P)
    when(w === 0L, lit(MaxRank.toLong))
      .otherwise(lit(MaxRank.toLong) - length(bin(w)).cast("long"))
  }

  /** One sketch per group tuple over `rows` (nulls skipped —
    * APPROX_COUNT_DISTINCT's semantics): two churn-sized aggregations
    * (per-register max, then register collection), the sketch
    * assembled as a string via a map lookup over the register
    * sequence. Groups whose values are all NULL produce no row —
    * merge coalesces to [[Empty]].
    */
  def sketch(
      rows: DataFrame, groupCols: Seq[String], c: String,
      as: String): DataFrame =
    rows.where(col(c).isNotNull)
      .select((groupCols.map(col) ++
        Seq(idx(col(c)).as("_hi"), rank(col(c)).as("_hr"))): _*)
      .groupBy((groupCols :+ "_hi").map(col): _*)
      .agg(max(col("_hr")).as("_hr"))
      .groupBy(groupCols.map(col): _*)
      .agg(map_from_entries(collect_list(struct(col("_hi"), col("_hr"))))
        .as("_hm"))
      .select((groupCols.map(col) :+
        expr(s"concat_ws('', transform(sequence(0, ${M - 1}), " +
          s"i -> char($Base + coalesce(element_at(_hm, bigint(i)), 0))))")
          .as(as)): _*)

  /** Per-position max of two NAMED sketch columns (either nullable —
    * a new group has no old sketch, an all-null batch no new one).
    * Split-once + `zip_with`: positional `substring` on a UTF8String
    * is an O(position) byte scan, which would make the merge O(M²);
    * the char-array form is O(M).
    */
  def mergeExpr(aCol: String, bCol: String): Column =
    expr(s"concat_ws('', zip_with(" +
      s"split(coalesce(`$aCol`, '$Empty'), ''), " +
      s"split(coalesce(`$bCol`, '$Empty'), ''), " +
      "(x, y) -> if(x >= y, x, y)))")

  /** Merge a collected ARRAY of sketches (the subset-rollup path) —
    * `aggregate` over the per-position-max monoid, on split char
    * arrays (same O(M) reasoning as [[mergeExpr]]).
    */
  def mergeAllExpr(arrCol: String): Column =
    expr(s"concat_ws('', aggregate(`$arrCol`, split('$Empty', ''), " +
      "(acc, x) -> zip_with(acc, split(x, ''), " +
      "(p, q) -> if(p >= q, p, q))))")

  /** [[mergeAllExpr]] over a COLUMN (not a name) — what the automatic
    * rewrite composes around `collect_list(hll_<c>)` inside an
    * aggregation, where no stable column name exists to splice into an
    * `expr` string. Same per-position-max monoid on split char arrays.
    */
  def mergeAllCol(arr: Column): Column =
    concat_ws("", aggregate(arr, split(lit(Empty), ""),
      (acc, x) => zip_with(acc, split(x, ""),
        (p, q) => when(p >= q, p).otherwise(q))))

  /** The cardinality estimate of ONE sketch Column as a single BIGINT
    * expression — [[estimate]]'s composable form (the rewrite path
    * needs the estimate INSIDE a select/agg list, not as a
    * DataFrame transform). One register pass via `aggregate` with a
    * finish lambda computing linear counting vs the harmonic mean.
    */
  def estimateCol(sk: Column): Column = {
    val regs = transform(split(sk, ""), ch => ascii(ch) - lit(Base))
    aggregate(regs,
      struct(lit(0.0).cast("double").as("d"), lit(0L).as("z")),
      (acc, r) => struct(
        (acc.getField("d") +
          pow(lit(2.0), -r.cast("double"))).as("d"),
        (acc.getField("z") +
          when(r === 0, 1L).otherwise(0L)).as("z")),
      acc => {
        val raw = lit(Alpha * M * M) / acc.getField("d")
        round(when(raw <= lit(2.5 * M) && acc.getField("z") > 0L,
          lit(M.toDouble) *
            log(lit(M.toDouble) / acc.getField("z").cast("double")))
          .otherwise(raw)).cast("long")
      })
  }

  /** The cardinality estimate of a NAMED sketch column, as BIGINT:
    * linear counting (`m·ln(m/V)`) when the raw estimate sits below
    * 2.5m with zero registers present, the harmonic-mean estimate
    * otherwise. One split to a char array; every pass O(M).
    */
  def estimate(df: DataFrame, skCol: String, out: String): DataFrame =
    df.withColumn("_regs",
      expr(s"transform(split(`$skCol`, ''), ch -> ascii(ch) - $Base)"))
      .withColumn("_denom",
        expr("aggregate(_regs, CAST(0.0 AS DOUBLE), " +
          "(acc, r) -> acc + pow(2.0, -r))"))
      .withColumn("_zeros", expr("size(filter(_regs, r -> r = 0))"))
      .withColumn(out,
        expr(s"CAST(round(CASE WHEN ($Alpha * $M * $M / _denom) <= " +
          s"${2.5 * M} AND _zeros > 0 " +
          s"THEN $M * ln(CAST($M AS DOUBLE) / _zeros) " +
          s"ELSE $Alpha * $M * $M / _denom END) AS BIGINT)"))
      .drop("_regs", "_denom", "_zeros")
}
