package graft.format

import org.apache.spark.sql.sources._

/** VALUE-column data skipping that stays sound under merge-on-read.
  *
  * Key-range skipping ([[FileStats.mayContainAny]]) is sound on its own
  * because a key predicate commutes with the per-key dedup. A VALUE
  * predicate does not: the scan resolves each key's winner FIRST and
  * filters after, so naively dropping "can't-match" files changes the
  * dedup input — a key whose true (predicate-false) winner lived in a
  * dropped file would resurface through an older predicate-true row in
  * a kept file. The classic demonstration: `WHERE v = 'x'` over
  * {fileA: (k, t2, 'y')}, {fileB: (k, t1, 'x')} — naive pruning drops
  * fileA and wrongly reports k.
  *
  * The sound construction, [[prune]]:
  *
  *   1. '''match''' — a file survives directly when every pushed
  *      conjunct may-match its column ranges (missing stats / unknown
  *      shapes are conservatively matching);
  *   2. '''closure''' — every other file is kept anyway iff its KEY
  *      range intersects some matching file's key range.
  *
  * Why the closure suffices: a key k appears in the final result only
  * if its winner row satisfies the predicate, i.e. the winner's file is
  * a matching file F with k in F's key range. Then every file holding
  * ANY row of k (winner candidates that could override, or older rows
  * that must lose) has a key range covering k, hence intersects F's —
  * so it is kept, and k's dedup sees every row it would have seen
  * unpruned. A dropped file shares no possible key with any matching
  * file: its keys cannot reach the output, and it cannot change the
  * winner of any key that does. Layouts where files partition the key
  * space (`commitPartitioned(byKey)` + `compact(byKey)`) therefore
  * prune to the matching slices exactly; time-clustered layouts whose
  * every file spans the full key range degrade to no pruning — the
  * same trade key-range skipping already documents.
  */
object ValueStats {

  /** Canonical string encoding for a stats value of `t` (see
    * [[ColRange]]). `java.sql.Timestamp` encodes as epoch millis.
    */
  def encode(t: ColumnType, v: Any): Option[String] = (t, v) match {
    case (_, null) => None
    case (ColumnType.AzString, s: String) => Some(s)
    case (ColumnType.AzInt, n: Long) => Some(n.toString)
    case (ColumnType.AzInt, n: Int) => Some(n.toLong.toString)
    case (ColumnType.AzBoolean, b: Boolean) => Some(b.toString)
    case (ColumnType.AzDateTime, ts: java.sql.Timestamp) =>
      Some(ts.getTime.toString)
    case (ColumnType.AzDateTime, i: java.time.Instant) =>
      Some(i.toEpochMilli.toString)
    case _ => None
  }

  /** Typed comparison of two canonical encodings; None = not comparable
    * (malformed stat from a foreign writer) → caller stays conservative.
    */
  private def cmp(t: ColumnType, a: String, b: String): Option[Int] =
    try t match {
      case ColumnType.AzString => Some(a.compareTo(b))
      case ColumnType.AzInt | ColumnType.AzDateTime =>
        Some(java.lang.Long.compare(a.toLong, b.toLong))
      case ColumnType.AzBoolean =>
        Some(java.lang.Boolean.compare(a.toBoolean, b.toBoolean))
    } catch { case _: IllegalArgumentException => None }

  /** Least string greater than EVERY string with prefix `v` (drop
    * trailing U+FFFFs, increment the last remaining char); None when v
    * is all-U+FFFF — no finite upper bound exists.
    */
  private def prefixSuccessor(v: String): Option[String] = {
    val t = v.reverse.dropWhile(_ == '￿').reverse
    if (t.isEmpty) None
    else Some(t.init + (t.last + 1).toChar)
  }

  /** Could a file with `stats` hold a row satisfying pushed conjunct
    * `f`? Conservative: anything unrecognized is true.
    */
  def mayMatch(schema: TableSchema, stats: FileStats, f: Filter): Boolean = {
    def colType(name: String): Option[ColumnType] =
      schema.columns.find(_.name == name).map(_.dataType)
    // filters carry LOGICAL names; per-file stats are keyed by the
    // column's immutable PHYSICAL name, so value skipping keeps
    // working across renames
    def range(name: String): Option[(ColumnType, ColRange)] =
      for { t <- colType(name); r <- stats.cols.get(schema.physicalOf(name)) }
        yield (t, r)
    def inRange(name: String, v: Any): Boolean = range(name) match {
      case None => true
      case Some((t, r)) =>
        encode(t, v).forall(ev =>
          (for { lo <- cmp(t, r.min, ev); hi <- cmp(t, ev, r.max) }
            yield lo <= 0 && hi <= 0).getOrElse(true))
    }
    f match {
      case EqualTo(a, v) => inRange(a, v)
      case EqualNullSafe(a, v) if v != null => inRange(a, v)
      case In(a, vs) => vs.isEmpty || vs.exists(inRange(a, _))
      case GreaterThan(a, v) => range(a) match {
        case Some((t, r)) => encode(t, v).forall(ev =>
          cmp(t, r.max, ev).forall(_ > 0))
        case None => true
      }
      case GreaterThanOrEqual(a, v) => range(a) match {
        case Some((t, r)) => encode(t, v).forall(ev =>
          cmp(t, r.max, ev).forall(_ >= 0))
        case None => true
      }
      case LessThan(a, v) => range(a) match {
        case Some((t, r)) => encode(t, v).forall(ev =>
          cmp(t, r.min, ev).forall(_ < 0))
        case None => true
      }
      case LessThanOrEqual(a, v) => range(a) match {
        case Some((t, r)) => encode(t, v).forall(ev =>
          cmp(t, r.min, ev).forall(_ <= 0))
        case None => true
      }
      case StringStartsWith(a, v) if v != null => range(a) match {
        // strings with prefix v live in [v, prefixSuccessor(v)): the
        // file may hold one iff its range intersects that interval
        // (String columns only — range(a) is typed by the declared
        // schema). The successor increments v's last non-U+FFFF char —
        // `v + "￿"` as an upper bound would wrongly prune a file
        // whose min is v + "￿" + …, which itself has prefix v.
        case Some((ColumnType.AzString, r)) =>
          r.max >= v && prefixSuccessor(v).forall(s => r.min < s)
        case _ => true
      }
      case And(l, r) => mayMatch(schema, stats, l) && mayMatch(schema, stats, r)
      case Or(l, r) => mayMatch(schema, stats, l) || mayMatch(schema, stats, r)
      case _ => true
    }
  }

  /** The dedup-sound pruned file set (see object doc): match on value
    * ranges, then close over intersecting key ranges. `filters` are the
    * scan's pushed CONJUNCTS. Order is preserved (it is the merge
    * precedence order).
    */
  def prune(
      schema: TableSchema,
      entries: Seq[FileEntry],
      filters: Seq[Filter]): Seq[FileEntry] = {
    if (filters.isEmpty) return entries
    val matching = entries.map(e =>
      e.stats.forall(st => filters.forall(f => mayMatch(schema, st, f))))
    if (matching.forall(identity)) return entries
    // SINGLE-VERSION fast path: when every file in the view is a
    // `unique` compaction output of ONE commit (same seq), the view
    // holds at most one row per key, so dropping a non-matching file
    // only drops keys whose single row fails the predicate — there is
    // no older predicate-true row anywhere to resurrect, and the
    // key-range closure below is unnecessary. This is the path where
    // value clustering (compact byKey-with-correlation, or z-order)
    // actually pays: the closure otherwise re-adds every file sharing
    // key space with a match, which for an uncorrelated predicate is
    // the whole view.
    if (entries.forall(_.unique) &&
      entries.flatMap(_.seq).distinct.size <= 1 &&
      entries.forall(_.seq.isDefined))
      return entries.zip(matching).collect { case (e, true) => e }
    // key ranges of the matching files; a matching file WITHOUT key
    // stats may hold any key — the closure is then everything
    val ranges = entries.zip(matching).collect { case (e, true) =>
      e.stats.map(st => (st.keyMin, st.keyMax))
    }
    if (ranges.exists(_.isEmpty))
      entries
    else {
      val spans = ranges.flatten
      entries.zip(matching).collect {
        case (e, true) => e
        case (e, false) if e.stats.forall(st =>
          spans.exists { case (lo, hi) =>
            st.keyMin <= hi && lo <= st.keyMax }) => e
      }
    }
  }
}
