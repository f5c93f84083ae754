package graft.format

/** A key predicate usable for stats-based file skipping in the as-of
  * merge-dedup scan. Key predicates are the SOUND pruning class for that
  * scan (see [[FileStats]]): they remove whole per-key dedup groups, so
  * filtering before the dedup window is equivalent to filtering after it
  * — and a file whose key range cannot match contributes nothing.
  *
  * `mayMatch` is deliberately conservative: it answers "could this file
  * contain a matching key", never "does it" — a `true` costs only an
  * unskipped read; a wrong `false` would drop data.
  */
sealed trait KeyFilter {
  def mayMatch(st: FileStats): Boolean
}

object KeyFilter {
  /** key ∈ keys — point lookups and IN lists. */
  final case class Keys(keys: Set[String]) extends KeyFilter {
    override def mayMatch(st: FileStats): Boolean = st.mayContainAny(keys)
  }

  /** lower <= key <= upper (lexical, inclusive; None = unbounded). A
    * strict bound degrades to its inclusive neighbour here — the residual
    * predicate the scan always applies keeps results exact.
    */
  final case class Range(
      lower: Option[String], upper: Option[String]) extends KeyFilter {
    override def mayMatch(st: FileStats): Boolean =
      st.mayOverlap(lower, upper)
  }

  /** Conjunction: every member must be able to match. */
  final case class AllOf(filters: Seq[KeyFilter]) extends KeyFilter {
    override def mayMatch(st: FileStats): Boolean =
      filters.forall(_.mayMatch(st))
  }
}
