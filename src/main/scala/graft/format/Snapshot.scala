package graft.format

import java.time.Instant

/** A delta file: updates/inserts covering an event-time window
  * (reference: crates/azof/src/metadata.rs:89-96). A delta participates in
  * a scan whenever `start <= asOf` — its `end` bounds what the file
  * *contains*, not whether it is read (crates/azof/src/metadata.rs:99-104).
  */
final case class Delta(file: String, start: Instant, end: Instant) {
  def isBefore(asOf: AsOf): Boolean = asOf match {
    case AsOf.Current      => true
    case AsOf.EventTime(t) => !start.isAfter(t) // start <= t
  }
}

/** A segment-tree node: a time-range partition of the table. `file` is a
  * base snapshot of all keys at `start`; `segments` are child nodes
  * covering subranges; `delta` are update files within the range
  * (reference: crates/azof/src/metadata.rs:28-45, docs/architecture.md:50-64).
  */
final case class Segment(
    id: String,
    start: Instant,
    end: Option[Instant],
    file: Option[String],
    segments: Seq[Segment],
    delta: Seq[Delta]) {

  /** Range test (reference: crates/azof/src/metadata.rs:75-86): `Current`
    * matches only open-ended segments; `EventTime(t)` matches
    * `start <= t <= end` (or `start <= t` when open-ended).
    */
  def isInRange(asOf: AsOf): Boolean = asOf match {
    case AsOf.Current => end.isEmpty
    case AsOf.EventTime(t) =>
      !start.isAfter(t) && end.forall(e => !t.isAfter(e))
  }

  /** Collect this node's contribution in merge-precedence order
    * (reference: crates/azof/src/metadata.rs:48-73): in-range child
    * segments first (recursively), then deltas with `start <= asOf`
    * sorted newest-start-first, then this segment's own base file if the
    * segment is in range. Earlier files win the per-key dedup.
    */
  def dataFiles(asOf: AsOf): Seq[String] = {
    val fromChildren =
      segments.filter(_.isInRange(asOf)).flatMap(_.dataFiles(asOf))
    val fromDeltas = delta
      .filter(_.isBefore(asOf))
      .sortBy(_.start)(Ordering[Instant].reverse)
      .map(_.file)
    val own = if (isInRange(asOf)) file.toSeq else Seq.empty
    fromChildren ++ fromDeltas ++ own
  }
}

/** A consistent versioned view of a table: declared schema + segment tree
  * (reference: crates/azof/src/metadata.rs:9-26). Note the reference walks
  * *all* root segments unconditionally — only child segments are
  * range-filtered; a root segment out of range simply contributes no base
  * file (its deltas with `start <= asOf` still would).
  *
  * `op` is this engine's extension: the operation that produced the
  * snapshot ("create" | "commit-base" | "commit-delta" | "compact"),
  * used by the change feed to tell data-adding commits from rewrites.
  * Serialized as an extra JSON field, which the reference's serde parser
  * ignores (no deny_unknown_fields) — format compatibility holds.
  */
final case class Snapshot(
    schema: TableSchema,
    segments: Seq[Segment],
    op: Option[String] = None) {
  def dataFiles(asOf: AsOf): Seq[String] = segments.flatMap(_.dataFiles(asOf))

  /** Every data file referenced anywhere in the tree. */
  def allFiles: Set[String] = {
    def walk(s: Segment): Seq[String] =
      s.file.toSeq ++ s.delta.map(_.file) ++ s.segments.flatMap(walk)
    segments.flatMap(walk).toSet
  }
}
