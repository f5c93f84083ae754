package graft.format

import java.time.Instant

/** Per-data-file key statistics for data skipping — this engine's
  * extension to the snapshot format (the reference prunes on time only,
  * crates/azof/src/metadata.rs:48-86; a KV engine whose point lookups
  * scan every time-pruned file leaves the biggest lakehouse win on the
  * table). `keyMin`/`keyMax` are the file's inclusive key range; keys
  * are Strings by the format contract, so bounds compare lexically.
  * Serialized as an extra `stats` JSON field, which the reference's
  * serde parser ignores (same ext-field pattern as `op`).
  *
  * Deliberately key-only: per-file VALUE-column min/max cannot prune an
  * as-of merge-dedup scan — a value predicate applies AFTER per-key
  * dedup, and dropping a file on a value range can change which row wins
  * a key (the pruned file's winner would have been filtered, but it
  * still claims the key). Key predicates are the sound class: every row
  * of key k lives in a file whose key range covers k, and removing other
  * keys' rows never changes k's winner. Event-time stats would duplicate
  * the delta window, which already IS the file's data-derived time range.
  */
/** Per-value-column `[min, max]` over a file's NON-NULL values, in the
  * column's canonical string encoding ([[ValueStats.encode]]): strings
  * raw, longs/booleans via `toString`, timestamps as epoch-millis
  * decimals. Comparison happens TYPED after decoding (never
  * lexicographically on the encoding), so "10" vs "9" orders
  * numerically for Int columns. A column absent from the map (all-NULL
  * file, pre-stats commit, foreign writer) is simply not skippable.
  */
final case class ColRange(min: String, max: String)

/** `rows` is the file's row count (same stats pass as the ranges):
  * consumed by the scan's `numRows` estimate — the SUM of a view's
  * per-file counts upper-bounds its post-dedup output, a conservative
  * planner input — and surfaced in the `files` metadata table. Absent
  * on pre-stats/foreign files; never required for correctness.
  */
final case class FileStats(
    keyMin: String, keyMax: String, bloom: Option[KeyBloom] = None,
    cols: Map[String, ColRange] = Map.empty,
    rows: Option[Long] = None) {
  /** Could this file contain any of `keys`? Range check first (free),
    * then the optional Bloom filter — which also prunes point lookups
    * on layouts whose every file spans the full key range.
    */
  def mayContainAny(keys: Iterable[String]): Boolean =
    keys.exists(k => keyMin <= k && k <= keyMax &&
      bloom.forall(_.mightContain(k)))

  /** Could this file contain a key in [lower, upper] (inclusive,
    * unbounded side = None)? Ranges cannot consult the bloom.
    */
  def mayOverlap(lower: Option[String], upper: Option[String]): Boolean =
    lower.forall(_ <= keyMax) && upper.forall(_ >= keyMin)
}

/** One pruned data file with its optional skipping stats, in merge
  * precedence order position. `tombstone` marks files carrying the
  * `_azof_deleted` marker column (delete commits and their compaction
  * carry-forwards) — a read-schema hint, not a "rows are all deletes"
  * claim (a carry-forward file can mix tombstone and data rows).
  * `seq` is the registering commit's sequence number ([[Delta.seq]];
  * None for base files and pre-seq/foreign commits).
  */
final case class FileEntry(
    file: String, stats: Option[FileStats], tombstone: Boolean = false,
    seq: Option[Long] = None, unique: Boolean = false)

/** A delta file: updates/inserts covering an event-time window
  * (reference: crates/azof/src/metadata.rs:89-96). A delta participates in
  * a scan whenever `start <= asOf` — its `end` bounds what the file
  * *contains*, not whether it is read (crates/azof/src/metadata.rs:99-104).
  * `stats` is this engine's optional key-range extension ([[FileStats]]);
  * `tombstone` marks files carrying the `_azof_deleted` marker column
  * (this engine's delete extension — serialized as an extra JSON field
  * the reference's serde parser ignores, like `stats` and `op`).
  *
  * `seq` is the COMMIT SEQUENCE extension: the snapshot version at which
  * this delta was first registered, stamped by every data-adding commit
  * path and carried verbatim through rewrites (purge preserves it; a
  * delta's seq never changes after registration). It gives the scan a
  * GLOBAL later-commit-wins order for exact event-time ties — the
  * window-start-derived list position alone cannot express it when one
  * commit (a multi-key SQL UPDATE) touches rows whose original deltas
  * have different window starts: the DML file's start is the min over
  * its rows, so an original delta with a newer start would outrank it
  * and its stale row would win the tie. None = pre-seq or foreign
  * commit (ordering falls back to precedence position, the pre-seq
  * behavior). Serialized as an extra JSON field the reference's serde
  * parser ignores.
  *
  * `unique` is the SINGLE-VERSION provenance extension: true iff this
  * file belongs to a compaction's merged-state output set — each key's
  * single winner row lands in exactly ONE file of that set, and the
  * set is tombstone-free. A scan view whose every file is `unique`
  * from one commit therefore holds AT MOST ONE row per key, which is
  * exactly the condition under which value-range pruning is sound
  * WITHOUT the key-range closure ([[ValueStats.prune]]): dropping a
  * non-matching file only removes keys whose single row fails the
  * predicate — there is no older predicate-true row anywhere to
  * resurrect. Never true on ordinary deltas, DML files, or the
  * compaction carry-forward (whose future rows share keys with the
  * merged set). Purge rewrites preserve it (removing rows keeps
  * uniqueness).
  */
final case class Delta(
    file: String, start: Instant, end: Instant,
    stats: Option[FileStats] = None,
    tombstone: Boolean = false,
    seq: Option[Long] = None,
    unique: Boolean = false) {
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
    delta: Seq[Delta],
    fileStats: Option[FileStats] = None) {

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
    *
    * EQUAL window starts break toward the LATER-REGISTERED delta (list
    * position, which is commit order within a segment): per-key winners
    * resolve by `(event_time desc, seq desc, precedence)`, and for
    * pre-seq commits this tie-break is what makes "the later commit
    * wins an exact event-time tie" hold when two commits share a window
    * start — an UPDATE rewriting a row at its original event_time, or
    * two same-instant upsert batches. (Seq-stamped commits get the same
    * verdict from the seq ordering regardless of list position.)
    *
    * `strictOrder = true` (the `spark.azof.strictPrecedence`
    * compatibility mode) keeps the reference reader's order instead:
    * Rust's STABLE `sort_by` on start alone (`metadata.rs:56`) leaves
    * equal-start deltas first-registered-first, so strict mode must
    * too — bit-for-bit parity with a reference reader on tables
    * carrying equal-start deltas trumps the later-commit-wins
    * convenience there.
    */
  def dataFiles(asOf: AsOf): Seq[String] =
    dataFilesWithStats(asOf).map(_.file)

  /** [[dataFiles]] with each file's optional key stats — same pruning,
    * same precedence order.
    */
  def dataFilesWithStats(
      asOf: AsOf, strictOrder: Boolean = false): Seq[FileEntry] = {
    val fromChildren = segments.filter(_.isInRange(asOf))
      .flatMap(_.dataFilesWithStats(asOf, strictOrder))
    val equalStart =
      if (strictOrder) Ordering.Int else Ordering.Int.reverse
    // EFFECTIVE seq: a delta with its OWN seq always keeps it — it is
    // the file's true landing version, and registration position must
    // not raise it (a branch MERGE re-registers an older-seq file
    // AFTER newer main files; inflating its seq to the running max
    // would hand it exact event-time ties it genuinely lost). A
    // seq-LESS delta — a foreign or pre-upgrade writer appending to a
    // seq-stamped table — INHERITS the newest seq registered BEFORE
    // it, so an exact tie against engine-stamped files resolves by
    // precedence (newer window start / later registration wins), the
    // pre-seq behavior, instead of the foreign commit silently losing
    // to every stamped file. Pre-seq tables stay all-None (rank ≡
    // precedence position, unchanged).
    val effSeqs = new Array[Option[Long]](delta.size)
    var run: Option[Long] = None
    delta.zipWithIndex.foreach { case (d, i) =>
      effSeqs(i) = d.seq.orElse(run)
      run = (d.seq, run) match {
        case (Some(s), Some(r)) => Some(math.max(s, r))
        case (Some(s), None) => Some(s)
        case (None, r) => r
      }
    }
    val fromDeltas = delta.zipWithIndex
      .filter { case (d, _) => d.isBefore(asOf) }
      .sortBy { case (d, i) => (d.start, i) }(
        Ordering.Tuple2(Ordering[Instant].reverse, equalStart))
      .map { case (d, i) =>
        FileEntry(d.file, d.stats, d.tombstone, effSeqs(i), d.unique) }
    val own =
      if (isInRange(asOf)) file.map(f => FileEntry(f, fileStats)).toSeq
      else Seq.empty
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
  * `streamBatches` is the streaming sink's exact replay index: the last
  * committed micro-batch id per stream appId, carried FORWARD by every
  * commit (each snapshot copy preserves it), so replay detection is an
  * O(1) map lookup on the current snapshot — no bounded history scan
  * that interleaved foreign commits could outrun.
  * `retired` is the monotone list of column names ever dropped from
  * this table's schema: their bytes still live in pre-drop data files,
  * so `addColumn` refuses to re-use a retired name — the explicit read
  * schema would otherwise surface the OLD values under the new column
  * (silent resurrection; formats with per-column physical ids dodge
  * this, a name-addressed format must refuse).
  * `refs` is the named-version index (Iceberg-tag analogue): tag name →
  * snapshot version, carried FORWARD by every commit like
  * `streamBatches`, so `VERSION AS OF 'name'` resolves with one lookup
  * on the current snapshot and vacuum can retain exactly the tagged
  * documents. Tag names never parse as longs (the tagging API refuses),
  * so a ref can never shadow a numeric version.
  * `branch` names the write lineage this commit belongs to (None =
  * main): branch commits share the table's global snapshot numbering
  * but never advance `version.txt`, so main readers — including a
  * reference reader — are blind to them until a fast-forward publishes
  * the branch head as a main commit (the write-audit-publish flow).
  * `parent` is the snapshot version this commit's TREE was built on
  * (its lineage predecessor): fast-forward walks it to prove the main
  * head never advanced past the fork, and vacuum walks it to retain
  * live branch lineages. All six serialize as
  * extra JSON fields, which the reference's serde parser ignores (no
  * deny_unknown_fields) — format compatibility holds.
  */
final case class Snapshot(
    schema: TableSchema,
    segments: Seq[Segment],
    op: Option[String] = None,
    streamBatches: Map[String, Long] = Map.empty,
    retired: Seq[String] = Seq.empty,
    refs: Map[String, Long] = Map.empty,
    branch: Option[String] = None,
    parent: Option[Long] = None) {
  def dataFiles(asOf: AsOf): Seq[String] = segments.flatMap(_.dataFiles(asOf))

  /** [[dataFiles]] with per-file key stats for data skipping. */
  def dataFilesWithStats(
      asOf: AsOf, strictOrder: Boolean = false): Seq[FileEntry] =
    segments.flatMap(_.dataFilesWithStats(asOf, strictOrder))

  /** Every data file referenced anywhere in the tree. */
  def allFiles: Set[String] = {
    def walk(s: Segment): Seq[String] =
      s.file.toSeq ++ s.delta.map(_.file) ++ s.segments.flatMap(walk)
    segments.flatMap(walk).toSet
  }

  /** Files flagged as carrying the `_azof_deleted` marker column,
    * anywhere in the tree.
    */
  def tombstoneFiles: Set[String] = {
    def walk(s: Segment): Seq[String] =
      s.delta.filter(_.tombstone).map(_.file) ++ s.segments.flatMap(walk)
    segments.flatMap(walk).toSet
  }
}
