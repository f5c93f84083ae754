package graft.format

import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite

/** Segment-tree pruning parity — ports the reference's metadata tests
  * (reference: crates/azof/src/metadata.rs:341-618), asserting exact file
  * sets AND precedence order.
  */
class PruningSpec extends AnyFunSuite {

  private def ts(s: String): Instant = Instant.parse(s)
  private def at(s: String): AsOf = AsOf.EventTime(ts(s))

  test("reads base file of current segment") {
    val snap = SnapshotCodec.parse(
      """{"schema":{"columns":[]},"segments":[
        {"id":"10","start":"2024-01-01T00:00:00.000Z","file":"base.parquet"}]}""")
    assert(snap.dataFiles(AsOf.Current) == Seq("base.parquet"))
    assert(snap.dataFiles(at("2023-12-01T00:00:00Z")).isEmpty)
  }

  test("reads base file of historical segment") {
    val snap = SnapshotCodec.parse(
      """{"schema":{"columns":[]},"segments":[
        {"id":"10","start":"2024-01-01T00:00:00.000Z",
         "end":"2024-03-01T00:00:00.000Z","file":"base.parquet"}]}""")
    assert(snap.dataFiles(at("2024-01-01T00:00:00Z")) == Seq("base.parquet"))
    assert(snap.dataFiles(at("2024-02-01T00:00:00Z")) == Seq("base.parquet"))
    assert(snap.dataFiles(AsOf.Current).isEmpty)
    assert(snap.dataFiles(at("2023-02-01T00:00:00Z")).isEmpty)
    assert(snap.dataFiles(at("2024-04-01T00:00:00Z")).isEmpty)
  }

  private val nestedHistorical = SnapshotCodec.parse(
    """{"schema":{"columns":[]},"segments":[
      {"id":"10","start":"2010-01-01T00:00:00.000Z","end":"2020-01-01T00:00:00.000Z",
       "file":"base10.parquet","segments":[
        {"id":"11","start":"2013-01-01T00:00:00.000Z","end":"2016-01-01T00:00:00.000Z",
         "file":"base11.parquet"},
        {"id":"12","start":"2018-01-01T00:00:00.000Z","end":"2019-01-01T00:00:00.000Z",
         "file":"base12.parquet","segments":[
          {"id":"121","start":"2018-03-01T00:00:00.000Z","end":"2018-06-01T00:00:00.000Z",
           "file":"base121.parquet"},
          {"id":"122","start":"2018-07-01T00:00:00.000Z","end":"2019-01-01T00:00:00.000Z",
           "file":"base112.parquet"}]}]}]}""")

  test("reads base file of nested segments in historical segments") {
    assert(nestedHistorical.dataFiles(at("2018-04-01T00:00:00Z")) ==
      Seq("base121.parquet", "base12.parquet", "base10.parquet"))
    assert(nestedHistorical.dataFiles(at("2022-04-01T00:00:00Z")).isEmpty)
    assert(nestedHistorical.dataFiles(at("2011-04-01T00:00:00Z")) == Seq("base10.parquet"))
    assert(nestedHistorical.dataFiles(at("2017-04-01T00:00:00Z")) == Seq("base10.parquet"))
    assert(nestedHistorical.dataFiles(AsOf.Current).isEmpty)
  }

  private val nestedCurrent = SnapshotCodec.parse(
    """{"schema":{"columns":[]},"segments":[
      {"id":"10","start":"2010-01-01T00:00:00.000Z","file":"base10.parquet","segments":[
        {"id":"11","start":"2013-01-01T00:00:00.000Z","end":"2016-01-01T00:00:00.000Z",
         "file":"base11.parquet"},
        {"id":"12","start":"2018-01-01T00:00:00.000Z","file":"base12.parquet","segments":[
          {"id":"121","start":"2018-03-01T00:00:00.000Z","end":"2018-06-01T00:00:00.000Z",
           "file":"base121.parquet"},
          {"id":"122","start":"2018-07-01T00:00:00.000Z","file":"base122.parquet"}]}]}]}""")

  test("reads base file of nested segments in current segments") {
    assert(nestedCurrent.dataFiles(at("2018-04-01T00:00:00Z")) ==
      Seq("base121.parquet", "base12.parquet", "base10.parquet"))
    assert(nestedCurrent.dataFiles(at("2022-04-01T00:00:00Z")) ==
      Seq("base122.parquet", "base12.parquet", "base10.parquet"))
    assert(nestedCurrent.dataFiles(at("2011-04-01T00:00:00Z")) == Seq("base10.parquet"))
    assert(nestedCurrent.dataFiles(at("2017-04-01T00:00:00Z")) == Seq("base10.parquet"))
    assert(nestedCurrent.dataFiles(AsOf.Current) ==
      Seq("base122.parquet", "base12.parquet", "base10.parquet"))
  }

  test("reads delta files of current segment, newest-start-first") {
    val snap = SnapshotCodec.parse(
      """{"schema":{"columns":[]},"segments":[
        {"id":"10","start":"2024-01-01T00:00:00.000Z","file":"base10.parquet",
         "delta":[
          {"file":"delta_100.parquet","start":"2024-02-01T00:00:00.000Z","end":"2024-06-01T00:00:00.0Z"},
          {"file":"delta_101.parquet","start":"2024-10-01T00:00:00.000Z","end":"2024-11-30T23:59:59.999Z"},
          {"file":"delta_102.parquet","start":"2024-07-01T00:00:00.000Z","end":"2024-09-30T23:59:59.999Z"}],
         "segments":[
          {"id":"211","start":"2024-11-01T00:00:00.000Z","file":"base211.parquet"}]}]}""")
    assert(snap.dataFiles(AsOf.Current) ==
      Seq("base211.parquet", "delta_101.parquet", "delta_102.parquet",
        "delta_100.parquet", "base10.parquet"))
    assert(snap.dataFiles(at("2024-08-01T00:00:00Z")) ==
      Seq("delta_102.parquet", "delta_100.parquet", "base10.parquet"))
    assert(snap.dataFiles(at("2024-07-01T00:00:00Z")) ==
      Seq("delta_102.parquet", "delta_100.parquet", "base10.parquet"))
    assert(snap.dataFiles(at("2024-06-01T00:00:00Z")) ==
      Seq("delta_100.parquet", "base10.parquet"))
  }

  test("EQUAL window starts: default order breaks to later-registered, " +
    "strict order keeps the reference's stable first-registered-first") {
    val snap = SnapshotCodec.parse(
      """{"schema":{"columns":[]},"segments":[
        {"id":"10","start":"2024-01-01T00:00:00.000Z","file":"base10.parquet",
         "delta":[
          {"file":"d_first.parquet","start":"2024-02-01T00:00:00.000Z","end":"2024-02-02T00:00:00.0Z"},
          {"file":"d_second.parquet","start":"2024-02-01T00:00:00.000Z","end":"2024-02-03T00:00:00.0Z"}]}]}""")
    // default: later-registered first (the pre-seq later-commit-wins
    // tie-break for same-start commits)
    assert(snap.dataFiles(AsOf.Current) ==
      Seq("d_second.parquet", "d_first.parquet", "base10.parquet"))
    // strict: Rust's stable sort_by on start alone keeps registration
    // order (metadata.rs:56) — bit-for-bit reference-reader parity
    assert(snap.dataFilesWithStats(AsOf.Current, strictOrder = true)
      .map(_.file) ==
      Seq("d_first.parquet", "d_second.parquet", "base10.parquet"))
  }

  test("effectiveRanks orders (commit seq desc, precedence asc); " +
    "seq-less files keep pure precedence among themselves") {
    val entries = Seq(
      FileEntry("newest_start.parquet", None, seq = Some(3L)),
      FileEntry("dml.parquet", None, seq = Some(5L)),
      FileEntry("legacy.parquet", None, seq = None),
      FileEntry("base.parquet", None, seq = None))
    // ranks: dml (seq 5) first, then newest_start (seq 3), then the
    // seq-less two in list (precedence) order
    assert(graft.operators.AzofScan.effectiveRanks(entries) ==
      Seq(1, 0, 2, 3))
    // all seq-less = identity (pre-seq tables are bit-for-bit unchanged)
    val legacy = entries.map(_.copy(seq = None))
    assert(graft.operators.AzofScan.effectiveRanks(legacy) ==
      Seq(0, 1, 2, 3))
  }

  test("a seq-less delta appended to a seq-stamped table (foreign/" +
    "pre-upgrade writer) INHERITS the newest prior seq: it wins exact " +
    "ties by precedence instead of losing to every stamped file") {
    val snap = SnapshotCodec.parse(
      """{"schema":{"columns":[]},"segments":[
        {"id":"10","start":"2024-01-01T00:00:00.000Z","file":"base10.parquet",
         "delta":[
          {"file":"s2.parquet","start":"2024-02-01T00:00:00.000Z","end":"2024-02-02T00:00:00.0Z","seq":2},
          {"file":"s3.parquet","start":"2024-02-05T00:00:00.000Z","end":"2024-02-06T00:00:00.0Z","seq":3},
          {"file":"foreign.parquet","start":"2024-02-07T00:00:00.000Z","end":"2024-02-08T00:00:00.0Z"}]}]}""")
    val entries = snap.segments.head.dataFilesWithStats(AsOf.Current)
    // precedence order: newest start first
    assert(entries.map(_.file) == Seq("foreign.parquet", "s3.parquet",
      "s2.parquet", "base10.parquet"))
    // the foreign delta inherits seq 3 (registered after s3)...
    assert(entries.map(_.seq) ==
      Seq(Some(3L), Some(3L), Some(2L), None))
    // ...so ranks resolve its tie with s3 by precedence: foreign FIRST
    // — the pre-seq newer-window-start-wins behavior, not a silent
    // loss to every stamped file
    assert(graft.operators.AzofScan.effectiveRanks(entries) ==
      Seq(0, 1, 2, 3))
    // an UPGRADED pre-seq table (old seq-less deltas registered before
    // any stamped one) keeps those deltas ranked as the oldest commits
    val snap2 = SnapshotCodec.parse(
      """{"schema":{"columns":[]},"segments":[
        {"id":"10","start":"2024-01-01T00:00:00.000Z","file":"base10.parquet",
         "delta":[
          {"file":"old.parquet","start":"2024-02-01T00:00:00.000Z","end":"2024-02-02T00:00:00.0Z"},
          {"file":"s9.parquet","start":"2024-01-15T00:00:00.000Z","end":"2024-01-16T00:00:00.0Z","seq":9}]}]}""")
    val e2 = snap2.segments.head.dataFilesWithStats(AsOf.Current)
    // precedence: old (newer start) then s9; but s9 is the newer
    // COMMIT, so ranks put it first
    assert(e2.map(_.file) ==
      Seq("old.parquet", "s9.parquet", "base10.parquet"))
    assert(e2.map(_.seq) == Seq(None, Some(9L), None))
    assert(graft.operators.AzofScan.effectiveRanks(e2) == Seq(1, 0, 2))
  }
}
