package graft.format

import java.time.Instant
import org.scalacheck.{Gen, Arbitrary}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized round-trip hardening of the snapshot codec: for ANY
  * segment tree — arbitrary nesting, optional ends/files/stats, deltas,
  * op stamps, stream-batch indexes — `parse(render(s)) == s`, and the
  * rendered bytes are stable (render(parse(render(s))) == render(s)).
  * The example-based SnapshotCodecSpec pins the reference's exact
  * layouts; this pins the codec against shapes nobody wrote yet.
  */
class SnapshotCodecPropertySpec extends AnyFunSuite {

  private val instantGen: Gen[Instant] =
    Gen.chooseNum(0L, 4102444800000L).map(Instant.ofEpochMilli) // to year 2100

  private val nameGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(12).mkString)

  private val bloomGen: Gen[Option[KeyBloom]] =
    Gen.option(for {
      keys <- Gen.listOf(nameGen).map(_.take(8))
      bits <- Gen.oneOf(64, 256, 1024)
      k <- Gen.chooseNum(1, 5)
    } yield {
      val bytes = new Array[Byte](bits / 8)
      keys.foreach(kk => KeyBloom.put(bytes, kk, bits, k))
      KeyBloom.fromBytes(bytes, bits, k)
    })

  private val statsGen: Gen[Option[FileStats]] =
    Gen.option(for {
      a <- nameGen; b <- nameGen; bl <- bloomGen
      rows <- Gen.option(Gen.chooseNum(0L, 1000000L))
    } yield if (a <= b) FileStats(a, b, bl, rows = rows)
      else FileStats(b, a, bl, rows = rows))

  private val deltaGen: Gen[Delta] = for {
    f <- nameGen.map(_ + ".parquet")
    s <- instantGen
    len <- Gen.chooseNum(1L, 90L * 86400000L)
    st <- statsGen
    tomb <- Gen.oneOf(false, true)
    seq <- Gen.option(Gen.chooseNum(1L, 1000000L))
  } yield Delta(f, s, s.plusMillis(len), st, tombstone = tomb, seq = seq)

  private def segmentGen(depth: Int): Gen[Segment] = for {
    id <- nameGen
    start <- instantGen
    end <- Gen.option(Gen.chooseNum(1L, 400L * 86400000L)
      .map(d => start.plusMillis(d)))
    file <- Gen.option(nameGen.map(_ + ".parquet"))
    fileStats <- statsGen
    nKids <- if (depth <= 0) Gen.const(0) else Gen.chooseNum(0, 3)
    kids <- Gen.listOfN(nKids, segmentGen(depth - 1))
    deltas <- Gen.listOf(deltaGen).map(_.take(3))
  } yield Segment(id, start, end, file, kids, deltas, fileStats)

  private val snapshotGen: Gen[Snapshot] = for {
    nCols <- Gen.chooseNum(0, 5)
    cols <- Gen.listOfN(nCols, for {
      n <- nameGen
      t <- Gen.oneOf(ColumnType.all)
      nullable <- Arbitrary.arbBool.arbitrary
    } yield ColumnDef(n, t, nullable))
    nSegs <- Gen.chooseNum(0, 4)
    segs <- Gen.listOfN(nSegs, segmentGen(2))
    op <- Gen.option(Gen.oneOf("create", "commit-base", "commit-delta",
      "compact", "stream-delta#abc#7"))
    nB <- Gen.chooseNum(0, 3)
    batches <- Gen.mapOfN(nB, Gen.zip(nameGen, Gen.chooseNum(0L, 1000L)))
  } yield Snapshot(TableSchema(dedupByName(cols)), segs, op, batches)

  private def dedupByName(cols: Seq[ColumnDef]): Seq[ColumnDef] =
    cols.groupBy(_.name).map(_._2.head).toSeq.sortBy(_.name)

  test("parse(render(s)) == s and rendered bytes are stable, 200 random trees") {
    (1 to 200).foreach { i =>
      val snap = snapshotGen(Gen.Parameters.default, Seed(i.toLong * 31L))
        .getOrElse(fail(s"gen failed at $i"))
      val json = SnapshotCodec.render(snap)
      val back = SnapshotCodec.parse(json)
      assert(back == snap, s"seed $i round-trip mismatch\n$json")
      assert(SnapshotCodec.render(back) == json, s"seed $i unstable bytes")
    }
  }
}
