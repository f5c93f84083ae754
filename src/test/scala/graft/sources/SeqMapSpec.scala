package graft.sources

import graft.TestSpark
import graft.format.{AzofTable, TableSchema}
import graft.operators.Packing
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted incremental sequence packing ([[SeqMap]]): first
  * refresh ≡ one-shot [[Packing.packSequences]]; later batches append
  * token spans after the high-water mark; emission reads each doc's
  * text AS OF its mint epoch, so revisions and deletes after minting
  * never change an artifact (while purge leaves a hole by contract).
  */
class SeqMapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Instant.parse(s)

  private val srcSchema = graft.format.TableSchema(Seq(
    graft.format.ColumnDef("text", graft.format.ColumnType.AzString,
      nullable = false)))

  private def rows(docs: Seq[(String, String)], at: String) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map { case (k, t) =>
        Row(k, Timestamp.from(ts(at)), t) }),
      srcSchema.toStruct)

  private def spans(l: String): Map[String, (Long, Long, Long, Long)] =
    SeqMap.assignment(spark, l, "seq_map")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap

  test("first refresh ≡ one-shot packSequences; batch 2 appends after " +
    "the token HWM without moving epoch-1 spans") {
    val l = Files.createTempDirectory("azof-seqmap").toString
    AzofWriter.createTable(spark, l, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    val batch1 = Seq(
      "a" -> "one two three four five",
      "b" -> "six seven eight",
      "c" -> "nine ten eleven twelve")
    AzofWriter.commitBase(spark, l, "docs",
      rows(batch1, "2024-01-02T00:00:00Z"))
    SeqMap.create(spark, l, budget = 4L, salt = "t")

    val r1 = SeqMap.refresh(spark, l, "docs", "text", l,
      at = ts("2024-02-01T00:00:00Z"))
    assert(r1.assigned == 3 && r1.nextToken == 12, s"$r1")
    val epoch1 = spans(l)
    val oneShot = Packing.packSequences(
      rows(batch1, "2024-01-02T00:00:00Z"),
      col("text"), col(TableSchema.KeyName), budget = 4L, salt = "t")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(epoch1 == oneShot, s"$epoch1 vs $oneShot")

    AzofWriter.commitDelta(spark, l, "docs",
      rows(Seq("d" -> "more words arrive now"), "2024-02-15T00:00:00Z"),
      ts("2024-02-15T00:00:00Z"), ts("2024-02-15T00:00:00Z"))
    val r2 = SeqMap.refresh(spark, l, "docs", "text", l,
      at = ts("2024-03-01T00:00:00Z"))
    assert(r2.assigned == 1 && r2.nextToken == 16, s"$r2")
    val all = spans(l)
    assert(batch1.forall { case (k, _) => all(k) == epoch1(k) })
    assert(all("d") == ((4L, 12L, 3L, 3L)), s"${all("d")}")

    // replay: no-op
    assert(SeqMap.refresh(spark, l, "docs", "text", l,
      at = ts("2024-03-02T00:00:00Z")).noop)
  }

  test("a 20-epoch backlog flush proceeds in bounded slices with " +
    "key-confined per-epoch reads (counting-FS pin), content exact") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.seqfs.impl", classOf[SeqCountingFs].getName)
    spark.conf.set("spark.hadoop.fs.seqfs.impl",
      classOf[SeqCountingFs].getName)
    val local = Files.createTempDirectory("azof-seqmap-backlog").toString
    val l = s"seqfs:$local"
    val out = Files.createTempDirectory("azof-seqmap-backlog-out").toString
    AzofWriter.createTable(spark, l, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    SeqMap.create(spark, l, budget = 4L, salt = "t")
    // 20 single-doc commits, one refresh each -> 20 epochs, each doc
    // exactly one 4-token sequence (single-doc batches make the packing
    // order the commit order regardless of the shuffle salt)
    (1 to 20).foreach { i =>
      AzofWriter.commitDelta(spark, l, "docs",
        rows(Seq(f"d$i%02d" -> s"p${i}w1 p${i}w2 p${i}w3 p${i}w4"),
          f"2024-01-${i + 1}%02dT00:00:00Z"),
        ts(f"2024-01-${i + 1}%02dT00:00:00Z"),
        ts(f"2024-01-${i + 1}%02dT00:00:00Z"))
      val r = SeqMap.refresh(spark, l, "docs", "text", l,
        at = ts(f"2024-02-${i}%02dT00:00:00Z"))
      assert(r.assigned == 1, s"$r")
    }
    SeqCountingFs.reset()
    val er = SeqMap.emitSequences(spark, l, "docs", "text", l, "seq_map",
      out, maxEpochsPerEmit = 4)
    assert(er.fromSeq == 0L && er.untilSeq == 20L && er.sequences == 20L,
      s"$er")
    // key-confined per-epoch reads: each of the 20 epochs opens only
    // the one data file holding ITS doc (times parquet's few opens per
    // file). Unconfined reads would be ~20 epochs x 20+ files.
    val opens = SeqCountingFs.total.get()
    assert(opens > 0, "counting FS saw no reads — vacuous")
    assert(opens <= 200,
      s"per-epoch reads must be key-confined: $opens docs-file opens")
    // content exact across the 5 slices: sequence k = doc k+1's words
    val got = spark.read.parquet(out)
      .select("seq_id", "seq_text", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val want = (1 to 20).map(i =>
      ((i - 1).toLong, s"p${i}w1 p${i}w2 p${i}w3 p${i}w4", 4L))
    assert(got == want, s"$got")
    // every slice advanced the cursor: re-emission is a no-op
    assert(SeqMap.emitSequences(spark, l, "docs", "text", l, "seq_map",
      out, maxEpochsPerEmit = 4).noop)

    // sequences CROSSING epoch boundaries still cut exactly under
    // slicing (incl. the forced-progress over-cap slice when one
    // sequence spans more epochs than the cap)
    val l2 = Files.createTempDirectory("azof-seqmap-cross").toString
    val out2 = Files.createTempDirectory("azof-seqmap-cross-out").toString
    AzofWriter.createTable(spark, l2, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    SeqMap.create(spark, l2, budget = 7L, salt = "t")
    // six 3-word docs: 18 tokens, budget 7 -> 2 complete + 1 partial;
    // every sequence spans 2-3 single-doc epochs, cap 1 forces the
    // over-cap slice path
    (1 to 6).foreach { i =>
      AzofWriter.commitDelta(spark, l2, "docs",
        rows(Seq(f"e$i" -> s"q${i}a q${i}b q${i}c"),
          f"2024-01-${i + 1}%02dT00:00:00Z"),
        ts(f"2024-01-${i + 1}%02dT00:00:00Z"),
        ts(f"2024-01-${i + 1}%02dT00:00:00Z"))
      SeqMap.refresh(spark, l2, "docs", "text", l2,
        at = ts(f"2024-02-${i}%02dT00:00:00Z"))
    }
    val er2 = SeqMap.emitSequences(spark, l2, "docs", "text", l2,
      "seq_map", out2, flush = true, maxEpochsPerEmit = 1)
    assert(er2.sequences == 3L && er2.flushedPartial, s"$er2")
    val toks = (1 to 6).flatMap(i => Seq(s"q${i}a", s"q${i}b", s"q${i}c"))
    val want2 = toks.grouped(7).zipWithIndex.map { case (g, k) =>
      (k.toLong, g.mkString(" "), g.size.toLong) }.toSeq
    val got2 = spark.read.parquet(out2)
      .select("seq_id", "seq_text", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got2 == want2, s"$got2 vs $want2")
  }

  test("emission is the frozen cut: complete sequences only, " +
    "append-only; a revision after minting emits the MINT-TIME " +
    "text; a delete after minting still emits; flush cuts the tail") {
    val l = Files.createTempDirectory("azof-seqmap2").toString
    val out = Files.createTempDirectory("azof-seqout").toString
    AzofWriter.createTable(spark, l, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    // 10 tokens over budget 4: sequences 0,1 complete, seq 2 partial
    AzofWriter.commitBase(spark, l, "docs", rows(Seq(
      "a" -> "a1 a2 a3 a4 a5",
      "b" -> "b1 b2 b3",
      "c" -> "c1 c2"), "2024-01-02T00:00:00Z"))
    SeqMap.create(spark, l, budget = 4L, salt = "t")
    SeqMap.refresh(spark, l, "docs", "text", l,
      at = ts("2024-02-01T00:00:00Z"))

    // revise 'a' and delete 'b' AFTER minting, BEFORE emitting: the
    // artifact must still be the epoch-1 cut
    AzofWriter.commitDelta(spark, l, "docs",
      rows(Seq("a" -> "REVISED totally different much longer text now"),
        "2024-02-10T00:00:00Z"),
      ts("2024-02-10T00:00:00Z"), ts("2024-02-10T00:00:00Z"))
    AzofWriter.commitDelete(spark, l, "docs", Seq("b"),
      ts("2024-02-11T00:00:00Z"))

    val e1 = SeqMap.emitSequences(spark, l, "docs", "text", l,
      "seq_map", out)
    assert(e1.fromSeq == 0 && e1.untilSeq == 2 && e1.sequences == 2, s"$e1")
    val seqs = spark.read.parquet(out).orderBy("seq_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(seqs.forall(_._3 == 4L), s"${seqs.toSeq}")
    val emitted = seqs.map(_._2).mkString(" ").split(" ").toSet
    // mint-time tokens of a and b are all present; the revision's
    // tokens are nowhere
    assert(emitted.contains("b1") && emitted.contains("a1"))
    assert(!emitted.contains("revised"), s"${seqs.toSeq}")

    // replay no-op; the revision/delete minted nothing (revision keys
    // anti-join away, deletes never mint)
    assert(SeqMap.emitSequences(spark, l, "docs", "text", l,
      "seq_map", out).noop)
    val rr = SeqMap.refresh(spark, l, "docs", "text", l,
      at = ts("2024-03-01T00:00:00Z"))
    assert(rr.assigned == 0, s"$rr")

    // flush cuts the trailing partial (10 tokens => 2 in seq 2)
    val e2 = SeqMap.emitSequences(spark, l, "docs", "text", l,
      "seq_map", out, flush = true)
    assert(e2.flushedPartial && e2.sequences == 1, s"$e2")
    val tail = spark.read.parquet(out).where(col("seq_id") === 2)
      .collect()
    assert(tail.length == 1 && tail(0).getLong(2) == 2L,
      tail.mkString(","))
  }
}

/** RawLocalFileSystem counting TOTAL open() calls on the `docs` table's
  * parquet files — the key-confined per-epoch-read pin for
  * [[SeqMap.emitSequences]]'s backlog flush.
  */
class SeqCountingFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "seqfs"
  override def getUri: java.net.URI = java.net.URI.create("seqfs:///")
  override def open(f: org.apache.hadoop.fs.Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    val s = f.toString
    if (s.contains("/docs/") && s.endsWith(".parquet")) {
      SeqCountingFs.total.incrementAndGet(); ()
    }
    super.open(f, bufferSize)
  }
}

object SeqCountingFs {
  val total = new java.util.concurrent.atomic.AtomicLong(0L)
  def reset(): Unit = total.set(0L)
}
