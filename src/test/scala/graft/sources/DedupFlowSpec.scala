package graft.sources

import graft.TestSpark
import graft.format.{AzofTable, TableSchema}
import graft.operators.Dedup
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end incremental dedup ([[DedupFlow]]): each crawl-batch
  * ingest (CDC churn → signature catch-up → churn-confined candidates
  * → Jaccard verify → component merge) keeps the persisted assignment
  * ≡ the one-shot pipeline recomputed over the evolved corpus, and
  * serving elects live canonicals under deletes.
  *
  * Doc families are chosen so LSH banding is KNOWN under the real
  * MinHash coefficients (probed, not assumed): `wfam`/`vfam` members
  * (7 shared words + a variant tail, Jaccard 5/7) band pairwise;
  * `mwin` sliding windows over m1..m16 band all three pairs while only
  * the adjacent ones verify at ≥ 0.5 (8/12 = 0.67) — the far pair
  * (6/14 = 0.43) is the candidate the verifier must REJECT.
  */
class DedupFlowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Instant.parse(s)

  private val srcSchema = graft.format.TableSchema(Seq(
    graft.format.ColumnDef("text", graft.format.ColumnType.AzString,
      nullable = false)))

  private def rows(docs: Seq[(Long, String)], at: String) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map { case (i, t) =>
        Row(i.toString, Timestamp.from(ts(at)), t) }),
      srcSchema.toStruct)

  private def fam(prefix: String, last: String) =
    ((1 to 7).map(w => s"$prefix$w") :+ last).mkString(" ")
  private def mwin(from: Int) =
    (from until from + 12).map(w => s"m$w").mkString(" ")

  /** One-shot recompute of the whole pipeline over the CURRENT corpus:
    * d02-shaped LSH candidates → n-gram Jaccard ≥ 0.5 → connected
    * components.
    */
  private def oneShot(lake: String): Map[Long, Long] = {
    val cur = graft.operators.AzofScan.scan(spark, lake, "docs")
      .select(col(TableSchema.KeyName).cast("long").as("doc_id"),
        col("text"))
    val cands = Dedup.lshCandidates(
      Dedup.minhashBands(cur, col("text"), col("doc_id"),
        k = MinHashIndex.K, bandSize = MinHashIndex.BandSize),
      MinHashIndex.NBands)
    val sh = Dedup.shingles(cur, col("text"), col("doc_id"))
    val pairs = Dedup.ngramJaccard(cands, sh)
      .where(col("jaccard") >= 0.5)
    Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def assignment(idxLake: String): Map[Long, Long] =
    CcIndex.assignment(spark, idxLake, "components")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("incremental ingests ≡ one-shot pipeline; cross-batch cluster merge; no-op") {
    val srcLake = Files.createTempDirectory("azof-ddf-src").toString
    val idxLake = Files.createTempDirectory("azof-ddf-idx").toString
    val ck = Files.createTempDirectory("azof-ddf-ck").toString
    AzofWriter.createTable(spark, srcLake, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))                                    // v1
    AzofWriter.commitBase(spark, srcLake, "docs", rows(Seq(
      1L -> fam("w", "alpha"),
      2L -> fam("w", "beta"),
      3L -> fam("v", "alpha"),
      4L -> "completely different text entirely",
      11L -> mwin(1),    // m1..m12
      13L -> mwin(5)),   // m5..m16: candidate with 11, Jaccard 0.43
      "2024-01-02T00:00:00Z"))                                       // v2
    DedupFlow.create(spark, idxLake)

    val r1 = DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake,
      ck, ts("2024-02-01T00:00:00Z"))
    assert(!r1.noop && r1.fromVersion == 1 && r1.toVersion == 2)
    assert(r1.churned == 6)
    assert(r1.candidates >= 2,
      s"(1,2) and the to-reject (11,13) must both be candidates: $r1")
    val a1 = assignment(idxLake)
    assert(a1 == oneShot(srcLake), s"ingest 1 diverged: $a1")
    assert(a1(1L) == 1L && a1(2L) == 1L, "wfam pair should cluster")
    assert(!a1.contains(11L) && !a1.contains(13L),
      "the 0.43-Jaccard candidate must be rejected by verification")

    // batch 2: doc 12 = m3..m14 bridges 11 and 13 (0.67 with each) —
    // the ingest must MERGE the two singletons into one component
    // rooted at 11; doc 6 joins 3's vfam
    AzofWriter.commitDelta(spark, srcLake, "docs", rows(Seq(
      12L -> mwin(3),
      6L -> fam("v", "beta")),
      "2024-02-05T00:00:00Z"),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3

    val r2 = DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake,
      ck, ts("2024-03-01T00:00:00Z"))
    assert(r2.fromVersion == 2 && r2.toVersion == 3 && r2.churned == 2)
    val a2 = assignment(idxLake)
    assert(a2 == oneShot(srcLake), s"ingest 2 diverged: $a2")
    assert(a2(11L) == 11L && a2(12L) == 11L && a2(13L) == 11L,
      "doc 12 must merge 11 and 13 into one component")
    assert(a2(3L) == 3L && a2(6L) == 3L)

    // no-op ingest: nothing new — no index version, cursor unchanged
    val ccVerBefore =
      AzofTable(spark, idxLake, "components").currentVersion.toLong
    val r3 = DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake,
      ck, ts("2024-04-01T00:00:00Z"))
    assert(r3.noop && r3.relabeled == 0)
    assert(AzofTable(spark, idxLake, "components")
      .currentVersion.toLong == ccVerBefore)
    assert(DedupFlow.readCursor(spark, idxLake, "components")
      .contains(3L))
  }

  test("deleted canonical hands off to the next live member; revision joins a cluster") {
    val srcLake = Files.createTempDirectory("azof-ddf2-src").toString
    val idxLake = Files.createTempDirectory("azof-ddf2-idx").toString
    val ck = Files.createTempDirectory("azof-ddf2-ck").toString
    AzofWriter.createTable(spark, srcLake, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, srcLake, "docs", rows(Seq(
      1L -> fam("w", "alpha"),
      2L -> fam("w", "beta"),
      3L -> fam("w", "gamma"),
      7L -> "some totally unrelated filler words"),
      "2024-01-02T00:00:00Z"))                                       // v2
    DedupFlow.create(spark, idxLake)
    DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake,
      ck, ts("2024-02-01T00:00:00Z"))
    assert(assignment(idxLake) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))

    def survivorIds(): Set[Long] =
      DedupFlow.survivors(spark, srcLake, "docs", idxLake)
        .collect().map(_.getLong(0)).toSet
    assert(survivorIds() == Set(1L, 7L))

    // delete the canonical: serving must elect 2, the next live member
    AzofWriter.commitDelete(spark, srcLake, "docs", Seq("1"),
      ts("2024-02-02T00:00:00Z"))                                    // v3
    val r2 = DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake,
      ck, ts("2024-03-01T00:00:00Z"))
    assert(r2.churned == 1 && r2.verified == 0,
      "a delete churns its key but verifies no pairs")
    assert(survivorIds() == Set(2L, 7L),
      "cluster must survive through its next live member")

    // doc 7 revised into the wfam: next ingest clusters it; the
    // monotone assignment keeps 1's old label row, serving ignores it
    AzofWriter.commitDelta(spark, srcLake, "docs", rows(Seq(
      7L -> fam("w", "delta")),
      "2024-03-05T00:00:00Z"),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))        // v4
    val r3 = DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake,
      ck, ts("2024-04-01T00:00:00Z"))
    assert(r3.churned == 1 && r3.verified > 0)
    val a = assignment(idxLake)
    assert(a(7L) == 1L, "revised doc joins the component (label = min ever)")
    assert(survivorIds() == Set(2L),
      "one live survivor for the merged family")
  }

  test("ingest batching invariance: per-commit ≡ single catch-up ≡ one-shot (add-only)") {
    // the cadence property an operator needs to be schedulable: HOW
    // OFTEN a pipeline ingests must not change what it computes. Holds
    // for add-only histories (each doc's text is the text every ingest
    // sees); revisions break it by design — intermediate versions
    // contribute pair evidence a coarser ingest never observes — which
    // is exactly the monotone-merge contract rebuildEpoch reconciles.
    val srcLake = Files.createTempDirectory("azof-ddf4-src").toString
    val fineIdx = Files.createTempDirectory("azof-ddf4-fine").toString
    val coarseIdx = Files.createTempDirectory("azof-ddf4-coarse").toString
    val fineCk = Files.createTempDirectory("azof-ddf4-fck").toString
    val coarseCk = Files.createTempDirectory("azof-ddf4-cck").toString
    AzofWriter.createTable(spark, srcLake, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    DedupFlow.create(spark, fineIdx)
    DedupFlow.create(spark, coarseIdx)

    def fineIngest(at: String): Unit = {
      DedupFlow.ingest(spark, srcLake, "docs", "text", fineIdx,
        fineCk, ts(at)); ()
    }

    // batch 1: two families + the far m-window pair (candidate, but
    // Jaccard-rejected) + filler
    AzofWriter.commitBase(spark, srcLake, "docs", rows(Seq(
      1L -> fam("w", "alpha"),
      5L -> fam("v", "alpha"),
      11L -> mwin(1),
      13L -> mwin(5),
      20L -> "completely unrelated filler document text"),
      "2024-01-10T00:00:00Z"))                                       // v2
    fineIngest("2024-02-01T00:00:00Z")
    // batch 2: grow the w family
    AzofWriter.commitDelta(spark, srcLake, "docs", rows(Seq(
      2L -> fam("w", "beta"),
      3L -> fam("w", "gamma")),
      "2024-02-10T00:00:00Z"),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    fineIngest("2024-03-01T00:00:00Z")
    // batch 3: the m-window bridge lands late -> cross-ingest merge
    AzofWriter.commitDelta(spark, srcLake, "docs", rows(Seq(
      12L -> mwin(3),
      6L -> fam("v", "beta")),
      "2024-03-10T00:00:00Z"),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))        // v4
    fineIngest("2024-04-01T00:00:00Z")
    // batch 4: one more straggler into each family
    AzofWriter.commitDelta(spark, srcLake, "docs", rows(Seq(
      4L -> fam("w", "delta"),
      14L -> mwin(5)),  // exact duplicate text of 13
      "2024-04-10T00:00:00Z"),
      ts("2024-04-01T00:00:00Z"), ts("2024-05-01T00:00:00Z"))        // v5
    fineIngest("2024-05-01T00:00:00Z")

    // the coarse flow sees the whole history in ONE catch-up
    val rc = DedupFlow.ingest(spark, srcLake, "docs", "text", coarseIdx,
      coarseCk, ts("2024-05-01T00:00:00Z"))
    assert(rc.fromVersion == 1 && rc.toVersion == 5)

    val fine = CcIndex.assignment(spark, fineIdx, "components")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val coarse = CcIndex.assignment(spark, coarseIdx, "components")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = oneShot(srcLake)
    assert(fine == coarse,
      s"ingest cadence changed the result:\nfine   $fine\ncoarse $coarse")
    assert(fine == batch, s"flow diverged from one-shot:\n$fine\n$batch")
    assert(fine(12L) == 11L && fine(13L) == 11L && fine(14L) == 11L,
      "late bridge + exact twin must fold into the 11-rooted component")
    assert(Set(1L, 2L, 3L, 4L).forall(fine(_) == 1L))
    assert(!fine.contains(20L))
  }

  test("bootstrap ingest over a populated source: hints withdrawn past the threshold, result identical") {
    // the scale trap the guard closes: the FIRST ingest against an
    // already-populated source consumes the entire CDC history, so
    // churn = every key in the corpus — and broadcast() is obeyed
    // regardless of size. Past broadcastKeyMax the flow must run the
    // same computation WITHOUT forced broadcasts (AQE may still choose
    // them from measured sizes — that's fine; the forced hint is not).
    val srcLake = Files.createTempDirectory("azof-ddf5-src").toString
    val idxA = Files.createTempDirectory("azof-ddf5-a").toString
    val idxB = Files.createTempDirectory("azof-ddf5-b").toString
    val ckA = Files.createTempDirectory("azof-ddf5-cka").toString
    val ckB = Files.createTempDirectory("azof-ddf5-ckb").toString
    AzofWriter.createTable(spark, srcLake, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, srcLake, "docs", rows(Seq(
      1L -> fam("w", "alpha"),
      2L -> fam("w", "beta"),
      3L -> fam("v", "alpha"),
      6L -> fam("v", "beta"),
      11L -> mwin(1),
      12L -> mwin(3),
      13L -> mwin(5),
      20L -> "completely unrelated filler document text"),
      "2024-01-02T00:00:00Z"))                                       // v2

    // the churn-side joins carry NO broadcast hint when the caller's
    // measured churn is past the threshold…
    DedupFlow.create(spark, idxA)
    MinHashIndex.refresh(spark, srcLake, "docs", "text", idxA,
      "minhash_sig", ckA).awaitTermination()
    val churn = spark.range(1, 21).toDF("id")
    def hints(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.size
    val unhinted = MinHashIndex.candidatesTouching(
      spark, idxA, "minhash_sig", churn, hintBroadcast = false)
    assert(hints(unhinted) == 0,
      "bootstrap shape must not force any broadcast")
    // …and the hinted shape really is the hinted shape: the two
    // endpoint-filter hints are visible on the returned frame (the
    // hot-bucket hints sit behind the pair emit's localCheckpoint cut)
    val hinted = MinHashIndex.candidatesTouching(
      spark, idxA, "minhash_sig", churn, hintBroadcast = true)
    assert(hints(hinted) == 2, s"expected 2 forced broadcasts on the " +
      s"endpoint filters, got ${hints(hinted)}")
    // the two shapes agree on the pairs
    assert(unhinted.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == hinted.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)

    // a full bootstrap ingest with the threshold at 0 (every hint
    // withdrawn, CC merge included) lands the same assignment as the
    // hinted steady-state path and the one-shot recompute
    val rA = DedupFlow.ingest(spark, srcLake, "docs", "text", idxA,
      ckA, ts("2024-02-01T00:00:00Z"), broadcastKeyMax = 0L)
    assert(rA.churned == 8)
    DedupFlow.create(spark, idxB)
    DedupFlow.ingest(spark, srcLake, "docs", "text", idxB,
      ckB, ts("2024-02-01T00:00:00Z"))
    val a = assignment(idxA)
    assert(a == CcIndex.assignment(spark, idxB, "components")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "guarded bootstrap diverged from the hinted path")
    assert(a == oneShot(srcLake), "guarded bootstrap diverged from one-shot")
  }

  private def rowsK(docs: Seq[(String, String)], at: String) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map { case (k, t) =>
        Row(k, Timestamp.from(ts(at)), t) }),
      srcSchema.toStruct)

  test("string-keyed corpus: ingest→candidates→CC→survivors end-to-end through the key map") {
    val srcLake = Files.createTempDirectory("azof-ddf7-src").toString
    val idxLake = Files.createTempDirectory("azof-ddf7-idx").toString
    val ck = Files.createTempDirectory("azof-ddf7-ck").toString
    val km = Some("key_map")
    AzofWriter.createTable(spark, srcLake, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, srcLake, "docs", rowsK(Seq(
      "u/alpha" -> fam("w", "alpha"),
      "u/beta" -> fam("w", "beta"),
      "z/one" -> fam("v", "alpha"),
      "a/solo" -> "completely unrelated filler document text"),
      "2024-01-02T00:00:00Z"))                                       // v2
    DedupFlow.create(spark, idxLake, keyMap = km)

    // without the key map the long-keyed path refuses loudly
    val e = intercept[Exception] {
      DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake,
        Files.createTempDirectory("azof-ddf7-ckx").toString,
        ts("2024-02-01T00:00:00Z"))
    }
    assert(e.getMessage != null || e.getCause != null) // raise_error path

    def survivorMap(): Map[String, Boolean] =
      DedupFlow.survivorsKeyed(spark, srcLake, "docs", idxLake)
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap

    val r1 = DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake,
      ck, ts("2024-02-01T00:00:00Z"), keyMap = km)
    assert(r1.churned == 4 && r1.verified >= 1)
    assert(survivorMap() == Map(
      "u/alpha" -> true,   // canonical of the w-family (min key)
      "z/one" -> false,    // unclustered so far
      "a/solo" -> false))

    // only PAIR-INVOLVED keys get surrogate ids — the mapping grows
    // with the near-dup neighborhood, not the corpus
    val minted1 = KeyMap.ids(spark, idxLake, "key_map")
      .collect().map(_.getString(0)).toSet
    assert(minted1 == Set("u/alpha", "u/beta"), s"minted: $minted1")

    // batch 2: "m/two" bridges into the v-family; canonical is the
    // lexicographic min KEY ("m/two" < "z/one") — id-agnostic election
    AzofWriter.commitDelta(spark, srcLake, "docs", rowsK(Seq(
      "m/two" -> fam("v", "beta")),
      "2024-02-05T00:00:00Z"),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    val r2 = DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake,
      ck, ts("2024-03-01T00:00:00Z"), keyMap = km)
    assert(r2.churned == 1 && r2.verified >= 1)
    assert(survivorMap() == Map(
      "u/alpha" -> true,
      "m/two" -> true,
      "a/solo" -> false))

    // deleted canonical hands off to the next live KEY
    AzofWriter.commitDelete(spark, srcLake, "docs", Seq("u/alpha"),
      ts("2024-03-02T00:00:00Z"))                                    // v4
    DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake,
      ck, ts("2024-04-01T00:00:00Z"), keyMap = km)
    assert(survivorMap() == Map(
      "u/beta" -> true,
      "m/two" -> true,
      "a/solo" -> false))

    // re-ingest: noop, and the map is stable (no re-minting)
    val r4 = DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake,
      ck, ts("2024-05-01T00:00:00Z"), keyMap = km)
    assert(r4.noop)
    assert(KeyMap.ids(spark, idxLake, "key_map").count() == 4)
  }

  test("retention: 20 ingests with retain=3 keep both index tables' histories bounded") {
    // without retention a continuously-refreshed flow accretes one
    // snapshot per table per ingest forever (~9k/year/table at hourly
    // cadence); the retain knob self-vacuums after each ingest and must
    // not change what the index computes
    val srcLake = Files.createTempDirectory("azof-ddf6-src").toString
    val idxLake = Files.createTempDirectory("azof-ddf6-idx").toString
    val ck = Files.createTempDirectory("azof-ddf6-ck").toString
    AzofWriter.createTable(spark, srcLake, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, srcLake, "docs", rows(Seq(
      1L -> fam("w", "alpha")), "2024-01-02T00:00:00Z"))             // v2
    DedupFlow.create(spark, idxLake)

    def snapCount(lake: String, table: String): Int =
      new java.io.File(lake, table).listFiles
        .count(_.getName.matches("s\\d+\\.json"))

    (1 to 20).foreach { i =>
      // every batch adds one more w-family member -> the cluster grows
      // and BOTH tables commit every ingest
      AzofWriter.commitDelta(spark, srcLake, "docs", rows(Seq(
        (100L + i) -> fam("w", s"var$i")),
        f"2024-01-${math.min(2 + i, 28)}%02dT01:00:00Z"),
        ts("2024-01-01T00:00:00Z"), ts("2024-06-01T00:00:00Z"))
      DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake,
        ck, ts(f"2024-06-01T00:${i}%02d:00Z"),
        retain = 3, retainMinAgeMs = 0L)
    }
    assert(snapCount(idxLake, "minhash_sig") <= 3,
      s"signature history unbounded: ${snapCount(idxLake, "minhash_sig")}")
    assert(snapCount(idxLake, "components") <= 3,
      s"components history unbounded: ${snapCount(idxLake, "components")}")
    // the vacuumed index still serves the exact one-shot result
    assert(assignment(idxLake) == oneShot(srcLake),
      "retention changed the computed assignment")
    val surv = DedupFlow.survivors(spark, srcLake, "docs", idxLake)
      .collect().map(_.getLong(0)).toSet
    assert(surv == Set(1L), "one canonical for the whole family")
  }

  test("epoch rebuild reconciles similarity-breaking revisions the monotone merge cannot") {
    val srcLake = Files.createTempDirectory("azof-ddf3-src").toString
    val idxLake = Files.createTempDirectory("azof-ddf3-idx").toString
    val ck = Files.createTempDirectory("azof-ddf3-ck").toString
    AzofWriter.createTable(spark, srcLake, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, srcLake, "docs", rows(Seq(
      1L -> fam("w", "alpha"),
      2L -> fam("w", "beta"),
      3L -> fam("w", "gamma")),
      "2024-01-02T00:00:00Z"))                                       // v2
    DedupFlow.create(spark, idxLake)
    DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake,
      ck, ts("2024-02-01T00:00:00Z"))
    assert(assignment(idxLake) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))

    // doc 2's revision BREAKS its similarity; the monotone merge keeps
    // the stale cluster membership by contract
    AzofWriter.commitDelta(spark, srcLake, "docs", rows(Seq(
      2L -> "entirely rewritten unrelated content now present here"),
      "2024-02-05T00:00:00Z"),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    val r2 = DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake,
      ck, ts("2024-03-01T00:00:00Z"))
    assert(r2.relabeled == 0 && assignment(idxLake)(2L) == 1L,
      "monotone: the broken pair must NOT split the component")

    // the rebuild re-clusters the current corpus into a fresh epoch:
    // doc 2 leaves the cluster, the old epoch stays intact
    DedupFlow.rebuildEpoch(spark, srcLake, "docs", "text", idxLake,
      ck, ts("2024-04-01T00:00:00Z"))
    val next = CcIndex.assignment(spark, idxLake, "components_next")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(next == Map(1L -> 1L, 3L -> 1L),
      s"rebuilt epoch must drop the revised doc from the cluster: $next")
    assert(next == oneShot(srcLake), "rebuilt epoch ≡ one-shot recompute")
    assert(assignment(idxLake)(2L) == 1L, "old epoch untouched")
    assert(DedupFlow.readCursor(spark, idxLake, "components_next")
      .contains(3L), "new epoch's cursor seeds at the rebuilt version")

    // serving from the new epoch elects 1 and ships the reconciled 2
    val surv = DedupFlow.survivors(spark, srcLake, "docs", idxLake,
      "components_next").collect().map(_.getLong(0)).toSet
    assert(surv == Set(1L, 2L),
      "reconciled doc 2 ships as its own document again")

    // post-rebuild ingests continue against the NEW epoch: doc 4 joins
    // the w-family through the rebuilt table's cursor
    AzofWriter.commitDelta(spark, srcLake, "docs", rows(Seq(
      4L -> fam("w", "delta")),
      "2024-04-05T00:00:00Z"),
      ts("2024-04-01T00:00:00Z"), ts("2024-05-01T00:00:00Z"))        // v4
    val r3 = DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake,
      ck, ts("2024-05-01T00:00:00Z"), ccTable = "components_next")
    assert(r3.churned == 1 && r3.verified >= 2)
    val next2 = CcIndex.assignment(spark, idxLake, "components_next")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(next2 == Map(1L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("applyVerdict tombstones non-canonical docs; idempotent; resurrectable") {
    val srcLake = Files.createTempDirectory("azof-ddf-ap-src").toString
    val idxLake = Files.createTempDirectory("azof-ddf-ap-idx").toString
    val ck = Files.createTempDirectory("azof-ddf-ap-ck").toString
    AzofWriter.createTable(spark, srcLake, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, srcLake, "docs", rows(Seq(
      1L -> fam("w", "alpha"),
      2L -> fam("w", "beta"),       // near-dup of 1 -> non-canonical
      4L -> "completely different text entirely"),   // singleton: kept
      "2024-01-02T00:00:00Z"))
    DedupFlow.create(spark, idxLake)
    DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake, ck,
      ts("2024-02-01T00:00:00Z"))
    val vBefore = AzofTable(spark, srcLake, "docs").currentVersion.toLong

    val n = DedupFlow.applyVerdict(spark, srcLake, "docs", idxLake,
      at = ts("2024-03-01T00:00:00Z"))
    assert(n == 1)
    val live = graft.operators.AzofScan.scan(spark, srcLake, "docs")
      .select(TableSchema.KeyName).collect().map(_.getString(0)).sorted
    assert(live.toSeq == Seq("1", "4"),
      "canonical 1 and singleton 4 survive; near-dup 2 tombstoned")
    // pre-apply state still time-travels
    assert(graft.operators.AzofScan
      .scan(spark, srcLake, "docs",
        graft.format.AsOf.EventTime(ts("2024-02-15T00:00:00Z")))
      .count() == 3)
    // idempotent: second apply deletes nothing, commits nothing
    val vAfter = AzofTable(spark, srcLake, "docs").currentVersion.toLong
    assert(vAfter == vBefore + 1)
    assert(DedupFlow.applyVerdict(spark, srcLake, "docs", idxLake,
      at = ts("2024-03-02T00:00:00Z")) == 0)
    assert(AzofTable(spark, srcLake, "docs").currentVersion.toLong == vAfter)
  }

  test("applyVerdict composes with the LM stats index: the takedown's " +
    "tombstones subtract exactly — served scores ≡ live retrain with " +
    "NO epoch rebuild") {
    val srcLake = Files.createTempDirectory("azof-ddf-aplm-src").toString
    val idxLake = Files.createTempDirectory("azof-ddf-aplm-idx").toString
    val ck = Files.createTempDirectory("azof-ddf-aplm-ck").toString
    val lmCk = Files.createTempDirectory("azof-ddf-aplm-lmck").toString
    AzofWriter.createTable(spark, srcLake, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, srcLake, "docs", rows(Seq(
      1L -> fam("w", "alpha"),
      2L -> fam("w", "beta"),       // near-dup of 1 -> non-canonical
      4L -> "completely different text entirely"),
      "2024-01-02T00:00:00Z"))
    DedupFlow.create(spark, idxLake)
    DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake, ck,
      ts("2024-02-01T00:00:00Z"))
    LmIndex.create(spark, idxLake)
    def lmRefresh(): Unit = {
      val q = LmIndex.refresh(spark, srcLake, "docs", "text",
        idxLake, "lm_stats", lmCk)
      assert(q.awaitTermination(120000))
    }
    def served() = LmIndex.score(spark, srcLake, "docs", "text",
        idxLake, "lm_stats")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1).toSeq
    def retrain() = graft.operators.TextAnalysis.lmScore(
      graft.operators.AzofScan.scan(spark, srcLake, "docs")
        .select(col(TableSchema.KeyName).as("doc_id"), col("text")),
      col("text"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1).toSeq
    lmRefresh()
    assert(served() == retrain(), "pre-takedown: index-served ≡ retrain")
    // the engine's OWN takedown: near-dup 2 tombstones on main
    assert(DedupFlow.applyVerdict(spark, srcLake, "docs", idxLake,
      at = ts("2024-03-01T00:00:00Z")) == 1L)
    lmRefresh()
    assert(served() == retrain(),
      "post-takedown: the tombstone's pre-image subtracts — index-served " +
        "≡ retrain over the shrunken corpus, no rebuildEpoch")
    assert(served().forall(_._1 != "2"), "the dropped doc no longer scores")
  }

  test("applyVerdict stages the takedown on a branch: main live until " +
    "publish_preview-sized tombstones fast-forward") {
    val srcLake = Files.createTempDirectory("azof-ddf-apbr-src").toString
    val idxLake = Files.createTempDirectory("azof-ddf-apbr-idx").toString
    val ck = Files.createTempDirectory("azof-ddf-apbr-ck").toString
    AzofWriter.createTable(spark, srcLake, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, srcLake, "docs", rows(Seq(
      1L -> fam("w", "alpha"),
      2L -> fam("w", "beta"),
      4L -> "completely different text entirely"),
      "2024-01-02T00:00:00Z"))
    DedupFlow.create(spark, idxLake)
    DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake, ck,
      ts("2024-02-01T00:00:00Z"))
    AzofWriter.createBranch(spark, srcLake, "docs", "takedown")
    val vBefore = AzofTable(spark, srcLake, "docs").currentVersion.toLong

    val n = DedupFlow.applyVerdict(spark, srcLake, "docs", idxLake,
      at = ts("2024-03-01T00:00:00Z"), branch = Some("takedown"))
    assert(n == 1)
    // main untouched: pointer AND view
    assert(AzofTable(spark, srcLake, "docs").currentVersion.toLong == vBefore)
    assert(graft.operators.AzofScan.scan(spark, srcLake, "docs")
      .count() == 3, "main still serves all 3 docs while staged")
    // the preview sizes the staged takedown: 1 delete, 0 upserts
    val prev = AzofChangeFeed.branchDiff(spark, srcLake, "docs", "takedown")
      .select(TableSchema.KeyName, "_deleted").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toSeq
    assert(prev == Seq("2" -> true))
    // publish: the takedown goes live in one commit
    AzofWriter.fastForward(spark, srcLake, "docs", "takedown")
    val live = graft.operators.AzofScan.scan(spark, srcLake, "docs")
      .select(TableSchema.KeyName).collect().map(_.getString(0)).sorted
    assert(live.toSeq == Seq("1", "4"))
    // post-publish, a fresh apply (no branch) has nothing left to do
    assert(DedupFlow.applyVerdict(spark, srcLake, "docs", idxLake,
      at = ts("2024-03-02T00:00:00Z")) == 0)
  }

  test("applyVerdict composes a SemDeDup index: near-dup AND semantic drops") {
    val lake = Files.createTempDirectory("azof-ddf-sem").toString
    val semCk = Files.createTempDirectory("azof-ddf-sem-ck").toString
    // source doubles as the sem index's vector corpus: docs 1 and 2 are
    // the SAME direction (sem near-dups, higher id 2 drops), doc 30 is
    // orthogonal (kept); no textual near-dups, so the CC index is empty
    // and every doc survives the near-dup gate
    val vecSchema = graft.format.TableSchema(Seq(
      graft.format.ColumnDef("vec", graft.format.ColumnType.AzString,
        nullable = false)))
    def vrows(ids: Seq[Long]) = spark.createDataFrame(
      spark.sparkContext.parallelize(ids.map { i =>
        val v = if (i < 10) Array(1.0, 0.0) else Array(0.0, 1.0)
        Row(i.toString, Timestamp.from(ts("2024-01-02T00:00:00Z")),
          v.mkString("[", ",", "]"))
      }), vecSchema.toStruct)
    AzofWriter.createTable(spark, lake, "emb", vecSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "emb", vrows(Seq(1L, 2L, 30L)))
    SemDedupIndex.create(spark, lake, "emb", "vec", lake, "sem",
      k = 2, threshold = 0.9)
    SemDedupIndex.refresh(spark, lake, "emb", "vec", lake, "sem", semCk)
      .awaitTermination(120000)

    DedupFlow.create(spark, lake)
    val n = DedupFlow.applyVerdict(spark, lake, "emb", lake,
      semIndex = Some((lake, "sem")), at = ts("2024-03-01T00:00:00Z"))
    assert(n == 1, s"only the semantic dup should drop: $n")
    val live = graft.operators.AzofScan.scan(spark, lake, "emb")
      .select(TableSchema.KeyName).collect().map(_.getString(0)).sorted
    assert(live.toSeq == Seq("1", "30"))
  }
}
