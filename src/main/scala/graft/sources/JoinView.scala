package graft.sources

import graft.format.{AsOf, ColumnDef, ColumnType, KeyFilter, Snapshot, TableSchema}
import graft.format.AzofTable
import java.time.Instant
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** What a JOIN view maintains: `fact JOIN dim ON fact.fkCol = dim.key`
  * then `GROUP BY groupCols` with `COUNT(*)` / `SUM` / `MIN`/`MAX` —
  * group columns drawn from EITHER side (`dimCols` names the dim-side
  * ones; they are the dim table's value columns), aggregated columns
  * from the fact side, `Int` non-nullable (the [[ViewDef]] contract).
  * Join semantics are INNER on the dim's RECORD KEY: a fact whose
  * `fkCol` names no live dim row contributes nothing.
  */
final case class JoinViewDef(
    groupCols: Seq[String],
    sumCols: Seq[String] = Nil,
    minMaxCols: Seq[String] = Nil,
    fkCol: String = "fk",
    dimCols: Seq[String] = Nil) {
  require(groupCols.nonEmpty, "a join view needs group columns")
  require(dimCols.forall(groupCols.contains),
    "dimCols must be a subset of groupCols (dim attributes only group)")
  require(!dimCols.contains(fkCol), "fkCol is a fact column")
  /** Group columns that live on the fact side. */
  def factGroupCols: Seq[String] = groupCols.filterNot(dimCols.contains)
  /** Fact columns the refresh reads. */
  def factNeeded: Seq[String] =
    (Seq(fkCol) ++ factGroupCols ++ sumCols ++ minMaxCols).distinct
}

/** PERSISTED incremental JOIN-aggregate view — [[MatView]]'s two-table
  * sibling, the classic warehouse denormalized rollup
  * (`SELECT d.attr, count(*), sum(f.v) FROM fact f JOIN dim d ON
  * f.fk = d.key GROUP BY d.attr`) maintained incrementally under churn
  * on BOTH tables:
  *
  *   - FACT churn (the [[MatView]] path, join-enriched): each batch's
  *     churned fact keys resolve their POST-state (newest batch row,
  *     enriched against the dim at the batch's END dim version) and
  *     PRE-state (live row at the fact cursor, enriched against the
  *     dim at the DIM CURSOR — exactly what the previous refresh
  *     counted), and additive aggregates upsert `old − pre + new`.
  *   - DIM churn moves every live fact referencing a churned dim key
  *     across groups WITHOUT those facts having changed: the refresh
  *     reads exactly those facts (one fact scan filtered to the
  *     churned foreign keys — an `In` value filter under the broadcast
  *     guard, so value-stats file skipping confines the read on an
  *     fk-clustered layout), subtracts their contribution under the
  *     dim's PRE-attributes (a churn-confined time-travel dim read —
  *     the dim key IS the record key, so key-stats skipping applies
  *     natively) and re-adds under the new attributes. A dim DELETE
  *     drops them (inner join); a dim INSERT adopts previously
  *     dangling facts.
  *   - `MIN`/`MAX` monoid-merge on groups that only gained rows and
  *     RESCAN groups that lost any — from one live fact⋈dim read at
  *     the refreshed version pair, semi-confined to those groups.
  *
  * Consistency contract: after every refresh, [[serve]] equals the
  * one-shot join-aggregate over BOTH tables' live states at the
  * consumed `(factVersion, dimVersion)` pair. The refresh is a
  * SYNCHRONOUS batch call (the [[ShardMap]] face): one mixed upsert
  * delta per consumed range, EXACTLY-ONCE via the `stream_batches`
  * guard keyed by the encoded version pair — and a crash between the
  * commit and the cursor write HEALS on the next call by reading the
  * guard's last applied pair back ([[graft.streaming.AzofSink
  * .lastCommitted]]) before deciding the range, so the addition
  * arithmetic can never double-apply. Source ROLLBACK on either table
  * keeps the family's epoch hatch ([[rebuildEpoch]]).
  */
object JoinView {

  /** Cursor sidecar: the consumed (fact, dim) version pair. */
  val CursorFileName = "_jv_cursor.json"

  private val Sep = "\u0001"

  /** Pack the version pair into one replay-guard batch id. Monotone in
    * refresh order (both components only grow), unique while a dim
    * history stays under 10^9 commits.
    */
  private def encode(f: Long, d: Long): Long = f * 1000000000L + d
  private def decode(b: Long): (Long, Long) =
    (b / 1000000000L, b % 1000000000L)

  final case class RefreshReport(
      fromFact: Long, toFact: Long, fromDim: Long, toDim: Long,
      touched: Long, noop: Boolean)

  /** The view table's value schema: dim-side group columns typed from
    * the dim schema, fact-side from the fact schema, aggregates i64.
    */
  def viewSchema(
      factSchema: TableSchema, dimSchema: TableSchema,
      jdef: JoinViewDef): TableSchema = {
    val factBy = factSchema.columns.map(c => c.name -> c).toMap
    val dimBy = dimSchema.columns.map(c => c.name -> c).toMap
    def defOf(n: String): ColumnDef =
      if (jdef.dimCols.contains(n))
        dimBy.getOrElse(n, throw new IllegalArgumentException(
          s"dim group column '$n' is not in the dim schema"))
      else factBy.getOrElse(n, throw new IllegalArgumentException(
        s"fact column '$n' is not in the fact schema"))
    val fk = factBy.getOrElse(jdef.fkCol,
      throw new IllegalArgumentException(
        s"fk column '${jdef.fkCol}' is not in the fact schema"))
    if (fk.dataType != ColumnType.AzString)
      throw new IllegalArgumentException(
        s"fk column '${jdef.fkCol}' must be a String (it joins to the " +
          "dim table's record key, which is a string — a numeric fk " +
          "would silently miss non-canonical renderings)")
    (jdef.sumCols ++ jdef.minMaxCols).foreach { c =>
      val d = defOf(c)
      if (jdef.dimCols.contains(c) || d.dataType != ColumnType.AzInt ||
          d.nullable)
        throw new IllegalArgumentException(
          s"aggregated column '$c' must be a non-nullable Int FACT column")
    }
    TableSchema(
      jdef.groupCols.map(g =>
        ColumnDef(g, defOf(g).dataType, nullable = false)) ++
        Seq(ColumnDef("n_rows", ColumnType.AzInt, nullable = false)) ++
        jdef.sumCols.map(c =>
          ColumnDef(s"sum_$c", ColumnType.AzInt, nullable = false)) ++
        jdef.minMaxCols.flatMap(c => Seq(
          ColumnDef(s"min_$c", ColumnType.AzInt, nullable = true),
          ColumnDef(s"max_$c", ColumnType.AzInt, nullable = true))))
  }

  /** Definition sidecar ([[MatView.DefFileName]]'s join twin): what the
    * view maintains and over which fact/dim pair — read back by the
    * automatic rewrite rule. Same-lake sources record relative so the
    * sidecar survives the lake directory moving.
    */
  val DefFileName = "_jv_def.json"

  def create(
      spark: SparkSession,
      factLake: String, factTable: String,
      dimLake: String, dimTable: String,
      idxLake: String, idxTable: String,
      jdef: JoinViewDef,
      segmentStart: Instant = Instant.parse("2024-01-01T00:00:00Z")): Unit = {
    val fs = AzofTable(spark, factLake, factTable).currentSnapshot.schema
    val ds = AzofTable(spark, dimLake, dimTable).currentSnapshot.schema
    val created = AzofWriter.createTableIfAbsent(
      spark, idxLake, idxTable, viewSchema(fs, ds, jdef), segmentStart)
    if (created)
      writeDef(spark, factLake, factTable, dimLake, dimTable,
        idxLake, idxTable, jdef)
    ()
  }

  private def writeDef(
      spark: SparkSession,
      factLake: String, factTable: String,
      dimLake: String, dimTable: String,
      idxLake: String, idxTable: String, jdef: JoinViewDef): Unit = {
    def arr(xs: Seq[String]) =
      xs.map(x => "\"" + x + "\"").mkString("[", ",", "]")
    def rel(lake: String): String =
      if (new org.apache.hadoop.fs.Path(lake) ==
        new org.apache.hadoop.fs.Path(idxLake)) "" else lake
    val dir = AzofTable(spark, idxLake, idxTable).tableDir
    val p = new org.apache.hadoop.fs.Path(dir, DefFileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(
      (s"""{"fact_path":"${rel(factLake)}","fact_table":"$factTable",""" +
        s""""dim_path":"${rel(dimLake)}","dim_table":"$dimTable",""" +
        s""""fk_col":"${jdef.fkCol}",""" +
        s""""group_cols":${arr(jdef.groupCols)},""" +
        s""""sum_cols":${arr(jdef.sumCols)},""" +
        s""""minmax_cols":${arr(jdef.minMaxCols)},""" +
        s""""dim_cols":${arr(jdef.dimCols)}}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The view's definition sidecar:
    * `(factLake, factTable, dimLake, dimTable, def)` — None when the
    * table has no sidecar.
    */
  def readDef(
      spark: SparkSession, idxLake: String, idxTable: String)
      : Option[(String, String, String, String, JoinViewDef)] = {
    val dir = AzofTable(spark, idxLake, idxTable).tableDir
    val p = new org.apache.hadoop.fs.Path(dir, DefFileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val root =
        try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
        finally in.close()
      def seq(f: String): Seq[String] = {
        val n = root.get(f)
        (0 until n.size()).map(i => n.get(i).asText())
      }
      def lake(f: String): String = {
        val v = root.get(f).asText
        if (v.isEmpty) idxLake else v
      }
      Some((lake("fact_path"), root.get("fact_table").asText,
        lake("dim_path"), root.get("dim_table").asText,
        JoinViewDef(seq("group_cols"), seq("sum_cols"), seq("minmax_cols"),
          root.get("fk_col").asText, seq("dim_cols"))))
    }
  }

  /** The rewrite rule's gate: the view equals the one-shot join
    * aggregate over both tables' CURRENT live states — cursor pair
    * consumed, and every later commit on EACH source view-preserving
    * ([[MatView.unchangedSince]]).
    */
  def isFresh(
      spark: SparkSession,
      factLake: String, factTable: String,
      dimLake: String, dimTable: String,
      idxLake: String, idxTable: String): Boolean =
    freshViewVersion(spark, factLake, factTable, dimLake, dimTable,
      idxLake, idxTable).isDefined

  /** [[isFresh]] that PINS the validated view version for the rewrite
    * rule's executed scan ([[MatView.freshViewVersion]]'s reasoning:
    * cursor before pin, refresh commits before cursor — the pinned
    * snapshot always carries at least the validated state).
    */
  def freshViewVersion(
      spark: SparkSession,
      factLake: String, factTable: String,
      dimLake: String, dimTable: String,
      idxLake: String, idxTable: String): Option[Long] = {
    val (dir, fs, p) = sidecarPath(spark, idxLake, idxTable)
    val _ = dir
    if (!fs.exists(p)) None
    else {
      val (f, d) = readCursor(spark, idxLake, idxTable)
      val v = AzofTable(spark, idxLake, idxTable).currentVersion.toLong
      if (MatView.unchangedSince(spark, factLake, factTable, f) &&
        MatView.unchangedSince(spark, dimLake, dimTable, d)) Some(v)
      else None
    }
  }

  private def sidecarPath(spark: SparkSession, idxLake: String,
      idxTable: String) = {
    val dir = AzofTable(spark, idxLake, idxTable).tableDir
    val p = new org.apache.hadoop.fs.Path(dir, CursorFileName)
    (dir, p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** The consumed (fact, dim) version pair, (1, 1) before the first
    * refresh (version 1 = the empty create snapshot of each source).
    */
  def readCursor(
      spark: SparkSession, idxLake: String, idxTable: String)
      : (Long, Long) = {
    val (_, fs, p) = sidecarPath(spark, idxLake, idxTable)
    if (!fs.exists(p)) (1L, 1L)
    else {
      val in = fs.open(p)
      val root =
        try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
        finally in.close()
      (root.get("factVersion").asLong, root.get("dimVersion").asLong)
    }
  }

  private def writeCursor(
      spark: SparkSession, idxLake: String, idxTable: String,
      f: Long, d: Long): Unit = {
    val (dir, fs, p) = sidecarPath(spark, idxLake, idxTable)
    AtomicReplace.replace(fs, dir, p,
      s"""{"factVersion":$f,"dimVersion":$d}""")
    ()
  }

  /** One synchronous catch-up of the view to both sources' current
    * main versions. See the object scaladoc for the three paths.
    */
  def refresh(
      spark: SparkSession,
      factLake: String, factTable: String,
      dimLake: String, dimTable: String,
      idxLake: String, idxTable: String,
      jdef: JoinViewDef,
      broadcastKeyMax: Long = DedupFlow.DefaultBroadcastKeyMax)
      : RefreshReport = {
    create(spark, factLake, factTable, dimLake, dimTable,
      idxLake, idxTable, jdef)
    val K = TableSchema.KeyName
    val appId = s"join-view#$idxTable"
    val fact = AzofTable(spark, factLake, factTable)
    val dim = AzofTable(spark, dimLake, dimTable)
    // heal the cursor from the replay guard: a crash between commit
    // and cursor write left the guard ahead of the sidecar
    var (fPrev, dPrev) = readCursor(spark, idxLake, idxTable)
    graft.streaming.AzofSink
      .lastCommitted(spark, idxLake, idxTable, appId)
      .filter(_ > encode(fPrev, dPrev))
      .foreach { applied =>
        val (hf, hd) = decode(applied)
        writeCursor(spark, idxLake, idxTable, hf, hd)
        fPrev = hf; dPrev = hd
      }
    val fNow = fact.currentVersion.toLong
    val dNow = dim.currentVersion.toLong
    if (fNow < fPrev || dNow < dPrev)
      throw new IllegalStateException(
        s"source went backwards (fact $fPrev→$fNow, dim $dPrev→$dNow) — " +
          "a rollback needs rebuildEpoch, the feed's documented contract")
    if (fNow == fPrev && dNow == dPrev)
      return RefreshReport(fPrev, fNow, dPrev, dNow, 0L, noop = true)

    val factSnapNow = fact.snapshot(fNow.toString)
    val factSnapPrev = fact.snapshot(fPrev.toString)
    val dimSnapNow = dim.snapshot(dNow.toString)
    val dimSnapPrev = dim.snapshot(dPrev.toString)

    def newestOf(churn: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(K)).orderBy(col("_commit_version").desc)
      churn.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
    }
    // ---- dim transition (empty frames when the dim didn't move)
    val dimChurn = newestOf(
      AzofChangeFeed.between(spark, dimLake, dimTable, dPrev, dNow))
      .localCheckpoint(true)
    val nDimChurn = dimChurn.count()
    val dimKeysSmall = nDimChurn <= broadcastKeyMax
    val dimChurnKeySet: Set[String] =
      if (dimKeysSmall) dimChurn.select(col(K)).collect()
        .map(_.getString(0)).toSet
      else Set.empty
    def dimScan(snap: Snapshot, confineTo: Option[Set[String]]): DataFrame =
      graft.operators.AzofScan.scanSnapshot(spark, dim, snap, AsOf.Current,
        projection = Some((Set(K) ++ jdef.dimCols).toSet),
        keyFilter = confineTo.map(KeyFilter.Keys(_)))
    // churned dim keys' PRE-attributes (live at the dim cursor)
    val dimPre =
      (if (nDimChurn == 0)
        dimScan(dimSnapPrev, None).limit(0)
      else if (dimKeysSmall) dimScan(dimSnapPrev, Some(dimChurnKeySet))
      else dimScan(dimSnapPrev, None)
        .join(dimChurn.select(col(K)), Seq(K), "left_semi"))
        .withColumnRenamed(K, "_dk")
    val dimNew = dimChurn.where(!col("_deleted"))
      .select((Seq(col(K).as("_dk")) ++ jdef.dimCols.map(col)): _*)

    // ---- fact churn
    val factChurn = newestOf(
      AzofChangeFeed.between(spark, factLake, factTable, fPrev, fNow))
      .localCheckpoint(true)
    val nFactChurn = factChurn.count()
    val factKeysSmall = nFactChurn <= broadcastKeyMax
    def factScan(snap: Snapshot, keys: Option[Set[String]],
        fkIn: Option[Seq[Any]]): DataFrame =
      graft.operators.AzofScan.scanSnapshot(spark, fact, snap,
        AsOf.Current,
        projection = Some((Set(K) ++ jdef.factNeeded).toSet),
        keyFilter = keys.map(KeyFilter.Keys(_)),
        valueFilters = fkIn.toSeq.map(vs =>
          org.apache.spark.sql.sources.In(jdef.fkCol, vs.toArray)))
    val factNewRows = factChurn.where(!col("_deleted"))
      .select((Seq(col(K)) ++ jdef.factNeeded.map(col)): _*)
    val factPreRows =
      if (nFactChurn == 0) factNewRows.limit(0)
      else if (factKeysSmall) {
        val keys = factChurn.select(col(K)).collect()
          .map(_.getString(0)).toSet
        factScan(factSnapPrev, Some(keys), None)
      } else factScan(factSnapPrev, None, None)
        .join(factChurn.select(col(K)), Seq(K), "left_semi")

    // ---- A: live, un-churned facts whose dim attribute moved
    val affFacts =
      if (nDimChurn == 0) factNewRows.limit(0)
      else {
        val base =
          if (dimKeysSmall)
            factScan(factSnapNow, None,
              Some(dimChurnKeySet.toSeq))
              .where(col(jdef.fkCol).isin(dimChurnKeySet.toSeq: _*))
          else factScan(factSnapNow, None, None)
            .join(dimChurn.select(col(K).as(jdef.fkCol)),
              Seq(jdef.fkCol), "left_semi")
        base.join(factChurn.select(col(K)), Seq(K), "left_anti")
      }
    val affCk = affFacts.localCheckpoint(true)

    val outCols = jdef.groupCols ++ jdef.sumCols ++ jdef.minMaxCols
    def enriched(facts: DataFrame, dimSide: DataFrame): DataFrame =
      facts.join(dimSide, facts(jdef.fkCol) === dimSide("_dk"))
        .select(outCols.distinct.map(col): _*)

    val adds = enriched(affCk, dimNew)
      .unionByName(enriched(factNewRows,
        if (nFactChurn == 0) dimNew.limit(0)
        else dimScan(dimSnapNow, None).withColumnRenamed(K, "_dk")))
    val subs = enriched(affCk, dimPre)
      .unionByName(enriched(factPreRows,
        if (nFactChurn == 0) dimNew.limit(0)
        else dimScan(dimSnapPrev, None).withColumnRenamed(K, "_dk")))

    def groupAgg(rows: DataFrame, pfx: String): DataFrame = {
      val aggs: Seq[Column] =
        Seq(count(lit(1)).as(s"${pfx}n")) ++
          jdef.sumCols.map(c => sum(col(c)).as(s"${pfx}s_$c")) ++
          jdef.minMaxCols.flatMap(c => Seq(
            min(col(c)).as(s"${pfx}mn_$c"),
            max(col(c)).as(s"${pfx}mx_$c")))
      rows.groupBy(jdef.groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
    val touched = groupAgg(adds, "_a_")
      .join(groupAgg(subs, "_p_"), jdef.groupCols, "full_outer")
      .localCheckpoint(true)
    graft.operators.Blocks.freeReferenced(affCk)
    graft.operators.Blocks.freeReferenced(dimChurn.toDF())
    graft.operators.Blocks.freeReferenced(factChurn.toDF())
    val nTouched = touched.count()
    if (nTouched == 0L) {
      writeCursor(spark, idxLake, idxTable, fNow, dNow)
      return RefreshReport(fPrev, fNow, dPrev, dNow, 0L, noop = false)
    }
    // ---- min/max rescan: groups that LOST rows recompute from the
    // live fact⋈dim at the refreshed version pair
    val rescan =
      if (jdef.minMaxCols.isEmpty) touched.limit(0)
      else touched.where(col("_p_n").isNotNull)
        .select(jdef.groupCols.map(col): _*)
    val nRescan = if (jdef.minMaxCols.isEmpty) 0L else rescan.count()
    val rescanAgg: Option[DataFrame] =
      if (nRescan == 0L) None
      else {
        val liveJoin = enriched(
          factScan(factSnapNow, None, None),
          dimScan(dimSnapNow, None).withColumnRenamed(K, "_dk"))
        val confined =
          if (nRescan <= broadcastKeyMax)
            liveJoin.join(broadcast(rescan), jdef.groupCols, "left_semi")
          else liveJoin.join(rescan, jdef.groupCols, "left_semi")
        val aggs: Seq[Column] = jdef.minMaxCols.flatMap(c => Seq(
          min(col(c)).as(s"_r_mn_$c"), max(col(c)).as(s"_r_mx_$c")))
        Some(confined.groupBy(jdef.groupCols.map(col): _*)
          .agg(aggs.head, aggs.tail: _*))
      }
    // ---- merge with the view's old totals (the MatView shape)
    val oldCols =
      jdef.groupCols.map(col) ++
        Seq(col("n_rows").as("_o_n")) ++
        jdef.sumCols.map(c => col(s"sum_$c").as(s"_o_s_$c")) ++
        jdef.minMaxCols.flatMap(c => Seq(
          col(s"min_$c").as(s"_o_mn_$c"),
          col(s"max_$c").as(s"_o_mx_$c")))
    val existing = graft.operators.AzofScan.scan(spark, idxLake, idxTable)
      .select(oldCols: _*)
    val touchedOld =
      if (nTouched <= broadcastKeyMax)
        existing.join(
          broadcast(touched.select(jdef.groupCols.map(col): _*)),
          jdef.groupCols, "left_semi")
      else existing
    val merged = touched.join(touchedOld, jdef.groupCols, "left")
    val withRescan = rescanAgg match {
      case Some(r) => merged.join(r, jdef.groupCols, "left")
      case None =>
        jdef.minMaxCols.foldLeft(merged)((d, c) => d
          .withColumn(s"_r_mn_$c", lit(null).cast("long"))
          .withColumn(s"_r_mx_$c", lit(null).cast("long")))
    }
    def z(c: Column): Column = coalesce(c, lit(0L))
    val finalCols: Seq[Column] =
      Seq(
        concat_ws(Sep, jdef.groupCols.map(g => col(g).cast("string")): _*)
          .as(K),
        lit(java.sql.Timestamp.from(MatView.ViewStamp))
          .as(TableSchema.EventTimeName)) ++
        jdef.groupCols.map(col) ++
        Seq((z(col("_o_n")) + z(col("_a_n")) - z(col("_p_n")))
          .as("n_rows")) ++
        jdef.sumCols.map(c =>
          (z(col(s"_o_s_$c")) + z(col(s"_a_s_$c")) - z(col(s"_p_s_$c")))
            .as(s"sum_$c")) ++
        jdef.minMaxCols.flatMap(c => Seq(
          when(col("_p_n").isNotNull, col(s"_r_mn_$c"))
            .otherwise(least(col(s"_o_mn_$c"), col(s"_a_mn_$c")))
            .as(s"min_$c"),
          when(col("_p_n").isNotNull, col(s"_r_mx_$c"))
            .otherwise(greatest(col(s"_o_mx_$c"), col(s"_a_mx_$c")))
            .as(s"max_$c")))
    val rows = withRescan.select(finalCols: _*)
    graft.streaming.AzofSink.commitBatch(idxLake, idxTable, rows,
      encode(fNow, dNow), appId)
    writeCursor(spark, idxLake, idxTable, fNow, dNow)
    graft.operators.Blocks.freeReferenced(touched.toDF())
    RefreshReport(fPrev, fNow, dPrev, dNow, nTouched, noop = false)
  }

  /** The served view — every live group's totals ([[MatView.serve]]'s
    * shape).
    */
  def serve(
      spark: SparkSession,
      idxLake: String, idxTable: String, jdef: JoinViewDef,
      version: Option[Long] = None): DataFrame = {
    val cols = jdef.groupCols ++ Seq("n_rows") ++
      jdef.sumCols.map(c => s"sum_$c") ++
      jdef.minMaxCols.flatMap(c => Seq(s"min_$c", s"max_$c"))
    val t = AzofTable(spark, idxLake, idxTable)
    val snap = version.map(v => t.snapshot(v.toString))
      .getOrElse(t.currentSnapshot)
    graft.operators.AzofScan.scanSnapshot(spark, t, snap, AsOf.Current)
      .where(col("n_rows") > 0L)
      .select(cols.map(col): _*)
  }

  /** Epoch hatch after a ROLLBACK on either source: retrain the view
    * one-shot from both tables' CURRENT live states into `newTable`.
    */
  def rebuildEpoch(
      spark: SparkSession,
      factLake: String, factTable: String,
      dimLake: String, dimTable: String,
      idxLake: String, newTable: String,
      jdef: JoinViewDef, at: Instant): Long = {
    val fact = AzofTable(spark, factLake, factTable)
    val dim = AzofTable(spark, dimLake, dimTable)
    val (fNow, dNow) =
      (fact.currentVersion.toLong, dim.currentVersion.toLong)
    create(spark, factLake, factTable, dimLake, dimTable,
      idxLake, newTable, jdef, at)
    val facts = graft.operators.AzofScan.scan(spark, factLake, factTable)
      .select(jdef.factNeeded.map(col): _*)
    val dims = graft.operators.AzofScan.scan(spark, dimLake, dimTable)
      .select((Seq(col(TableSchema.KeyName).as("_dk")) ++
        jdef.dimCols.map(col)): _*)
    val outCols = jdef.groupCols ++ jdef.sumCols ++ jdef.minMaxCols
    val joined = facts.join(dims, facts(jdef.fkCol) === dims("_dk"))
      .select(outCols.distinct.map(col): _*)
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n_rows")) ++
        jdef.sumCols.map(c => sum(col(c)).as(s"sum_$c")) ++
        jdef.minMaxCols.flatMap(c => Seq(
          min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    val agg = joined.groupBy(jdef.groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val rows = agg.select(
      (Seq(
        concat_ws(Sep, jdef.groupCols.map(g => col(g).cast("string")): _*)
          .as(TableSchema.KeyName),
        lit(java.sql.Timestamp.from(at)).as(TableSchema.EventTimeName)) ++
        jdef.groupCols.map(col) ++
        Seq(col("n_rows")) ++
        jdef.sumCols.map(c => col(s"sum_$c")) ++
        jdef.minMaxCols.flatMap(c =>
          Seq(col(s"min_$c"), col(s"max_$c")))): _*)
    val n = rows.count()
    if (n > 0) AzofWriter.commitDelta(spark, idxLake, newTable, rows, at, at)
    writeCursor(spark, idxLake, newTable, fNow, dNow)
    n
  }
}
