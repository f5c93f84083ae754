package graft.sources

import graft.format.{AsOf, ColumnDef, ColumnType, KeyFilter, TableSchema}
import graft.format.AzofTable
import graft.streaming.AzofSink
import java.time.Instant
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** A DERIVED group key: a deterministic scalar SQL expression over
  * source columns, stored in the view under `name` with the declared
  * azof type (the refresh CASTs the expression's result to it) — the
  * time-bucketed rollup shape (`date_trunc('day', ts)`), the classic
  * reason a warehouse view groups by something the table doesn't
  * store. The automatic rewrite matches a query grouping by the SAME
  * expression (canonicalized Catalyst comparison, so aliases and
  * column order don't matter). Sessions must run under UTC (the
  * engine-wide azof DateTime contract): a timezone-sensitive bucket
  * evaluated under one zone at refresh and another at query time
  * would silently disagree, so create/refresh assert UTC and the
  * rewrite refuses candidacy off it.
  */
final case class DerivedGroup(
    name: String, sql: String, dataType: ColumnType) {
  require(name.nonEmpty, "a derived group needs a name")
  require(sql.nonEmpty, "a derived group needs an expression")
  /** Source columns the expression reads (unresolved parse — existence
    * is validated against the source schema in [[MatView.viewSchema]]).
    */
  lazy val srcRefs: Seq[String] =
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(sql)
      .collect {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          u.name
      }.distinct
}

/** A query's read PIN on one table, as the rewrite rule's freshness
  * gates consume it: a `VERSION AS OF` version, or a `TIMESTAMP AS OF`
  * event-time coordinate (None = the un-pinned Current read).
  */
sealed trait ReadPin
object ReadPin {
  final case class Version(v: Long) extends ReadPin
  final case class EventTime(t: Instant) extends ReadPin
}

object DerivedGroup {

  /** Parse the `"name:Type=sql[;name2:Type2=sql2]"` derived-group spec
    * shared by the CLI `--derived` flag and the SQL procedures'
    * `derived` parameter (entries split on ';' so the sql may contain
    * commas). Malformed entries fail with the offending text, never a
    * bare MatchError.
    */
  def parseList(v: String): Seq[DerivedGroup] =
    Option(v).toSeq.flatMap(_.split(";").map(_.trim).filter(_.nonEmpty))
      .map { entry =>
        val (head, sql) = entry.span(_ != '=')
        require(sql.startsWith("="),
          s"derived entry needs 'name:Type=sql': $entry")
        require(head.contains(":"),
          s"derived entry needs 'name:Type=sql' (no ':' before '='): " +
            entry)
        val Array(nm, tpe) = head.split(":", 2).map(_.trim)
        DerivedGroup(nm, sql.drop(1).trim,
          graft.format.ColumnType.fromJsonName(tpe))
      }
}

/** What a materialized view maintains: `GROUP BY groupCols` with
  * `COUNT(*)`, `SUM(c)` + `COUNT(c)` per `sumCols` entry,
  * `MIN(c)`/`MAX(c)` per `minMaxCols` entry, exact `COUNT(DISTINCT c)`
  * per `distinctCols` entry (refcounted support table), and
  * `derivedGroups` expression buckets — over the LIVE rows of one azof
  * table. Sum columns must be `Int` (i64) but MAY be nullable: the
  * view carries a per-column non-null count (`nn_<c>`) alongside each
  * running sum, which is exactly what makes SQL's null-skipping
  * `SUM`/`COUNT(c)`/`AVG` incrementally maintainable — `sum_<c>` adds
  * `old − pre + new` over non-null values only, `COUNT(c)` serves from
  * `nn_<c>`, and a group whose live values are all NULL serves
  * `SUM = NULL` (`nn = 0`) instead of a silent 0. Min/max columns may
  * be `Int`, `String`, or `DateTime`, nullable or not — the
  * monoid-merge/loss-rescan machinery is type-agnostic (`Boolean`
  * min/max stays refused: use `MAX(CAST(b AS INT))` semantics
  * upstream). Group columns must be non-null in the data (they join as
  * equi-keys and concatenate into the view's record key) and must not
  * contain U+0001 — asserted per refresh, not assumed.
  */
final case class ViewDef(
    groupCols: Seq[String],
    sumCols: Seq[String] = Nil,
    minMaxCols: Seq[String] = Nil,
    distinctCols: Seq[String] = Nil,
    derivedGroups: Seq[DerivedGroup] = Nil,
    distinctTuples: Seq[Seq[String]] = Nil,
    approxCols: Seq[String] = Nil,
    filter: Option[String] = None,
    varCols: Seq[String] = Nil) {
  require(groupCols.nonEmpty, "a materialized view needs group columns")
  require(filter.forall(_.trim.nonEmpty),
    "a view filter must be a non-empty SQL predicate (omit it for the " +
      "unfiltered view)")
  require(varCols.forall(sumCols.contains),
    "variance columns must also be declared sum columns — VAR/STDDEV " +
      "decompose over (count, sum, sum-of-squares), and the view " +
      "stores the first two as sum_<c>/nn_<c>")
  require(varCols.distinct.size == varCols.size,
    "variance columns must be distinct")
  require(approxCols.forall(c => !groupCols.contains(c)),
    "APPROX_COUNT_DISTINCT over a group column needs no sketch — view " +
      "rows are distinct group tuples; declare non-group columns only")
  require(distinctCols.forall(c => !groupCols.contains(c)),
    "COUNT(DISTINCT <group col>) needs no support table — view rows " +
      "are distinct group tuples; declare only non-group distinct cols")
  require(distinctTuples.forall(_.size >= 2),
    "a distinct TUPLE needs at least two columns — declare single " +
      "columns in distinctCols")
  require(distinctTuples.forall(t => t.distinct.size == t.size),
    "a distinct tuple's columns must be distinct")
  require(distinctTuples.flatten.forall(c => !groupCols.contains(c)),
    "distinct tuple components must not be group columns (the pairs " +
      "already key every group tuple — a group component only " +
      "re-encodes it redundantly); declare non-group columns only, " +
      "matching JoinViewDef's contract")
  require(distinctTuples.map(_.mkString(",")).distinct.size ==
    distinctTuples.size, "distinct tuples must be distinct")
  require((distinctCols ++ distinctTuples.flatten).forall(!_.contains(",")),
    "distinct column names must not contain ',' (the tuple dcol " +
      "encoding joins component names with it)")
  require(derivedGroups.map(_.name).distinct.size == derivedGroups.size,
    "derived group names must be distinct")
  require(derivedGroups.forall(dg => groupCols.contains(dg.name)),
    "every derived group must be listed in groupCols (it IS a group " +
      "column, just computed)")
  require(derivedGroups.forall(dg =>
    !(sumCols ++ minMaxCols ++ distinctCols ++
      distinctTuples.flatten ++ approxCols).contains(dg.name)),
    "derived groups are group columns — they cannot be aggregated")
  /** Whether the view maintains a distinct support table. */
  def hasDistinct: Boolean =
    distinctCols.nonEmpty || distinctTuples.nonEmpty
  /** The support-table `dcol` name of a declared tuple. */
  def tupleNames: Seq[String] = distinctTuples.map(_.mkString(","))
  /** Derived group names. */
  def derivedNames: Seq[String] = derivedGroups.map(_.name)
  /** Group columns stored verbatim from the source (not derived). */
  def physGroupCols: Seq[String] =
    groupCols.filterNot(derivedNames.contains)
  /** Source columns the FILTER predicate reads (unresolved parse —
    * existence is validated against the source schema at create).
    */
  lazy val filterRefs: Seq[String] = filter.toSeq.flatMap(f =>
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(f)
      .collect {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          u.name
      }).distinct
  /** Source columns the view reads. */
  def needed: Seq[String] =
    (physGroupCols ++ sumCols ++ minMaxCols ++ distinctCols ++
      distinctTuples.flatten ++ approxCols ++
      derivedGroups.flatMap(_.srcRefs) ++ filterRefs).distinct
}

/** PERSISTED incremental materialized aggregate view — the engine's
  * "dynamic table": a `GROUP BY` aggregate over an azof table's live
  * rows, stored as its own azof table and refreshed INCREMENTALLY from
  * the source's commit-exact change feed, so a 100-TB corpus pays
  * per-refresh cost proportional to the BATCH, not the corpus.
  *
  * Consistency contract (the [[CcIndex]] family rule): after every
  * refresh, [[MatView.serve]] equals the one-shot `GROUP BY` over the
  * source's LIVE corpus at the batch's end version — under inserts,
  * re-upserts, revisions (including group-moving revisions), and
  * deletes alike. The machinery is [[LmIndex]]'s pre-image subtraction
  * generalized from one hard-coded aggregate to a declared [[ViewDef]]:
  *
  *   - Each batch resolves every churned key's POST-state (its newest
  *     batch row; nothing for a tombstone) and PRE-state (its live row
  *     at the batch's predecessor version — ONE time-travel scan,
  *     key-stats pruned to the churned keys under the broadcast guard).
  *   - `COUNT`/`SUM` are group homomorphisms with inverses, so the
  *     refresh upserts `old − pre + new` for exactly the touched
  *     groups — no corpus read at all on this path.
  *   - `MIN`/`MAX` have no inverse: a group is monoid-merged
  *     (`least`/`greatest` of old and batch values) while its batch
  *     history is insert-only, and RECOMPUTED — from one live scan at
  *     the batch's end version, semi-joined (and, for single-column
  *     groups under the guard, value-stats file-skipped via an `In`
  *     pushdown) to exactly the groups that lost rows — only when a
  *     pre-image landed in it. A crawl-shaped workload (append-heavy,
  *     rare takedowns) therefore almost never rescans, and a takedown
  *     rescan is confined to the affected groups' files wherever the
  *     layout clusters by the group column ([[AzofWriter.compact]]'s
  *     by-key / Z-order modes); on an unclustered layout it degrades
  *     to one parallel corpus read, never a corpus-wide shuffle.
  *
  * Scale shape of the merge: batch-side aggregates are churn-sized; the
  * view's Current scan is group-cardinality-bounded; a steady-state
  * batch broadcast-semi-filters the view scan in ONE pass with no view
  * shuffle, and a bootstrap catch-up falls back to the plain shuffle
  * join (`broadcastKeyMax`, the measured-guard rule — never an
  * unconditional hint). One exactly-once delta per micro-batch commits
  * through the `stream_batches` replay guard. Fully-emptied groups
  * persist with `n_rows = 0` (and null min/max); [[serve]] filters them
  * so the served view is retrain-exact. [[AzofWriter.rollback]] on the
  * source — the one state change with NO feed event — keeps the
  * documented [[rebuildEpoch]] hatch, exactly like every other
  * persisted index in the family.
  */
object MatView {

  /** The one event_time every view row carries: successive upserts of a
    * group tie on (key, event_time) and the pinned default-mode
    * tie-break (commit seq desc) serves the newest totals — a wall
    * clock here would be the only nondeterminism in a replayable index.
    */
  val ViewStamp: Instant = Instant.parse("2024-01-02T00:00:00Z")

  /** Group-tuple record-key separator: group values must not contain
    * U+0001 (documented contract, same class as non-null group values).
    */
  private val Sep = "\u0001"

  /** The view table's value schema for `view` over `srcSchema`: the
    * group columns under their source types, then `n_rows`, per sum
    * column `sum_<c>` + its non-null count `nn_<c>` (both i64), and
    * `min_<c>`/`max_<c>` under the SOURCE column's type. Validates the
    * [[ViewDef]] contract.
    */
  def viewSchema(srcSchema: TableSchema, view: ViewDef): TableSchema = {
    val byName = srcSchema.columns.map(c => c.name -> c).toMap
    val derivedBy = view.derivedGroups.map(dg => dg.name -> dg).toMap
    def defOf(n: String): ColumnDef = byName.getOrElse(n,
      throw new IllegalArgumentException(
        s"view column '$n' is not in the source schema " +
          s"(${srcSchema.columns.map(_.name).mkString(", ")})"))
    def groupDefOf(n: String): ColumnDef = derivedBy.get(n) match {
      case Some(dg) => ColumnDef(n, dg.dataType, nullable = false)
      case None => defOf(n)
    }
    view.derivedGroups.foreach { dg =>
      if (byName.contains(dg.name))
        throw new IllegalArgumentException(
          s"derived group '${dg.name}' shadows a source column — " +
            "pick a fresh name (the stored column is the expression's " +
            "value, not the source's)")
      dg.srcRefs.foreach(defOf) // every referenced column must exist
    }
    view.sumCols.foreach { c =>
      if (defOf(c).dataType != ColumnType.AzInt)
        throw new IllegalArgumentException(
          s"sum column '$c' must be an Int (nullable is fine — the " +
            "view tracks a per-column non-null count)")
    }
    view.minMaxCols.foreach { c =>
      if (defOf(c).dataType == ColumnType.AzBoolean)
        throw new IllegalArgumentException(
          s"min/max column '$c' is a Boolean — aggregate a cast " +
            "upstream instead")
    }
    view.approxCols.foreach(defOf) // any azof type hashes canonically
    TableSchema(
      view.groupCols.map(g =>
        ColumnDef(g, groupDefOf(g).dataType, nullable = false)) ++
        Seq(ColumnDef("n_rows", ColumnType.AzInt, nullable = false)) ++
        view.sumCols.flatMap(c => Seq(
          ColumnDef(s"sum_$c", ColumnType.AzInt, nullable = false),
          ColumnDef(s"nn_$c", ColumnType.AzInt, nullable = false))) ++
        view.minMaxCols.flatMap(c => Seq(
          ColumnDef(s"min_$c", defOf(c).dataType, nullable = true),
          ColumnDef(s"max_$c", defOf(c).dataType, nullable = true))) ++
        view.varCols.map(c =>
          ColumnDef(s"ss_$c", ColumnType.AzInt, nullable = false)) ++
        view.approxCols.map(c =>
          ColumnDef(Hll.colName(c), ColumnType.AzString,
            nullable = false)))
  }

  /** View-definition sidecar in the view table's dir: what the view
    * maintains and over which source — read back by the automatic
    * query-rewrite rule ([[graft.plans.MvRewriteRule]]). Written once
    * at create (the definition is immutable for a view table's life).
    */
  val DefFileName = "_mv_def.json"

  /** The current sidecar/table layout generation (2 = `nn_<c>` non-null
    * counts + typed min/max; 3 = tuple support pairs cover PARTIAL-NULL
    * rows with the reserved NULL token — [[TupleNullTok]]; 4 = the
    * sidecar may carry a FILTER predicate — [[FilterFormat]]). Stamped
    * into the def sidecar; the nn_ upgrade gate stays on the view
    * TABLE's schema ([[requireNnLayout]] — round-13 tables gained
    * `nn_` without a stamp), while the tuple-encoding gate reads the
    * stamp ([[requireTupleLayout]] — the pair rows themselves cannot
    * reveal which generation wrote them: a no-null corpus writes
    * identical rows either way).
    */
  val FormatVersion = 4

  /** The first sidecar generation that may declare a FILTER predicate
    * (partial / filtered materialized views). A filter-bearing sidecar
    * with an OLDER stamp can only be a hand edit or a downgrade-mix —
    * its table's contents were maintained by a binary that ignored the
    * predicate, so refresh/serve refuse loudly ([[requireFilterFormat]])
    * and rewrite candidacy falls back silently.
    */
  val FilterFormat = 4

  /** The first sidecar generation whose TUPLE support pairs include
    * partial-null rows (NULL components encoded as [[TupleNullTok]]) —
    * what makes the multi-column histogram (`GROUP BY cat, sub` with a
    * nullable component) reconstructible from the pairs: SQL's GROUP
    * BY keeps partial-null rows, and pre-3 pairs (all-non-null rows
    * only) cannot rebuild those groups.
    */
  val TupleNullFormat = 3

  /** Reserved NULL-component token inside an encoded tuple value. A
    * REAL component value containing it would alias NULL, so the
    * refresh guards it like the U+0001 separator (loud refusal, the
    * same contract class).
    */
  private[graft] val TupleNullTok = "\u0002"

  /** [[defFormat]]'s session cache — definitions (and their format
    * stamp) are immutable per view table, the same assumption the
    * rewrite rule's definition cache rests on; a positive stamp never
    * re-reads.
    */
  private val fmtCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Integer]()

  /** Drop one view's cached format stamp — called by the SQL
    * `DROP MATERIALIZED VIEW` path (next to the rewrite rule's
    * definition/discovery invalidations) and by [[writeDef]] /
    * [[JoinView]]'s writeDef on create. The cache's doc assumes
    * definitions are immutable per view TABLE; DROP + CREATE of the
    * same name breaks that assumption, and a stale stamp would make
    * refresh/histogram spuriously refuse a healthy recreate (or, the
    * dangerous direction, let the rewrite serve a nullable-component
    * tuple histogram from a cross-process old-format recreate's
    * pre-token pairs, silently dropping partial-null groups).
    */
  private[graft] def invalidateDefFormat(
      idxLake: String, idxTable: String): Unit = {
    fmtCache.remove(
      (new org.apache.hadoop.fs.Path(idxLake).toString, idxTable)); ()
  }

  /** The `format` stamp of a view table's definition sidecar (either
    * kind), 0 when absent or unreadable — the tuple-encoding
    * generation gate's evidence.
    */
  def defFormat(
      spark: SparkSession, idxLake: String, idxTable: String): Int = {
    val key = (new org.apache.hadoop.fs.Path(idxLake).toString, idxTable)
    Option(fmtCache.get(key)).map(_.intValue).getOrElse {
      val f = readDefFormat(spark, idxLake, idxTable)
      if (f > 0) fmtCache.put(key, Integer.valueOf(f))
      f
    }
  }

  private def readDefFormat(
      spark: SparkSession, idxLake: String, idxTable: String): Int =
    try {
      val dir = AzofTable(spark, idxLake, idxTable).tableDir
      val conf = spark.sessionState.newHadoopConf()
      Seq(DefFileName, JoinView.DefFileName).iterator.flatMap { n =>
        val p = new org.apache.hadoop.fs.Path(dir, n)
        val fs = p.getFileSystem(conf)
        if (!fs.exists(p)) None
        else {
          val in = fs.open(p)
          val root =
            try new com.fasterxml.jackson.databind.ObjectMapper()
              .readTree(in)
            finally in.close()
          Some(Option(root.get("format")).map(_.asInt).getOrElse(1))
        }
      }.nextOption().getOrElse(0)
    } catch { case scala.util.control.NonFatal(_) => 0 }

  /** LOUD tuple-encoding gate for paths that would MIX generations or
    * serve a shape the old pairs cannot answer: refuses when the view
    * declares a tuple with a NULLABLE component but its sidecar
    * predates [[TupleNullFormat]] (the pairs omit partial-null rows —
    * refreshing would mix encodings; a multi-column histogram would
    * silently drop SQL's partial-null groups). All-non-null-component
    * tuples are generation-independent (both encodings write the same
    * rows) and pass.
    */
  private[sources] def requireTupleLayout(
      fmt: Int, srcSchema: TableSchema, tuples: Seq[Seq[String]],
      table: String, remedy: String): Unit =
    if (fmt < TupleNullFormat) {
      val nullableBy =
        srcSchema.columns.map(c => c.name -> c.nullable).toMap
      val bad = tuples.filter(_.exists(c => nullableBy.getOrElse(c, false)))
      if (bad.nonEmpty) throw new IllegalStateException(
        s"view table '$table' declares distinct tuple(s) " +
          bad.map(_.mkString("(", ",", ")")).mkString(", ") +
          " with NULLABLE component(s), but its definition sidecar " +
          s"(format $fmt) predates the null-marked tuple encoding — " +
          "its support pairs omit partial-null rows, so refreshing " +
          "or serving multi-column histograms from it would be " +
          s"silently wrong; rebuild it: $remedy")
    }

  /** LOUD filter-generation gate ([[FilterFormat]]'s reasoning). */
  private[sources] def requireFilterFormat(
      fmt: Int, filter: Option[String], table: String,
      remedy: String): Unit =
    if (filter.nonEmpty && fmt < FilterFormat)
      throw new IllegalStateException(
        s"view table '$table' declares a FILTER predicate but its " +
          s"definition sidecar (format $fmt) predates filtered views — " +
          "its contents were maintained by a binary that ignored the " +
          s"predicate; rebuild it: $remedy")

  /** Restrict a frame to the view's declared FILTER predicate — the
    * membership decision is PER ROW, made identically on the post and
    * pre frames (and the rescan/retrain scans), which is exactly why
    * the `old − pre + new` subtraction stays exact under rows moving
    * across the predicate boundary in either direction.
    */
  private[sources] def applyFilter(df: DataFrame, filter: Option[String])
      : DataFrame =
    filter.fold(df)(f => df.where(expr(f)))

  /** Validate a declared FILTER at create/rebuild time: it must
    * analyze against the source schema to a deterministic BOOLEAN
    * with no subquery — a nondeterministic predicate would decide
    * membership differently at refresh and rescan time, silently
    * corrupting the view.
    */
  private[sources] def requireFilterOk(
      spark: SparkSession, srcSchema: TableSchema,
      filter: Option[String]): Unit =
    filter.foreach { f =>
      val probe =
        try spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], srcSchema.toStruct)
          .where(expr(f)).queryExecution.analyzed
        catch {
          case e: org.apache.spark.sql.AnalysisException =>
            throw new IllegalArgumentException(
              s"view filter '$f' does not analyze against the source " +
                s"schema: ${e.getMessage}")
        }
      val cond = probe.collectFirst {
        case fl: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          fl.condition
      }.getOrElse(throw new IllegalArgumentException(
        s"view filter '$f' did not produce a predicate"))
      require(cond.deterministic,
        s"view filter '$f' is nondeterministic — membership must be " +
          "a repeatable function of the row")
      require(!cond.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions
          .PlanExpression[_]]),
        s"view filter '$f' contains a subquery — not maintainable")
    }

  /** Whether the view table's schema carries the `nn_<c>` non-null
    * count for every declared sum column — false for a table built by
    * a pre-nn_ binary, which this binary can neither refresh nor serve
    * without corrupting `COUNT(c)`/`AVG` semantics.
    */
  def nnLayoutOk(schema: TableSchema, sumCols: Seq[String]): Boolean = {
    val names = schema.columns.map(_.name).toSet
    sumCols.forall(c => names.contains(s"nn_$c"))
  }

  /** [[nnLayoutOk]] that refuses LOUDLY, naming the rebuild remedy —
    * instead of the opaque unresolved-`nn_<c>`-column error a binary
    * upgrade over an old view table would otherwise surface.
    */
  private[sources] def requireNnLayout(
      schema: TableSchema, sumCols: Seq[String], table: String,
      remedy: String): Unit =
    if (!nnLayoutOk(schema, sumCols))
      throw new IllegalStateException(
        s"view table '$table' predates the nn_ layout (no per-column " +
          "non-null counts) — it was built by an older binary and must " +
          s"be rebuilt before this one can refresh or serve it: $remedy")

  /** Refresh cursor sidecar: the greatest SOURCE feed version the view
    * has consumed — the rewrite rule's freshness evidence. Written
    * after every data-carrying micro-batch commit (crash between
    * commit and cursor write self-heals: the replayed batch no-ops
    * through the `stream_batches` guard and re-writes the cursor).
    */
  val CursorFileName = "_mv_cursor.json"

  /** The DISTINCT support table's name for a view table: one row per
    * live `(distinct col, group tuple, value)` with a reference count —
    * the classic incremental-view-maintenance structure that makes
    * `COUNT(DISTINCT c)` EXACT under inserts, revisions, and deletes
    * (a count crosses the serve threshold only when its refcount
    * crosses zero), and EXACT under subset rollups too (the support
    * rows ARE the distinct pairs — re-aggregating them at a coarser
    * grain is a `count_distinct` over an index-sized table, never a
    * corpus read).
    */
  def dvTableName(idxTable: String): String = s"${idxTable}__dv"

  /** The support table's value schema: the distinct column's NAME, the
    * group columns (typed), the value under its canonical STRING
    * encoding (injective for every azof type), the refcount — and, per
    * declared sum column, the pair-grain measure totals `sum_<c>` +
    * `nn_<c>` (what serves `SELECT b, sum(v) … GROUP BY b`, the
    * measure-per-value histogram, corpus-free: the pairs already key
    * every live `(group tuple, value)`, so carrying the measures costs
    * two i64s per row and rides the same `old + new − pre` arithmetic).
    */
  def dvSchema(srcSchema: TableSchema, view: ViewDef): TableSchema = {
    val byName = srcSchema.columns.map(c => c.name -> c).toMap
    (view.distinctCols ++ view.distinctTuples.flatten).foreach(c =>
      if (!byName.contains(c))
        throw new IllegalArgumentException(
          s"distinct column '$c' is not in the source schema"))
    val full = viewSchema(srcSchema, view) // group cols typed (incl. derived)
    TableSchema(
      Seq(ColumnDef("dcol", ColumnType.AzString, nullable = false)) ++
        full.columns.take(view.groupCols.size) ++
        Seq(ColumnDef("value", ColumnType.AzString, nullable = false),
          ColumnDef("ref", ColumnType.AzInt, nullable = false)) ++
        view.sumCols.flatMap(c => Seq(
          ColumnDef(s"sum_$c", ColumnType.AzInt, nullable = false),
          ColumnDef(s"nn_$c", ColumnType.AzInt, nullable = false))))
  }

  /** Whether a support table's schema carries the pair-grain measure
    * totals for every declared sum column — false for a table built by
    * a pre-measure binary, which this binary can neither refresh nor
    * serve measure histograms from.
    */
  def dvLayoutOk(schema: TableSchema, sumCols: Seq[String]): Boolean = {
    val names = schema.columns.map(_.name).toSet
    sumCols.forall(c =>
      names.contains(s"sum_$c") && names.contains(s"nn_$c"))
  }

  /** Whether the view table's schema carries the `hll_<c>` sketch for
    * every declared approx column — false for a table built before the
    * column was declared.
    */
  def hllLayoutOk(schema: TableSchema, approxCols: Seq[String]): Boolean = {
    val names = schema.columns.map(_.name).toSet
    approxCols.forall(c => names.contains(Hll.colName(c)))
  }

  /** Whether the view table's schema carries the `ss_<c>` sum-of-
    * squares column for every declared variance column — false for a
    * table built before the declaration existed.
    */
  def ssLayoutOk(schema: TableSchema, varCols: Seq[String]): Boolean = {
    val names = schema.columns.map(_.name).toSet
    varCols.forall(c => names.contains(s"ss_$c"))
  }

  /** [[ssLayoutOk]] that refuses LOUDLY, naming the rebuild remedy. */
  private[sources] def requireSsLayout(
      schema: TableSchema, varCols: Seq[String], table: String,
      remedy: String): Unit =
    if (!ssLayoutOk(schema, varCols))
      throw new IllegalStateException(
        s"view table '$table' lacks the ss_ sum-of-squares column(s) " +
          "for its declared variance column(s) — it predates the " +
          s"declaration and must be rebuilt: $remedy")

  /** [[hllLayoutOk]] that refuses LOUDLY, naming the rebuild remedy. */
  private[sources] def requireHllLayout(
      schema: TableSchema, approxCols: Seq[String], table: String,
      remedy: String): Unit =
    if (!hllLayoutOk(schema, approxCols))
      throw new IllegalStateException(
        s"view table '$table' lacks the hll_ sketch column(s) for its " +
          "declared approx-distinct column(s) — it predates the " +
          s"declaration and must be rebuilt: $remedy")

  /** [[dvLayoutOk]] that refuses LOUDLY, naming the rebuild remedy. */
  private[sources] def requireDvLayout(
      schema: TableSchema, sumCols: Seq[String], table: String,
      remedy: String): Unit =
    if (!dvLayoutOk(schema, sumCols))
      throw new IllegalStateException(
        s"support table '$table' predates the pair-grain measure " +
          "layout (no per-pair sum/nn totals) — it was built by an " +
          "older binary and must be rebuilt before this one can " +
          s"refresh or serve it: $remedy")

  /** Add every derived group column to `df` (expression cast to its
    * declared type) — applied to each frame the refresh aggregates.
    */
  private def withDerived(df: DataFrame, view: ViewDef): DataFrame =
    view.derivedGroups.foldLeft(df)((d, dg) =>
      d.withColumn(dg.name, expr(dg.sql).cast(dg.dataType.sparkType)))

  /** Refresh/create-time contract checks for derived groups: the
    * session runs UTC (azof DateTime's definition — a tz-sensitive
    * bucket evaluated under different zones at refresh vs query time
    * would silently disagree) and every expression is deterministic
    * once resolved (a nondeterministic group key could never be
    * subtracted exactly).
    */
  private[sources] def requireDerivedOk(
      spark: SparkSession, srcSchema: TableSchema,
      derivedGroups: Seq[DerivedGroup]): Unit =
    if (derivedGroups.nonEmpty) {
      val tz = spark.sessionState.conf.sessionLocalTimeZone
      if (tz != "UTC") throw new IllegalArgumentException(
        s"derived group keys require spark.sql.session.timeZone=UTC " +
          s"(session runs '$tz') — azof DateTime is ms-UTC and a " +
          "zone-dependent bucket must evaluate identically at refresh " +
          "and query time")
      val probe = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], srcSchema.toStruct)
      derivedGroups.foreach { dg =>
        val e = probe.select(expr(dg.sql).cast(dg.dataType.sparkType))
          .queryExecution.analyzed.expressions
        if (!e.forall(_.deterministic))
          throw new IllegalArgumentException(
            s"derived group '${dg.name}' is nondeterministic " +
              s"(${dg.sql}) — an unrepeatable group key cannot be " +
              "incrementally subtracted")
      }
    }

  /** Create the view table (idempotent). The source table must already
    * exist — the view's schema derives from it.
    */
  def create(
      spark: SparkSession,
      srcLake: String, srcTable: String,
      idxLake: String, idxTable: String,
      view: ViewDef,
      segmentStart: Instant = Instant.parse("2024-01-01T00:00:00Z")): Unit = {
    requireNotAuto(idxTable)
    val srcSchema =
      AzofTable(spark, srcLake, srcTable).currentSnapshot.schema
    requireDerivedOk(spark, srcSchema, view.derivedGroups)
    requireFilterOk(spark, srcSchema, view.filter)
    val created = AzofWriter.createTableIfAbsent(
      spark, idxLake, idxTable, viewSchema(srcSchema, view), segmentStart)
    if (view.hasDistinct)
      AzofWriter.createTableIfAbsent(spark, idxLake, dvTableName(idxTable),
        dvSchema(srcSchema, view), segmentStart)
    if (created) {
      writeDef(spark, srcLake, srcTable, idxLake, idxTable, view)
      // a view created this session rewrites immediately under
      // spark.azof.mv.rewrite=auto
      graft.plans.MvRewriteRule.invalidateAuto(idxLake)
    }
    ()
  }

  /** `auto` (the rewrite conf's discovery sentinel,
    * `spark.azof.mv.rewrite=auto` / `lake::auto`) is a RESERVED view
    * name: a view table literally named 'auto' could never be targeted
    * as a rewrite candidate by name, so creation fails loudly at
    * definition time instead of silently shadowing the sentinel.
    */
  private[sources] def requireNotAuto(idxTable: String): Unit =
    if (idxTable.equalsIgnoreCase("auto"))
      throw new IllegalArgumentException(
        "'auto' is a reserved view name (the spark.azof.mv.rewrite " +
          "discovery sentinel) — a view named 'auto' could never be " +
          "named as a rewrite candidate; pick another table name")

  private def sidecar(
      spark: SparkSession, idxLake: String, idxTable: String,
      name: String): (org.apache.hadoop.fs.FileSystem,
      org.apache.hadoop.fs.Path) = {
    val dir = AzofTable(spark, idxLake, idxTable).tableDir
    val p = new org.apache.hadoop.fs.Path(dir, name)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def writeDef(
      spark: SparkSession, srcLake: String, srcTable: String,
      idxLake: String, idxTable: String, view: ViewDef): Unit = {
    def arr(xs: Seq[String]) =
      xs.map(x => "\"" + x + "\"").mkString("[", ",", "]")
    // a same-lake source records NO path and resolves against the
    // view's OWN lake at read time, so the sidecar survives the lake
    // directory moving (build-in-temp-then-rename, mounts); only a
    // cross-lake source pins an absolute path
    val srcPath =
      if (new org.apache.hadoop.fs.Path(srcLake) ==
          new org.apache.hadoop.fs.Path(idxLake)) ""
      else srcLake
    // expression SQL is builder-authored free text: escape it
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val derived = view.derivedGroups.map(dg =>
      s"""{"name":"${dg.name}","sql":"${esc(dg.sql)}",""" +
        s""""type":"${dg.dataType.jsonName}"}""")
      .mkString("[", ",", "]")
    // a recreate under a previously-dropped name must not serve the
    // old table's cached format stamp
    invalidateDefFormat(idxLake, idxTable)
    val (fs, p) = sidecar(spark, idxLake, idxTable, DefFileName)
    val out = fs.create(p, true)
    try out.write(
      (s"""{"format":$FormatVersion,""" +
        s""""source_path":"$srcPath","source_table":"$srcTable",""" +
        s""""group_cols":${arr(view.groupCols)},""" +
        s""""sum_cols":${arr(view.sumCols)},""" +
        s""""minmax_cols":${arr(view.minMaxCols)},""" +
        s""""distinct_cols":${arr(view.distinctCols)},""" +
        s""""distinct_tuples":${view.distinctTuples
          .map(arr).mkString("[", ",", "]")},""" +
        s""""approx_cols":${arr(view.approxCols)},""" +
        s""""var_cols":${arr(view.varCols)},""" +
        s""""filter":"${esc(view.filter.getOrElse(""))}",""" +
        s""""derived_groups":$derived}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The view's definition sidecar: `(sourceLake, sourceTable, def)` —
    * None when the table has no sidecar (not a [[MatView]] table). A
    * same-lake source (recorded relative) resolves to `idxLake`.
    */
  def readDef(
      spark: SparkSession, idxLake: String, idxTable: String)
      : Option[(String, String, ViewDef)] = {
    val (fs, p) = sidecar(spark, idxLake, idxTable, DefFileName)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val root =
        try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
        finally in.close()
      def seq(f: String): Seq[String] = Option(root.get(f)) match {
        case Some(n) => (0 until n.size()).map(i => n.get(i).asText())
        case None => Nil // field absent in older sidecars
      }
      val rec = root.get("source_path").asText
      val derived = Option(root.get("derived_groups")) match {
        case Some(n) => (0 until n.size()).map { i =>
          val d = n.get(i)
          DerivedGroup(d.get("name").asText, d.get("sql").asText,
            graft.format.ColumnType.fromJsonName(d.get("type").asText))
        }
        case None => Nil // absent in pre-derived sidecars
      }
      val tuples = Option(root.get("distinct_tuples")) match {
        case Some(n) => (0 until n.size()).map { i =>
          val t = n.get(i)
          (0 until t.size()).map(j => t.get(j).asText())
        }
        case None => Nil // absent in pre-tuple sidecars
      }
      val filt = Option(root.get("filter")).map(_.asText)
        .filter(_.nonEmpty)
      Some((if (rec.isEmpty) idxLake else rec,
        root.get("source_table").asText,
        ViewDef(seq("group_cols"), seq("sum_cols"), seq("minmax_cols"),
          seq("distinct_cols"), derived, tuples,
          seq("approx_cols"), filt, seq("var_cols"))))
    }
  }

  /** The greatest source feed version the view has consumed. */
  def readCursor(
      spark: SparkSession, idxLake: String, idxTable: String): Option[Long] = {
    val (fs, p) = sidecar(spark, idxLake, idxTable, CursorFileName)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val root =
        try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
        finally in.close()
      Some(root.get("sourceVersion").asLong)
    }
  }

  private def writeCursor(
      spark: SparkSession, idxLake: String, idxTable: String,
      version: Long): Unit = {
    val dir = AzofTable(spark, idxLake, idxTable).tableDir
    val (fs, p) = sidecar(spark, idxLake, idxTable, CursorFileName)
    AtomicReplace.replace(fs, dir, p, s"""{"sourceVersion":$version}""")
    ()
  }

  /** Whether the view's state equals the one-shot aggregate over the
    * source's CURRENT live corpus — the rewrite rule's gate. Fresh iff
    * a cursor exists and every main-lineage commit after it is
    * view-preserving: compacts and purges rewrite/remove bytes of rows
    * whose live state the feed already delivered, analyze restamps
    * metadata; a ROLLBACK (live state changed with no feed event) or
    * any commit registering NEW files (data, tombstones, a published
    * branch) is staleness. Cost: one snapshot-dir listing plus one
    * metadata parse per post-cursor commit — zero in steady state.
    */
  def isFresh(
      spark: SparkSession,
      srcLake: String, srcTable: String,
      idxLake: String, idxTable: String): Boolean =
    freshViewVersion(spark, srcLake, srcTable, idxLake, idxTable).isDefined

  /** [[isFresh]] that also PINS the view version the validation covers:
    * the rewrite rule scans exactly this snapshot, so a source commit
    * (and refresh) landing between optimization and execution cannot
    * swap the executed read away from the state the gate validated.
    * Order matters: the cursor is read BEFORE the view version, and the
    * refresh writes its view commit BEFORE its cursor — so the pinned
    * version always carries at least the cursor's state (a later
    * refresh that raced in is provably a no-op, because the source
    * walk from the cursor validated as view-preserving). The one
    * untracked hazard is a ROLLBACK of the view table itself racing
    * this call — operator intervention outside the refresh protocol,
    * same class as the documented source-rollback hatch.
    */
  def freshViewVersion(
      spark: SparkSession,
      srcLake: String, srcTable: String,
      idxLake: String, idxTable: String): Option[Long] =
    freshViewVersions(spark, srcLake, srcTable, idxLake, idxTable,
      pinned = None, needDv = false).map(_._1)

  /** The TOCTOU-closed gate behind every rewrite serve: validates
    * freshness and PINS the snapshots the rewritten plan will read —
    * the view's, and (when `needDv`) the DISTINCT-support table's.
    * Returns `(viewVersion, dvVersion)`.
    *
    * ORDER IS THE MECHANISM: cursor first, then BOTH pins, then the
    * view-preserving walk LAST. A refresh only ever runs after a
    * source data commit, and a data commit is never view-preserving —
    * so if any racing refresh managed to land view or support state
    * newer than the cursor BEFORE we pinned, the source commit that
    * triggered it landed even earlier and the walk (which reads the
    * source's snapshot list after both pins) sees it and refuses.
    * Conversely, if the walk validates, both pinned snapshots carry
    * exactly the cursor's state. Reading the support version AFTER the
    * walk — the round-14 defect — reopened the race on the support
    * leg: a refresh landing between walk and read served view totals
    * @C with support pairs @C+1, an answer matching NO instant (the
    * histogram NULL bucket went provably wrong). The one untracked
    * hazard remains a ROLLBACK of the view/support tables themselves —
    * operator intervention outside the refresh protocol, the
    * documented hatch class.
    *
    * `pinned` is the query's [[ReadPin]] (None = the un-pinned Current
    * read): a `VERSION AS OF` pin gates through the
    * [[freshViewVersionAt]] walk (branch heads refuse, span =
    * `min(pin, cursor)`); a `TIMESTAMP AS OF` coordinate gates through
    * [[unchangedSinceAsOf]] — the event-time generalization.
    */
  def freshViewVersions(
      spark: SparkSession,
      srcLake: String, srcTable: String,
      idxLake: String, idxTable: String,
      pinned: Option[ReadPin], needDv: Boolean)
      : Option[(Long, Option[Long])] =
    readCursor(spark, idxLake, idxTable).flatMap { cur =>
      val v = AzofTable(spark, idxLake, idxTable).currentVersion.toLong
      val dvV: Option[Option[Long]] =
        if (!needDv) Some(None)
        else scala.util.Try(
          AzofTable(spark, idxLake, dvTableName(idxTable))
            .currentVersion.toLong).toOption.map(Some(_))
      dvV.flatMap { dv =>
        if (pinOk(spark, srcLake, srcTable, cur, pinned)) Some((v, dv))
        else None
      }
    }

  /** One table's freshness walk for one [[ReadPin]] — shared by the
    * single-table gate and [[JoinView.freshViewVersions]]'s per-table
    * checks.
    */
  private[sources] def pinOk(
      spark: SparkSession, lake: String, table: String, cur: Long,
      pin: Option[ReadPin]): Boolean = pin match {
    case None => unchangedSince(spark, lake, table, cur)
    case Some(ReadPin.Version(p)) =>
      val onMain =
        try AzofTable(spark, lake, table).snapshot(p.toString)
          .branch.isEmpty
        catch { case scala.util.control.NonFatal(_) => false }
      onMain && unchangedSince(spark, lake, table, math.min(p, cur))
    case Some(ReadPin.EventTime(t)) =>
      unchangedSinceAsOf(spark, lake, table, cur, t)
  }

  /** Whether `table`'s EVENT-TIME as-of view at `t` (at the CURRENT
    * version) provably equals its live view at version `cur` — the
    * `TIMESTAMP AS OF` rewrite gate, [[unchangedSince]] generalized to
    * the event-time coordinate. Two metadata-only legs:
    *
    *   1. At snapshot `cur`, the as-of read resolves IDENTICALLY to
    *      the Current read ([[asOfEqualsCurrent]]): every open segment
    *      starts at-or-below `t` with every delta window ENDING
    *      at-or-below it (all rows' event times ≤ t, so each key's
    *      as-of winner is its Current winner), and no closed segment
    *      matches `t` (both reads route through the open tree alone).
    *   2. Every later main-lineage commit is view-preserving FOR THE
    *      COORDINATE: either it registers no files and restamps
    *      metadata, or every file it registers is a delta whose window
    *      STARTS strictly above `t` — the as-of scan excludes such a
    *      file wholesale (the format's own `start ≤ t` participation
    *      rule), so inserts, revisions, and tombstones landing above
    *      the coordinate never change the answer. A delete or revision
    *      reaching at-or-below `t` lands in a delta with
    *      `start ≤ t` and refuses. Folds (compact/purge) rewrite the
    *      historic tree and conservatively refuse (Current-freshness
    *      treats them as view-preserving; a historic coordinate may
    *      degrade across a fold) — rollbacks refuse as ever.
    *
    * This is the "stale view serving a frozen dashboard" shape: data
    * keeps arriving ABOVE the coordinate and the un-refreshed view
    * keeps serving `TIMESTAMP AS OF t` exactly; once the view consumes
    * a commit above `t`, leg 1 fails at the new cursor and the query
    * falls back to the time-traveled scan — never a wrong answer.
    */
  private[graft] def unchangedSinceAsOf(
      spark: SparkSession, srcLake: String, srcTable: String,
      cur: Long, t: Instant): Boolean = {
    val tbl = AzofTable(spark, srcLake, srcTable)
    val current = tbl.currentVersion.toLong
    if (current < cur) false // rolled back below the cursor
    else try {
      val curSnap = tbl.snapshot(cur.toString)
      if (!asOfEqualsCurrent(curSnap, t)) false
      else if (current == cur) true
      else {
        val fs =
          tbl.tableDir.getFileSystem(spark.sessionState.newHadoopConf())
        val ids = AzofTable.snapshotIdsOnDisk(fs, tbl.tableDir)
          .filter(v => v > cur && v <= current).sorted
        var prevFiles = curSnap.allFiles
        ids.forall { v =>
          val s = tbl.snapshot(v.toString)
          if (s.branch.nonEmpty) true // staged lineage: main unchanged
          else if (s.op.contains("rollback")) false
          else {
            val newFiles = s.allFiles -- prevFiles
            val ok =
              if (newFiles.isEmpty) true // metadata restamp / no-op
              else if (s.op.exists(o => o == "compact" || o == "purge"))
                false // fold: the historic tree was rewritten
              else {
                val deltaStarts = collectDeltaStarts(s)
                newFiles.forall(f =>
                  deltaStarts.get(f).exists(_.isAfter(t)))
              }
            prevFiles = s.allFiles
            ok
          }
        }
      }
    } catch {
      case scala.util.control.NonFatal(_) => false
    }
  }

  /** Every delta file in `snap`'s tree → its window start. */
  private def collectDeltaStarts(
      snap: graft.format.Snapshot): Map[String, Instant] = {
    def walk(s: graft.format.Segment): Seq[(String, Instant)] =
      s.delta.map(d => d.file -> d.start) ++ s.segments.flatMap(walk)
    snap.segments.flatMap(walk).toMap
  }

  /** Whether the event-time as-of read at `t` of `snap` provably
    * resolves to the SAME rows as its Current read — see
    * [[unchangedSinceAsOf]] leg 1.
    */
  private def asOfEqualsCurrent(
      snap: graft.format.Snapshot, t: Instant): Boolean = {
    // a BASE file has no delta window — its rows' event-time bound is
    // the recorded per-file range stat (absent on pre-stat files:
    // refuse conservatively; `analyze` backfills it)
    def baseOk(s: graft.format.Segment): Boolean =
      s.file.isEmpty || s.fileStats.exists(
        _.cols.get(TableSchema.EventTimeStatName).exists(r =>
          scala.util.Try(r.max.toLong).toOption
            .exists(_ <= t.toEpochMilli)))
    def walk(s: graft.format.Segment): Boolean = {
      val selfOk = s.end match {
        case None => // open: both reads route here, content all ≤ t
          !s.start.isAfter(t) &&
            s.delta.forall(d =>
              !d.start.isAfter(t) && !d.end.isAfter(t)) &&
            baseOk(s)
        case Some(e) => // closed: must be invisible to the as-of read —
          // AND its deltas (which the Current read walks regardless of
          // the segment's range) must carry only rows both reads agree
          // on: every delta window at-or-below t, exactly the open
          // branch's condition. A fully-closed tree (no open segment —
          // unreachable via this engine's own writers, but admitted by
          // the format) could otherwise carry a closed ROOT segment
          // with deltas above t that Current includes and the as-of
          // read excludes, and the gate would validate a wrong serve.
          !(!s.start.isAfter(t) && !t.isAfter(e)) &&
            s.delta.forall(d =>
              !d.start.isAfter(t) && !d.end.isAfter(t))
      }
      selfOk && s.segments.forall(walk)
    }
    snap.segments.forall(walk)
  }

  /** [[freshViewVersion]] for a VERSION-PINNED read (`VERSION AS OF
    * <pinned>`): the view serves the pin exactly when the source's live
    * view at `pinned` provably equals its live view at the cursor —
    * every main-lineage commit after `min(pinned, cursor)` is
    * view-preserving, ONE [[unchangedSince]] walk covering both spans
    * (pinned ≤ cursor: `(pinned, current]` ⊇ `(pinned, cursor]` ∪
    * `(cursor, current]`; pinned > cursor: `(cursor, current]` ⊇
    * `(cursor, pinned]`). A pin that resolves to a BRANCH head refuses:
    * the shared numbering makes it a different lineage's state, not
    * main's at that version. This is the reproducible-report shape —
    * an `AS OF <tag>` dashboard re-served from the view instead of
    * re-paying the corpus aggregate, still never wrong: any
    * state-changing commit in either span falls back to the scan.
    */
  def freshViewVersionAt(
      spark: SparkSession,
      srcLake: String, srcTable: String,
      idxLake: String, idxTable: String, pinned: Long): Option[Long] =
    freshViewVersions(spark, srcLake, srcTable, idxLake, idxTable,
      Some(ReadPin.Version(pinned)), needDv = false).map(_._1)

  /** Whether `table`'s LIVE view still equals its state at version
    * `cur`: every later main-lineage commit is view-preserving (see
    * [[isFresh]]'s scaladoc). Shared by the single-table and join-view
    * freshness gates.
    */
  private[graft] def unchangedSince(
      spark: SparkSession, srcLake: String, srcTable: String,
      cur: Long): Boolean = {
    val t = AzofTable(spark, srcLake, srcTable)
    val current = t.currentVersion.toLong
    if (current < cur) false // rolled back below the cursor
    else if (current == cur) true
    else try {
      val fs = t.tableDir.getFileSystem(spark.sessionState.newHadoopConf())
      val ids = AzofTable.snapshotIdsOnDisk(fs, t.tableDir)
        .filter(v => v > cur && v <= current).sorted
      var prevFiles = t.snapshot(cur.toString).allFiles
      ids.forall { v =>
        val s = t.snapshot(v.toString)
        if (s.branch.nonEmpty) true // staged lineage: main view unchanged
        else if (s.op.contains("rollback")) false
        else if (s.op.exists(o => o == "compact" || o == "purge")) {
          prevFiles = s.allFiles; true
        } else if ((s.allFiles -- prevFiles).nonEmpty) false
        else { prevFiles = s.allFiles; true }
      }
    } catch {
      // a vacuumed cursor snapshot (or any unreadable metadata) is
      // conservatively stale — the rewrite falls back to the scan
      case scala.util.control.NonFatal(_) => false
    }
  }

  /** Incrementally refresh the view from the source's commit feed
    * (AvailableNow by default).
    */
  def refresh(
      spark: SparkSession,
      srcLake: String, srcTable: String,
      idxLake: String, idxTable: String,
      view: ViewDef,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      broadcastKeyMax: Long = DedupFlow.DefaultBroadcastKeyMax)
      : StreamingQuery = {
    create(spark, srcLake, srcTable, idxLake, idxTable, view) // idempotent
    requireNnLayout(
      AzofTable(spark, idxLake, idxTable).currentSnapshot.schema,
      view.sumCols, idxTable,
      "MatView.rebuildEpoch (CLI: mv-rebuild)")
    if (view.hasDistinct && view.sumCols.nonEmpty)
      requireDvLayout(
        AzofTable(spark, idxLake, dvTableName(idxTable))
          .currentSnapshot.schema,
        view.sumCols, dvTableName(idxTable),
        "MatView.rebuildEpoch (CLI: mv-rebuild)")
    if (view.distinctTuples.nonEmpty)
      requireTupleLayout(defFormat(spark, idxLake, idxTable),
        AzofTable(spark, srcLake, srcTable).currentSnapshot.schema,
        view.distinctTuples, idxTable,
        "MatView.rebuildEpoch (CLI: mv-rebuild)")
    if (view.approxCols.nonEmpty)
      requireHllLayout(
        AzofTable(spark, idxLake, idxTable).currentSnapshot.schema,
        view.approxCols, idxTable,
        "MatView.rebuildEpoch (CLI: mv-rebuild)")
    if (view.varCols.nonEmpty)
      requireSsLayout(
        AzofTable(spark, idxLake, idxTable).currentSnapshot.schema,
        view.varCols, idxTable,
        "MatView.rebuildEpoch (CLI: mv-rebuild)")
    requireFilterFormat(defFormat(spark, idxLake, idxTable), view.filter,
      idxTable, "MatView.rebuildEpoch (CLI: mv-rebuild)")
    val appId = AzofSink.appIdFor(checkpoint)
    spark.readStream.format("azof-commits")
      .option("table", srcTable).load(srcLake)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val (rows, dvRows, maxV) = deltaBatch(spark, batch, srcLake,
          srcTable, idxLake, idxTable, view, broadcastKeyMax)
        AzofSink.commitBatch(idxLake, idxTable, rows, id, appId)
        // the DISTINCT support table commits under its own replay
        // guard id — each table's delta depends only on ITS OWN old
        // state plus the batch, so a crash between the two commits
        // replays exactly-once on both
        dvRows.foreach(dv => AzofSink.commitBatch(idxLake,
          dvTableName(idxTable), dv, id, s"$appId#dv"))
        // cursor AFTER both commits: the rewrite rule's freshness
        // evidence (a crash in between self-heals on replay)
        if (maxV >= 0) writeCursor(spark, idxLake, idxTable, maxV)
        graft.operators.Blocks.freeReferenced(rows)
        dvRows.foreach(graft.operators.Blocks.freeReferenced)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** Group-wise aggregates of `rows` (one row per live key) under
    * `pfx`-prefixed names.
    */
  private def groupAgg(
      rows: DataFrame, view: ViewDef, pfx: String): DataFrame = {
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as(s"${pfx}n")) ++
        view.sumCols.flatMap(c => Seq(
          sum(col(c)).as(s"${pfx}s_$c"),
          count(col(c)).as(s"${pfx}nn_$c"))) ++
        view.minMaxCols.flatMap(c => Seq(
          min(col(c)).as(s"${pfx}mn_$c"),
          max(col(c)).as(s"${pfx}mx_$c"))) ++
        // sum of squares: a group homomorphism with an inverse exactly
        // like sum — same old − pre + new arithmetic downstream
        view.varCols.map(c =>
          sum(col(c) * col(c)).as(s"${pfx}q_$c"))
    rows.groupBy(view.groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fail LOUD when a group value is NULL or carries the reserved
    * record-key separator: a silent pass would collide distinct group
    * tuples into one view key (`concat_ws` SKIPS null operands, so two
    * different tuples with a null in different slots render the same
    * key) and corrupt the upsert merge. This enforces the [[ViewDef]]
    * contract — group columns non-null, no U+0001 — for PHYSICAL and
    * DERIVED group columns alike (a derived expression over a nullable
    * source column can yield a null bucket even when the declared type
    * claims non-null). `frame` is churn- or group-cardinality-sized at
    * every call site, so the check is one cheap conditional sum folded
    * into a pass the refresh already pays.
    */
  private[sources] def sepViolations(
      frame: DataFrame, groupCols: Seq[String]): Column =
    sum(when(groupCols.map(g =>
      col(g).isNull || col(g).cast("string").contains(Sep))
      .reduce(_ || _), 1L).otherwise(0L))

  private[sources] def requireNoSep(violations: Long, what: String): Unit =
    if (violations > 0) throw new IllegalArgumentException(
      s"$violations $what group tuple(s) carry a NULL group value or " +
        "the reserved U+0001 record-key separator — group values must " +
        "be non-null and separator-free (concat_ws would silently " +
        "collide the keys); refusing to corrupt the view's key space")

  /** Every distinct UNIT the support table maintains — the single
    * declared columns plus the declared TUPLES — as
    * `(dcol name, row filter, canonical string value, violation)`.
    *
    * A single column pairs its NON-NULL rows (`COUNT(DISTINCT c)`
    * skips nulls and the value histogram's NULL bucket derives from
    * the view totals). A tuple pairs EVERY row: a NULL component
    * encodes as the reserved [[TupleNullTok]], which is what lets the
    * multi-column histogram (`GROUP BY a, b` — SQL keeps partial-null
    * rows) reconstruct exactly from the pairs, while
    * `COUNT(DISTINCT a, b)` (SQL skips any-null rows) serves by
    * filtering marked pairs out ([[serveDistinctPairs]]). The tuple's
    * dcol is its component names joined by ',' and its value the
    * components' canonical strings joined by the reserved separator —
    * injective while components carry neither U+0001 nor U+0002: the
    * `violation` column flags a REAL component value containing
    * either (post-encoding, NULL and a real U+0002 are
    * indistinguishable, so this check must ride the raw rows), and
    * the refresh refuses loudly on any flagged row.
    */
  private[sources] def distinctUnits(
      distinctCols: Seq[String], distinctTuples: Seq[Seq[String]])
      : Seq[(String, Column, Column, Column)] =
    distinctCols.map(c =>
      (c, col(c).isNotNull, col(c).cast("string"), lit(0L))) ++
      distinctTuples.map { t =>
        val comps = t.map(c =>
          coalesce(col(c).cast("string"), lit(TupleNullTok)))
        val viol = t.map(c => col(c).isNotNull &&
            (col(c).cast("string").contains(Sep) ||
              col(c).cast("string").contains(TupleNullTok)))
          .reduce(_ || _)
        (t.mkString(","), lit(true), concat_ws(Sep, comps: _*),
          when(viol, 1L).otherwise(0L))
      }

  /** Violation flag over a support frame's `(dcol, value)`: a single
    * column's value must not contain the reserved separator; a TUPLE's
    * encoded value must contain EXACTLY its joining separators — a
    * component carrying one would alias a different tuple.
    */
  private[sources] def valueSepViolation: Column =
    when(col("dcol").contains(","),
      size(split(col("value"), Sep, -1)) =!=
        size(split(col("dcol"), ",", -1)))
      .otherwise(col("value").contains(Sep))

  /** One feed micro-batch → one upsert row per TOUCHED group, equal to
    * the group's one-shot aggregate over the live corpus at the batch's
    * end version. See the object scaladoc for the three paths
    * (additive delta / monoid merge / confined rescan).
    */
  private def deltaBatch(
      spark: SparkSession, batch: Dataset[Row],
      srcLake: String, srcTable: String,
      idxLake: String, idxTable: String,
      view: ViewDef, broadcastKeyMax: Long)
      : (DataFrame, Option[DataFrame], Long) = {
    val K = TableSchema.KeyName
    val outSchema = viewSchema(
      AzofTable(spark, srcLake, srcTable).currentSnapshot.schema, view)
    def empty: DataFrame = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], outSchema.toStruct)
    // one eager materialization of the slim batch: the version bounds,
    // the churned-key pull, and both batch-side aggregates read it
    val slim = batch
      .select((Seq(col(K)) ++ view.needed.map(col) ++
        Seq(col("_commit_version"), col("_deleted"))): _*)
      .localCheckpoint(true)
    val bounds = slim.agg(
      min(col("_commit_version")), max(col("_commit_version")),
      count_distinct(col(K))).collect()(0)
    if (bounds.isNullAt(2) || bounds.getLong(2) == 0L) {
      graft.operators.Blocks.freeReferenced(slim.toDF())
      return (empty, None, -1L)
    }
    val (minV, maxV, nChurned) =
      (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2))
    // the key's POST-batch state: its newest row in the batch
    val wKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col(K)).orderBy(col("_commit_version").desc)
    // the FILTER applies per row to post and pre states alike — a
    // churned row out of the predicate on one side simply contributes
    // nothing there, which is what keeps old − pre + new exact under
    // boundary-crossing revisions
    val newRows = applyFilter(withDerived(slim
      .withColumn("_rn", row_number().over(wKey))
      .where(col("_rn") === 1 && !col("_deleted"))
      .select(view.needed.map(col): _*), view), view.filter)
    // the churned keys' PRE-image: live rows at the batch's predecessor
    // version, guarded exactly like LmIndex's (KeyFilter file skipping
    // for a steady-state batch, full scan semi-joined for a bootstrap)
    val src = AzofTable(spark, srcLake, srcTable)
    val (_, preSnap) = AzofChangeFeed.mainAtOrBefore(spark, src, minV - 1)
    val churned = slim.select(col(K)).distinct()
    val proj = Some((Set(K) ++ view.needed).toSet)
    val preRows = applyFilter(withDerived(
      (if (nChurned <= broadcastKeyMax) {
        val keys = churned.collect().map(_.getString(0)).toSet
        graft.operators.AzofScan.scanSnapshot(spark, src, preSnap,
          AsOf.Current, projection = proj,
          keyFilter = Some(KeyFilter.Keys(keys)))
      } else
        graft.operators.AzofScan.scanSnapshot(spark, src, preSnap,
          AsOf.Current, projection = proj)
          .join(churned, Seq(K), "left_semi"))
        .select(view.needed.map(col): _*), view), view.filter)
    // every group either side touched carries a row in the full outer
    // join; one eager materialization serves the rescan decision, the
    // old-value guard, and the final merge
    val touched = groupAgg(newRows, view, "_a_")
      .join(groupAgg(preRows, view, "_p_"), view.groupCols, "full_outer")
      .localCheckpoint(true)
    // DISTINCT support: per-(dcol, group tuple, value) refcount AND
    // pair-grain measure deltas from the same post/pre frames —
    // checkpointed before slim is freed
    val dvKeys = Seq("dcol") ++ view.groupCols ++ Seq("value")
    def pairCounts(rows: DataFrame, pfx: String): DataFrame = {
      val aggs: Seq[Column] =
        Seq(count(lit(1)).as(s"${pfx}r"),
          sum(col("_viol")).as(s"${pfx}viol")) ++
          view.sumCols.flatMap(c => Seq(
            sum(col(c)).as(s"${pfx}s_$c"),
            count(col(c)).as(s"${pfx}nn_$c")))
      distinctUnits(view.distinctCols, view.distinctTuples)
        .map { case (d, nn, v, viol) =>
          rows.where(nn)
            .select(((view.groupCols ++ view.sumCols).distinct.map(col) ++
              Seq(v.as("value"), lit(d).as("dcol"),
                viol.as("_viol"))): _*)
        }.reduce(_.unionByName(_))
        .groupBy(dvKeys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
    }
    val dvTouched: Option[DataFrame] =
      if (!view.hasDistinct) None
      else Some(pairCounts(newRows, "_a_")
        .join(pairCounts(preRows, "_p_"), dvKeys, "full_outer")
        .localCheckpoint(true))
    // APPROX sketches from the batch's post-state rows (append-only
    // contract — any pre-image refuses below, so post-state IS the
    // whole contribution); checkpointed before slim is freed
    val batchSk: Option[DataFrame] =
      if (view.approxCols.isEmpty) None
      else Some(view.approxCols
        .map(c => Hll.sketch(newRows, view.groupCols, c, s"_b_h_$c"))
        .reduce(_.join(_, view.groupCols, "full_outer"))
        .localCheckpoint(true))
    graft.operators.Blocks.freeReferenced(slim.toDF())
    // one pass serves both the size decision and the reserved-separator
    // contract check (group values must not contain U+0001)
    val tStats = touched
      .agg(count(lit(1)), sepViolations(touched, view.groupCols),
        sum(when(col("_p_n").isNotNull, 1L).otherwise(0L))).collect()(0)
    val nTouched = tStats.getLong(0)
    requireNoSep(if (tStats.isNullAt(1)) 0L else tStats.getLong(1),
      "churned")
    // an HLL register array has no inverse: a batch carrying ANY
    // pre-image (revision, re-upsert, delete) cannot maintain the
    // sketch exactly — refuse loudly, naming the epoch remedy (the
    // documented append-only contract for approx-distinct views)
    if (view.approxCols.nonEmpty &&
      !(tStats.isNullAt(2) || tStats.getLong(2) == 0L))
      throw new IllegalStateException(
        s"approx-distinct view refresh saw ${tStats.getLong(2)} " +
          "pre-imaged group(s) (a revision, re-upsert, or delete) — " +
          "HLL sketches merge append-only and have no inverse; " +
          "rebuild via MatView.rebuildEpoch (CLI: mv-rebuild)")
    // refcount upserts: old + new − pre per touched pair, old refs from
    // a pair-confined support read (broadcast semi under the guard)
    val dvRows: Option[DataFrame] = dvTouched.flatMap { dvt =>
      val dvStats = dvt.agg(count(lit(1)),
        sepViolations(dvt, view.groupCols),
        sum(when(valueSepViolation, 1L).otherwise(0L)),
        sum(coalesce(col("_a_viol"), lit(0L)) +
          coalesce(col("_p_viol"), lit(0L)))).collect()(0)
      val nDv = dvStats.getLong(0)
      def dvz(i: Int) = if (dvStats.isNullAt(i)) 0L else dvStats.getLong(i)
      requireNoSep(dvz(1) + dvz(2) + dvz(3), "churned distinct-pair")
      if (nDv == 0L) { graft.operators.Blocks.freeReferenced(dvt); None }
      else {
        val existing = graft.operators.AzofScan
          .scan(spark, idxLake, dvTableName(idxTable))
          .select((dvKeys.map(col) ++ Seq(col("ref").as("_o_r")) ++
            view.sumCols.flatMap(c => Seq(
              col(s"sum_$c").as(s"_o_s_$c"),
              col(s"nn_$c").as(s"_o_nn_$c")))): _*)
        val confined =
          if (nDv <= broadcastKeyMax)
            existing.join(broadcast(dvt.select(dvKeys.map(col): _*)),
              dvKeys, "left_semi")
          else existing
        val merged = dvt.join(confined, dvKeys, "left")
        def z(c: Column): Column = coalesce(c, lit(0L))
        Some(merged.select(
          (Seq(
            concat_ws(Sep, (Seq(col("dcol")) ++
              view.groupCols.map(c => col(c).cast("string")) ++
              Seq(col("value"))): _*).as(K),
            lit(java.sql.Timestamp.from(ViewStamp))
              .as(TableSchema.EventTimeName),
            col("dcol")) ++
            view.groupCols.map(col) ++
            Seq(col("value"),
              (z(col("_o_r")) + z(col("_a_r")) - z(col("_p_r")))
                .as("ref")) ++
            view.sumCols.flatMap(c => Seq(
              (z(col(s"_o_s_$c")) + z(col(s"_a_s_$c")) -
                z(col(s"_p_s_$c"))).as(s"sum_$c"),
              (z(col(s"_o_nn_$c")) + z(col(s"_a_nn_$c")) -
                z(col(s"_p_nn_$c"))).as(s"nn_$c")))): _*))
      }
    }
    if (nTouched == 0L) return (empty, dvRows, maxV)
    // MIN/MAX rescan: only groups that LOST rows (a pre-image landed in
    // them); insert-only groups monoid-merge below with no source read
    val rescan =
      if (view.minMaxCols.isEmpty) touched.limit(0)
      else touched.where(col("_p_n").isNotNull)
        .select(view.groupCols.map(col): _*)
    val nRescan = if (view.minMaxCols.isEmpty) 0L else rescan.count()
    val rescanAgg: Option[DataFrame] =
      if (nRescan == 0L) None
      else {
        val (_, endSnap) = AzofChangeFeed.mainAtOrBefore(spark, src, maxV)
        // single-column groups under the guard additionally push an In
        // filter so value-stats file skipping confines the read to the
        // affected groups' files on a clustered layout
        val valueFilters =
          if (view.groupCols.size == 1 && view.derivedGroups.isEmpty &&
            nRescan <= broadcastKeyMax) {
            // physical single-column groups only: a derived bucket has
            // no stored source column to push an In filter against
            val g = view.groupCols.head
            val vals = rescan.collect().map(_.get(0))
            Seq(org.apache.spark.sql.sources.In(g, vals))
          } else Nil
        // the FILTER applies before min/max: with a predicate over
        // non-group columns, in-group rows can still be out-members
        val live = applyFilter(withDerived(
          graft.operators.AzofScan.scanSnapshot(spark, src,
            endSnap, AsOf.Current,
            projection =
              Some((view.physGroupCols ++ view.minMaxCols ++
                view.derivedGroups.flatMap(_.srcRefs) ++
                view.filterRefs).toSet),
            valueFilters = valueFilters), view), view.filter)
        val confined =
          if (nRescan <= broadcastKeyMax)
            live.join(broadcast(rescan), view.groupCols, "left_semi")
          else live.join(rescan, view.groupCols, "left_semi")
        val aggs: Seq[Column] = view.minMaxCols.flatMap(c => Seq(
          min(col(c)).as(s"_r_mn_$c"), max(col(c)).as(s"_r_mx_$c")))
        Some(confined.groupBy(view.groupCols.map(col): _*)
          .agg(aggs.head, aggs.tail: _*))
      }
    // the view's old totals for exactly the touched groups: one
    // streaming pass over the group-cardinality-bounded view scan
    // (broadcast left-semi) in steady state, plain shuffle past the
    // guard — the measured-guard rule, never an unconditional hint
    val oldCols =
      view.groupCols.map(col) ++
        Seq(col("n_rows").as("_o_n")) ++
        view.sumCols.flatMap(c => Seq(
          col(s"sum_$c").as(s"_o_s_$c"),
          col(s"nn_$c").as(s"_o_nn_$c"))) ++
        view.minMaxCols.flatMap(c => Seq(
          col(s"min_$c").as(s"_o_mn_$c"),
          col(s"max_$c").as(s"_o_mx_$c"))) ++
        view.varCols.map(c => col(s"ss_$c").as(s"_o_q_$c")) ++
        view.approxCols.map(c => col(Hll.colName(c)).as(s"_o_h_$c"))
    val existing = graft.operators.AzofScan.scan(spark, idxLake, idxTable)
      .select(oldCols: _*)
    val touchedOld =
      if (nTouched <= broadcastKeyMax)
        existing.join(
          broadcast(touched.select(view.groupCols.map(col): _*)),
          view.groupCols, "left_semi")
      else existing
    val merged0 = touched.join(touchedOld, view.groupCols, "left")
    val merged = batchSk.fold(merged0)(sk =>
      merged0.join(sk, view.groupCols, "left"))
    val mmStruct = outSchema.toStruct
    val withRescan = rescanAgg match {
      case Some(r) => merged.join(r, view.groupCols, "left")
      case None =>
        view.minMaxCols.foldLeft(merged)((d, c) => d
          .withColumn(s"_r_mn_$c",
            lit(null).cast(mmStruct(s"min_$c").dataType))
          .withColumn(s"_r_mx_$c",
            lit(null).cast(mmStruct(s"max_$c").dataType)))
    }
    def z(c: Column): Column = coalesce(c, lit(0L))
    val outCols: Seq[Column] =
      Seq(
        concat_ws(Sep, view.groupCols.map(g => col(g).cast("string")): _*)
          .as(K),
        lit(java.sql.Timestamp.from(ViewStamp))
          .as(TableSchema.EventTimeName)) ++
        view.groupCols.map(col) ++
        Seq((z(col("_o_n")) + z(col("_a_n")) - z(col("_p_n")))
          .as("n_rows")) ++
        view.sumCols.flatMap(c => Seq(
          (z(col(s"_o_s_$c")) + z(col(s"_a_s_$c")) - z(col(s"_p_s_$c")))
            .as(s"sum_$c"),
          (z(col(s"_o_nn_$c")) + z(col(s"_a_nn_$c")) - z(col(s"_p_nn_$c")))
            .as(s"nn_$c"))) ++
        view.minMaxCols.flatMap(c => Seq(
          when(col("_p_n").isNotNull, col(s"_r_mn_$c"))
            .otherwise(least(col(s"_o_mn_$c"), col(s"_a_mn_$c")))
            .as(s"min_$c"),
          when(col("_p_n").isNotNull, col(s"_r_mx_$c"))
            .otherwise(greatest(col(s"_o_mx_$c"), col(s"_a_mx_$c")))
            .as(s"max_$c"))) ++
        view.varCols.map(c =>
          (z(col(s"_o_q_$c")) + z(col(s"_a_q_$c")) - z(col(s"_p_q_$c")))
            .as(s"ss_$c")) ++
        view.approxCols.map(c =>
          Hll.mergeExpr(s"_o_h_$c", s"_b_h_$c").as(Hll.colName(c)))
    (withRescan.select(outCols: _*), dvRows, maxV)
  }

  /** The served view: every live group's totals — [[refresh]]'s
    * contract makes this equal the one-shot `GROUP BY` over the
    * source's live corpus. Fully-emptied groups (persisted with
    * `n_rows = 0`) are filtered, exactly like [[LmIndex.score]]'s
    * zero-count bigrams. SQL's null-skipping semantics hold exactly:
    * `sum_<c>` serves NULL for a group whose live values are all null
    * (`nn_<c> = 0`), and `nn_<c>` IS `COUNT(c)`.
    */
  def serve(
      spark: SparkSession,
      idxLake: String, idxTable: String, view: ViewDef,
      version: Option[Long] = None,
      withSketches: Boolean = false): DataFrame = {
    val cols: Seq[Column] =
      view.groupCols.map(col) ++ Seq(col("n_rows")) ++
        view.sumCols.flatMap(c => Seq(
          when(col(s"nn_$c") > 0L, col(s"sum_$c")).as(s"sum_$c"),
          col(s"nn_$c"))) ++
        view.minMaxCols.flatMap(c => Seq(col(s"min_$c"), col(s"max_$c"))) ++
        // raw sum-of-squares totals: additive at every rollup grain,
        // guarded by nn at the point of use (a leaf expression, like
        // sum's nn gate, decides NULL semantics)
        view.varCols.map(c => col(s"ss_$c")) ++
        // the opt-in approx rewrite reads the HLL sketch columns
        // alongside the exact totals (the served estimate merges them
        // at the query's grain)
        (if (withSketches) view.approxCols.map(c => col(Hll.colName(c)))
         else Nil)
    val t = AzofTable(spark, idxLake, idxTable)
    val snap = version.map(v => t.snapshot(v.toString))
      .getOrElse(t.currentSnapshot)
    requireNnLayout(snap.schema, view.sumCols, idxTable,
      "MatView.rebuildEpoch (CLI: mv-rebuild)")
    requireSsLayout(snap.schema, view.varCols, idxTable,
      "MatView.rebuildEpoch (CLI: mv-rebuild)")
    if (withSketches)
      requireHllLayout(snap.schema, view.approxCols, idxTable,
        "MatView.rebuildEpoch (CLI: mv-rebuild)")
    graft.operators.AzofScan.scanSnapshot(spark, t, snap, AsOf.Current)
      .where(col("n_rows") > 0L)
      .select(cols: _*)
  }

  /** The live distinct PAIRS for one declared distinct column: every
    * `(group tuple, value)` with a positive refcount — the exact
    * support relation behind `COUNT(DISTINCT c)`. Aggregate it at ANY
    * group granularity (the view's, a subset's, or globally): the rows
    * are distinct pairs, so `count_distinct(value)` over them is exact
    * at every grain — an index-sized read, never a corpus scan.
    */
  def serveDistinctPairs(
      spark: SparkSession,
      idxLake: String, idxTable: String, view: ViewDef, dcol: String,
      version: Option[Long] = None): DataFrame = {
    require(view.distinctCols.contains(dcol) ||
      view.tupleNames.contains(dcol),
      s"'$dcol' is not a declared distinct column or tuple")
    val t = AzofTable(spark, idxLake, dvTableName(idxTable))
    val snap = version.map(v => t.snapshot(v.toString))
      .getOrElse(t.currentSnapshot)
    val live = graft.operators.AzofScan.scanSnapshot(spark, t, snap,
      AsOf.Current,
      keyFilter = Some(graft.format.KeyFilter.Range(
        Some(dcol + Sep), Some(dcol + Sep + "\uffff"))))
      .where(col("dcol") === dcol && col("ref") > 0L)
    // a TUPLE's partial-null pairs (NULL components marked with the
    // reserved token) exist for the multi-column histogram; SQL's
    // COUNT(DISTINCT a, b) SKIPS any-null rows, so the distinct
    // support relation excludes them (a no-op on pre-token pairs,
    // which never wrote partial-null rows)
    val distinctOnly =
      if (dcol.contains(","))
        live.where(!col("value").contains(TupleNullTok))
      else live
    distinctOnly.select((view.groupCols.map(col) :+ col("value")): _*)
  }

  /** `COUNT(DISTINCT dcol)` per `queryGroups` (a subset of the view's
    * group columns; empty = global), exact, from the support table
    * alone.
    */
  def countDistinct(
      spark: SparkSession,
      idxLake: String, idxTable: String, view: ViewDef, dcol: String,
      queryGroups: Seq[String],
      version: Option[Long] = None): DataFrame = {
    require(queryGroups.forall(view.groupCols.contains),
      "query groups must be view group columns")
    val pairs = serveDistinctPairs(spark, idxLake, idxTable, view, dcol,
      version)
    if (queryGroups.isEmpty)
      pairs.agg(count_distinct(col("value")).as(s"dv_$dcol"))
    else pairs.groupBy(queryGroups.map(col): _*)
      .agg(count_distinct(col("value")).as(s"dv_$dcol"))
  }

  /** `APPROX_COUNT_DISTINCT(acol)` per `queryGroups` from the view's
    * HLL sketch column — O(groups) storage at ANY value cardinality
    * (the exact support table's bounded-size sibling; see [[Hll]]).
    * Subset rollups (and the global grain) MERGE the group sketches
    * per position before estimating — never sum estimates. An explicit
    * serve face, deliberately NOT an automatic rewrite: the rewrite
    * contract is exactness.
    */
  def approxDistinct(
      spark: SparkSession,
      idxLake: String, idxTable: String, view: ViewDef, acol: String,
      queryGroups: Seq[String],
      version: Option[Long] = None): DataFrame = {
    require(view.approxCols.contains(acol),
      s"'$acol' is not a declared approx-distinct column")
    approxServe(spark, idxLake, idxTable, view.groupCols, acol,
      queryGroups, version)
  }

  /** The shared sketch-serve body ([[approxDistinct]] and
    * [[JoinView.approxDistinct]]): scan the view's live rows, merge
    * sketches at the query grain, estimate.
    */
  private[sources] def approxServe(
      spark: SparkSession,
      idxLake: String, idxTable: String, groupCols: Seq[String],
      acol: String, queryGroups: Seq[String],
      version: Option[Long]): DataFrame = {
    require(queryGroups.forall(groupCols.contains),
      "query groups must be view group columns")
    val t = AzofTable(spark, idxLake, idxTable)
    val snap = version.map(v => t.snapshot(v.toString))
      .getOrElse(t.currentSnapshot)
    requireHllLayout(snap.schema, Seq(acol), idxTable,
      "MatView.rebuildEpoch (CLI: mv-rebuild / jv-rebuild)")
    val hc = Hll.colName(acol)
    val base = graft.operators.AzofScan
      .scanSnapshot(spark, t, snap, AsOf.Current,
        projection = Some((groupCols :+ hc).toSet ++ Set("n_rows")))
      .where(col("n_rows") > 0L)
    val skFrame =
      if (queryGroups.toSet == groupCols.toSet)
        base.select((queryGroups.map(col) :+ col(hc)): _*)
      else if (queryGroups.isEmpty)
        base.agg(collect_list(col(hc)).as("_sks"))
          .withColumn(hc, Hll.mergeAllExpr("_sks")).drop("_sks")
      else
        base.groupBy(queryGroups.map(col): _*)
          .agg(collect_list(col(hc)).as("_sks"))
          .withColumn(hc, Hll.mergeAllExpr("_sks")).drop("_sks")
    Hll.estimate(skFrame, hc, s"adv_$acol").drop(hc)
  }

  /** Exact VALUE HISTOGRAM (heavy hitters) for one declared distinct
    * column at any group slice: `COUNT(*)` per live value — equals
    * `SELECT <groups>, c, COUNT(*) … GROUP BY <groups>, c` over the
    * live corpus INCLUDING the NULL bucket, served corpus-free: the
    * non-null buckets are `Σ ref` over the refcounted support pairs at
    * the query grain, and the NULL bucket is the view's `Σ n_rows`
    * minus the non-null refs (emitted only when positive). Both reads
    * are index-sized; compose `ORDER BY n_rows DESC LIMIT k` above for
    * exact top-k values. Values come back under their canonical STRING
    * encoding (the support table's storage form).
    */
  def valueHistogram(
      spark: SparkSession,
      idxLake: String, idxTable: String, view: ViewDef, dcol: String,
      queryGroups: Seq[String],
      version: Option[Long] = None,
      dvVersion: Option[Long] = None,
      measures: Seq[String] = Nil,
      slice: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
        Nil): DataFrame = {
    require(view.distinctCols.contains(dcol) ||
      view.tupleNames.contains(dcol),
      s"'$dcol' is not a declared distinct column or tuple")
    require(queryGroups.forall(view.groupCols.contains),
      "query groups must be view group columns")
    require(measures.forall(view.sumCols.contains),
      "histogram measures must be declared sum columns")
    // a TUPLE histogram over pre-token pairs with a nullable component
    // would silently drop SQL's partial-null groups — the direct-path
    // loud twin of the rewrite's silent candidacy gate (zero extra I/O
    // for format-3 tables; the source-schema read happens only on an
    // old stamp)
    if (dcol.contains(",")) {
      val fmt = defFormat(spark, idxLake, idxTable)
      if (fmt < TupleNullFormat)
        readDef(spark, idxLake, idxTable).foreach { case (sl, st, _) =>
          requireTupleLayout(fmt,
            AzofTable(spark, sl, st).currentSnapshot.schema,
            Seq(dcol.split(",").toSeq), idxTable,
            "MatView.rebuildEpoch (CLI: mv-rebuild)")
        }
    }
    val t = AzofTable(spark, idxLake, dvTableName(idxTable))
    val dvSnap = dvVersion.map(v => t.snapshot(v.toString))
      .getOrElse(t.currentSnapshot)
    if (measures.nonEmpty)
      requireDvLayout(dvSnap.schema, measures, dvTableName(idxTable),
        "MatView.rebuildEpoch (CLI: mv-rebuild)")
    val pairs = graft.operators.AzofScan.scanSnapshot(spark, t,
      dvSnap, AsOf.Current,
      keyFilter = Some(graft.format.KeyFilter.Range(
        Some(dcol + Sep), Some(dcol + Sep + "\uffff"))))
      .where(col("dcol") === dcol && col("ref") > 0L)
    // slice predicates reference view GROUP columns (by name): both
    // internal frames carry them all, so the filter applies BEFORE the
    // roll-up to the query grain — a `WHERE g = x` histogram is exact
    // even when g is not among the queried groups
    def applySlice(df: DataFrame): DataFrame =
      if (slice.isEmpty) df
      else {
        val p = df.queryExecution.analyzed
        val byName = p.output.map(a => a.name -> a).toMap
        val remapped = slice.map(_.transform {
          case a: org.apache.spark.sql.catalyst.expressions
            .AttributeReference => byName(a.name)
        }).reduce(org.apache.spark.sql.catalyst.expressions.And)
        org.apache.spark.sql.graft.StreamingBridge.ofRows(spark,
          org.apache.spark.sql.catalyst.plans.logical.Filter(remapped, p))
      }
    def grouped(df: DataFrame, aggs: Seq[Column]): DataFrame =
      if (queryGroups.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(queryGroups.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val slicedPairs = applySlice(pairs)
    // non-null value buckets: Σ ref (+ Σ pair-grain measure totals) per
    // live value at the query grain; a bucket whose measure values are
    // all NULL carries stored sum = 0 with nn = 0 and SERVES NULL —
    // SQL's null-skipping SUM, exactly like the view's own totals
    val histAggs: Seq[Column] =
      Seq(sum(col("ref")).as("n_rows")) ++
        measures.flatMap(c => Seq(
          sum(col(s"sum_$c")).as(s"_hs_$c"),
          sum(col(s"nn_$c")).as(s"_hnn_$c")))
    val histRaw =
      if (queryGroups.isEmpty)
        slicedPairs.groupBy(col("value")).agg(histAggs.head,
          histAggs.tail: _*)
      else slicedPairs.groupBy((queryGroups :+ "value").map(col): _*)
        .agg(histAggs.head, histAggs.tail: _*)
    val hist = histRaw.select(
      (queryGroups.map(col) ++ Seq(col("value"), col("n_rows")) ++
        measures.flatMap(c => Seq(
          when(col(s"_hnn_$c") > 0L, col(s"_hs_$c")).as(s"sum_$c"),
          col(s"_hnn_$c").as(s"nn_$c")))): _*)
    // the NULL bucket: view totals minus the non-null refs/measures
    // (the served view's sums are NULL when nn = 0, which the SUM here
    // skips — the totals stay exact)
    val totals = grouped(
      applySlice(serve(spark, idxLake, idxTable, view, version)).select(
        (queryGroups.map(col) ++ Seq(col("n_rows")) ++
          measures.flatMap(c =>
            Seq(col(s"sum_$c"), col(s"nn_$c")))): _*),
      Seq(sum(col("n_rows")).as("_tot")) ++
        measures.flatMap(c => Seq(
          sum(col(s"sum_$c")).as(s"_ts_$c"),
          sum(col(s"nn_$c")).as(s"_tnn_$c"))))
    val refSums = grouped(slicedPairs.select(
      (queryGroups.map(col) ++ Seq(col("ref")) ++
        measures.flatMap(c =>
          Seq(col(s"sum_$c"), col(s"nn_$c")))): _*),
      Seq(sum(col("ref")).as("_nn")) ++
        measures.flatMap(c => Seq(
          sum(col(s"sum_$c")).as(s"_rs_$c"),
          sum(col(s"nn_$c")).as(s"_rnn_$c"))))
    def z(c: Column): Column = coalesce(c, lit(0L))
    val nulls =
      (if (queryGroups.isEmpty) totals.crossJoin(refSums) // both one-row
       else totals.join(refSums, queryGroups, "left"))
        .select((queryGroups.map(col) ++ Seq(
          lit(null).cast("string").as("value"),
          (col("_tot") - z(col("_nn"))).as("n_rows")) ++
          measures.flatMap { c =>
            val nnN = z(col(s"_tnn_$c")) - z(col(s"_rnn_$c"))
            Seq(
              when(nnN > 0L, z(col(s"_ts_$c")) - z(col(s"_rs_$c")))
                .as(s"sum_$c"),
              nnN.as(s"nn_$c"))
          }): _*)
        .where(col("n_rows") > 0L)
    hist.unionByName(nulls)
  }

  /** Reconciliation hatch after a source ROLLBACK (the one state change
    * that lands with NO feed event): retrain the view from the CURRENT
    * live corpus into `newTable`, then serve from it — the
    * SemDedupIndex epoch shape, one atomic table swap for the operator.
    */
  def rebuildEpoch(
      spark: SparkSession,
      srcLake: String, srcTable: String,
      idxLake: String, newTable: String,
      view: ViewDef, at: Instant): Long = {
    requireNotAuto(newTable)
    val src = AzofTable(spark, srcLake, srcTable)
    // pin the version BEFORE reading: a commit racing the rebuild makes
    // the cursor claim less than the retrain saw, never more
    val atVersion = src.currentVersion.toLong
    val created = AzofWriter.createTableIfAbsent(
      spark, idxLake, newTable, viewSchema(src.currentSnapshot.schema, view),
      at)
    if (view.hasDistinct)
      AzofWriter.createTableIfAbsent(spark, idxLake, dvTableName(newTable),
        dvSchema(src.currentSnapshot.schema, view), at)
    if (created) {
      writeDef(spark, srcLake, srcTable, idxLake, newTable, view)
      graft.plans.MvRewriteRule.invalidateAuto(idxLake)
    }
    requireDerivedOk(spark, src.currentSnapshot.schema, view.derivedGroups)
    requireFilterOk(spark, src.currentSnapshot.schema, view.filter)
    val live = applyFilter(withDerived(
      graft.operators.AzofScan.scan(spark, srcLake, srcTable)
        .select(view.needed.map(col): _*), view), view.filter)
    val agg0 = groupAgg(live, view, "_a_")
    // one-shot sketches per approx column, joined onto the totals (a
    // group whose values are all NULL keeps the empty sketch)
    val agg = view.approxCols.foldLeft(agg0)((d, c) =>
      d.join(Hll.sketch(live, view.groupCols, c, s"_b_h_$c"),
        view.groupCols, "left"))
    val outCols: Seq[Column] =
      Seq(
        concat_ws(Sep, view.groupCols.map(g => col(g).cast("string")): _*)
          .as(TableSchema.KeyName),
        lit(java.sql.Timestamp.from(at)).as(TableSchema.EventTimeName)) ++
        view.groupCols.map(col) ++
        Seq(col("_a_n").as("n_rows")) ++
        view.sumCols.flatMap(c => Seq(
          coalesce(col(s"_a_s_$c"), lit(0L)).as(s"sum_$c"),
          col(s"_a_nn_$c").as(s"nn_$c"))) ++
        view.minMaxCols.flatMap(c => Seq(
          col(s"_a_mn_$c").as(s"min_$c"),
          col(s"_a_mx_$c").as(s"max_$c"))) ++
        view.varCols.map(c =>
          coalesce(col(s"_a_q_$c"), lit(0L)).as(s"ss_$c")) ++
        view.approxCols.map(c =>
          coalesce(col(s"_b_h_$c"), lit(Hll.Empty)).as(Hll.colName(c)))
    val rows = agg.select(outCols: _*)
    // one pass: count + the reserved-separator contract check
    val stats = rows.agg(count(lit(1)),
      sepViolations(rows, view.groupCols)).collect()(0)
    val n = stats.getLong(0)
    requireNoSep(if (stats.isNullAt(1)) 0L else stats.getLong(1), "retrained")
    if (n > 0) AzofWriter.commitDelta(spark, idxLake, newTable, rows, at, at)
    // DISTINCT support retrain: one-shot refcounts per (dcol, groups,
    // value) pair — committed BEFORE the cursor, like the refresh
    if (view.hasDistinct) {
      val dvKeys = Seq("dcol") ++ view.groupCols ++ Seq("value")
      val dvAggs: Seq[Column] =
        Seq(count(lit(1)).as("ref"),
          sum(col("_viol")).as("_viol")) ++
          view.sumCols.flatMap(c => Seq(
            coalesce(sum(col(c)), lit(0L)).as(s"sum_$c"),
            count(col(c)).as(s"nn_$c")))
      val pairs = distinctUnits(view.distinctCols, view.distinctTuples)
        .map { case (d, nn, v, viol) =>
          live.where(nn)
            .select(((view.groupCols ++ view.sumCols).distinct.map(col) ++
              Seq(v.as("value"), lit(d).as("dcol"),
                viol.as("_viol"))): _*)
        }.reduce(_.unionByName(_))
        .groupBy(dvKeys.map(col): _*)
        .agg(dvAggs.head, dvAggs.tail: _*)
        .localCheckpoint(true)
      val dvRows = pairs.select(
        (Seq(
          concat_ws(Sep, (Seq(col("dcol")) ++
            view.groupCols.map(c => col(c).cast("string")) ++
            Seq(col("value"))): _*).as(TableSchema.KeyName),
          lit(java.sql.Timestamp.from(at)).as(TableSchema.EventTimeName),
          col("dcol")) ++
          view.groupCols.map(col) ++
          Seq(col("value"), col("ref")) ++
          view.sumCols.flatMap(c =>
            Seq(col(s"sum_$c"), col(s"nn_$c")))): _*)
      // one pass: size + the reserved separator/NULL-token contract
      // (the refresh path's check, mirrored — a retrain must not be
      // the door ambiguous encodings sneak in through)
      val pStats = pairs.agg(count(lit(1)),
        sepViolations(pairs, view.groupCols),
        sum(when(valueSepViolation, 1L).otherwise(0L)),
        sum(col("_viol"))).collect()(0)
      def pz(i: Int) = if (pStats.isNullAt(i)) 0L else pStats.getLong(i)
      requireNoSep(pz(1) + pz(2) + pz(3), "retrained distinct-pair")
      if (pStats.getLong(0) > 0)
        AzofWriter.commitDelta(spark, idxLake, dvTableName(newTable),
          dvRows, at, at)
      graft.operators.Blocks.freeReferenced(pairs)
    }
    // the retrain saw the live state at (at least) the pinned version —
    // the rebuilt table serves rewrites immediately
    writeCursor(spark, idxLake, newTable, atVersion)
    n
  }
}
