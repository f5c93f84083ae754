package graft.sources

import graft.format.{AsOf, ColumnDef, ColumnType, KeyFilter, Snapshot, TableSchema}
import graft.format.AzofTable
import java.time.Instant
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One dimension of a star join: `fact.fkCol = dim.key`, contributing
  * `dimCols` (that dim table's value columns) to the view's group
  * columns. Foreign-key columns are distinct across a view's dims and
  * dim attribute names are disjoint (each group column resolves to
  * exactly one side).
  *
  * A dim may itself carry SNOWFLAKE sub-dimensions (`subs`): for a sub,
  * `fkCol` is a column ON THE PARENT DIM joining the sub table's record
  * key (`dim.subFk = subdim.key`, INNER like every star join), and
  * `dimCols` are the SUB table's attributes — group columns two hops
  * from the fact. One hop only for now: a sub cannot have its own subs.
  */
final case class DimJoin(fkCol: String, dimCols: Seq[String] = Nil,
    subs: Seq[DimJoin] = Nil) {
  require(fkCol.nonEmpty, "a dim join needs a foreign-key column")
  require(!dimCols.contains(fkCol), "fkCol is a fact column")
  require(subs.forall(_.subs.isEmpty),
    "snowflake chains are one hop (fact ⋈ dim ⋈ subdim) — a subdim " +
      "cannot declare its own subs")
  require(subs.map(_.fkCol).distinct.size == subs.size,
    "sub-dim foreign-key columns must be distinct within their dim")
  /** This dim's attributes plus its subs' (the group columns this
    * top-level dim side resolves).
    */
  def allCols: Seq[String] = dimCols ++ subs.flatMap(_.dimCols)
}

/** What a STAR join view maintains:
  * `fact JOIN dim1 ON fact.fk1 = dim1.key JOIN dim2 ON ... ` then
  * `GROUP BY groupCols` with `COUNT(*)` / `SUM` + non-null counts /
  * `MIN`/`MAX` — group columns drawn from the fact or ANY dim (each
  * dim's `dimCols` names its side), aggregated columns from the fact
  * side: sums are `Int` (nullable is fine — the view carries `nn_<c>`
  * non-null counts, [[ViewDef]]'s contract), min/max may be `Int`,
  * `String`, or `DateTime`. Join semantics are INNER on each dim's
  * RECORD KEY: a fact whose `fkCol` names no live dim row in ANY dim
  * contributes nothing.
  */
final case class JoinViewDef(
    groupCols: Seq[String],
    sumCols: Seq[String] = Nil,
    minMaxCols: Seq[String] = Nil,
    dims: Seq[DimJoin] = Seq(DimJoin("fk")),
    distinctCols: Seq[String] = Nil,
    derivedGroups: Seq[DerivedGroup] = Nil,
    distinctTuples: Seq[Seq[String]] = Nil,
    approxCols: Seq[String] = Nil,
    filter: Option[String] = None,
    varCols: Seq[String] = Nil) {
  require(groupCols.nonEmpty, "a join view needs group columns")
  require(varCols.forall(sumCols.contains),
    "variance columns must also be declared sum columns — VAR/STDDEV " +
      "decompose over (count, sum, sum-of-squares), and the view " +
      "stores the first two as sum_<c>/nn_<c>")
  require(varCols.distinct.size == varCols.size,
    "variance columns must be distinct")
  require(filter.forall(_.trim.nonEmpty),
    "a view filter must be a non-empty SQL predicate (omit it for the " +
      "unfiltered view)")
  require(dims.nonEmpty, "a join view needs at least one dim")
  require(dims.map(_.fkCol).distinct.size == dims.size,
    "foreign-key columns must be distinct across dims")
  /** All dim-side group columns, across dims AND their snowflake subs. */
  val dimColsAll: Seq[String] = dims.flatMap(_.allCols)
  /** Number of dim TABLES incl. snowflake subs — the length of every
    * flattened per-table list (locations, schemas, version vectors,
    * pins): pre-order, each top dim followed by its subs.
    */
  def flatDimCount: Int = dims.map(1 + _.subs.size).sum
  /** Top dim `i`'s position in the flattened per-table order (its subs
    * follow at `flatOffset(i) + 1 + j`).
    */
  def flatOffset(i: Int): Int = dims.take(i).map(1 + _.subs.size).sum
  /** Whether any dim carries snowflake subs. */
  def hasSubs: Boolean = dims.exists(_.subs.nonEmpty)
  require(dimColsAll.distinct.size == dimColsAll.size,
    "dim attribute names must be disjoint across dims (each group " +
      "column resolves to exactly one side)")
  require(dimColsAll.forall(groupCols.contains),
    "dimCols must be a subset of groupCols (dim attributes only group)")
  require(dims.forall(d => !dimColsAll.contains(d.fkCol)),
    "fk columns are fact columns")
  require(distinctCols.forall(c => !groupCols.contains(c)),
    "COUNT(DISTINCT <group col>) needs no support table — view rows " +
      "are distinct group tuples; declare only non-group distinct cols")
  require(distinctCols.forall(c => !dimColsAll.contains(c)),
    "distinct columns must be FACT columns (a dim attribute that " +
      "should be distinct-counted belongs in groupCols)")
  require(distinctTuples.forall(_.size >= 2),
    "a distinct TUPLE needs at least two columns — declare single " +
      "columns in distinctCols")
  require(distinctTuples.forall(t => t.distinct.size == t.size),
    "a distinct tuple's columns must be distinct")
  require(distinctTuples.map(_.mkString(",")).distinct.size ==
    distinctTuples.size, "distinct tuples must be distinct")
  require((distinctCols ++ distinctTuples.flatten).forall(!_.contains(",")),
    "distinct column names must not contain ',' (the tuple dcol " +
      "encoding joins component names with it)")
  require(distinctTuples.flatten.forall(c =>
    !groupCols.contains(c) && !dimColsAll.contains(c)),
    "distinct tuple components must be non-group FACT columns")
  require(derivedGroups.map(_.name).distinct.size == derivedGroups.size,
    "derived group names must be distinct")
  require(derivedGroups.forall(dg => groupCols.contains(dg.name)),
    "every derived group must be listed in groupCols")
  require(derivedGroups.forall(dg => !dimColsAll.contains(dg.name)),
    "derived groups are FACT-side expressions (a dim attribute is " +
      "already a group column)")
  require(derivedGroups.forall(dg =>
    !(sumCols ++ minMaxCols ++ distinctCols ++
      distinctTuples.flatten ++ approxCols).contains(dg.name)),
    "derived groups are group columns — they cannot be aggregated")
  require(approxCols.forall(c =>
    !groupCols.contains(c) && !dimColsAll.contains(c)),
    "approx-distinct columns must be non-group FACT columns")
  /** Whether the view maintains a distinct support table. */
  def hasDistinct: Boolean =
    distinctCols.nonEmpty || distinctTuples.nonEmpty
  /** The support-table `dcol` name of a declared tuple. */
  def tupleNames: Seq[String] = distinctTuples.map(_.mkString(","))
  /** Derived group names. */
  def derivedNames: Seq[String] = derivedGroups.map(_.name)
  /** Group columns that live on the fact side (verbatim, not derived). */
  def factGroupCols: Seq[String] =
    groupCols.filterNot(c =>
      dimColsAll.contains(c) || derivedNames.contains(c))
  /** Columns the FILTER predicate reads (unresolved parse; validated
    * at create — a dim-side ref must be a DECLARED dim group column,
    * the only dim attributes the enriched frames carry).
    */
  lazy val filterRefs: Seq[String] = filter.toSeq.flatMap(f =>
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(f)
      .collect {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          u.name
      }).distinct
  /** The filter's FACT-side refs (everything not a declared dim col). */
  def factFilterRefs: Seq[String] =
    filterRefs.filterNot(dimColsAll.contains)
  /** Fact columns the refresh reads. */
  def factNeeded: Seq[String] =
    (dims.map(_.fkCol) ++ factGroupCols ++ sumCols ++ minMaxCols ++
      distinctCols ++ distinctTuples.flatten ++ approxCols ++
      derivedGroups.flatMap(_.srcRefs) ++ factFilterRefs).distinct
}

/** PERSISTED incremental STAR-JOIN aggregate view — [[MatView]]'s
  * multi-table sibling, the classic warehouse denormalized rollup
  * (`SELECT d1.attr, d2.attr, count(*), sum(f.v) FROM fact f JOIN dim1
  * d1 ON f.fk1 = d1.key JOIN dim2 d2 ON f.fk2 = d2.key GROUP BY ...`)
  * maintained incrementally under churn on EVERY table:
  *
  *   - FACT churn (the [[MatView]] path, join-enriched): each batch's
  *     churned fact keys resolve their POST-state (newest batch row,
  *     enriched against every dim at its refreshed version) and
  *     PRE-state (live row at the fact cursor, enriched against every
  *     dim at ITS cursor — exactly what the previous refresh counted),
  *     and additive aggregates upsert `old − pre + new`.
  *   - DIM churn on dim `i` moves every live fact referencing a
  *     churned dim-`i` key across groups WITHOUT those facts having
  *     changed: the refresh reads exactly those facts (one fact scan
  *     filtered to the churned foreign keys — an `In` value filter
  *     under the broadcast guard, so value-stats file skipping
  *     confines the read on an fk-clustered layout), subtracts their
  *     contribution under ALL dims' PRE-attributes and re-adds under
  *     the new ones. A dim DELETE drops them (inner join); a dim
  *     INSERT adopts previously dangling facts. Churn on several dims
  *     in one catch-up composes: the affected-fact sets union (each
  *     fact subtracted/re-added ONCE).
  *   - `MIN`/`MAX` monoid-merge on groups that only gained rows and
  *     RESCAN groups that lost any — from one live star join at the
  *     refreshed version vector, semi-confined to those groups.
  *
  * Consistency contract: after every refresh, [[serve]] equals the
  * one-shot star aggregate over ALL tables' live states at the
  * consumed `(factVersion, dimVersions…)` vector. The refresh is a
  * SYNCHRONOUS batch call (the [[ShardMap]] face): one mixed upsert
  * delta per consumed range, EXACTLY-ONCE via the `stream_batches`
  * guard keyed by a strictly-increasing encoding of the version
  * vector — and a crash between the commit and the cursor write HEALS
  * on the next call: the refresh stages the intended cursor vector in
  * a PENDING sidecar before committing, so the next call promotes it
  * when the guard proves the commit landed (single-dim views keep the
  * legacy decode heal too), and the addition arithmetic can never
  * double-apply. Source ROLLBACK on any table keeps the family's
  * epoch hatch ([[rebuildEpoch]]).
  */
object JoinView {

  /** Cursor sidecar: the consumed (fact, dims…) version vector. */
  val CursorFileName = "_jv_cursor.json"

  /** Staged cursor vector for the commit in flight: written BEFORE the
    * guarded commit, promoted to [[CursorFileName]] by the next refresh
    * when the guard proves that commit landed (the crash-heal protocol
    * for version vectors the scalar guard id cannot encode reversibly).
    */
  val PendingFileName = "_jv_pending.json"

  private val Sep = "\u0001"

  /** Add every derived (fact-side) group column to `df` — applied to
    * each enriched frame the refresh aggregates.
    */
  private def withDerived(df: DataFrame, jdef: JoinViewDef): DataFrame =
    jdef.derivedGroups.foldLeft(df)((d, dg) =>
      d.withColumn(dg.name, expr(dg.sql).cast(dg.dataType.sparkType)))

  /** Pack the version vector into one replay-guard batch id: strictly
    * increasing across state-changing refreshes (every component only
    * grows and at least one strictly grows), and for single-dim views
    * identical to the historical `fact * 10^9 + dim` encoding (so
    * pre-existing guard stamps stay comparable). Unique-in-order while
    * the dims' combined history stays under 10^9 commits.
    */
  private def encode(f: Long, ds: Seq[Long]): Long =
    f * 1000000000L + ds.sum

  final case class RefreshReport(
      fromFact: Long, toFact: Long,
      fromDims: Seq[Long], toDims: Seq[Long],
      touched: Long, noop: Boolean) {
    /** Single-dim conveniences (the CLI/procedure print surface). */
    def fromDim: Long = fromDims.head
    def toDim: Long = toDims.head
  }

  /** The view table's value schema: dim-side group columns typed from
    * their dim schema, fact-side from the fact schema; `n_rows`, per
    * sum column `sum_<c>` + its non-null count `nn_<c>` (both i64),
    * and `min_<c>`/`max_<c>` under the fact column's own type.
    */
  def viewSchema(
      factSchema: TableSchema, dimSchemas: Seq[TableSchema],
      jdef: JoinViewDef): TableSchema = {
    require(dimSchemas.size == jdef.flatDimCount,
      s"${jdef.flatDimCount} dim tables declared (incl. snowflake " +
        s"subs), ${dimSchemas.size} schemas given")
    val factBy = factSchema.columns.map(c => c.name -> c).toMap
    val dimBy: Map[String, ColumnDef] =
      jdef.dims.zipWithIndex.flatMap { case (d, i) =>
        val ds = dimSchemas(jdef.flatOffset(i))
        val by = ds.columns.map(c => c.name -> c).toMap
        d.dimCols.map(n => n -> by.getOrElse(n,
          throw new IllegalArgumentException(
            s"dim group column '$n' is not in its dim schema"))) ++
          d.subs.zipWithIndex.flatMap { case (s, j) =>
            // the sub's fk lives on the PARENT DIM and joins the sub
            // table's string record key
            val fk = by.getOrElse(s.fkCol,
              throw new IllegalArgumentException(
                s"sub-dim fk column '${s.fkCol}' is not in its parent " +
                  "dim's schema"))
            if (fk.dataType != ColumnType.AzString)
              throw new IllegalArgumentException(
                s"sub-dim fk column '${s.fkCol}' must be a String (it " +
                  "joins the sub table's record key)")
            val ss = dimSchemas(jdef.flatOffset(i) + 1 + j)
            val sby = ss.columns.map(c => c.name -> c).toMap
            s.dimCols.map(n => n -> sby.getOrElse(n,
              throw new IllegalArgumentException(
                s"sub-dim group column '$n' is not in its sub schema")))
          }
      }.toMap
    val derivedBy = jdef.derivedGroups.map(dg => dg.name -> dg).toMap
    def defOf(n: String): ColumnDef =
      derivedBy.get(n) match {
        case Some(dg) => ColumnDef(n, dg.dataType, nullable = false)
        case None => dimBy.getOrElse(n, factBy.getOrElse(n,
          throw new IllegalArgumentException(
            s"fact column '$n' is not in the fact schema")))
      }
    jdef.derivedGroups.foreach { dg =>
      if (factBy.contains(dg.name) || dimBy.contains(dg.name))
        throw new IllegalArgumentException(
          s"derived group '${dg.name}' shadows a source column — " +
            "pick a fresh name")
      dg.srcRefs.foreach { r =>
        if (!factBy.contains(r)) throw new IllegalArgumentException(
          s"derived group '${dg.name}' references '$r', which is not " +
            "a FACT column (derived star buckets are fact-side " +
            "expressions)")
      }
    }
    jdef.dims.foreach { d =>
      val fk = factBy.getOrElse(d.fkCol,
        throw new IllegalArgumentException(
          s"fk column '${d.fkCol}' is not in the fact schema"))
      if (fk.dataType != ColumnType.AzString)
        throw new IllegalArgumentException(
          s"fk column '${d.fkCol}' must be a String (it joins to the " +
            "dim table's record key, which is a string — a numeric fk " +
            "would silently miss non-canonical renderings)")
    }
    jdef.sumCols.foreach { c =>
      val d = defOf(c)
      if (jdef.dimColsAll.contains(c) || d.dataType != ColumnType.AzInt)
        throw new IllegalArgumentException(
          s"sum column '$c' must be an Int FACT column (nullable is " +
            "fine — the view tracks a per-column non-null count)")
    }
    jdef.minMaxCols.foreach { c =>
      val d = defOf(c)
      if (jdef.dimColsAll.contains(c) || d.dataType == ColumnType.AzBoolean)
        throw new IllegalArgumentException(
          s"min/max column '$c' must be a non-Boolean FACT column — " +
            "aggregate a cast upstream instead")
    }
    (jdef.distinctCols ++ jdef.distinctTuples.flatten ++
      jdef.approxCols).foreach { c =>
      if (!factBy.contains(c))
        throw new IllegalArgumentException(
          s"distinct/approx column '$c' is not in the fact schema " +
            "(distinct and approx columns are FACT columns)")
    }
    TableSchema(
      jdef.groupCols.map(g =>
        ColumnDef(g, defOf(g).dataType, nullable = false)) ++
        Seq(ColumnDef("n_rows", ColumnType.AzInt, nullable = false)) ++
        jdef.sumCols.flatMap(c => Seq(
          ColumnDef(s"sum_$c", ColumnType.AzInt, nullable = false),
          ColumnDef(s"nn_$c", ColumnType.AzInt, nullable = false))) ++
        jdef.minMaxCols.flatMap(c => Seq(
          ColumnDef(s"min_$c", defOf(c).dataType, nullable = true),
          ColumnDef(s"max_$c", defOf(c).dataType, nullable = true))) ++
        jdef.varCols.map(c =>
          ColumnDef(s"ss_$c", ColumnType.AzInt, nullable = false)) ++
        jdef.approxCols.map(c =>
          ColumnDef(Hll.colName(c), ColumnType.AzString,
            nullable = false)))
  }

  /** The DISTINCT support table's value schema ([[MatView.dvSchema]]'s
    * star twin): the distinct column's NAME, the view's group columns
    * (typed from their fact/dim side), the value under its canonical
    * STRING encoding, and the reference count. One row per live
    * `(distinct col, group tuple, value)` — the structure that makes
    * `COUNT(DISTINCT c)` exact under fact churn AND under dim re-tiers
    * (the pair's group tuple moves with the dim attribute, subtracted
    * under the old attributes and re-added under the new ones by the
    * same pre/post enrichment the sums ride).
    */
  def dvSchema(
      factSchema: TableSchema, dimSchemas: Seq[TableSchema],
      jdef: JoinViewDef): TableSchema = {
    val full = viewSchema(factSchema, dimSchemas, jdef)
    val groupDefs = full.columns.take(jdef.groupCols.size)
    TableSchema(
      Seq(ColumnDef("dcol", ColumnType.AzString, nullable = false)) ++
        groupDefs ++
        Seq(ColumnDef("value", ColumnType.AzString, nullable = false),
          ColumnDef("ref", ColumnType.AzInt, nullable = false)) ++
        jdef.sumCols.flatMap(c => Seq(
          ColumnDef(s"sum_$c", ColumnType.AzInt, nullable = false),
          ColumnDef(s"nn_$c", ColumnType.AzInt, nullable = false))))
  }

  /** Definition sidecar ([[MatView.DefFileName]]'s join twin): what the
    * view maintains and over which fact/dims — read back by the
    * automatic rewrite rule. Same-lake sources record relative so the
    * sidecar survives the lake directory moving. Carries a `format`
    * stamp: 2 = the nn_/star layout; a sidecar WITHOUT the stamp was
    * written by a pre-nn_ binary and [[readDef]] refuses it loudly.
    */
  val DefFileName = "_jv_def.json"

  /** The current sidecar/table layout generation (3 = tuple support
    * pairs cover partial-null rows, [[MatView.TupleNullFormat]]; 4 =
    * the sidecar may carry a FILTER predicate,
    * [[MatView.FilterFormat]]; 5 = dims may carry SNOWFLAKE subs,
    * [[SubDimFormat]]). The nn_ gate in [[readDef]] stays at
    * generation 2: a format-2 sidecar reads fine — only tuples with
    * NULLABLE components need the format-3 encoding
    * ([[MatView.requireTupleLayout]]), only filter-bearing sidecars
    * need format 4 ([[MatView.requireFilterFormat]]), and only
    * sub-bearing sidecars need format 5 ([[requireSubFormat]]).
    */
  val FormatVersion = 5

  /** The first sidecar generation that may declare snowflake sub-dims.
    * A subs-bearing sidecar with an OLDER stamp can only be a hand
    * edit — its table was maintained by a binary that ignored (or
    * crashed on) the subs; refresh/serve refuse loudly and rewrite
    * candidacy falls back silently ([[MatView.FilterFormat]]'s
    * reasoning).
    */
  val SubDimFormat = 5

  /** LOUD snowflake-generation gate ([[SubDimFormat]]'s reasoning). */
  private[sources] def requireSubFormat(
      fmt: Int, jdef: JoinViewDef, table: String, remedy: String): Unit =
    if (jdef.hasSubs && fmt < SubDimFormat)
      throw new IllegalStateException(
        s"join view table '$table' declares snowflake sub-dims but its " +
          s"definition sidecar (format $fmt) predates them — its " +
          "contents were maintained by a binary that ignored the " +
          s"subs; rebuild it: $remedy")

  /** The oldest sidecar generation this binary can read (the nn_/star
    * layout); below it [[readDef]] refuses loudly.
    */
  val MinFormat = 2

  def create(
      spark: SparkSession,
      factLake: String, factTable: String,
      dims: Seq[(String, String)],
      idxLake: String, idxTable: String,
      jdef: JoinViewDef,
      segmentStart: Instant = Instant.parse("2024-01-01T00:00:00Z")): Unit = {
    MatView.requireNotAuto(idxTable)
    val fs = AzofTable(spark, factLake, factTable).currentSnapshot.schema
    val dss = dims.map { case (dl, dt) =>
      AzofTable(spark, dl, dt).currentSnapshot.schema }
    MatView.requireDerivedOk(spark, fs, jdef.derivedGroups)
    // the filter analyzes against the ENRICHED shape: fact columns
    // plus the declared dim group columns (the only dim attributes
    // the refresh frames carry — any other dim ref must refuse here)
    jdef.filter.foreach { _ =>
      val dimDefs = jdef.dims.zipWithIndex.flatMap { case (dj, i) =>
        def pick(ds: TableSchema, cols: Seq[String]) = {
          val byName = ds.columns.map(c => c.name -> c).toMap
          cols.map(c => byName.getOrElse(c,
            throw new IllegalArgumentException(
              s"dim column '$c' is not in its dim's schema")))
        }
        pick(dss(jdef.flatOffset(i)), dj.dimCols) ++
          dj.subs.zipWithIndex.flatMap { case (s, j) =>
            pick(dss(jdef.flatOffset(i) + 1 + j), s.dimCols) }
      }
      val badRefs = jdef.filterRefs.filterNot(r =>
        fs.columns.exists(_.name == r) || jdef.dimColsAll.contains(r))
      require(badRefs.isEmpty,
        s"view filter references ${badRefs.mkString(", ")} — a star " +
          "filter may read fact columns and DECLARED dim group " +
          "columns only (other dim attributes never reach the " +
          "enriched refresh frames)")
      MatView.requireFilterOk(spark,
        TableSchema(fs.columns ++ dimDefs), jdef.filter)
    }
    val created = AzofWriter.createTableIfAbsent(
      spark, idxLake, idxTable, viewSchema(fs, dss, jdef), segmentStart)
    if (jdef.hasDistinct)
      AzofWriter.createTableIfAbsent(spark, idxLake,
        MatView.dvTableName(idxTable), dvSchema(fs, dss, jdef), segmentStart)
    if (created) {
      writeDef(spark, factLake, factTable, dims, idxLake, idxTable, jdef)
      // a view created this session rewrites immediately under
      // spark.azof.mv.rewrite=auto
      graft.plans.MvRewriteRule.invalidateAuto(idxLake)
    }
    ()
  }

  private def writeDef(
      spark: SparkSession,
      factLake: String, factTable: String,
      dims: Seq[(String, String)],
      idxLake: String, idxTable: String, jdef: JoinViewDef): Unit = {
    def arr(xs: Seq[String]) =
      xs.map(x => "\"" + x + "\"").mkString("[", ",", "]")
    def rel(lake: String): String =
      if (new org.apache.hadoop.fs.Path(lake) ==
        new org.apache.hadoop.fs.Path(idxLake)) "" else lake
    val dir = AzofTable(spark, idxLake, idxTable).tableDir
    val p = new org.apache.hadoop.fs.Path(dir, DefFileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // a recreate under a previously-dropped name must not serve the
    // old table's cached format stamp
    MatView.invalidateDefFormat(idxLake, idxTable)
    val dimArr = jdef.dims.zipWithIndex.map { case (dj, i) =>
      val (dl, dt) = dims(jdef.flatOffset(i))
      val subArr =
        if (dj.subs.isEmpty) ""
        else "," + s""""subs":""" + dj.subs.zipWithIndex.map {
          case (s, j) =>
            val (sl, st) = dims(jdef.flatOffset(i) + 1 + j)
            s"""{"path":"${rel(sl)}","table":"$st",""" +
              s""""fk_col":"${s.fkCol}","dim_cols":${arr(s.dimCols)}}"""
        }.mkString("[", ",", "]")
      s"""{"path":"${rel(dl)}","table":"$dt",""" +
        s""""fk_col":"${dj.fkCol}","dim_cols":${arr(dj.dimCols)}""" +
        subArr + "}"
    }.mkString("[", ",", "]")
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val derived = jdef.derivedGroups.map(dg =>
      s"""{"name":"${dg.name}","sql":"${esc(dg.sql)}",""" +
        s""""type":"${dg.dataType.jsonName}"}""")
      .mkString("[", ",", "]")
    val out = fs.create(p, true)
    try out.write(
      (s"""{"format":$FormatVersion,""" +
        s""""fact_path":"${rel(factLake)}","fact_table":"$factTable",""" +
        s""""group_cols":${arr(jdef.groupCols)},""" +
        s""""sum_cols":${arr(jdef.sumCols)},""" +
        s""""minmax_cols":${arr(jdef.minMaxCols)},""" +
        s""""distinct_cols":${arr(jdef.distinctCols)},""" +
        s""""distinct_tuples":${jdef.distinctTuples
          .map(arr).mkString("[", ",", "]")},""" +
        s""""approx_cols":${arr(jdef.approxCols)},""" +
        s""""var_cols":${arr(jdef.varCols)},""" +
        s""""filter":"${esc(jdef.filter.getOrElse(""))}",""" +
        s""""derived_groups":$derived,""" +
        s""""dims":$dimArr}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The view's definition sidecar:
    * `(factLake, factTable, dims as (lake, table), def)` — None when
    * the table has no sidecar; a LOUD refusal (naming the rebuild
    * remedy) when the sidecar predates the nn_/star layout, so a
    * binary upgrade surfaces "rebuild required" instead of an opaque
    * unresolved-column error downstream.
    */
  def readDef(
      spark: SparkSession, idxLake: String, idxTable: String)
      : Option[(String, String, Seq[(String, String)], JoinViewDef)] = {
    val dir = AzofTable(spark, idxLake, idxTable).tableDir
    val p = new org.apache.hadoop.fs.Path(dir, DefFileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val root =
        try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
        finally in.close()
      val fmt = Option(root.get("format")).map(_.asInt).getOrElse(1)
      if (fmt < MinFormat) throw new IllegalStateException(
        s"join view '$idxTable' was built by a pre-nn_ binary " +
          s"(sidecar format $fmt < $MinFormat) — its table lacks " +
          "the per-column non-null counts this binary maintains; " +
          "rebuild it via JoinView.rebuildEpoch (CLI: jv-rebuild)")
      def seq(n: com.fasterxml.jackson.databind.JsonNode): Seq[String] =
        (0 until n.size()).map(i => n.get(i).asText())
      def lake(v: String): String = if (v.isEmpty) idxLake else v
      val dimsNode = root.get("dims")
      // flattened pre-order: each top dim's location followed by its
      // snowflake subs' — [[JoinViewDef.flatOffset]]'s contract
      val locs = scala.collection.mutable.ArrayBuffer
        .empty[(String, String)]
      val dims = (0 until dimsNode.size()).map { i =>
        val d = dimsNode.get(i)
        locs += ((lake(d.get("path").asText), d.get("table").asText))
        val subs = Option(d.get("subs")) match {
          case Some(sn) => (0 until sn.size()).map { j =>
            val s = sn.get(j)
            locs += ((lake(s.get("path").asText), s.get("table").asText))
            DimJoin(s.get("fk_col").asText, seq(s.get("dim_cols")))
          }
          case None => Nil
        }
        DimJoin(d.get("fk_col").asText, seq(d.get("dim_cols")), subs)
      }
      // absent in pre-distinct/pre-derived sidecars (still format 2)
      val dcols = Option(root.get("distinct_cols"))
        .map(seq).getOrElse(Nil)
      val derived = Option(root.get("derived_groups")) match {
        case Some(n) => (0 until n.size()).map { i =>
          val d = n.get(i)
          DerivedGroup(d.get("name").asText, d.get("sql").asText,
            ColumnType.fromJsonName(d.get("type").asText))
        }
        case None => Nil
      }
      val tuples = Option(root.get("distinct_tuples")) match {
        case Some(n) => (0 until n.size()).map { i =>
          val t = n.get(i)
          (0 until t.size()).map(j => t.get(j).asText())
        }
        case None => Nil // absent in pre-tuple sidecars
      }
      val acols = Option(root.get("approx_cols"))
        .map(seq).getOrElse(Nil)
      val filt = Option(root.get("filter")).map(_.asText)
        .filter(_.nonEmpty)
      Some((lake(root.get("fact_path").asText),
        root.get("fact_table").asText,
        locs.toSeq,
        JoinViewDef(seq(root.get("group_cols")), seq(root.get("sum_cols")),
          seq(root.get("minmax_cols")), dims, dcols, derived,
          tuples, acols, filt,
          Option(root.get("var_cols")).map(seq).getOrElse(Nil))))
    }
  }

  /** The rewrite rule's gate: the view equals the one-shot star
    * aggregate over all tables' CURRENT live states — cursor vector
    * consumed, and every later commit on EACH source view-preserving
    * ([[MatView.unchangedSince]]).
    */
  def isFresh(
      spark: SparkSession,
      factLake: String, factTable: String,
      dims: Seq[(String, String)],
      idxLake: String, idxTable: String): Boolean =
    freshViewVersion(spark, factLake, factTable, dims,
      idxLake, idxTable).isDefined

  /** [[isFresh]] that PINS the validated view version for the rewrite
    * rule's executed scan ([[MatView.freshViewVersion]]'s reasoning:
    * cursor before pin, refresh commits before cursor — the pinned
    * snapshot always carries at least the validated state).
    */
  def freshViewVersion(
      spark: SparkSession,
      factLake: String, factTable: String,
      dims: Seq[(String, String)],
      idxLake: String, idxTable: String): Option[Long] =
    freshViewVersionAt(spark, factLake, factTable, dims, idxLake, idxTable,
      None, Seq.fill(dims.size)(None))

  /** [[freshViewVersion]] for a VERSION-PINNED star read
    * ([[MatView.freshViewVersionAt]]'s join twin): each table may carry
    * its own `VERSION AS OF` pin (None = the un-pinned Current read).
    * The view serves exactly when EVERY table's requested state
    * provably equals its consumed-cursor state — a pinned table walks
    * every main-lineage commit after `min(pin, cursor)` (covering both
    * the pin↔cursor and cursor↔current spans, the single-table
    * reasoning verbatim), an un-pinned table walks from the cursor. A
    * pin resolving to a BRANCH head refuses (a different lineage's
    * state under shared numbering). This is the reproducible-report
    * star: an `AS OF` dashboard over `fact ⋈ dims` re-served from the
    * view, never wrong — any state-changing commit in any span falls
    * back to the scan+join.
    */
  def freshViewVersionAt(
      spark: SparkSession,
      factLake: String, factTable: String,
      dims: Seq[(String, String)],
      idxLake: String, idxTable: String,
      factPin: Option[Long], dimPins: Seq[Option[Long]]): Option[Long] =
    freshViewVersions(spark, factLake, factTable, dims, idxLake, idxTable,
      factPin.map(ReadPin.Version(_)),
      dimPins.map(_.map(ReadPin.Version(_))), needDv = false).map(_._1)

  /** [[freshViewVersionAt]] that ALSO pins the DISTINCT-support
    * table's snapshot — [[MatView.freshViewVersions]]'s star twin, the
    * TOCTOU-closed gate: cursor first, BOTH pins next, every table's
    * view-preserving walk LAST. A refresh only runs after a source
    * data commit on some table, so any view/support state newer than
    * the cursor vector implies a commit the walks (reading every
    * source's snapshot list after the pins) see and refuse; a
    * validated walk therefore proves both pinned snapshots carry
    * exactly the cursor vector's state.
    */
  def freshViewVersions(
      spark: SparkSession,
      factLake: String, factTable: String,
      dims: Seq[(String, String)],
      idxLake: String, idxTable: String,
      factPin: Option[ReadPin], dimPins: Seq[Option[ReadPin]],
      needDv: Boolean): Option[(Long, Option[Long])] = {
    require(dimPins.size == dims.size,
      s"${dims.size} dims, ${dimPins.size} pins")
    val (dir, fs, p) = sidecarPath(spark, idxLake, idxTable, CursorFileName)
    val _ = dir
    if (!fs.exists(p)) None
    else {
      val (f, ds) = readCursor(spark, idxLake, idxTable, dims.size)
      if (ds.size != dims.size) None
      else {
        // PIN BEFORE the walks — see the scaladoc's ordering argument
        val vv = AzofTable(spark, idxLake, idxTable).currentVersion.toLong
        val dvV: Option[Option[Long]] =
          if (!needDv) Some(None)
          else scala.util.Try(
            AzofTable(spark, idxLake, MatView.dvTableName(idxTable))
              .currentVersion.toLong).toOption.map(Some(_))
        dvV.flatMap { dv =>
          // per-table 3-way pin walk (Current / VERSION AS OF /
          // TIMESTAMP AS OF) — [[MatView.pinOk]], the single-table
          // gate's logic verbatim
          val ok = MatView.pinOk(spark, factLake, factTable, f, factPin) &&
            dims.indices.forall { i =>
              val (dl, dt) = dims(i)
              MatView.pinOk(spark, dl, dt, ds(i), dimPins(i)) }
          if (ok) Some((vv, dv)) else None
        }
      }
    }
  }

  private def sidecarPath(spark: SparkSession, idxLake: String,
      idxTable: String, name: String) = {
    val dir = AzofTable(spark, idxLake, idxTable).tableDir
    val p = new org.apache.hadoop.fs.Path(dir, name)
    (dir, p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** The consumed (fact, dims…) version vector, (1, [1…]) before the
    * first refresh (version 1 = the empty create snapshot of each
    * source). Reads the legacy single-dim `dimVersion` field too.
    */
  def readCursor(
      spark: SparkSession, idxLake: String, idxTable: String,
      nDims: Int = 1)
      : (Long, Seq[Long]) = {
    val (_, fs, p) = sidecarPath(spark, idxLake, idxTable, CursorFileName)
    if (!fs.exists(p)) (1L, Seq.fill(nDims)(1L))
    else {
      val in = fs.open(p)
      val root =
        try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
        finally in.close()
      val ds = Option(root.get("dimVersions")) match {
        case Some(arr) => (0 until arr.size()).map(i => arr.get(i).asLong)
        case None => Seq(root.get("dimVersion").asLong)
      }
      (root.get("factVersion").asLong, ds)
    }
  }

  /** The consumed cursor vector rendered for operator surfaces
    * (`SHOW`/`DESCRIBE MATERIALIZED VIEW`) — None before the first
    * refresh.
    */
  def readCursorString(
      spark: SparkSession, idxLake: String, idxTable: String)
      : Option[String] = {
    val (_, fs, p) = sidecarPath(spark, idxLake, idxTable, CursorFileName)
    if (!fs.exists(p)) None
    else {
      val (f, ds) = readCursor(spark, idxLake, idxTable)
      Some(s"fact=$f; dims=${ds.mkString(",")}")
    }
  }

  private def writeCursor(
      spark: SparkSession, idxLake: String, idxTable: String,
      f: Long, ds: Seq[Long]): Unit = {
    val (dir, fs, p) = sidecarPath(spark, idxLake, idxTable, CursorFileName)
    AtomicReplace.replace(fs, dir, p,
      s"""{"factVersion":$f,"dimVersions":[${ds.mkString(",")}]}""")
    ()
  }

  private def readPending(
      spark: SparkSession, idxLake: String, idxTable: String)
      : Option[(Long, Long, Seq[Long])] = {
    val (_, fs, p) = sidecarPath(spark, idxLake, idxTable, PendingFileName)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val root =
        try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
        finally in.close()
      val arr = root.get("dimVersions")
      Some((root.get("batch").asLong, root.get("factVersion").asLong,
        (0 until arr.size()).map(i => arr.get(i).asLong)))
    }
  }

  private def writePending(
      spark: SparkSession, idxLake: String, idxTable: String,
      batch: Long, f: Long, ds: Seq[Long]): Unit = {
    val (dir, fs, p) = sidecarPath(spark, idxLake, idxTable, PendingFileName)
    AtomicReplace.replace(fs, dir, p,
      s"""{"batch":$batch,"factVersion":$f,""" +
        s""""dimVersions":[${ds.mkString(",")}]}""")
    ()
  }

  /** One synchronous catch-up of the view to all sources' current main
    * versions. See the object scaladoc for the three paths. `dims` are
    * the dim tables' locations, aligned with `jdef.dims`.
    */
  def refresh(
      spark: SparkSession,
      factLake: String, factTable: String,
      dims: Seq[(String, String)],
      idxLake: String, idxTable: String,
      jdef: JoinViewDef,
      broadcastKeyMax: Long = DedupFlow.DefaultBroadcastKeyMax)
      : RefreshReport = {
    require(dims.size == jdef.flatDimCount,
      s"${jdef.flatDimCount} dim tables declared (incl. snowflake " +
        s"subs, pre-order), ${dims.size} locations given")
    create(spark, factLake, factTable, dims, idxLake, idxTable, jdef)
    val K = TableSchema.KeyName
    val appId = s"join-view#$idxTable"
    val fact = AzofTable(spark, factLake, factTable)
    requireSubFormat(MatView.defFormat(spark, idxLake, idxTable), jdef,
      idxTable, "JoinView.rebuildEpoch (CLI: jv-rebuild)")
    MatView.requireNnLayout(
      AzofTable(spark, idxLake, idxTable).currentSnapshot.schema,
      jdef.sumCols, idxTable, "JoinView.rebuildEpoch (CLI: jv-rebuild)")
    if (jdef.hasDistinct && jdef.sumCols.nonEmpty)
      MatView.requireDvLayout(
        AzofTable(spark, idxLake, MatView.dvTableName(idxTable))
          .currentSnapshot.schema,
        jdef.sumCols, MatView.dvTableName(idxTable),
        "JoinView.rebuildEpoch (CLI: jv-rebuild)")
    if (jdef.distinctTuples.nonEmpty)
      MatView.requireTupleLayout(
        MatView.defFormat(spark, idxLake, idxTable),
        fact.currentSnapshot.schema, jdef.distinctTuples, idxTable,
        "JoinView.rebuildEpoch (CLI: jv-rebuild)")
    if (jdef.approxCols.nonEmpty)
      MatView.requireHllLayout(
        AzofTable(spark, idxLake, idxTable).currentSnapshot.schema,
        jdef.approxCols, idxTable,
        "JoinView.rebuildEpoch (CLI: jv-rebuild)")
    if (jdef.varCols.nonEmpty)
      MatView.requireSsLayout(
        AzofTable(spark, idxLake, idxTable).currentSnapshot.schema,
        jdef.varCols, idxTable,
        "JoinView.rebuildEpoch (CLI: jv-rebuild)")
    MatView.requireFilterFormat(
      MatView.defFormat(spark, idxLake, idxTable), jdef.filter,
      idxTable, "JoinView.rebuildEpoch (CLI: jv-rebuild)")
    val dimTabs = dims.map { case (dl, dt) => AzofTable(spark, dl, dt) }
    // heal the cursor: a crash between commit and cursor write left the
    // replay guard ahead of the sidecar — the PENDING vector (staged
    // before that commit) is promoted once the guard proves it landed;
    // single-dim views keep the legacy scalar-decode heal as fallback
    var (fPrev, dPrevs) = readCursor(spark, idxLake, idxTable, dims.size)
    val lastApplied =
      graft.streaming.AzofSink.lastCommitted(spark, idxLake, idxTable, appId)
    val hasDv = jdef.hasDistinct
    def dvApplied(b: Long): Boolean = !hasDv ||
      graft.streaming.AzofSink.lastCommitted(spark, idxLake,
        MatView.dvTableName(idxTable), s"$appId#dv").exists(_ >= b)
    // a crash AFTER the view commit but BEFORE the support commit must
    // NOT promote the cursor (the distinct-pair delta would be lost
    // forever): promotion requires BOTH replay guards at the staged
    // batch; a half-landed batch instead re-runs as a CATCH-UP leg
    // pinned to the staged vector — the view commit replays as a guard
    // no-op, the support commit applies, then the cursor promotes
    var catchUp: Option[(Long, Seq[Long])] = None
    readPending(spark, idxLake, idxTable) match {
      case Some((b, pf, pds)) if pds.size == dims.size &&
          lastApplied.exists(_ >= b) && b > encode(fPrev, dPrevs) =>
        if (dvApplied(b)) {
          writeCursor(spark, idxLake, idxTable, pf, pds)
          fPrev = pf; dPrevs = pds
        } else catchUp = Some((pf, pds))
      case _ if dims.size == 1 =>
        lastApplied.filter(_ > encode(fPrev, dPrevs)).foreach { applied =>
          val (hf, hd) = (applied / 1000000000L, applied % 1000000000L)
          if (dvApplied(applied)) {
            writeCursor(spark, idxLake, idxTable, hf, Seq(hd))
            fPrev = hf; dPrevs = Seq(hd)
          } else catchUp = Some((hf, Seq(hd)))
        }
      case _ => ()
    }
    if (dPrevs.size != dims.size)
      throw new IllegalStateException(
        s"cursor carries ${dPrevs.size} dim version(s) for a " +
          s"${dims.size}-dim view — the definition cannot change for a " +
          "view table's life; rebuild via JoinView.rebuildEpoch")
    catchUp.foreach { case (pf, pds) =>
      refreshLeg(spark, factLake, factTable, dims, idxLake, idxTable,
        jdef, broadcastKeyMax, fPrev, dPrevs, pf, pds)
      fPrev = pf; dPrevs = pds
    }
    val fNow = fact.currentVersion.toLong
    val dNows = dimTabs.map(_.currentVersion.toLong)
    if (fNow < fPrev || dNows.zip(dPrevs).exists { case (n, p) => n < p })
      throw new IllegalStateException(
        s"source went backwards (fact $fPrev→$fNow, dims " +
          s"${dPrevs.mkString(",")}→${dNows.mkString(",")}) — a rollback " +
          "needs rebuildEpoch, the feed's documented contract")
    if (fNow == fPrev && dNows == dPrevs)
      return RefreshReport(fPrev, fNow, dPrevs, dNows, 0L, noop = true)
    refreshLeg(spark, factLake, factTable, dims, idxLake, idxTable,
      jdef, broadcastKeyMax, fPrev, dPrevs, fNow, dNows)
  }

  /** One delta leg `(fPrev, dPrevs) → (fNow, dNows)`: compute, commit
    * (view then distinct support, each under its own replay guard at
    * the vector's batch id), promote the cursor. Pinned target versions
    * so the crash-heal can re-run a half-landed batch exactly.
    */
  private def refreshLeg(
      spark: SparkSession,
      factLake: String, factTable: String,
      dims: Seq[(String, String)],
      idxLake: String, idxTable: String,
      jdef: JoinViewDef,
      broadcastKeyMax: Long,
      fPrev: Long, dPrevs: Seq[Long],
      fNow: Long, dNows: Seq[Long]): RefreshReport = {
    val K = TableSchema.KeyName
    val appId = s"join-view#$idxTable"
    val fact = AzofTable(spark, factLake, factTable)
    val dimTabs = dims.map { case (dl, dt) => AzofTable(spark, dl, dt) }
    val hasDv = jdef.hasDistinct
    val dvName = MatView.dvTableName(idxTable)
    val factSnapNow = fact.snapshot(fNow.toString)
    val factSnapPrev = fact.snapshot(fPrev.toString)
    val dimSnapNow = dimTabs.zip(dNows).map { case (t, v) =>
      t.snapshot(v.toString) }
    val dimSnapPrev = dimTabs.zip(dPrevs).map { case (t, v) =>
      t.snapshot(v.toString) }

    def newestOf(churn: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(K)).orderBy(col("_commit_version").desc)
      churn.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
    }
    // ---- per-dim churn (empty frames when a dim didn't move)
    val dimChurn = dims.indices.map { i =>
      val (dl, dt) = dims(i)
      newestOf(AzofChangeFeed.between(spark, dl, dt, dPrevs(i), dNows(i)))
        .localCheckpoint(true)
    }
    val nDimChurn = dimChurn.map(_.count())
    val dimKeySets: Seq[Option[Set[String]]] = dims.indices.map { i =>
      if (nDimChurn(i) == 0L) Some(Set.empty[String])
      else if (nDimChurn(i) <= broadcastKeyMax)
        Some(dimChurn(i).select(col(K)).collect().map(_.getString(0)).toSet)
      else None
    }
    // a full top-dim scan at the given version VECTOR, keyed `_dk_<i>`
    // for the star enrichment: snowflake subs join INNER on the dim's
    // sub fk at THEIR vector positions, so the frame carries the dim's
    // own attributes plus its subs' — two-hop group columns resolve
    // against exactly the states the vector names (dims are
    // group-cardinality-class tables; these joins are the same reads
    // the one-shot query pays)
    def dimScan(i: Int, snaps: Seq[Snapshot]): DataFrame = {
      val dj = jdef.dims(i)
      val off = jdef.flatOffset(i)
      val base = graft.operators.AzofScan.scanSnapshot(spark,
        dimTabs(off), snaps(off), AsOf.Current,
        projection = Some((Set(K) ++ dj.dimCols ++
          dj.subs.map(_.fkCol)).toSet))
        .withColumnRenamed(K, s"_dk_$i")
      if (dj.subs.isEmpty) base
      else dj.subs.zipWithIndex.foldLeft(base) { case (acc, (s, j)) =>
        val sub = graft.operators.AzofScan.scanSnapshot(spark,
          dimTabs(off + 1 + j), snaps(off + 1 + j), AsOf.Current,
          projection = Some((Set(K) ++ s.dimCols).toSet))
          .withColumnRenamed(K, s"_sk_${i}_$j")
        acc.join(sub, acc(s.fkCol) === sub(s"_sk_${i}_$j"))
      // sub fk columns are DIM-side names (possibly shared across
      // dims) — project them away so the enrichment fold stays
      // unambiguous
      }.select((Seq(col(s"_dk_$i")) ++ dj.allCols.map(col)): _*)
    }
    // derived names materialize AFTER the join (fact-side expressions)
    val rawCols = (jdef.groupCols.filterNot(jdef.derivedNames.contains) ++
      jdef.sumCols ++ jdef.minMaxCols ++ jdef.distinctCols ++
      jdef.distinctTuples.flatten ++ jdef.approxCols ++
      jdef.derivedGroups.flatMap(_.srcRefs) ++
      jdef.factFilterRefs).distinct
    // the FILTER applies to every enriched frame identically — adds,
    // subs, AND the min/max rescan — so membership is decided per
    // (fact row, dim state) pair and the subtraction stays exact when
    // a dim re-tier moves facts across the predicate boundary
    def enrich(facts: DataFrame, dimFrames: Seq[DataFrame]): DataFrame =
      MatView.applyFilter(
        withDerived(jdef.dims.indices.foldLeft(facts) { (acc, i) =>
          acc.join(dimFrames(i),
            acc(jdef.dims(i).fkCol) === dimFrames(i)(s"_dk_$i"))
        }.select(rawCols.map(col): _*), jdef), jdef.filter)

    // ---- fact churn
    val factChurn = newestOf(
      AzofChangeFeed.between(spark, factLake, factTable, fPrev, fNow))
      .localCheckpoint(true)
    val nFactChurn = factChurn.count()
    val factKeysSmall = nFactChurn <= broadcastKeyMax
    val factProjected = Seq(col(K)) ++ jdef.factNeeded.map(col)
    def factScan(snap: Snapshot, keys: Option[Set[String]],
        fkIn: Option[(String, Seq[Any])]): DataFrame =
      graft.operators.AzofScan.scanSnapshot(spark, fact, snap,
        AsOf.Current,
        projection = Some((Set(K) ++ jdef.factNeeded).toSet),
        keyFilter = keys.map(KeyFilter.Keys(_)),
        valueFilters = fkIn.toSeq.map { case (c, vs) =>
          org.apache.spark.sql.sources.In(c, vs.toArray) })
        .select(factProjected: _*)
    val factNewRows = factChurn.where(!col("_deleted"))
      .select(factProjected: _*)
    val factPreRows =
      if (nFactChurn == 0) factNewRows.limit(0)
      else if (factKeysSmall) {
        val keys = factChurn.select(col(K)).collect()
          .map(_.getString(0)).toSet
        factScan(factSnapPrev, Some(keys), None)
      } else factScan(factSnapPrev, None, None)
        .join(factChurn.select(col(K)), Seq(K), "left_semi")

    // ---- per TOP dim: the dim KEYS whose group-resolving state moved
    // — the dim's own churned keys plus (snowflake) dim rows whose sub
    // fk references a churned SUB key: those dim rows are unchanged,
    // but their two-hop attributes are not, and every fact referencing
    // them moves groups. Each lookup file-skips (an `In` value filter
    // on the sub fk under the broadcast guard, a semi join above it);
    // churned dim rows themselves need no sub lookup (own covers any
    // sub-fk change, insert, or delete).
    val movedCk = scala.collection.mutable.Buffer.empty[DataFrame]
    val movedDim: Seq[(Long, Option[Set[String]], DataFrame)] =
      jdef.dims.indices.map { i =>
        val dj = jdef.dims(i)
        val off = jdef.flatOffset(i)
        if (dj.subs.isEmpty)
          (nDimChurn(off), dimKeySets(off), dimChurn(off).select(col(K)))
        else {
          val subMoved: Seq[DataFrame] = dj.subs.zipWithIndex.flatMap {
            case (s, j) =>
              val so = off + 1 + j
              if (nDimChurn(so) == 0L) None
              else Some(dimKeySets(so) match {
                case Some(ks) =>
                  graft.operators.AzofScan.scanSnapshot(spark,
                    dimTabs(off), dimSnapNow(off), AsOf.Current,
                    projection = Some(Set(K, s.fkCol)),
                    valueFilters = Seq(org.apache.spark.sql.sources
                      .In(s.fkCol, ks.toSeq.toArray)))
                    .where(col(s.fkCol).isin(ks.toSeq: _*))
                    .select(col(K))
                case None =>
                  graft.operators.AzofScan.scanSnapshot(spark,
                    dimTabs(off), dimSnapNow(off), AsOf.Current,
                    projection = Some(Set(K, s.fkCol)))
                    .join(dimChurn(so).select(col(K).as(s.fkCol)),
                      Seq(s.fkCol), "left_semi")
                    .select(col(K))
              })
          }
          val own: Option[DataFrame] =
            if (nDimChurn(off) == 0L) None
            else Some(dimChurn(off).select(col(K)))
          val frames = own.toSeq ++ subMoved
          if (frames.isEmpty)
            (0L, Some(Set.empty[String]),
              dimChurn(off).select(col(K)).limit(0))
          else {
            val u = frames.reduce(_.unionByName(_))
              .dropDuplicates(Seq(K)).localCheckpoint(true)
            movedCk += u
            val n = u.count()
            val ks =
              if (n <= broadcastKeyMax)
                Some(u.collect().map(_.getString(0)).toSet)
              else None
            (n, ks, u)
          }
        }
      }
    // ---- A: live, un-churned facts ANY of whose dim attributes moved
    // (unioned across dims, then deduped by key — a fact affected via
    // two dims is subtracted/re-added exactly once)
    val affectedPerDim = jdef.dims.indices.flatMap { i =>
      val (nMoved, movedKs, movedDf) = movedDim(i)
      if (nMoved == 0L) None
      else Some(movedKs match {
        case Some(ks) =>
          factScan(factSnapNow, None, Some((jdef.dims(i).fkCol, ks.toSeq)))
            .where(col(jdef.dims(i).fkCol).isin(ks.toSeq: _*))
        case None =>
          factScan(factSnapNow, None, None)
            .join(movedDf.select(col(K).as(jdef.dims(i).fkCol)),
              Seq(jdef.dims(i).fkCol), "left_semi")
      })
    }
    val affFacts =
      if (affectedPerDim.isEmpty) factNewRows.limit(0)
      else affectedPerDim.reduce(_.unionByName(_))
        .dropDuplicates(Seq(K))
        .join(factChurn.select(col(K)), Seq(K), "left_anti")
    val affCk = affFacts.localCheckpoint(true)

    // adds count every touched fact under ALL dims' refreshed states,
    // subs under ALL dims' cursor states — the two one-shot aggregates
    // the previous and this refresh respectively stand for
    val adds = enrich(affCk.unionByName(factNewRows),
      jdef.dims.indices.map(i => dimScan(i, dimSnapNow)))
    val subs = enrich(affCk.unionByName(factPreRows),
      jdef.dims.indices.map(i => dimScan(i, dimSnapPrev)))

    def groupAgg(rows: DataFrame, pfx: String): DataFrame = {
      val aggs: Seq[Column] =
        Seq(count(lit(1)).as(s"${pfx}n")) ++
          jdef.sumCols.flatMap(c => Seq(
            sum(col(c)).as(s"${pfx}s_$c"),
            count(col(c)).as(s"${pfx}nn_$c"))) ++
          jdef.minMaxCols.flatMap(c => Seq(
            min(col(c)).as(s"${pfx}mn_$c"),
            max(col(c)).as(s"${pfx}mx_$c"))) ++
          // sum of squares: a group homomorphism with an inverse like
          // sum — the same old − pre + new arithmetic downstream
          jdef.varCols.map(c =>
            sum(col(c) * col(c)).as(s"${pfx}q_$c"))
      rows.groupBy(jdef.groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
    val touched = groupAgg(adds, "_a_")
      .join(groupAgg(subs, "_p_"), jdef.groupCols, "full_outer")
      .localCheckpoint(true)
    // DISTINCT support: per-(dcol, group tuple, value) refcount deltas
    // from the SAME enriched post/pre frames the sums ride — a dim
    // re-tier moves a pair's group tuple exactly like it moves the
    // sums; checkpointed before the churn frames are freed
    val dvKeys = Seq("dcol") ++ jdef.groupCols ++ Seq("value")
    def pairCounts(rows: DataFrame, pfx: String): DataFrame = {
      val aggs: Seq[Column] =
        Seq(count(lit(1)).as(s"${pfx}r"),
          sum(col("_viol")).as(s"${pfx}viol")) ++
          jdef.sumCols.flatMap(c => Seq(
            sum(col(c)).as(s"${pfx}s_$c"),
            count(col(c)).as(s"${pfx}nn_$c")))
      MatView.distinctUnits(jdef.distinctCols, jdef.distinctTuples)
        .map { case (d, nn, v, viol) =>
          rows.where(nn)
            .select(((jdef.groupCols ++ jdef.sumCols).distinct.map(col) ++
              Seq(v.as("value"), lit(d).as("dcol"),
                viol.as("_viol"))): _*)
        }.reduce(_.unionByName(_))
        .groupBy(dvKeys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
    }
    val dvTouched: Option[DataFrame] =
      if (!hasDv) None
      else Some(pairCounts(adds, "_a_")
        .join(pairCounts(subs, "_p_"), dvKeys, "full_outer")
        .localCheckpoint(true))
    // APPROX sketches from the enriched adds (append-only contract —
    // any subtraction refuses below, so adds IS the whole batch
    // contribution); checkpointed before the churn frames are freed
    val batchSk: Option[DataFrame] =
      if (jdef.approxCols.isEmpty) None
      else Some(jdef.approxCols
        .map(c => Hll.sketch(adds, jdef.groupCols, c, s"_b_h_$c"))
        .reduce(_.join(_, jdef.groupCols, "full_outer"))
        .localCheckpoint(true))
    graft.operators.Blocks.freeReferenced(affCk)
    dimChurn.foreach(d => graft.operators.Blocks.freeReferenced(d.toDF()))
    movedCk.foreach(d => graft.operators.Blocks.freeReferenced(d))
    graft.operators.Blocks.freeReferenced(factChurn.toDF())
    // one pass: the size decision + the reserved-separator contract
    // check (group values must not contain U+0001 — MatView's guard)
    val tStats = touched.agg(count(lit(1)),
      MatView.sepViolations(touched, jdef.groupCols),
      sum(when(col("_p_n").isNotNull, 1L).otherwise(0L))).collect()(0)
    val nTouched = tStats.getLong(0)
    MatView.requireNoSep(
      if (tStats.isNullAt(1)) 0L else tStats.getLong(1), "churned")
    // the HLL register array has no inverse: ANY subtraction — a fact
    // revision/re-upsert/delete, or a dim change moving live facts
    // across groups — cannot maintain the sketch; refuse loudly with
    // the epoch remedy (the append-only contract, MatView's reasoning)
    if (jdef.approxCols.nonEmpty &&
      !(tStats.isNullAt(2) || tStats.getLong(2) == 0L))
      throw new IllegalStateException(
        s"approx-distinct star refresh saw ${tStats.getLong(2)} " +
          "subtracted group(s) (fact churn with pre-images, or dim " +
          "churn moving facts) — HLL sketches merge append-only and " +
          "have no inverse; rebuild via JoinView.rebuildEpoch " +
          "(CLI: jv-rebuild)")
    if (nTouched == 0L) {
      // no group touched ⇒ the post/pre frames were empty ⇒ no
      // distinct pair moved either — the cursor advance alone is safe
      dvTouched.foreach(d => graft.operators.Blocks.freeReferenced(d))
      writeCursor(spark, idxLake, idxTable, fNow, dNows)
      return RefreshReport(fPrev, fNow, dPrevs, dNows, 0L, noop = false)
    }
    // refcount upserts: old + new − pre per touched pair, old refs from
    // a pair-confined support read (broadcast semi under the guard) —
    // [[MatView.deltaBatch]]'s shape verbatim
    val dvRows: Option[DataFrame] = dvTouched.flatMap { dvt =>
      val dvStats = dvt.agg(count(lit(1)),
        MatView.sepViolations(dvt, jdef.groupCols),
        sum(when(MatView.valueSepViolation, 1L).otherwise(0L)),
        sum(coalesce(col("_a_viol"), lit(0L)) +
          coalesce(col("_p_viol"), lit(0L))))
        .collect()(0)
      val nDv = dvStats.getLong(0)
      def dvz(i: Int) = if (dvStats.isNullAt(i)) 0L else dvStats.getLong(i)
      MatView.requireNoSep(dvz(1) + dvz(2) + dvz(3),
        "churned distinct-pair")
      if (nDv == 0L) { graft.operators.Blocks.freeReferenced(dvt); None }
      else {
        val existing = graft.operators.AzofScan
          .scan(spark, idxLake, dvName)
          .select((dvKeys.map(col) ++ Seq(col("ref").as("_o_r")) ++
            jdef.sumCols.flatMap(c => Seq(
              col(s"sum_$c").as(s"_o_s_$c"),
              col(s"nn_$c").as(s"_o_nn_$c")))): _*)
        val confined =
          if (nDv <= broadcastKeyMax)
            existing.join(broadcast(dvt.select(dvKeys.map(col): _*)),
              dvKeys, "left_semi")
          else existing
        val merged = dvt.join(confined, dvKeys, "left")
        def zr(c: Column): Column = coalesce(c, lit(0L))
        Some(merged.select(
          (Seq(
            concat_ws(Sep, (Seq(col("dcol")) ++
              jdef.groupCols.map(c => col(c).cast("string")) ++
              Seq(col("value"))): _*).as(K),
            lit(java.sql.Timestamp.from(MatView.ViewStamp))
              .as(TableSchema.EventTimeName),
            col("dcol")) ++
            jdef.groupCols.map(col) ++
            Seq(col("value"),
              (zr(col("_o_r")) + zr(col("_a_r")) - zr(col("_p_r")))
                .as("ref")) ++
            jdef.sumCols.flatMap(c => Seq(
              (zr(col(s"_o_s_$c")) + zr(col(s"_a_s_$c")) -
                zr(col(s"_p_s_$c"))).as(s"sum_$c"),
              (zr(col(s"_o_nn_$c")) + zr(col(s"_a_nn_$c")) -
                zr(col(s"_p_nn_$c"))).as(s"nn_$c")))): _*))
      }
    }
    // ---- min/max rescan: groups that LOST rows recompute from the
    // live star join at the refreshed version vector
    val rescan =
      if (jdef.minMaxCols.isEmpty) touched.limit(0)
      else touched.where(col("_p_n").isNotNull)
        .select(jdef.groupCols.map(col): _*)
    val nRescan = if (jdef.minMaxCols.isEmpty) 0L else rescan.count()
    val rescanAgg: Option[DataFrame] =
      if (nRescan == 0L) None
      else {
        val liveJoin = enrich(
          factScan(factSnapNow, None, None),
          jdef.dims.indices.map(i => dimScan(i, dimSnapNow)))
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
        jdef.sumCols.flatMap(c => Seq(
          col(s"sum_$c").as(s"_o_s_$c"),
          col(s"nn_$c").as(s"_o_nn_$c"))) ++
        jdef.minMaxCols.flatMap(c => Seq(
          col(s"min_$c").as(s"_o_mn_$c"),
          col(s"max_$c").as(s"_o_mx_$c"))) ++
        jdef.varCols.map(c => col(s"ss_$c").as(s"_o_q_$c")) ++
        jdef.approxCols.map(c => col(Hll.colName(c)).as(s"_o_h_$c"))
    val existing = graft.operators.AzofScan.scan(spark, idxLake, idxTable)
      .select(oldCols: _*)
    val touchedOld =
      if (nTouched <= broadcastKeyMax)
        existing.join(
          broadcast(touched.select(jdef.groupCols.map(col): _*)),
          jdef.groupCols, "left_semi")
      else existing
    val merged0 = touched.join(touchedOld, jdef.groupCols, "left")
    val merged = batchSk.fold(merged0)(sk =>
      merged0.join(sk, jdef.groupCols, "left"))
    val mmStruct = viewSchema(factSnapNow.schema,
      dimSnapNow.map(_.schema), jdef).toStruct
    val withRescan = rescanAgg match {
      case Some(r) => merged.join(r, jdef.groupCols, "left")
      case None =>
        jdef.minMaxCols.foldLeft(merged)((d, c) => d
          .withColumn(s"_r_mn_$c",
            lit(null).cast(mmStruct(s"min_$c").dataType))
          .withColumn(s"_r_mx_$c",
            lit(null).cast(mmStruct(s"max_$c").dataType)))
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
        jdef.sumCols.flatMap(c => Seq(
          (z(col(s"_o_s_$c")) + z(col(s"_a_s_$c")) - z(col(s"_p_s_$c")))
            .as(s"sum_$c"),
          (z(col(s"_o_nn_$c")) + z(col(s"_a_nn_$c")) - z(col(s"_p_nn_$c")))
            .as(s"nn_$c"))) ++
        jdef.minMaxCols.flatMap(c => Seq(
          when(col("_p_n").isNotNull, col(s"_r_mn_$c"))
            .otherwise(least(col(s"_o_mn_$c"), col(s"_a_mn_$c")))
            .as(s"min_$c"),
          when(col("_p_n").isNotNull, col(s"_r_mx_$c"))
            .otherwise(greatest(col(s"_o_mx_$c"), col(s"_a_mx_$c")))
            .as(s"max_$c"))) ++
        jdef.varCols.map(c =>
          (z(col(s"_o_q_$c")) + z(col(s"_a_q_$c")) - z(col(s"_p_q_$c")))
            .as(s"ss_$c")) ++
        jdef.approxCols.map(c =>
          Hll.mergeExpr(s"_o_h_$c", s"_b_h_$c").as(Hll.colName(c)))
    val rows = withRescan.select(finalCols: _*)
    val batchId = encode(fNow, dNows)
    // stage the intended cursor BEFORE the guarded commit: if we crash
    // between the two, the next refresh promotes it instead of
    // recomputing a delta from a stale cursor over an applied commit
    writePending(spark, idxLake, idxTable, batchId, fNow, dNows)
    graft.streaming.AzofSink.commitBatch(idxLake, idxTable, rows,
      batchId, appId)
    // the support table commits under its own guard id, AFTER the view
    // and BEFORE the cursor — each table's delta depends only on ITS
    // OWN old state plus the batch, so a crash between the commits
    // replays exactly-once on both (the catch-up heal above)
    dvRows.foreach(dv => graft.streaming.AzofSink.commitBatch(
      idxLake, dvName, dv, batchId, s"$appId#dv"))
    writeCursor(spark, idxLake, idxTable, fNow, dNows)
    graft.operators.Blocks.freeReferenced(touched.toDF())
    dvTouched.foreach(d => graft.operators.Blocks.freeReferenced(d))
    RefreshReport(fPrev, fNow, dPrevs, dNows, nTouched, noop = false)
  }

  /** The served view — every live group's totals ([[MatView.serve]]'s
    * shape): `n_rows`, per sum column the null-skipping `sum_<c>`
    * (NULL when its `nn_<c>` is 0) + `nn_<c>`, typed min/max. Refuses
    * loudly on a pre-nn_ view table, naming the rebuild remedy.
    */
  def serve(
      spark: SparkSession,
      idxLake: String, idxTable: String, jdef: JoinViewDef,
      version: Option[Long] = None,
      withSketches: Boolean = false): DataFrame = {
    val cols: Seq[Column] =
      jdef.groupCols.map(col) ++ Seq(col("n_rows")) ++
        jdef.sumCols.flatMap(c => Seq(
          when(col(s"nn_$c") > 0L, col(s"sum_$c")).as(s"sum_$c"),
          col(s"nn_$c"))) ++
        jdef.minMaxCols.flatMap(c => Seq(col(s"min_$c"), col(s"max_$c"))) ++
        // raw sum-of-squares totals (MatView.serve's reasoning)
        jdef.varCols.map(c => col(s"ss_$c")) ++
        // the opt-in approx rewrite reads the HLL sketch columns
        // alongside the exact totals (MatView.serve's reasoning)
        (if (withSketches) jdef.approxCols.map(c => col(Hll.colName(c)))
         else Nil)
    val t = AzofTable(spark, idxLake, idxTable)
    val snap = version.map(v => t.snapshot(v.toString))
      .getOrElse(t.currentSnapshot)
    MatView.requireNnLayout(snap.schema, jdef.sumCols, idxTable,
      "JoinView.rebuildEpoch (CLI: jv-rebuild)")
    MatView.requireSsLayout(snap.schema, jdef.varCols, idxTable,
      "JoinView.rebuildEpoch (CLI: jv-rebuild)")
    if (withSketches)
      MatView.requireHllLayout(snap.schema, jdef.approxCols, idxTable,
        "JoinView.rebuildEpoch (CLI: jv-rebuild)")
    graft.operators.AzofScan.scanSnapshot(spark, t, snap, AsOf.Current)
      .where(col("n_rows") > 0L)
      .select(cols: _*)
  }

  /** The live distinct PAIRS for one declared distinct column
    * ([[MatView.serveDistinctPairs]]'s star twin): every
    * `(group tuple, value)` with a positive refcount — exact at the
    * view's grain, at any subset rollup, and globally, an index-sized
    * read that never touches fact or dims.
    */
  def serveDistinctPairs(
      spark: SparkSession,
      idxLake: String, idxTable: String, jdef: JoinViewDef, dcol: String,
      version: Option[Long] = None): DataFrame = {
    require(jdef.distinctCols.contains(dcol) ||
      jdef.tupleNames.contains(dcol),
      s"'$dcol' is not a declared distinct column or tuple")
    val t = AzofTable(spark, idxLake, MatView.dvTableName(idxTable))
    val snap = version.map(v => t.snapshot(v.toString))
      .getOrElse(t.currentSnapshot)
    graft.operators.AzofScan.scanSnapshot(spark, t, snap, AsOf.Current,
      keyFilter = Some(KeyFilter.Range(
        Some(dcol + Sep), Some(dcol + Sep + "\uffff"))))
      .where(col("dcol") === dcol && col("ref") > 0L)
      // partial-null tuple pairs exist for the multi-column histogram;
      // COUNT(DISTINCT a, b) skips any-null rows — exclude the marked
      // pairs (no-op on pre-token pairs; MatView.serveDistinctPairs'
      // reasoning verbatim)
      .where(if (dcol.contains(","))
        !col("value").contains(MatView.TupleNullTok) else lit(true))
      .select((jdef.groupCols.map(col) :+ col("value")): _*)
  }

  /** `COUNT(DISTINCT dcol)` per `queryGroups` (a subset of the view's
    * group columns; empty = global), exact, from the support table
    * alone.
    */
  def countDistinct(
      spark: SparkSession,
      idxLake: String, idxTable: String, jdef: JoinViewDef, dcol: String,
      queryGroups: Seq[String],
      version: Option[Long] = None): DataFrame = {
    require(queryGroups.forall(jdef.groupCols.contains),
      "query groups must be view group columns")
    val pairs = serveDistinctPairs(spark, idxLake, idxTable, jdef, dcol,
      version)
    if (queryGroups.isEmpty)
      pairs.agg(count_distinct(col("value")).as(s"dv_$dcol"))
    else pairs.groupBy(queryGroups.map(col): _*)
      .agg(count_distinct(col("value")).as(s"dv_$dcol"))
  }

  /** `APPROX_COUNT_DISTINCT(acol)` per `queryGroups` from the star
    * view's HLL sketch column ([[MatView.approxDistinct]]'s join twin
    * — the shared serve body merges sketches at the query grain and
    * estimates).
    */
  def approxDistinct(
      spark: SparkSession,
      idxLake: String, idxTable: String, jdef: JoinViewDef, acol: String,
      queryGroups: Seq[String],
      version: Option[Long] = None): DataFrame = {
    require(jdef.approxCols.contains(acol),
      s"'$acol' is not a declared approx-distinct column")
    MatView.approxServe(spark, idxLake, idxTable, jdef.groupCols, acol,
      queryGroups, version)
  }

  /** Exact VALUE HISTOGRAM for one declared distinct FACT column at any
    * group slice over the star ([[MatView.valueHistogram]]'s join
    * twin): `Σ ref` per value from the support pairs plus the derived
    * NULL bucket (`Σ n_rows − Σ ref`) — equals the one-shot
    * `fact ⋈ dims GROUP BY <groups>, c COUNT(*)` including NULLs,
    * served index-only.
    */
  def valueHistogram(
      spark: SparkSession,
      idxLake: String, idxTable: String, jdef: JoinViewDef, dcol: String,
      queryGroups: Seq[String],
      version: Option[Long] = None,
      dvVersion: Option[Long] = None,
      measures: Seq[String] = Nil,
      slice: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
        Nil): DataFrame = {
    require(jdef.distinctCols.contains(dcol) ||
      jdef.tupleNames.contains(dcol),
      s"'$dcol' is not a declared distinct column or tuple")
    require(queryGroups.forall(jdef.groupCols.contains),
      "query groups must be view group columns")
    require(measures.forall(jdef.sumCols.contains),
      "histogram measures must be declared sum columns")
    // tuple histogram over pre-token pairs with a nullable component:
    // the direct-path loud gate (MatView.valueHistogram's reasoning)
    if (dcol.contains(",")) {
      val fmt = MatView.defFormat(spark, idxLake, idxTable)
      if (fmt < MatView.TupleNullFormat)
        readDef(spark, idxLake, idxTable).foreach { case (fl, ft, _, _) =>
          MatView.requireTupleLayout(fmt,
            AzofTable(spark, fl, ft).currentSnapshot.schema,
            Seq(dcol.split(",").toSeq), idxTable,
            "JoinView.rebuildEpoch (CLI: jv-rebuild)")
        }
    }
    val t = AzofTable(spark, idxLake, MatView.dvTableName(idxTable))
    val dvSnap = dvVersion.map(v => t.snapshot(v.toString))
      .getOrElse(t.currentSnapshot)
    if (measures.nonEmpty)
      MatView.requireDvLayout(dvSnap.schema, measures,
        MatView.dvTableName(idxTable),
        "JoinView.rebuildEpoch (CLI: jv-rebuild)")
    val pairs = graft.operators.AzofScan.scanSnapshot(spark, t,
      dvSnap, AsOf.Current,
      keyFilter = Some(KeyFilter.Range(
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
    // non-null value buckets ([[MatView.valueHistogram]]'s shape): Σ
    // ref (+ Σ pair-grain measure totals) per live value at the query
    // grain, null-skipping measure semantics via the nn twin
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
    val totals = grouped(
      applySlice(serve(spark, idxLake, idxTable, jdef, version)).select(
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

  /** Epoch hatch after a ROLLBACK on any source: retrain the view
    * one-shot from all tables' CURRENT live states into `newTable`.
    */
  def rebuildEpoch(
      spark: SparkSession,
      factLake: String, factTable: String,
      dims: Seq[(String, String)],
      idxLake: String, newTable: String,
      jdef: JoinViewDef, at: Instant): Long = {
    require(dims.size == jdef.flatDimCount,
      s"${jdef.flatDimCount} dim tables declared (incl. snowflake " +
        s"subs, pre-order), ${dims.size} locations given")
    val fact = AzofTable(spark, factLake, factTable)
    val dimTabs = dims.map { case (dl, dt) => AzofTable(spark, dl, dt) }
    val fNow = fact.currentVersion.toLong
    val dNows = dimTabs.map(_.currentVersion.toLong)
    create(spark, factLake, factTable, dims, idxLake, newTable, jdef, at)
    MatView.requireDerivedOk(spark,
      fact.currentSnapshot.schema, jdef.derivedGroups)
    val facts = graft.operators.AzofScan.scan(spark, factLake, factTable)
      .select(jdef.factNeeded.map(col): _*)
    val rawCols = (jdef.groupCols.filterNot(jdef.derivedNames.contains) ++
      jdef.sumCols ++ jdef.minMaxCols ++ jdef.distinctCols ++
      jdef.distinctTuples.flatten ++ jdef.approxCols ++
      jdef.derivedGroups.flatMap(_.srcRefs) ++
      jdef.factFilterRefs).distinct
    val joined = MatView.applyFilter(
      withDerived(jdef.dims.indices.foldLeft(facts) { (acc, i) =>
        val dj = jdef.dims(i)
        val off = jdef.flatOffset(i)
        val (dl, dt) = dims(off)
        val base = graft.operators.AzofScan.scan(spark, dl, dt)
          .select((Seq(col(TableSchema.KeyName).as(s"_dk_$i")) ++
            (dj.dimCols ++ dj.subs.map(_.fkCol)).distinct.map(col)): _*)
        // snowflake subs join INNER on the dim's sub fk, then project
        // away the dim-side fk names (possibly shared across dims)
        val d =
          if (dj.subs.isEmpty) base
          else dj.subs.zipWithIndex.foldLeft(base) { case (a2, (s, j)) =>
            val (sl, st) = dims(off + 1 + j)
            val sub = graft.operators.AzofScan.scan(spark, sl, st)
              .select((Seq(col(TableSchema.KeyName).as(s"_sk_${i}_$j")) ++
                s.dimCols.map(col)): _*)
            a2.join(sub, a2(s.fkCol) === sub(s"_sk_${i}_$j"))
          }.select((Seq(col(s"_dk_$i")) ++ dj.allCols.map(col)): _*)
        acc.join(d, acc(dj.fkCol) === d(s"_dk_$i"))
      }.select(rawCols.map(col): _*), jdef), jdef.filter)
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n_rows")) ++
        jdef.sumCols.flatMap(c => Seq(
          coalesce(sum(col(c)), lit(0L)).as(s"sum_$c"),
          count(col(c)).as(s"nn_$c"))) ++
        jdef.minMaxCols.flatMap(c => Seq(
          min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) ++
        jdef.varCols.map(c =>
          coalesce(sum(col(c) * col(c)), lit(0L)).as(s"ss_$c"))
    val agg0 = joined.groupBy(jdef.groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val agg = jdef.approxCols.foldLeft(agg0)((d, c) =>
      d.join(Hll.sketch(joined, jdef.groupCols, c, s"_b_h_$c"),
        jdef.groupCols, "left"))
    val rows = agg.select(
      (Seq(
        concat_ws(Sep, jdef.groupCols.map(g => col(g).cast("string")): _*)
          .as(TableSchema.KeyName),
        lit(java.sql.Timestamp.from(at)).as(TableSchema.EventTimeName)) ++
        jdef.groupCols.map(col) ++
        Seq(col("n_rows")) ++
        jdef.sumCols.flatMap(c => Seq(col(s"sum_$c"), col(s"nn_$c"))) ++
        jdef.minMaxCols.flatMap(c =>
          Seq(col(s"min_$c"), col(s"max_$c"))) ++
        jdef.varCols.map(c => col(s"ss_$c")) ++
        jdef.approxCols.map(c =>
          coalesce(col(s"_b_h_$c"), lit(Hll.Empty))
            .as(Hll.colName(c)))): _*)
    // one pass: count + the reserved-separator contract check
    val stats = rows.agg(count(lit(1)),
      MatView.sepViolations(rows, jdef.groupCols)).collect()(0)
    val n = stats.getLong(0)
    MatView.requireNoSep(
      if (stats.isNullAt(1)) 0L else stats.getLong(1), "retrained")
    if (n > 0) AzofWriter.commitDelta(spark, idxLake, newTable, rows, at, at)
    // DISTINCT support retrain: one-shot refcounts per (dcol, groups,
    // value) pair off the SAME enriched star join — committed BEFORE
    // the cursor, like the refresh
    if (jdef.hasDistinct) {
      val dvKeys = Seq("dcol") ++ jdef.groupCols ++ Seq("value")
      val dvAggs: Seq[Column] =
        Seq(count(lit(1)).as("ref"),
          sum(col("_viol")).as("_viol")) ++
          jdef.sumCols.flatMap(c => Seq(
            coalesce(sum(col(c)), lit(0L)).as(s"sum_$c"),
            count(col(c)).as(s"nn_$c")))
      val pairs = MatView.distinctUnits(jdef.distinctCols,
          jdef.distinctTuples)
        .map { case (d, nn, v, viol) =>
          joined.where(nn)
            .select(((jdef.groupCols ++ jdef.sumCols).distinct.map(col) ++
              Seq(v.as("value"), lit(d).as("dcol"),
                viol.as("_viol"))): _*)
        }.reduce(_.unionByName(_))
        .groupBy(dvKeys.map(col): _*)
        .agg(dvAggs.head, dvAggs.tail: _*)
        .localCheckpoint(true)
      val dvRows = pairs.select(
        (Seq(
          concat_ws(Sep, (Seq(col("dcol")) ++
            jdef.groupCols.map(c => col(c).cast("string")) ++
            Seq(col("value"))): _*).as(TableSchema.KeyName),
          lit(java.sql.Timestamp.from(at)).as(TableSchema.EventTimeName),
          col("dcol")) ++
          jdef.groupCols.map(col) ++
          Seq(col("value"), col("ref")) ++
          jdef.sumCols.flatMap(c =>
            Seq(col(s"sum_$c"), col(s"nn_$c")))): _*)
      // one pass: size + the reserved separator/NULL-token contract
      // (the refresh path's check, mirrored)
      val pStats = pairs.agg(count(lit(1)),
        MatView.sepViolations(pairs, jdef.groupCols),
        sum(when(MatView.valueSepViolation, 1L).otherwise(0L)),
        sum(col("_viol"))).collect()(0)
      def pz(i: Int) = if (pStats.isNullAt(i)) 0L else pStats.getLong(i)
      MatView.requireNoSep(pz(1) + pz(2) + pz(3),
        "retrained distinct-pair")
      if (pStats.getLong(0) > 0)
        AzofWriter.commitDelta(spark, idxLake,
          MatView.dvTableName(newTable), dvRows, at, at)
      graft.operators.Blocks.freeReferenced(pairs)
    }
    writeCursor(spark, idxLake, newTable, fNow, dNows)
    n
  }
}
