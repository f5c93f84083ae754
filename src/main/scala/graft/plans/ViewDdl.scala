package graft.plans

import graft.format.{AzofTable, ColumnType}
import graft.sources.{AzofRelation, AzofV2Table, DerivedGroup, DimJoin, JoinView, JoinViewDef, MatView, ViewDef}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, LongType, StringType}

/** SQL DDL for the materialized-view lifecycle — the reference exposes
  * its whole capability through one SQL front door
  * (`crates/azof-datafusion/src/context.rs:26-47`); the engine's
  * marquee feature gets the same. Intercepted by [[AzofSqlParser]]
  * before the delegate parser (Spark has no MATERIALIZED VIEW syntax):
  *
  * {{{
  * CREATE MATERIALIZED VIEW [IF NOT EXISTS] mv AS
  *   SELECT src, count(*) AS n, sum(v) AS s FROM azof.t GROUP BY src
  * REFRESH MATERIALIZED VIEW mv
  * DROP MATERIALIZED VIEW [IF EXISTS] mv
  * }}}
  *
  * CREATE infers the [[ViewDef]] (or, over a covered `fact ⋈ dims`
  * star, the [[JoinViewDef]]) from the ANALYZED query tree with the
  * same leaf analysis [[MvRewriteRule]] runs in reverse: plain
  * grouping attributes become group columns, aliased deterministic
  * grouping expressions become DERIVED groups (stored buckets),
  * `COUNT(*)`/`COUNT(c)`/`SUM`/`AVG` declare sum columns, `MIN`/`MAX`
  * declare min/max columns, `COUNT(DISTINCT …)` declares distinct
  * columns/tuples, and star group columns split fact/dim by attribute
  * PROVENANCE (exprId, never name) — so the view the DDL mints covers
  * exactly the query it was defined with, and the rewrite rule serves
  * that query from it with zero query change. The create also runs
  * the initial refresh (the view is populated and rewrite-eligible on
  * return), using the same stable per-view checkpoint as
  * `CALL system.mv_refresh`.
  *
  * Everything lives in the session lake (`spark.azof.path`) — the
  * same root `azof.<table>` reads resolve against; cross-lake view
  * placement stays with the procedure/CLI faces. Unsupported query
  * shapes refuse LOUDLY at create time, each message naming the
  * explicit-definition remedy (`CALL system.create_view` /
  * `system.create_join_view`, CLI `mv-create`): the DDL is inference
  * over a query, not a second definition language.
  *
  * DROP deletes the view table, its `__dv` support table, and drops
  * the rewrite rule's cached definition + discovery listing — and
  * REFUSES to delete a table that carries no view-definition sidecar
  * (it is not a materialized view; use the filesystem deliberately).
  */
object ViewDdl {

  private val CreateRe =
    """(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+(IF\s+NOT\s+EXISTS\s+)?(\S+)\s+AS\s+(.*\S)\s*""".r
  private val DropRe =
    """(?is)\s*DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?(\S+)\s*""".r
  private val RefreshRe =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(\S+)\s*""".r
  private val ShowRe =
    """(?is)\s*SHOW\s+MATERIALIZED\s+VIEWS\s*""".r
  private val DescribeRe =
    """(?is)\s*DESC(?:RIBE)?\s+MATERIALIZED\s+VIEW\s+(\S+)\s*""".r
  private val ExplainRe =
    """(?is)\s*EXPLAIN(?:\s+(?:EXTENDED|FORMATTED|CODEGEN|COST))?\s+(.*\S)\s*""".r

  /** Drop LEADING SQL comments (`-- …` lines and `/* … */` blocks)
    * only — a commented MATERIALIZED VIEW statement must still
    * dispatch here, not die in the delegate parser with an unhelpful
    * syntax error. Comments past the first token stay (they belong to
    * the defining query, which Spark's parser handles).
    */
  private def stripLeadingComments(sql: String): String = {
    var s = sql
    var go = true
    while (go) {
      val t = s.dropWhile(_.isWhitespace)
      if (t.startsWith("--")) {
        val nl = t.indexOf('\n')
        s = if (nl < 0) "" else t.substring(nl + 1)
      } else if (t.startsWith("/*")) {
        val end = t.indexOf("*/", 2)
        s = if (end < 0) "" else t.substring(end + 2)
      } else { s = t; go = false }
    }
    s
  }

  /** Intercept a MATERIALIZED VIEW statement, or None for everything
    * else (the delegate parser's business). Pure text-level dispatch —
    * analysis and inference happen at EXECUTION time inside the
    * command (`spark.sql(...)` parses eagerly but runs lazily, and a
    * create must see the lake as of its run, not its parse). Leading
    * comments strip first, and `EXPLAIN <mv statement>` routes to a
    * DESCRIPTION of the statement (for CREATE, the def the DDL would
    * infer — nothing is created).
    */
  def parse(sqlText: String): Option[LogicalPlan] = {
    val t = stripLeadingComments(sqlText).replaceAll(";\\s*$", "")
    parseCore(t).orElse(t match {
      case ExplainRe(inner) =>
        parseCore(stripLeadingComments(inner))
          .map(ExplainMatViewDdlCommand(_))
      case _ => None
    })
  }

  private def parseCore(t: String): Option[LogicalPlan] =
    t match {
      case CreateRe(ifne, ident, query) =>
        Some(CreateMatViewCommand(viewName(ident), ifne != null, query))
      case DropRe(ife, ident) =>
        Some(DropMatViewCommand(viewName(ident), ife != null))
      case RefreshRe(ident) =>
        Some(RefreshMatViewCommand(viewName(ident)))
      case ShowRe() => Some(ShowMatViewsCommand())
      case DescribeRe(ident) =>
        Some(DescribeMatViewCommand(viewName(ident)))
      case _ => None
    }

  /** The view identifier: `mv`, `azof.mv`, or either backquoted — all
    * resolving into the session lake. Backquotes strip BEFORE the dot
    * split for a fully-quoted token: a single backquoted identifier
    * containing a dot (`` `azof.mv` ``) is one literal name, never a
    * two-part reference — splitting first would silently reinterpret
    * it (or refuse other dotted quoted names with a misleading
    * message).
    */
  private def viewName(ident: String): String = {
    def unquote(s: String): Option[String] =
      if (s.length >= 2 && s.startsWith("`") && s.endsWith("`") &&
        !s.substring(1, s.length - 1).contains("`"))
        Some(s.substring(1, s.length - 1))
      else None
    unquote(ident).getOrElse {
      ident.split("\\.").map(p => unquote(p).getOrElse(p)) match {
        case Array(n) => n
        case Array(q, n) if q.equalsIgnoreCase("azof") => n
        case _ => throw new IllegalArgumentException(
          s"cannot resolve materialized-view identifier '$ident' — use " +
            "azof.<name> or a bare name (views live in spark.azof.path; " +
            "cross-lake placement is the CALL system.create_view / CLI " +
            "mv-create face)")
      }
    }
  }

  private[plans] def lakeOf(spark: SparkSession): String =
    spark.conf.getOption("spark.azof.path").getOrElse(
      throw new IllegalArgumentException(
        "MATERIALIZED VIEW DDL needs spark.azof.path set to the " +
          "lakehouse root (the same root azof.<table> reads resolve " +
          "against)"))

  /** Which view kind a table directory carries, by its definition
    * sidecar — None when it is not a materialized view.
    */
  private[plans] def kindOf(
      spark: SparkSession, lake: String, name: String): Option[String] = {
    val dir = new Path(new Path(lake), name)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(new Path(dir, MatView.DefFileName))) Some("single")
    else if (fs.exists(new Path(dir, JoinView.DefFileName))) Some("star")
    else None
  }

  // ------------------------------------------------------------------
  // Definition inference from the analyzed query tree
  // ------------------------------------------------------------------

  private[plans] sealed trait Inferred
  private[plans] final case class SingleInf(
      srcLake: String, srcTable: String, vd: ViewDef) extends Inferred
  private[plans] final case class StarInf(
      factLake: String, factTable: String,
      dims: Seq[(String, String)], jdef: JoinViewDef) extends Inferred

  private def refuse(msg: String): Nothing =
    throw new IllegalArgumentException(
      s"CREATE MATERIALIZED VIEW cannot infer a view definition: $msg" +
        " — shapes the DDL cannot infer can be created with an " +
        "explicit definition via CALL system.create_view / " +
        "system.create_join_view (or CLI mv-create)")

  /** An azof leaf relation: `(lake, table, output, isPinned)`. */
  private def leaf(plan: LogicalPlan)
      : Option[(String, String, Seq[Attribute], Boolean)] = plan match {
    case l: LogicalRelation => l.relation match {
      case r: AzofRelation =>
        r.mvMatchKey.map { case (lk, t) => (lk, t, l.output, false) }
          .orElse(Some(("", "", l.output, true)))
      case _ => None
    }
    case r: DataSourceV2Relation => r.table match {
      case t: AzofV2Table =>
        t.mvMatchKey.map { case (lk, tb) => (lk, tb, r.output, false) }
          .orElse(Some(("", "", r.output, true)))
      case _ => None
    }
    case _ => None
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConj(l) ++ splitConj(r)
    case other => Seq(other)
  }

  /** Strip pure-attribute Projects and COLLECT Filter conjuncts — a
    * WHERE in the defining query becomes the view's membership
    * predicate (a FILTERED materialized view: the refresh decides
    * membership per row on post and pre states alike, so the
    * incremental subtraction stays exact across the boundary).
    * Validation of the collected conjuncts happens in [[infer]].
    */
  private def strip(plan: LogicalPlan): (LogicalPlan, Seq[Expression]) =
    plan match {
      case p: Project if p.projectList.forall(_.isInstanceOf[Attribute]) =>
        strip(p.child)
      case f: Filter =>
        val (c, cs) = strip(f.child)
        (c, splitConj(f.condition) ++ cs)
      case other => (other, Nil)
    }

  /** One inferred star side: location, fk name (a FACT column for a
    * top dim, a PARENT-DIM column for a one-hop snowflake sub), the
    * relation's output, and the index of its parent side in the flat
    * list (-1 = joins the fact directly).
    */
  private final case class InfSide(
      lake: String, table: String, fkName: String, out: Seq[Attribute],
      parent: Int)

  /** The star source under an Aggregate: fact leaf + a flat list of
    * joined sides where every join is INNER on the joined relation's
    * record key — [[MvRewriteRule.starSrcOf]]'s contract, here over
    * raw (lake, table) pairs because the create needs locations, not
    * normalized match keys — plus every collected WHERE conjunct (any
    * level: above the join, on the fact side, on a dim side — inner
    * joins commute with filters). A join keyed on a TOP DIM's column
    * infers a SNOWFLAKE sub of that dim (`fact ⋈ dim ⋈ subdim`); sub
    * outputs are not searched, keeping chains one hop.
    */
  private def starOf(plan: LogicalPlan): Option[(
      (String, String, Seq[Attribute], Boolean),
      Seq[InfSide],
      Seq[Expression])] = {
    import org.apache.spark.sql.catalyst.expressions.EqualTo
    val (core, conds) = strip(plan)
    core match {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        if (j.joinType != org.apache.spark.sql.catalyst.plans.Inner)
          refuse(s"only INNER joins on a dim's record key are " +
            s"maintainable (got ${j.joinType})")
        def asDim(side: LogicalPlan)
            : Option[(String, String, Seq[Attribute], Boolean,
              Seq[Expression])] = {
          val (c, cs) = strip(side)
          leaf(c).map { case (dl, dt, out, pinned) =>
            (dl, dt, out, pinned, cs) }
        }
        def combine(subSide: LogicalPlan, dimSide: LogicalPlan) =
          for {
            (fact, dims, subConds) <- starOf(subSide)
            (dl, dt, dOut, dPinned, dConds) <- asDim(dimSide)
            fOut = fact._3
            newDims <- j.condition match {
              case Some(EqualTo(a: AttributeReference,
                  b: AttributeReference)) =>
                val fSet = fOut.map(_.exprId).toSet
                val dSet = dOut.map(_.exprId).toSet
                val K = graft.format.TableSchema.KeyName
                val attrOpt =
                  if (dSet.contains(b.exprId) && b.name == K) Some(a)
                  else if (dSet.contains(a.exprId) && a.name == K) Some(b)
                  else None
                attrOpt.flatMap { attr =>
                  if (fSet.contains(attr.exprId))
                    Some(dims :+ InfSide(dl, dt, attr.name, dOut, -1))
                  else dims.indexWhere(d => d.parent == -1 &&
                    d.out.exists(_.exprId == attr.exprId)) match {
                    case -1 => None
                    case p =>
                      Some(dims :+ InfSide(dl, dt, attr.name, dOut, p))
                  }
                }
              case _ => None
            }
          } yield {
            if (dPinned) refuse(
              s"dim table '$dt' is read AS OF a pin — a view " +
                "maintains the LIVE corpus; drop the time travel")
            (fact, newDims, subConds ++ dConds)
          }
        combine(j.left, j.right).orElse(combine(j.right, j.left))
          .orElse(refuse(
            "every join must be INNER with a single equality " +
              s"<fact fk or TOP-DIM sub fk> = " +
              s"<dim>.${graft.format.TableSchema.KeyName} " +
              "(the joined table's record key; snowflake chains are " +
              "one hop)"))
          .map { case (f, ds, cs) => (f, ds, conds ++ cs) }
      case rel => leaf(rel).map(f => (f, Nil, conds))
    }
  }

  /** The azof ColumnType a derived-group expression may declare: the
    * mapping must be EXACT (the stored column's Spark type equals the
    * expression's), or the rewrite's canonical match — which compares
    * the query's raw expression against the stored-cast form — could
    * never fire.
    */
  private def azTypeOf(dt: DataType): Option[ColumnType] = dt match {
    case StringType => Some(ColumnType.AzString)
    case LongType => Some(ColumnType.AzInt)
    case BooleanType => Some(ColumnType.AzBoolean)
    case org.apache.spark.sql.types.TimestampType =>
      Some(ColumnType.AzDateTime)
    case _ => None
  }

  /** Infer the view definition from the analyzed defining query. */
  private[plans] def infer(
      spark: SparkSession, analyzed: LogicalPlan): Inferred = {
    val plan = EliminateSubqueryAliases(analyzed)
    val agg = plan match {
      case a: Aggregate => a
      case p: Project => p.child match {
        case a: Aggregate
          if p.projectList.forall(_.isInstanceOf[Attribute]) => a
        case _ => refuse("the defining query must be a single " +
          "SELECT ... FROM <azof table(s)> GROUP BY ... aggregate " +
          "(no ORDER BY, LIMIT, set ops, subqueries, or CTEs)")
      }
      case _ => refuse("the defining query must be a single " +
        "SELECT ... FROM <azof table(s)> GROUP BY ... aggregate " +
        "(no ORDER BY, LIMIT, set ops, subqueries, or CTEs)")
    }
    val (fact, dimSides, filterConds) = starOf(agg.child).getOrElse(
      refuse(
        "FROM must read azof tables only (azof.<table>, joined INNER " +
          "on dim record keys for the star form)"))
    val (factLake, factTable, factOut, factPinned) = fact
    if (factPinned) refuse(
      s"the source table is read AS OF a pin — a view maintains the " +
        "LIVE corpus; drop the time travel")
    val factIds = factOut.map(_.exprId).toSet
    val dimIdSets = dimSides.map(_.out.map(_.exprId).toSet)
    // a name visible on more than one side makes the stored definition
    // ambiguous (defs speak names; queries speak exprIds) — refuse
    val allOuts = factOut ++ dimSides.flatMap(_.out)
    def sideOf(a: Attribute): Int = // -1 fact, else dim index
      dimIdSets.indexWhere(_.contains(a.exprId)) match {
        case -1 if factIds.contains(a.exprId) => -1
        case -1 => refuse(s"column '${a.name}' resolves to no FROM table")
        case i => i
      }
    def unambiguous(a: Attribute): Attribute = {
      if (allOuts.count(o => o.name == a.name) > 1) refuse(
        s"column name '${a.name}' appears on more than one joined " +
          "table — the stored definition records names, so each " +
          "referenced column must be unique across the join")
      a
    }

    // --- grouping: plain attributes + aliased derived expressions ---
    val outAliases: Seq[Alias] = agg.aggregateExpressions.collect {
      case al: Alias => al
    }
    var physByDim = Map.empty[Int, Seq[String]] // dim idx -> dim cols
    var factGroups = Seq.empty[String]
    var derived = Seq.empty[DerivedGroup]
    var groupCols = Seq.empty[String]
    agg.groupingExpressions.foreach {
      case a: AttributeReference =>
        unambiguous(a)
        sideOf(a) match {
          case -1 => factGroups :+= a.name
          case i => physByDim =
            physByDim.updated(i, physByDim.getOrElse(i, Nil) :+ a.name)
        }
        groupCols :+= a.name
      case e =>
        val name = outAliases.collectFirst {
          case al if al.child.semanticEquals(e) => al.name
        }.getOrElse(refuse(
          s"grouping expression ${e.sql} is not a plain column — " +
            "alias it in the SELECT list so the stored bucket column " +
            "has a name (SELECT <expr> AS <name> ... GROUP BY <expr>)"))
        val ct = azTypeOf(e.dataType).getOrElse(refuse(
          s"grouping expression ${e.sql} has type ${e.dataType.sql}, " +
            "which is not an azof column type — cast it to BIGINT, " +
            "STRING, BOOLEAN, or TIMESTAMP in the definition"))
        if (!e.deterministic) refuse(
          s"grouping expression ${e.sql} is nondeterministic — an " +
            "unrepeatable bucket cannot be incrementally maintained")
        e.references.foreach { a =>
          unambiguous(a)
          if (!factIds.contains(a.exprId)) refuse(
            s"grouping expression ${e.sql} reads dim column " +
              s"'${a.name}' — derived buckets are FACT-side " +
              "expressions (a dim attribute is already a group column)")
        }
        // the stored expression text re-analyzes against the bare
        // source frame at refresh time — drop SQL alias qualifiers
        // (`f.t` → `t`), which don't exist there
        val bare = e.transform {
          case a: AttributeReference => a.withQualifier(Nil)
        }
        derived :+= DerivedGroup(name, bare.sql, ct)
        groupCols :+= name
    }
    if (groupCols.isEmpty) refuse(
      "the defining query has no GROUP BY — a global aggregate rolls " +
        "up at QUERY time from any grouped view over the same table")
    if (groupCols.distinct.size != groupCols.size) refuse(
      "duplicate group columns in GROUP BY")

    // --- WHERE → the view's membership predicate (a FILTERED view) ---
    val filterSql: Option[String] =
      if (filterConds.isEmpty) None
      else {
        filterConds.foreach { c =>
          if (!c.deterministic) refuse(
            s"WHERE conjunct ${c.sql} is nondeterministic — " +
              "membership must be a repeatable function of the row")
          if (c.exists(_.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]))
            refuse(s"WHERE conjunct ${c.sql} contains a subquery — " +
              "not incrementally maintainable")
          c.references.foreach { a =>
            unambiguous(a)
            if (sideOf(a) >= 0 && !groupCols.contains(a.name)) refuse(
              s"WHERE conjunct ${c.sql} reads dim column '${a.name}' " +
                "which is not a group column — a star filter may read " +
                "fact columns and GROUPED dim attributes only (other " +
                "dim attributes never reach the refresh frames)")
          }
        }
        // stored text re-analyzes against the bare refresh frames —
        // drop SQL alias qualifiers, like derived-group expressions
        Some(filterConds.map(_.transform {
          case a: AttributeReference => a.withQualifier(Nil)
        }.sql).mkString(" AND "))
      }

    // --- outputs: group columns + aggregate trees over the leaves ---
    val derivedCanon: Set[Expression] = agg.groupingExpressions.collect {
      case e if !e.isInstanceOf[AttributeReference] => e.canonicalized
    }.toSet
    var sumCols = Seq.empty[String]
    var minMaxCols = Seq.empty[String]
    var distinctCols = Seq.empty[String]
    var tuples = Seq.empty[Seq[String]]
    var varCols = Seq.empty[String]
    def factAttr(e: Expression, what: String): AttributeReference =
      e match {
        case a: AttributeReference =>
          unambiguous(a)
          if (!factIds.contains(a.exprId)) refuse(
            s"$what aggregates dim column '${a.name}' — aggregated " +
              "columns live on the FACT side (dim attributes group)")
          a
        case other => refuse(
          s"$what over expression ${other.sql} — aggregate plain " +
            "fact columns (compute derived measures at query time: " +
            "the rewrite decomposes expression trees over the " +
            "stored totals)")
      }
    def classify(ae: AggregateExpression): Unit = {
      val what = ae.sql
      // VAR/STDDEV decompose over (count, sum, sum-of-squares): the
      // column declares as BOTH a sum column and a variance column
      // (the analyzer wraps the child in a cast to double — central
      // moments are double-typed — so unwrap one cast first)
      def varDecl(child: Expression, what: String): Unit = {
        val raw = child match {
          case c: Cast if c.dataType == DoubleType => c.child
          case e => e
        }
        val attr = factAttr(raw, what)
        if (attr.dataType != LongType) refuse(
          s"$what takes the variance of a ${attr.dataType.sql} " +
            "column — variance columns must be BIGINT (azof Int), " +
            "whose integer moments make the decomposition exact")
        if (!sumCols.contains(attr.name)) sumCols :+= attr.name
        if (!varCols.contains(attr.name)) varCols :+= attr.name
      }
      if (ae.filter.nonEmpty) refuse(
        s"$what carries a FILTER clause — not maintainable")
      if (ae.isDistinct) ae.aggregateFunction match {
        case Count(Seq(a: AttributeReference))
          if groupCols.contains(a.name) => () // view rows are distinct
        case Count(Seq(a: AttributeReference)) =>
          factAttr(a, what)
          if (a.name.contains(",")) refuse(
            s"distinct column '${a.name}' contains ','")
          if (!distinctCols.contains(a.name)) distinctCols :+= a.name
        case Count(as) if as.size >= 2 &&
            as.forall(_.isInstanceOf[AttributeReference]) =>
          val names = as.map(e => factAttr(e, what).name)
          if (names.distinct.size != names.size)
            refuse(s"$what repeats a column")
          if (names.exists(groupCols.contains)) refuse(
            s"$what includes a group column — the view's rows are " +
              "already distinct per group tuple; distinct-count the " +
              "non-group columns only")
          if (!tuples.exists(_.sorted == names.sorted)) tuples :+= names
        case f => refuse(s"unsupported DISTINCT aggregate ${f.prettyName}")
      } else ae.aggregateFunction match {
        case Count(Seq(_: Literal)) => () // n_rows, always maintained
        case Count(Seq(a: AttributeReference)) =>
          val attr = factAttr(a, what)
          if (attr.nullable) {
            if (attr.dataType != LongType) refuse(
              s"$what counts a nullable non-BIGINT column — only " +
                "BIGINT (azof Int) measures carry non-null counts")
            if (!sumCols.contains(attr.name)) sumCols :+= attr.name
          }
        case s: Sum =>
          val attr = factAttr(s.child, what)
          if (attr.dataType != LongType) refuse(
            s"$what sums a ${attr.dataType.sql} column — sum columns " +
              "must be BIGINT (azof Int)")
          if (!sumCols.contains(attr.name)) sumCols :+= attr.name
        case avg: Average =>
          val attr = factAttr(avg.child, what)
          if (attr.dataType != LongType) refuse(
            s"$what averages a ${attr.dataType.sql} column — avg " +
              "columns must be BIGINT (azof Int)")
          if (!sumCols.contains(attr.name)) sumCols :+= attr.name
        case m: Min =>
          val attr = factAttr(m.child, what)
          if (attr.dataType == BooleanType) refuse(
            s"$what min/maxes a BOOLEAN — aggregate a cast upstream")
          if (!minMaxCols.contains(attr.name)) minMaxCols :+= attr.name
        case m: Max =>
          val attr = factAttr(m.child, what)
          if (attr.dataType == BooleanType) refuse(
            s"$what min/maxes a BOOLEAN — aggregate a cast upstream")
          if (!minMaxCols.contains(attr.name)) minMaxCols :+= attr.name
        case v: org.apache.spark.sql.catalyst.expressions.aggregate
            .VarianceSamp => varDecl(v.child, what)
        case v: org.apache.spark.sql.catalyst.expressions.aggregate
            .VariancePop => varDecl(v.child, what)
        case v: org.apache.spark.sql.catalyst.expressions.aggregate
            .StddevSamp => varDecl(v.child, what)
        case v: org.apache.spark.sql.catalyst.expressions.aggregate
            .StddevPop => varDecl(v.child, what)
        case _: org.apache.spark.sql.catalyst.expressions.aggregate
            .HyperLogLogPlusPlus => refuse(
          s"$what is approximate — the rewrite contract is exactness, " +
            "so sketches never serve automatically; declare the " +
            "column via approx_cols (CALL system.create_view / CLI " +
            "--approx-cols) and serve with mv-approx / " +
            "MatView.approxDistinct")
        case f => refuse(s"unsupported aggregate ${f.prettyName}")
      }
    }
    def walk(e: Expression): Unit = e match {
      case ae: AggregateExpression => classify(ae)
      case c: Cast => walk(c.child)
      case b: org.apache.spark.sql.catalyst.expressions.BinaryArithmetic =>
        import org.apache.spark.sql.catalyst.expressions.{Add, Divide, Multiply, Subtract}
        b match {
          case _: Add | _: Subtract | _: Multiply | _: Divide =>
            walk(b.left); walk(b.right)
          case _ => refuse(s"unsupported expression ${b.sql} — only " +
            "+ − × ÷, casts, and literals compose over aggregates")
        }
      case _: Literal => ()
      case other => refuse(s"unsupported output expression " +
        s"${other.sql} — outputs are group columns or expression " +
        "trees (+ − × ÷, casts, literals) over COUNT/SUM/AVG/MIN/MAX/" +
        "VAR_SAMP/VAR_POP/STDDEV_SAMP/STDDEV_POP/COUNT(DISTINCT …)")
    }
    agg.aggregateExpressions.foreach {
      case a: AttributeReference if groupCols.contains(a.name) => ()
      case al: Alias => al.child match {
        case a: AttributeReference if groupCols.contains(a.name) => ()
        case e if derivedCanon.contains(e.canonicalized) => ()
        case e => walk(e)
      }
      case ne: NamedExpression => refuse(
        s"unsupported output ${ne.sql} — every output is a group " +
          "column or an (aliased) aggregate expression")
    }

    // --- assemble, re-raising the def contracts with the DDL remedy ---
    def contract[A](a: => A): A =
      try a catch {
        case e: IllegalArgumentException => refuse(e.getMessage)
      }
    if (dimSides.isEmpty)
      SingleInf(factLake, factTable, contract(ViewDef(
        groupCols, sumCols, minMaxCols, distinctCols, derived, tuples,
        filter = filterSql, varCols = varCols)))
    else {
      val topIdx = dimSides.indices.filter(dimSides(_).parent == -1)
      val topFks = topIdx.map(dimSides(_).fkName)
      if (topFks.distinct.size != topFks.size) refuse(
        "two joins share a foreign-key column — each dim joins on " +
          "its own fact column")
      // assemble the dim TREE (one-hop snowflake subs under their
      // parent) and the FLATTENED pre-order location list the create/
      // refresh contract takes
      val dims = topIdx.map { ti =>
        val subIdx = dimSides.indices.filter(dimSides(_).parent == ti)
        DimJoin(dimSides(ti).fkName, physByDim.getOrElse(ti, Nil),
          subIdx.map(si => DimJoin(dimSides(si).fkName,
            physByDim.getOrElse(si, Nil))))
      }
      val locs = topIdx.flatMap { ti =>
        Seq((dimSides(ti).lake, dimSides(ti).table)) ++
          dimSides.indices.filter(dimSides(_).parent == ti)
            .map(si => (dimSides(si).lake, dimSides(si).table))
      }
      StarInf(factLake, factTable, locs,
        contract(JoinViewDef(groupCols, sumCols, minMaxCols, dims,
          distinctCols, derived, tuples, filter = filterSql,
          varCols = varCols)))
    }
  }
}

/** `CREATE MATERIALIZED VIEW [IF NOT EXISTS] <mv> AS <query>`: infer
  * the definition from the analyzed query ([[ViewDdl.infer]]), create
  * the view (+ support) tables, and run the initial refresh — the
  * view is populated and rewrite-eligible when the command returns.
  */
final case class CreateMatViewCommand(
    view: String, ifNotExists: Boolean, queryText: String)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("view", StringType, nullable = false)(),
    AttributeReference("kind", StringType, nullable = false)(),
    AttributeReference("created", BooleanType, nullable = false)(),
    AttributeReference("view_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val lake = ViewDdl.lakeOf(spark)
    ViewDdl.kindOf(spark, lake, view) match {
      case Some(kind) if ifNotExists =>
        return Seq(Row(view, kind, false,
          AzofTable(spark, lake, view).currentVersion.toLong))
      case Some(kind) =>
        throw new IllegalArgumentException(
          s"materialized view '$view' ($kind) already exists in $lake " +
            "— definitions are immutable per view table: DROP it (or " +
            "CREATE ... IF NOT EXISTS to no-op)")
      case None =>
        val dir = new Path(new Path(lake), view)
        val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
        if (fs.exists(new Path(dir, "version.txt")))
          throw new IllegalArgumentException(
            s"a table named '$view' already exists in $lake and is " +
              "NOT a materialized view — refusing to overwrite it")
    }
    val analyzed = org.apache.spark.sql.graft.StreamingBridge
      .ofRows(spark, spark.sessionState.sqlParser.parsePlan(queryText))
      .queryExecution.analyzed
    val ck = new Path(new Path(new Path(lake), view),
      "_refresh_checkpoint").toString
    val version = ViewDdl.infer(spark, analyzed) match {
      case ViewDdl.SingleInf(srcLake, srcTable, vd) =>
        MatView.create(spark, srcLake, srcTable, lake, view, vd)
        val q = MatView.refresh(
          spark, srcLake, srcTable, lake, view, vd, ck)
        q.awaitTermination()
        AzofTable(spark, lake, view).currentVersion.toLong
      case ViewDdl.StarInf(factLake, factTable, dims, jdef) =>
        JoinView.refresh(
          spark, factLake, factTable, dims, lake, view, jdef)
        AzofTable(spark, lake, view).currentVersion.toLong
    }
    val kind = ViewDdl.kindOf(spark, lake, view).getOrElse("single")
    Seq(Row(view, kind, true, version))
  }
}

/** `REFRESH MATERIALIZED VIEW <mv>`: one synchronous catch-up to the
  * source's (sources') current state, whichever view kind the sidecar
  * declares.
  */
final case class RefreshMatViewCommand(view: String)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("view", StringType, nullable = false)(),
    AttributeReference("kind", StringType, nullable = false)(),
    AttributeReference("view_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val lake = ViewDdl.lakeOf(spark)
    val ck = new Path(new Path(new Path(lake), view),
      "_refresh_checkpoint").toString
    MatView.readDef(spark, lake, view) match {
      case Some((srcLake, srcTable, vd)) =>
        val q = MatView.refresh(
          spark, srcLake, srcTable, lake, view, vd, ck)
        q.awaitTermination()
        Seq(Row(view, "single",
          AzofTable(spark, lake, view).currentVersion.toLong))
      case None => JoinView.readDef(spark, lake, view) match {
        case Some((factLake, factTable, dims, jdef)) =>
          JoinView.refresh(
            spark, factLake, factTable, dims, lake, view, jdef)
          Seq(Row(view, "star",
            AzofTable(spark, lake, view).currentVersion.toLong))
        case None => throw new IllegalArgumentException(
          s"no materialized view '$view' in $lake (no definition " +
            "sidecar)")
      }
    }
  }
}

/** `SHOW MATERIALIZED VIEWS`: every view table in the session lake
  * (definition sidecars, the auto-discovery rule's evidence), one
  * driver-sized row each — name, kind, source table(s), sidecar
  * format, consumed cursor, current view version.
  */
final case class ShowMatViewsCommand()
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("view", StringType, nullable = false)(),
    AttributeReference("kind", StringType, nullable = false)(),
    AttributeReference("source", StringType, nullable = false)(),
    AttributeReference("format", LongType, nullable = false)(),
    AttributeReference("cursor", StringType, nullable = true)(),
    AttributeReference("view_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val lake = ViewDdl.lakeOf(spark)
    val root = new Path(lake)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq.filter(_.isDirectory).map(_.getPath)
      .sortBy(_.getName)
      .flatMap { d =>
        val name = d.getName
        ViewDdl.kindOf(spark, lake, name).map { kind =>
          val fmt = MatView.defFormat(spark, lake, name).toLong
          val (src, cursor) =
            if (kind == "single")
              (MatView.readDef(spark, lake, name)
                .map(_._2).getOrElse(""),
                MatView.readCursor(spark, lake, name).map(_.toString))
            else {
              val dOpt = try JoinView.readDef(spark, lake, name)
                catch { case scala.util.control.NonFatal(_) => None }
              (dOpt.map { case (_, ft, ds, _) =>
                (ft +: ds.map(_._2)).mkString(" ⋈ ") }.getOrElse(""),
                JoinView.readCursorString(spark, lake, name))
            }
          Row(name, kind, src, fmt, cursor.orNull,
            AzofTable(spark, lake, name).currentVersion.toLong)
        }
      }
  }
}

/** `DESCRIBE MATERIALIZED VIEW <mv>`: the full declared definition as
  * one property row per element — what an operator inspects before
  * deciding a query's rewrite eligibility.
  */
final case class DescribeMatViewCommand(view: String)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("property", StringType, nullable = false)(),
    AttributeReference("value", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val lake = ViewDdl.lakeOf(spark)
    def row(k: String, v: String): Option[Row] =
      if (v.isEmpty) None else Some(Row(k, v))
    def common(groupCols: Seq[String], sumCols: Seq[String],
        minMaxCols: Seq[String], distinctCols: Seq[String],
        tuples: Seq[Seq[String]], approx: Seq[String],
        derived: Seq[graft.sources.DerivedGroup],
        filter: Option[String], varCols: Seq[String]): Seq[Row] =
      row("group_cols", groupCols.mkString(", ")).toSeq ++
        row("sum_cols", sumCols.mkString(", ")) ++
        row("minmax_cols", minMaxCols.mkString(", ")) ++
        row("distinct_cols", distinctCols.mkString(", ")) ++
        row("distinct_tuples",
          tuples.map(_.mkString("(", ", ", ")")).mkString("; ")) ++
        row("approx_cols", approx.mkString(", ")) ++
        row("var_cols", varCols.mkString(", ")) ++
        row("filter", filter.getOrElse("")) ++
        derived.map(dg =>
          Row(s"derived ${dg.name}",
            s"${dg.sql} :: ${dg.dataType.jsonName}"))
    val fmt = MatView.defFormat(spark, lake, view)
    MatView.readDef(spark, lake, view) match {
      case Some((srcLake, srcTable, vd)) =>
        Seq(Row("kind", "single"),
          Row("source", new Path(new Path(srcLake), srcTable).toString),
          Row("format", fmt.toString)) ++
          MatView.readCursor(spark, lake, view)
            .map(c => Row("cursor", c.toString)) ++
          common(vd.groupCols, vd.sumCols, vd.minMaxCols,
            vd.distinctCols, vd.distinctTuples, vd.approxCols,
            vd.derivedGroups, vd.filter, vd.varCols)
      case None => JoinView.readDef(spark, lake, view) match {
        case Some((factLake, factTable, dims, jdef)) =>
          Seq(Row("kind", "star"),
            Row("fact",
              new Path(new Path(factLake), factTable).toString),
            Row("format", fmt.toString)) ++
            JoinView.readCursorString(spark, lake, view)
              .map(c => Row("cursor", c)) ++
            jdef.dims.zipWithIndex.flatMap { case (dj, i) =>
              val off = jdef.flatOffset(i)
              def row(label: String, loc: (String, String),
                  cols: Seq[String]) =
                Row(label, new Path(new Path(loc._1), loc._2).toString +
                  (if (cols.isEmpty) ""
                   else cols.mkString(" (", ", ", ")")))
              Seq(row(s"dim ${dj.fkCol}", dims(off), dj.dimCols)) ++
                dj.subs.zipWithIndex.map { case (s, j) =>
                  row(s"dim ${dj.fkCol} ⋈ ${s.fkCol}",
                    dims(off + 1 + j), s.dimCols) }
            } ++
            common(jdef.groupCols, jdef.sumCols, jdef.minMaxCols,
              jdef.distinctCols, jdef.distinctTuples, jdef.approxCols,
              jdef.derivedGroups, jdef.filter, jdef.varCols)
        case None => throw new IllegalArgumentException(
          s"no materialized view '$view' in $lake (no definition " +
            "sidecar)")
      }
    }
  }
}

/** `DROP MATERIALIZED VIEW [IF EXISTS] <mv>`: delete the view table
  * and its `__dv` support table, and invalidate the rewrite rule's
  * cached definition and discovery listing. Refuses on a table that
  * is not a materialized view.
  */
final case class DropMatViewCommand(view: String, ifExists: Boolean)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("view", StringType, nullable = false)(),
    AttributeReference("dropped", BooleanType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val lake = ViewDdl.lakeOf(spark)
    val dir = new Path(new Path(lake), view)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    ViewDdl.kindOf(spark, lake, view) match {
      case None if ifExists => Seq(Row(view, false))
      case None if fs.exists(dir) => throw new IllegalArgumentException(
        s"table '$view' in $lake is NOT a materialized view (no " +
          "definition sidecar) — refusing to delete it")
      case None => throw new IllegalArgumentException(
        s"no materialized view '$view' in $lake")
      case Some(_) =>
        fs.delete(dir, true)
        val dv = new Path(new Path(lake), MatView.dvTableName(view))
        if (fs.exists(dv)) fs.delete(dv, true)
        MvRewriteRule.invalidateDef(lake, view)
        MvRewriteRule.invalidateAuto(lake)
        // the format-stamp cache assumes definitions are immutable per
        // view TABLE — DROP (+ a later CREATE of the same name) breaks
        // that, and a stale stamp would misjudge the recreate's tuple
        // encoding in both directions
        MatView.invalidateDefFormat(lake, view)
        Seq(Row(view, true))
    }
  }
}

/** `EXPLAIN <materialized-view statement>`: a DESCRIPTION of what the
  * statement would do, one line per row — for CREATE, the query is
  * analyzed and definition INFERENCE runs (so unsupported shapes
  * surface their named refusal here, before anything exists), but
  * nothing is created. Without this route, EXPLAIN on MV DDL fell
  * through to the delegate parser and died with an unrelated syntax
  * error.
  */
final case class ExplainMatViewDdlCommand(stmt: LogicalPlan)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("plan", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    def field(k: String, v: String): Seq[String] =
      if (v.isEmpty) Nil else Seq(s"  $k: $v")
    val lines: Seq[String] = stmt match {
      case c: CreateMatViewCommand =>
        val analyzed = org.apache.spark.sql.graft.StreamingBridge
          .ofRows(spark,
            spark.sessionState.sqlParser.parsePlan(c.queryText))
          .queryExecution.analyzed
        val head = s"CreateMatViewCommand view=${c.view}" +
          (if (c.ifNotExists) " ifNotExists" else "")
        def common(groupCols: Seq[String], sumCols: Seq[String],
            minMaxCols: Seq[String], distinctCols: Seq[String],
            tuples: Seq[Seq[String]],
            derived: Seq[DerivedGroup],
            filter: Option[String], varCols: Seq[String]): Seq[String] =
          field("group_cols", groupCols.mkString(", ")) ++
            field("sum_cols", sumCols.mkString(", ")) ++
            field("minmax_cols", minMaxCols.mkString(", ")) ++
            field("distinct_cols", distinctCols.mkString(", ")) ++
            field("distinct_tuples",
              tuples.map(_.mkString("(", ", ", ")")).mkString("; ")) ++
            field("var_cols", varCols.mkString(", ")) ++
            field("filter", filter.getOrElse("")) ++
            derived.map(dg =>
              s"  derived ${dg.name}: ${dg.sql} :: ${dg.dataType.jsonName}")
        ViewDdl.infer(spark, analyzed) match {
          case ViewDdl.SingleInf(sl, st, vd) =>
            Seq(head, "  kind: single",
              s"  source: ${new Path(new Path(sl), st)}") ++
              common(vd.groupCols, vd.sumCols, vd.minMaxCols,
                vd.distinctCols, vd.distinctTuples, vd.derivedGroups,
                vd.filter, vd.varCols)
          case ViewDdl.StarInf(fl, ft, dims, jdef) =>
            Seq(head, "  kind: star",
              s"  fact: ${new Path(new Path(fl), ft)}") ++
              jdef.dims.zipWithIndex.flatMap { case (dj, i) =>
                val off = jdef.flatOffset(i)
                def line(label: String, loc: (String, String),
                    cols: Seq[String]) =
                  s"  $label: ${new Path(new Path(loc._1), loc._2)}" +
                    (if (cols.isEmpty) ""
                     else cols.mkString(" (", ", ", ")"))
                Seq(line(s"dim ${dj.fkCol}", dims(off), dj.dimCols)) ++
                  dj.subs.zipWithIndex.map { case (s, j) =>
                    line(s"dim ${dj.fkCol} ⋈ ${s.fkCol}",
                      dims(off + 1 + j), s.dimCols) }
              } ++
              common(jdef.groupCols, jdef.sumCols, jdef.minMaxCols,
                jdef.distinctCols, jdef.distinctTuples,
                jdef.derivedGroups, jdef.filter, jdef.varCols)
        }
      case d: DropMatViewCommand =>
        Seq(s"DropMatViewCommand view=${d.view}" +
          (if (d.ifExists) " ifExists" else ""))
      case r: RefreshMatViewCommand =>
        Seq(s"RefreshMatViewCommand view=${r.view}")
      case _: ShowMatViewsCommand => Seq("ShowMatViewsCommand")
      case d: DescribeMatViewCommand =>
        Seq(s"DescribeMatViewCommand view=${d.view}")
      case other => Seq(other.nodeName)
    }
    Seq(Row(lines.mkString("\n")))
  }
}
