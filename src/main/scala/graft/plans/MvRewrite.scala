package graft.plans

import graft.sources.{AzofRelation, AzofV2Table, MatView, ViewDef}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Expression, Literal, NamedExpression, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** AUTOMATIC MATERIALIZED-VIEW REWRITE — the classic warehouse move,
  * Catalyst-native: an `Aggregate` over an azof table's CURRENT view
  * whose shape a registered [[MatView]] covers is answered FROM the
  * view table (group-cardinality-sized) instead of the corpus — the
  * query that costs a 100-TB scan+shuffle becomes a metadata-bounded
  * index read, with zero query change.
  *
  * Opt-in and exact by construction:
  *
  *   - `spark.azof.mv.rewrite` names the candidate view tables
  *     (`mv1,mv2` under `spark.azof.path`, or `lake::mv`). Unset = the
  *     rule is inert.
  *   - Each candidate's definition sidecar ([[MatView.DefFileName]])
  *     names its source table and declared aggregates; definitions are
  *     immutable per view table, cached per session.
  *   - The rewrite fires ONLY when [[MatView.isFresh]] proves the view
  *     equals the one-shot aggregate over the source's current live
  *     corpus (cursor sidecar + a view-preserving walk of post-cursor
  *     commits — zero I/O in steady state, stale/rolled-back views
  *     fall back to the scan, never to wrong answers).
  *   - Matched shapes: `GROUP BY` on a SUBSET of the view's group
  *     columns (the monoid rollup property: COUNT re-sums `n_rows`,
  *     SUM re-sums, MIN/MAX re-minimize — all exact). Each output is
  *     decomposed into a TREE over view-servable aggregate leaves —
  *     COUNT(*) / COUNT(c) (the view's non-null count `nn_<c>`, exact
  *     for nullable measures) / SUM / MIN / MAX over declared columns,
  *     `COUNT(DISTINCT g)` for a view GROUP column (view rows are
  *     distinct group tuples), and `AVG(c)` for a declared sum column
  *     as `SUM(c)/COUNT(c)` from the stored totals — with casts,
  *     `+ − × ÷`, and literals as interior nodes, so expressions like
  *     `avg(v)`, `sum(a) - sum(b)`, or `100 * sum(v) / count(*)`
  *     rewrite component-wise; a subset rollup re-derives them from
  *     re-summed totals, never by averaging averages. WHERE predicates
  *     touching only group columns commute with the aggregation and
  *     move onto the (group-cardinality) view scan; any other
  *     predicate, FILTER clause, or aggregate refuses. An exact group
  *     match with no distinct skips the re-aggregation entirely (pure
  *     projection).
  *
  * JOIN shapes rewrite too: an aggregate over
  * `fact INNER JOIN dim ON fact.fk = dim.key` (either operand order)
  * matches a registered [[graft.sources.JoinView]] whose definition
  * names that fact/dim/fk triple — with an attribute-PROVENANCE check
  * (each referenced column must live on the side its name claims in
  * the view definition, so name shadowing across the join refuses)
  * and the pair-cursor freshness gate
  * ([[graft.sources.JoinView.isFresh]]).
  *
  * Both scan surfaces rewrite: the V1 reader relation (`azof.t` SQL,
  * `spark.read.format("azof")`) and the DSv2 catalog relation
  * (`cat.t`), in the Current un-pinned form (`mvMatchKey`) and the
  * `VERSION AS OF <n|tag>` pinned form (`mvMatchKeyPinned`) — the
  * latter serves from the view exactly when every pinned version's
  * live state provably equals the view's consumed state
  * ([[MatView.freshViewVersionAt]] /
  * [[graft.sources.JoinView.freshViewVersionAt]]'s walks — the
  * reproducible `AS OF <tag>` dashboard, single-table or star with
  * per-table pins, stops re-paying the corpus aggregate) — and the
  * `TIMESTAMP AS OF` event-time form (`mvMatchKeyAsOf`), served
  * exactly when the coordinate provably equals the consumed state
  * ([[MatView.unchangedSinceAsOf]]'s walk — the frozen-dashboard
  * shape). Branches and WAP-routed reads never rewrite.
  * Output attribute ids are preserved through a positional alias
  * projection, so parent operators are untouched.
  */
final case class MvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  import MvRewriteRule._

  private def confList(key: String): Seq[String] =
    spark.conf.getOption(key).toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)

  /** `(lake, mvTable)` candidates from the conf. The sentinel `auto`
    * (or `lake::auto`) DISCOVERS candidates by listing the lake for
    * definition sidecars — one listing, session-cached
    * ([[MvRewriteRule.discover]]) — so a production lake with dozens
    * of views rewrites without per-session list curation.
    */
  private def candidates: Seq[(String, String)] =
    candidatesOf("spark.azof.mv.rewrite")

  /** `spark.azof.mv.rewrite.approx`'s candidates — the views whose HLL
    * sketch columns MAY answer `approx_count_distinct(c)` (same
    * `mv1,mv2` / `lake::mv` / `auto` syntax, DEFAULT OFF, a separate
    * list by design: the served value is the AZOF HLL ESTIMATE, which
    * legitimately differs from Spark's own HLL++ sketch — an exact-conf
    * view must never change an approx aggregate's result, so opting a
    * view into estimate serving is an explicit, separate act). A view
    * listed here also serves the exact shapes (exact serves are exact
    * regardless of which conf named the view).
    */
  private def approxCandidates: Seq[(String, String)] =
    candidatesOf("spark.azof.mv.rewrite.approx")

  private def candidatesOf(key: String): Seq[(String, String)] =
    confList(key).flatMap { entry =>
    entry.split("::") match {
      case Array("auto") =>
        spark.conf.getOption("spark.azof.path").toSeq.flatMap(root =>
          discover(spark, root).map(mv => (root, mv)))
      case Array(lake, "auto") =>
        discover(spark, lake).map(mv => (lake, mv))
      case Array(lake, mv) => Seq((lake, mv))
      case Array(mv) =>
        spark.conf.getOption("spark.azof.path").map(root => (root, mv))
          .toSeq
      case _ => Nil
    }
  }

  private def norm(lake: String, table: String): String =
    new Path(new Path(lake), table).toString

  /** The relation a covered aggregate may stand on: the azof CURRENT
    * view (either surface), possibly under pure column-pruning Projects
    * and Filters. Returns the normalized source key plus the collected
    * filter conjuncts (validated against the view's group columns by
    * the caller).
    */
  private[plans] def srcOf(plan: LogicalPlan)
      : Option[(String, Seq[Expression], Option[graft.sources.ReadPin])] =
    plan match {
      case l: LogicalRelation => l.relation match {
        case r: AzofRelation => relPin(
          r.mvMatchKey, r.mvMatchKeyPinned, r.mvMatchKeyAsOf)
          .map { case (k, pin) => (k, Seq.empty[Expression], pin) }
        case _ => None
      }
      case r: DataSourceV2Relation => r.table match {
        case t: AzofV2Table => relPin(
          t.mvMatchKey, t.mvMatchKeyPinned, t.mvMatchKeyAsOf)
          .map { case (k, pin) => (k, Seq.empty[Expression], pin) }
        case _ => None
      }
      case p: Project if p.projectList.forall(_.isInstanceOf[Attribute]) =>
        srcOf(p.child)
      case f: Filter => srcOf(f.child).map { case (k, cs, pin) =>
        (k, splitAnd(f.condition) ++ cs, pin)
      }
      case _ => None
    }

  /** Fold one relation's three match surfaces into
    * `(normalized key, pin)`: the Current read (no pin), the
    * `VERSION AS OF` pin, or the `TIMESTAMP AS OF` event-time
    * coordinate.
    */
  private def relPin(
      cur: Option[(String, String)],
      ver: Option[(String, String, Long)],
      asOf: Option[(String, String, java.time.Instant)])
      : Option[(String, Option[graft.sources.ReadPin])] =
    cur.map(k =>
        (norm(k._1, k._2), Option.empty[graft.sources.ReadPin]))
      .orElse(ver.map { case (lk, tb, v) =>
        (norm(lk, tb),
          Some(graft.sources.ReadPin.Version(v))
            : Option[graft.sources.ReadPin]) })
      .orElse(asOf.map { case (lk, tb, t) =>
        (norm(lk, tb),
          Some(graft.sources.ReadPin.EventTime(t))
            : Option[graft.sources.ReadPin]) })

  private[plans] def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  /** Strip pure column-pruning Projects and Filters off a plan,
    * collecting the filter conjuncts.
    */
  private[plans] def strip(plan: LogicalPlan): (LogicalPlan, Seq[Expression]) =
    plan match {
      case p: Project if p.projectList.forall(_.isInstanceOf[Attribute]) =>
        strip(p.child)
      case f: Filter =>
        val (c, cs) = strip(f.child)
        (c, splitAnd(f.condition) ++ cs)
      case other => (other, Nil)
    }

  /** The bare azof relation under `plan` (no Projects/Filters stripped
    * here), as its normalized source key plus its `VERSION AS OF` pin
    * (None = the un-pinned Current read).
    */
  private[plans] def relKey(plan: LogicalPlan)
      : Option[(String, Option[graft.sources.ReadPin])] =
    plan match {
      case l: LogicalRelation => l.relation match {
        case r: AzofRelation => relPin(
          r.mvMatchKey, r.mvMatchKeyPinned, r.mvMatchKeyAsOf)
        case _ => None
      }
      case r: DataSourceV2Relation => r.table match {
        case t: AzofV2Table => relPin(
          t.mvMatchKey, t.mvMatchKeyPinned, t.mvMatchKeyAsOf)
        case _ => None
      }
      case _ => None
    }

  /** One matched dimension of a covered STAR shape: the dim relation's
    * source key, its version pin (if the read is `VERSION AS OF`), the
    * fk column joining to its record key (a FACT column for a top dim,
    * a PARENT-DIM column for a snowflake sub), the dim relation's
    * output (for attribute provenance checks), and — top dims only —
    * its matched one-hop SUB sides.
    */
  private[plans] case class DimSide(
      dimKey: String, pin: Option[graft.sources.ReadPin], fkName: String,
      dimOut: Seq[Attribute], subs: Seq[DimSide] = Nil)

  /** A covered STAR shape: a left-deep tree of INNER joins
    * `fact ⋈ dim1 ⋈ dim2 ⋈ …` where every join condition equates a
    * FACT column with a dim relation's record key (either operand
    * order at every level), all relations azof Current or
    * version-pinned reads under pure Projects/Filters. Returns the
    * fact's source key + pin, the matched dim sides, all collected
    * filter conjuncts, and the fact relation's output. A single join
    * is the one-dim special case.
    */
  private[plans] def starSrcOf(plan: LogicalPlan): Option[(
      String, Option[graft.sources.ReadPin], Seq[DimSide],
      Seq[Expression], Seq[Attribute])] = {
    import org.apache.spark.sql.catalyst.expressions.EqualTo
    val (core, conds) = strip(plan)
    core match {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.joinType == org.apache.spark.sql.catalyst.plans.Inner =>
        def asDim(side: LogicalPlan)
            : Option[(String, Option[graft.sources.ReadPin],
              Seq[Attribute], Seq[Expression])] = {
          val (c, cs) = strip(side)
          relKey(c).map { case (k, pin) => (k, pin, c.output, cs) }
        }
        def combine(subSide: LogicalPlan, dimSide: LogicalPlan)
            : Option[(String, Option[graft.sources.ReadPin], Seq[DimSide],
              Seq[Expression], Seq[Attribute])] =
          for {
            (fKey, fPin, dims, subConds, fOut) <- starSrcOf(subSide)
            (dKey, dPin, dOut, dConds) <- asDim(dimSide)
            // the join key: the NEW relation's record key equated with
            // either a FACT column (top dim) or a matched TOP DIM's
            // column (one-hop snowflake sub — sub outputs are not
            // searched, which is what keeps chains one hop)
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
                    Some(dims :+ DimSide(dKey, dPin, attr.name, dOut))
                  else dims.indexWhere(
                    _.dimOut.exists(_.exprId == attr.exprId)) match {
                    case -1 => None
                    case i => Some(dims.updated(i, dims(i).copy(
                      subs = dims(i).subs :+
                        DimSide(dKey, dPin, attr.name, dOut))))
                  }
                }
              case _ => None
            }
          } yield (fKey, fPin, newDims, subConds ++ dConds, fOut)
        combine(j.left, j.right).orElse(combine(j.right, j.left))
          .map { case (fk, fPin, ds, cs, fOut) =>
            (fk, fPin, ds, conds ++ cs, fOut) }
      case rel =>
        relKey(rel).map { case (k, pin) =>
          (k, pin, Nil, conds, rel.output) }
    }
  }

  /** [[starSrcOf]] with at least one dim — the join-view entry gate. */
  private def joinSrcOf(plan: LogicalPlan): Option[(
      String, Option[graft.sources.ReadPin], Seq[DimSide],
      Seq[Expression], Seq[Attribute])] =
    starSrcOf(plan).filter(_._3.nonEmpty)

  /** A filter conjunct the view can answer: deterministic, no
    * subqueries, and touching ONLY group columns — group values are
    * identical in the view, so the predicate commutes with the
    * aggregation and applies to the view scan verbatim.
    */
  private def filterCovered(c: Expression, vd: ViewDef): Boolean =
    c.deterministic &&
      !c.exists(_.isInstanceOf[PlanExpression[_]]) &&
      c.references.nonEmpty &&
      c.references.forall(a => vd.groupCols.contains(a.name))

  /** A FILTERED view's declared predicate, analyzed against the same
    * leaf-relation binding surface the query's own conjuncts reference
    * — so the canonical comparison in [[matchViewFilter]] happens in
    * one attribute space. Analysis failure (ambiguous names, missing
    * columns) just refuses the match.
    */
  private def viewFilterConjs(f: String, lr: LogicalPlan)
      : Option[Seq[Expression]] =
    try {
      val parsed = spark.sessionState.sqlParser.parseExpression(f)
      val analyzed = spark.sessionState.analyzer.execute(
        Filter(parsed, lr))
      // the QUERY's conjuncts arrive optimizer-folded (`v > 5` is
      // already `v > 5L`), while this side is only analyzed (`v >
      // CAST(5 AS BIGINT)`) — fold before canonical comparison
      val folded =
        org.apache.spark.sql.catalyst.optimizer.ConstantFolding(analyzed)
      folded.collectFirst { case fl: Filter => fl.condition }
        .filter(_.resolved).map(splitAnd)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Whether query conjunct `qc` IMPLIES view conjunct `vc` by
    * equality/IN subset on the same attribute (`g = 'a'` implies
    * `g IN ('a','b')`). NULL literals refuse (three-valued logic makes
    * subset reasoning unsound there).
    */
  private def impliesSubset(qc: Expression, vc: Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, In}
    def parts(e: Expression): Option[(Expression, Set[Any])] = e match {
      case EqualTo(a: AttributeReference, l: Literal) =>
        Some((a.canonicalized, Set(l.value)))
      case EqualTo(l: Literal, a: AttributeReference) =>
        Some((a.canonicalized, Set(l.value)))
      case In(a: AttributeReference, vs)
        if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        Some((a.canonicalized,
          vs.map(_.asInstanceOf[Literal].value).toSet))
      case _ => None
    }
    (parts(qc), parts(vc)) match {
      case (Some((qa, qs)), Some((va, vs))) =>
        qa == va && !qs.contains(null) && !vs.contains(null) &&
          qs.subsetOf(vs)
      case _ => false
    }
  }

  /** Match a FILTERED view's conjuncts against the query's WHERE: every
    * view conjunct must be either exactly present (canonical equality —
    * removed from the residue: every view row already satisfies it,
    * and it may reference non-group columns the view does not store) or
    * IMPLIED by a query conjunct ([[impliesSubset]] — kept in the
    * residue, where [[filterCovered]] later demands it be
    * group-servable). Returns the query conjuncts still to apply to
    * the view scan, or None when the view's membership predicate is
    * not provably implied — the query then reads the corpus (a
    * filtered view can never answer an unfiltered question).
    */
  private def matchViewFilter(
      conds: Seq[Expression], vcs: Seq[Expression])
      : Option[Seq[Expression]] = {
    var remaining = conds
    val ok = vcs.forall { vc =>
      remaining.find(_.canonicalized == vc.canonicalized) match {
        case Some(qc) => remaining = remaining.filterNot(_ eq qc); true
        case None => conds.exists(impliesSubset(_, vc))
      }
    }
    if (ok) Some(remaining) else None
  }

  /** A binding surface for [[derivedCanon]]: every azof leaf
    * relation's FULL output under `plan`, as one LocalRelation — the
    * grouping and (pushed-down) filter expressions reference these
    * attribute ids even when pruning Projects hide them from
    * intermediate outputs. Same-named columns across a star's tables
    * make resolution ambiguous and the match conservatively refuses.
    */
  private def leafRelation(plan: LogicalPlan): LogicalPlan =
    org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
      plan.collectLeaves().flatMap {
        case l: LogicalRelation
          if l.relation.isInstanceOf[AzofRelation] => l.output
        case r: DataSourceV2Relation
          if r.table.isInstanceOf[AzofV2Table] => r.output
        case _ => Nil
      })

  /** Substitute every DERIVED-group subexpression in a filter conjunct
    * with a reference to the view's stored bucket column, so
    * `WHERE date_trunc('day', t) = X` (the dashboard shape) commutes
    * onto the (group-cardinality) view scan like any group-column
    * predicate — [[filterCovered]] then validates the residue.
    */
  private def substDerived(
      c: Expression, vd: ViewDef,
      dm: Expression => Option[String]): Expression =
    if (vd.derivedGroups.isEmpty) c
    else c.transformUp {
      case e if dm(e).isDefined =>
        AttributeReference(dm(e).get, e.dataType, nullable = true)()
    }

  /** One view-servable aggregate ATOM: the unit the view stores (or can
    * roll up with a monoid re-aggregation). Output expressions decompose
    * into trees over these leaves, so derived aggregates — `AVG(c)` as
    * `SUM(c)/COUNT(c)`, `sum(a) - sum(b)`, `max(c) * 100 / sum(n)` —
    * rewrite COMPONENT-WISE from totals (a subset rollup re-derives
    * `AVG` from re-summed sums and counts, never by averaging averages).
    */
  private sealed trait AggLeaf
  private case object CountL extends AggLeaf
  /** `COUNT(c)` for a declared sum column: the view's per-column
    * non-null count `nn_<c>` — exact under SQL's null-skipping
    * semantics even for nullable measures.
    */
  private case class CountColL(c: String) extends AggLeaf
  private case class SumL(c: String) extends AggLeaf
  /** The raw sum of squares `ss_<c>` for a declared VARIANCE column —
    * additive at every rollup grain; VAR/STDDEV rebuild over
    * (ss, sum, nn) in a FIXED operand order (exact-integer moments,
    * the t27 BM25 reasoning: correctly-rounded IEEE ops on identical
    * integer-valued operands are bit-identical cross-engine).
    */
  private case class SumSqL(c: String) extends AggLeaf
  private case class MinL(c: String) extends AggLeaf
  private case class MaxL(c: String) extends AggLeaf
  /** `COUNT(DISTINCT c)` where `c` is one of the view's GROUP columns:
    * view rows are distinct (group tuples), so the count of live view
    * rows per query group — `count_distinct` when the view carries
    * extra group columns — is the exact distinct count.
    */
  private case class DistinctL(c: String) extends AggLeaf
  /** `COUNT(DISTINCT c)` for a DECLARED distinct column: served from
    * the view's refcounted support table ([[MatView.dvTableName]]) —
    * its live rows ARE the distinct `(group tuple, value)` pairs, so a
    * `count_distinct` over them is exact at the view's grain, at any
    * SUBSET rollup, and globally, with WHERE-on-group-columns applied
    * to the (index-sized) support scan directly.
    */
  private case class DistinctValL(c: String) extends AggLeaf
  /** `approx_count_distinct(c)` for a DECLARED approx column, admitted
    * ONLY for `spark.azof.mv.rewrite.approx` candidates: served from
    * the view's `hll_<c>` register sketch — estimated per row at the
    * exact grain, per-position-MERGED (never summed) before estimating
    * at any subset rollup or the global grain. The served value is the
    * azof HLL estimate (4096 registers, rsd ≈ 1.6%), not Spark's own
    * HLL++ — which is why the conf is separate and default-off.
    */
  private case class ApproxL(c: String) extends AggLeaf

  private sealed trait Out
  private case class GroupOut(c: String) extends Out
  /** An output computed from leaf totals: `build` re-assembles the
    * original expression tree over the served leaf columns (aligned
    * positionally with `leaves`).
    */
  private case class CalcOut(
      leaves: Seq[AggLeaf], build: Seq[Column] => Column) extends Out

  private type Calc = (Seq[AggLeaf], Seq[Column] => Column)

  /** Decompose one AGGREGATE FUNCTION call into view leaves, or None
    * when the view cannot answer it exactly.
    */
  private def leafOf(ae: AggregateExpression, vd: ViewDef,
      approxOk: Boolean): Option[Calc] = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Average, HyperLogLogPlusPlus}
    def one(l: AggLeaf): Option[Calc] = Some((Seq(l), _.head))
    if (ae.filter.nonEmpty) None
    else if (ae.isDistinct) ae.aggregateFunction match {
      case Count(Seq(a: AttributeReference))
        if vd.groupCols.contains(a.name) => one(DistinctL(a.name))
      case Count(Seq(a: AttributeReference))
        if vd.distinctCols.contains(a.name) => one(DistinctValL(a.name))
      case Count(as)
        if as.size >= 2 && as.forall(_.isInstanceOf[AttributeReference]) =>
        // COUNT(DISTINCT a, b): served from a declared TUPLE's support
        // pairs. Column ORDER doesn't change the distinct count, so
        // any permutation of a declared tuple matches (the dcol keeps
        // the DECLARED order); repeated columns refuse
        val names = as.map(_.asInstanceOf[AttributeReference].name)
        if (names.distinct.size != names.size) None
        else vd.distinctTuples.find(_.sorted == names.sorted)
          .flatMap(t => one(DistinctValL(t.mkString(","))))
      case _ => None
    }
    else ae.aggregateFunction match {
      case Count(Seq(_: Literal)) => one(CountL)
      case Count(Seq(a: AttributeReference)) =>
        if (!a.nullable) one(CountL)
        else if (vd.sumCols.contains(a.name)) one(CountColL(a.name))
        else None
      case s: Sum => s.child match {
        case a: AttributeReference if vd.sumCols.contains(a.name) =>
          one(SumL(a.name))
        case _ => None
      }
      case avg: Average => avg.child match {
        case a: AttributeReference if vd.sumCols.contains(a.name) =>
          // the exact CAST(SUM AS DOUBLE)/COUNT form over the view's
          // i64 totals. NOTE: Spark's own Average accumulates non-
          // decimal input in a Double buffer, so past 2^53 the
          // unrewritten plan can differ from this (and from the SQL
          // oracle) in the last ulp — the rewrite matches the exact-
          // sum-divided-once form, which is the better-conditioned one
          Some((Seq(SumL(a.name), CountColL(a.name)),
            cs => cs(0).cast("double") / cs(1).cast("double")))
        case _ => None
      }
      case m: Min => m.child match {
        case a: AttributeReference if vd.minMaxCols.contains(a.name) =>
          one(MinL(a.name))
        case _ => None
      }
      case m: Max => m.child match {
        case a: AttributeReference if vd.minMaxCols.contains(a.name) =>
          one(MaxL(a.name))
        case _ => None
      }
      case v: org.apache.spark.sql.catalyst.expressions.aggregate
          .VarianceSamp => varLeaf(v.child, vd, pop = false, sq = false)
      case v: org.apache.spark.sql.catalyst.expressions.aggregate
          .VariancePop => varLeaf(v.child, vd, pop = true, sq = false)
      case v: org.apache.spark.sql.catalyst.expressions.aggregate
          .StddevSamp => varLeaf(v.child, vd, pop = false, sq = true)
      case v: org.apache.spark.sql.catalyst.expressions.aggregate
          .StddevPop => varLeaf(v.child, vd, pop = true, sq = true)
      case h: HyperLogLogPlusPlus => h.child match {
        // admitted only for approx-conf candidates, and only when the
        // requested rsd is NO STRICTER than the stored sketch's — the
        // served estimate is then at least as precise as asked for
        case a: AttributeReference
          if approxOk && vd.approxCols.contains(a.name) &&
            h.relativeSD >= graft.sources.Hll.RelativeSD =>
          one(ApproxL(a.name))
        case _ => None
      }
      case _ => None
    }
  }

  /** Decompose `var_samp/var_pop/stddev_samp/stddev_pop(c)` for a
    * DECLARED variance column into the (ss, sum, nn) leaves with the
    * FIXED-operand-order rational rebuild:
    * `(ss − s·s/n) / (n − [0|1])` in doubles, `sqrt` for stddev, NULL
    * below the count floor (SQL's semantics: var_samp needs n ≥ 2,
    * var_pop n ≥ 1). The analyzer wraps the aggregated column in a
    * cast to double (central moments are double-typed), so the match
    * unwraps one cast. NOTE: the served value is the exact-integer-
    * moments evaluation — deterministic and cross-engine bit-stable —
    * while Spark's own scan plan accumulates CENTRAL moments in
    * partition order; the two agree to fp rounding (same quantity,
    * different summation order), exactly like the AVG leaf's
    * divided-once form.
    */
  private def varLeaf(child: Expression, vd: ViewDef,
      pop: Boolean, sq: Boolean): Option[Calc] = {
    val attr = child match {
      case a: AttributeReference => Some(a)
      case c: org.apache.spark.sql.catalyst.expressions.Cast =>
        c.child match {
          case a: AttributeReference if c.dataType == DoubleType =>
            Some(a)
          case _ => None
        }
      case _ => None
    }
    attr.filter(a => vd.varCols.contains(a.name)).map { a =>
      (Seq(SumSqL(a.name), SumL(a.name), CountColL(a.name)), {
        cs: Seq[Column] =>
          val q = cs(0).cast("double")
          val s = cs(1).cast("double")
          val nL = cs(2)
          val n = nL.cast("double")
          val base =
            if (pop) (q - s * s / n) / n
            else (q - s * s / n) / (nL - lit(1L)).cast("double")
          val guarded =
            if (pop) when(nL > 0L, base) else when(nL > 1L, base)
          if (sq) sqrt(guarded) else guarded
      })
    }
  }

  /** Arithmetic node shapes the rewrite reproduces faithfully over
    * served operands (same Column operators → same Catalyst nodes →
    * same type promotion and null semantics).
    */
  private def arithOf(b: org.apache.spark.sql.catalyst.expressions
      .BinaryArithmetic): Option[(Column, Column) => Column] = {
    import org.apache.spark.sql.catalyst.expressions.{Add, Divide, Multiply, Subtract}
    b match {
      case _: Add => Some(_ + _)
      case _: Subtract => Some(_ - _)
      case _: Multiply => Some(_ * _)
      case _: Divide => Some(_ / _)
      case _ => None
    }
  }

  /** Decompose a scalar expression OVER aggregate calls into view
    * leaves plus a rebuild function: aggregates at the leaves,
    * casts / + − × ÷ / literals as interior nodes.
    */
  private def calcOf(e: Expression, vd: ViewDef,
      approxOk: Boolean = false): Option[Calc] = e match {
    case ae: AggregateExpression => leafOf(ae, vd, approxOk)
    case c: org.apache.spark.sql.catalyst.expressions.Cast =>
      calcOf(c.child, vd, approxOk).map { case (ls, b) =>
        (ls, (cols: Seq[Column]) => b(cols).cast(c.dataType))
      }
    case b: org.apache.spark.sql.catalyst.expressions.BinaryArithmetic =>
      arithOf(b).flatMap { op =>
        for {
          (ll, lb) <- calcOf(b.left, vd, approxOk)
          (rl, rb) <- calcOf(b.right, vd, approxOk)
        } yield ((ll ++ rl, { cols: Seq[Column] =>
          val (lc, rc) = cols.splitAt(ll.size)
          op(lb(lc), rb(rc))
        }): Calc)
      }
    case l: Literal =>
      Some((Nil, _ => org.apache.spark.sql.graft.StreamingBridge.column(l)))
    case _ => None
  }

  /** Resolve every DERIVED group's SQL against `child`'s output:
    * canonicalized expression (cast to the declared stored type when
    * the raw result differs) → derived name. A query grouping by the
    * SAME expression — any alias, any operand spelling that
    * canonicalizes equal — matches the stored bucket column. Parse or
    * analysis failure against this relation just yields no match (the
    * rewrite falls back to the scan).
    */
  private def derivedCanon(vd: ViewDef, child: LogicalPlan)
      : Map[Expression, String] =
    if (vd.derivedGroups.isEmpty) Map.empty
    else vd.derivedGroups.flatMap { dg =>
      try {
        val parsed = spark.sessionState.sqlParser.parseExpression(dg.sql)
        val analyzed = spark.sessionState.analyzer.execute(
          Project(Seq(Alias(parsed, s"_dg_${dg.name}")()), child))
        val e = analyzed.asInstanceOf[Project].projectList.head
          .asInstanceOf[Alias].child
        val target = dg.dataType.sparkType
        val stored =
          if (e.dataType == target) e
          else org.apache.spark.sql.catalyst.expressions.Cast(e, target)
        if (stored.deterministic) Some(stored.canonicalized -> dg.name)
        else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }.toMap

  /** Map one output expression of the aggregate onto the view, or None
    * when the view cannot answer it exactly. `dm` matches derived
    * group expressions to their stored column names.
    */
  private def outOf(ne: NamedExpression, vd: ViewDef,
      dm: Expression => Option[String],
      approxOk: Boolean): Option[Out] =
    ne match {
      case a: AttributeReference if vd.groupCols.contains(a.name) =>
        Some(GroupOut(a.name))
      case al: Alias => al.child match {
        case a: AttributeReference if vd.groupCols.contains(a.name) =>
          Some(GroupOut(a.name))
        case e => dm(e).map(GroupOut(_): Out)
          .orElse(calcOf(e, vd, approxOk)
            .map { case (ls, b) => CalcOut(ls, b) })
      }
      case _ => None
    }

  /** Build the replacement: the served view, re-aggregated when the
    * query groups by a proper subset of the view's group columns, then
    * positionally aliased back onto the original output ids.
    */
  private def rewrite(
      agg: Aggregate, served: org.apache.spark.sql.DataFrame, vd: ViewDef,
      groups: Seq[String], outs: Seq[Out],
      conds: Seq[Expression],
      dvPairs: String => org.apache.spark.sql.DataFrame): LogicalPlan = {
    // group-column predicates commute with the aggregation: remap them
    // onto the frame's attributes and filter BEFORE any re-aggregation
    // — applied to the (group-cardinality) view scan AND to each
    // (index-sized) distinct-support scan, which carries the same
    // group columns
    def filtered(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      if (conds.isEmpty) df
      else {
        val p = df.queryExecution.analyzed
        val byName = p.output.map(a => a.name -> a).toMap
        val remapped = conds.map(_.transform {
          case a: AttributeReference => byName(a.name)
        }).reduce(And)
        org.apache.spark.sql.graft.StreamingBridge.ofRows(
          spark, Filter(remapped, p))
      }
    val serve = filtered(served)
    val allLeaves = outs.collect { case CalcOut(ls, _) => ls }
      .flatten.distinct
    val dvLeaves = allLeaves.collect { case d: DistinctValL => d }
    // one support aggregate per distinct leaf, at the QUERY's groups —
    // the support rows are distinct pairs, so this is exact at every
    // grain (incl. the global one-row aggregate)
    def dvFrame(c: String): org.apache.spark.sql.DataFrame = {
      val pairs = filtered(dvPairs(c))
      if (groups.isEmpty)
        pairs.agg(count_distinct(col("value")).as(s"dv_$c"))
      else pairs.groupBy(groups.map(col): _*)
        .agg(count_distinct(col("value")).as(s"dv_$c"))
    }
    def joinDv(base: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      dvLeaves.foldLeft(base)((b, d) =>
        if (groups.isEmpty) b.crossJoin(dvFrame(d.c)) // both one-row
        else b.join(dvFrame(d.c), groups, "left"))
    def dvCol(c: String): Column = coalesce(col(s"dv_$c"), lit(0L))
    val hasDistinct = outs.exists {
      case CalcOut(ls, _) => ls.exists(_.isInstanceOf[DistinctL])
      case _ => false
    }
    val slim =
      if (groups.toSet == vd.groupCols.toSet && !hasDistinct) {
        // exact match: one row per group already — leaves ARE view
        // columns (support columns joined in at the same grain),
        // outputs a pure projection of rebuilt trees
        def leafCol(l: AggLeaf): Column = l match {
          case CountL           => col("n_rows")
          case CountColL(c)     => col(s"nn_$c")
          case SumL(c)          => col(s"sum_$c")
          case SumSqL(c)        => col(s"ss_$c")
          case MinL(c)          => col(s"min_$c")
          case MaxL(c)          => col(s"max_$c")
          case DistinctValL(c)  => dvCol(c)
          // exact grain: one stored sketch per row — estimate directly
          case ApproxL(c) => graft.sources.Hll.estimateCol(
            col(graft.sources.Hll.colName(c)))
          case DistinctL(_) => throw new IllegalStateException(
            "group-column distinct outputs always take the rollup path")
        }
        joinDv(serve).select(outs.zipWithIndex.map {
          case (GroupOut(c), i)     => col(c).as(s"_mv_$i")
          case (CalcOut(ls, b), i)  => b(ls.map(leafCol)).as(s"_mv_$i")
        }: _*)
      } else {
        // subset rollup: each VIEW leaf re-aggregates ONCE (COUNT
        // re-sums n_rows / nn, SUM re-sums, MIN/MAX re-minimize) and
        // each SUPPORT leaf re-counts its distinct pairs at the query
        // grain, then every output tree rebuilds over the totals —
        // derived aggregates re-derive from sums, never from averages
        val viewLeaves = allLeaves.filterNot(_.isInstanceOf[DistinctValL])
        def leafAgg(l: AggLeaf): Column = l match {
          case CountL       => coalesce(sum(col("n_rows")), lit(0L))
          case CountColL(c) => coalesce(sum(col(s"nn_$c")), lit(0L))
          case SumL(c)      => sum(col(s"sum_$c"))
          case SumSqL(c)    => sum(col(s"ss_$c"))
          case MinL(c)      => min(col(s"min_$c"))
          case MaxL(c)      => max(col(s"max_$c"))
          case DistinctL(c) => count_distinct(col(c))
          // subset rollup: sketches MERGE per position (the register
          // max monoid) before ONE estimate — never summed estimates
          case ApproxL(c) => graft.sources.Hll.estimateCol(
            graft.sources.Hll.mergeAllCol(
              collect_list(col(graft.sources.Hll.colName(c)))))
          case DistinctValL(_) => throw new IllegalStateException(
            "support-table distinct leaves never aggregate the view")
        }
        val li = viewLeaves.zipWithIndex.toMap
        val grouped =
          if (viewLeaves.isEmpty && groups.nonEmpty)
            // aggregate-free GROUP BY (`SELECT g FROM t GROUP BY g`) or
            // distinct-only outputs: the live group tuples off the
            // view — via an EXPLICIT groupBy Aggregate, never
            // `.distinct()`: that lowers to a Deduplicate node, and the
            // optimizer batch that replaces Deduplicate with Aggregate
            // has ALREADY run by the time this rule fires, so embedding
            // one crashes planning with INTERNAL_ERROR
            serve.groupBy(groups.map(col): _*)
              .agg(count(lit(1)).as("_dd"))
              .select(groups.map(col): _*)
          else if (viewLeaves.isEmpty)
            // global distinct-only aggregate: the support frames below
            // are each one row — seed with a one-row zero-column frame
            spark.range(1).drop("id")
          else {
            val aggCols = viewLeaves.zipWithIndex.map { case (l, i) =>
              leafAgg(l).as(s"_lf_$i") }
            serve.groupBy(groups.map(col): _*)
              .agg(aggCols.head, aggCols.tail: _*)
          }
        joinDv(grouped).select(outs.zipWithIndex.map {
          case (GroupOut(c), i)    => col(c).as(s"_mv_$i")
          case (CalcOut(ls, b), i) =>
            b(ls.map {
              case DistinctValL(c) => dvCol(c)
              case l => col(s"_lf_${li(l)}")
            }).as(s"_mv_$i")
        }: _*)
      }
    val child = slim.queryExecution.analyzed
    Project(
      agg.aggregateExpressions.zip(child.output).map { case (orig, na) =>
        Alias(na, orig.name)(exprId = orig.exprId)
      }, child)
  }

  /** A candidate view's stored ROW estimate at its pinned snapshot —
    * the per-file `rows` stats summed over the Current-pruned files
    * (metadata-only, [[graft.sources.AzofRelation]]'s `estimatedRows`
    * reasoning). None when any file predates the stats generation
    * (`analyze` backfills) — estimate-less candidates rank LAST, so
    * the choice degrades to declaration order, never to a wrong pick.
    */
  private def viewRowsAt(
      lake: String, mv: String, viewV: Long): Option[Long] =
    try {
      val snap = graft.format.AzofTable(spark, lake, mv)
        .snapshot(viewV.toString)
      val entries = snap.dataFilesWithStats(graft.format.AsOf.Current)
      val counts = entries.flatMap(_.stats.flatMap(_.rows))
      if (counts.nonEmpty && counts.size == entries.size)
        Some(counts.sum)
      else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Try the single-table candidates against `agg`. `approxOk` admits
    * `approx_count_distinct` leaves — true only for
    * `spark.azof.mv.rewrite.approx` candidates.
    */
  private def singleHit(
      agg: Aggregate, cands: Seq[(String, String)], approxOk: Boolean)
      : Option[LogicalPlan] =
    srcOf(agg.child).flatMap { case (srcKey, conds, pinned) =>
      {
        cands.iterator.zipWithIndex.flatMap { case ((lake, mv), ci) =>
          defOf(spark, lake, mv).collect {
            case MvRewriteRule.SingleDef(sLake, sTable, vd, _) =>
              (sLake, sTable, vd)
          }.flatMap { case (sLake, sTable, vd) =>
            // derived buckets are UTC-defined: off a UTC session the
            // stored values and a re-evaluation can disagree — refuse
            if (vd.derivedGroups.nonEmpty &&
              spark.sessionState.conf.sessionLocalTimeZone != "UTC")
              None
            else {
            // bind against the LEAF relations' full outputs: a pruning
            // Project above the relation may have dropped the
            // expression's source columns from agg.child's output, but
            // pushed-down filter conjuncts still reference the
            // relation's attribute ids
            val dmMap = derivedCanon(vd, leafRelation(agg.child))
            val dm: Expression => Option[String] =
              e => dmMap.get(e.canonicalized)
            // a grouping expression is a plain view group column or a
            // derived bucket expression matched canonically
            val groupsOpt = traverse(agg.groupingExpressions.map {
              case a: AttributeReference
                if vd.groupCols.contains(a.name) => Some(a.name)
              case e => dm(e)
            })
            groupsOpt.flatMap { groups =>
            // groups may be EMPTY: a global aggregate rolls the whole
            // view up (one row out, exactly like SQL's global agg —
            // even over an empty corpus, where groupBy().agg matches
            // the one-row null/zero semantics)
            //
            // a FILTERED view additionally demands the query's WHERE
            // imply its membership predicate — matched conjuncts leave
            // the residue, which must then be group-servable as usual
            val residueOpt: Option[Seq[Expression]] = vd.filter match {
              case None => Some(conds)
              case Some(f) => viewFilterConjs(f, leafRelation(agg.child))
                .flatMap(matchViewFilter(conds, _))
            }
            residueOpt.flatMap { residue =>
            val conds2 = residue.map(substDerived(_, vd, dm))
            val covered =
              norm(sLake, sTable) == srcKey &&
                groups.forall(vd.groupCols.contains) &&
                conds2.forall(filterCovered(_, vd))
            if (!covered) None
            else traverse(agg.aggregateExpressions.map(
              outOf(_, vd, dm, approxOk)))
              .filter { outs =>
                // every plain group output must be a queried group
                outs.forall {
                  case GroupOut(c) => groups.contains(c); case _ => true }
              }
              .flatMap { outs =>
                // version-PINNED serve: execution reads exactly the
                // snapshots this freshness check validated — the VIEW's
                // and (when a distinct leaf reads it) the SUPPORT
                // table's, BOTH pinned inside the gate before its
                // view-preserving walk ([[MatView.freshViewVersions]]'s
                // ordering argument), so a refresh racing between
                // optimization and execution can neither swap a stale
                // view under the plan nor mix view totals with support
                // pairs from a later batch. A `VERSION AS OF` read
                // gates through the pinned walk — the view serves the
                // pin only when live(pin) provably equals the view's
                // consumed state.
                val needDv = outs.exists {
                  case CalcOut(ls, _) =>
                    ls.exists(_.isInstanceOf[DistinctValL])
                  case _ => false
                }
                val needSk = outs.exists {
                  case CalcOut(ls, _) => ls.exists(_.isInstanceOf[ApproxL])
                  case _ => false
                }
                MatView.freshViewVersions(
                  spark, sLake, sTable, lake, mv, pinned, needDv)
                  .map { case (viewV, dvV) =>
                    logInfo(s"rewriting aggregate over $srcKey" +
                      pinned.fold("")(p => s" AS OF $p") +
                      s" to materialized view $mv@$viewV")
                    val dvPairs: String => org.apache.spark.sql.DataFrame =
                      c => MatView.serveDistinctPairs(spark, lake, mv, vd,
                        c, dvV)
                    (viewRowsAt(lake, mv, viewV), ci,
                      rewrite(agg,
                        MatView.serve(spark, lake, mv, vd, Some(viewV),
                          withSketches = needSk),
                        vd, groups, outs, conds2, dvPairs))
                  }
              }
            }
            }
            }
          }
          // COST-BASED choice among covering candidates: serve from
          // the SMALLEST stored grain (row-stats estimate at the
          // pinned snapshot) — a coarse view answers a coarse query
          // with fewer rows than a rollup from a finer one; ties and
          // estimate-less candidates keep declaration order
        }.toSeq.minByOption { case (est, ci, _) =>
          (est.getOrElse(Long.MaxValue), ci.toLong) }.map(_._3)
      }
    }

  /** Try the join-view candidates against `agg` ([[singleHit]]'s star
    * twin — `approxOk` admits `approx_count_distinct` leaves for
    * approx-conf candidates).
    */
  /** Match the query's joined dim sides (incl. snowflake subs) against
    * a candidate join view's declared dim tree and FLATTENED location
    * list. Every declared dim must match exactly one joined side by fk
    * column + table, and — one hop down — every declared SUB one of
    * that side's sub-joins by dim-side fk + table, with NO extra
    * joined subs (an un-declared inner sub-join changes the row set,
    * so the view's totals would not answer the query). Returns the
    * dim-attribute PROVENANCE map (column name → owning relation
    * output) and the flattened per-table pin vector
    * ([[graft.sources.JoinView.freshViewVersions]]'s order).
    */
  private def matchDims(
      dimSides: Seq[DimSide], d: MvRewriteRule.JoinDef)
      : Option[(Map[String, Seq[Attribute]],
        Seq[Option[graft.sources.ReadPin]])] = {
    val jdef = d.jdef
    val sideByFk = dimSides.map(s => s.fkName -> s).toMap
    if (dimSides.size != jdef.dims.size ||
      sideByFk.size != dimSides.size) None
    else {
      val per = jdef.dims.zipWithIndex.map { case (dj, i) =>
        val off = jdef.flatOffset(i)
        val (dl, dt) = d.dims(off)
        sideByFk.get(dj.fkCol)
          .filter(_.dimKey == norm(dl, dt))
          .flatMap { side =>
            val subByFk = side.subs.map(s => s.fkName -> s).toMap
            if (side.subs.size != dj.subs.size ||
              subByFk.size != side.subs.size) None
            else {
              val subM = dj.subs.zipWithIndex.map { case (s, j) =>
                val (sl, st) = d.dims(off + 1 + j)
                subByFk.get(s.fkCol).filter(_.dimKey == norm(sl, st))
                  .map(sub => (s, sub))
              }
              if (subM.exists(_.isEmpty)) None
              else Some((dj, side, subM.flatten))
            }
          }
      }
      if (per.exists(_.isEmpty)) None
      else {
        val matched = per.flatten
        val outOfDim: Map[String, Seq[Attribute]] =
          matched.flatMap { case (dj, side, subM) =>
            dj.dimCols.map(c => c -> side.dimOut) ++
              subM.flatMap { case (s, sub) =>
                s.dimCols.map(c => c -> sub.dimOut) }
          }.toMap
        val pins = matched.flatMap { case (_, side, subM) =>
          Seq(side.pin) ++ subM.map(_._2.pin) }
        Some((outOfDim, pins))
      }
    }
  }

  private def joinHit(
      agg: Aggregate, cands: Seq[(String, String)], approxOk: Boolean)
      : Option[LogicalPlan] =
    joinSrcOf(agg.child).flatMap {
      case (factKey, factPin, dimSides, conds, factOut) =>
        {
          cands.iterator.zipWithIndex.flatMap { case ((lake, mv), ci) =>
            defOf(spark, lake, mv).collect {
              case d: MvRewriteRule.JoinDef => d
            }.flatMap { d =>
              val jdef = d.jdef
              if (jdef.derivedGroups.nonEmpty &&
                spark.sessionState.conf.sessionLocalTimeZone != "UTC")
                None
              else {
              val vd = ViewDef(jdef.groupCols, jdef.sumCols,
                jdef.minMaxCols, jdef.distinctCols, jdef.derivedGroups,
                jdef.distinctTuples, jdef.approxCols,
                varCols = jdef.varCols)
              val dmMap = derivedCanon(vd, leafRelation(agg.child))
              val dm: Expression => Option[String] =
                e => dmMap.get(e.canonicalized)
              val groupsOpt = traverse(agg.groupingExpressions.map {
                case a: AttributeReference
                  if vd.groupCols.contains(a.name) => Some(a.name)
                case e => dm(e)
              })
              groupsOpt.flatMap { groups =>
              // each declared dim (and, one hop down, each declared
              // snowflake sub) matches exactly one joined side: same
              // fk column, same table (order-insensitive — the query
              // may join in any order)
              val matched = matchDims(dimSides, d)
              // attribute PROVENANCE: every referenced column must live
              // on the side its name claims — a fact column shadowing a
              // dim group column's name (or vice versa) refuses
              def provenanced: Boolean = matched.exists {
                case (outOfDim, _) =>
                  val refs = (agg.groupingExpressions ++
                    agg.aggregateExpressions ++ conds)
                    .flatMap(_.references)
                  refs.forall(a =>
                    outOfDim.get(a.name) match {
                      case Some(dOut) => dOut.exists(_.exprId == a.exprId)
                      case None => factOut.exists(_.exprId == a.exprId)
                    })
              }
              // the filtered-view gate, singleHit's reasoning — the
              // PROVENANCE check below still runs over the ORIGINAL
              // conjunct list (matched conjuncts reference real
              // columns too)
              val residueOpt: Option[Seq[Expression]] =
                jdef.filter match {
                  case None => Some(conds)
                  case Some(f) =>
                    viewFilterConjs(f, leafRelation(agg.child))
                      .flatMap(matchViewFilter(conds, _))
                }
              residueOpt.flatMap { residue =>
              val conds2 = residue.map(substDerived(_, vd, dm))
              val covered =
                norm(d.factLake, d.factTable) == factKey &&
                  matched.isDefined &&
                  groups.forall(vd.groupCols.contains) &&
                  conds2.forall(filterCovered(_, vd)) &&
                  provenanced
              if (!covered) None
              else traverse(
                agg.aggregateExpressions.map(outOf(_, vd, dm, approxOk)))
                .filter { outs =>
                  outs.forall {
                    case GroupOut(c) => groups.contains(c); case _ => true }
                }
                .flatMap { outs =>
                  // per-table pins, FLATTENED in the declared pre-order
                  // (query join order ↛ jdef dim order: aligned by fk
                  // inside matchDims); a pinned table gates through the
                  // pinned walk, an un-pinned one through the cursor —
                  // and the gate pins view + support snapshots BEFORE
                  // its walks (the TOCTOU close, single-table reasoning)
                  val dimPins = matched.get._2
                  val needDv = outs.exists {
                    case CalcOut(ls, _) =>
                      ls.exists(_.isInstanceOf[DistinctValL])
                    case _ => false
                  }
                  val needSk = outs.exists {
                    case CalcOut(ls, _) =>
                      ls.exists(_.isInstanceOf[ApproxL])
                    case _ => false
                  }
                  graft.sources.JoinView.freshViewVersions(spark,
                    d.factLake, d.factTable, d.dims, lake, mv,
                    factPin, dimPins, needDv)
                    .map { case (viewV, dvV) =>
                      logInfo(s"rewriting star aggregate over $factKey ⋈ " +
                        s"${d.dims.map(x => norm(x._1, x._2)).mkString(" ⋈ ")} " +
                        s"to join view $mv@$viewV")
                      val dvPairs: String => org.apache.spark.sql.DataFrame =
                        c => graft.sources.JoinView.serveDistinctPairs(
                          spark, lake, mv, jdef, c, dvV)
                      (viewRowsAt(lake, mv, viewV), ci,
                        rewrite(agg,
                          graft.sources.JoinView.serve(spark, lake, mv,
                            jdef, Some(viewV), withSketches = needSk),
                          vd, groups, outs, conds2, dvPairs))
                    }
                }
              }
              }
              }
            }
            // the cost-based choice, singleHit's reasoning
          }.toSeq.minByOption { case (est, ci, _) =>
            (est.getOrElse(Long.MaxValue), ci.toLong) }.map(_._3)
        }
    }

  /** Try the HISTOGRAM shape against the single-table candidates:
    * `GROUP BY [group cols…,] <ONE declared distinct column>` with
    * `COUNT(*)`-only aggregates — the high-cardinality value histogram
    * (`SELECT b, count(*) FROM t GROUP BY b`) — served from the
    * refcounted support pairs plus the view's row totals
    * ([[MatView.valueHistogram]]), INCLUDING the NULL value bucket
    * (`Σ n_rows − Σ ref`), with the stored canonical-string value cast
    * back to the query column's type. WHERE predicates may touch only
    * view GROUP columns (a predicate on the distinct column itself
    * refuses). Version-pinned reads gate through the pinned walk and
    * pin both index snapshots, like every other rewrite path.
    */
  private sealed trait HOut
  private case class HGroup(c: String) extends HOut
  private case class HCalc(
      leaves: Seq[AggLeaf], b: Seq[Column] => Column) extends HOut

  /** The histogram's VALUE key: one declared distinct column, or a
    * declared TUPLE (the multi-column histogram `GROUP BY cat, sub` —
    * components in DECLARED order, the pairs' encoding order, each
    * with its query attribute for the split-back cast).
    */
  private sealed trait HKey { def dcol: String }
  private case class HSingle(a: AttributeReference) extends HKey {
    def dcol: String = a.name
  }
  private case class HTuple(
      dcol: String, comps: Seq[AttributeReference]) extends HKey

  /** Match the histogram SHAPE against one candidate: grouping columns
    * are view group columns plus exactly ONE declared distinct column,
    * outputs are those columns or expression trees over the PAIR-GRAIN
    * leaves — `COUNT(*)` (Σ ref), and `SUM(c)` / `COUNT(c)` / `AVG(c)`
    * for declared sum columns (the support rows carry per-pair
    * `sum_<c>`/`nn_<c>` totals — the measure-per-value dashboard,
    * `SELECT b, sum(revenue) … GROUP BY b`, served corpus-free).
    * MIN/MAX and distinct leaves refuse (no pair-grain totals exist
    * for them). Filter conjuncts touch only group columns (never the
    * value column). Returns
    * `(value attr, other groups, outputs, measure columns read)`.
    */
  private def histShape(
      agg: Aggregate, vd: ViewDef, conds: Seq[Expression],
      tupleNullOk: Boolean)
      : Option[(HKey, Seq[String], Seq[HOut],
        Seq[String])] =
    traverse(agg.groupingExpressions.map {
      case a: AttributeReference
        if vd.groupCols.contains(a.name) ||
          vd.distinctCols.contains(a.name) ||
          vd.distinctTuples.exists(_.contains(a.name)) => Some(a)
      case _ => None
    }).flatMap { attrs =>
      val nonGroup = attrs.filterNot(a => vd.groupCols.contains(a.name))
      val keyOpt: Option[HKey] =
        if (nonGroup.size == 1 &&
          vd.distinctCols.contains(nonGroup.head.name))
          Some(HSingle(nonGroup.head))
        else if (nonGroup.size >= 2 &&
          nonGroup.map(_.name).distinct.size == nonGroup.size)
          // the MULTI-COLUMN histogram: the non-group keys form
          // exactly a declared tuple (any order). A NULLABLE component
          // serves only from a format-3 support table (tupleNullOk):
          // SQL's GROUP BY keeps partial-null rows, which format-3
          // pairs carry NULL-token-marked and older pairs omit — the
          // pre-upgrade encoding silently falls back to the scan here
          // (the loud rebuild message lives on the refresh/direct
          // serve paths, MatView.requireTupleLayout)
          vd.distinctTuples
            .find(_.sorted == nonGroup.map(_.name).sorted)
            .filter(_ => tupleNullOk || nonGroup.forall(!_.nullable))
            .map(t => HTuple(t.mkString(","),
              t.map(n => nonGroup.find(_.name == n).get)))
        else None
      keyOpt.flatMap { key =>
        val groups = attrs.map(_.name)
          .filterNot(n => nonGroup.exists(_.name == n))
        val condsOk = conds.forall(c => filterCovered(c, vd) &&
          !c.references.exists(a => nonGroup.exists(_.name == a.name)))
        def pairServable(l: AggLeaf): Boolean = l match {
          case CountL => true
          case SumL(c) => vd.sumCols.contains(c)
          case CountColL(c) => vd.sumCols.contains(c)
          case _ => false // min/max/distinct: no pair-grain totals
        }
        if (!condsOk) None
        else traverse(agg.aggregateExpressions.map {
          case a: AttributeReference
            if attrs.exists(_.name == a.name) =>
            Some(HGroup(a.name): HOut)
          case al: Alias => al.child match {
            case a: AttributeReference
              if attrs.exists(_.name == a.name) =>
              Some(HGroup(a.name): HOut)
            case e => calcOf(e, vd)
              .filter { case (ls, _) => ls.forall(pairServable) }
              .map { case (ls, b) => HCalc(ls, b): HOut }
          }
          case _ => None
        }).map { outs =>
          val measures = outs.flatMap {
            case HCalc(ls, _) => ls.collect {
              case SumL(c) => c
              case CountColL(c) => c
            }
            case _ => Nil
          }.distinct
          (key, groups, outs, measures)
        }
      }
    }

  /** Project the served histogram frame back onto the aggregate's
    * output ids (value cast to the query column's type).
    */
  private def histProject(
      agg: Aggregate, hist: org.apache.spark.sql.DataFrame,
      key: HKey, outs: Seq[HOut]): LogicalPlan = {
    def leafCol(l: AggLeaf): Column = l match {
      case CountL       => col("n_rows")
      case SumL(c)      => col(s"sum_$c")
      case CountColL(c) => col(s"nn_$c")
      case other => throw new IllegalStateException(
        s"histogram shape admitted a non-pair-servable leaf $other")
    }
    // a key-component output splits the encoded value back into its
    // typed component (declared tuple order = the encoding order;
    // limit -1 keeps empty-string components; element_at is 1-based)
    def keyCol(c: String): Option[Column] = key match {
      case HSingle(a) if a.name == c =>
        Some(col("value").cast(a.dataType))
      case HTuple(_, comps) =>
        comps.zipWithIndex.collectFirst {
          case (a, i) if a.name == c =>
            // the reserved NULL token decodes back to a typed NULL —
            // partial-null GROUP BY rows round-trip through the pairs
            val raw =
              element_at(split(col("value"), "\\u0001", -1), i + 1)
            when(raw === MatView.TupleNullTok,
              lit(null).cast(a.dataType))
              .otherwise(raw.cast(a.dataType))
        }
      case _ => None
    }
    val slim = hist.select(outs.zipWithIndex.map {
      case (HGroup(c), i) =>
        keyCol(c).getOrElse(col(c)).as(s"_mv_$i")
      case (HCalc(ls, b), i) =>
        b(ls.map(leafCol)).as(s"_mv_$i")
    }: _*)
    val child = slim.queryExecution.analyzed
    Project(
      agg.aggregateExpressions.zip(child.output).map { case (orig, na) =>
        Alias(na, orig.name)(exprId = orig.exprId)
      }, child)
  }

  private def histHit(
      agg: Aggregate, cands: Seq[(String, String)])
      : Option[LogicalPlan] =
    srcOf(agg.child).flatMap { case (srcKey, conds, pinned) =>
      cands.iterator.flatMap { case (lake, mv) =>
        defOf(spark, lake, mv).collect {
          case MvRewriteRule.SingleDef(sLake, sTable, vd, fmt) =>
            (sLake, sTable, vd, fmt)
        }.flatMap { case (sLake, sTable, vd, fmt) =>
          // a FILTERED view's support pairs cover member rows only —
          // the histogram paths don't reason about predicate
          // implication (yet), so filtered candidates refuse here
          if (norm(sLake, sTable) != srcKey || vd.filter.nonEmpty) None
          else histShape(agg, vd, conds,
            tupleNullOk = fmt >= MatView.TupleNullFormat).flatMap {
            case (key, groups, outs, measures) =>
              // the gate pins view AND support snapshots before its
              // walk (the TOCTOU close — a histogram always reads both)
              MatView.freshViewVersions(
                spark, sLake, sTable, lake, mv, pinned, needDv = true)
                .filter { case (_, dvV) =>
                  // a measure histogram over a support table built by
                  // a pre-measure binary SILENTLY falls back to the
                  // scan (the loud rebuild message lives on the
                  // refresh path) — never an unresolved-column crash
                  // inside the optimizer
                  measures.isEmpty || dvV.exists(v =>
                    MatView.dvLayoutOk(
                      graft.format.AzofTable(spark, lake,
                        MatView.dvTableName(mv)).snapshot(v.toString)
                        .schema, measures))
                }
                .map { case (viewV, dvV) =>
                  logInfo(s"rewriting histogram aggregate over $srcKey " +
                    s"to support pairs of $mv@$viewV")
                  // group-col predicates slice the pair/total frames
                  // INSIDE the histogram (they may reference view group
                  // columns outside the queried grain)
                  histProject(agg,
                    MatView.valueHistogram(spark, lake, mv, vd,
                      key.dcol, groups, Some(viewV), dvV,
                      measures = measures, slice = conds),
                    key, outs)
                }
          }
        }
      }.nextOption()
    }

  /** [[histHit]]'s STAR twin: the histogram shape over a covered
    * `fact ⋈ dims` tree serves from the join view's support pairs +
    * row totals — with the same dim-matching, attribute-provenance,
    * and per-table pin gates as [[joinHit]].
    */
  private def joinHistHit(
      agg: Aggregate, cands: Seq[(String, String)])
      : Option[LogicalPlan] =
    joinSrcOf(agg.child).flatMap {
      case (factKey, factPin, dimSides, conds, factOut) =>
        cands.iterator.flatMap { case (lake, mv) =>
          defOf(spark, lake, mv).collect {
            case d: MvRewriteRule.JoinDef => d
          }.flatMap { d =>
            val jdef = d.jdef
            val vd = ViewDef(jdef.groupCols, jdef.sumCols,
              jdef.minMaxCols, jdef.distinctCols, jdef.derivedGroups,
              jdef.distinctTuples, jdef.approxCols,
              varCols = jdef.varCols)
            val matched = matchDims(dimSides, d)
            def provenanced: Boolean = matched.exists {
              case (outOfDim, _) =>
                val refs = (agg.groupingExpressions ++
                  agg.aggregateExpressions ++ conds).flatMap(_.references)
                refs.forall(a =>
                  outOfDim.get(a.name) match {
                    case Some(dOut) => dOut.exists(_.exprId == a.exprId)
                    case None => factOut.exists(_.exprId == a.exprId)
                  })
            }
            if (norm(d.factLake, d.factTable) != factKey ||
              matched.isEmpty || !provenanced || jdef.filter.nonEmpty)
              None
            else histShape(agg, vd, conds,
              tupleNullOk = d.fmt >= MatView.TupleNullFormat).flatMap {
              case (key, groups, outs, measures) =>
                val dimPins = matched.get._2
                // both index snapshots pinned inside the gate, before
                // its per-table walks (the TOCTOU close)
                graft.sources.JoinView.freshViewVersions(spark,
                  d.factLake, d.factTable, d.dims, lake, mv,
                  factPin, dimPins, needDv = true)
                  .filter { case (_, dvV) =>
                    // pre-measure support layout → silent scan fallback
                    measures.isEmpty || dvV.exists(v =>
                      MatView.dvLayoutOk(
                        graft.format.AzofTable(spark, lake,
                          MatView.dvTableName(mv)).snapshot(v.toString)
                          .schema, measures))
                  }
                  .map { case (viewV, dvV) =>
                    logInfo(s"rewriting star histogram over $factKey " +
                      s"to support pairs of $mv@$viewV")
                    histProject(agg,
                      graft.sources.JoinView.valueHistogram(spark, lake,
                        mv, jdef, key.dcol, groups, Some(viewV),
                        dvV, measures = measures, slice = conds),
                      key, outs)
                  }
            }
          }
        }.nextOption()
    }

  /** The optimizer extracts non-trivial grouping expressions into a
    * child Project (`_groupingexpression#N`) before this rule sees the
    * Aggregate — inline those aliases back into the grouping/output
    * trees so a derived-bucket query matches the view's expression.
    * Output Alias exprIds survive the transform, so the replacement
    * plan still lines up with parents. Returns `agg` unchanged when
    * the child isn't that shape (or inlining would unname an output).
    */
  private def inlineChildProject(agg: Aggregate): Aggregate =
    agg.child match {
      case p: Project
        if p.projectList.exists(!_.isInstanceOf[Attribute]) &&
          p.projectList.forall(ne =>
            ne.isInstanceOf[Attribute] ||
              (ne.isInstanceOf[Alias] && ne.deterministic)) =>
        val subst: Map[Long, Expression] = p.projectList.collect {
          case a: Alias => a.exprId.id -> a.child }.toMap
        def inline(e: Expression): Expression = e.transformUp {
          case ar: AttributeReference if subst.contains(ar.exprId.id) =>
            subst(ar.exprId.id)
        }
        val g2 = agg.groupingExpressions.map(inline)
        val o2 = agg.aggregateExpressions.map(inline)
        if (o2.forall(_.isInstanceOf[NamedExpression]))
          Aggregate(g2, o2.map(_.asInstanceOf[NamedExpression]), p.child)
        else agg
      case _ => agg
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val cands = candidates
    val aCands = approxCandidates
    if (cands.isEmpty && aCands.isEmpty) plan
    else plan.transformUp {
      case agg0: Aggregate =>
        val agg = inlineChildProject(agg0)
        if (srcOf(agg.child).isDefined || joinSrcOf(agg.child).isDefined) {
          // exact-conf candidates first (never with approx leaves: an
          // exact-conf view must never change an approx aggregate's
          // result), then the opt-in approx-conf candidates — which
          // also serve pure-exact shapes (exact serves are exact
          // regardless of which conf named the view)
          singleHit(agg, cands, approxOk = false)
            .orElse(joinHit(agg, cands, approxOk = false))
            .orElse(singleHit(agg, aCands, approxOk = true))
            .orElse(joinHit(agg, aCands, approxOk = true))
            .orElse(histHit(agg, (cands ++ aCands).distinct))
            .orElse(joinHistHit(agg, (cands ++ aCands).distinct))
            .getOrElse(agg0)
        } else agg0
    }
  }

  private def traverse[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None
}

object MvRewriteRule {

  /** A registered candidate's definition — single-table or join. */
  private sealed trait CandDef { def fmt: Int }
  private final case class SingleDef(
      srcLake: String, srcTable: String, vd: ViewDef, fmt: Int)
    extends CandDef
  private final case class JoinDef(
      factLake: String, factTable: String,
      dims: Seq[(String, String)],
      jdef: graft.sources.JoinViewDef, fmt: Int) extends CandDef

  /** View definitions are immutable per table — cache them once READ.
    * A miss is NEVER cached: the sidecar may simply not exist YET (the
    * user sets the conf, queries once, then creates the view — the
    * interactive flow this feature targets), and re-probing a missing
    * candidate is one cheap `fs.exists` per query on an opt-in path.
    * A view TABLE whose layout predates its declared measures (a
    * pre-nn_ binary's table offered to this binary) is never a
    * candidate: the rewrite silently falls back to the scan instead of
    * throwing an unresolved-column error inside the optimizer — the
    * loud "rebuild required" message lives on the direct serve/refresh
    * path ([[MatView.requireNnLayout]]).
    */
  private val defCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), CandDef]()

  /** Drop one view's cached definition — called by the SQL
    * `DROP MATERIALIZED VIEW` path so a dropped view stops being a
    * candidate immediately (the freshness gate would refuse it anyway
    * once its files are gone, but re-probing a deleted sidecar every
    * query is wasted I/O).
    */
  private[graft] def invalidateDef(lake: String, mv: String): Unit = {
    defCache.remove((lake, mv)); ()
  }

  /** AUTO-DISCOVERED candidate view tables per lake: child directories
    * carrying a definition sidecar (one `listStatus` + two `exists`
    * probes per child), cached per session with the defCache's
    * re-probe semantics — an EMPTY result is never cached (the user
    * sets `auto`, queries once, THEN creates the view — the
    * interactive flow), and [[invalidateAuto]] drops the entry when
    * this session creates another view in the lake. A cached listing
    * carries the lake DIRECTORY's modification time as a staleness
    * hint: creating (or dropping) a view table adds/removes a child of
    * the lake root, which bumps the directory mtime on every Hadoop
    * filesystem with real directories — so a view created by a
    * DIFFERENT process is picked up on the next query at the cost of
    * one `getFileStatus` per query (no re-list while the mtime holds).
    * A filesystem that doesn't surface directory mtimes (object-store
    * shims) degrades to the old session-cached behavior, never to a
    * wrong answer — discovery feeds candidacy only; freshness is
    * gated downstream per view.
    */
  private val autoCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Seq[String])]()

  /** Drop `lake`'s cached auto-discovery listing — called by
    * [[graft.sources.MatView.create]] / [[graft.sources.JoinView
    * .create]] so a view created in this session rewrites immediately
    * under `spark.azof.mv.rewrite=auto`.
    */
  private[graft] def invalidateAuto(lake: String): Unit = {
    autoCache.remove(new Path(lake).toString); ()
  }

  /** TEST HOOK: plant a cached listing with an arbitrary mtime stamp,
    * simulating the cross-process create the staleness hint exists for
    * (in-process creates invalidate the cache directly, so the stale
    * state is otherwise unreachable from a single-JVM spec).
    */
  private[graft] def primeAutoCacheForTest(
      lake: String, mtime: Long, names: Seq[String]): Unit = {
    autoCache.put(new Path(lake).toString, (mtime, names)); ()
  }

  private def discover(
      spark: SparkSession, lake: String): Seq[String] = {
    val key = new Path(lake).toString
    val root = new Path(lake)
    // the staleness hint: the lake dir's mtime moves when a child
    // table dir is created/removed; unreadable → 0 (both at cache and
    // probe time, so the comparison still short-circuits the re-list)
    def rootMtime: Long =
      try root.getFileSystem(spark.sessionState.newHadoopConf())
        .getFileStatus(root).getModificationTime
      catch { case scala.util.control.NonFatal(_) => 0L }
    val cached = Option(autoCache.get(key))
    val mt = rootMtime
    cached.filter(_._1 == mt).map(_._2).getOrElse {
      val found =
        try {
          val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
          if (!fs.exists(root)) Seq.empty[String]
          else fs.listStatus(root).toSeq.filter(_.isDirectory)
            .map(_.getPath)
            .filter(d =>
              fs.exists(new Path(d, MatView.DefFileName)) ||
                fs.exists(new Path(d,
                  graft.sources.JoinView.DefFileName)))
            .map(_.getName).sorted
        } catch {
          case scala.util.control.NonFatal(_) => Seq.empty[String]
        }
      if (found.nonEmpty) autoCache.put(key, (mt, found))
      found
    }
  }

  private def defOf(spark: SparkSession, lake: String, mv: String)
      : Option[CandDef] =
    Option(defCache.get((lake, mv))).orElse {
      def fmtOf: Int = MatView.defFormat(spark, lake, mv)
      val read =
        try MatView.readDef(spark, lake, mv)
          .map { case (sl, st, vd) => SingleDef(sl, st, vd, fmtOf) }
          .filter { case SingleDef(_, _, vd, fmt) =>
            val schema = graft.format.AzofTable(spark, lake, mv)
              .currentSnapshot.schema
            // a filter-bearing def under a pre-filter stamp was
            // maintained ignoring the predicate — silent scan fallback
            (vd.filter.isEmpty || fmt >= MatView.FilterFormat) &&
            MatView.nnLayoutOk(schema, vd.sumCols) &&
              // a view declaring approx columns whose TABLE predates
              // the hll_ sketch layout refuses candidacy (silent scan
              // fallback — the loud rebuild message lives on the
              // direct serve/refresh path, requireHllLayout); variance
              // columns gate on the ss_ layout identically
              MatView.hllLayoutOk(schema, vd.approxCols) &&
              MatView.ssLayoutOk(schema, vd.varCols) &&
              (!vd.hasDistinct ||
                scala.util.Try(graft.format.AzofTable(spark, lake,
                  MatView.dvTableName(mv)).currentVersion).isSuccess)
          }
          // an old-format join sidecar THROWS in readDef (the loud
          // upgrade message) — caught here, so the query falls back to
          // the scan rather than crashing in the optimizer; a declared
          // distinct column without its support table likewise refuses
          // candidacy instead of failing inside the rule
          .orElse(graft.sources.JoinView.readDef(spark, lake, mv)
            .map { case (fl, ft, ds, jd) => JoinDef(fl, ft, ds, jd, fmtOf) }
            .filter(jd =>
              (jd.jdef.filter.isEmpty ||
                jd.fmt >= MatView.FilterFormat) &&
                // a subs-bearing def under a pre-snowflake stamp was
                // maintained ignoring the subs — silent scan fallback
                (!jd.jdef.hasSubs ||
                  jd.fmt >= graft.sources.JoinView.SubDimFormat) && {
                  val schema = graft.format.AzofTable(spark, lake, mv)
                    .currentSnapshot.schema
                  MatView.hllLayoutOk(schema, jd.jdef.approxCols) &&
                    MatView.ssLayoutOk(schema, jd.jdef.varCols)
                } &&
                (!jd.jdef.hasDistinct ||
                  scala.util.Try(graft.format.AzofTable(spark, lake,
                    MatView.dvTableName(mv)).currentVersion).isSuccess)))
        catch { case scala.util.control.NonFatal(_) => None }
      read.foreach(defCache.put((lake, mv), _))
      read
    }
}
