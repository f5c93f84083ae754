package graft.plans

import graft.format.AsOf
import java.time.Instant
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

/** Native Spark SQL surface for azof tables — the Catalyst counterpart of
  * the reference's DataFusion `AT(...)` / `FOR SYSTEM_TIME AS OF` dialect
  * rewrite (reference: crates/azof-datafusion/src/parse.rs:17-118,
  * context.rs:26-47). Register via
  * `spark.sql.extensions=graft.plans.AzofExtensions` (or
  * `.withExtensions`), point `spark.azof.path` at a lakehouse root, and:
  *
  *   SELECT ... FROM azof.financials TIMESTAMP AS OF '2019-01-17T00:00:00Z'
  *   SELECT ... FROM azof.tbl VERSION AS OF 2     -- snapshot id
  *   SELECT ... FROM azof.tbl                     -- current
  *
  * Where the reference mutates the sqlparser AST and registers one
  * provider per (table, asOf) pair, here Spark's parser already yields
  * `RelationTimeTravel`/`UnresolvedRelation` nodes and a resolution rule
  * swaps in the analyzed as-of scan plan, so the full Catalyst optimizer
  * (pushdown, join planning, AQE) composes above it untouched.
  */
class AzofExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // The rewrite runs at PARSE time (like the reference's sqlparser AST
    // mutation), not only as a resolution rule: "azof" is also the
    // registered DataFrameReader short name, and Spark's built-in
    // ResolveSQLOnFile claims any unresolved 2-part `azof.<t>` identifier
    // for direct-file-query resolution — and rejects it (the source is
    // not a FileFormat) — BEFORE injected resolution rules get a look.
    e.injectParser((session, delegate) => new AzofSqlParser(session, delegate))
    // Safety net for UnresolvedRelation nodes that bypass the parser
    // (e.g. plans assembled programmatically) — inert when the parser
    // already rewrote the relation.
    e.injectResolutionRule(session => AzofSqlRule(session))
    // Automatic materialized-view rewrite (opt-in via
    // spark.azof.mv.rewrite; see MvRewriteRule) — an optimizer rule so
    // it sees analyzed aggregates on BOTH scan surfaces before DSv2
    // pushdown planning.
    e.injectOptimizerRule(session => MvRewriteRule(session))
    ()
  }
}

/** Delegating parser that applies [[AzofSqlRule]] to every freshly parsed
  * plan, so `azof.<table>` (with optional TIMESTAMP/VERSION AS OF)
  * becomes the analyzed as-of scan before the analyzer ever sees it.
  */
final class AzofSqlParser(
    spark: SparkSession,
    delegate: org.apache.spark.sql.catalyst.parser.ParserInterface)
  extends org.apache.spark.sql.catalyst.parser.ParserInterface {

  /** MATERIALIZED VIEW DDL (CREATE/REFRESH/DROP — [[ViewDdl]]) is
    * intercepted before the delegate: Spark's grammar has no such
    * statements, and the reference's precedent is exactly this kind of
    * pre-parse SQL dialect extension (its `AT(...)` rewrite mutates
    * the sqlparser AST before DataFusion plans —
    * crates/azof-datafusion/src/parse.rs:17-118).
    */
  override def parsePlan(sqlText: String): LogicalPlan =
    ViewDdl.parse(sqlText).getOrElse(
      AzofSqlRule(spark)(delegate.parsePlan(sqlText)))

  override def parseQuery(sqlText: String): LogicalPlan =
    AzofSqlRule(spark)(delegate.parseQuery(sqlText))

  override def parseExpression(sqlText: String) =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String) =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String) =
    delegate.parseRoutineParam(sqlText)
}

final case class AzofSqlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val catalogName = "azof"

  private def lakehousePath: Option[String] =
    spark.conf.getOption("spark.azof.path")

  private def azofTableName(u: UnresolvedRelation): Option[(String, String)] =
    (u.multipartIdentifier, lakehousePath) match {
      case (Seq(c, t), Some(root)) if c.equalsIgnoreCase(catalogName) =>
        Some((root, t))
      case _ => None
    }

  private def exists(root: String, table: String): Boolean = {
    val dir = new Path(new Path(root, table), "version.txt")
    dir.getFileSystem(spark.sessionState.newHadoopConf()).exists(dir)
  }

  /** Evaluate the (foldable) time-travel timestamp to an Instant, in the
    * session time zone — mirrors Spark's own time-travel spec handling.
    */
  private def toInstant(e: Expression): Option[Instant] =
    if (!e.foldable) None
    else Option(Cast(e, TimestampType,
        Some(spark.sessionState.conf.sessionLocalTimeZone)).eval(null))
      .map(micros => Instant.ofEpochSecond(
        Math.floorDiv(micros.asInstanceOf[Long], 1000000L),
        Math.floorMod(micros.asInstanceOf[Long], 1000000L) * 1000L))

  /** Rewritten relations route through the V1 `azof` DataFrameReader
    * relation — the SAME `PrunedFilteredScan` every surface shares — so
    * WHERE predicates reach `AzofRelation.buildScan` and key predicates
    * prune files via the snapshot's stats (data skipping), exactly as
    * they do for `spark.read.format("azof")` and the DSv2 catalog.
    * (Inlining the scan plan here would fix the file list before any
    * filter is known.)
    */
  private def scanPlan(root: String, table: String, asOf: AsOf): LogicalPlan = {
    val r0 = spark.read.format("azof").option("table", table)
    val r1 = asOf match {
      case AsOf.Current      => r0
      case AsOf.EventTime(t) => r0.option("asOf", t.toString)
    }
    r1.load(root).queryExecution.analyzed
  }

  private def snapshotPlan(root: String, table: String, version: String): LogicalPlan =
    spark.read.format("azof").option("table", table)
      .option("versionAsOf", version)
      .load(root).queryExecution.analyzed

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case RelationTimeTravel(u: UnresolvedRelation, Some(ts), None) if {
        azofTableName(u).exists { case (r, t) => exists(r, t) } &&
          toInstant(ts).isDefined } =>
      val (root, table) = azofTableName(u).get
      scanPlan(root, table, AsOf.EventTime(toInstant(ts).get))

    case RelationTimeTravel(u: UnresolvedRelation, None, Some(version)) if
        azofTableName(u).exists { case (r, t) => exists(r, t) } =>
      val (root, table) = azofTableName(u).get
      snapshotPlan(root, table, version)

    case u: UnresolvedRelation if
        azofTableName(u).exists { case (r, t) => exists(r, t) } =>
      val (root, table) = azofTableName(u).get
      scanPlan(root, table, AsOf.Current)
  }
}
