package graft.cli

import graft.format._
import graft.operators.AzofScan
import graft.sources.CsvGen
import java.time.{Instant, LocalDateTime, ZoneOffset}
import org.apache.spark.sql.SparkSession

/** CLI parity with the reference's azof-cli (reference:
  * crates/azof-cli/src/main.rs:21-155):
  *
  *   scan --path <lakehouse> --table <name> [--as-of YYYY-MM-DDTHH:mm:ss]
  *   gen  --path <lakehouse> --table <name> --source <csv> --target <file.parquet>
  *
  * plus writer commands beyond the reference (its unchecked writer
  * roadmap, README.md:152-155):
  *
  *   create --path L --table T --schema "name:Type,name:Type" --start <ts>
  *   commit-base  --path L --table T --source <csv>
  *   commit-delta --path L --table T --source <csv> --start <ts> --end <ts>
  *
  * and full SQL with native time travel over the lakehouse (the
  * reference's ExecutionContext::sql, crates/azof-datafusion/src/context.rs:26-47):
  *
  *   sql --path L --query "SELECT ... FROM azof.tbl TIMESTAMP AS OF '...' ..."
  *
  * `scan` prints the table as of the given event time (appending
  * sub-second/UTC like the reference, main.rs:106-119); `gen` converts a
  * headerless CSV to a parquet data file per the table's declared schema.
  */
object AzofCli {
  /** `--key value` pairs plus bare `--flag`s (mapped to "true"). A flag
    * is any `--x` followed by another `--` option or end-of-args, so
    * `vacuum --path L --table T --dry-run` parses as dry-run=true
    * instead of silently dropping the flag.
    */
  private def parseArgs(args: Array[String]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 1
    while (i < args.length) {
      val a = args(i)
      require(a.startsWith("--"), s"expected --option, got '$a'")
      if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
        out += a.stripPrefix("--") -> args(i + 1); i += 2
      } else { out += a.stripPrefix("--") -> "true"; i += 1 }
    }
    out.result()
  }

  /** `--group-cols g1,g2 [--sum-cols a,b] [--minmax-cols c]
    * [--derived "name:Type=sql expr[;name2:Type2=sql2]"]` →
    * the mv-* verbs' [[graft.sources.ViewDef]]. A derived group's name
    * must also appear in `--group-cols`; the sql may contain commas
    * (entries split on ';').
    */
  private def cliViewDef(
      opts: Map[String, String]): graft.sources.ViewDef = {
    def csv(k: String): Seq[String] = opts.get(k)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val derived =
      graft.sources.DerivedGroup.parseList(opts.getOrElse("derived", ""))
    graft.sources.ViewDef(csv("group-cols"), csv("sum-cols"),
      csv("minmax-cols"), csv("distinct-cols"), derived,
      cliTuples(opts), csv("approx-cols"),
      opts.get("filter").map(_.trim).filter(_.nonEmpty),
      csv("var-cols"))
  }

  /** `--distinct-tuples "a+b;c+d"` → declared multi-column distinct
    * tuples (components joined by '+', tuples split on ';').
    */
  private def cliTuples(opts: Map[String, String]): Seq[Seq[String]] =
    opts.get("distinct-tuples").toSeq
      .flatMap(_.split(";").map(_.trim).filter(_.nonEmpty))
      .map(_.split("\\+").map(_.trim).filter(_.nonEmpty).toSeq)

  /** The jv-* verbs' [[graft.sources.JoinViewDef]] (adds `--fk-col` +
    * `--dim-cols` to [[cliViewDef]]'s flags). Multi-dim STAR views:
    * `--fk-col fk1,fk2` with `--dim-cols` groups separated by ';'
    * aligned per dim (`--dim-cols "tier;region,country"`).
    */
  private def cliJoinViewDef(
      opts: Map[String, String]): graft.sources.JoinViewDef = {
    def csv(k: String): Seq[String] = opts.get(k)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val fks = opts.getOrElse("fk-col", "fk")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val dimColGroups = opts.get("dim-cols")
      .map(_.split(";", -1).toSeq.map(
        _.split(",").map(_.trim).filter(_.nonEmpty).toSeq))
      .getOrElse(Nil)
    val padded = dimColGroups.padTo(fks.size, Seq.empty[String])
    val derived =
      graft.sources.DerivedGroup.parseList(opts.getOrElse("derived", ""))
    graft.sources.JoinViewDef(csv("group-cols"), csv("sum-cols"),
      csv("minmax-cols"),
      fks.zip(padded).map { case (fk, dc) =>
        graft.sources.DimJoin(fk, dc) },
      csv("distinct-cols"), derived, cliTuples(opts),
      csv("approx-cols"),
      opts.get("filter").map(_.trim).filter(_.nonEmpty),
      csv("var-cols"))
  }

  /** The jv-* verbs' dim table locations: `--dim-table d1[,d2…]` with
    * `--dim-path` per-dim (padded with the default lake).
    */
  private def cliJvDims(
      opts: Map[String, String], defaultLake: String)
      : Seq[(String, String)] = {
    val tables = opts.getOrElse("dim-table", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val paths = opts.get("dim-path")
      .map(_.split(",").map(_.trim).toSeq).getOrElse(Nil)
      .padTo(tables.size, "")
    tables.zip(paths).map { case (t, p) =>
      (if (p.isEmpty) defaultLake else p, t) }
  }

  /** Split a `--query` script into statements on ';' OUTSIDE
    * single-quoted SQL literals (a quote escapes as '' per ANSI, which
    * this walk handles for free: each quote just flips the flag twice).
    * Empty trailing fragments (a closing ';') are dropped.
    */
  private[cli] def splitSql(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    script.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case ';' if !inQuote =>
        if (cur.toString.trim.nonEmpty) out += cur.toString.trim
        cur.clear()
      case c => cur += c
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result()
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: AzofCli <scan|read|gen|create|commit-base|commit-delta|" +
          "commit-partitioned|add-column|drop-column|rename-column|analyze|" +
          "compact|delete|purge|changes|vacuum|tag|untag|refs|rollback|" +
          "branch|drop-branch|fast-forward|merge-branch|" +
          "tail|tail-commits|stream-commits|mirror|follow|follow-commits|" +
          "pq-create|pq-refresh|pq-search|export|" +
          "dedup-create|dedup-ingest|dedup-follow|dedup-rebuild|" +
          "dedup-survivors|dedup-apply|" +
          "contain-create|contain-refresh|contain-pairs|" +
          "shard-create|shard-refresh|shard-slots|shard-emit|" +
          "seq-create|seq-refresh|seq-spans|seq-emit|" +
          "sem-create|sem-refresh|sem-rebuild|sem-verdicts|" +
          "mv-create|mv-refresh|mv-serve|mv-distinct|mv-histogram|" +
          "mv-approx|jv-approx|" +
          "mv-rebuild|" +
          "term-create|term-refresh|term-search|term-phrase|" +
          "term-bm25|" +
          "term-prefix|term-near|term-rebuild|" +
          "jv-refresh|jv-serve|jv-distinct|jv-histogram|jv-rebuild|" +
          "sql> --path P --table T [...]")
      sys.exit(2)
    }
    val opts = parseArgs(args)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("azof-cli")
      .withExtensions(new graft.plans.AzofExtensions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // --bloom-bits N on any write command: per-file key Bloom filters in
    // the snapshot stats (point-lookup skipping on time-partitioned
    // layouts; see spark.azof.stats.bloomBits)
    opts.get("bloom-bits").foreach(v =>
      spark.conf.set("spark.azof.stats.bloomBits", v))
    try args(0) match {
      case "scan" =>
        val asOf = opts.get("as-of") match {
          case None => AsOf.Current
          // reference accepts second-precision local time and appends
          // `.000Z` (main.rs:106-119); full RFC3339 also accepted
          case Some(s) if s.endsWith("Z") => AsOf.EventTime(Instant.parse(s))
          case Some(s) =>
            AsOf.EventTime(LocalDateTime.parse(s).toInstant(ZoneOffset.UTC))
        }
        AzofScan.scan(spark, opts("path"), opts("table"), asOf)
          .show(numRows = 1000, truncate = false)
      case "gen" =>
        val table = AzofTable(spark, opts("path"), opts("table"))
        CsvGen.gen(spark, table.currentSnapshot.schema, opts("source"),
          table.tableDir.toString, opts("target"))
        println(s"wrote ${opts("target")}")
      case "create" =>
        val schema = TableSchema(opts("schema").split(",").toSeq.map { s =>
          val Array(n, t) = s.split(":")
          ColumnDef(n, ColumnType.fromJsonName(t), nullable = false)
        })
        graft.sources.AzofWriter.createTable(spark, opts("path"),
          opts("table"), schema, Instant.parse(opts("start")))
        println(s"created ${opts("table")} at snapshot 1")
      case "commit-base" =>
        val table = AzofTable(spark, opts("path"), opts("table"))
        val df = CsvGen.readCsv(spark, table.currentSnapshot.schema, opts("source"))
        graft.sources.AzofWriter.commitBase(spark, opts("path"), opts("table"), df)
        println(s"committed base; version now ${AzofTable(spark, opts("path"), opts("table")).currentVersion}")
      case "commit-delta" =>
        // --branch B lands the delta on a branch lineage (version.txt
        // and main readers unaffected until fast-forward)
        val table = AzofTable(spark, opts("path"), opts("table"))
        val df = CsvGen.readCsv(spark, table.currentSnapshot.schema, opts("source"))
        val br = opts.get("branch")
        graft.sources.AzofWriter.commitDelta(spark, opts("path"), opts("table"),
          df, Instant.parse(opts("start")), Instant.parse(opts("end")),
          branch = br)
        println(br match {
          case Some(b) =>
            s"committed delta on branch '$b'; head now " +
              AzofTable(spark, opts("path"), opts("table"))
                .branchHead(b).getOrElse(-1L)
          case None =>
            s"committed delta; version now ${AzofTable(spark, opts("path"), opts("table")).currentVersion}"
        })
      case "commit-partitioned" =>
        val table = AzofTable(spark, opts("path"), opts("table"))
        val df = CsvGen.readCsv(spark, table.currentSnapshot.schema, opts("source"))
        graft.sources.AzofWriter.commitPartitioned(spark, opts("path"),
          opts("table"), df, opts.getOrElse("files", "4").toInt,
          byKey = opts.get("by-key").exists(_.toBoolean))
        println(s"committed partitioned; version now ${AzofTable(spark, opts("path"), opts("table")).currentVersion}")
      case "add-column" =>
        // [--branch B] stages the evolution on that lineage (WAP
        // migration: add + backfill on the branch, audit, publish)
        val Array(n, t) = opts("column").split(":")
        graft.sources.AzofWriter.addColumn(spark, opts("path"), opts("table"),
          ColumnDef(n, ColumnType.fromJsonName(t), nullable = true),
          branch = opts.get("branch"))
        println(opts.get("branch") match {
          case Some(b) => s"added column $n on branch '$b' (main untouched)"
          case None => s"added column $n; version now " +
            AzofTable(spark, opts("path"), opts("table")).currentVersion
        })
      case "drop-column" =>
        graft.sources.AzofWriter.dropColumn(spark, opts("path"),
          opts("table"), opts("column"))
        println(s"dropped column ${opts("column")}; version now " +
          AzofTable(spark, opts("path"), opts("table")).currentVersion)
      case "rename-column" =>
        // metadata-only: bytes stay under the immutable physical name
        //   rename-column --path L --table T --column OLD --to NEW
        graft.sources.AzofWriter.renameColumn(spark, opts("path"),
          opts("table"), opts("column"), opts("to"))
        println(s"renamed column ${opts("column")} -> ${opts("to")}; " +
          "version now " +
          AzofTable(spark, opts("path"), opts("table")).currentVersion)
      case "compact" =>
        // --by-key: key-clustered merged files (point-lookup layout)
        // --zorder c1,c2: z-order on (key, c1, c2) — value skipping
        //   prunes value predicates under the key-range closure
        // --branch B: fold a STAGED lineage in place (main untouched);
        //   fast-forward then publishes the folded tree
        val cBranch = opts.get("branch")
        graft.sources.AzofWriter.compact(spark, opts("path"), opts("table"),
          Instant.parse(opts("at")), opts.getOrElse("files", "1").toInt,
          byKey = opts.get("by-key").exists(_ != "false"),
          zorder = opts.get("zorder").toSeq
            .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty)),
          branch = cBranch)
        val cT = AzofTable(spark, opts("path"), opts("table"))
        println(cBranch.fold(
          s"compacted; version now ${cT.currentVersion}")(b =>
          s"compacted branch '$b'; head now ${cT.branchHead(b).getOrElse(-1L)}"))
      case "analyze" =>
        // metadata-only stats backfill for stat-less / foreign files:
        //   analyze --path L --table T
        val r = graft.sources.AzofWriter.analyzeTable(
          spark, opts("path"), opts("table"))
        println(r.version match {
          case Some(v) => s"analyzed ${r.analyzed.size} file(s) " +
            s"(skipped ${r.skipped.size}); version now $v"
          case None => s"nothing to analyze (skipped ${r.skipped.size})"
        })
      case "tag" =>
        // named version ref: tag --path L --table T --name release-1
        //   [--version N] [--replace]  (default: tag the current version)
        val target = opts.get("version").map(_.toLong).getOrElse(
          AzofTable(spark, opts("path"), opts("table")).currentVersion.toLong)
        val v = graft.sources.AzofWriter.tagVersion(spark, opts("path"),
          opts("table"), opts("name"), Some(target),
          replace = opts.get("replace").exists(_ != "false"))
        println(s"tagged version $target as '${opts("name")}'; version now $v")
      case "untag" =>
        val v = graft.sources.AzofWriter.untagVersion(spark, opts("path"),
          opts("table"), opts("name"))
        println(s"removed tag '${opts("name")}'; version now $v")
      case "refs" =>
        // list named version refs (tags + branches) of the table
        val t = AzofTable(spark, opts("path"), opts("table"))
        val refs = t.currentSnapshot.refs.toSeq.sortBy(_._1)
        val branches = t.listBranches.sorted
          .map(b => b -> t.branchHead(b).getOrElse(-1L))
        if (refs.isEmpty && branches.isEmpty) println("no tags or branches")
        else {
          refs.foreach { case (n, v) => println(s"tag\t$n\t$v") }
          branches.foreach { case (n, v) => println(s"branch\t$n\t$v") }
        }
      case "branch" =>
        // fork a write lineage: branch --path L --table T --name audit
        //   [--version N]  (default: fork at the current main head)
        val at = graft.sources.AzofWriter.createBranch(spark, opts("path"),
          opts("table"), opts("name"), opts.get("version").map(_.toLong))
        println(s"created branch '${opts("name")}' at version $at")
      case "drop-branch" =>
        graft.sources.AzofWriter.dropBranch(spark, opts("path"),
          opts("table"), opts("name"))
        println(s"dropped branch '${opts("name")}'")
      case "fast-forward" =>
        // publish a branch: fast-forward --path L --table T --branch audit
        val v = graft.sources.AzofWriter.fastForward(spark, opts("path"),
          opts("table"), opts("branch"))
        println(s"fast-forwarded main to branch '${opts("branch")}'; " +
          s"version now $v")
      case "merge-branch" =>
        // publish a DIVERGED branch (main advanced past the fork):
        // merge-branch --path L --table T --branch audit
        val v = graft.sources.AzofWriter.mergeBranch(spark, opts("path"),
          opts("table"), opts("branch"))
        println(s"merged branch '${opts("branch")}' into main; " +
          s"version now $v")
      case "rollback" =>
        // append-only restore: rollback --path L --table T --to <N|tag>
        val to = opts("to").toLongOption.getOrElse(
          AzofTable(spark, opts("path"), opts("table"))
            .resolveVersion(opts("to")).toLong)
        val v = graft.sources.AzofWriter.rollback(spark, opts("path"),
          opts("table"), to)
        println(s"rolled back to version $to; version now $v")
      case "delete" =>
        // tombstone delete: --keys k1,k2,... --at TS (the deletion
        // event time; omit for "now" = suppress everything current)
        val keys = opts("keys").split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val at = opts.get("at").map(Instant.parse).getOrElse(Instant.now())
        graft.sources.AzofWriter.commitDelete(
          spark, opts("path"), opts("table"), keys, at)
        println(s"deleted ${keys.size} key(s) as of $at; version now " +
          AzofTable(spark, opts("path"), opts("table")).currentVersion)
      case "purge" =>
        // physical GDPR erase: rewrite deleted keys (newest tombstone
        // at-or-before --before; default "now" = every settled delete)
        // out of every file; old bytes leave disk after vacuum expires
        // the pre-purge snapshots
        val before = opts.get("before").map(Instant.parse)
          .getOrElse(Instant.now())
        val rep = graft.sources.AzofWriter.purgeDeleted(
          spark, opts("path"), opts("table"), before)
        println(s"purged ${rep.purgedKeys} key(s); rewrote " +
          s"${rep.rewrittenFiles.size} file(s), dropped " +
          s"${rep.droppedFiles.size} emptied file(s); version now " +
          AzofTable(spark, opts("path"), opts("table")).currentVersion)
      case "changes" =>
        // --branch B: publish preview — the rows publishing branch B
        // would make live on main (no --from/--to; the branch lineage
        // since its fork IS the range)
        opts.get("branch") match {
          case Some(b) =>
            require(!opts.contains("from") && !opts.contains("to"),
              "--branch previews the branch's whole unpublished lineage; " +
                "it does not take --from/--to")
            graft.sources.AzofChangeFeed
              .branchDiff(spark, opts("path"), opts("table"), b)
              .show(numRows = 1000, truncate = false)
          case None =>
            graft.sources.AzofChangeFeed.between(spark, opts("path"), opts("table"),
              opts("from").toLong,
              opts.get("to").map(_.toLong).getOrElse(
                AzofTable(spark, opts("path"), opts("table")).currentVersion.toLong))
              .show(numRows = 1000, truncate = false)
        }
      case "tail-commits" =>
        // one COMMIT-EXACT poll of the change feed: processes versions
        // committed since this checkpoint's offset, prints them,
        // advances the offset, exits. Re-running continues. Unlike
        // `tail` (file-level append feed), a crashed writer's orphan
        // data file is never delivered — only committed snapshots feed.
        val ckpt = opts.getOrElse("checkpoint",
          java.nio.file.Files.createTempDirectory("azof-tailc").toString)
        val (from, to) = graft.sources.AzofChangeFeed.followOnce(
          spark, opts("path"), opts("table"), ckpt,
          startVersion = opts.getOrElse("from", "1") match {
            case "earliest" => graft.sources.AzofChangeFeed
              .earliestFeedBase(spark, opts("path"), opts("table"))
            // non-numeric = named version ref (tag)
            case v => v.toLongOption.getOrElse(
              AzofTable(spark, opts("path"), opts("table"))
                .resolveVersion(v).toLong)
          }) {
          (df, lo, hi) =>
            println(s"commits $lo..$hi:")
            df.orderBy("_commit_version").show(numRows = 1000, truncate = false)
        }
        if (from > to) println("no new commits")
        println(s"checkpoint: $ckpt")
      case "stream-commits" =>
        // one AvailableNow pass over the COMMIT-EXACT streaming source
        // (azof-commits): versions as offsets in the Spark checkpoint,
        // orphan files never delivered. Re-running with the same
        // --checkpoint resumes at the committed version.
        val ckpt = opts.getOrElse("checkpoint",
          java.nio.file.Files.createTempDirectory("azof-scommits").toString)
        // --branch B tails a STAGED lineage's commits (live audit of a
        // staging branch, before publish)
        val reader0 = spark.readStream.format("azof-commits")
          .option("table", opts("table"))
        val reader = opts.get("branch").fold(reader0)(
          reader0.option("branch", _))
        val q = opts.get("from").fold(reader)(reader.option("startVersion", _))
          .load(opts("path"))
          .writeStream.outputMode("append")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            println(s"batch $id: ${batch.count()} rows")
            batch.show(numRows = 1000, truncate = false)
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        println(s"checkpoint: $ckpt")
      case "mirror" =>
        // one AvailableNow replication pass: source commits (upserts AND
        // tombstone deletes) land in the target table exactly once.
        // Re-running with the same --checkpoint continues incrementally.
        // --seed: fresh mirror of a source whose early history was
        // vacuumed (Current-scan base commit, then follow from the seed
        // version pinned in the checkpoint sidecar)
        // --native: replicate through the DSv2 streaming sink
        // (writeStream.toTable) instead of the foreachBatch helper —
        // same feed, same semantics, the sink's own (query id, epoch)
        // exactly-once
        val ckpt = opts.getOrElse("checkpoint",
          java.nio.file.Files.createTempDirectory("azof-mirror").toString)
        val seed = opts.get("seed").exists(_ != "false")
        val native = opts.get("native").exists(_ != "false")
        require(!(seed && native),
          "--seed is the foreachBatch path's sidecar protocol; " +
            "run the native sink without --seed")
        // --target-branch B (native only): stage the replica on a
        // branch of the target — audit, then fast-forward to publish
        val tgtBranch = opts.get("target-branch")
        require(tgtBranch.isEmpty || native,
          "--target-branch stages through the native DSv2 sink: add --native")
        require(opts.get("source-branch").isEmpty || (!native && !seed),
          "--source-branch mirrors a staged lineage via the foreachBatch " +
            "path: drop --native/--seed")
        val q =
          if (seed)
            graft.streaming.AzofMirror.seedAndReplicate(spark,
              opts("path"), opts("table"),
              opts("target-path"), opts("target-table"), ckpt,
              maxVersionsPerBatch = opts.get("max-versions").map(_.toLong))
          else if (native)
            graft.streaming.AzofMirror.replicateNative(spark,
              opts("path"), opts("table"),
              opts("target-path"), opts("target-table"), ckpt,
              maxVersionsPerBatch = opts.get("max-versions").map(_.toLong),
              targetBranch = tgtBranch)
          else
            // --source-branch B: mirror a STAGED lineage's state (the
            // audit-tooling mirror; foreachBatch path)
            graft.streaming.AzofMirror.replicate(spark,
              opts("path"), opts("table"),
              opts("target-path"), opts("target-table"), ckpt,
              maxVersionsPerBatch = opts.get("max-versions").map(_.toLong),
              sourceBranch = opts.get("source-branch"))
        q.awaitTermination()
        println(s"mirrored ${opts("table")} -> ${opts("target-table")}; " +
          s"target version now ${AzofTable(spark,
            opts("target-path"), opts("target-table")).currentVersion}")
        println(s"checkpoint: $ckpt")
      case "tail" =>
        // one AvailableNow pass over the append feed: processes commits
        // not yet seen by this checkpoint, prints them, exits. Re-running
        // with the same --checkpoint continues where it left off.
        val ckpt = opts.getOrElse("checkpoint",
          java.nio.file.Files.createTempDirectory("azof-tail").toString)
        // foreachBatch, not the memory sink: memory cannot recover from a
        // checkpoint, and resumability is the point of --checkpoint
        val q = graft.streaming.AzofStream.appends(spark, opts("path"), opts("table"))
          .writeStream.outputMode("append")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            println(s"batch $id: ${batch.count()} new rows")
            batch.show(numRows = 1000, truncate = false)
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        println(s"checkpoint: $ckpt")
      case "follow-commits" =>
        // commit-exact, DELETE-AWARE latest-per-key view: one
        // AvailableNow pass prints winner updates since the checkpoint,
        // with _deleted=true rows for tombstoned keys.
        val ckpt = opts.getOrElse("checkpoint",
          java.nio.file.Files.createTempDirectory("azof-followc").toString)
        val q = graft.streaming.LatestView
          .latestCommitted(spark, opts("path"), opts("table"))
          .writeStream.outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            val rows = batch.collect()
            println(s"batch $id: ${rows.length} winner updates")
            rows.take(1000).foreach(r => println(r.mkString("| ", " | ", " |")))
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        println(s"checkpoint: $ckpt")
      case "follow" =>
        // latest-per-key view maintenance: one AvailableNow pass prints
        // winner UPDATES since the checkpoint (first run: every key).
        // Re-running with the same --checkpoint continues incrementally.
        val ckpt = opts.getOrElse("checkpoint",
          java.nio.file.Files.createTempDirectory("azof-follow").toString)
        val q = graft.streaming.LatestView.latest(spark, opts("path"), opts("table"))
          .writeStream.outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            // one action: foreachBatch datasets recompute per action, and
            // this plan reloads the state store — count()+show() would
            // run the stateful batch twice
            val rows = batch.collect()
            println(s"batch $id: ${rows.length} winner updates")
            rows.take(1000).foreach(r => println(r.mkString("| ", " | ", " |")))
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        println(s"checkpoint: $ckpt")
      case "vacuum" =>
        val rep = graft.sources.AzofVacuum.vacuum(spark, opts("path"),
          opts("table"), opts.getOrElse("keep", "1").toInt,
          dryRun = opts.get("dry-run").exists(_.toBoolean),
          minAgeMs = opts.getOrElse("min-age-hours", "1").toDouble
            .*(3600000L).toLong)
        val verb = if (opts.get("dry-run").exists(_.toBoolean)) "would delete"
          else "deleted"
        println(s"$verb data files: ${rep.deletedDataFiles.mkString(", ")}")
        println(s"$verb staging debris: ${rep.deletedTmpFiles.mkString(", ")}")
        println(s"$verb snapshots: ${rep.deletedSnapshots.map("s" + _).mkString(", ")}")
        println(s"retained snapshots: ${rep.retainedSnapshots.map("s" + _).mkString(", ")}")
      case "pq-create" =>
        // frozen-model PQ index over an azof vector table (vectors as
        // JSON double arrays in --vec-col):
        //   pq-create --path L --table SRC --index-table IDX
        //     [--index-path L2] [--vec-col vec] [--num-sub 8] [--bits 4]
        //     [--lloyd 0]   (0 = seed codebooks, engine-replayable)
        val model = graft.sources.PqIndex.create(spark,
          opts("path"), opts("table"), opts.getOrElse("vec-col", "vec"),
          opts.getOrElse("index-path", opts("path")), opts("index-table"),
          numSub = opts.getOrElse("num-sub", "8").toInt,
          codebookBits = opts.getOrElse("bits", "4").toInt,
          lloydIters = opts.getOrElse("lloyd", "0").toInt)
        println(s"created PQ index ${opts("index-table")} " +
          s"(numSub=${model.numSub}, subDim=${model.subDim}, frozen " +
          "model in _pq_model.json); run pq-refresh to backfill")
      case "pq-refresh" =>
        // one AvailableNow catch-up: encode the source commits since
        // this checkpoint against the frozen model, exactly once.
        val ckpt = opts.getOrElse("checkpoint",
          java.nio.file.Files.createTempDirectory("azof-pqidx").toString)
        graft.sources.PqIndex.refresh(spark,
            opts("path"), opts("table"), opts.getOrElse("vec-col", "vec"),
            opts.getOrElse("index-path", opts("path")), opts("index-table"),
            ckpt)
          .awaitTermination()
        println(s"refreshed ${opts("index-table")}; version now " +
          AzofTable(spark, opts.getOrElse("index-path", opts("path")),
            opts("index-table")).currentVersion)
        println(s"checkpoint: $ckpt")
      case "dedup-create" =>
        // companion signature + components index tables for the
        // incremental dedup flow:
        //   dedup-create --index-path L [--sig-table minhash_sig]
        //     [--cc-table components]
        graft.sources.DedupFlow.create(spark, opts("index-path"),
          opts.getOrElse("sig-table", "minhash_sig"),
          opts.getOrElse("cc-table", "components"),
          keyMap = opts.get("key-map"))
        println(s"created dedup indexes in ${opts("index-path")}: " +
          s"${opts.getOrElse("sig-table", "minhash_sig")} + " +
          opts.getOrElse("cc-table", "components") +
          opts.get("key-map").fold("")(km => s" + $km"))
      case "dedup-ingest" =>
        // one end-to-end incremental ingest of every source commit
        // since the cursor: CDC churn -> signature catch-up ->
        // churn-confined candidates -> Jaccard verify -> component
        // merge.
        //   dedup-ingest --path L --table SRC --index-path L2
        //     [--text-col text] [--min-jaccard 0.5] [--at TS]
        //     [--checkpoint DIR]
        // the checkpoint DEFAULT is a stable location derived from the
        // signature table it feeds — a fresh temp dir per run would be a
        // new streaming appId, so every invocation would replay the
        // whole commit feed (O(corpus) signature recompute + an index
        // version per run) instead of catching up from last time
        val ckpt = opts.getOrElse("checkpoint",
          new org.apache.hadoop.fs.Path(opts("index-path"),
            opts.getOrElse("sig-table", "minhash_sig") +
              "/_refresh_checkpoint").toString)
        val at = opts.get("at")
          .map(graft.sources.AzofDataSource.parseInstant)
          .getOrElse(java.time.Instant.ofEpochMilli(
            System.currentTimeMillis()))
        val r = graft.sources.DedupFlow.ingest(spark,
          opts("path"), opts("table"),
          opts.getOrElse("text-col", "text"),
          opts("index-path"), ckpt, at,
          sigTable = opts.getOrElse("sig-table", "minhash_sig"),
          ccTable = opts.getOrElse("cc-table", "components"),
          minJaccard = opts.getOrElse("min-jaccard", "0.5").toDouble,
          retain = opts.getOrElse("retain", "0").toInt,
          retainMinAgeMs = opts.get("retain-min-age-hours")
            .map(h => (h.toDouble * 3600 * 1000).toLong)
            .getOrElse(graft.sources.AzofVacuum.DefaultMinAgeMs),
          keyMap = opts.get("key-map"))
        println(
          if (r.noop) s"no new commits (cursor at v${r.fromVersion})"
          else s"ingested v${r.fromVersion + 1}..v${r.toVersion}: " +
            s"${r.churned} churned keys -> ${r.candidates} candidates " +
            s"-> ${r.verified} verified pairs -> ${r.relabeled} " +
            "relabeled docs")
        println(s"checkpoint: $ckpt")
      case "dedup-follow" =>
        // the self-maintaining form of dedup-ingest: a streaming query
        // on the commit-exact feed triggers one ingest per micro-batch.
        //   dedup-follow --path L --table SRC --index-path L2
        //     [--interval-seconds N]  (omit = AvailableNow catch-up)
        //     [--text-col text] [--min-jaccard 0.5] [--retain N]
        //     [--checkpoint DIR] [--key-map key_map]
        //     [--contain-table contain_pairs [--contain-keyed]
        //      [--contain-postings contain_postings]]
        //     [--shard-table shard_map] [--seq-table seq_map]
        //     [--lm-table lm_stats]
        //     [--mv-table mv --group-cols g[,..] [--sum-cols ..]
        //      [--minmax-cols ..]]
        //     [--jv-table jv --jv-dim-table DIM [--jv-dim-path L]
        //      --fk-col fk --group-cols .. [--dim-cols ..]]
        //     [--term-table term_postings]
        //     (--contain-table / --shard-table / --seq-table /
        //     --lm-table / --mv-table: ALSO refresh the persisted
        //     containment index / export shard map / sequence map /
        //     bigram-LM stats / materialized view each pass — one
        //     follow maintains every corpus-following index)
        //     [--compact-source-every N] [--compact-source-max-files M]
        //     [--compact-source-files K]  (fold the SOURCE table every
        //     N data batches / past M live files, into K files — the
        //     driver maintains the corpus table itself too)
        val ckpt = opts.getOrElse("checkpoint",
          new org.apache.hadoop.fs.Path(opts("index-path"),
            opts.getOrElse("sig-table", "minhash_sig") +
              "/_refresh_checkpoint").toString)
        val trigger = opts.get("interval-seconds") match {
          case Some(s) => org.apache.spark.sql.streaming.Trigger
            .ProcessingTime(s"$s seconds")
          case None => org.apache.spark.sql.streaming.Trigger.AvailableNow()
        }
        val q = graft.sources.DedupFlow.follow(spark,
          opts("path"), opts("table"),
          opts.getOrElse("text-col", "text"),
          opts("index-path"), ckpt, trigger,
          sigTable = opts.getOrElse("sig-table", "minhash_sig"),
          ccTable = opts.getOrElse("cc-table", "components"),
          minJaccard = opts.getOrElse("min-jaccard", "0.5").toDouble,
          retain = opts.getOrElse("retain", "0").toInt,
          keyMap = opts.get("key-map"),
          onReport = r => println(
            if (r.noop) s"no new commits (cursor at v${r.fromVersion})"
            else s"ingested v${r.fromVersion + 1}..v${r.toVersion}: " +
              s"${r.churned} churned -> ${r.candidates} candidates -> " +
              s"${r.verified} verified -> ${r.relabeled} relabeled"),
          containTable = opts.get("contain-table"),
          containKeyed = opts.contains("contain-keyed"),
          containPostings = opts.get("contain-postings"),
          onContainReport = cr => println(
            if (cr.noop) "containment: no new commits " +
              s"(cursor at v${cr.fromVersion})"
            else s"containment v${cr.fromVersion + 1}..v${cr.toVersion}: " +
              s"${cr.churned} churned -> ${cr.candidates} candidates -> " +
              s"${cr.verified} verified; ${cr.upserted} upserted, " +
              s"${cr.retired} retired"),
          shardTable = opts.get("shard-table"),
          onShardReport = sr => println(
            if (sr.noop) "shards: no new commits " +
              s"(cursor at v${sr.fromVersion})"
            else s"shards v${sr.fromVersion + 1}..v${sr.toVersion}: " +
              s"${sr.churned} churned -> ${sr.assigned} new slot(s); " +
              s"next rank ${sr.nextRank}"),
          seqTable = opts.get("seq-table"),
          onSeqReport = qr => println(
            if (qr.noop) "sequences: no new commits " +
              s"(cursor at v${qr.fromVersion})"
            else s"sequences v${qr.fromVersion + 1}..v${qr.toVersion}: " +
              s"${qr.churned} churned -> ${qr.assigned} new span(s); " +
              s"next token ${qr.nextToken}"),
          lmTable = opts.get("lm-table"),
          mvTable = opts.get("mv-table"),
          mvView = opts.get("mv-table").map(_ => cliViewDef(opts)),
          termTable = opts.get("term-table"),
          jvTable = opts.get("jv-table"),
          jvDef = opts.get("jv-table").map(_ => cliJoinViewDef(opts)),
          jvDimTable = opts.get("jv-dim-table"),
          jvDimLake = opts.get("jv-dim-path"),
          compactSourceEvery =
            opts.getOrElse("compact-source-every", "0").toInt,
          compactSourceMaxFiles =
            opts.getOrElse("compact-source-max-files", "0").toInt,
          compactSourceFiles =
            opts.getOrElse("compact-source-files", "1").toInt)
        q.awaitTermination()
      case "contain-create" =>
        // persisted containment-pair index (+ optional posting table):
        //   contain-create --index-path L2 [--index-table contain_pairs]
        //     [--postings contain_postings]
        graft.sources.ContainIndex.create(spark, opts("index-path"),
          opts.getOrElse("index-table", "contain_pairs"))
        opts.get("postings").foreach(pt =>
          graft.sources.ContainIndex.createPostings(spark,
            opts("index-path"), pt))
        println(s"created ${opts.getOrElse("index-table", "contain_pairs")}" +
          opts.get("postings").fold("")(pt => s" + postings $pt"))
      case "contain-refresh" =>
        // churn-confined incremental refresh from the CDC feed:
        //   contain-refresh --path L --table SRC --index-path L2
        //     [--index-table contain_pairs] [--text-col text]
        //     [--min-shared 3] [--max-df 20] [--min-containment 0.9]
        //     [--at TS] [--keyed]
        //     [--postings contain_postings [--ids-cap 64]]
        // --keyed: string-keyed corpus (URLs/UUIDs) — keys flow through
        // raw, pairs order lexicographically (serve via
        // contain-pairs --keyed)
        // --postings: maintain + serve blocking from the persisted
        // posting-list table — NO corpus pass per refresh (create it
        // with contain-create --postings)
        val at = opts.get("at")
          .map(graft.sources.AzofDataSource.parseInstant)
          .getOrElse(java.time.Instant.ofEpochMilli(
            System.currentTimeMillis()))
        val r = graft.sources.ContainIndex.refresh(spark,
          opts("path"), opts("table"),
          opts.getOrElse("text-col", "text"),
          opts("index-path"),
          opts.getOrElse("index-table", "contain_pairs"), at,
          minShared = opts.getOrElse("min-shared", "3").toInt,
          maxDf = opts.getOrElse("max-df", "20").toInt,
          minContainment =
            opts.getOrElse("min-containment", "0.9").toDouble,
          keyed = opts.contains("keyed"),
          postings = opts.get("postings"),
          idsCap = opts.getOrElse("ids-cap", "64").toInt)
        println(
          if (r.noop) s"no new commits (cursor at v${r.fromVersion})"
          else s"refreshed v${r.fromVersion + 1}..v${r.toVersion}: " +
            s"${r.churned} churned -> ${r.candidates} candidates -> " +
            s"${r.verified} verified; ${r.upserted} upserted, " +
            s"${r.retired} retired")
      case "contain-pairs" =>
        // the persisted verdicts:
        //   contain-pairs --index-path L2 [--index-table contain_pairs]
        //     [--keyed]   (string-keyed index: raw keys, no numeric cast)
        val containPairsTable = opts.getOrElse("index-table", "contain_pairs")
        (if (opts.contains("keyed"))
           graft.sources.ContainIndex.pairsKeyed(spark,
             opts("index-path"), containPairsTable)
         else graft.sources.ContainIndex.pairs(spark,
             opts("index-path"), containPairsTable))
          .orderBy("doc_a", "doc_b")
          .show(numRows = 10000, truncate = false)
      case "shard-create" =>
        // persisted incremental shard map (frozen shardSize+salt):
        //   shard-create --index-path L2 [--index-table shard_map]
        //     [--shard-size 1024] [--salt s1]
        val m = graft.sources.ShardMap.create(spark, opts("index-path"),
          opts.getOrElse("index-table", "shard_map"),
          shardSize = opts.getOrElse("shard-size", "1024").toLong,
          salt = opts.getOrElse("salt", "s1"))
        println(s"created ${opts.getOrElse("index-table", "shard_map")} " +
          s"(shardSize=${m.shardSize}, salt=${m.salt}; frozen in " +
          "_shard_model.json)")
      case "shard-refresh" =>
        // mint slots for the CDC range's new docs (append-only epochs):
        //   shard-refresh --path L --table SRC --index-path L2
        //     [--index-table shard_map] [--at TS]
        val at = opts.get("at")
          .map(graft.sources.AzofDataSource.parseInstant)
          .getOrElse(java.time.Instant.ofEpochMilli(
            System.currentTimeMillis()))
        val r = graft.sources.ShardMap.refresh(spark,
          opts("path"), opts("table"), opts("index-path"),
          opts.getOrElse("index-table", "shard_map"), at)
        println(
          if (r.noop) s"no new commits (cursor at v${r.fromVersion})"
          else s"refreshed v${r.fromVersion + 1}..v${r.toVersion}: " +
            s"${r.churned} churned -> ${r.assigned} new slot(s); " +
            s"next rank ${r.nextRank}")
      case "shard-emit" =>
        // write the shards that became COMPLETE since the last emit
        // (write-once artifacts, append-only emission cursor):
        //   shard-emit --path L --table SRC --index-path L2 --out DIR
        //     [--index-table shard_map] [--text-col text] [--flush]
        //   (--flush: also write the trailing partial shard — the
        //   TERMINAL cut of a frozen corpus; see ShardMap.emitShards)
        val er = graft.sources.ShardMap.emitShards(spark,
          opts("path"), opts("table"),
          opts.getOrElse("text-col", "text"),
          opts("index-path"), opts.getOrElse("index-table", "shard_map"),
          opts("out"), flush = opts.contains("flush"))
        println(
          if (er.noop) s"nothing to emit (cursor at shard ${er.fromShard})"
          else s"emitted shards ${er.fromShard}..<${er.untilShard}" +
            (if (er.flushedPartial) " + trailing partial" else "") +
            s": ${er.docs} doc(s)")
      case "shard-slots" =>
        // the persisted assignment:
        //   shard-slots --index-path L2 [--index-table shard_map]
        //     [--live --path L --table SRC]  (--live: ∩ the live
        //     corpus — deleted docs' slots appear as holes)
        val sl =
          if (opts.contains("live"))
            graft.sources.ShardMap.liveAssignment(spark,
              opts("path"), opts("table"),
              opts("index-path"), opts.getOrElse("index-table", "shard_map"))
          else graft.sources.ShardMap.assignment(spark,
            opts("index-path"), opts.getOrElse("index-table", "shard_map"))
        sl.orderBy("shuffle_rank").show(numRows = 10000, truncate = false)
      case "seq-create" =>
        // persisted incremental sequence packing (frozen budget+salt):
        //   seq-create --index-path L2 [--index-table seq_map]
        //     [--budget 2048] [--salt s1]
        val m = graft.sources.SeqMap.create(spark, opts("index-path"),
          opts.getOrElse("index-table", "seq_map"),
          budget = opts.getOrElse("budget", "2048").toLong,
          salt = opts.getOrElse("salt", "s1"))
        println(s"created ${opts.getOrElse("index-table", "seq_map")} " +
          s"(budget=${m.budget}, salt=${m.salt}; frozen in " +
          "_seq_model.json)")
      case "seq-refresh" =>
        // mint token spans for the CDC range's new docs:
        //   seq-refresh --path L --table SRC --index-path L2
        //     [--index-table seq_map] [--text-col text] [--at TS]
        val at = opts.get("at")
          .map(graft.sources.AzofDataSource.parseInstant)
          .getOrElse(java.time.Instant.ofEpochMilli(
            System.currentTimeMillis()))
        val r = graft.sources.SeqMap.refresh(spark,
          opts("path"), opts("table"),
          opts.getOrElse("text-col", "text"), opts("index-path"),
          opts.getOrElse("index-table", "seq_map"), at)
        println(
          if (r.noop) s"no new commits (cursor at v${r.fromVersion})"
          else s"refreshed v${r.fromVersion + 1}..v${r.toVersion}: " +
            s"${r.churned} churned -> ${r.assigned} new span(s); " +
            s"next token ${r.nextToken}")
      case "seq-spans" =>
        // the persisted assignment:
        //   seq-spans --index-path L2 [--index-table seq_map]
        //     [--live --path L --table SRC]
        val sq =
          if (opts.contains("live"))
            graft.sources.SeqMap.liveAssignment(spark,
              opts("path"), opts("table"),
              opts("index-path"), opts.getOrElse("index-table", "seq_map"))
          else graft.sources.SeqMap.assignment(spark,
            opts("index-path"), opts.getOrElse("index-table", "seq_map"))
        sq.orderBy("tok_offset").show(numRows = 10000, truncate = false)
      case "seq-emit" =>
        // write the sequences that became COMPLETE since the last emit
        // (the frozen cut: each doc's text reads AS OF its mint epoch):
        //   seq-emit --path L --table SRC --index-path L2 --out DIR
        //     [--index-table seq_map] [--text-col text] [--flush]
        //     [--max-epochs 32]  (backlog flushes proceed in slices of
        //     at most this many epochs, each epoch read key-confined)
        val er = graft.sources.SeqMap.emitSequences(spark,
          opts("path"), opts("table"),
          opts.getOrElse("text-col", "text"),
          opts("index-path"), opts.getOrElse("index-table", "seq_map"),
          opts("out"), flush = opts.contains("flush"),
          maxEpochsPerEmit = opts.getOrElse("max-epochs", "32").toInt)
        println(
          if (er.noop) s"nothing to emit (cursor at seq ${er.fromSeq})"
          else s"emitted sequences ${er.fromSeq}..<${er.untilSeq}" +
            (if (er.flushedPartial) " + trailing partial" else "") +
            s": ${er.sequences} row(s)")
      case "sem-create" =>
        // frozen-model SemDeDup index over an azof embedding table
        // (vectors as JSON double arrays in --vec-col):
        //   sem-create --path L --table SRC --index-table IDX
        //     [--index-path L2] [--vec-col vec] [--k 16]
        //     [--threshold 0.4] [--salt sem] [--keyed]
        // --keyed: string-keyed corpus (URLs/UUIDs) — dominance is
        // lexicographic on the raw key, frozen into the model
        val m = graft.sources.SemDedupIndex.create(spark,
          opts("path"), opts("table"), opts.getOrElse("vec-col", "vec"),
          opts.getOrElse("index-path", opts("path")), opts("index-table"),
          k = opts.getOrElse("k", "16").toInt,
          threshold = opts.getOrElse("threshold", "0.4").toDouble,
          salt = opts.getOrElse("salt", "sem"),
          keyed = opts.contains("keyed"))
        println(s"created SemDeDup index ${opts("index-table")} " +
          s"(k=${m.k}, threshold=${m.threshold}" +
          (if (m.keyed) ", keyed" else "") + ", frozen centroids in " +
          "_sem_model.json); run sem-refresh to backfill")
      case "sem-refresh" =>
        // one AvailableNow catch-up: verdict the source commits since
        // this checkpoint against the frozen model (flips included).
        // Stable default checkpoint, same reason as dedup-ingest.
        val ckpt = opts.getOrElse("checkpoint",
          new org.apache.hadoop.fs.Path(
            opts.getOrElse("index-path", opts("path")),
            opts("index-table") + "/_refresh_checkpoint").toString)
        graft.sources.SemDedupIndex.refresh(spark,
            opts("path"), opts("table"), opts.getOrElse("vec-col", "vec"),
            opts.getOrElse("index-path", opts("path")), opts("index-table"),
            ckpt,
            onStats = s => println(
              s"batch: ${s.batchDocs} docs across ${s.touchedClusters} " +
                s"touched clusters (max ${s.maxTouchedCluster}, " +
                s"${s.pairComparisons} comparisons)"),
            retain = opts.getOrElse("retain", "0").toInt,
            retainMinAgeMs = opts.get("retain-min-age-hours")
              .map(h => (h.toDouble * 3600 * 1000).toLong)
              .getOrElse(graft.sources.AzofVacuum.DefaultMinAgeMs))
          .awaitTermination()
        println(s"refreshed ${opts("index-table")}; version now " +
          AzofTable(spark, opts.getOrElse("index-path", opts("path")),
            opts("index-table")).currentVersion)
        println(s"checkpoint: $ckpt")
      case "sem-rebuild" =>
        // epoch rebuild: freeze a NEW model from the current corpus
        // into a FRESH verdict table, verdict the pinned corpus
        // one-shot, seed the refresh cursor (the reconciliation for
        // everything the monotone contract refuses):
        //   sem-rebuild --path L --table SRC --new-index-table IDX2
        //     [--index-path L2] [--vec-col vec] [--k 16]
        //     [--threshold 0.4] [--salt sem]
        val m = graft.sources.SemDedupIndex.rebuildEpoch(spark,
          opts("path"), opts("table"), opts.getOrElse("vec-col", "vec"),
          opts.getOrElse("index-path", opts("path")),
          opts("new-index-table"),
          k = opts.getOrElse("k", "16").toInt,
          threshold = opts.getOrElse("threshold", "0.4").toDouble,
          salt = opts.getOrElse("salt", "sem"),
          onStats = s => println(
            s"rebuild verdicted ${s.batchDocs} docs across " +
              s"${s.touchedClusters} clusters (max ${s.maxTouchedCluster}, " +
              s"${s.pairComparisons} comparisons)"),
          keyed = opts.contains("keyed"))
        println(s"rebuilt epoch into ${opts("new-index-table")} " +
          s"(k=${m.k}, threshold=${m.threshold}); serve with " +
          "sem-verdicts --index-table " + opts("new-index-table"))
      case "lm-create" =>
        // persisted corpus bigram-LM stats (the t19 quality filter's
        // amortized twin): lm-create --index-path L2 [--index-table lm_stats]
        graft.sources.LmIndex.create(spark,
          opts("index-path"), opts.getOrElse("index-table", "lm_stats"))
        println(s"created lm stats table")
      case "lm-refresh" =>
        // one AvailableNow catch-up: count the source commits since this
        // checkpoint and upsert old+new for the touched bigrams
        val lmIdx = opts.getOrElse("index-path", opts("path"))
        val lmTbl = opts.getOrElse("index-table", "lm_stats")
        val ckpt = opts.getOrElse("checkpoint",
          new org.apache.hadoop.fs.Path(lmIdx,
            lmTbl + "/_refresh_checkpoint").toString)
        val q = graft.sources.LmIndex.refresh(spark,
          opts("path"), opts("table"), opts.getOrElse("text-col", "text"),
          lmIdx, lmTbl, ckpt)
        q.awaitTermination()
        println(s"lm stats refreshed; version now " +
          AzofTable(spark, lmIdx, lmTbl).currentVersion)
      case "lm-score" =>
        // bigram-LM surprise for the source's live docs, served from
        // the persisted stats
        graft.sources.LmIndex.score(spark,
            opts("path"), opts("table"), opts.getOrElse("text-col", "text"),
            opts.getOrElse("index-path", opts("path")),
            opts.getOrElse("index-table", "lm_stats"))
          .orderBy("doc_id")
          .show(numRows = 10000, truncate = false)
      case "lm-rebuild" =>
        // epoch rebuild: retrain from the LIVE corpus into a fresh
        // stats table (the reconciliation for ROLLBACKS — the one
        // state change with no feed event; the refresh itself is
        // exact under deletes/revisions via pre-image subtraction)
        val n = graft.sources.LmIndex.rebuildEpoch(spark,
          opts("path"), opts("table"), opts.getOrElse("text-col", "text"),
          opts.getOrElse("index-path", opts("path")),
          opts.getOrElse("new-table", "lm_stats_next"),
          opts.get("at").map(Instant.parse).getOrElse(Instant.now()))
        println(s"rebuilt lm stats epoch: $n bigrams")
      case "jv-refresh" =>
        // incremental STAR join view (fact ⋈ dim1 [⋈ dim2…] → group-by),
        // one synchronous catch-up of every feed:
        //   jv-refresh --path L --table FACT --dim-table DIM1[,DIM2]
        //     --fk-col fk1[,fk2] --group-cols tier[,..]
        //     [--dim-cols "tier[;region,..]"]
        //     [--sum-cols a,b] [--minmax-cols c]
        //     [--dim-path L2[,L3]] [--index-path L4] [--index-table jv]
        val jd = cliJoinViewDef(opts)
        val r = graft.sources.JoinView.refresh(spark,
          opts("path"), opts("table"),
          cliJvDims(opts, opts("path")),
          opts.getOrElse("index-path", opts("path")),
          opts.getOrElse("index-table", "jv"), jd)
        println(
          if (r.noop) s"no new commits (fact v${r.fromFact}, " +
            s"dims v${r.fromDims.mkString(",")})"
          else s"join view refreshed: fact v${r.fromFact}->v${r.toFact}, " +
            s"dims v${r.fromDims.mkString(",")}->" +
            s"v${r.toDims.mkString(",")}, ${r.touched} group(s) touched")
      case "jv-serve" =>
        val jd = cliJoinViewDef(opts)
        graft.sources.JoinView.serve(spark,
            opts.getOrElse("index-path", opts("path")),
            opts.getOrElse("index-table", "jv"), jd)
          .orderBy(jd.groupCols.map(org.apache.spark.sql.functions.col): _*)
          .show(numRows = 10000, truncate = false)
      case "jv-distinct" =>
        // exact star COUNT(DISTINCT) from the join view's refcounted
        // support table:
        //   jv-distinct --path L --index-table jv --group-cols g
        //     --fk-col fk --dim-cols g --distinct-cols a --col a
        //     [--by g2[,g3]]  (--by empty = global; defaults to the
        //     view's group columns)
        val jvd = cliJoinViewDef(opts)
        val jdcol = opts.getOrElse("col", jvd.distinctCols.head)
        val jby = opts.get("by")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(jvd.groupCols)
        val jout = graft.sources.JoinView.countDistinct(spark,
          opts.getOrElse("index-path", opts("path")),
          opts.getOrElse("index-table", "jv"), jvd, jdcol, jby)
        (if (jby.isEmpty) jout
         else jout.orderBy(jby.map(org.apache.spark.sql.functions.col): _*))
          .show(numRows = 10000, truncate = false)
      case "jv-rebuild" =>
        val jd = cliJoinViewDef(opts)
        val n = graft.sources.JoinView.rebuildEpoch(spark,
          opts("path"), opts("table"),
          cliJvDims(opts, opts("path")),
          opts.getOrElse("index-path", opts("path")),
          opts.getOrElse("new-table", "jv_next"), jd,
          opts.get("at").map(Instant.parse).getOrElse(Instant.now()))
        println(s"rebuilt join view epoch: $n groups")
      case "term-create" =>
        // persisted inverted index (one row per posting):
        // term-create --index-path L2 [--index-table term_postings]
        graft.sources.TermIndex.create(spark,
          opts("index-path"), opts.getOrElse("index-table", "term_postings"))
        println("created term posting table")
      case "term-refresh" =>
        // one AvailableNow catch-up: tombstone vanished postings,
        // upsert changed tf, write nothing for unchanged
        val tIdx = opts.getOrElse("index-path", opts("path"))
        val tTbl = opts.getOrElse("index-table", "term_postings")
        val ckpt = opts.getOrElse("checkpoint",
          new org.apache.hadoop.fs.Path(tIdx,
            tTbl + "/_refresh_checkpoint").toString)
        val q = graft.sources.TermIndex.refresh(spark,
          opts("path"), opts("table"), opts.getOrElse("text-col", "text"),
          tIdx, tTbl, ckpt)
        q.awaitTermination()
        println(s"term postings refreshed; version now " +
          AzofTable(spark, tIdx, tTbl).currentVersion)
      case "term-search" =>
        // boolean search served from the postings: --terms a,b
        // [--any] (default: require ALL terms)
        // [--ranked --n-docs N] (tf·idf bit-magnitude ranking; N = live
        // doc count, e.g. from a count materialized view)
        val terms = opts("terms").split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        val tiIdx = opts.getOrElse("index-path", opts("path"))
        val tiTbl = opts.getOrElse("index-table", "term_postings")
        val out =
          if (opts.contains("ranked"))
            graft.sources.TermIndex.searchRanked(spark, tiIdx, tiTbl,
                terms, opts("n-docs").toLong)
              .orderBy(org.apache.spark.sql.functions.col("score").desc,
                org.apache.spark.sql.functions.col("doc"))
          else
            graft.sources.TermIndex.search(spark, tiIdx, tiTbl,
                terms, requireAll = !opts.contains("any"))
              .orderBy(org.apache.spark.sql.functions.col("sum_tf").desc,
                org.apache.spark.sql.functions.col("doc"))
        out.show(numRows = 10000, truncate = false)
      case "term-phrase" =>
        // phrase search from the POSITIONAL postings: --terms big,order
        // → docs where the terms appear consecutively + occurrence count
        val pTerms = opts("terms").split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        graft.sources.TermIndex.searchPhrase(spark,
            opts.getOrElse("index-path", opts("path")),
            opts.getOrElse("index-table", "term_postings"), pTerms)
          .orderBy(org.apache.spark.sql.functions.col("n_hits").desc,
            org.apache.spark.sql.functions.col("doc"))
          .show(numRows = 10000, truncate = false)
      case "term-bm25" =>
        // BM25-ranked search: --terms a,b → docs containing every term
        // (or ANY with --any — missing terms contribute 0),
        // tf-saturated + length-normalized score from the postings,
        // the __dl doc lengths, and the one-row __st stats
        val bmTerms = opts("terms").split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        graft.sources.TermIndex.searchBm25(spark,
            opts.getOrElse("index-path", opts("path")),
            opts.getOrElse("index-table", "term_postings"), bmTerms,
            requireAll = !opts.contains("any"))
          .orderBy(org.apache.spark.sql.functions.col("score").desc,
            org.apache.spark.sql.functions.col("doc"))
          .show(numRows = 100, truncate = false)
      case "term-near" =>
        // proximity search: --terms a,b --max-dist 5 → docs where the
        // two terms occur within the window, pair count + min distance
        val nTerms = opts("terms").split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        require(nTerms.size == 2, "term-near takes exactly two terms")
        graft.sources.TermIndex.searchNear(spark,
            opts.getOrElse("index-path", opts("path")),
            opts.getOrElse("index-table", "term_postings"),
            nTerms(0), nTerms(1), opts.getOrElse("max-dist", "5").toInt)
          .orderBy(org.apache.spark.sql.functions.col("min_dist"),
            org.apache.spark.sql.functions.col("doc"))
          .show(numRows = 10000, truncate = false)
      case "term-prefix" =>
        // prefix search: --prefix sc → docs containing any term starting
        // with the prefix (ONE key-range posting read)
        graft.sources.TermIndex.searchPrefix(spark,
            opts.getOrElse("index-path", opts("path")),
            opts.getOrElse("index-table", "term_postings"), opts("prefix"))
          .orderBy(org.apache.spark.sql.functions.col("sum_tf").desc,
            org.apache.spark.sql.functions.col("doc"))
          .show(numRows = 10000, truncate = false)
      case "term-rebuild" =>
        // epoch rebuild (the ROLLBACK reconciliation hatch)
        val n = graft.sources.TermIndex.rebuildEpoch(spark,
          opts("path"), opts("table"), opts.getOrElse("text-col", "text"),
          opts.getOrElse("index-path", opts("path")),
          opts.getOrElse("new-table", "term_postings_next"),
          opts.get("at").map(Instant.parse).getOrElse(Instant.now()))
        println(s"rebuilt term postings epoch: $n postings")
      case "mv-create" =>
        // persisted incremental materialized aggregate view:
        // mv-create --path L --table T --group-cols g1,g2
        //   [--sum-cols a,b] [--minmax-cols c]
        //   [--filter "<sql predicate>"]  (a FILTERED/partial view)
        //   [--index-path L2] [--index-table mv]
        graft.sources.MatView.create(spark,
          opts("path"), opts("table"),
          opts.getOrElse("index-path", opts("path")),
          opts.getOrElse("index-table", "mv"), cliViewDef(opts))
        println("created materialized view table")
      case "mv-refresh" =>
        // one AvailableNow catch-up: upsert old−pre+new per touched
        // group; min/max rescan confined to groups that lost rows
        val mvIdx = opts.getOrElse("index-path", opts("path"))
        val mvTbl = opts.getOrElse("index-table", "mv")
        val ckpt = opts.getOrElse("checkpoint",
          new org.apache.hadoop.fs.Path(mvIdx,
            mvTbl + "/_refresh_checkpoint").toString)
        val q = graft.sources.MatView.refresh(spark,
          opts("path"), opts("table"), mvIdx, mvTbl, cliViewDef(opts), ckpt)
        q.awaitTermination()
        println(s"materialized view refreshed; version now " +
          AzofTable(spark, mvIdx, mvTbl).currentVersion)
      case "mv-serve" =>
        // the served view: live groups' counts/sums/extrema
        val vd = cliViewDef(opts)
        graft.sources.MatView.serve(spark,
            opts.getOrElse("index-path", opts("path")),
            opts.getOrElse("index-table", "mv"), vd)
          .orderBy(vd.groupCols.map(org.apache.spark.sql.functions.col): _*)
          .show(numRows = 10000, truncate = false)
      case "mv-distinct" =>
        // exact COUNT(DISTINCT) from the refcounted support table:
        //   mv-distinct --path L --index-table mv --group-cols g
        //     --distinct-cols b --col b [--by g2[,g3]]  (--by empty =
        //     global; defaults to the view's group columns)
        val vd = cliViewDef(opts)
        val dcol = opts.getOrElse("col", vd.distinctCols.head)
        val by = opts.get("by")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(vd.groupCols)
        val out = graft.sources.MatView.countDistinct(spark,
          opts.getOrElse("index-path", opts("path")),
          opts.getOrElse("index-table", "mv"), vd, dcol, by)
        (if (by.isEmpty) out
         else out.orderBy(by.map(org.apache.spark.sql.functions.col): _*))
          .show(numRows = 10000, truncate = false)
      case "mv-approx" =>
        // APPROX_COUNT_DISTINCT from the view's HLL sketch column:
        //   mv-approx --path L --index-table mv --group-cols g
        //     --approx-cols a --col a [--by g2]  (--by empty = global)
        val avd = cliViewDef(opts)
        require(opts.contains("col") || avd.approxCols.nonEmpty,
          "mv-approx needs the sketch column: pass --col <c> or " +
            "declare it via --approx-cols <c>")
        val acol = opts.getOrElse("col", avd.approxCols.head)
        val aby = opts.get("by")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(avd.groupCols)
        val aout = graft.sources.MatView.approxDistinct(spark,
          opts.getOrElse("index-path", opts("path")),
          opts.getOrElse("index-table", "mv"), avd, acol, aby)
        (if (aby.isEmpty) aout
         else aout.orderBy(aby.map(org.apache.spark.sql.functions.col): _*))
          .show(numRows = 10000, truncate = false)
      case "jv-approx" =>
        // the star twin: jv-approx --path L --index-table jv
        //   --group-cols g --fk-col fk --dim-cols g --approx-cols a
        //   --col a [--by g2]
        val ajd = cliJoinViewDef(opts)
        require(opts.contains("col") || ajd.approxCols.nonEmpty,
          "jv-approx needs the sketch column: pass --col <c> or " +
            "declare it via --approx-cols <c>")
        val ajcol = opts.getOrElse("col", ajd.approxCols.head)
        val ajby = opts.get("by")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(ajd.groupCols)
        val ajout = graft.sources.JoinView.approxDistinct(spark,
          opts.getOrElse("index-path", opts("path")),
          opts.getOrElse("index-table", "jv"), ajd, ajcol, ajby)
        (if (ajby.isEmpty) ajout
         else ajout
           .orderBy(ajby.map(org.apache.spark.sql.functions.col): _*))
          .show(numRows = 10000, truncate = false)
      case "mv-histogram" =>
        // exact value histogram / heavy hitters from the support table
        // (incl. the NULL bucket): mv-histogram --path L --index-table
        // mv --group-cols g --distinct-cols b --col b [--by g2]
        // [--measures v1,v2 (declared sum cols: per-value sum/nn
        // totals)] [--top K]
        val hvd = cliViewDef(opts)
        val hcol = opts.getOrElse("col", hvd.distinctCols.head)
        val hby = opts.get("by")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(hvd.groupCols)
        val hms = opts.get("measures")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil)
        val h = graft.sources.MatView.valueHistogram(spark,
          opts.getOrElse("index-path", opts("path")),
          opts.getOrElse("index-table", "mv"), hvd, hcol, hby,
          measures = hms)
          .orderBy(org.apache.spark.sql.functions.col("n_rows").desc)
        opts.get("top").map(k => h.limit(k.toInt)).getOrElse(h)
          .show(numRows = 10000, truncate = false)
      case "jv-histogram" =>
        // the star twin: jv-histogram --path L --index-table jv
        //   --group-cols g --fk-col fk --dim-cols g --distinct-cols a
        //   --col a [--by g2] [--measures v1,v2] [--top K]
        val hjd = cliJoinViewDef(opts)
        val hjcol = opts.getOrElse("col", hjd.distinctCols.head)
        val hjby = opts.get("by")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(hjd.groupCols)
        val hjms = opts.get("measures")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil)
        val hj = graft.sources.JoinView.valueHistogram(spark,
          opts.getOrElse("index-path", opts("path")),
          opts.getOrElse("index-table", "jv"), hjd, hjcol, hjby,
          measures = hjms)
          .orderBy(org.apache.spark.sql.functions.col("n_rows").desc)
        opts.get("top").map(k => hj.limit(k.toInt)).getOrElse(hj)
          .show(numRows = 10000, truncate = false)
      case "mv-rebuild" =>
        // epoch rebuild: retrain the view one-shot from the LIVE corpus
        // into a fresh table (the ROLLBACK reconciliation hatch)
        val n = graft.sources.MatView.rebuildEpoch(spark,
          opts("path"), opts("table"),
          opts.getOrElse("index-path", opts("path")),
          opts.getOrElse("new-table", "mv_next"), cliViewDef(opts),
          opts.get("at").map(Instant.parse).getOrElse(Instant.now()))
        println(s"rebuilt materialized view epoch: $n groups")
      case "sem-verdicts" =>
        // the persisted verdicts: (vec_id, cluster_id, kept) — or
        // (vec_key, ...) when the index's frozen model is keyed
        val semIdxLake = opts.getOrElse("index-path", opts("path"))
        val semV = graft.sources.SemDedupIndex.verdictsAuto(spark,
          semIdxLake, opts("index-table"))
        semV.orderBy(semV.columns.head)
          .show(numRows = 10000, truncate = false)
      case "dedup-rebuild" =>
        // epoch rebuild: re-cluster the current corpus from the
        // persisted signatures into a FRESH components table (the
        // reconciliation for similarity-breaking revisions/deletes,
        // which the monotone ingest merge never splits):
        //   dedup-rebuild --path L --table SRC --index-path L2
        //     [--new-cc-table components_next] [--text-col text]
        //     [--min-jaccard 0.5] [--at TS] [--checkpoint DIR]
        // same stable checkpoint as dedup-ingest: the rebuild shares the
        // signature catch-up, so sharing its checkpoint is what keeps
        // that catch-up exactly-once across ingest and rebuild runs
        val ckpt = opts.getOrElse("checkpoint",
          new org.apache.hadoop.fs.Path(opts("index-path"),
            opts.getOrElse("sig-table", "minhash_sig") +
              "/_refresh_checkpoint").toString)
        val at = opts.get("at")
          .map(graft.sources.AzofDataSource.parseInstant)
          .getOrElse(java.time.Instant.ofEpochMilli(
            System.currentTimeMillis()))
        val newTable = opts.getOrElse("new-cc-table", "components_next")
        val n = graft.sources.DedupFlow.rebuildEpoch(spark,
          opts("path"), opts("table"),
          opts.getOrElse("text-col", "text"),
          opts("index-path"), ckpt, at,
          sigTable = opts.getOrElse("sig-table", "minhash_sig"),
          newCcTable = newTable,
          minJaccard = opts.getOrElse("min-jaccard", "0.5").toDouble,
          keyMap = opts.get("key-map"))
        println(s"rebuilt epoch into $newTable: $n labeled docs; " +
          "serve with dedup-survivors --cc-table " + newTable)
      case "dedup-survivors" =>
        // the deduplicated corpus served from the persisted indexes
        // (--key-map = the surrogate-keyed variant, min-KEY canonical):
        //   dedup-survivors --path L --table SRC --index-path L2
        //     [--cc-table components] [--key-map key_map]
        opts.get("key-map") match {
          case Some(km) =>
            graft.sources.DedupFlow.survivorsKeyed(spark,
                opts("path"), opts("table"), opts("index-path"), km,
                opts.getOrElse("cc-table", "components"))
              .orderBy("doc_key")
              .show(numRows = 10000, truncate = false)
          case None =>
            graft.sources.DedupFlow.survivors(spark,
                opts("path"), opts("table"), opts("index-path"),
                opts.getOrElse("cc-table", "components"))
              .orderBy("doc_id")
              .show(numRows = 10000, truncate = false)
        }
      case "dedup-apply" =>
        // tombstone-delete every live non-canonical doc, per the
        // persisted indexes — the corpus BECOMES the dedup verdict:
        //   dedup-apply --path L --table SRC --index-path L2
        //     [--cc-table components] [--key-map key_map]
        //     [--sem-path L3 --sem-table IDX]  (also drop SemDeDup's
        //     kept=false docs — the p02 composition, applied)
        //     [--contain-path L4 --contain-table contain_pairs
        //      --contain-threshold 0.9]  (also drop the contained side
        //     of persisted containment pairs — all three families in
        //     one apply)
        val n = graft.sources.DedupFlow.applyVerdict(spark,
          opts("path"), opts("table"), opts("index-path"),
          opts.getOrElse("cc-table", "components"),
          opts.get("key-map"),
          opts.get("sem-path").map(p =>
            (p, opts.getOrElse("sem-table", "sem"))),
          containIndex = opts.get("contain-path").map(p =>
            (p, opts.getOrElse("contain-table", "contain_pairs"))),
          containThreshold =
            opts.getOrElse("contain-threshold", "0.9").toDouble,
          // --branch B: STAGE the takedown on a branch — audit the
          // delete set (changes --branch / publish_preview), then
          // fast-forward to make it live
          branch = opts.get("branch"))
        println(
          if (n == 0) "nothing to delete: corpus already canonical"
          else opts.get("branch").fold(
            s"deleted $n non-canonical doc(s); version now " +
              graft.format.AzofTable(spark, opts("path"), opts("table"))
                .currentVersion)(b =>
            s"staged $n non-canonical doc deletion(s) on branch '$b' — " +
              "audit with changes --branch, publish with fast-forward"))
      case "pq-search" =>
        // ADC top-k FROM the persisted codes; query vectors come from
        // the source rows named by --query-keys. --rerank R adds the
        // exact refine over the source vectors.
        //   pq-search --path L --table SRC --index-table IDX
        //     --query-keys k1,k2 [--k 10] [--rerank 0] [--vec-col vec]
        import org.apache.spark.sql.functions.{col, from_json}
        import spark.implicits._
        val e = AzofScan.scan(spark, opts("path"), opts("table"))
          .select(col(TableSchema.KeyName).cast("long").as("_id"),
            from_json(col(opts.getOrElse("vec-col", "vec")),
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.DoubleType)).as("_v"))
        val keys = opts("query-keys").split(',').map(_.trim.toLong).toSeq
        val queries = e.where(col("_id").isin(keys: _*))
          .as[(Long, Array[Double])].collect()
        require(queries.nonEmpty, "no source rows match --query-keys")
        val rerank = opts.getOrElse("rerank", "0").toInt
        graft.sources.PqIndex.topK(spark,
            opts.getOrElse("index-path", opts("path")), opts("index-table"),
            queries, k = opts.getOrElse("k", "10").toInt,
            rerank = rerank,
            rawVectors = if (rerank > 0) Some(e) else None)
          .orderBy("query_id", "rnk")
          .show(numRows = 1000, truncate = false)
      case "sql" =>
        // --catalog NAME additionally registers the DSv2 catalog over
        // --path, enabling DDL/DML: CREATE TABLE NAME.t ... USING azof,
        // INSERT INTO NAME.t VALUES ..., ALTER TABLE NAME.t ADD COLUMN
        spark.conf.set("spark.azof.path", opts("path"))
        opts.get("catalog").foreach { c =>
          spark.conf.set(s"spark.sql.catalog.$c",
            classOf[graft.sources.AzofCatalog].getName)
          spark.conf.set(s"spark.sql.catalog.$c.path", opts("path"))
        }
        // --wap-branch B: route every unpinned table load (reads AND
        // INSERTs) through branch B for this statement — the
        // write-audit-publish session conf
        opts.get("wap-branch").foreach(b =>
          spark.conf.set(graft.sources.AzofCatalog.WapBranchConf, b))
        // --mv-rewrite mv1,mv2: answer covered aggregates from the
        // named materialized views when fresh (MvRewriteRule)
        opts.get("mv-rewrite").foreach(v =>
          spark.conf.set("spark.azof.mv.rewrite", v))
        // --query takes a script: statements split on ';' outside
        // single-quoted literals, each run in order, each result shown
        AzofCli.splitSql(opts("query")).foreach(stmt =>
          spark.sql(stmt).show(numRows = 1000, truncate = false))
      case "read" =>
        // the DataFrameReader surface (works in vanilla sessions too):
        //   read --path L --table T [--as-of TS | --version N] [--key K[,K...]]
        // --key is a point lookup: the WHERE flows through the relation's
        // pushdown into stats-based file skipping (KV engines answer
        // point lookups without scanning every time-pruned file)
        val r0 = spark.read.format("azof").option("table", opts("table"))
        val r1 = opts.get("as-of").fold(r0)(r0.option("asOf", _))
        val r2 = opts.get("version").fold(r1)(r1.option("versionAsOf", _))
        val df = r2.load(opts("path"))
        val looked = opts.get("key").fold(df)(ks =>
          df.where(org.apache.spark.sql.functions.col("key")
            .isin(ks.split(",").toSeq: _*)))
        looked.show(numRows = 1000, truncate = false)
      case "export" =>
        // training-data export over a FROZEN table version (the ranks
        // are snapshot-scoped — see operators.Packing):
        //   export --path L --table T --mode <shards|sequences|pack>
        //     --out DIR [--as-of TS | --version N] [--text-col value]
        //     [--shard-size 1024 | --budget 2048] [--salt p1]
        // shards: one directory per shard_id, every shard full but the
        // last; sequences: budget-exact token chunks; pack: the
        // per-doc assignment table.
        import org.apache.spark.sql.functions.col
        val r0 = spark.read.format("azof").option("table", opts("table"))
        val r1 = opts.get("as-of").fold(r0)(r0.option("asOf", _))
        val r2 = opts.get("version").fold(r1)(r1.option("versionAsOf", _))
        val df = r2.load(opts("path"))
        val salt = opts.getOrElse("salt", "p1")
        val textCol = col(opts.getOrElse("text-col", "value"))
        val out = opts("out")
        opts.getOrElse("mode", "shards") match {
          case "shards" =>
            val n = opts.getOrElse("shard-size", "1024").toLong
            graft.operators.Packing.shardAssign(df, col("key"), n, salt)
              .join(df, col("doc_id") === col("key"))
              .drop("doc_id")
              .write.mode("overwrite").partitionBy("shard_id").parquet(out)
            println(s"exported shards of $n to $out (salt=$salt)")
          case "sequences" =>
            val b = opts.getOrElse("budget", "2048").toLong
            graft.operators.Packing.emitSequences(df, textCol, col("key"),
                b, salt)
              .write.mode("overwrite").parquet(out)
            println(s"exported $b-token sequences to $out (salt=$salt)")
          case "pack" =>
            val b = opts.getOrElse("budget", "2048").toLong
            graft.operators.Packing.packSequences(df, textCol, col("key"),
                b, salt)
              .write.mode("overwrite").parquet(out)
            println(s"exported packing assignment to $out (salt=$salt)")
          case m => System.err.println(s"unknown export mode: $m"); sys.exit(2)
        }
      case other =>
        System.err.println(s"unknown command: $other")
        sys.exit(2)
    } finally spark.stop()
  }
}
