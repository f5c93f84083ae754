package graft.format

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import java.time.format.DateTimeFormatter
import java.time.{Instant, OffsetDateTime, ZoneOffset}
import scala.jdk.CollectionConverters._

/** JSON (de)serialization of snapshot documents, byte-compatible with the
  * reference's serde encoding (reference: crates/azof/src/metadata.rs:9-45,
  * 107-162): enum types as bare strings ("String"|"Int"|"Boolean"|
  * "DateTime"), timestamps RFC3339 with milliseconds
  * ("%Y-%m-%dT%H:%M:%S%.3fZ"), and optional fields *omitted* (not null).
  * Uses Jackson's tree model (Jackson ships with Spark).
  */
object SnapshotCodec {
  private val mapper = new ObjectMapper()

  /** Three-way classification of a snapshot document, for readers that
    * must decide whether an unreadable `s{N}.json` is crash debris or a
    * committed document they merely cannot understand:
    *
    *   - [[DocClass.Valid]] — parses as a snapshot; honor it.
    *   - [[DocClass.WellFormedUnknown]] — a well-formed top-level JSON
    *     object that does NOT parse as a snapshot. This is NOT crash
    *     debris: a temp+rename writer never lands partial bytes, and a
    *     crashed pre-staging writer leaves truncated (invalid) JSON —
    *     a complete object this codec rejects is most plausibly a
    *     NEWER engine's committed document. Skipping it would silently
    *     fork its commit out of the chain; deleting it would destroy a
    *     commit. Callers must fail loudly (the reference's contract:
    *     serde errors are loud, never skipped —
    *     crates/azof/src/metadata.rs:16-18).
    *   - [[DocClass.Malformed]] — invalid/truncated JSON (or a bare
    *     non-object scalar no engine generation would ever write): a
    *     writer died mid-write. Never committed — `version.txt` only
    *     ever names fully-written documents — so commit paths may skip
    *     past it and vacuum may expire it.
    *
    * Read errors are out of scope by design: classification takes the
    * document's BYTES, so a transient store/read failure surfaces as an
    * IOException at the read site and is never conflated with
    * corruption.
    */
  sealed trait DocClass
  object DocClass {
    final case class Valid(snapshot: Snapshot) extends DocClass
    final case class WellFormedUnknown(error: Throwable) extends DocClass
    final case class Malformed(error: Throwable) extends DocClass
  }

  def classify(json: String): DocClass =
    scala.util.Try(parse(json)) match {
      case scala.util.Success(s) => DocClass.Valid(s)
      case scala.util.Failure(parseErr) =>
        scala.util.Try(mapper.readTree(json)) match {
          case scala.util.Success(n) if n != null && n.isObject =>
            DocClass.WellFormedUnknown(parseErr)
          case _ => DocClass.Malformed(parseErr)
        }
    }

  private val writeFmt: DateTimeFormatter =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
      .withZone(ZoneOffset.UTC)

  /** RFC3339 parse accepting offsets, normalized to UTC
    * (reference parses with chrono's parse_from_rfc3339, metadata.rs:124-129).
    */
  def parseTimestamp(s: String): Instant = OffsetDateTime.parse(s).toInstant

  def formatTimestamp(t: Instant): String = writeFmt.format(t)

  def parse(json: String): Snapshot = {
    val root = mapper.readTree(json)
    val schema = parseSchema(root.get("schema"))
    val segments = arr(root.get("segments")).map(parseSegment)
    // Keep only entries whose value is actually integral: asLong() maps a
    // corrupt/foreign non-numeric value to 0, and a spurious appId -> 0
    // entry would make commitBatch treat that stream's batch 0 as a
    // replay and silently drop it. Malformed entries degrade away, the
    // same contract as parseStats/parseBloom.
    val batches = Option(root.get("stream_batches"))
      .filter(n => !n.isNull && n.isObject)
      .map(_.fields().asScala.toSeq
        .filter(e => e.getValue.isIntegralNumber && e.getValue.canConvertToLong)
        .map(e => e.getKey -> e.getValue.asLong()).toMap)
      .getOrElse(Map.empty[String, Long])
    // retired column names: malformed entries degrade away (same
    // contract as stream_batches), order preserved for render stability
    val retired = Option(root.get("retired_columns"))
      .filter(n => !n.isNull && n.isArray)
      .map(arr(_).filter(_.isTextual).map(_.asText()))
      .getOrElse(Seq.empty)
    // named-version refs (tag -> version): non-integral foreign values
    // degrade away (same contract as stream_batches) — a malformed ref
    // loses its tag, never the table
    val refs = Option(root.get("refs"))
      .filter(n => !n.isNull && n.isObject)
      .map(_.fields().asScala.toSeq
        .filter(e => e.getValue.isIntegralNumber && e.getValue.canConvertToLong)
        .map(e => e.getKey -> e.getValue.asLong()).toMap)
      .getOrElse(Map.empty[String, Long])
    // branch lineage tag + tree-parent version: a non-integral parent
    // degrades away (same contract as refs) — the doc stays readable,
    // only lineage walks lose the link and fail loudly where they need it
    val parent = Option(root.get("parent"))
      .filter(n => n.isIntegralNumber && n.canConvertToLong)
      .map(_.asLong())
    Snapshot(schema, segments, optText(root, "op"), batches, retired, refs,
      optText(root, "branch"), parent)
  }

  private def arr(n: JsonNode): Seq[JsonNode] =
    if (n == null || n.isNull) Seq.empty else n.elements().asScala.toSeq

  private def optText(n: JsonNode, field: String): Option[String] = {
    val v = n.get(field)
    if (v == null || v.isNull) None else Some(v.asText())
  }

  private def parseSchema(n: JsonNode): TableSchema =
    TableSchema(arr(n.get("columns")).map { c =>
      ColumnDef(
        c.get("name").asText(),
        ColumnType.fromJsonName(c.get("data_type").asText()),
        c.get("nullable").asBoolean(),
        // rename ext field; a physical equal to the logical name
        // normalizes away so rename-back round-trips to the plain shape
        physical = optText(c, "physical_name")
          .filter(_ != c.get("name").asText()))
    })

  private def parseSegment(n: JsonNode): Segment = Segment(
    id = n.get("id").asText(),
    start = parseTimestamp(n.get("start").asText()),
    end = optText(n, "end").map(parseTimestamp),
    file = optText(n, "file"),
    segments = arr(n.get("segments")).map(parseSegment),
    delta = arr(n.get("delta")).map(parseDelta),
    fileStats = parseStats(n.get("file_stats")))

  private def parseDelta(n: JsonNode): Delta = Delta(
    file = n.get("file").asText(),
    start = parseTimestamp(n.get("start").asText()),
    end = parseTimestamp(n.get("end").asText()),
    stats = parseStats(n.get("stats")),
    // strictly-boolean true only: a foreign writer's non-boolean value
    // degrades to false (the file reads as plain data; its marker
    // column, if any, is simply not consulted)
    tombstone = Option(n.get("tombstone")).exists(v =>
      v.isBoolean && v.asBoolean()),
    // commit-sequence ext field: non-integral foreign values degrade to
    // None (the delta orders by precedence position, the pre-seq way)
    seq = Option(n.get("seq"))
      .filter(v => v.isIntegralNumber).map(_.asLong()),
    // single-version provenance: strictly-boolean true only (a foreign
    // non-boolean degrades to false = the conservative closure path)
    unique = Option(n.get("unique")).exists(v =>
      v.isBoolean && v.asBoolean()))

  /** Key-range stats ext field ([[FileStats]]): absent, null, or partial
    * objects (a foreign writer's different stats shape) all degrade to
    * None — skipping is an optimization, never a parse requirement. The
    * optional `key_bloom` sub-object degrades independently.
    */
  private def parseStats(n: JsonNode): Option[FileStats] =
    for {
      node <- Option(n) if !node.isNull
      mn <- optText(node, "key_min")
      mx <- optText(node, "key_max")
    } yield FileStats(mn, mx, parseBloom(node.get("key_bloom")),
      parseColStats(node.get("col_stats")),
      // row count ext: non-integral foreign values degrade away
      Option(node.get("rows")).filter(_.isIntegralNumber).map(_.asLong()))

  /** Value-column ranges sub-object ([[ColRange]]): absent / malformed
    * entries degrade per column — skipping is optional, never required.
    */
  private def parseColStats(n: JsonNode): Map[String, ColRange] =
    Option(n).filter(v => !v.isNull && v.isObject).map { node =>
      val it = node.properties().iterator()
      val b = Map.newBuilder[String, ColRange]
      while (it.hasNext) {
        val e = it.next()
        for {
          mn <- optText(e.getValue, "min")
          mx <- optText(e.getValue, "max")
        } b += e.getKey -> ColRange(mn, mx)
      }
      b.result()
    }.getOrElse(Map.empty)

  private def parseBloom(n: JsonNode): Option[KeyBloom] =
    for {
      node <- Option(n) if !node.isNull && node.isObject
      bits <- Option(node.get("bits")).filter(_.isInt).map(_.asInt())
      k <- Option(node.get("k")).filter(_.isInt).map(_.asInt())
      b64 <- optText(node, "b64")
      if bits > 0 && bits % 8 == 0 && k > 0
      // the payload must actually decode to exactly bits/8 bytes NOW —
      // a corrupt/truncated filter discovered lazily inside a scan's
      // membership test would fail the query instead of degrading
      decoded <- scala.util.Try(
        java.util.Base64.getDecoder.decode(b64)).toOption
      if decoded.length == bits / 8
    } yield KeyBloom(bits, k, b64)

  def render(s: Snapshot): String = {
    val root = mapper.createObjectNode()
    val schemaNode = root.putObject("schema")
    val cols = schemaNode.putArray("columns")
    s.schema.columns.foreach { c =>
      val cn = cols.addObject()
      cn.put("name", c.name)
      cn.put("data_type", c.dataType.jsonName)
      cn.put("nullable", c.nullable)
      c.physical.filter(_ != c.name).foreach { p =>
        cn.put("physical_name", p); ()
      }
    }
    val segs = root.putArray("segments")
    s.segments.foreach(seg => renderSegment(segs.addObject(), seg))
    s.op.foreach(o => root.put("op", o))
    if (s.streamBatches.nonEmpty) {
      val bn = root.putObject("stream_batches")
      // sorted for deterministic bytes (snapshot docs are content-compared
      // in specs and by humans)
      s.streamBatches.toSeq.sortBy(_._1).foreach { case (k, v) =>
        bn.put(k, v)
      }
    }
    if (s.retired.nonEmpty) {
      val rn = root.putArray("retired_columns")
      s.retired.foreach(rn.add)
    }
    if (s.refs.nonEmpty) {
      val fn = root.putObject("refs")
      s.refs.toSeq.sortBy(_._1).foreach { case (k, v) => fn.put(k, v) }
    }
    s.branch.foreach(b => root.put("branch", b))
    s.parent.foreach(p => root.put("parent", p))
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  private def renderStats(node: ObjectNode, field: String, st: FileStats): Unit = {
    val sn = node.putObject(field)
    sn.put("key_min", st.keyMin)
    sn.put("key_max", st.keyMax)
    st.rows.foreach { r => sn.put("rows", r); () }
    st.bloom.foreach { b =>
      val bn = sn.putObject("key_bloom")
      bn.put("bits", b.bits)
      bn.put("k", b.k)
      bn.put("b64", b.b64)
    }
    if (st.cols.nonEmpty) {
      val cn = sn.putObject("col_stats")
      st.cols.toSeq.sortBy(_._1).foreach { case (name, r) =>
        val rn = cn.putObject(name)
        rn.put("min", r.min)
        rn.put("max", r.max)
        ()
      }
    }
    ()
  }

  private def renderSegment(node: ObjectNode, seg: Segment): Unit = {
    node.put("id", seg.id)
    node.put("start", formatTimestamp(seg.start))
    seg.end.foreach(e => node.put("end", formatTimestamp(e)))
    seg.file.foreach(f => node.put("file", f))
    seg.fileStats.foreach(st => renderStats(node, "file_stats", st))
    if (seg.segments.nonEmpty) {
      val children: ArrayNode = node.putArray("segments")
      seg.segments.foreach(c => renderSegment(children.addObject(), c))
    } else if (seg.end.isEmpty && seg.file.isEmpty && seg.delta.isEmpty) {
      // open segment explicitly listing no children (financials-style
      // `"segments": []`) — keep an empty array so an empty open segment
      // round-trips as written.
      node.putArray("segments")
      ()
    }
    if (seg.delta.nonEmpty) {
      val deltas = node.putArray("delta")
      seg.delta.foreach { d =>
        val dn = deltas.addObject()
        dn.put("file", d.file)
        dn.put("start", formatTimestamp(d.start))
        dn.put("end", formatTimestamp(d.end))
        d.stats.foreach(st => renderStats(dn, "stats", st))
        if (d.tombstone) { dn.put("tombstone", true); () }
        d.seq.foreach { v => dn.put("seq", v); () }
        if (d.unique) { dn.put("unique", true); () }
      }
    }
  }
}
