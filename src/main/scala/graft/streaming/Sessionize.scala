package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization with `flatMapGroupsWithState` —
  * the custom-state streaming operator family the reference has no
  * analogue for (its streaming scan is unimplemented roadmap,
  * reference: README.md:158-159).
  *
  * Per user, events separated by gaps > `gapMs` split into sessions. A
  * session is emitted when it is CLOSED: either a later in-stream event
  * opens the next session, or the event-time watermark passes
  * `session end + gap` and the state times out. State per key is one open
  * session (three longs), so total state is bounded by |active keys|,
  * independent of stream length — the property that matters at scale.
  * Late events (behind the watermark) are dropped by Spark before the
  * state function runs.
  */
object Sessionize {

  case class Ev(user_id: Long, ts: Timestamp)
  case class Open(start: Long, end: Long, n: Long) // epoch MICROS
  case class SessionOut(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long)

  // Timestamps carry microseconds; Timestamp.getTime would truncate them
  // and break stream-equals-batch equality.
  private def toMicros(t: Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }
  private def fromMicros(us: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  private def close(userId: Long, s: Open): SessionOut =
    SessionOut(userId, fromMicros(s.start), fromMicros(s.end), s.n)

  /** State-transition function: merge the batch's events (sorted by time)
    * into the open session, emitting every session closed by an
    * intra-batch gap; on timeout emit the open session.
    */
  private[streaming] def update(gapMs: Long)(
      userId: Long, events: Iterator[Ev],
      state: GroupState[Open]): Iterator[SessionOut] = {
    if (!events.hasNext) {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(userId, _)).iterator
        state.remove()
        out
      } else Iterator.empty
    } else {
      val gapUs = gapMs * 1000L
      val sorted = events.map(e => toMicros(e.ts)).toArray.sorted
      var open = state.getOption.orNull
      val closed = Seq.newBuilder[SessionOut]
      sorted.foreach { t =>
        open = open match {
          case null => Open(t, t, 1)
          case s if t - s.end > gapUs =>
            closed += close(userId, s); Open(t, t, 1)
          case s => Open(s.start, math.max(s.end, t), s.n + 1)
        }
      }
      state.update(open)
      // timeout API is millis; round the end UP so the timeout never
      // fires a microsecond-fraction early
      state.setTimeoutTimestamp(Math.floorDiv(open.end + gapUs, 1000L) + 1L)
      closed.result().iterator
    }
  }

  /** events must carry `user_id` and a timestamp `ts`. */
  def sessions(
      events: DataFrame, gapMs: Long, watermark: String): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"))
      .withWatermark("ts", watermark)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(gapMs))
  }

  /** Batch oracle for the same session definition, for stream-equals-
    * batch assertions: sessions whose end precedes `horizon` are exactly
    * the ones the stream must have emitted once the watermark passed.
    */
  def sessionsBatch(spark: SparkSession, events: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events.select(col("user_id"), col("ts"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev"))) > gapMs * 1000L, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_id")
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("sess_id")
  }
}
