package graft.format

import java.time.Instant

/** Time-travel coordinate for an azof table scan.
  *
  * Mirrors the reference's two-variant enum (reference:
  * crates/azof/src/as_of.rs:3-7): either the "current" open view of the
  * table, or a snapshot of every key as of an event-time instant.
  */
sealed trait AsOf
object AsOf {
  /** The current state: open-ended segments only. */
  case object Current extends AsOf

  /** State as of `ts` (inclusive): rows with `event_time <= ts`. */
  final case class EventTime(ts: Instant) extends AsOf
}
