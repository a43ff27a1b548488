package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming session windows — the stateful twin of
  * [[graft.operators.Relational.userSessions]] (q126's session build, itself
  * the declarative q37): Spark's native `session_window` under a watermark,
  * in APPEND mode, so a session row is emitted exactly once, when the
  * watermark passes its end and no further event can extend or merge it.
  *
  * Why this is the 100 TB sessionization: session state lives in the state
  * store PER USER with watermark-driven eviction (a closed session's state
  * is dropped the moment it emits), so state size tracks the number of
  * users with an OPEN session — not history length. The batch q37/q126
  * construction re-scans the full log per run; this absorbs the log
  * incrementally at stream rate. Mapping: SURVEY §2 D4 (tumbling) extended
  * with the session shape the reference lacks but every clickstream DWS
  * layer wants; same watermark discipline as A23 (D2).
  *
  * Equivalence contract (SessionsStreamSpec): over time-ordered micro-batches
  * of the real events table, the appended rows equal the batch
  * `userSessions` output exactly — including sessions that SPAN batch
  * boundaries, which is where the state store (not per-batch grouping) does
  * the work. Events later than the watermark allows are dropped (D5), the
  * documented streaming divergence from the batch build.
  */
object Sessions {

  /** `events` needs (user_id, event_time); emits one row per CLOSED session:
    * (user_id, st, en, events) with `en = last_ts + gap` (half-open) —
    * the exact [[graft.operators.Relational.userSessions]] schema. */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "0 seconds"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(col("user_id"), session_window(col("event_time"), gap).as("sw"))
      .agg(count(lit(1)).as("events"))
      .select(col("user_id"), col("sw.start").as("st"), col("sw.end").as("en"),
        col("events"))
}
