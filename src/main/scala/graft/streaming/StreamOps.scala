package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators with CUSTOM state — the capability tier
  * above watermarked window aggs (StreamingSpec covers those): arbitrary
  * per-key state via flatMapGroupsWithState, the streaming analog of the
  * engine's batch sessionize (GraftQueries q_sessionize: per-user sessions
  * split on a 30-minute silence gap).
  *
  * Scale design: state is O(1) per live user key (open-session triple),
  * keys expire via event-time timeout as the watermark passes their
  * session gap — a 10^9-user stream holds state only for users active
  * within the gap horizon, and the shuffle is one hash exchange on
  * user_id. Output mode Append: a session row is emitted exactly once,
  * when it provably cannot extend (a later event within the gap would
  * contradict the watermark). */
object StreamOps {

  /** closed session: [start_us, end_us] micros, event count */
  case class Session(user_id: String, start_us: Long, end_us: Long,
                     n_events: Long)
  /** open-session state per user */
  case class OpenSess(startUs: Long, lastUs: Long, n: Long)

  /** Streaming exact dedup over a document stream: first occurrence of
    * each content hash passes, later ones drop. Composes the built-in
    * stateful dropDuplicates (preference order: existing op over custom
    * state); with a watermark column present the state expires like the
    * sessionizer's. At 10^12 docs the state is one hash per distinct
    * document within the watermark horizon. */
  def dedupExact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("content_hash", xxhash64(col(textCol)))
      .dropDuplicates("content_hash")

  /** Gap-based sessionization of an event STREAM. `events` must carry
    * user_id and a ts column castable to timestamp; exactly the batch
    * q_sessionize session rule (new session when silence > gapUs). A
    * session is emitted once the event-time watermark passes its last
    * event + gap (EventTimeTimeout) or when a later in-stream event of
    * the same user opens the next session. */
  def sessionize(events: DataFrame, gapUs: Long = 1800000000L,
                 watermarkDelay: String = "0 seconds"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val fn = (user: String, it: Iterator[(String, java.sql.Timestamp, Long)],
              state: GroupState[OpenSess]) => {
      if (state.hasTimedOut) {
        // watermark passed lastUs + gap: the open session cannot extend
        val s = state.get
        state.remove()
        Iterator.single(Session(user, s.startUs, s.lastUs, s.n))
      } else {
        val ts = it.map(_._3).toArray
        java.util.Arrays.sort(ts)
        val out = scala.collection.mutable.ArrayBuffer[Session]()
        var cur = state.getOption.orNull
        var i = 0
        while (i < ts.length) {
          val t = ts(i)
          if (cur == null) cur = OpenSess(t, t, 1)
          else if (t - cur.lastUs > gapUs) {
            // silence gap inside the batch: the previous session closed
            out += Session(user, cur.startUs, cur.lastUs, cur.n)
            cur = OpenSess(t, t, 1)
          } else cur = OpenSess(cur.startUs, math.max(cur.lastUs, t), cur.n + 1)
          i += 1
        }
        if (cur != null) {
          state.update(cur)
          // fire when event time passes the gap after the last event
          state.setTimeoutTimestamp(cur.lastUs / 1000L + gapUs / 1000L + 1L)
        }
        out.iterator
      }
    }
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"))
      .as[(String, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
