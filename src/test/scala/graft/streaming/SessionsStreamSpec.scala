package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming session windows (Sessions.sessionize) must equal the batch
  * session build (Relational.userSessions, the q126 frame) over time-ordered
  * micro-batches of the REAL events table — including sessions spanning
  * batch boundaries, which only close when a later batch advances the
  * watermark past their end. */
class SessionsStreamSpec extends SparkSuite {
  import spark.implicits._

  test("streaming sessionize over 3 time-ordered micro-batches equals the batch userSessions") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select($"user_id".cast("long"), $"event_time")
      .as[(Long, java.sql.Timestamp)].collect()
      .sortBy(_._2.getTime)
    assert(ev.length > 100, "fixture too small to split meaningfully")
    val want = graft.operators.Relational.userSessions(
      graft.Tables.load(spark, sf0001, "events"))
      .select($"user_id", date_format($"st", "yyyy-MM-dd HH:mm:ss"),
        date_format($"en", "yyyy-MM-dd HH:mm:ss"), $"events")
      .as[(Long, String, String, Long)].collect().toSet

    // cut the stream INSIDE two multi-event sessions (midpoint between two
    // same-session events of some user), so sessions provably span
    // micro-batch boundaries and the state store does real work
    val gapMs = 30L * 60 * 1000
    val mids: Seq[Long] = ev.groupBy(_._1).values.flatMap { rows =>
      rows.map(_._2.getTime).sorted.toSeq.sliding(2).collect {
        case Seq(a, b) if b > a && b - a < gapMs => (a + b) / 2
      }
    }.toSeq.distinct.sorted
    assert(mids.size >= 2, "fixture has too few multi-event sessions to cut")
    val boundaries = Seq(mids.head, mids.last)
    val chunks = Seq(
      ev.filter(_._2.getTime <= boundaries(0)),
      ev.filter(e => e._2.getTime > boundaries(0) && e._2.getTime <= boundaries(1)),
      ev.filter(_._2.getTime > boundaries(1))).filter(_.nonEmpty)

    val ms = MemoryStream[(Long, Long)] // (user_id, epoch millis)
    val src = ms.toDS()
      .select(col("_1").as("user_id"), timestamp_millis(col("_2")).as("event_time"))
    val q = Sessions.sessionize(src).writeStream
      .format("memory").queryName("sessions_out").outputMode("append").start()
    try {
      chunks.foreach { c =>
        ms.addData(c.map(e => (e._1, e._2.getTime)).toSeq)
        q.processAllAvailable()
      }
      // a sentinel far beyond the last event advances the watermark so every
      // real session closes and appends; its own session stays open forever
      val flushTs = ev.last._2.getTime + 7L * 24 * 3600 * 1000
      ms.addData(Seq((-1L, flushTs)))
      q.processAllAvailable()
      val got = spark.table("sessions_out")
        .filter(col("user_id") =!= -1L)
        .select(col("user_id"), date_format(col("st"), "yyyy-MM-dd HH:mm:ss"),
          date_format(col("en"), "yyyy-MM-dd HH:mm:ss"), col("events"))
        .as[(Long, String, String, Long)].collect()
      assert(got.length == got.distinct.length, "a session appended twice")
      assert(got.toSet == want)
      // cross-batch coverage: the cuts were placed inside sessions, so at
      // least one emitted session MUST span a chunk boundary
      val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      assert(got.exists { s =>
        val st = fmt.parse(s._2).getTime
        val lastEv = fmt.parse(s._3).getTime - gapMs
        boundaries.exists(b => st <= b && b < lastEv)
      }, "no session spans a micro-batch boundary — the cut placement is broken")
    } finally q.stop()
  }
}
