package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Exactly-once streaming MV maintenance: the q115 algebra driven by
  * foreachBatch into the bucketed upsert store, with per-key epoch replay
  * detection standing in for sink transactions. */
class IncrementalMvSpec extends SparkSuite {
  import spark.implicits._

  private val t0 = 1700000000000L

  private def mkDelta(rows: Seq[(Long, String, Double)]): DataFrame =
    rows.toDF("ms", "event_type", "value")
      .select(timestamp_millis(col("ms")).as("event_time"),
        col("event_type"), col("value"))

  private def fullRecompute(all: Seq[(Long, String, Double)]): Set[(String, String, Long, Long, Long)] =
    mkDelta(all)
      .select(col("event_type"), to_date(col("event_time")).cast("string").as("event_date"),
        floor(col("value") * 100).cast("long").as("cents"))
      .groupBy("event_type", "event_date")
      .agg(count(lit(1)).as("ct"), sum(col("cents")).as("sum_cents"),
        max(col("cents")).as("max_cents"))
      .as[(String, String, Long, Long, Long)].collect().toSet

  private def readMv(path: String): Set[(String, String, Long, Long, Long)] =
    IncrementalMv.readMv(spark, path)
      .select(col("event_type"), col("event_date").cast("string"),
        col("ct"), col("sum_cents"), col("max_cents"))
      .as[(String, String, Long, Long, Long)].collect().toSet

  test("micro-batched maintenance equals a one-pass recompute; full replay is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv").toString
    val day = 86400000L
    val b1 = Seq((t0, "view", 1.50), (t0 + 1000, "click", 2.25), (t0 + day, "view", 3.00))
    val b2 = Seq((t0 + 2000, "view", 0.75), (t0 + day + 1000, "click", 9.99))
    val b3 = Seq((t0 + 3000, "view", 4.20))
    IncrementalMv.applyBatch(spark, mkDelta(b1), dir, epoch = 0)
    IncrementalMv.applyBatch(spark, mkDelta(b2), dir, epoch = 1)
    IncrementalMv.applyBatch(spark, mkDelta(b3), dir, epoch = 2)
    val expect = fullRecompute(b1 ++ b2 ++ b3)
    assert(readMv(dir) == expect)
    // FULL replay of the last epoch (crash after sink write, before the
    // checkpoint commit): every key already carries last_epoch=2 → no-op
    IncrementalMv.applyBatch(spark, mkDelta(b3), dir, epoch = 2)
    assert(readMv(dir) == expect, "replayed epoch must not double-count")
    // replaying an EARLIER epoch (bogus rewind) must also be dropped
    IncrementalMv.applyBatch(spark, mkDelta(b2), dir, epoch = 1)
    assert(readMv(dir) == expect)
  }

  test("PARTIAL sink commit: replay applies only the keys the crash missed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-part").toString
    val b1 = Seq((t0, "view", 1.00), (t0 + 1000, "click", 2.00))
    IncrementalMv.applyBatch(spark, mkDelta(b1), dir, epoch = 0)
    // epoch 1 delta touches both keys, but the "crash" persisted only the
    // view key's bucket: simulate by applying the view half under epoch 1...
    val b2view = Seq((t0 + 2000, "view", 5.00))
    val b2click = Seq((t0 + 3000, "click", 7.00))
    IncrementalMv.applyBatch(spark, mkDelta(b2view), dir, epoch = 1)
    // ...then replaying the WHOLE epoch-1 batch: view is at last_epoch=1
    // (skipped), click is still at 0 (merged)
    IncrementalMv.applyBatch(spark, mkDelta(b2view ++ b2click), dir, epoch = 1)
    assert(readMv(dir) == fullRecompute(b1 ++ b2view ++ b2click),
      "partial-commit replay must fill only the missed keys, once")
  }

  test("real events table in 3 micro-batches equals the oracle-gated q115 MV") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-real").toString
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select(col("event_id"), col("event_time"), col("event_type"), col("value"))
    (0L to 2L).foreach { i =>
      IncrementalMv.applyBatch(spark,
        ev.filter(col("event_id") % 3 === i).drop("event_id"), dir, epoch = i)
    }
    val got = readMv(dir)
    // the q115 operator computes the same MV (its own equality with a
    // one-pass recompute is oracle-gated at sf0.01) — chain to it
    val q115 = graft.operators.Relational.incrementalStats(spark, sf0001)
      .select(col("event_type"), col("event_date").cast("string"),
        col("ct"), col("sum_cents"), col("max_cents"))
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got == q115, s"missing=${q115 -- got} extra=${got -- q115}")
  }

  test("streaming run: MemoryStream batches land exactly-once through foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-mv-stream")
    val store = base.resolve("store").toString
    val ckpt = base.resolve("ckpt").toString
    val ms = MemoryStream[(Long, String, Double)]
    val events = ms.toDS().toDF("ms", "event_type", "value")
      .select(timestamp_millis(col("ms")).as("event_time"),
        col("event_type"), col("value"))
    val rows1 = Seq((t0, "view", 1.10), (t0 + 1000, "click", 2.20))
    val rows2 = Seq((t0 + 2000, "view", 3.30))
    val q = IncrementalMv.run(spark, events, store, ckpt)
    ms.addData(rows1: _*); q.processAllAvailable()
    ms.addData(rows2: _*); q.processAllAvailable()
    q.stop()
    assert(readMv(store) == fullRecompute(rows1 ++ rows2))
  }
}
