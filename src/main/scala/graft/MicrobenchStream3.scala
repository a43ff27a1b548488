package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: end-to-end maintenance rates of the session-3 streaming
  * maintainers (TopKStream, QualityStream, RateWatch) at sf0.1 — each
  * applyBatch timed INCLUDING its bucketed store commit and epoch-gate
  * reads, the same protocol as the round-10 Scd2Stream/IncrementalMv rate
  * table in PLANS.md. Results appended manually to PLANS.md. */
object MicrobenchStream3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def tmp(t: String) = java.nio.file.Files.createTempDirectory(s"mb3-$t").toString

    val ev = Tables.load(spark, dir, "events").persist()
    val n = ev.count()

    // TopKStream: 2 batches of the geometric-keyed stream
    val keyed = ev.select(
      graft.operators.Relational.geometricLevelKey(col("event_id")).as("key"),
      col("event_id")).persist()
    keyed.count()
    val (tc, tk) = (tmp("topk-cells"), tmp("topk-cand"))
    (0 to 1).foreach { i =>
      val b = keyed.filter(col("event_id") % 2 === i).select("key")
      val ct = b.count()
      val t0 = System.nanoTime()
      graft.streaming.TopKStream.applyBatch(spark, b, tc, tk, i.toLong)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"MICRO TopKStream batch $i: $ct%d keys in $s%.2f s = ${ct / s}%.0f keys/s")
    }

    // QualityStream: 2 batches of orders
    val o = Tables.load(spark, dir, "orders").persist()
    val no = o.count()
    val qs = tmp("quality")
    (0 to 1).foreach { i =>
      val b = o.filter(col("o_orderkey") % 2 === i)
      val ct = b.count()
      val t0 = System.nanoTime()
      graft.streaming.QualityStream.applyBatch(spark, b, qs, i.toLong)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"MICRO QualityStream batch $i: $ct%d rows in $s%.2f s = ${ct / s}%.0f rows/s")
    }

    // RateWatch: 2 batches of events + the read-side detector
    val rw = tmp("ratewatch")
    (0 to 1).foreach { i =>
      val b = ev.filter(col("event_id") % 2 === i)
        .select(col("event_type"), col("event_time"))
      val ct = b.count()
      val t0 = System.nanoTime()
      graft.streaming.RateWatch.applyBatch(spark, b, rw, i.toLong)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"MICRO RateWatch batch $i: $ct%d events in $s%.2f s = ${ct / s}%.0f events/s")
    }
    val t0 = System.nanoTime()
    val anomalies = graft.streaming.RateWatch.readAnomalies(spark, rw)
      .filter(col("anomaly")).count()
    println(f"MICRO RateWatch readAnomalies: $anomalies%d flagged in ${(System.nanoTime() - t0) / 1e9}%.2f s (read cost independent of absorbed volume)")
    println(s"MICRO corpus: $n events, $no orders (sf0.1)")
    spark.stop()
  }
}
