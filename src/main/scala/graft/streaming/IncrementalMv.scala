package graft.streaming

import graft.io.Io
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING incremental materialized-view maintenance — the streaming twin
  * of [[graft.operators.Relational.incrementalStats]] (q115) and the
  * Spark-first form of the reference's continuously-updated DWS stats
  * (ProductStatsApp keeps product aggregates current per window; here the
  * MV is a STORED table a micro-batch merges into).
  *
  * Per micro-batch: aggregate ONLY the delta (all measures algebraic —
  * count/sum merge by +, max by max), merge with the store rows of the
  * touched keys, and publish through [[Io.upsertDim]]'s bucketed
  * rename-aside commit (write amplification batch-proportional, never
  * table-proportional).
  *
  * Exactly-once across failures WITHOUT sink transactions: each MV row
  * carries `last_epoch`, the foreachBatch epoch that last contributed to
  * it. A replayed batch (crash between sink write and checkpoint commit —
  * Spark re-runs the epoch) finds `last_epoch >= epoch` on the keys it
  * already touched and drops them, so re-applying is a no-op PER KEY. That
  * per-key granularity also covers PARTIAL sink commits: upsertDim
  * publishes bucket-by-bucket, so a crash can leave some buckets updated
  * and others not — on replay, already-updated keys are skipped while
  * missed keys still merge. This is the idempotent-merge discipline every
  * exactly-once aggregation sink at 100 TB reduces to (Delta/Iceberg MERGE
  * with a txn-id column plays the same trick); the JDBC twin of the same
  * idea is [[Io.appendIdempotent]]'s epoch table.
  *
  * Holistic measures (exact distinct) are excluded by design — they don't
  * merge; mergeable sketches (q34 HLL / q111 CMS) are the 100 TB answer. */
object IncrementalMv {

  /** Algebraic per-(event_type, event_date) aggregate of one micro-batch.
    * `delta` needs event_time (timestamp) + event_type + value. */
  def deltaAgg(delta: DataFrame): DataFrame = delta
    .select(col("event_type"), to_date(col("event_time")).as("event_date"),
      floor(col("value") * 100).cast("long").as("cents"))
    .groupBy("event_type", "event_date")
    .agg(count(lit(1)).as("ct"), sum(col("cents")).as("sum_cents"),
      max(col("cents")).as("max_cents"))

  /** Merge one micro-batch into the MV store. Idempotent per (key, epoch):
    * re-applying the same epoch is a no-op for keys already at it. */
  def applyBatch(spark: SparkSession, delta: DataFrame, storePath: String,
                 epoch: Long): Unit = {
    val d = deltaAgg(delta).withColumn("k",
      concat_ws("|", col("event_type"), col("event_date").cast("string")))
    val marker = java.nio.file.Paths.get(storePath, "_buckets")
    val merged =
      if (!java.nio.file.Files.exists(marker)) d.withColumn("last_epoch", lit(epoch))
      else {
        val s = Io.readDim(spark, storePath)
        // replay detection: keys whose store row already saw this (or a
        // later) epoch have this batch's contribution — drop them
        val fresh = d
          .join(s.select(col("k"), col("last_epoch").as("__se")), Seq("k"), "left")
          .filter(col("__se").isNull || col("__se") < epoch)
          .drop("__se")
        // store values for TOUCHED keys only — untouched rows are never read
        // into the merge (upsertDim likewise never opens their buckets)
        val prev = s.join(fresh.select("k"), Seq("k"), "left_semi")
          .select(col("k"), col("ct").as("__pct"),
            col("sum_cents").as("__psum"), col("max_cents").as("__pmax"))
        fresh.join(prev, Seq("k"), "left")
          .select(col("k"), col("event_type"), col("event_date"),
            (col("ct") + coalesce(col("__pct"), lit(0L))).as("ct"),
            (col("sum_cents") + coalesce(col("__psum"), lit(0L))).as("sum_cents"),
            greatest(col("max_cents"), coalesce(col("__pmax"), col("max_cents")))
              .as("max_cents"),
            lit(epoch).as("last_epoch"))
      }
    Io.upsertDim(spark, merged, storePath, "k", "last_epoch")
  }

  /** Drive the maintenance from a streaming events frame. */
  def run(spark: SparkSession, events: DataFrame, storePath: String,
          checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (delta: DataFrame, epoch: Long) =>
        applyBatch(spark, delta, storePath, epoch)
      }
      .start()

  /** Read the current MV (drops the layout/epoch bookkeeping columns). */
  def readMv(spark: SparkSession, storePath: String): DataFrame =
    Io.readDim(spark, storePath)
      .select("event_type", "event_date", "ct", "sum_cents", "max_cents")
}
