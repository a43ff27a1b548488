package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * Tables: region nation customer supplier part orders lineitem events
  * documents embeddings — one parquet file each under `sfDir`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Plan-level cache: re-loading the same table re-lists files and re-reads
  // footers per query; reusing the DataFrame reuses its InMemoryFileIndex.
  // Assumes the driver-contract invariant that the testdata parquet dirs are
  // immutable (a cached file index would serve stale listings otherwise).
  // Entries of stopped sessions are evicted on the next load so a JVM cycling
  // through sessions doesn't pin dead SparkContexts.
  private val loaded =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    loaded.keySet.removeIf(k => k._1.sparkContext.isStopped)
    loaded.computeIfAbsent((spark, dir, name), { _ =>
      if (name == "events") events(spark, dir)
      else spark.read.parquet(s"$dir/$name.parquet")
    })
  }

  /** Derive an `event_time` TimestampType column from `events.ts`, whatever
    * physical type the generator wrote it as. Current testdata stores
    * TIMESTAMP(MICROS) (Spark reads TIMESTAMP_NTZ; cast is value-identical with
    * the session TZ pinned UTC, matching DuckDB's naive read). Older generators
    * wrote TIMESTAMP(NANOS), which Spark's vectorized reader rejects — that
    * path reads raw Long nanos (legacy conf) and integer-truncates to micros,
    * the exact truncation DuckDB applies (verified: trunc, not round).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw =
      try spark.read.parquet(s"$dir/events.parquet")
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          // Nanos parquet fails schema conversion; re-read raw Long nanos.
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(s"$dir/events.parquet")
      }
    raw.schema("ts").dataType match {
      case LongType =>
        // `div` = integer division; `/` would promote to double and lose
        // precision beyond 2^53 nanos, shifting ~2% of rows by 1µs.
        raw.withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("event_time", col("ts").cast(TimestampType))
    }
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
