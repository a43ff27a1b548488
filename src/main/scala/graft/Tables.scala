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

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw Long nanos (legacy conf) and derive an
    * `event_time` TimestampType column by integer-truncating to micros — the exact
    * semantics DuckDB applies when it reads the same file (verified: trunc, not
    * round), so time bucketing agrees bit-for-bit with the oracle.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // `div` = integer division; `/` would promote to double and lose precision
    // beyond 2^53 nanos, shifting ~2% of rows by 1µs.
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
