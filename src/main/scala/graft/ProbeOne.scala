package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time ONE SparkEntry query end-to-end under Bench's exact
  * session config — the disagreement-resolver between Bench numbers and
  * phase-instrumented microbenches. */
object ProbeOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val warm = args.length > 2 && args(2) == "warm"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (warm) Tables.names.foreach { n =>
      try Tables.load(spark, dir, n).count() catch { case _: Throwable => () }
    }
    val t0 = System.nanoTime()
    val rows = SparkEntry.queries(name)(spark, dir).count()
    println(f"PROBE $name rows=$rows ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
