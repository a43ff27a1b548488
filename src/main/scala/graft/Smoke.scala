package graft

import org.apache.spark.sql.SparkSession

/** Dev-only sanity main: confirm every testdata table loads (incl. the
  * nanosecond-precision `events.ts` parquet column) and print schemas. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { n =>
      val df = Tables.load(spark, dir, n)
      println(s"== $n rows=${df.count()}")
      df.printSchema()
      df.show(2, 60)
    }
    spark.stop()
  }
}
