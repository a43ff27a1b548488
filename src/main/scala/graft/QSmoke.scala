package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: run the round-10 new queries at a given sf dir and show rows. */
object QSmoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q123_record_linkage", "q124_hybrid_rrf", "q125_cluster_safe_split",
      "q126_interval_overlap", "q127_theta_sketch")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, dir)
      val rows = df.count()
      println(f"== $n rows=$rows (${(System.nanoTime()-t0)/1e9}%.2f s)")
      df.show(8, 40)
    }
    spark.stop()
  }
}
