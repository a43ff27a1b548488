package graft

import org.apache.spark.sql.SparkSession

/** Dev-only (VERDICT r13 #1): time the [[graft.operators.Similarity.knnEdges]]
  * build on a ScaleGen "clustered" dir, salted vs naive, to measure the
  * scaling exponent of the hot-bucket candidate join. Fresh process per
  * run — the layout-table session catalog is empty so the build always
  * executes. args: dir cap bucketCap. */
object MicrobenchKnn {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cap = args(1).toInt
    val bucketCap = args(2).toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val (_, edges) = graft.operators.Similarity.knnEdges(
      spark, dir, k = 3, cap = cap, bucketCap = bucketCap)
    val n = edges.count()
    println(f"KNNBENCH cap=$cap bucketCap=$bucketCap edges=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
