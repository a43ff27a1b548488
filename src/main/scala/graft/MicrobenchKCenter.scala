package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: KCenterStream maintenance rates — per-batch applyBatch cost
  * (k driver-round jobs + one candidate upsert; latency-dominated, row
  * count only prices the scan), readCenters latency off the candidate
  * store, and a forced compaction. Arg 1 = sf dir (default sf0.1); run it
  * against the 100× probe dir to see the scan term. */
object MicrobenchKCenter {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tmp(t: String) = java.nio.file.Files.createTempDirectory(s"mbkc-$t").toString

    val emb = Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").persist()
    emb.count()
    val store = tmp("store")
    (0 to 2).foreach { i =>
      val b = emb.filter(col("vec_id") % 3 === i).persist()
      val ct = b.count()
      val t0 = System.nanoTime()
      graft.streaming.KCenterStream.applyBatch(spark, b, store, i.toLong)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"MICRO KCenterStream applyBatch $i: $ct%d vecs in $s%.2f s = ${ct / s}%.0f vecs/s")
      b.unpersist()
    }
    val t1 = System.nanoTime()
    val k = graft.streaming.KCenterStream.readCenters(spark, store).count()
    println(f"MICRO KCenterStream readCenters: $k centers in ${(System.nanoTime() - t1) / 1e9}%.2f s")
    val t2 = System.nanoTime()
    graft.streaming.KCenterStream.compact(spark, store, capRows = 8L, keep = 16)
    println(f"MICRO KCenterStream compact(keep=16): ${(System.nanoTime() - t2) / 1e9}%.2f s")
    spark.stop()
  }
}
