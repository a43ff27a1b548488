package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: FacilityStream maintenance rates — the absorb cost is the
  * interesting number here because the exact-greedy cell pass does
  * O(cells) work per point (9,216 cells at the m = 16 / k = 4 defaults,
  * ~10k primitive-long ops/point), so this measures vecs/s through one
  * stable absorb, one churn re-anchor (the count-gated one-scan event),
  * and the read (driver greedy over 9,216 bounded rows — should be
  * corpus-independent). Arg 1 = sf dir (default sf0.1); run it against
  * the 100× embeddings probe dir for the scan-term growth. */
object MicrobenchFacility {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tmp(t: String) = java.nio.file.Files.createTempDirectory(s"mbfa-$t").toString

    val emb = Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").persist()
    val n = emb.count()
    // md5 order driver-side, so batch 1 holds the global bottom-16 and the
    // follow-up batches keep the pool stable (the common absorb regime)...
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val order = emb.select("vec_id").as[Long].collect()
      .sortBy(id => (md5hex(id.toString), id))
    val bottom = order.take(16).toSet
    val (poolP, cellsP) = (tmp("pool"), tmp("cells"))
    val b1 = emb.filter(col("vec_id").isInCollection(bottom) ||
      col("vec_id") % 2 === 0).persist()
    val c1 = b1.count()
    var t0 = System.nanoTime()
    graft.streaming.FacilityStream.applyBatch(spark, b1, poolP, cellsP, 0L)
    var s = (System.nanoTime() - t0) / 1e9
    println(f"MICRO FacilityStream first absorb: $c1%d vecs in $s%.2f s = ${c1 / s}%.0f vecs/s")
    val b2 = emb.filter(!col("vec_id").isInCollection(bottom) &&
      col("vec_id") % 2 === 1).persist()
    val c2 = b2.count()
    t0 = System.nanoTime()
    graft.streaming.FacilityStream.applyBatch(spark, b2, poolP, cellsP, 1L)
    s = (System.nanoTime() - t0) / 1e9
    println(f"MICRO FacilityStream stable absorb: $c2%d vecs in $s%.2f s = ${c2 / s}%.0f vecs/s")
    // ...and the churn event on a fresh store pair: batch 1 withholds the
    // lowest-md5 id, batch 2 delivers it — the accessor re-scan fires
    val (poolC, cellsC) = (tmp("pool-c"), tmp("cells-c"))
    val lowest = order.head
    val a1 = emb.filter(col("vec_id") =!= lowest).persist(); a1.count()
    graft.streaming.FacilityStream.applyBatch(spark, a1, poolC, cellsC, 0L)
    t0 = System.nanoTime()
    graft.streaming.FacilityStream.applyBatch(spark,
      emb.filter(col("vec_id") === lowest), poolC, cellsC, 1L,
      reanchorWith = Some(() => emb))
    s = (System.nanoTime() - t0) / 1e9
    println(f"MICRO FacilityStream churn re-anchor: $n%d-vec corpus re-scan in $s%.2f s = ${n / s}%.0f vecs/s")
    t0 = System.nanoTime()
    val rows = graft.streaming.FacilityStream.readSelection(spark, poolP, cellsP).count()
    println(f"MICRO FacilityStream readSelection: $rows rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
