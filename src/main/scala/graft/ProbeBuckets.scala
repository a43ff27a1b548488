package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFns.hyperplaneSigUdf
import graft.operators.Similarity

/** Dev-only (VERDICT r13 #1): print the bucket-occupancy histograms that
  * decide whether the LSH/IVF bucket joins stay bounded on a given
  * embeddings table — max/top-5 membership of (a) the q28/q168 4-plane
  * random-hyperplane signature and (b) the q33/q79 IVF cells from the
  * shared bounded-sample kmeans quantizer. Run against a ScaleGen
  * "clustered" dir vs the uniform one to see how much of the blob skew
  * each bucketing inherits (the hyperplane sig CANNOT split a tight blob —
  * every member shares every plane's sign — while kmeans puts multiple
  * centroids inside a heavy blob and splits it by the noise term). */
object ProbeBuckets {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    def top(df: org.apache.spark.sql.DataFrame, c: String): Unit = {
      val rows = df.groupBy(c).agg(count(lit(1)).as("m"))
        .orderBy(col("m").desc).limit(5).collect()
      val mx = rows.headOption.map(_.getLong(1)).getOrElse(0L)
      println(f"[$c] n=$n distinct>=${rows.length} max=$mx " +
        f"(${100.0 * mx / n}%.1f%%) top5=" +
        rows.map(r => s"${r.get(0)}:${r.getLong(1)}").mkString(","))
    }
    top(e.withColumn("sig", hyperplaneSigUdf(4)(col("embedding"))), "sig")
    val sample = e.filter(col("vec_id") < 1024).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val centroids = Similarity.trainCentroids(sample, k, iters = 5)
    val assignU = udf((v: Seq[Float]) =>
      Similarity.nearestCentroids(v, centroids, 1).head)
    top(e.withColumn("cell", assignU(col("embedding"))), "cell")
    spark.stop()
  }
}
