package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // bench tables are single ~10-60MB parquet files: the default 128MB
      // split size would scan each on ONE core; 8MB splits spread the scan
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up: JVM/codegen paths + OS page cache for the inputs, so per-query
    // numbers measure operator cost, not cold-start.
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    // a failed query reports -1 (never a fast-looking elapsed time) and is
    // loudly visible on stderr — a regression must not flatter the benchmark
    val rt = Runtime.getRuntime
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val timed = try {
        fn(spark, sfDir).count()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          name -> -1.0
      }
      // Queries are independent runs: release anything this one persisted.
      // Operators that cache a build-step intermediate (clusters() labels,
      // ivfAnn's assigned corpus, cleanCorpus's survivor boundary) return
      // plans backed by those caches; without this, every later query runs
      // with that storage pinned — measured in round 2 as a uniform 2.5-3×
      // slowdown on the whole post-q32 block (BENCH_r02 vs r01).
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val usedMb = (rt.totalMemory() - rt.freeMemory()) >> 20
      System.err.println(f"[bench] ${timed._1} ${timed._2}%.2fs heapUsed=${usedMb}MB")
      timed
    }
    // The driver captures only the last 2000 chars of stdout and parses the
    // JSON from there. Two measures keep the line parseable forever:
    // build.sbt's run/outputStrategy := StdoutOutput drops sbt's "[info] "
    // prefix (the line must start with '{'), and the queries map uses the
    // short qNN prefix of each query name (full names are in BENCH_FLOOR.json
    // and SparkEntry.queries) so the line stays ~1 KB even as queries grow.
    def s2(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.map { case (k, v) => s""""${k.takeWhile(_ != '_')}":${s2(v)}""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":${s2(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // belt-and-braces: the driver captures a merged-output tail, and stderr
    // passes through sbt raw — so the line reaches it starting with '{' even
    // if a logger ever prefixes stdout again (rounds 1-4 lost their bench to
    // exactly that)
    System.err.println(line)
    spark.stop()
  }
}
