package graft.apps

import graft.io.Io
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** The STREAMING twin of [[CurationPipeline]] (round-7 VERDICT #5): the same
  * curation semantics — quality gate → exact-dup admission → semantic
  * near-dup admission — applied to a live stream of newly crawled docs and
  * landed exactly-once in a real JDBC stats table. This is the reference's
  * full ODS→DWS chain shape (`app/dws/ProductStatsApp.java:42-340`: source →
  * enrich/filter → stateful dedup → JDBC sink) re-expressed over curation
  * operators instead of commerce ones.
  *
  * Composition rules that make it deployable:
  *  - the quality gate is PURE column maps (tokenize once, two predicates) —
  *    no streaming rewrite of the batch stage (spec-gated equivalence in
  *    TextOpsSpec "curation map stages run UNCHANGED on a stream");
  *  - ONE stateful operator total: [[Dedup.streamingIngest]]'s
  *    `dropDuplicates(fingerprint)` owns the cross-batch state. The semantic
  *    stage runs with `dedupResends=false` — a re-sent doc_id carries the
  *    same text, so the fingerprint state already absorbs it, and the
  *    admission reduces to stream-static anti-joins (stateless, always in
  *    Spark's supported-plan envelope);
  *  - both stores (fingerprint + embedding) are STATIC within a run — the
  *    daily-compaction model documented on streamingIngest: in-flight
  *    admissions extend the store at the next compaction, not mid-run;
  *  - the sink is [[Io.jdbcStatsSink]]: epoch-delete-then-append, so a
  *    crash-replayed micro-batch lands once (JdbcSinkSpec machinery), and
  *    the fat transient columns (text, embedding) never reach the database.
  *
  * Kill-mid-stream/restart with no duplicate admissions is spec-gated
  * (StreamingCurationSpec); throughput is measured in Microbench with the
  * other streaming shapes (PLANS.md).
  *
  * A domain-relevance gate composes the same way and is wired as [[admit]]'s
  * optional `dsir` parameter: train [[graft.operators.TextOps.dsirRatios]] on
  * the batch store, gate the live stream next to [[qualityGate]] — the same
  * pure-column-stage shape (batch/stream doc-for-doc parity is spec-gated in
  * TextOpsSpec "dsirGate"; the composed rejection path in
  * StreamingCurationSpec).
  */
object StreamingCuration {

  /** Wire schema of the incoming doc stream (JSONL binding in [[main]]). */
  val wire: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("embedding", ArrayType(FloatType))))

  /** CurationPipeline stage 2 verbatim: minimum content + classifier keep,
    * tokenized once, composed before any shuffle. */
  def qualityGate(stream: DataFrame): DataFrame =
    stream
      .withColumn("toks", graft.functions.TextFns.tokensCol(col("text")))
      .withColumn("token_ct", size(col("toks")))
      .filter(col("token_ct") >= 10)
      .withColumn("score", graft.functions.TextFns.classifierScoreUdf(col("toks")))
      .filter(col("score") >= 0)
      .drop("toks")

  /** gate [→ optional DSIR domain-relevance gate] → exact admission
    * (fingerprint anti-join + cross-batch dedup state) → semantic admission
    * (same-cell cosine anti-join). Emits the admitted rows with their
    * fingerprint and quantizer cell.
    *
    * `dsir` is a trained [[graft.operators.TextOps.dsirRatios]] model (the
    * train-batch/serve-stream split): when present, [[graft.operators.
    * TextOps.dsirGate]] runs right after [[qualityGate]] — the same pure
    * column-stage shape, so the pipeline still has exactly ONE stateful
    * operator. */
  def admit(stream: DataFrame, fpStore: DataFrame, embStore: DataFrame,
            centroids: Array[Array[Long]], tau: Double = 0.4,
            dsir: Option[Map[String, Long]] = None): DataFrame = {
    val gated = qualityGate(stream)
    val relevant = dsir.fold(gated)(graft.operators.TextOps.dsirGate(gated, _))
    Similarity.streamingSemanticAdmission(
      Dedup.streamingIngest(relevant, fpStore)
        .withColumn("vec_id", col("doc_id")),
      embStore, centroids, tau,
      dedupResends = false, keepAllCols = true)
      .drop("vec_id")
  }

  /** Launch the admission stream into a JDBC table (AvailableNow cadence —
    * drain, commit, exit; rerun to resume from the checkpoint). */
  def run(spark: SparkSession, stream: DataFrame, fpStore: DataFrame,
          embStore: DataFrame, centroids: Array[Array[Long]],
          url: String, table: String, checkpoint: String,
          dsir: Option[Map[String, Long]] = None): StreamingQuery =
    Io.jdbcStatsSink(
      admit(stream, fpStore, embStore, centroids, dsir = dsir),
      url, table, checkpoint,
      transientCols = Seq("text", "embedding"))

  /** Bounded-driver-sample quantizer training, the convention every ANN
    * operator uses ([[Similarity]]): first `sampleN` store vectors by id. */
  def trainFromStore(embStore: DataFrame, k: Int = 16, sampleN: Int = 1024)
  : Array[Array[Long]] = {
    val sample = embStore.select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(sampleN).collect()
      .map(_.getSeq[Float](1).toArray)
    Similarity.trainCentroids(sample, k = k, iters = 5)
  }

  def main(args: Array[String]): Unit = {
    // JDBC driver jar is DEPLOYMENT-PROVIDED, like the Kafka connector
    // (build.sbt keeps the main library Spark-only): spark-submit --jars
    // duckdb_jdbc.jar in production, `sbt Test/runMain` in-container (the
    // test classpath carries the driver). Io.connect survives the --jars
    // child-classloader shape (JdbcSinkSpec). Smoke-verified end-to-end
    // against sf0.001 stores: exact dups rejected, gate-passing admitted
    // once, schema lands transient-free (NOTES_r7.md).
    require(args.length >= 4,
      "usage: graft.apps.StreamingCuration <streamInDir> <storeSfDir> <duckdbPath> <ckptDir>")
    val Array(inDir, storeDir, dbPath, ckptDir) = args.take(4)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fpStore = graft.Tables.load(spark, storeDir, "documents")
      .select(md5(col("text").cast("binary")).as("fingerprint"))
    val embStore = graft.Tables.load(spark, storeDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val centroids = trainFromStore(embStore)
    val q = run(spark,
      spark.readStream.schema(wire).json(inDir),
      fpStore, embStore, centroids,
      s"jdbc:duckdb:$dbPath", "curated_admissions", ckptDir)
    q.awaitTermination()
    spark.stop()
  }
}
