package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for the training-data pipeline: image/audio/video
  * payloads as opaque `binary` columns with typed metadata, processed by
  * batched `mapPartitions` (the Scala analog of `mapInPandas`: one partition =
  * one batch through the decoder, so a real decoder amortizes model/codec init
  * per partition instead of per row).
  *
  * The actual byte→pixels/samples decode is NOT implementable in this
  * container (no image/audio libraries) — [[decodeStub]] is a clearly-marked
  * deterministic fake. Everything around it is real and tested: the schema
  * contract, the partition batching, null passthrough, and metadata extraction.
  */
object Multimodal {

  /** Canonical multimodal record schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("media_type", StringType), // "image" | "audio" | "video"
    StructField("meta", StructType(Seq(
      StructField("declared_format", StringType),
      StructField("n_bytes", LongType))))))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("header", StringType),       // first 4 payload bytes, hex
    StructField("feature", ArrayType(DoubleType)))) // stub "embedding"

  /** STUB DECODER — deterministic fake standing in for image/audio decode.
    * A production build replaces the body marked below with a real codec call;
    * the partition-batched shape, schema, and null handling stay identical. */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "payload", "media_type").rdd.mapPartitions { rows =>
      // real decoder: init codec ONCE here (per partition), then stream rows
      rows.map { r =>
        val mediaId = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val mediaType = if (r.isNullAt(2)) null else r.getString(2)
        if (payload == null) Row(mediaId, mediaType, 0L, null, null)
        else {
          val header = payload.take(4).map(b => f"${b & 0xff}%02x").mkString
          // ??? real decode goes here; deterministic fake feature instead:
          val feature = Array.tabulate(8) { i =>
            var h = 0xcbf29ce484222325L
            var j = i
            while (j < payload.length) { h ^= (payload(j) & 0xffL); h *= 0x100000001b3L; j += 8 }
            (h >>> 11).toDouble / (1L << 53).toDouble
          }
          Row(mediaId, mediaType, payload.length.toLong, header, feature.toSeq)
        }
      }
    }
    spark.createDataFrame(out, featureSchema)
  }

  /** Build a media table from documents (payload = utf-8 bytes) — the fixture
    * generator for the binary plumbing; also the shape a real ingest would use. */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        lit("text").as("media_type"),
        struct(
          col("source").as("declared_format"),
          octet_length(col("text")).cast("long").as("n_bytes")).as("meta"))

  /** Feature extraction end-to-end over the documents-derived media table —
    * exposed as a SparkEntry query so the plumbing is exercised by the driver. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val feats = decodeStub(mediaFromDocuments(spark, dir))
    feats.groupBy("media_type")
      .agg(
        count(lit(1)).as("n_media"),
        sum("n_bytes").as("total_bytes"),
        countDistinct(col("header")).as("distinct_headers"))
  }
}
