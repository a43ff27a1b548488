package graft.streaming

import graft.io.Io
import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING INDEX MAINTENANCE — the streaming twin of q171's positional
  * inverted index: newly ingested documents fold into the (term, chunk)
  * postings store incrementally, which is how real search/retrieval systems
  * keep an index fresh without rebuilding it (the merge-on-ingest half of a
  * Lucene-style design, minus background segment merging).
  *
  * Why this maintains exactly: a document's postings entries are constants
  * of the document itself, and `chunk = doc_id div chunkDocs` is map-side
  * arithmetic — so a batch's contribution to a (term, chunk) cell is a set
  * of entries DISJOINT from every other batch's (doc_ids are unique), df/cf
  * are additive counts, and the postings string is the doc-ordered merge of
  * the two entry sets. Merge = split '|' → union → numeric sort on the
  * entry's doc prefix → re-join; df/cf add. The per-cell `last_epoch` gate
  * (the CellStore discipline, with a non-additive value column handled by
  * an idempotent set-union instead of addition) makes replays and partial
  * bucket commits fill-once: a replayed batch's entries are already present
  * and the epoch gate skips the cell entirely, so nothing double-counts.
  *
  * The maintained store is cell-for-cell equal to the batch q171 over
  * everything absorbed (spec-pinned), so the read path IS the batch
  * operator's output shape at read cost independent of history. */
object IndexStream {

  /** Merge one micro-batch of documents (doc_id, text) into the postings
    * store. Idempotent per (cell, epoch). */
  def applyBatch(spark: SparkSession, delta: DataFrame, path: String,
                 epoch: Long, chunkDocs: Int = 256): Unit = {
    val d = TextOps.positionalIndexFrom(delta, chunkDocs)
      .withColumn("cell", concat_ws("|~|", col("term"), col("chunk")))
    val merged =
      if (!Io.dimStoreHasData(path)) d.withColumn("last_epoch", lit(epoch))
      else {
        val s = Io.readDim(spark, path)
        val fresh = d
          .join(s.select(col("cell"), col("last_epoch").as("__se")), Seq("cell"), "left")
          .filter(col("__se").isNull || col("__se") < epoch)
          .drop("__se")
        val prev = s.join(fresh.select("cell"), Seq("cell"), "left_semi")
          .select(col("cell"), col("df").as("__pdf"), col("cf").as("__pcf"),
            col("postings").as("__pp"))
        fresh.join(prev, Seq("cell"), "left")
          .withColumn("df", col("df") + coalesce(col("__pdf"), lit(0L)))
          .withColumn("cf", col("cf") + coalesce(col("__pcf"), lit(0L)))
          .withColumn("postings",
            when(col("__pp").isNull, col("postings"))
              .otherwise(mergePostings(col("__pp"), col("postings"))))
          .drop("__pdf", "__pcf", "__pp")
          .withColumn("last_epoch", lit(epoch))
      }
    Io.upsertDim(spark, merged, path, "cell", "last_epoch")
  }

  /** Doc-ordered merge of two '|'-joined postings strings: split, union,
    * sort by the numeric doc prefix, re-join. Entry sets from different
    * batches are disjoint (doc_ids are unique), so union is idempotent. */
  private[streaming] def mergePostings(a: org.apache.spark.sql.Column,
                                       b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_join(
      transform(
        sort_array(transform(
          array_union(split(a, "\\|"), split(b, "\\|")),
          e => struct(split(e, ":").getItem(0).cast("long").as("d"), e.as("e")))),
        s => s.getField("e")),
      "|")

  /** The q171 output shape from the maintained store. */
  def readIndex(spark: SparkSession, path: String): DataFrame =
    Io.readDim(spark, path).select("term", "chunk", "df", "cf", "postings")

  /** Drive the maintenance from a streaming frame with (doc_id, text). */
  def run(spark: SparkSession, docs: DataFrame, path: String,
          checkpoint: String, chunkDocs: Int = 256): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (delta: DataFrame, epoch: Long) =>
        applyBatch(spark, delta, path, epoch, chunkDocs)
      }
      .start()
}
