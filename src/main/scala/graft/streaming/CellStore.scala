package graft.streaming

import graft.io.Io
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SHARED ADDITIVE-CELL MAINTENANCE — the one merge discipline behind every
  * LINEAR-sketch streaming maintainer in this repo (TopKStream's CMS cells,
  * HdrStream's quantile buckets, TrendStream's decay cells): a batch's cell
  * values simply ADD, so exactly-once reduces to a per-cell `last_epoch`
  * gate over the bucketed upsert store — idempotent under full replays AND
  * partial bucket commits, and the maintained store is CELL-FOR-CELL equal
  * to a batch recompute over everything absorbed (each maintainer's spec
  * pins that equality for its own cells).
  *
  * One definition, not three copies — the [[Io.dimStoreHasData]] rule:
  * the object that owns a convention owns its code. */
object CellStore {

  /** Merge one micro-batch of cells into the store at `path`. `d` must
    * carry a unique string `cell` key, the additive long `valueCol`, and
    * any payload columns (carried from the fresh row). Idempotent per
    * (cell, epoch). */
  def mergeAdditive(spark: SparkSession, d: DataFrame, path: String,
                    epoch: Long, valueCol: String): Unit =
    mergeAdditive(spark, d, path, epoch, Seq(valueCol))

  /** Multi-column form: every column in `valueCols` is additive long state
    * merged under the SAME per-cell epoch gate (one row either merges all
    * of its values or none — the gate is per cell, not per column). */
  def mergeAdditive(spark: SparkSession, d: DataFrame, path: String,
                    epoch: Long, valueCols: Seq[String]): Unit = {
    val merged =
      if (!Io.dimStoreHasData(path)) d.withColumn("last_epoch", lit(epoch))
      else {
        val s = Io.readDim(spark, path)
        val fresh = d
          .join(s.select(col("cell"), col("last_epoch").as("__se")), Seq("cell"), "left")
          .filter(col("__se").isNull || col("__se") < epoch)
          .drop("__se")
        val prev = s.join(fresh.select("cell"), Seq("cell"), "left_semi")
          .select(col("cell") +: valueCols.map(v => col(v).as(s"__p_$v")): _*)
        valueCols.foldLeft(fresh.join(prev, Seq("cell"), "left")) { (acc, v) =>
          acc.withColumn(v, col(v) + coalesce(col(s"__p_$v"), lit(0L)))
            .drop(s"__p_$v")
        }.withColumn("last_epoch", lit(epoch))
      }
    Io.upsertDim(spark, merged, path, "cell", "last_epoch")
  }
}
