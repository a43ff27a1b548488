package graft.operators

import graft.SparkSuite
import graft.functions.Aggregators
import org.apache.spark.sql.functions._

class MultimodalAggSpec extends SparkSuite {

  test("decodeStub: batched decode preserves ids, sizes, and null payloads") {
    val media = Multimodal.mediaFromDocuments(spark, sf0001)
    val feats = Multimodal.decodeStub(media)
    assert(feats.count() == media.count())
    val joined = media.select(col("media_id"), col("meta.n_bytes").as("expected"))
      .join(feats, "media_id")
    assert(joined.filter(col("expected") =!= col("n_bytes")).count() == 0)
    // deterministic: same input → same feature vector
    val f1 = feats.orderBy("media_id").select("feature").head.getSeq[Double](0)
    val f2 = Multimodal.decodeStub(media).orderBy("media_id").select("feature").head.getSeq[Double](0)
    assert(f1 == f2)
    assert(f1.length == 8 && f1.forall(v => v >= 0.0 && v < 1.0))
  }

  test("decodeStub handles null payloads without decoding") {
    import spark.implicits._
    val media = Seq((1L, Option.empty[Array[Byte]], "image"),
      (2L, Some("abc".getBytes("UTF-8")), "image"))
      .toDF("media_id", "payload", "media_type")
    val out = Multimodal.decodeStub(media).collect()
    val nullRow = out.find(_.getLong(0) == 1L).get
    assert(nullRow.isNullAt(nullRow.fieldIndex("feature")))
    assert(out.find(_.getLong(0) == 2L).get.getAs[String]("header") == "616263")
  }

  test("exactDistinct aggregator matches count(distinct) on real data") {
    val e = graft.Tables.load(spark, sf0001, "events")
    val got = e.groupBy("event_type")
      .agg(Aggregators.exactDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = e.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
