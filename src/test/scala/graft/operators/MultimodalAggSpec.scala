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

  test("decodeMedia REALLY decodes images: dimensions + pooled luminance (JDK ImageIO)") {
    import spark.implicits._
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val white = png(16, 16, 0xffffff)
    val black = png(32, 8, 0x000000)
    val media = Seq(
      (1L, white, "image"),
      (2L, black, "image"),
      (3L, "not an image".getBytes("UTF-8"), "image"), // corrupt → quarantined
      (4L, white, "video"))                            // no JDK codec → metadata only
      .toDF("media_id", "payload", "media_type")
    val out = Multimodal.decodeMedia(media).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("decode_ok") &&
      out(1L).getAs[Int]("width") == 16 && out(1L).getAs[Int]("height") == 16)
    val whiteFeat = out(1L).getSeq[Double](out(1L).fieldIndex("feature"))
    assert(whiteFeat.length == 8 && whiteFeat.forall(v => math.abs(v - 1.0) < 1e-6),
      s"white image pools to luminance 1.0 everywhere: $whiteFeat")
    val blackFeat = out(2L).getSeq[Double](out(2L).fieldIndex("feature"))
    assert(out(2L).getAs[Int]("width") == 32 && blackFeat.forall(_ == 0.0))
    assert(!out(3L).getAs[Boolean]("decode_ok"), "corrupt bytes quarantine, not crash")
    assert(!out(4L).getAs[Boolean]("decode_ok") && out(4L).getAs[Long]("n_bytes") > 0,
      "video keeps metadata but is marked undecoded")
  }

  test("decodeMedia REALLY decodes audio: sample rate, duration, RMS profile (JDK WAV)") {
    import spark.implicits._
    def wav(hz: Double, seconds: Double, rate: Float = 8000f, amp: Double = 0.5): Array[Byte] = {
      val n = (rate * seconds).toInt
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val v = (math.sin(2 * math.Pi * hz * i / rate) * amp * 32767).toInt
        pcm(2 * i) = (v & 0xff).toByte          // little-endian 16-bit
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, wav(440.0, 1.0), "audio"),
      (2L, "junk".getBytes("UTF-8"), "audio"))
      .toDF("media_id", "payload", "media_type")
    val out = Multimodal.decodeMedia(media).collect().map(r => r.getLong(0) -> r).toMap
    val tone = out(1L)
    assert(tone.getAs[Boolean]("decode_ok"))
    assert(tone.getAs[Double]("sample_rate") == 8000.0)
    assert(math.abs(tone.getAs[Double]("duration_s") - 1.0) < 0.01)
    val rms = tone.getSeq[Double](tone.fieldIndex("feature"))
    // a steady sine's RMS is amp/√2 ≈ 0.354 in every temporal bin
    assert(rms.length == 8 && rms.forall(v => math.abs(v - 0.5 / math.sqrt(2)) < 0.02),
      s"uniform RMS profile for a steady tone: $rms")
    assert(!out(2L).getAs[Boolean]("decode_ok"))
  }

  test("decodeMedia handles UNSIGNED 8-bit WAV: silence is silent, not full-scale") {
    import spark.implicits._
    // 8-bit WAV is PCM_UNSIGNED by spec: silence = 0x80; a signed read would
    // see -128 and report RMS ≈ 1.0 for a silent clip
    def wav8(rate: Float = 8000f, seconds: Double = 0.5): Array[Byte] = {
      val n = (rate * seconds).toInt
      val pcm = Array.fill(n)(0x80.toByte) // digital silence, unsigned midpoint
      val fmt = new javax.sound.sampled.AudioFormat(rate, 8, 1, false, false) // signed=false
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val media = Seq((1L, wav8(), "audio")).toDF("media_id", "payload", "media_type")
    val row = Multimodal.decodeMedia(media).collect().head
    assert(row.getAs[Boolean]("decode_ok"))
    val rms = row.getSeq[Double](row.fieldIndex("feature"))
    assert(rms.forall(_ < 0.01), s"silence decodes to ~zero energy: $rms")
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
