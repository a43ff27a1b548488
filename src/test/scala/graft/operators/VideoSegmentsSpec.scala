package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** q179 structural gates the DuckDB oracle can't own: the REAL container
  * walk (the oracle replays the recipe arithmetic, not the bytes), exact
  * segment tiling, and that the fixture actually produces multi-segment
  * videos so the cut logic is exercised. */
class VideoSegmentsSpec extends SparkSuite {
  import spark.implicits._

  test("every synthesized video decodes through the real Y4M path") {
    val media = Multimodal.synthVideos(spark, sf0001, nMedia = 16)
      .as[(Long, Array[Byte], String)].collect()
    assert(media.nonEmpty)
    media.foreach { case (id, payload, _) =>
      val dec = Multimodal.decodeY4mFrames(payload, 2, 4)
      assert(dec.isDefined, s"video $id failed the container walk")
      val (w, h, fps, grids) = dec.get
      assert(w == 8 && h == 4 && fps == 25.0)
      assert(grids.length == 8 + (id % 5).toInt * 4)
      // binary cells — the exactness the q179 oracle rests on
      grids.foreach(g => g.foreach(v => assert(v == 0.0 || v == 1.0, s"$v")))
    }
  }

  test("segments tile each video's frame range exactly; cuts happen") {
    val rows = Multimodal.videoSegments(spark, sf0001, nMedia = 16)
      .select("media_id", "seg_idx", "start_frame", "n_frames")
      .as[(Long, Int, Int, Int)].collect()
      .groupBy(_._1).map { case (id, segs) => id -> segs.sortBy(_._2) }
    assert(rows.nonEmpty)
    rows.foreach { case (id, segs) =>
      assert(segs.head._3 == 0, s"video $id: first segment must start at 0")
      segs.sliding(2).foreach {
        case Array((_, _, s1, n1), (_, _, s2, _)) =>
          assert(s1 + n1 == s2, s"video $id: segments must tile")
        case _ =>
      }
      assert(segs.last._3 + segs.last._4 == 8 + (id % 5).toInt * 4,
        s"video $id: last segment must end at n_frames")
    }
    assert(rows.values.exists(_.length >= 3),
      "fixture must contain a video with several scene cuts")
  }
}
