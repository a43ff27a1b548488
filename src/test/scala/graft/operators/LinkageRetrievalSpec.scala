package graft.operators

import graft.SparkSuite

/** Driver-side replays and invariants for the round-10 session-2 operators:
  * q123 recordLinkage, q124 hybridRrf, q125 clusterSafeSplit,
  * q126 intervalOverlapJoin, q127 thetaSketchOverlap. Replays recompute the
  * expected output from raw rows in plain Scala, independent of the Spark
  * plan shape (the DuckDB oracle gates the same queries driver-side).
  */
class LinkageRetrievalSpec extends SparkSuite {
  import org.apache.spark.sql.functions.col

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("recordLinkage: matches equal a driver replay of blocking + scoring") {
    import spark.implicits._
    val rows = graft.Tables.load(spark, sf001, "customer")
      .select($"c_custkey".cast("long"), $"c_name", $"c_nationkey".cast("int"),
        $"c_mktsegment", $"c_acctbal".cast("double"))
      .as[(Long, String, Int, String, Double)].collect()
      .map { case (k, n, nat, seg, bal) =>
        (k, n, nat, seg, math.floor(bal * 100).toLong)
      }.sortBy(_._1)
    def score(a: (Long, String, Int, String, Long), b: (Long, String, Int, String, Long)): (Int, Int) = {
      val l = lev(a._2, b._2)
      val s = (if (l <= 2) 50 else 0) + (if (a._3 == b._3) 15 else 0) +
        (if (a._4 == b._4) 10 else 0) + (if (math.abs(a._5 - b._5) <= 10000) 10 else 0)
      (l, s)
    }
    val cand = scala.collection.mutable.Set.empty[(Int, Int)] // index pairs
    val byP1 = rows.zipWithIndex.groupBy { case (r, _) => (r._3, r._4, math.floor(r._5 / 10000.0).toLong) }
    val byP2 = rows.zipWithIndex.groupBy { case (r, _) => (r._3, r._2.takeRight(3)) }
    (byP1.values ++ byP2.values).foreach { blk =>
      for (i <- blk.indices; j <- i + 1 until blk.length)
        cand += ((math.min(blk(i)._2, blk(j)._2), math.max(blk(i)._2, blk(j)._2)))
    }
    val want = cand.toSeq.map { case (i, j) =>
      val (a, b) = (rows(i), rows(j))
      val (l, s) = score(a, b)
      (a._1, b._1, l, s)
    }.filter(_._4 >= 60).toSet
    val got = Dedup.recordLinkage(spark, sf001)
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(want.nonEmpty, "fixture produced no matches — test is vacuous")
    assert(got == want)
  }

  test("hybridRrf: fusion equals a driver replay of both legs' RRF") {
    import spark.implicits._
    // lexical leg from the oracle-gated q81 ranking at depth 20
    val lexRnk = TextOps.bm25Search(spark, sf001, 20)
      .select($"query", $"doc_id".cast("long"), $"rnk".cast("int"))
      .as[(String, Long, Int)].collect()
      .map { case (q, d, r) => (q, d) -> r }.toMap
    // dense leg replayed in Scala with dotFastCol's exact double fold order
    val embs = graft.Tables.load(spark, sf001, "embeddings")
      .select($"vec_id".cast("long"), $"embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
    def nrm(a: Seq[Float]): Double = math.sqrt(dot(a, a))
    val denseRnk = (1L to 3L).flatMap { qid =>
      val qv = embs.find(_._1 == qid).get._2
      val qn = nrm(qv)
      embs.filter(_._1 != qid)
        .map { case (d, v) => (d, dot(qv, v) / (qn * nrm(v))) }
        .sortBy { case (d, c) => (-c, d) }
        .take(20).zipWithIndex
        .map { case ((d, _), i) => (s"q$qid", d) -> (i + 1) }
    }.toMap
    def contrib(r: Option[Int]): Long =
      r.map(x => math.floor(1000000.0 / (60 + x)).toLong).getOrElse(0L)
    val want = (lexRnk.keySet ++ denseRnk.keySet).groupBy(_._1).flatMap {
      case (q, keys) =>
        keys.toSeq.map { k =>
          val s = contrib(lexRnk.get(k)) + contrib(denseRnk.get(k))
          (q, k._2, s, lexRnk.contains(k), denseRnk.contains(k))
        }.sortBy { case (_, d, s, _, _) => (-s, d) }
          .take(10).zipWithIndex
          .map { case ((qq, d, s, il, iv), i) => (qq, d, s, i + 1, il, iv) }
    }.toSet
    val got = Similarity.hybridRrf(spark, sf001)
      .as[(String, Long, Long, Int, Boolean, Boolean)].collect().toSet
    assert(got == want)
    // every fused doc came from at least one leg
    assert(got.forall(r => r._5 || r._6))
  }

  test("clusterSafeSplit: splits are cluster-atomic and near-dup pairs never straddle; doc-hash split does leak") {
    import spark.implicits._
    val assign = Dedup.clusterSafeSplit(spark, sf001)
      .as[(Long, Long, String)].collect()
    val docs = graft.Tables.load(spark, sf001, "documents").count()
    assert(assign.length == docs, "every doc assigned exactly once")
    assert(assign.map(_._1).distinct.length == assign.length)
    // cluster-atomic: one split per cluster, and it is md5(cluster)'s split
    assign.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.map(_._3).distinct.length == 1, s"cluster $c straddles splits")
      val h = md5hex(c.toString).take(4)
      val wantSplit = if (h < "1999") "val" else if (h < "3333") "test" else "train"
      assert(rows.head._3 == wantSplit)
    }
    val pairs = Dedup.minhashLsh(spark, sf001)
      .select($"da".cast("long"), $"db".cast("long"))
      .as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "no near-dup pairs at sf001 — straddle test vacuous")
    val splitOf = assign.map(r => r._1 -> r._3).toMap
    assert(pairs.forall(p => splitOf(p._1) == splitOf(p._2)),
      "near-dup pair crosses a split boundary")
    // contrast: the q48 per-doc hash DOES leak on the same pair set —
    // the property this operator exists to remove, not a data accident
    def docSplit(id: Long): String = {
      val h = md5hex(id.toString).take(4)
      if (h < "1999") "val" else if (h < "3333") "test" else "train"
    }
    assert(pairs.exists(p => docSplit(p._1) != docSplit(p._2)),
      "doc-hash split did not leak on this corpus; contrast claim needs review")
  }

  test("intervalOverlapJoin: binned join equals the nested-loop reference (no lost pair, no duplicate)") {
    import spark.implicits._
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val hourFmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:00:00")
    hourFmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select($"user_id".cast("long"), $"event_time", $"event_type")
      .as[(Long, java.sql.Timestamp, String)].collect()
    val gapMs = 30L * 60 * 1000
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val ts = rows.map(_._2.getTime).sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var st = ts.head; var last = ts.head; var n = 1L
      ts.tail.foreach { t =>
        if (t - last >= gapMs) { out += ((uid, st, last + gapMs, n)); st = t; n = 0 }
        last = t; n += 1
      }
      out += ((uid, st, last + gapMs, n))
      out.toSeq
    }
    val hourMs = 3600L * 1000
    val hours = ev.map(e => (e._3, e._2.getTime / hourMs * hourMs)).distinct
    val want = (for {
      (uid, st, en, n) <- sessions
      (tp, h) <- hours
      if h < en && st < h + hourMs
    } yield (uid, fmt.format(new java.util.Date(st)), fmt.format(new java.util.Date(en)),
      n, tp, hourFmt.format(new java.util.Date(h)))).toSet
    val gotRows = Relational.intervalOverlapJoin(spark, sf0001)
      .as[(Long, String, String, Long, String, String)].collect()
    assert(gotRows.length == gotRows.distinct.length, "binned join produced duplicates")
    assert(gotRows.toSet == want)
  }

  test("thetaSketchOverlap: estimates equal a driver KMV replay; sketch regime at small k, exact when sets fit") {
    import spark.implicits._
    val day = new java.text.SimpleDateFormat("yyyy-MM-dd")
    day.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val el = graft.Tables.load(spark, sf001, "events")
      .select($"event_type", $"user_id".cast("long"), $"event_time")
      .as[(String, Long, java.sql.Timestamp)].collect()
      .map { case (t, u, ts) => (t, s"${u}_${day.format(ts)}") }.distinct
    val byType = el.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = byType.keys.toSeq.sorted
    def replay(k: Int): Set[(String, String, Long, Long, Long, Double, Long, Boolean)] = {
      val theta1 = 4503599627370496L // 2^52
      val hashes = byType.view.mapValues(
        _.map(u => java.lang.Long.parseLong(md5hex(u).take(13), 16)).toSeq.sorted).toMap
      (for {
        (a, i) <- types.zipWithIndex; b <- types.drop(i + 1)
      } yield {
        val (ka, kb) = (hashes(a).take(k), hashes(b).take(k))
        val ta = if (hashes(a).length < k) theta1 else ka.last
        val tb = if (hashes(b).length < k) theta1 else kb.last
        val theta = math.min(ta, tb)
        val common = ka.toSet.intersect(kb.toSet).count(_ < theta).toLong
        val est = common.toDouble * theta1.toDouble / theta.toDouble
        val exact = byType(a).intersect(byType(b)).size.toLong
        val ok = math.abs(est - exact) / math.max(exact, 1L).toDouble <= 0.15
        (a, b, byType(a).size.toLong, byType(b).size.toLong, common, est, exact, ok)
      }).toSet
    }
    // default k = 1024: every pair within tolerance on this data
    val got = Relational.thetaSketchOverlap(spark, sf001)
      .as[(String, String, Long, Long, Long, Double, Long, Boolean)].collect().toSet
    assert(got == replay(1024))
    assert(got.forall(_._8), s"KMV estimate out of tolerance: ${got.filterNot(_._8)}")
    // small k = 64 exercises the real sketch branch (theta < 2^52) and still replays
    val small = Relational.thetaSketchOverlap(spark, sf001, k = 64)
      .as[(String, String, Long, Long, Long, Double, Long, Boolean)].collect().toSet
    assert(small == replay(64))
    assert(small.exists(r => r._5 < 64 || r._6 != r._7.toDouble),
      "k=64 never left the exact regime — sketch branch untested")
  }
}
