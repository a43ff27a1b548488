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

  // shared replay of the q123 linkage attributes: (key, name, nat, seg, cents)
  private def linkRows(): Array[(Long, String, Int, String, Long)] = {
    import spark.implicits._
    graft.Tables.load(spark, sf001, "customer")
      .select($"c_custkey".cast("long"), $"c_name", $"c_nationkey".cast("int"),
        $"c_mktsegment", $"c_acctbal".cast("double"))
      .as[(Long, String, Int, String, Double)].collect()
      .map { case (k, n, nat, seg, bal) => (k, n, nat, seg, math.floor(bal * 100).toLong) }
      .sortBy(_._1)
  }

  private def linkScore(a: (Long, String, Int, String, Long),
                        b: (Long, String, Int, String, Long)): (Int, Int) = {
    val l = lev(a._2, b._2)
    ((l), (if (l <= 2) 50 else 0) + (if (a._3 == b._3) 15 else 0) +
      (if (a._4 == b._4) 10 else 0) + (if (math.abs(a._5 - b._5) <= 10000) 10 else 0))
  }

  private def blockedPairs(as: Array[(Long, String, Int, String, Long)],
                           bs: Array[(Long, String, Int, String, Long)]): Set[(Long, Long)] = {
    def p1key(r: (Long, String, Int, String, Long)) = (1, r._3.toString, r._4, math.floor(r._5 / 10000.0).toLong.toString)
    def p2key(r: (Long, String, Int, String, Long)) = (2, r._3.toString, r._2.takeRight(3), "")
    val bIdx = (bs.map(b => p1key(b) -> b) ++ bs.map(b => p2key(b) -> b))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    as.flatMap { a =>
      (bIdx.getOrElse(p1key(a), Array.empty) ++ bIdx.getOrElse(p2key(a), Array.empty))
        .map(b => (a._1, b._1))
    }.toSet
  }

  test("ingestLinkage: batch rows resolve to the replayed best registry entity or themselves") {
    import spark.implicits._
    val rows = linkRows()
    val batch = rows.filter(_._1 % 10 == 0)
    val store = rows.filter(_._1 % 10 != 0)
    val byKey = rows.map(r => r._1 -> r).toMap
    val cand = blockedPairs(batch, store)
    val want = batch.map { a =>
      val best = cand.filter(_._1 == a._1).toSeq
        .map { case (_, bk) =>
          val (l, s) = linkScore(a, byKey(bk)); (bk, l, s)
        }
        .sortBy { case (bk, l, s) => (-s, l, bk) }.headOption
      best match {
        case Some((bk, _, s)) if s >= 60 => (a._1, bk, s, true)
        case Some((_, _, s)) => (a._1, a._1, s, false)
        case None => (a._1, a._1, 0, false)
      }
    }.toSet
    val got = Dedup.ingestLinkage(spark, sf001)
      .as[(Long, Long, Int, Boolean)].collect()
    assert(got.length == batch.length, "one output row per batch row")
    assert(got.toSet == want)
    assert(want.exists(_._4) && want.exists(!_._4),
      "fixture should exercise both matched and new-entity outcomes")
    // a matched entity is always a REGISTRY key, never another batch row
    assert(got.filter(_._4).forall(r => r._2 % 10 != 0))
  }

  test("entityGroups: components over replayed match pairs; transitive closure; singletons = self") {
    import spark.implicits._
    val rows = linkRows()
    val cand = blockedPairs(rows, rows).filter { case (a, b) => a < b }
    val matches = cand.toSeq.filter { case (a, b) =>
      linkScore(rows.find(_._1 == a).get, rows.find(_._1 == b).get)._2 >= 60
    }
    // driver union-find
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
    matches.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val want = rows.map(r => (r._1, find(r._1))).toSet
    val got = Dedup.entityGroups(spark, sf001)
      .as[(Long, Long)].collect()
    assert(got.length == rows.length)
    assert(got.toSet == want)
    // entity id is the component minimum; every match pair shares an entity
    // (multi-hop closure itself is the q32 clusters machinery, gated there)
    val comps = got.groupBy(_._2)
    comps.foreach { case (e, ms) => assert(ms.map(_._1).min == e) }
    val entityOf = got.map(r => r._1 -> r._2).toMap
    assert(matches.nonEmpty, "no match pairs — test is vacuous")
    matches.foreach { case (a, b) =>
      assert(entityOf(a) == entityOf(b), s"match pair ($a, $b) split across entities")
    }
  }

  test("kAnonRelease: released groups are >= k at their level, counts partition the population, no group leaks at two levels") {
    import spark.implicits._
    val k = 10
    val rows = graft.Tables.load(spark, sf001, "customer")
      .select($"c_nationkey".cast("long"), $"c_mktsegment", $"c_acctbal".cast("double"))
      .as[(Long, String, Double)].collect()
      .map { case (n, s, b) => (n, s, math.floor(b / 1000).toLong) }
    val l0 = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val wantFull = l0.filter(_._2 >= k).map { case ((n, s, b), ct) =>
      (n.toString, s, b.toString, ct, "full") }.toSet
    val resid0 = l0.filter(_._2 < k)
    val l1 = resid0.groupBy { case ((n, s, _), _) => (n, s) }
      .view.mapValues(_.values.sum).toMap
    val wantCoarse = l1.filter(_._2 >= k).map { case ((n, s), ct) =>
      (n.toString, s, "*", ct, "coarse") }.toSet
    val suppressed = l1.filter(_._2 < k).values.sum
    val wantSup: Set[(String, String, String, Long, String)] =
      if (suppressed > 0) Set(("*", "*", "*", suppressed, "suppressed")) else Set.empty
    val got = Relational.kAnonRelease(spark, sf001)
      .as[(String, String, String, Long, String)].collect().toSet
    assert(got == wantFull ++ wantCoarse ++ wantSup)
    // privacy property: everything released below the remainder is >= k
    assert(got.filter(_._5 != "suppressed").forall(_._4 >= k))
    // completeness: released counts partition the population exactly
    assert(got.toSeq.map(_._4).sum == rows.length.toLong)
  }

  test("kAnonReleaseFrom: all three hierarchy levels fire on a controlled population") {
    import spark.implicits._
    // (nat, seg, band): one dense cell (full), one (nat, seg) whose cells
    // are each < k but sum >= k (coarse), one thin pair (suppressed)
    val pop =
      Seq.fill(12)((1L, "A", 0L)) ++                      // full: 12 >= 10
        Seq.fill(4)((2L, "B", 0L)) ++ Seq.fill(4)((2L, "B", 1L)) ++
        Seq.fill(4)((2L, "B", 2L)) ++                     // coarse: 4+4+4 = 12
        Seq.fill(3)((3L, "C", 0L))                        // suppressed: 3
    val got = Relational.kAnonReleaseFrom(
      pop.toDF("nat", "seg", "band"), k = 10)
      .as[(String, String, String, Long, String)].collect().toSet
    assert(got == Set(
      ("1", "A", "0", 12L, "full"),
      ("2", "B", "*", 12L, "coarse"),
      ("*", "*", "*", 3L, "suppressed")))
    // and with every group dense, nothing generalizes and no remainder row
    val dense = Relational.kAnonReleaseFrom(
      Seq.fill(10)((1L, "A", 0L)).toDF("nat", "seg", "band"), k = 10)
      .as[(String, String, String, Long, String)].collect().toSet
    assert(dense == Set(("1", "A", "0", 10L, "full")))
  }
}
