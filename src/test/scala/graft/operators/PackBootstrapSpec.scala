package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** q167–q170: sequence packing (distributed prefix sum), kNN-graph BFS,
  * Poisson-bootstrap CI, Markov removal-effect attribution. Each test is an
  * independent DRIVER replay of the operator's contract — a different
  * construction than both the Spark plan and the DuckDB oracle. */
class PackBootstrapSpec extends SparkSuite {

  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def u52(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 13), 16)

  // ---------------- q167 sequence packing ----------------

  private def packReplay(chunk: Long): Map[Long, (Long, Long, Long, Long, Long)] = {
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val re = "[a-z0-9]+".r
    var off = 0L
    docs.map { case (id, text) =>
      val ct = re.findAllIn(text.toLowerCase).size.toLong
      val first = off / chunk
      val last = (off + math.max(ct, 1L) - 1L) / chunk
      val row = id -> ((ct, off, first, last, last - first))
      off += ct
      row
    }.toMap
  }

  test("seqPack: equals a sequential driver prefix-sum replay, at several group counts") {
    val want = packReplay(512L)
    for (groups <- Seq(1, 7, 32)) {
      val got = TextOps.seqPack(spark, sf0001, groups = groups)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
      assert(got == want,
        s"two-phase prefix sum must be group-count invariant (groups=$groups)")
    }
  }

  test("seqPack: offsets tile the token stream exactly (no gap, no overlap)") {
    val rows = TextOps.seqPack(spark, sf0001)
      .select("doc_id", "token_ct", "tok_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    rows.sliding(2).foreach {
      case Array((_, ct, off), (_, _, off2)) =>
        assert(off + ct == off2, "next doc must start where the previous ended")
      case _ =>
    }
    assert(rows.head._3 == 0L)
  }

  // ---------------- shared q168/q175 LSH-kNN graph replay ----------------

  private val knnCap = 2000

  private def quant(v: Array[Float]): Array[Int] = {
    val mx = math.max(v.map(x => math.abs(x.toDouble)).max, 1e-9)
    val scale = 127.0 / mx
    v.map(x => BigDecimal(x.toDouble * scale)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toInt)
  }

  private def d2(a: Array[Int], b: Array[Int]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { val d = (a(i) - b(i)).toLong; s += d * d; i += 1 }
    s
  }

  /** Driver replay of the knnEdges contract: per-node top-3 by the unique
    * composite among LSH candidates (hamming ≤ 1 on the 4-bit hyperplane
    * signature — the q28 construction), symmetrized. `lshGate = false`
    * gives the brute-kNN graph for the recall gate. */
  private def knnReplay(lshGate: Boolean = true)
      : (Seq[Long], Seq[(Long, Long)], Map[Long, Set[Long]]) = {
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .filter(_._1 < knnCap)
    val q = vecs.map { case (id, v) => id -> quant(v) }.toMap
    val bkt = vecs.map { case (id, v) =>
      id -> graft.functions.VectorFns.hyperplaneSig(v.toSeq, 4) }.toMap
    val ids = vecs.map(_._1).toSeq
    val knn = ids.flatMap { va =>
      ids.filter(vb => vb != va &&
          (!lshGate || Integer.bitCount(bkt(va) ^ bkt(vb)) <= 1))
        .map(vb => (d2(q(va), q(vb)) * knnCap + vb, vb))
        .sortBy(_._1).take(3).map { case (_, vb) => (va, vb) }
    }
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    knn.foreach { case (a, b) => adj(a) = adj(a) + b; adj(b) = adj(b) + a }
    (ids, knn, adj.toMap.withDefaultValue(Set.empty))
  }

  // ---------------- q168 kNN-graph BFS ----------------

  test("knnBfs: equals a driver LSH-gate+kNN+BFS replay on sf0.001") {
    val (ids, _, adj) = knnReplay()
    val src = ids.min
    val dist = scala.collection.mutable.Map(src -> 0L)
    var frontier = List(src)
    while (frontier.nonEmpty) {
      frontier = frontier.flatMap(u => adj(u).filterNot(dist.contains).map { v =>
        dist(v) = dist(u) + 1; v
      })
    }
    val want = ids.map(id => id -> dist.get(id)).toMap
    val got = Similarity.knnBfs(spark, sf0001)
      .as[(Long, Option[Long])].collect().toMap
    assert(got == want)
    assert(got.values.flatten.max >= 3,
      "the kNN graph must have non-trivial depth or BFS proves nothing")
  }

  test("knnEdges: LSH-gated candidates keep decent recall of the brute kNN edges") {
    val (_, lsh, _) = knnReplay(lshGate = true)
    val (_, brute, _) = knnReplay(lshGate = false)
    // Spark side ≡ the gated replay (the hash gate in miniature), then the
    // approximation quality claim: the q28 discipline — modest bound on
    // random 64-dim data, where sign-hash locality is weakest.
    val (_, got) = Similarity.knnEdges(spark, sf0001, k = 3, cap = knnCap)
    val gotDirectedPairs = got.select("ea", "eb").as[(Long, Long)].collect().toSet
    val wantSym = lsh.toSet.flatMap((p: (Long, Long)) => Set(p, p.swap))
    assert(gotDirectedPairs == wantSym, "Spark edges must equal the gated replay")
    val recall = brute.toSet.intersect(lsh.toSet).size.toDouble / brute.size
    assert(recall >= 0.3, s"LSH-kNN edge recall $recall vs brute kNN")
  }

  // ---------------- q175 label-propagation communities ----------------

  test("lpaCommunities: equals a driver synchronous-LPA replay; communities are non-trivial") {
    val (ids, _, adj) = knnReplay()
    var labels = ids.map(id => id -> id).toMap
    for (_ <- 1 to 4) {
      labels = ids.map { v =>
        val nbr = adj(v)
        if (nbr.isEmpty) v -> labels(v)
        else {
          val counts = nbr.toSeq.map(labels).groupBy(identity)
            .map { case (l, o) => (l, o.size) }
          val mct = counts.values.max
          v -> counts.collect { case (l, c) if c == mct => l }.min
        }
      }.toMap
    }
    val got = Similarity.lpaCommunities(spark, sf0001)
      .as[(Long, Long, Long)].collect()
      .map { case (v, c, s) => v -> (c, s) }.toMap
    val sizes = labels.values.groupBy(identity).map { case (l, o) => l -> o.size.toLong }
    assert(got.keySet == ids.toSet)
    for (v <- ids)
      assert(got(v) == (labels(v), sizes(labels(v))), s"node $v diverges from replay")
    // plurality propagation must actually cluster: several communities, and
    // real ones (a max-size-1 result would mean no propagation happened)
    assert(sizes.size > 1, "everything collapsed into one community")
    assert(sizes.values.max >= 5, s"no community of size >= 5: $sizes")
  }

  // ---------------- q169 Poisson bootstrap ----------------

  test("bootstrapCi: equals a driver md5->Poisson replay, doubles exact") {
    val rows = Relational.bootstrapJoined(spark, sf0001)
      .as[(String, Long, Long)].collect()
    val thr = Relational.poissonThresholds
    def w(rep: Int, okey: Long): Long = {
      val h = (u52(s"bootA_$okey") + rep * u52(s"bootB_$okey")) % 4503599627370449L
      thr.count(h >= _).toLong
    }
    val want = rows.groupBy(_._1).map { case (seg, rs) =>
      val n = rs.length.toLong
      val exact = rs.map(_._3).sum.toDouble / n.toDouble
      val means = (0 until 32).flatMap { r =>
        val sw = rs.map(x => w(r, x._2)).sum
        val swc = rs.map(x => w(r, x._2) * x._3).sum
        if (sw > 0) Some(swc.toDouble / sw.toDouble) else None
      }.sorted
      val (lo, hi) = (means(1), means(means.length - 2))
      seg -> ((n, exact, lo, hi, exact >= lo && exact <= hi))
    }
    val got = Relational.bootstrapCi(spark, sf0001)
      .as[(String, Long, Double, Double, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == want)
    // the interval is a real interval and the replicate spread is nonzero
    got.values.foreach { case (_, _, lo, hi, _) => assert(lo < hi) }
  }

  // ---------------- q170 Markov removal-effect attribution ----------------

  test("markovAttribution: equals a driver journey->chain->fixed-point replay") {
    val S = 1048576L
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select(unix_micros(col("event_time")).as("tsm"),
        to_date(col("event_time")).cast("string").as("d"),
        col("user_id"), col("event_id"), col("event_type"))
      .as[(Long, String, Long, Long, String)].collect()
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    ev.groupBy(e => (e._3, e._2)).foreach { case (_, es) =>
      val sorted = es.sortBy(e => (e._1, e._4)).toList
      val pIdx = sorted.indexWhere(_._5 == "purchase")
      val kept = if (pIdx >= 0) sorted.take(pIdx + 1) else sorted
      val names = kept.map(_._5)
      def toState(s: String) = if (s == "purchase") "CONV" else s
      trans(("START", toState(names.head))) += 1
      names.sliding(2).foreach {
        case List(a, b) if a != "purchase" => trans((a, toState(b))) += 1
        case _ =>
      }
      if (names.last != "purchase") trans((names.last, "NULL")) += 1
    }
    val tot = trans.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val m = trans.map { case ((f, t), c) => (f, t, c * S / tot(f)) }.toSeq
    val channels = m.map(_._1).filter(_ != "START").distinct.sorted
    val states = "START" +: channels
    val p0 = states.map(s =>
      s -> m.collectFirst { case (`s`, "CONV", p) => p }.getOrElse(0L)).toMap
    def solve(rm: Option[String]): Long = {
      var p = p0
      for (_ <- 1 to 12) {
        p = states.map { s =>
          val flow = m.iterator.filter { case (f, t, _) =>
            f == s && channels.contains(t) && !rm.contains(t) }
            .map { case (_, t, pr) => pr * p(t) }.sum
          s -> (p0(s) + flow / S)
        }.toMap
      }
      p("START")
    }
    val pf = solve(None)
    val rws = channels.map(c => (c, pf, solve(Some(c))))
    val tre = rws.map { case (_, a, b) => a - b }.sum
    val want = rws.map { case (c, a, b) =>
      c -> ((a.toDouble / S, b.toDouble / S, (a - b).toDouble / S,
        if (tre > 0) Some(((a - b) * S / tre).toDouble / S) else None))
    }.toMap
    val got = Relational.markovAttribution(spark, sf0001)
      .as[(String, Double, Double, Double, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == want)
    // structural guarantees: removal never helps, shares are a partition
    got.values.foreach { case (full, removed, re, _) =>
      assert(removed <= full && re >= 0.0)
    }
    val shareSum = got.values.flatMap(_._4).sum
    assert(shareSum > 0.99 && shareSum <= 1.000001,
      s"shares must partition the total effect, got $shareSum")
  }

  // ---------------- q171 positional inverted index ----------------

  test("positionalIndex: equals a driver tokenize->postings replay") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val re = "[a-z0-9]+".r
    val perTermDoc = docs.flatMap { case (id, text) =>
      re.findAllIn(text.toLowerCase).zipWithIndex.map { case (t, p) => (t, id, p) }
    }.groupBy(x => (x._1, x._2)).map { case ((t, id), xs) =>
      val ps = xs.map(_._3).sorted
      (t, id, ps.length.toLong, s"$id:${ps.length}:${ps.mkString(".")}")
    }
    val want = perTermDoc.groupBy(x => (x._1, x._2 / 256)).map { case ((t, c), xs) =>
      val sorted = xs.toSeq.sortBy(_._2)
      (t, c) -> ((sorted.length.toLong, sorted.map(_._3).sum,
        sorted.map(_._4).mkString("|")))
    }
    val got = TextOps.positionalIndex(spark, sf0001)
      .as[(String, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got == want)
    // positions are real: some term must occur more than once in one doc
    assert(got.values.exists(_._3.matches(""".*:\d+:\d+\.\d+.*""")),
      "fixture must exercise multi-position postings")
  }

  // ---------------- q172 embedding whitening ----------------

  test("whitenEmbeddings: equals a driver exact-moment replay; output is centered and clamped") {
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val comp = vecs.flatMap { case (id, v) =>
      v.zipWithIndex.map { case (x, d) =>
        (id, d, math.floor(x.toDouble * 1048576L).toLong) }
    }
    val byDim = comp.groupBy(_._2).map { case (d, xs) =>
      val n = BigInt(xs.length)
      val s = xs.map(x => BigInt(x._3)).sum
      val s2 = xs.map(x => BigInt(x._3) * x._3).sum
      val r = BigInt(math.floor(math.sqrt((n * s2 - s * s).toDouble)).toLong)
      d -> ((n, s, r))
    }
    val want = comp.map { case (id, d, xq) =>
      val (n, s, r) = byDim(d)
      val z32 =
        if (r > 0) {
          val z = (n * xq - s).toDouble / r.toDouble
          math.max(-127L, math.min(127L, math.floor(z * 32).toLong))
        } else 0L
      (id, d, xq) -> z32
    }.toMap
    val got = Similarity.whitenEmbeddings(spark, sf0001)
      .as[(Long, Int, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    assert(got == want)
    assert(got.values.exists(_ == 127L) || got.values.exists(_ == -127L) ||
      got.values.exists(v => math.abs(v) > 40),
      "whitened values must actually spread over the int8 range")
  }

  // ---------------- q173 priority sampling ----------------

  test("prioritySample: equals a driver priority replay; HT estimate is sane across seeds") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), greatest(col("n_chars"), lit(1L)).as("w"))
      .as[(Long, Long)].collect()
    val prio = docs.map { case (id, w) =>
      val h = math.max(1L, u52(s"prio_$id"))
      (id, w, (w * 4503599627370496L).toDouble / h.toDouble)
    }.sortBy(x => (-x._3, x._1))
    val k = 64
    val tau20 =
      if (prio.length > k) math.floor(prio(k)._3 * 1048576L).toLong else 0L
    val kept = prio.take(k)
    val est20 = kept.map(x => math.max(x._2 * 1048576L, tau20)).sum
    val exact = docs.map(_._2).sum
    val want = kept.zipWithIndex.map { case ((id, w, p), i) =>
      id -> ((i + 1, w, p, math.max(w * 1048576L, tau20).toDouble / 1048576L,
        est20.toDouble / 1048576L, exact,
        math.abs(est20 - exact * 1048576L) * 20L <= exact * 1048576L * 7L))
    }.toMap
    val got = TextOps.prioritySample(spark, sf0001)
      .as[(Int, Long, Long, Double, Double, Double, Long, Boolean)].collect()
      .map(r => r._2 -> ((r._1, r._3, r._4, r._5, r._6, r._7, r._8))).toMap
    assert(got == want)
    // heavier docs are over-represented vs uniform sampling: the kept set's
    // mean weight must exceed the corpus mean (the point of weighting)
    val meanKept = kept.map(_._2).sum.toDouble / k
    val meanAll = exact.toDouble / docs.length
    assert(meanKept > meanAll)
  }
}
