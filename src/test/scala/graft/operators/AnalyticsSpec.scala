package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** q131–q136: data-quality validation, frequent-items sketch, market-basket
  * mining, DP release, Markov transitions, A/B analysis. */
class AnalyticsSpec extends SparkSuite {

  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def u52(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 13), 16)

  // ---------------- q131 quality checks ----------------

  test("qualityChecks: every constraint passes on the clean synthetic tables") {
    val rows = Quality.qualityChecks(spark, sf001)
      .select("check", "passed").as[(String, Boolean)].collect().toMap
    assert(rows.size == 7)
    assert(rows.values.forall(identity), s"clean data must pass all checks: $rows")
  }

  test("qualityChecksFrom: constructed corruptions fail exactly the right checks with the right metrics") {
    val orders = Seq(
      (1L, 10L, "O", 5.0), (2L, 10L, "F", 6.0),
      (2L, 99L, "X", -1.0), // dup key, orphan custkey, bad status, bad price
      (3L, 11L, "P", 7.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val customer = Seq(10L, 11L).toDF("c_custkey")
    val lineitem = Seq((1L, 1), (7L, 1)).toDF("l_orderkey", "l_linenumber")
    val got = Quality.qualityChecksFrom(orders, customer, lineitem)
      .select("check", "metric", "passed").as[(String, Double, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("size_min") == ((4.0, true)))
    assert(got("completeness_custkey") == ((1.0, true)))
    assert(got("uniqueness_orderkey") == ((0.75, false)), "3 distinct / 4 rows")
    assert(got("compliance_status") == ((0.75, false)))
    assert(got("range_totalprice") == ((0.75, false)))
    assert(got("ri_orders_customer") == ((0.75, false)), "custkey 99 is orphan")
    assert(got("ri_lineitem_orders") == ((0.5, false)), "orderkey 7 is orphan")
  }

  // ---------------- q132 Misra-Gries ----------------

  test("misraGries aggregator: bound and presence guarantees hold under every merge order") {
    val k = 4
    val stream = (Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
      (1 to 40).map(i => s"cold_$i") ++ Seq.fill(15)("mild")).toVector
    val n = stream.length
    val exact = stream.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val agg = graft.functions.Aggregators.misraGriesAgg(k)
    // three partition splits x two merge orders
    for (cut <- Seq(20, 70, 120)) {
      val parts = Seq(stream.take(cut), stream.slice(cut, 2 * cut min n),
        stream.drop(2 * cut min n))
      // merge mutates buffers in place (Spark never reuses a merged partial,
      // so the aggregator is allowed to) — rebuild them per merge order
      def bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      for (merged <- Seq(
        agg.finish(bufs.reduce(agg.merge)),
        agg.finish(bufs.reverse.reduce(agg.merge)))) {
        exact.foreach { case (key, c) =>
          if (c > n.toDouble / (k + 1))
            assert(merged.contains(key), s"frequent '$key' ($c > n/${k + 1}) must be tracked")
          merged.get(key).foreach { est =>
            assert(est <= c, s"'$key' overcounted: $est > $c")
            assert(c - est <= n.toDouble / (k + 1), s"'$key' error ${c - est} > n/(k+1)")
          }
        }
        merged.keys.foreach(key => assert(exact.contains(key)))
        assert(merged.size <= k)
      }
    }
  }

  test("freqItems: flags are all true and the geometric key derivation matches a driver replay") {
    val got = Relational.freqItems(spark, sf0001)
      .select("key", "exact_ct", "guaranteed", "presence_ok", "bound_ok")
      .as[(String, Long, Boolean, Boolean, Boolean)].collect()
    assert(got.nonEmpty)
    assert(got.forall(_._4), "presence_ok must hold everywhere")
    assert(got.forall(_._5), "bound_ok must hold everywhere")
    assert(got.exists(_._3), "the top geometric levels must be guaranteed-frequent")
    val ids = graft.Tables.load(spark, sf0001, "events")
      .select(col("event_id")).as[Long].collect()
    val exact = ids.map { id =>
      val x = id % 1024
      "lvl_" + (0 to 9).count(j => x >= (1L << j))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got.map(r => r._1 -> r._2).toMap == exact)
  }

  // ---------------- q133 market basket ----------------

  test("marketBasket: pair counts, support, confidence and lift match a brute-force replay") {
    val minsup = 5L
    val baskets = graft.Tables.load(spark, sf0001, "lineitem")
      .join(graft.Tables.load(spark, sf0001, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as[Long], col("p_brand").as[String])
      .distinct().collect()
    val nB = baskets.map(_._1).distinct.length
    val itemCt = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val pairCt = byOrder.values.flatMap { items =>
      for (a <- items; b <- items if a < b) yield (a, b)
    }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = pairCt.collect {
      case ((a, b), c) if c >= minsup && itemCt(a) >= minsup && itemCt(b) >= minsup =>
        (a, b, c, c.toDouble / nB, c.toDouble / itemCt(a),
          c.toDouble * nB / (itemCt(a) * itemCt(b)).toDouble)
    }.toSet
    val got = Relational.marketBasket(spark, sf0001, minsup)
      .as[(String, String, Long, Double, Double, Double)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  // ---------------- q134 DP release ----------------

  test("dpRelease: noise replays the seeded two-sided geometric exactly and clamps at zero") {
    def tz(h: Long): Int = (1 to 52).count(j => h % (1L << j) == 0)
    val truth = graft.Tables.load(spark, sf0001, "customer")
      .groupBy(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("ct"))
      .as[(Long, String, Long)].collect()
    val want = truth.map { case (nat, seg, ct) =>
      val noise = tz(u52(s"dp1_${nat}_$seg")) - tz(u52(s"dp2_${nat}_$seg"))
      (nat, seg) -> math.max(ct + noise, 0L)
    }.toMap
    val got = Relational.dpRelease(spark, sf0001)
      .select("nation", "segment", "released")
      .as[(Long, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == want)
    assert(got.values.forall(_ >= 0))
    // the mechanism must actually perturb something on this fixture
    assert(truth.exists { case (nat, seg, ct) => want((nat, seg)) != ct })
  }

  // ---------------- q135 transitions ----------------

  test("eventTransitions: counts match an in-order driver replay; probabilities row-normalize") {
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select(col("user_id").as[Long], col("event_id").as[Long],
        col("event_time").cast("long").as[Long], col("event_type").as[String])
      .collect()
    val want = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._3, r._2)).map(_._4)
      sorted.zip(sorted.tail)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Relational.eventTransitions(spark, sf0001)
      .as[(String, String, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2) -> r._3).toMap == want)
    got.groupBy(_._1).values.foreach { rows =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9, "probs must sum to 1 per from_type")
    }
  }

  // ---------------- q136 A/B test ----------------

  test("abTest: assignment, conversion and the z statistic match a driver replay") {
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select(col("user_id").as[Long], col("event_type").as[String],
        col("value").as[Double]).collect()
    val conv = ev.groupBy(_._1).view.mapValues(rows =>
      if (rows.exists(r => r._2 == "purchase" && r._3 > 150)) 1L else 0L).toMap
    val arms = conv.keys.toSeq.groupBy(u => if (u52(s"exp1_$u") % 2 == 0) "A" else "B")
    val (na, xa) = (arms("A").size.toLong, arms("A").map(conv).sum)
    val (nb, xb) = (arms("B").size.toLong, arms("B").map(conv).sum)
    val (ra, rb) = (xa.toDouble / na, xb.toDouble / nb)
    val p = (xa + xb).toDouble / (na + nb)
    val z = (ra - rb) / math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
    val row = Relational.abTest(spark, sf0001)
      .as[(Long, Long, Double, Long, Long, Double, Double, Boolean)].collect().head
    assert(row == ((na, xa, ra, nb, xb, rb, z, math.abs(z) > 1.96)))
    assert(na + nb == conv.size, "arms must partition the users")
  }

  // ---------------- q137 column stats ----------------

  test("columnStats: exact stats match a driver replay; every approx-NDV flag holds") {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice")
    val li = graft.Tables.load(spark, sf0001, "lineitem")
      .select(cols.map(c => col(c).cast("double")): _*).collect()
    val want = cols.zipWithIndex.map { case (c, i) =>
      val vs = li.map(_.getDouble(i))
      c -> ((vs.length.toLong, vs.min, vs.max, vs.distinct.length.toLong))
    }.toMap
    val got = Quality.columnStats(spark, sf0001)
      .as[(String, Long, Double, Double, Long, Boolean)].collect()
    assert(got.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap == want)
    assert(got.forall(_._6), "HLL NDV must sit within tolerance of exact on every column")
  }

  // ---------------- q138 anomaly detection ----------------

  test("anomalyZscoreFrom: a spike and an outage flag; warm-up rows are not scored; baseline stays quiet") {
    // 40-hour two-day series: alternating 9/11 baseline (nonzero sd), an
    // outage (0) at hour 28 — whose trailing window is pure baseline — and
    // a spike (100) at hour 36 (window then contains the outage; still
    // flags by a wide margin)
    val grid = (0 until 40).map { h =>
      val ct = if (h == 28) 0L else if (h == 36) 100L
        else if (h % 2 == 0) 9L else 11L
      ("x", f"2024-01-0${1 + h / 24} ${h % 24}%02d:00:00", ct)
    }.toDF("event_type", "hour", "ct")
    val got = Relational.anomalyZscoreFrom(grid)
      .as[(String, String, Long, Double, Option[Double], Boolean)].collect()
      .map(r => r._2 -> r).toMap
    assert(got.size == 16, "first 24 hours must be unscored warm-up")
    val flagged = got.values.filter(_._6).map(_._2).toSet
    assert(flagged == Set("2024-01-02 04:00:00", "2024-01-02 12:00:00"),
      s"exactly the outage and the spike must flag, got $flagged")
    // driver replay of the outage z: its window (hours 4..27) holds 12
    // nines and 12 elevens -> sum 240, sumsq 2424, mean 10, var 24/23
    val sd = math.sqrt((2424.0 - 240.0 * 240.0 / 24) / 23)
    assert(math.abs(got("2024-01-02 04:00:00")._5.get - (0.0 - 10.0) / sd) < 1e-12)
  }

  // ---------------- q139 triangles ----------------

  test("triangleCounts: per-node triangles and clustering match a brute-force replay") {
    val got = Relational.triangleCounts(spark, sf0001, minSupport = 0.0, minsup = 5)
      .as[(String, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val minsup = 5L
    val baskets = graft.Tables.load(spark, sf0001, "lineitem")
      .join(graft.Tables.load(spark, sf0001, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as[Long], col("p_brand").as[String])
      .distinct().collect()
    val itemCt = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val edges = byOrder.values.flatMap { items =>
      for (a <- items; b <- items if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .collect { case ((a, b), c)
        if c >= minsup && itemCt(a) >= minsup && itemCt(b) >= minsup => (a, b) }
      .toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val adj = nodes.map(v => v -> edges.collect {
      case (a, b) if a == v => b
      case (a, b) if b == v => a
    }).toMap
    val triPerNode = nodes.map { v =>
      val nb = adj(v).toSeq
      v -> (for (i <- nb.indices; j <- i + 1 until nb.length
                 if edges.contains(if (nb(i) < nb(j)) (nb(i), nb(j)) else (nb(j), nb(i))))
        yield 1).size.toLong
    }.toMap
    val want = nodes.map { v =>
      val d = adj(v).size.toLong
      val t = triPerNode(v)
      (v, d, t, if (d >= 2) 2.0 * t / (d * (d - 1)).toDouble else 0.0)
    }
    assert(got.toSet == want)
    // sanity: triangle incidences sum to 3x the number of distinct triangles
    assert(got.map(_._3).sum % 3 == 0)
  }

  // ---------------- q140 Welch t-test ----------------

  test("welchTtest: moments, t statistic and Satterthwaite df match a driver replay") {
    val ev = graft.Tables.load(spark, sf0001, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as[Long],
        floor(col("value") * 100).cast("long").as[Long]).collect()
    val byArm = ev.groupBy(r => if (u52(s"exp1_${r._1}") % 2 == 0) "A" else "B")
      .view.mapValues(_.map(_._2)).toMap
    def stats(xs: Array[Long]) = {
      val n = xs.length.toLong
      val s = xs.sum
      val ss = xs.map(x => x * x).sum
      val m = s.toDouble / n
      val w = ((ss.toDouble - s.toDouble * s / n) / (n - 1)) / n
      (n, m, w)
    }
    val (na, ma, wa) = stats(byArm("A"))
    val (nb, mb, wb) = stats(byArm("B"))
    val t = (ma - mb) / math.sqrt(wa + wb)
    val df = (wa + wb) * (wa + wb) / (wa * wa / (na - 1) + wb * wb / (nb - 1))
    val row = Relational.welchTtest(spark, sf0001)
      .as[(Long, Double, Long, Double, Double, Double, Boolean)].collect().head
    assert(row == ((na, ma, nb, mb, t, df, math.abs(t) > 1.96)))
    assert(df > 1.0 && df < (na + nb).toDouble)
  }

  // ---------------- q141 calibration ----------------

  test("classifierCalibration: bins partition the corpus and match a driver replay") {
    val scored = TextOps.classifierFilter(spark, sf0001)
      .select(col("doc_id").as[Long], col("score").as[Long]).collect().toMap
    val toks = graft.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id").as[Long], col("text").as[String]).collect()
      .map { case (id, text) =>
        val ts = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
        id -> (if (2 * ts.distinct.length >= ts.length) 1L else 0L)
      }.toMap
    val (lo, hi) = (scored.values.min, scored.values.max)
    val want = scored.toSeq.map { case (id, s) =>
      val bin = if (hi == lo) 0L
        else math.floor(((s - lo) * 10).toDouble / (hi - lo + 1)).toLong
      (bin, s, toks(id))
    }.groupBy(_._1).map { case (bin, rows) =>
      (bin, rows.length.toLong,
        rows.map(_._2).sum.toDouble / rows.length,
        rows.map(_._3).sum.toDouble / rows.length)
    }.toSet
    val got = TextOps.classifierCalibration(spark, sf0001)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(got == want)
    assert(got.map(_._2).sum == scored.size, "bins must partition the corpus")
  }

  // ---------------- q142 MMR ----------------

  test("mmrRerank: greedy selection matches a driver replay; first pick maximizes relevance; result diversifies") {
    val e = graft.Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id").as[Long], col("embedding").as[Seq[Float]]).collect()
    val qv = e.map { case (id, v) =>
      val mx = math.max(v.map(x => math.abs(x.toDouble)).max, 1e-9)
      val scale = 127.0 / mx
      id -> v.map(x => math.round(x * scale).toInt).toSeq
    }.toMap
    def dot(a: Seq[Int], b: Seq[Int]): Long =
      a.zip(b).map { case (x, y) => x.toLong * y }.sum
    val queries = qv.keys.filter(_ < 3)
    val want = queries.flatMap { q =>
      val rel = qv.keys.filter(_ != q).map(c => c -> dot(qv(q), qv(c))).toSeq
      val top = rel.sortBy { case (id, r) => (-r, id) }.take(12)
      var selected = List.empty[(Long, Long)]
      (1 to 5).map { rank =>
        val pick = top.filterNot(c => selected.exists(_._1 == c._1))
          .map { case (id, r) =>
            val pen = if (selected.isEmpty) 0L
              else selected.map(s => dot(qv(id), qv(s._1))).max
            (id, r - pen)
          }.minBy { case (id, sc) => (-sc, id) }
        selected ::= pick
        (q, rank, pick._1, pick._2)
      }
    }.toSet
    val got = Similarity.mmrRerank(spark, sf0001)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(got == want)
    // theorem: rank-1 pick is the pure-relevance argmax
    for (q <- queries) {
      val rel = qv.keys.filter(_ != q).map(c => c -> dot(qv(q), qv(c))).toSeq
      val best = rel.minBy { case (id, r) => (-r, id) }._1
      assert(got.exists(r => r._1 == q && r._2 == 1 && r._3 == best))
    }
    // diversification: somewhere the MMR list departs from pure relevance
    val diverged = queries.exists { q =>
      val rel = qv.keys.filter(_ != q).map(c => c -> dot(qv(q), qv(c))).toSeq
      val pure = rel.sortBy { case (id, r) => (-r, id) }.take(5).map(_._1).toSet
      got.filter(_._1 == q).map(_._3) != pure
    }
    assert(diverged, "MMR must trade some relevance for diversity on this corpus")
  }

  // ---------------- q143 DBSCAN ----------------

  test("dbscan: labeling matches a driver replay; roles obey the density definitions") {
    val e = graft.Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id").as[Long], col("embedding").as[Seq[Float]]).collect()
      .filter(_._1 < 500)
    val qv = e.map { case (id, v) =>
      val mx = math.max(v.map(x => math.abs(x.toDouble)).max, 1e-9)
      val scale = 127.0 / mx
      id -> v.map(x => math.round(x * scale).toInt).toSeq
    }.toMap
    def d2(a: Seq[Int], b: Seq[Int]): Long =
      a.zip(b).map { case (x, y) => val d = (x - y).toLong; d * d }.sum
    val ids = qv.keys.toSeq.sorted
    val (eps2, minPts) = (150000L, 4)
    val neigh = ids.map(i =>
      i -> ids.filter(j => j != i && d2(qv(i), qv(j)) <= eps2).toSet).toMap
    val core = ids.filter(i => neigh(i).size + 1 >= minPts).toSet
    // union-find over core-core edges
    val par = scala.collection.mutable.Map(core.map(c => c -> c).toSeq: _*)
    def find(x: Long): Long = { var r = x; while (par(r) != r) r = par(r); r }
    for (a <- core; b <- neigh(a) if core(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) par(rb) = ra else par(ra) = rb }
    }
    // component label = min member id
    val lbl = core.groupBy(find).flatMap { case (_, m) => m.map(_ -> m.min) }
    val want = ids.map { i =>
      if (core(i)) (i, "core", lbl(i))
      else {
        val cn = neigh(i).filter(core)
        if (cn.nonEmpty) (i, "border", cn.map(lbl).min) else (i, "noise", -1L)
      }
    }.toSet
    val got = Similarity.dbscan(spark, sf0001)
      .as[(Long, String, Long)].collect().toSet
    assert(got == want)
    val roles = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(roles.getOrElse("core", 0) > 0 && roles.getOrElse("noise", 0) > 0,
      s"fixture must exercise core and noise roles: $roles")
    got.foreach { case (_, role, c) =>
      assert((role == "noise") == (c == -1L), "noise iff cluster_id = -1") }
  }

  // ---------------- q144 grouped OLS ----------------

  test("groupRegression: per-nation slope/intercept/r2 match an exact-moment driver replay") {
    val rows = graft.Tables.load(spark, sf0001, "orders")
      .join(graft.Tables.load(spark, sf0001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as[Long],
        floor(col("c_acctbal") * 100).cast("long").as[Long],
        floor(col("o_totalprice") * 100).cast("long").as[Long]).collect()
    val want = rows.groupBy(_._1).map { case (nat, rs) =>
      val n = rs.length.toLong
      val (sx, sy) = (rs.map(_._2).sum, rs.map(_._3).sum)
      val sxx = rs.map(r => BigInt(r._2) * r._2).sum
      val sxy = rs.map(r => BigInt(r._2) * r._3).sum
      val syy = rs.map(r => BigInt(r._3) * r._3).sum
      val (dn, dsx, dsy) = (n.toDouble, sx.toDouble, sy.toDouble)
      val cov = dn * sxy.toDouble - dsx * dsy
      val varx = dn * sxx.toDouble - dsx * dsx
      val vary = dn * syy.toDouble - dsy * dsy
      (nat, n, cov / varx, (dsy - cov / varx * dsx) / dn,
        cov * cov / (varx * vary))
    }.toSet
    val got = Relational.groupRegression(spark, sf0001)
      .as[(Long, Long, Double, Double, Double)].collect().toSet
    assert(got == want)
    got.foreach { case (nat, _, _, _, r2) =>
      assert(r2 >= 0 && r2 <= 1, s"nation $nat r2 $r2 out of [0,1]") }
  }

  // ---------------- q145 chi-square ----------------

  test("chiSquare: statistic matches a driver replay over the FULL grid including zero cells") {
    val cs = graft.Tables.load(spark, sf0001, "customer")
      .select(col("c_nationkey").cast("long").as[Long],
        col("c_mktsegment").as[String]).collect()
    val cells = cs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nats = cs.map(_._1).distinct
    val segs = cs.map(_._2).distinct
    val rt = nats.map(n => n -> cs.count(_._1 == n).toLong).toMap
    val ct = segs.map(s => s -> cs.count(_._2 == s).toLong).toMap
    val n = cs.length.toLong
    val qsum = (for (na <- nats; se <- segs) yield {
      val o = cells.getOrElse((na, se), 0L)
      val e = rt(na).toDouble * ct(se) / n
      math.floor((o.toDouble - e) * (o.toDouble - e) / e * (1L << 20)).toLong
    }).sum
    val chi2 = qsum.toDouble / (1L << 20)
    val df = (nats.length - 1L) * (segs.length - 1L)
    val v = math.sqrt(chi2 / (n * math.min(nats.length - 1L, segs.length - 1L)).toDouble)
    val row = Relational.chiSquare(spark, sf0001)
      .as[(Double, Long, Double)].collect().head
    assert(row == ((chi2, df, v)))
    // sf0.001 is sparse over the 125-cell grid: zero cells MUST be present
    assert(cells.size < nats.length * segs.length,
      "fixture must exercise the zero-cell branch")
  }

  // ---------------- q146 join-size estimate ----------------

  test("joinSizeEstimate: CMS inner product matches a driver replay, never undercounts, overcount plausible") {
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select(col("event_type").as[String], col("user_id").as[Long]).collect()
    def cells(typ: String): Map[(Int, String), Long] =
      ev.filter(_._1 == typ).flatMap { case (_, u) =>
        (0 until 4).map(r => (r, md5hex(s"${r}_$u").substring(0, 2)))
      }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (ca, cb) = (cells("click"), cells("purchase"))
    val est = (0 until 4).map { r =>
      ca.collect { case ((`r`, b), c) => c * cb.getOrElse((r, b), 0L) }.sum
    }.min
    val fa = ev.filter(_._1 == "click").groupBy(_._2).view.mapValues(_.length.toLong)
    val fb = ev.filter(_._1 == "purchase").groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val exact = fa.map { case (u, f) => f * fb.getOrElse(u, 0L) }.sum
    val row = Relational.joinSizeEstimate(spark, sf0001)
      .as[(Long, Long, Long, Boolean)].collect().head
    assert(row == ((exact, est, est - exact, true)))
    assert(est >= exact, "CMS inner product must never undercount")
    val (na, nb) = (ev.count(_._1 == "click").toLong, ev.count(_._1 == "purchase").toLong)
    assert(est - exact <= na * nb / 64,
      s"overcount ${est - exact} outside the plausible band for |A|=$na |B|=$nb")
  }

  // ---------------- q147 item-item CF ----------------

  test("itemCf: similarity ranking matches a brute-force co-purchase replay") {
    val m = graft.Tables.load(spark, sf0001, "lineitem")
      .join(graft.Tables.load(spark, sf0001, "part"),
        col("l_partkey") === col("p_partkey"))
      .join(graft.Tables.load(spark, sf0001, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("u"), col("p_brand").as("item"))
      .agg(count(lit(1)).as("ct"))
      .as[(Long, String, Long)].collect()
    val byUser = m.groupBy(_._1)
    val n2 = m.groupBy(_._2).view.mapValues(_.map(r => r._3 * r._3).sum).toMap
    val co = byUser.values.flatMap { rowsArr =>
      val rows = rowsArr.toSeq
      for (a <- rows; b <- rows if a._2 != b._2) yield ((a._2, b._2), (a._3 * b._3, 1L))
    }.groupBy(_._1).view.mapValues(vs => (vs.map(_._2._1).sum, vs.map(_._2._2).sum))
      .filter(_._2._2 >= 2).toMap
    val scored = co.map { case ((ia, ib), (dot, _)) =>
      val cos = dot.toDouble / (math.sqrt(n2(ia).toDouble) * math.sqrt(n2(ib).toDouble))
      (ia, ib, math.floor(cos * (1L << 20)).toLong)
    }
    val want = scored.groupBy(_._1).flatMap { case (ia, rows) =>
      rows.toSeq.sortBy { case (_, ib, q) => (-q, ib) }.take(5)
        .zipWithIndex.map { case ((_, ib, q), i) =>
          (ia, ib, i + 1, q.toDouble / (1L << 20)) }
    }.toSet
    val got = Relational.itemCf(spark, sf0001)
      .as[(String, String, Int, Double)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  // ---------------- q148 AQP ----------------

  test("aqpEstimate: sampled estimate matches a driver replay; CI coverage plausible across seeds") {
    val cents = graft.Tables.load(spark, sf0001, "orders")
      .select(col("o_orderkey").as[Long],
        floor(col("o_totalprice") * 100).cast("long").as[Long]).collect()
    def sample(seed: String) = cents.filter { case (k, _) => u52(s"${seed}_$k") % 16 == 0 }
    val s = sample("aqp1")
    val (nS, nX) = (s.length.toLong, cents.length.toLong)
    val (sS, sX) = (s.map(_._2).sum, cents.map(_._2).sum)
    val ssS = s.map(x => x._2 * x._2).sum
    val meanS = sS.toDouble / nS
    val meanX = sX.toDouble / nX
    val ci = 1.96 * math.sqrt((ssS.toDouble - sS.toDouble * sS / nS) / (nS - 1)) /
      math.sqrt(nS.toDouble)
    val estT = sS.toDouble * 16
    val row = Relational.aqpEstimate(spark, sf0001)
      .as[(Long, Long, Double, Double, Double, Boolean, Double, Double, Double)]
      .collect().head
    assert(row == ((nS, nX, meanS, meanX, ci, math.abs(meanS - meanX) <= ci,
      estT, sX.toDouble, math.abs(estT - sX.toDouble) / sX.toDouble)))
    // statistical sanity: across 40 independent seeds, the CLT interval
    // should cover the true mean ~95% of the time — gate loosely at 80%
    val covered = (1 to 40).count { i =>
      val si = sample(s"seed$i")
      val (n, sm) = (si.length.toLong, si.map(_._2).sum)
      val ss = si.map(x => x._2 * x._2).sum
      val m = sm.toDouble / n
      val c = 1.96 * math.sqrt((ss.toDouble - sm.toDouble * sm / n) / (n - 1)) /
        math.sqrt(n.toDouble)
      math.abs(m - meanX) <= c
    }
    assert(covered >= 32, s"CI covered the true mean only $covered/40 times")
  }

  // ---------------- q149 skyline ----------------

  test("skyline: local-then-merge sweep equals the O(n²) dominance definition; partitioning-invariant") {
    val pts = graft.Tables.load(spark, sf0001, "customer")
      .join(graft.Tables.load(spark, sf0001, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("sp")),
        col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey").as[Long],
        floor(col("c_acctbal") * 100).cast("long").as[Long],
        coalesce(col("sp"), lit(0L)).as[Long])
      .collect()
    val brute = pts.filter { q =>
      !pts.exists(d => d._2 >= q._2 && d._3 >= q._3 &&
        (d._2 > q._2 || d._3 > q._3))
    }.toSet
    val got = Relational.skyline(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute)
    // every survivor holds: no other point beats it on both axes
    got.foreach { q =>
      assert(!pts.exists(d => d._2 > q._2 && d._3 >= q._3))
      assert(!pts.exists(d => d._2 >= q._2 && d._3 > q._3))
    }
  }

  // ---------------- q151 Kaplan-Meier ----------------

  test("kaplanMeier: scaled-integer curve matches a driver fold; survival is monotone non-increasing") {
    val rows = Relational.kaplanMeier(spark, sf0001)
      .orderBy("duration_days")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    // at-risk at the smallest duration is the whole population
    val nCust = graft.Tables.load(spark, sf0001, "orders")
      .select("o_custkey").distinct().count()
    assert(rows.head._2 == nCust)
    // driver replay of the scaled product fold over (n, d) in duration order
    var p = 1099511627776L
    rows.foreach { case (_, n, d, c, scaled, surv) =>
      p = p * (n - d) / n
      assert(scaled == p, "fold mismatch")
      assert(surv == scaled.toDouble / 1099511627776.0)
      assert(c >= 0 && d >= 0)
    }
    // monotone non-increasing, starts at <= 1
    rows.map(_._5).sliding(2).foreach {
      case Array(a, b) => assert(b <= a); case _ =>
    }
    // at-risk counts telescope: n(t) - (events+censored at t) = n(next t)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._2 - a._3 - a._4 == b._2); case _ =>
    }
  }

  // ---------------- q150 k-core ----------------

  test("kCore: peel labels, core degrees and convergence match a driver-side peel replay") {
    val k = 6; val minCo = 26L; val rounds = 6
    val slots = graft.Tables.load(spark, sf0001, "events")
      .select(col("user_id"), col("event_type"),
        date_trunc("day", col("event_time")).as("d"))
      .distinct()
      .as[(Long, String, java.sql.Timestamp)].collect()
    val co = collection.mutable.Map.empty[(Long, Long), Long]
    slots.groupBy(s => (s._2, s._3)).values.foreach { grp =>
      val us = grp.map(_._1).distinct.sorted
      for (i <- us.indices; j <- (i + 1) until us.length)
        co((us(i), us(j))) = co.getOrElse((us(i), us(j)), 0L) + 1L
    }
    var edges = co.filter(_._2 >= minCo).keys.toSet
    val allNodes = edges.flatMap(e => Set(e._1, e._2))
    var alive = allNodes
    val peel = collection.mutable.Map.empty[Long, Int]
    for (r <- 1 to rounds) {
      val deg = collection.mutable.Map.empty[Long, Long]
      edges.foreach { case (a, b) =>
        deg(a) = deg.getOrElse(a, 0L) + 1; deg(b) = deg.getOrElse(b, 0L) + 1 }
      val low = alive.filter(v => deg.getOrElse(v, 0L) < k)
      low.foreach(v => peel(v) = r)
      alive = alive -- low
      edges = edges.filter { case (a, b) => !low(a) && !low(b) }
    }
    val fdeg = collection.mutable.Map.empty[Long, Long]
    edges.foreach { case (a, b) =>
      fdeg(a) = fdeg.getOrElse(a, 0L) + 1; fdeg(b) = fdeg.getOrElse(b, 0L) + 1 }
    val conv = alive.forall(v => fdeg.getOrElse(v, 0L) >= k)
    val got = Relational.kCore(spark, sf0001, k, minCo, rounds)
      .as[(Long, Int, Long, Boolean)].collect()
    assert(got.length == allNodes.size)
    got.foreach { case (v, pr, cd, cv) =>
      assert(pr == peel.getOrElse(v, 0), s"peel_round for $v")
      assert(cd == (if (peel.contains(v)) 0L else fdeg.getOrElse(v, 0L)),
        s"core_degree for $v")
      assert(cv == conv)
    }
    // survivors genuinely form a k-core: every alive node keeps degree >= k
    if (conv) alive.foreach(v => assert(fdeg.getOrElse(v, 0L) >= k))
  }

  test("kCore edge build: one hot slot with 10^4 members yields ZERO candidate pairs; real cliques survive the prefix filter exactly") {
    val minCo = 3L
    val n = 10000
    // hot slot 0: every user 0..n-1 holds it, PLUS minCo unique rare slots
    // each — eligible (ns = minCo + 1), but no pair shares more than the
    // hot slot (co = 1 < minCo), so the TRUE edge set over them is empty.
    // A naive slot self-join fans the hot slot into n^2/2 ~ 5*10^7 pairs;
    // the prefix filter (rarest ns-minCo+1 = 2 slots per user: their
    // unique ones) must fan it into zero.
    val hot = (0 until n).map(u => (u.toLong, 0))
    val rare = for { u <- 0 until n; j <- 1 to minCo.toInt }
      yield (u.toLong, u * minCo.toInt + j)
    // a genuine 10-clique: shared minCo slots, each of frequency 10 —
    // every pair has co = minCo and MUST survive end-to-end
    val cliqueUsers = (0 until 10).map(u => 100000L + u)
    val cliqueSlots = (1 to minCo.toInt).map(j => 900000 + j)
    val clique = for { u <- cliqueUsers; s <- cliqueSlots } yield (u, s)
    val sl = (hot ++ rare ++ clique).toDF("user_id", "slot_id")
    val cand = Relational.coActivityCandidates(
        Relational.coActivityUserSlots(sl, minCo), minCo)
      .as[(Long, Long)].collect().toSet
    // the quadratic-explosion gate: only the clique's 45 pairs, none of the
    // 49,995,000 hot-slot pairs
    assert(cand == (for { i <- cliqueUsers; j <- cliqueUsers if i < j }
      yield (i, j)).toSet, s"candidates must be exactly the clique pairs, got ${cand.size}")
    val edges = Relational.coActivityEdges(sl, minCo)
      .as[(Long, Long)].collect().toSet
    assert(edges == cand, "every clique pair verifies at co = minCo")
  }

  test("kCore edge build: prefix-filtered edges equal the naive quadratic edge set on real sf0.001 slots") {
    val minCo = 26L
    val slots = graft.Tables.load(spark, sf0001, "events")
      .select(col("user_id"), col("event_type"),
        date_trunc("day", col("event_time")).as("d"))
      .distinct()
    val slotDim = slots.select("event_type", "d").distinct()
      .withColumn("slot_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("event_type", "d")).cast("int"))
    val sl = slots.join(broadcast(slotDim), Seq("event_type", "d"))
      .select("user_id", "slot_id")
    val naive = sl.as("x").join(sl.as("y"),
        col("x.slot_id") === col("y.slot_id") && col("x.user_id") < col("y.user_id"))
      .groupBy(col("x.user_id").as("a"), col("y.user_id").as("b"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val eligible = sl.groupBy("user_id").agg(count(lit(1)).as("ns"))
      .filter(col("ns") >= minCo).select("user_id")
    val got = Relational.coActivityEdges(sl.join(eligible, Seq("user_id")), minCo)
      .as[(Long, Long)].collect().toSet
    assert(got == naive, s"prefix-filtered edge set must equal naive (naive=${naive.size}, got=${got.size})")
  }

  // ---------------- q152 EWMA burst ----------------

  test("ewmaBurst: scaled-integer EWMA matches a driver fold over the gap-filled grid; zeros included") {
    val grid = Relational.gapFillHourly(spark, sf0001)
      .select("event_type", "hour", "ct")
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val expect = grid.toSeq.flatMap { case (et, rows) =>
      var s = -1L
      rows.map { case (_, h, ct) =>
        val prev = s
        s = if (prev < 0) ct * 1048576L else (ct * 1048576L + 3L * prev) / 4L
        (et, h, ct, s.toDouble / 1048576.0,
          prev >= 0L && ct * 1048576L > prev * 2L && ct >= 5L)
      }
    }.toSet
    val got = Relational.ewmaBurst(spark, sf0001)
      .as[(String, String, Long, Double, Boolean)].collect().toSet
    assert(got == expect)
    // the gap-filled zeros matter: a zero hour drags the EWMA down, so a
    // recovery hour after an outage can burst — and at least one row with
    // ct = 0 must exist in the grid for that claim to be exercised
    assert(expect.exists(_._3 == 0L))
  }

  // ---------------- q153 HDR quantile sketch ----------------

  test("hdrQuantiles: every selected bucket contains the exact rank value; width theorem; n exact") {
    val byType = graft.Tables.load(spark, sf0001, "events")
      .select(col("event_type"),
        greatest(floor(col("value") * 100).cast("long"), lit(1L)).as("c"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val rows = Relational.hdrQuantiles(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect()
    assert(rows.map(_._1).toSet == byType.keySet)
    rows.foreach { case (et, n, p50l, p50h, p90l, p90h, p99l, p99h, wok) =>
      val sorted = byType(et)
      assert(n == sorted.length.toLong)
      def exact(q: Long): Long = sorted(((n * q + 99) / 100 - 1).toInt)
      assert(p50l <= exact(50) && exact(50) <= p50h, s"$et p50")
      assert(p90l <= exact(90) && exact(90) <= p90h, s"$et p90")
      assert(p99l <= exact(99) && exact(99) <= p99h, s"$et p99")
      // relative width <= 2^-p by construction
      assert(wok)
      Seq((p50l, p50h), (p90l, p90h), (p99l, p99h)).foreach { case (lo, hi) =>
        assert((hi - lo) * 32 <= lo)
      }
    }
  }

  // ---------------- q154 sketch rollup lattice ----------------

  test("sketchRollup: merged-sketch estimates equal a direct per-node KMV replay; audit flags true") {
    val k = 512
    val el = graft.Tables.load(spark, sf0001, "events")
      .select(col("event_type"),
        date_format(col("event_time"), "yyyy-MM-dd").as("day"),
        col("user_id").cast("string").as("u"))
      .distinct()
      .as[(String, String, String)].collect()
    def h(u: String): Long =
      java.lang.Long.parseLong(md5hex(u).substring(0, 13), 16)
    def node(rows: Iterable[(String, String, String)]): (Long, Int, Long, Double) = {
      val users = rows.map(_._3).toSeq.distinct
      val hs = users.map(h).distinct.sorted
      val retained = math.min(hs.length, k)
      val theta = if (hs.length < k) 4503599627370496L else hs(k - 1)
      val est = if (hs.length < k) retained.toDouble
        else (k - 1).toDouble * 4503599627370496.0 / theta.toDouble
      (users.length.toLong, retained, theta, est)
    }
    val want =
      el.groupBy(r => ("leaf", r._1, r._2)).view.mapValues(a => node(a.toSeq)).toMap ++
      el.groupBy(r => ("type", r._1, "*")).view.mapValues(a => node(a.toSeq)).toMap ++
      el.groupBy(r => ("day", "*", r._2)).view.mapValues(a => node(a.toSeq)).toMap +
      (("all", "*", "*") -> node(el.toIndexedSeq))
    val got = Relational.sketchRollup(spark, sf0001)
      .as[(String, String, String, Long, Int, Long, Double, Boolean)].collect()
    assert(got.length == want.size)
    got.foreach { case (lvl, et, d, exact, retained, theta, est, ok) =>
      val (wExact, wRet, wTheta, wEst) = want((lvl, et, d))
      assert(exact == wExact, s"exact_uv at ($lvl,$et,$d)")
      // the KMV union theorem: Spark's leaf-merge must equal the direct
      // per-slice sketch the driver just built
      assert(retained == wRet && theta == wTheta && est == wEst,
        s"merged sketch != direct sketch at ($lvl,$et,$d)")
      assert(ok, s"audit flag at ($lvl,$et,$d): est=$est exact=$exact")
    }
  }

  // ---------------- q157 Bradley-Terry ----------------

  test("bradleyTerry: win matrix and scaled-integer MM iterations match a driver replay; ranking ordered") {
    val S = 1048576L; val iters = 10
    val act = graft.Tables.load(spark, sf0001, "events")
      .groupBy(col("user_id"), date_trunc("day", col("event_time")).as("d"),
        col("event_type"))
      .agg(count(lit(1)).as("ct"))
      .as[(Long, java.sql.Timestamp, String, Long)].collect()
    val wins = collection.mutable.Map.empty[(String, String), Long]
    act.groupBy(r => (r._1, r._2)).values.foreach { grp =>
      val byTp = grp.map(r => r._3 -> r._4)
      for (a <- byTp; b <- byTp if a._1 < b._1 && a._2 != b._2) {
        val (w, l) = if (a._2 > b._2) (a._1, b._1) else (b._1, a._1)
        wins((w, l)) = wins.getOrElse((w, l), 0L) + 1
      }
    }
    val types = act.map(_._3).distinct.sorted
    val k = types.length
    def n(i: String, j: String) = wins.getOrElse((i, j), 0L) + wins.getOrElse((j, i), 0L)
    val wi = types.map(t => types.filter(_ != t).map(o => wins.getOrElse((t, o), 0L)).sum)
    val mi = types.map(t => types.filter(_ != t).map(o => n(t, o)).sum)
    var p = Array.fill(k)(S)
    for (_ <- 1 to iters) {
      val upd = (0 until k).map { i =>
        val den = (0 until k).filter(j => j != i && n(types(i), types(j)) > 0)
          .map(j => n(types(i), types(j)) * S * S / (p(i) + p(j))).sum
        if (den == 0) p(i) else wi(i) * S * S / den
      }.toArray
      val tot = upd.sum
      p = upd.map(x => x * k * S / tot)
    }
    val got = Relational.bradleyTerry(spark, sf0001)
      .as[(String, Long, Long, Long, Double, Int)].collect().sortBy(_._6)
    assert(got.map(_._1).toSet == types.toSet)
    got.foreach { case (tp, w, m, scaled, strength, _) =>
      val i = types.indexOf(tp)
      assert(w == wi(i), s"wins($tp)")
      assert(m == mi(i), s"matches($tp)")
      assert(scaled == p(i), s"MM fold mismatch at $tp")
      assert(strength == scaled.toDouble / S)
    }
    // rank is (strength desc, type asc) and the fixture has a real ordering
    assert(got.map(_._6).toSeq == (1 to k))
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 > b._4 || (a._4 == b._4 && a._1 < b._1)); case _ => }
    assert(got.head._4 != got.last._4, "fixture must produce a non-flat ranking")
  }

  // ---------------- q159 hierarchy flattening ----------------

  test("hierarchyFlatten: pointer doubling equals a sequential parent-chain walk; converged") {
    val keys = graft.Tables.load(spark, sf0001, "part")
      .select(col("p_partkey").as[Long]).collect()
    def walk(k: Long): (Long, Long) = {
      var cur = k; var d = 0L
      while (cur > 9) { cur /= 10; d += 1 }
      (cur, d)
    }
    val got = Relational.hierarchyFlatten(spark, sf0001)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(got.length == keys.length)
    got.foreach { case (k, root, depth, conv) =>
      val (wr, wd) = walk(k)
      assert(root == wr && depth == wd, s"node $k")
      assert(conv)
      assert(root <= 9, "every root is a true root")
    }
    // the doubling path is only exercised if some chain needs >1 jump
    // (sf0.001 has 200 parts -> max depth 2; depth-3/4 chains are covered
    // by the oracle at sf0.01/sf0.1)
    assert(got.exists(_._3 >= 2), "fixture must contain depth >= 2 chains")
  }

  // ---------------- q160 RFM ----------------

  test("rfmSegments: HDR-boundary quintile scores match a driver replay; tiers roughly balanced") {
    val p = 5
    def lo(v: Long): Long = {
      val s = math.max(0, (63 - java.lang.Long.numberOfLeadingZeros(v)) - p)
      (v >> s) << s
    }
    val o = graft.Tables.load(spark, sf0001, "orders")
      .select(col("o_custkey").as[Long],
        to_date(col("o_orderdate")).cast("string").as[String],
        floor(col("o_totalprice") * 100).cast("long").as[Long])
      .collect()
    val hd = o.map(_._2).max
    def days(a: String, b: String) = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(a), java.time.LocalDate.parse(b))
    val cust = o.groupBy(_._1).map { case (ck, rows) =>
      (ck, days(rows.map(_._2).max, hd) + 1, rows.length.toLong, rows.map(_._3).sum)
    }.toSeq
    def boundsOf(vs: Seq[Long]): Seq[Long] = {
      val cells = vs.map(lo).groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val n = vs.length.toLong
      (1 to 4).map { i =>
        val rank = (i * n + 4) / 5
        var cum = 0L
        cells.find { case (_, ct) => cum += ct; cum >= rank }.get._1
      }
    }
    def score(v: Long, bs: Seq[Long]) = 1 + bs.count(b => lo(v) > b)
    val (rb, fb, mb) =
      (boundsOf(cust.map(_._2)), boundsOf(cust.map(_._3)), boundsOf(cust.map(_._4)))
    val want = cust.map { case (ck, r, f, m) =>
      val (rs, fs, ms) = (6 - score(r, rb), score(f, fb), score(m, mb))
      ck -> ((r, f, m, rs, fs, ms, rs * 100 + fs * 10 + ms))
    }.toMap
    val got = Relational.rfmSegments(spark, sf0001)
      .as[(Long, Long, Long, Long, Int, Int, Int, Int)].collect()
    assert(got.length == want.size)
    got.foreach { case (ck, r, f, m, rs, fs, ms, rfm) =>
      assert((r, f, m, rs, fs, ms, rfm) == want(ck), s"customer $ck")
    }
    // every score level in 1..5 and tiers carry real mass (uniform-ish data)
    assert(got.forall(g => g._5 >= 1 && g._5 <= 5 && g._6 >= 1 && g._6 <= 5
      && g._7 >= 1 && g._7 <= 5))
    val mDist = got.groupBy(_._7).view.mapValues(_.size).toMap
    assert(mDist.size >= 4, s"monetary tiers collapsed: $mDist")
  }

  // ---------------- q161 journey paths ----------------

  test("journeyPaths: per-(user, day) ordered capped paths match a driver replay") {
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select(col("user_id").as[Long],
        date_trunc("day", col("event_time")).cast("string").as[String],
        unix_micros(col("event_time")).as[Long], col("event_id").as[Long],
        col("event_type").as[String])
      .collect()
    // .toSeq BEFORE .map: mapping a Map to (u, path) pairs would re-key by
    // u and silently collapse a user's journeys
    val journeys = ev.groupBy(r => (r._1, r._2)).toSeq.map { case ((u, _), rows) =>
      (u, rows.sortBy(r => (r._3, r._4)).map(_._5).take(8).mkString(">"))
    }
    val want = journeys.groupBy(_._2).map { case (path, js) =>
      path -> ((js.size.toLong, js.map(_._1).distinct.size.toLong))
    }
    val ranked = want.toSeq.sortBy { case (p, (j, _)) => (-j, p) }.take(50)
      .zipWithIndex.map { case ((p, (j, u)), i) => (p, j, u, i + 1) }.toSet
    val got = Relational.journeyPaths(spark, sf0001)
      .as[(String, Long, Long, Int)].collect().toSet
    assert(got == ranked)
    assert(got.nonEmpty && got.exists(_._1.contains(">")), "multi-step paths present")
  }

  // ---------------- q166 Holt linear trend ----------------

  test("holtTrend: scaled-integer level/trend/forecast match a driver fold; drops flag too") {
    // sf0.01, not sf0.001: the grid is the same time-bounded 3600 rows, and
    // only the denser corpus has forecast levels high enough for DROP-side
    // anomalies (sf0.001 measured 0 drops / 10 spikes; sf0.01 285 / 363)
    val grid = Relational.gapFillHourly(spark, sf001)
      .select(col("event_type").as[String], col("hour").as[String],
        col("ct").as[Long])
      .collect()
    val want = grid.groupBy(_._1).toSeq.flatMap { case (tp, rows) =>
      var (n, l, b) = (0L, 0L, 0L)
      rows.sortBy(_._2).map { case (_, hour, ct) =>
        val x = ct * 1048576L
        val (n0, fc) = (n, l + b)
        if (n == 0L) { l = x; b = 0L; n = 1L }
        else {
          // Java/Scala `/` truncates toward zero — the pinned convention
          // (NOT >>, which floors and diverges on negative trend)
          val l1 = (x + 3L * fc) / 4L
          b = (l1 - l + 3L * b) / 4L
          l = l1; n += 1L
        }
        val fcast = if (n0 > 0L) Some(fc.toDouble / 1048576.0) else None
        val anomaly = n0 > 0L && 2L * math.abs(x - fc) > math.max(fc, 5242880L)
        (tp, hour, ct, l.toDouble / 1048576.0, b.toDouble / 1048576.0,
          fcast, anomaly)
      }
    }.toSet
    val got = Relational.holtTrend(spark, sf001)
      .as[(String, String, Long, Double, Double, Option[Double], Boolean)]
      .collect().toSet
    assert(got == want)
    // two-sided: at least one flagged hour UNDERSHOT its forecast (the
    // capability q152's burst-only chart cannot express)
    val scaled = got.map(r => (r._3 * 1048576L, r._6, r._7))
    assert(scaled.exists { case (x, fc, a) => a && fc.exists(_ * 1048576.0 > x) },
      "no drop-side anomaly on this corpus — fixture lost the property")
    assert(scaled.exists { case (x, fc, a) => a && fc.exists(_ * 1048576.0 < x) },
      "no spike-side anomaly on this corpus")
    // declines produce genuinely negative trend (the trunc-div wrinkle)
    assert(got.exists(_._5 < 0.0), "no negative trend — shift/floor path unexercised")
  }

  // ---------------- q163 sequential patterns ----------------

  test("seqPatterns: gap-allowed subsequence support matches a driver replay") {
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select(col("user_id").as[Long],
        date_trunc("day", col("event_time")).cast("string").as[String],
        unix_micros(col("event_time")).as[Long], col("event_id").as[Long],
        col("event_type").as[String])
      .collect()
    val journeys = ev.groupBy(r => (r._1, r._2)).toSeq.map { case ((u, _), rows) =>
      (u, rows.sortBy(r => (r._3, r._4)).map(_._5).take(8).toSeq)
    }
    // explicit index-increasing selections: Scala's `combinations` is
    // MULTISET combinations (canonical element order) and misses real
    // subsequences like view>click>click from (click,view,click,click)
    val present = journeys.flatMap { case (u, path) =>
      val n = path.length
      val s2 = for (i <- 0 until n; j <- i + 1 until n)
        yield s"${path(i)}>${path(j)}"
      val s3 = for (i <- 0 until n; j <- i + 1 until n; k <- j + 1 until n)
        yield s"${path(i)}>${path(j)}>${path(k)}"
      (s2 ++ s3).distinct.map(p => (u, p))
    }
    val want = present.groupBy(_._2).collect {
      case (pat, hits) if hits.size >= 10 =>
        pat -> ((hits.size.toLong, hits.map(_._1).distinct.size.toLong))
    }
    val got = Relational.seqPatterns(spark, sf0001)
      .as[(String, Long, Long)].collect()
    assert(got.map(_._1).toSet == want.keySet)
    got.foreach { case (pat, j, u) => assert((j, u) == want(pat), s"pattern $pat") }
    // real mining happened: both lengths present, support ordering nontrivial
    assert(got.exists(_._1.count(_ == '>') == 1) && got.exists(_._1.count(_ == '>') == 2))
    // gap-allowed: some frequent pattern is NOT a contiguous substring of
    // every journey that supports it — i.e. presence came through a gap
    val paths = journeys.map(_._2.mkString(">"))
    assert(got.exists { case (pat, j, _) =>
      paths.count(_.contains(pat)) < j
    }, "no pattern ever needed the gap — fixture too easy")
  }

  // ---------------- q162 rank movers ----------------

  test("rankMovers: week-over-week ranks and deltas match a driver replay; a real mover exists") {
    val anchor = java.time.LocalDate.of(1970, 1, 5)
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select(get_json_object(col("props"), "$.k").cast("int").as[Int],
        date_trunc("day", col("event_time")).cast("date").as[java.sql.Date])
      .collect()
      .map(r => (r._1,
        java.time.temporal.ChronoUnit.DAYS.between(anchor, r._2.toLocalDate) / 7))
    val w1 = ev.map(_._2).max
    val items = ev.filter(_._2 >= w1 - 1).map(_._1).distinct
    val cur = ev.filter(_._2 == w1).groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val prev = ev.filter(_._2 == w1 - 1).groupBy(_._1).view.mapValues(_.length.toLong).toMap
    def ranks(m: Map[Int, Long]) = items.map(i => (i, m.getOrElse(i, 0L)))
      .sortBy { case (i, c) => (-c, i) }.zipWithIndex
      .map { case ((i, _), r) => i -> (r + 1) }.toMap
    val (cr, pr) = (ranks(cur), ranks(prev))
    val got = Relational.rankMovers(spark, sf0001)
      .as[(Int, Long, Long, Int, Int, Int)].collect()
    assert(got.map(_._1).toSet == items.toSet)
    got.foreach { case (i, pc, cc, prk, crk, d) =>
      assert(pc == prev.getOrElse(i, 0L) && cc == cur.getOrElse(i, 0L), s"item $i counts")
      assert(prk == pr(i) && crk == cr(i) && d == pr(i) - cr(i), s"item $i ranks")
    }
    assert(got.exists(_._6 != 0), "fixture must contain a real rank move")
  }

  // ---------------- q158 trending ----------------

  test("trendingScores: anchored dyadic decay matches a driver replay; raw scores shard-additive") {
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select(get_json_object(col("props"), "$.k").cast("int").as[Int],
        date_trunc("day", col("event_time")).cast("date").as[java.sql.Date],
        col("event_id").as[Long])
      .collect()
    val anchor = java.time.LocalDate.of(1970, 1, 5) // Monday epoch
    def wAbs(d: java.sql.Date) =
      java.time.temporal.ChronoUnit.DAYS.between(anchor, d.toLocalDate) / 7
    val w0 = ev.map(r => wAbs(r._2)).min
    val maxw = ev.map(r => wAbs(r._2)).max - w0
    def w(d: java.sql.Date) = wAbs(d) - w0
    val want = ev.groupBy(_._1).map { case (item, rows) =>
      item -> ((rows.length.toLong, rows.map(r => 1L << w(r._2)).sum))
    }
    val got = Relational.trendingScores(spark, sf0001)
      .as[(Int, Long, Long, Double, Boolean, Int)].collect()
    assert(got.map(_._1).toSet == want.keySet)
    got.foreach { case (item, ct, raw, score, ok, _) =>
      assert((ct, raw) == want(item), s"item $item")
      assert(score == raw.toDouble / (1L << maxw).toDouble)
      assert(ok)
    }
    // recency matters: ranking must differ from plain-popularity ranking
    val byRaw = got.sortBy(r => (-r._3, r._1)).map(_._1).toSeq
    val byCt = got.sortBy(r => (-r._2, r._1)).map(_._1).toSeq
    assert(byRaw != byCt, "decayed ranking must differ from total-count ranking on this corpus")
    // additivity (the streaming-maintenance property): shard sums equal the full raw
    val shards = (0 to 2).map(i => ev.filter(_._3 % 3 == i))
    val merged = shards.flatMap(_.groupBy(_._1).map { case (item, rows) =>
      item -> rows.map(r => 1L << w(r._2)).sum
    }).groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(merged == want.view.mapValues(_._2).toMap)
  }

  // ---------------- q155 multi-touch attribution ----------------

  test("touchAttribution: first/last/linear credits match a driver replay; credit is conserved") {
    val ev = graft.Tables.load(spark, sf0001, "events")
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id").as[Long], col("event_type").as[String],
        unix_micros(col("event_time")).as[Long], col("event_id").as[Long])
      .collect()
    val byUser = ev.groupBy(_._1)
    val first = collection.mutable.Map.empty[String, Long]
    val last = collection.mutable.Map.empty[String, Long]
    val linear = collection.mutable.Map.empty[String, Long]
    var purchases = 0L
    byUser.values.foreach { rows =>
      val touches = rows.filter(r => r._2 != "purchase")
      rows.filter(_._2 == "purchase").foreach { case (_, _, pts, _) =>
        purchases += 1
        val wt = touches.filter(t => t._3 >= pts - 86400000000L && t._3 < pts)
          .sortBy(t => (t._3, t._4))
        if (wt.isEmpty) {
          first("(direct)") = first.getOrElse("(direct)", 0L) + 1
          last("(direct)") = last.getOrElse("(direct)", 0L) + 1
          linear("(direct)") = linear.getOrElse("(direct)", 0L) + 1000000L
        } else {
          val n = wt.length
          first(wt.head._2) = first.getOrElse(wt.head._2, 0L) + 1
          last(wt.last._2) = last.getOrElse(wt.last._2, 0L) + 1
          wt.foreach(t => linear(t._2) = linear.getOrElse(t._2, 0L) + 1000000L / n)
          linear(wt.last._2) = linear(wt.last._2) + (1000000L - n * (1000000L / n))
        }
      }
    }
    val got = Relational.touchAttribution(spark, sf0001)
      .as[(String, Long, Long, Long)].collect()
    val types = (first.keySet ++ last.keySet ++ linear.keySet)
    assert(got.map(_._1).toSet == types)
    got.foreach { case (tp, fc, lc, lm) =>
      assert(fc == first.getOrElse(tp, 0L), s"first_ct($tp)")
      assert(lc == last.getOrElse(tp, 0L), s"last_ct($tp)")
      assert(lm == linear.getOrElse(tp, 0L), s"linear_micro($tp)")
    }
    // conservation: every conversion distributes exactly 10^6 micro-units
    assert(got.map(_._4).sum == purchases * 1000000L)
    assert(got.map(_._2).sum == purchases && got.map(_._3).sum == purchases)
  }

  // ---------------- q156 point-in-time join ----------------

  test("pitJoin: every purchase resolves to the version valid at its own timestamp") {
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select(col("user_id").as[Long], col("event_type").as[String],
        unix_micros(col("event_time")).as[Long], col("event_id").as[Long])
      .collect()
    // driver SCD2: collapse consecutive duplicate states per user
    val hist = ev.filter(_._2 != "purchase").groupBy(_._1).view.mapValues { rows =>
      val sorted = rows.sortBy(r => (r._3, r._4))
      val changes = sorted.foldLeft(Vector.empty[(String, Long)]) { (acc, r) =>
        if (acc.nonEmpty && acc.last._1 == r._2) acc else acc :+ (r._2 -> r._3)
      }
      changes.zipWithIndex.map { case ((st, vf), i) =>
        (st, vf, if (i + 1 < changes.length) Some(changes(i + 1)._2) else None, i + 1)
      }
    }.toMap
    val got = Relational.pitJoin(spark, sf0001)
      .as[(Long, Long, String, String, Int)].collect()
    val purchases = ev.filter(_._2 == "purchase")
    assert(got.length == purchases.length, "left join keeps every purchase exactly once")
    val byEid = purchases.map(p => p._4 -> p).toMap
    got.foreach { case (eid, user, _, state, version) =>
      val p = byEid(eid)
      val want = hist.getOrElse(user, Vector.empty)
        .find(v => v._2 <= p._3 && v._3.forall(p._3 < _))
      assert(state == want.map(_._1).getOrElse("unknown"), s"state at eid $eid")
      assert(version == want.map(_._4).getOrElse(0), s"version at eid $eid")
    }
    // the leakage contrast: joining to the CURRENT dim row instead would
    // change at least one purchase's state on this corpus
    val current = hist.view.mapValues(_.last._1).toMap
    assert(got.exists { case (eid, user, _, state, _) =>
      current.get(user).exists(_ != state)
    }, "PIT must differ from a current-row join somewhere, or the spec is vacuous")
  }

  test("hdrCells: additive under any split — shard cells sum to the full-corpus cells") {
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select("event_type", "value", "event_id")
    val full = Relational.hdrCells(ev)
      .as[(String, Long, Long)].collect().toSet
    val merged = (0 to 2)
      .map(i => Relational.hdrCells(ev.filter(col("event_id") % 3 === i))
        .as[(String, Long, Long)].collect())
      .flatten
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum)
      .map { case ((et, lo), ct) => (et, lo, ct) }.toSet
    assert(merged == full)
  }

  // ---------------- q176 CUPED ----------------

  test("cupedTtest: theta, adjusted means and both t statistics match a driver replay; variance shrinks") {
    val ev = graft.Tables.load(spark, sf0001, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as[Long], unix_micros(col("event_time")).as[Long],
        floor(col("value") * 100).cast("long").as[Long]).collect()
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val users = ev.groupBy(_._1).map { case (u, rows) =>
      (u, rows.filter(_._2 < mid).map(_._3).sum, rows.filter(_._2 >= mid).map(_._3).sum)
    }.toArray
    val byArm = users.groupBy(r => if (u52(s"exp1_${r._1}") % 2 == 0) "A" else "B")
    def mom(rs: Array[(Long, Long, Long)]) = {
      val n = rs.length.toLong
      (n, rs.map(_._2).sum, rs.map(_._3).sum,
        rs.map(r => BigInt(r._2) * r._2).sum, rs.map(r => BigInt(r._2) * r._3).sum,
        rs.map(r => BigInt(r._3) * r._3).sum)
    }
    val (na, sxa, sya, sxxa, sxya, syya) = mom(byArm("A"))
    val (nb, sxb, syb, sxxb, sxyb, syyb) = mom(byArm("B"))
    val n = na.toDouble + nb.toDouble
    val sx = sxa.toDouble + sxb.toDouble; val sy = sya.toDouble + syb.toDouble
    val sxx = sxxa.toDouble + sxxb.toDouble; val sxy = sxya.toDouble + sxyb.toDouble
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    def mz(syA: Long, sxA: Long, nA: Long) = (syA.toDouble - theta * sxA.toDouble) / nA.toDouble
    def vz(syy: BigInt, sxy: BigInt, sxx: BigInt, nA: Long, m: Double) =
      (syy.toDouble - 2.0 * theta * sxy.toDouble + theta * theta * sxx.toDouble
        - nA.toDouble * m * m) / (nA.toDouble - 1)
    def vy(syy: BigInt, syA: Long, nA: Long) =
      (syy.toDouble - syA.toDouble * syA.toDouble / nA.toDouble) / (nA.toDouble - 1)
    val (mza, mzb) = (mz(sya, sxa, na), mz(syb, sxb, nb))
    val tAdj = (mza - mzb) / math.sqrt(
      vz(syya, sxya, sxxa, na, mza) / na + vz(syyb, sxyb, sxxb, nb, mzb) / nb)
    val tRaw = (sya.toDouble / na - syb.toDouble / nb) / math.sqrt(
      vy(syya, sya, na) / na + vy(syyb, syb, nb) / nb)
    val row = Relational.cupedTtest(spark, sf0001).collect().head
    assert(row.getAs[Long]("n_a") == na && row.getAs[Long]("n_b") == nb)
    assert(row.getAs[Double]("theta") == theta)
    assert(row.getAs[Double]("t_adj") == tAdj, "adjusted t must replay bit-for-bit")
    assert(row.getAs[Double]("t_raw") == tRaw)
    // CUPED's point: the covariate carries signal, so variance must shrink
    val vr = row.getAs[Double]("var_reduction")
    assert(vr > 0.0 && vr < 1.0, s"variance reduction out of range: $vr")
    assert(theta > 0.0, "pre-period spend must correlate positively with post-period spend")
  }

  // ---------------- q177 rank-1 ALS ----------------

  test("alsRank1: fixed-point ALS trajectory matches a BigInt driver replay; the fit beats the zero predictor") {
    val ratings = graft.Tables.load(spark, sf0001, "lineitem")
      .join(graft.Tables.load(spark, sf0001, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.load(spark, sf0001, "part"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("o_custkey"), col("p_brand"))
      .agg(sum(col("l_quantity")).cast("long").as("r"))
      .select(col("o_custkey").as[Long], col("p_brand").as[String], col("r").as[Long])
      .collect()
    val two40 = BigInt(1099511627776L)
    var v = ratings.map(_._2).distinct.map(_ -> BigInt(1048576L)).toMap
    var u = Map.empty[Long, BigInt]
    for (_ <- 1 to 2) {
      u = ratings.groupBy(_._1).map { case (c, rs) =>
        c -> (two40 * rs.map(r => BigInt(r._3) * v(r._2)).sum) /
          rs.map(r => v(r._2) * v(r._2)).sum
      }
      v = ratings.groupBy(_._2).map { case (i, rs) =>
        i -> (two40 * rs.map(r => BigInt(r._3) * u(r._1)).sum) /
          rs.map(r => u(r._1) * u(r._1)).sum
      }
    }
    val sse = ratings.map { r =>
      val err = BigInt(r._3) * 1048576 - (u(r._1) * v(r._2)) / 1048576
      err * err
    }.sum
    val mseQ = (sse / (BigInt(ratings.length) * two40)).toLong
    val got = Relational.alsRank1(spark, sf0001).collect()
      .map(r => r.getAs[String]("item") ->
        (r.getAs[Long]("v_q"), r.getAs[Long]("n_raters"), r.getAs[Long]("mse_q"))).toMap
    assert(got.keySet == v.keySet)
    val nr = ratings.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    for ((i, vq) <- v)
      assert(got(i) == ((vq.toLong, nr(i), mseQ)), s"item $i diverges from replay")
    // the factorization must explain variance: MSE below the zero predictor
    val zeroMse = ratings.map(r => BigInt(r._3) * r._3).sum / ratings.length
    assert(mseQ < zeroMse.toLong,
      s"rank-1 fit ($mseQ) no better than predicting 0 ($zeroMse)")
  }
}
