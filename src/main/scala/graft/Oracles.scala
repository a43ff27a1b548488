package graft

/** DuckDB-dialect oracle SQL for every oracle-checkable query in
  * [[SparkEntry.queries]]. The driver runs these over the same parquet tables
  * and hash-compares with the Spark result (columns sorted by name).
  *
  * Determinism rules shared with the Spark side:
  *  - money/value sums are computed in DECIMAL(18,2) and cast to DOUBLE at the
  *    edge (double sums would be order-dependent);
  *  - `events.ts` is micro-second precision in both engines (DuckDB truncates
  *    ns→µs on read; Spark side truncates identically in Tables.events);
  *  - every aggregate output column is aliased identically on both sides;
  *  - count-like columns are BIGINT on both sides (DuckDB hugeint sums are
  *    cast down; Spark row_number int is cast up in the oracle).
  */
object Oracles {

  /** One BPE training round (q96): pair counts over the previous
    * segmentation `s(n-1)`, deterministic argmax, greedy non-overlapping
    * re-segmentation via run-parity windows → `s(n)`. Generated per round
    * because DuckDB macros cannot be defined inside a single query. */
  private def bpeRound(n: Int): String = {
    val p = n - 1
    s"""p$n AS (SELECT u.a AS a, u.b AS b, cast(sum(ct) as bigint) AS pc
       |  FROM (SELECT unnest([{'a': syms[i], 'b': syms[i+1]}
       |      FOR i IN generate_series(1, greatest(len(syms) - 1, 0))]) AS u, ct FROM s$p) q
       |  GROUP BY 1, 2),
       |top$n AS (SELECT a, b, pc FROM p$n ORDER BY pc DESC, a, b LIMIT 1),
       |""".stripMargin + segRound(n)
  }

  /** One WordPiece training round (q98): same pair counts and greedy
    * re-segmentation as [[bpeRound]], but the argmax takes the LIKELIHOOD
    * score pc/(ct(a)·ct(b)) — replayed in exact fixed point as
    * pc·10¹⁵ // (ca·cb) over HUGEINTs, matching the Spark side's
    * DECIMAL(38,0) DIV bit-for-bit (both floor a positive quotient that
    * fits a long). */
  /** Shared WITH-clause body (`e1` .. `edges`) replaying
    * [[graft.operators.Similarity.knnEdges]]: int8 grid quantization, md5
    * ±1 hyperplanes (4 planes), bucket-SALTED hamming≤1 candidates
    * (per-bucket nsalt = ceil(m / bucketCap); member salt and per-node
    * probe salt are md5 mod nsalt — identity when every bucket fits, which
    * is the driver-data regime), k smallest by the unique composite
    * d2·cap + vb, symmetrized. Factored so q168, q175 and the KnnSaltSpec
    * cross-engine gate (which exercises nsalt > 1 on a hot-blob fixture)
    * all run literally the same SQL. */
  private[graft] def knnEdgeCtes(cap: Int, k: Int,
      bucketCap: Int = graft.operators.Similarity.KnnBucketCap): String =
    s"""e1 AS (SELECT vec_id, embedding,
       |   127.0 / greatest(list_max(list_transform(embedding, x -> abs(cast(x as double)))), 1e-9) AS scale
       | FROM embeddings WHERE vec_id < $cap),
       |e2 AS MATERIALIZED (SELECT vec_id,
       |   list_transform(embedding, x -> cast(round(cast(x as double) * scale) as int)) AS qv
       | FROM e1),
       |sq AS (SELECT vec_id, qv, cast(list_inner_product(qv, qv) as bigint) AS s FROM e2),
       |pl AS (SELECT p, d,
       |   CASE WHEN ('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR), 1, 2))::INT & 1 = 1
       |        THEN 1 ELSE -1 END AS s
       |  FROM generate_series(0, 3) t1(p), generate_series(0, 63) t2(d)),
       |sg AS (SELECT e.vec_id, pl.p,
       |   sum(cast(floor(e.embedding[pl.d + 1]::DOUBLE * 1048576) as bigint) * pl.s) AS dot
       |  FROM e1 e, pl GROUP BY 1, 2),
       |bk AS MATERIALIZED (SELECT vec_id,
       |   cast(sum(CASE WHEN dot >= 0 THEN 1 << p ELSE 0 END) as int) AS bucket
       |  FROM sg GROUP BY 1),
       |occ AS (SELECT bucket,
       |   cast(ceil(cast(count(*) as double) / $bucketCap) as bigint) AS nsalt
       |  FROM bk GROUP BY 1),
       |bs AS MATERIALIZED (SELECT bk.vec_id, bk.bucket, occ.nsalt,
       |   ('0x' || substr(md5('salt_' || bk.vec_id::VARCHAR || '_' || bk.bucket::VARCHAR), 1, 8))::BIGINT % occ.nsalt AS salt
       |  FROM bk JOIN occ USING (bucket)),
       |p AS (SELECT a.vec_id AS va, b.vec_id AS vb,
       |   (a.s + b.s - 2 * cast(list_inner_product(a.qv, b.qv) as bigint)) * $cap
       |     + b.vec_id AS comp
       | FROM sq a JOIN bk ba ON ba.vec_id = a.vec_id
       |      JOIN bs bb ON bit_count(xor(ba.bucket, bb.bucket)) <= 1
       |       AND ('0x' || substr(md5('probe_' || a.vec_id::VARCHAR || '_' || bb.bucket::VARCHAR), 1, 8))::BIGINT % bb.nsalt = bb.salt
       |      JOIN sq b ON b.vec_id = bb.vec_id
       | WHERE a.vec_id <> b.vec_id),
       |knn AS (SELECT va, vb FROM (SELECT va, vb,
       |    row_number() OVER (PARTITION BY va ORDER BY comp) AS rn FROM p)
       |  WHERE rn <= $k),
       |edges AS MATERIALIZED (SELECT va AS a, vb AS b FROM knn
       |  UNION SELECT vb, va FROM knn)""".stripMargin

  private def wpRound(n: Int): String = {
    val p = n - 1
    s"""cs$n AS (SELECT s AS sym, cast(sum(ct) as bigint) AS c
       |  FROM (SELECT unnest(syms) AS s, ct FROM s$p) q GROUP BY 1),
       |p$n AS (SELECT u.a AS a, u.b AS b, cast(sum(ct) as bigint) AS pc
       |  FROM (SELECT unnest([{'a': syms[i], 'b': syms[i+1]}
       |      FOR i IN generate_series(1, greatest(len(syms) - 1, 0))]) AS u, ct FROM s$p) q
       |  GROUP BY 1, 2),
       |top$n AS (SELECT a, b, pc, score_q FROM (
       |    SELECT p$n.a AS a, p$n.b AS b, pc,
       |      cast((pc::HUGEINT * 1000000000000000) // (ca.c::HUGEINT * cb.c) as bigint) AS score_q
       |    FROM p$n JOIN cs$n ca ON ca.sym = p$n.a JOIN cs$n cb ON cb.sym = p$n.b) q
       |  ORDER BY score_q DESC, a, b LIMIT 1),
       |""".stripMargin + segRound(n)
  }

  /** The greedy left-to-right re-segmentation of round `n` (shared by
    * [[bpeRound]]/[[wpRound]]): given top$n's (a, b), merge non-overlapping
    * occurrences via run-parity windows — within each maximal run of
    * consecutive matches, merges start at even offsets, which equals the
    * Spark side's aggregate-HOF fold. */
  private def segRound(n: Int): String = {
    val p = n - 1
    s"""pos$n AS (SELECT word, ct, unnest(generate_series(1, len(syms))) AS i, syms FROM s$p),
       |pm$n AS (SELECT word, ct, i, syms[i] AS s,
       |    coalesce(syms[i] = a AND syms[i + 1] = b, FALSE) AS m
       |  FROM pos$n, top$n),
       |run$n AS (SELECT *, CASE WHEN m THEN i - row_number()
       |    OVER (PARTITION BY word, m ORDER BY i) END AS grp FROM pm$n),
       |st$n AS (SELECT *, m AND ((i - min(i) OVER (PARTITION BY word, grp)) % 2 = 0) AS ms
       |  FROM run$n),
       |nx$n AS (SELECT *, lead(s) OVER (PARTITION BY word ORDER BY i) AS ns,
       |    coalesce(lag(ms) OVER (PARTITION BY word ORDER BY i), FALSE) AS consumed FROM st$n),
       |s$n AS (SELECT word, ct,
       |    list(CASE WHEN ms THEN s || ns ELSE s END ORDER BY i)
       |      FILTER (WHERE NOT consumed) AS syms
       |  FROM nx$n GROUP BY word, ct)""".stripMargin
  }

  /** The [[graft.functions.TextFns.winnow]] k-gram hash as a DuckDB
    * expression: an 8-term polynomial `Σ ord(char_{i+j})·B^(7-j) mod M` over a
    * 0-based gram start `i` — constants derived from the SAME
    * WinnowBase/WinnowMod the Scala kernel uses, so they cannot drift. Every
    * intermediate stays below 2⁶³ (max ord on this ASCII corpus × max power ×
    * 8 terms ≈ 2⁴⁰). */
  private val winnowGramExpr: String = {
    val M = graft.functions.TextFns.WinnowMod
    val B = graft.functions.TextFns.WinnowBase
    val powers = (0 until 8).map { j =>
      var x = 1L; (0 until (7 - j)).foreach(_ => x = x * B % M); x
    }
    (0 until 8).map(j => s"ord(substr(text,i+${j + 1},1))::BIGINT*${powers(j)}").mkString(" + ")
  }

  /** Shared winnowing CTE chain (k=8, w=16, ≡ TextFns.winnow): gram hashes per
    * position, min per full sliding window (short docs: one min over all
    * grams), DISTINCT per doc → the fingerprint set `fp(doc_id, m)`. */
  private def winnowFpCte(docFilter: String): String =
    s"""d AS (SELECT doc_id, text, length(text) AS L FROM documents $docFilter),
       |g0 AS (SELECT doc_id, text, L - 7 AS ng, unnest(generate_series(0, L - 8)) AS i FROM d),
       |g AS (SELECT doc_id, ng, i, ($winnowGramExpr) % ${graft.functions.TextFns.WinnowMod} AS h FROM g0),
       |wm AS (SELECT doc_id, i, ng, min(h) OVER (PARTITION BY doc_id ORDER BY i
       |        ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS m FROM g),
       |fp AS (SELECT DISTINCT doc_id, m FROM wm WHERE ng > 16 AND i <= ng - 16
       |       UNION SELECT doc_id, min(h) AS m FROM g WHERE ng <= 16 GROUP BY doc_id)""".stripMargin

  /** The integer-exact coarse-quantizer CTE chain shared by q33/q79: the
    * quantizer (Similarity.trainCentroids) trains on floor(x·2²⁰) points with
    * truncated-integer-mean centroids, so every Lloyd iteration is exact
    * integer arithmetic — replayable as UNROLLED iteration CTEs (a_i = argmin
    * assignment, c_i = per-cell truncated means, empty cells keep their
    * previous centroid). DuckDB `//` truncates like Java Long division.
    * Ends at `rank_all(vec_id, cell, rn)` — per-vector centroid ranking over
    * the FULL corpus (rn = 1 is the assignment, rn ≤ nprobe the probe set). */
  private def ivfRankCtes(k: Int, iters: Int): String = {
    val iterCtes = (1 to iters).flatMap { it =>
      Seq(
        s"""a$it AS MATERIALIZED (SELECT vec_id, cell FROM (
           |  SELECT p.vec_id, c.cell,
           |    row_number() OVER (PARTITION BY p.vec_id
           |      ORDER BY sum((p.x - c.v)*(p.x - c.v)), c.cell) AS rn
           |  FROM pts p JOIN c${it - 1} c USING (d) GROUP BY p.vec_id, c.cell) WHERE rn = 1)""",
        s"""c$it AS MATERIALIZED (SELECT pc.cell, pc.d,
           |  CASE WHEN s.n IS NULL THEN pc.v ELSE s.s // s.n END AS v
           | FROM c${it - 1} pc LEFT JOIN (
           |   SELECT a.cell, p.d, sum(p.x) AS s, count(*) AS n
           |   FROM a$it a JOIN pts p USING (vec_id) GROUP BY 1, 2) s
           |  ON s.cell = pc.cell AND s.d = pc.d)""")
    }.mkString(",\n")
    s"""samp AS (SELECT vec_id, embedding,
       |    row_number() OVER (ORDER BY vec_id) - 1 AS idx, count(*) OVER () AS ns
       |  FROM embeddings WHERE vec_id < 1024),
       |p0 AS (SELECT vec_id, idx, ns, embedding, unnest(generate_series(1, len(embedding))) AS d FROM samp),
       |pts AS MATERIALIZED (SELECT vec_id, idx, ns, d, cast(floor(embedding[d]::DOUBLE * 1048576) as bigint) AS x FROM p0),
       |cells AS (SELECT unnest(generate_series(0, ${k - 1})) AS cell),
       |c0 AS (SELECT i.cell, p.d, p.x AS v FROM cells i JOIN pts p ON p.idx = (i.cell * p.ns) // $k),
       |$iterCtes,
       |e0 AS (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS d FROM embeddings),
       |ept AS MATERIALIZED (SELECT vec_id, d, cast(floor(embedding[d]::DOUBLE * 1048576) as bigint) AS x FROM e0),
       |rank_all AS MATERIALIZED (SELECT p.vec_id, c.cell,
       |    row_number() OVER (PARTITION BY p.vec_id
       |      ORDER BY sum((p.x - c.v)*(p.x - c.v)), c.cell) AS rn
       |  FROM ept p JOIN c$iters c USING (d) GROUP BY p.vec_id, c.cell)""".stripMargin
  }

  /** q199 (kcenterCoreset): greedy farthest-point traversal unrolled — s0
    * seeds at the minimum vec_id; each round i ≥ 1 carries the running
    * min-dist² frame m_i (m_1 = dist to the seed, m_{i+1} = least of m_i
    * and the dist to round i's pick) and s_i selects its (mind DESC,
    * vec_id) maximum; the final Voronoi assignment ranks (d², round) per
    * point. Integer-exact on the shared 2²⁰ grid, so every distance, the
    * selection trace, and the per-center loads hash-compare. */
  private def kcenterSql(k: Int): String = {
    def distTo(s: String): String =
      s"SELECT p.vec_id, sum((p.x - c.x)*(p.x - c.x)) AS nd\n" +
        s"   FROM pts p JOIN $s s ON true\n" +
        s"   JOIN pts c ON c.d = p.d AND c.vec_id = s.cid GROUP BY 1"
    val mCtes = (1 until k).map { i =>
      val m =
        if (i == 1)
          s"m1 AS MATERIALIZED (SELECT vec_id, nd AS mind FROM (\n  ${distTo("s0")}))"
        else
          s"m$i AS MATERIALIZED (SELECT m.vec_id, least(m.mind, n.nd) AS mind\n" +
            s"  FROM m${i - 1} m JOIN (\n  ${distTo(s"s${i - 1}")}) n USING (vec_id))"
      // already-chosen cids are excluded from each round's argmax — the
      // duplicate-embedding degenerate fix mirrored from kcenterSelect
      // (round-14 ADVICE #2)
      val excl = (0 until i).map(j => s"SELECT cid FROM s$j").mkString(" UNION ALL ")
      val sel = s"s$i AS (SELECT vec_id AS cid, mind AS sel FROM m$i\n" +
        s"  WHERE vec_id NOT IN ($excl)\n" +
        s"  ORDER BY mind DESC, vec_id LIMIT 1)"
      s"$m,\n$sel"
    }.mkString(",\n")
    val centerRows = (s"SELECT 0 AS rnd, cid, cast(0 as bigint) AS sel FROM s0" +:
      (1 until k).map(i => s"SELECT $i, cid, cast(sel as bigint) FROM s$i"))
      .mkString("\n  UNION ALL ")
    s"""WITH p0 AS (SELECT vec_id, embedding,
       |    unnest(generate_series(1, len(embedding))) AS d FROM embeddings),
       |pts AS MATERIALIZED (SELECT vec_id, d,
       |    cast(floor(embedding[d]::DOUBLE * 1048576) as bigint) AS x FROM p0),
       |s0 AS (SELECT min(vec_id) AS cid FROM pts),
       |$mCtes,
       |centers AS ($centerRows),
       |cd AS (SELECT p.vec_id, c.rnd, sum((p.x - q.x)*(p.x - q.x)) AS d2
       |  FROM centers c JOIN pts q ON q.vec_id = c.cid JOIN pts p ON p.d = q.d
       |  GROUP BY 1, 2),
       |asg AS (SELECT vec_id, rnd, d2,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, rnd) AS rn FROM cd)
       |SELECT cast(c.rnd as int) AS sel_round, c.cid AS center_vec_id,
       |  c.sel AS sel_d2, cast(count(*) as bigint) AS n_assigned,
       |  cast(max(a.d2) as bigint) AS max_d2, cast(sum(a.d2) as bigint) AS sum_d2
       |FROM centers c JOIN asg a ON a.rn = 1 AND a.rnd = c.rnd
       |GROUP BY 1, 2, 3""".stripMargin
  }

  /** q200 (facilityLocation): the greedy submodular selection unrolled —
    * the md5-ordered candidate pool, all pool dots precomputed once, each
    * round's marginal gains over the running per-point coverage `cur`,
    * (gain DESC, cid) argmax, already-chosen candidates excluded. The
    * per-round total is derived DIFFERENTLY from the Spark side (direct
    * Σ cur_i here vs the accumulation identity there), so the gate also
    * checks the identity Σ new_cur = Σ cur + gain. HUGEINT sums mirror the
    * decimal(38,0) Spark aggregation; the EDGE columns are emitted as
    * canonical digit-string VARCHAR on both sides (a decimal edge type is
    * not driver-hashable — the round-14 q200 incident). */
  private def facilitySql(k: Int, pool: Int): String = {
    val rounds = (1 to k).map { i =>
      val excl =
        if (i == 1) ""
        else "WHERE d.c NOT IN (" +
          (1 until i).map(j => s"SELECT cid FROM s$j").mkString(" UNION ALL ") +
          ")\n  "
      s"g$i AS (SELECT d.c, sum(greatest(d.dot - u.cur, 0)) AS gain\n" +
        s"  FROM dots d JOIN cur${i - 1} u ON u.x = d.x\n" +
        s"  ${excl}GROUP BY 1),\n" +
        s"s$i AS (SELECT c AS cid, gain FROM g$i ORDER BY gain DESC, c LIMIT 1),\n" +
        s"cur$i AS (SELECT u.x, greatest(u.cur, d.dot) AS cur FROM cur${i - 1} u\n" +
        s"  JOIN dots d ON d.x = u.x AND d.c = (SELECT cid FROM s$i))"
    }.mkString(",\n")
    val out = (1 to k).map(i =>
      s"SELECT cast(${i - 1} as int) AS sel_round, cid AS rep_vec_id, " +
        s"cast(cast(gain as hugeint) as varchar) AS gain, " +
        s"cast(cast((SELECT sum(cur) FROM cur$i) as hugeint) as varchar) AS total_cov FROM s$i")
      .mkString("\n  UNION ALL ")
    s"""WITH p0 AS (SELECT vec_id, embedding,
       |    unnest(generate_series(1, len(embedding))) AS d FROM embeddings),
       |pts AS MATERIALIZED (SELECT vec_id, d,
       |    cast(floor(embedding[d]::DOUBLE * 1048576) as bigint) AS x FROM p0),
       |ids AS (SELECT DISTINCT vec_id FROM pts),
       |pool AS MATERIALIZED (SELECT vec_id FROM ids
       |  ORDER BY md5(cast(vec_id as varchar)), vec_id LIMIT $pool),
       |dots AS MATERIALIZED (SELECT p.vec_id AS x, c.vec_id AS c, sum(p.x * q.x) AS dot
       |  FROM pts p JOIN pool c ON true JOIN pts q ON q.vec_id = c.vec_id AND q.d = p.d
       |  GROUP BY 1, 2),
       |cur0 AS (SELECT vec_id AS x, cast(0 as hugeint) AS cur FROM ids),
       |$rounds
       |SELECT * FROM ($out)""".stripMargin
  }

  /** q201 (bhFdr): the Benjamini–Hochberg step-up replayed — per-source
    * one-vs-rest two-proportion z with the q136 mirrored-IEEE expression
    * tree, (|z| DESC, source) rank, and the rank-i critical z joined from
    * a VALUES table of Φ⁻¹(1 − α·i/(2K)) literals GENERATED BY THE SAME
    * Scala function the Spark side calls (TextOps.bhZCrit — the
    * knnEdgeCtes shared-constant rule; Double.toString literals
    * round-trip exactly). The table covers K = 1..32 source counts; a
    * corpus with more sources outruns the oracle, not the operator. */
  /** A Scala double as a SQL literal DuckDB parses as a DOUBLE directly:
    * the exponent marker is load-bearing — a bare numeric literal parses
    * as DECIMAL (VALUES lists then coerce rows to one common decimal
    * type), and the decimal→double conversion divides an int64 mantissa
    * that can exceed 2⁵³ — either path lands a ulp off the Scala double
    * whose shortest repr the string is (observed on 2 of 528 q201
    * thresholds at sf0.01). ONE definition for every double-embedding
    * oracle. */
  private def doubleLit(d: Double): String = {
    val s = d.toString
    if (s.contains("e") || s.contains("E")) s else s + "e0"
  }

  /** The (source → n, passes) counts CTE shared by the q201/q202 oracles
    * — one copy of the pass-filter definition, mirroring
    * TextOps.bhCounts. */
  private val bhCountsCte: String =
    """c AS (SELECT source, count(*) AS n,
      |    sum(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END) AS x
      |  FROM documents GROUP BY 1)""".stripMargin

  private def bhFdrSql(alpha: Double): String = {
    val tv = (1 to 32).flatMap { k =>
      (1 to k).map { i =>
        s"($k, $i, ${doubleLit(graft.operators.TextOps.bhZCrit(k, i, alpha))})"
      }
    }.mkString(",\n  ")
    s"""WITH $bhCountsCte,
       |t AS (SELECT cast(sum(n) as bigint) AS nn, cast(sum(x) as bigint) AS xx,
       |    CASE WHEN count(*) <= 32 THEN cast(count(*) as int)
       |      ELSE cast(error('q201 oracle: source count exceeds the K=32 '
       |        || 'threshold table - regenerate bhFdrSql with a larger cap')
       |        as int) END AS k FROM c),
       |z AS (SELECT c.source, cast(c.n as bigint) AS n, cast(c.x as bigint) AS x,
       |    (cast(c.x as double) / c.n - cast(t.xx - c.x as double) / (t.nn - c.n))
       |      / sqrt((cast(t.xx as double) / t.nn)
       |        * (1.0 - cast(t.xx as double) / t.nn)
       |        * (1.0 / c.n + 1.0 / (t.nn - c.n))) AS z, t.k
       |  FROM c, t),
       |r AS (SELECT source, n, x, z, k,
       |    cast(row_number() OVER (ORDER BY abs(z) DESC, source) as int) AS rnk
       |  FROM z),
       |tv(k_total, rnk, zcrit) AS (VALUES
       |  $tv),
       |-- zcrit is already DOUBLE (e-notation literals above); the cast is
       |-- a no-op kept as a type pin
       |j AS (SELECT r.*, cast(tv.zcrit as double) AS zcrit FROM r
       |  JOIN tv ON tv.k_total = r.k AND tv.rnk = r.rnk),
       |i AS (SELECT max(CASE WHEN abs(z) >= zcrit THEN rnk END) AS istar FROM j)
       |SELECT j.source, j.n, j.x AS passes, j.z, j.rnk AS p_rank,
       |  j.zcrit AS z_crit, (j.rnk <= coalesce(i.istar, 0)) AS reject
       |FROM j, i""".stripMargin
  }

  /** q202 (powerMde): the per-source power/MDE table replayed — same
    * counts CTE and mirrored-IEEE expression trees as bhFdrSql, with the
    * (z_{α/2} + z_β) sum computed ONCE in Scala (TextOps.invNorm) and
    * embedded as an e-notation double literal on both engine sides.
    * n_req stays a DOUBLE on purpose: a microscopic observed delta makes
    * the required sample astronomically large, and a bigint cast would
    * overflow with DIFFERENT semantics across engines. */
  private def powerMdeSql(alpha: Double, power: Double): String = {
    val z = doubleLit(graft.operators.TextOps.invNorm(1.0 - alpha / 2.0) +
      graft.operators.TextOps.invNorm(power))
    s"""WITH $bhCountsCte,
       |t AS (SELECT cast(sum(n) as bigint) AS nn, cast(sum(x) as bigint) AS xx
       |  FROM c),
       |m AS (SELECT c.source, cast(c.n as bigint) AS n,
       |    cast(c.x as double) / c.n AS rate,
       |    cast(c.x as double) / c.n
       |      - cast(t.xx - c.x as double) / (t.nn - c.n) AS delta,
       |    sqrt((cast(t.xx as double) / t.nn)
       |      * (1.0 - cast(t.xx as double) / t.nn)
       |      * (1.0 / c.n + 1.0 / (t.nn - c.n))) AS se,
       |    cast(t.xx as double) / t.nn AS ph
       |  FROM c, t)
       |SELECT source, n, rate, delta, se, $z * se AS mde,
       |  CASE WHEN delta <> 0 THEN
       |    ceil($z * $z * (2.0 * ph * (1.0 - ph)) / (delta * delta)) END AS n_req,
       |  (abs(delta) >= $z * se) AS powered
       |FROM m""".stripMargin
  }

  /** q108 (kmeansAssign): the distributed full-corpus Lloyd run replayed as
    * an unrolled CTE chain — same integer grid, truncated `//` means,
    * (dist, cid) tie order, and seed rule (cid = vec_id < k) as the Spark
    * loop; `a_i`/`c_i` alternate assignment and update exactly like the
    * driver-side iteration. Differs from [[ivfRankCtes]] in what it replays:
    * that chain reproduces the SAMPLE-trained quantizer, this one the
    * full-corpus training run whose per-point distances q109-style pruning
    * reads. */
  private def kmeansSql(k: Int, iters: Int): String = {
    val iterCtes = (1 to iters).flatMap { it =>
      Seq(
        s"""a$it AS MATERIALIZED (SELECT vec_id, cid FROM (
           |  SELECT p.vec_id, c.cid,
           |    row_number() OVER (PARTITION BY p.vec_id
           |      ORDER BY sum((p.x - c.v)*(p.x - c.v)), c.cid) AS rn
           |  FROM pts p JOIN c${it - 1} c USING (d) GROUP BY p.vec_id, c.cid) WHERE rn = 1)""",
        s"""c$it AS MATERIALIZED (SELECT pc.cid, pc.d,
           |  CASE WHEN s.n IS NULL THEN pc.v ELSE s.s // s.n END AS v
           | FROM c${it - 1} pc LEFT JOIN (
           |   SELECT a.cid, p.d, sum(p.x) AS s, count(*) AS n
           |   FROM a$it a JOIN pts p USING (vec_id) GROUP BY 1, 2) s
           |  ON s.cid = pc.cid AND s.d = pc.d)""")
    }.mkString(",\n")
    s"""WITH p0 AS (SELECT vec_id, embedding,
       |    unnest(generate_series(1, len(embedding))) AS d FROM embeddings),
       |pts AS MATERIALIZED (SELECT vec_id, d,
       |    cast(floor(embedding[d]::DOUBLE * 1048576) as bigint) AS x FROM p0),
       |c0 AS MATERIALIZED (SELECT vec_id AS cid, d, x AS v FROM pts WHERE vec_id < $k),
       |$iterCtes,
       |assign AS (SELECT vec_id, cast(cid as int) AS cid, cast(dist as bigint) AS dist FROM (
       |  SELECT p.vec_id, c.cid,
       |    sum((p.x - c.v)*(p.x - c.v)) AS dist,
       |    row_number() OVER (PARTITION BY p.vec_id
       |      ORDER BY sum((p.x - c.v)*(p.x - c.v)), c.cid) AS rn
       |  FROM pts p JOIN c$iters c USING (d) GROUP BY p.vec_id, c.cid) WHERE rn = 1)""".stripMargin
  }

  /** q110 (pcaPowerScores): Gram matrix via the pts self-join, then the
    * integer power iteration unrolled — v0 = 1⃗, each round a matvec over
    * HUGEINT and a truncated `// max|w|` rescale to the 2²⁰ grid, exactly
    * the driver-side BigInt steps. Final projection = Σ x·v per row. */
  private def pcaPowerSql(iters: Int): String = {
    val iterCtes = (1 to iters).flatMap { it =>
      Seq(
        s"""w$it AS MATERIALIZED (SELECT g.i AS d, sum(g.g * v${it - 1}.v) AS w
           | FROM gram g JOIN v${it - 1} ON g.j = v${it - 1}.d GROUP BY 1)""",
        s"""v$it AS MATERIALIZED (SELECT d,
           |  (w * 1048576) // (SELECT max(abs(w)) FROM w$it) AS v FROM w$it)""")
    }.mkString(",\n")
    s"""WITH p0 AS (SELECT vec_id, embedding,
       |    unnest(generate_series(1, len(embedding))) AS d FROM embeddings),
       |pts AS MATERIALIZED (SELECT vec_id, d,
       |    cast(floor(embedding[d]::DOUBLE * 1048576) as bigint) AS x FROM p0),
       |gram AS MATERIALIZED (SELECT a.d AS i, b.d AS j,
       |    sum(CAST(a.x AS HUGEINT) * b.x) AS g
       |  FROM pts a JOIN pts b USING (vec_id) GROUP BY 1, 2),
       |v0 AS (SELECT DISTINCT d, CAST(1 AS HUGEINT) AS v FROM pts),
       |$iterCtes
       |SELECT p.vec_id, cast(sum(p.x * vit.v) as bigint) AS score_q
       |FROM pts p JOIN v$iters vit ON p.d = vit.d GROUP BY 1""".stripMargin
  }

  /** The q33 IVF SEARCH chain on top of [[ivfRankCtes]]'s coarse ranking:
    * corpus assignment, query-panel probes, candidate pairs, exact-cosine
    * rerank — emits CTEs `assign`, `probe`, `cand`, `ivf_ranked(query_id,
    * neighbor_id, rnk)`. Shared by q33's oracle and q204's recall oracle
    * so a search change (nprobe, panel, tie-break) cannot silently
    * diverge between them (round-17 self-review #5). */
  private def ivfSearchCtes(nprobe: Int): String =
    s"""assign AS (SELECT vec_id AS neighbor_id, cell FROM rank_all WHERE rn = 1),
       |probe AS MATERIALIZED (SELECT vec_id AS query_id, cell FROM rank_all WHERE rn <= $nprobe AND vec_id < 10),
       |cand AS (SELECT query_id, neighbor_id FROM probe JOIN assign USING (cell)
       |  WHERE query_id <> neighbor_id),
       |ivf_ranked AS (SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY list_cosine_similarity(qe.embedding, ne.embedding) DESC, neighbor_id) AS rnk
       |  FROM cand JOIN embeddings qe ON qe.vec_id = cand.query_id
       |  JOIN embeddings ne ON ne.vec_id = cand.neighbor_id)""".stripMargin

  /** q33's oracle: the integer-exact IVF pipeline replayed in SQL (same
    * k/iters/nprobe constants as Similarity.ivfAnn). */
  private val ivfAnnSql: String =
    s"""WITH ${ivfRankCtes(k = 16, iters = 5)},
       |${ivfSearchCtes(nprobe = 4)}
       |SELECT query_id, neighbor_id, cast(rnk as int) AS rnk
       |FROM ivf_ranked WHERE rnk <= 3""".stripMargin

  /** The shared RECALL@3 frame over any approximate-search statement
    * emitting (query_id, neighbor_id[, …]) rows for the vec_id < 10
    * panel: exact side is q23's brute force with rnk <= 3, recall is the
    * per-query overlap / 3 (small-int division, exact in double on both
    * engines). The approximate statement nests as a derived table
    * (DuckDB scopes its WITH chain locally), so the q33 and q91 oracle
    * constructions are consumed VERBATIM — an index change cannot
    * silently diverge from its recall gate. */
  private def recallSql(apprBody: String): String =
    s"""WITH appr AS (SELECT query_id, neighbor_id FROM (
       |$apprBody
       |) appr_sub),
       |exact AS (SELECT query_id, neighbor_id FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rnk
       |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 10) e WHERE rnk <= 3)
       |SELECT e.query_id, cast(count(a.neighbor_id) as bigint) AS hits,
       |  cast(count(a.neighbor_id) as double) / cast(3 as double) AS recall
       |FROM exact e LEFT JOIN appr a
       |  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
       |GROUP BY 1""".stripMargin

  /** q204's oracle: recall@3 of the q33 IVF search against the q23 exact
    * brute-force top-3 — the approximate side is ivfAnnSql verbatim. */
  private val annRecallSql: String = recallSql(ivfAnnSql)

  /** q207's oracle: recall@3 of the q91 IVF-PQ search (ADC over the
    * product-quantized codes) against the same exact ground truth — the
    * approximate side is ivfPqSql verbatim. */
  private lazy val pqRecallSql: String = recallSql(ivfPqSql)

  /** q203's oracle: the integer-grid DoReMi walk replayed with unrolled
    * round CTEs (the pcaPowerSql discipline). Same constants as
    * TextOps.doremiWeights (G = 2²⁰, vocabCap 4095, η = ½ linear MWU,
    * 8 rounds); ln only on exact integers; `//` ≡ Scala Long `/`
    * (both truncate toward zero — pinned in OracleSemanticsSpec). */
  private val doremiSql: String = {
    val g = 1048576L
    val lnGq = math.floor(math.log(g.toDouble) * g.toDouble).toLong
    val rounds = 8
    val iterCtes = (1 to rounds).map { r =>
      s"""n$r AS MATERIALIZED (SELECT v, cast(sum(u.u * p.pq) as bigint) AS n
         |  FROM p JOIN u${r - 1} u USING (source) GROUP BY 1),
         |d$r AS (SELECT cast(sum(u) as bigint) AS d FROM u${r - 1}),
         |lm$r AS MATERIALIZED (SELECT v,
         |    cast(floor(ln(n::DOUBLE) * $g) as bigint)
         |    - (SELECT cast(floor(ln(d::DOUBLE) * $g) as bigint) FROM d$r)
         |    - $lnGq AS lmq FROM n$r),
         |x$r AS MATERIALIZED (SELECT p2.source,
         |    greatest(-(cast(sum(p2.c * lm.lmq) as bigint) // p2.td) - h.hq, 0) AS x
         |  FROM p p2 JOIN lm$r lm USING (v) JOIN h USING (source)
         |  GROUP BY p2.source, p2.td, h.hq),
         |u$r AS MATERIALIZED (SELECT x.source,
         |    (u.u * (${2 * g} + (x.x * $g) // greatest((SELECT max(x) FROM x$r), 1))) // ${2 * g} AS u
         |  FROM u${r - 1} u JOIN x$r x USING (source))""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
       |  FROM documents),
       |raw AS (SELECT source, tok, cast(count(*) as bigint) AS ct FROM t GROUP BY 1, 2),
       |keep AS (SELECT tok FROM (
       |  SELECT tok, row_number() OVER (ORDER BY sum(ct) DESC, tok) AS rn
       |  FROM raw GROUP BY tok) k WHERE rn <= 4095),
       |cnt AS MATERIALIZED (SELECT source,
       |    CASE WHEN k.tok IS NULL THEN '<unk>' ELSE raw.tok END AS v,
       |    cast(sum(ct) as bigint) AS c
       |  FROM raw LEFT JOIN keep k ON raw.tok = k.tok GROUP BY 1, 2),
       |tot AS MATERIALIZED (SELECT source, cast(sum(c) as bigint) AS td FROM cnt GROUP BY 1),
       |p AS MATERIALIZED (SELECT cnt.source, v, c, (c * $g) // td + 1 AS pq, td
       |  FROM cnt JOIN tot USING (source)),
       |h AS MATERIALIZED (SELECT source,
       |    -(cast(sum(c * (cast(floor(ln(c::DOUBLE) * $g) as bigint)
       |      - cast(floor(ln(td::DOUBLE) * $g) as bigint))) as bigint) // td) AS hq
       |  FROM p GROUP BY source, td),
       |u0 AS (SELECT source, $g::BIGINT AS u FROM tot),
       |$iterCtes
       |SELECT t.source, t.td AS t_tokens, h.hq AS entropy_q,
       |  x$rounds.x AS excess_q, u$rounds.u AS weight_q,
       |  cast(u$rounds.u as double)
       |    / cast((SELECT cast(sum(u) as bigint) FROM u$rounds) as double) AS weight
       |FROM tot t JOIN h USING (source) JOIN x$rounds USING (source)
       |JOIN u$rounds USING (source)""".stripMargin
  }

  /** q91's oracle: the IVF-PQ pipeline replayed in SQL — the coarse chain
    * (ivfRankCtes), per-cell residuals (differences of grid integers), 8
    * residual-codebook k-means chains (3 Lloyd rounds each, named b/r to
    * avoid the coarse chain's a/c), corpus encoding, per-(query, probed
    * cell) ADC tables, and the UNION ALL subspace-contribution sum. */
  private val ivfPqSql: String = {
    val m = 8; val sub = 8; val ksub = 16; val pqIters = 3; val nprobe = 4
    def subCtes(mi: Int): String = {
      val dlo = mi * sub + 1; val dhi = (mi + 1) * sub
      val iterCtes = (1 to pqIters).flatMap { it =>
        Seq(
          s"""b${it}_$mi AS MATERIALIZED (SELECT vec_id, cell FROM (
             |  SELECT p.vec_id, c.cell,
             |    row_number() OVER (PARTITION BY p.vec_id
             |      ORDER BY sum((p.x - c.v)*(p.x - c.v)), c.cell) AS rn
             |  FROM rpts$mi p JOIN r${it - 1}_$mi c USING (d) GROUP BY p.vec_id, c.cell) WHERE rn = 1)""",
          s"""r${it}_$mi AS MATERIALIZED (SELECT pc.cell, pc.d,
             |  CASE WHEN s.n IS NULL THEN pc.v ELSE s.s // s.n END AS v
             | FROM r${it - 1}_$mi pc LEFT JOIN (
             |   SELECT a.cell, p.d, sum(p.x) AS s, count(*) AS n
             |   FROM b${it}_$mi a JOIN rpts$mi p USING (vec_id) GROUP BY 1, 2) s
             |  ON s.cell = pc.cell AND s.d = pc.d)""")
      }.mkString(",\n")
      s"""rpts$mi AS MATERIALIZED (SELECT vec_id, idx, ns, d, x FROM ptsr WHERE d BETWEEN $dlo AND $dhi),
         |r0_$mi AS (SELECT i.cell, p.d, p.x AS v FROM cells i JOIN rpts$mi p ON p.idx = (i.cell * p.ns) // $ksub),
         |$iterCtes,
         |enc$mi AS (SELECT vec_id, cell AS code FROM (
         |  SELECT p.vec_id, c.cell,
         |    row_number() OVER (PARTITION BY p.vec_id
         |      ORDER BY sum((p.x - c.v)*(p.x - c.v)), c.cell) AS rn
         |  FROM eptr p JOIN r${pqIters}_$mi c USING (d) GROUP BY p.vec_id, c.cell) WHERE rn = 1),
         |qd$mi AS (SELECT q.query_id, q.pcell, c.cell AS code,
         |    sum((q.x - c.v)*(q.x - c.v)) AS dist
         |  FROM qres q JOIN r${pqIters}_$mi c USING (d) GROUP BY 1, 2, 3),
         |ct$mi AS (SELECT q.query_id, e.vec_id AS neighbor_id, q.dist
         |  FROM enc$mi e JOIN asg a ON a.vec_id = e.vec_id
         |  JOIN qd$mi q ON q.pcell = a.cell AND q.code = e.code)""".stripMargin
    }
    s"""WITH ${ivfRankCtes(k = 16, iters = 5)},
       |asg AS MATERIALIZED (SELECT vec_id, cell FROM rank_all WHERE rn = 1),
       |probe AS MATERIALIZED (SELECT vec_id AS query_id, cell FROM rank_all WHERE rn <= $nprobe AND vec_id < 10),
       |ptsr AS MATERIALIZED (SELECT p.vec_id, p.idx, p.ns, p.d, p.x - c.v AS x
       |  FROM pts p JOIN asg a USING (vec_id) JOIN c5 c ON c.cell = a.cell AND c.d = p.d),
       |eptr AS MATERIALIZED (SELECT p.vec_id, p.d, p.x - c.v AS x
       |  FROM ept p JOIN asg a USING (vec_id) JOIN c5 c ON c.cell = a.cell AND c.d = p.d),
       |qres AS MATERIALIZED (SELECT pr.query_id, pr.cell AS pcell, p.d, p.x - c.v AS x
       |  FROM probe pr JOIN ept p ON p.vec_id = pr.query_id
       |  JOIN c5 c ON c.cell = pr.cell AND c.d = p.d),
       |${(0 until m).map(subCtes).mkString(",\n")},
       |ad AS (SELECT query_id, neighbor_id, cast(sum(dist) as bigint) AS adist
       |  FROM (${(0 until m).map(mi => s"SELECT * FROM ct$mi").mkString(" UNION ALL ")})
       |  GROUP BY 1, 2),
       |rr AS (SELECT query_id, neighbor_id, adist,
       |  row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rnk
       |  FROM ad WHERE query_id <> neighbor_id)
       |SELECT query_id, neighbor_id, adist, cast(rnk as int) AS rnk FROM rr WHERE rnk <= 3""".stripMargin
  }

  /** q85's oracle: incremental semantic admission — the q79 cell assignment
    * + the q74/q76 store split (vec_id < max/3), cross-set pairs only, with
    * the explicit double-cosine composition. */
  private val ingestSemanticSql: String =
    s"""WITH ${ivfRankCtes(k = 16, iters = 5)},
       |asg AS MATERIALIZED (SELECT vec_id, cell FROM rank_all WHERE rn = 1),
       |wm AS (SELECT max(vec_id) // 3 AS wm FROM embeddings),
       |ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT a.vec_id AS store_vec_id, b.vec_id AS batch_vec_id,
       |  list_inner_product(ea.v, eb.v) /
       |    (sqrt(list_inner_product(ea.v, ea.v)) * sqrt(list_inner_product(eb.v, eb.v))) AS cos
       |FROM asg a JOIN asg b ON a.cell = b.cell
       |CROSS JOIN wm
       |JOIN ev ea ON ea.vec_id = a.vec_id
       |JOIN ev eb ON eb.vec_id = b.vec_id
       |WHERE a.vec_id < wm.wm AND b.vec_id >= wm.wm
       |  AND list_inner_product(ea.v, eb.v) /
       |    (sqrt(list_inner_product(ea.v, ea.v)) * sqrt(list_inner_product(eb.v, eb.v))) >= 0.4""".stripMargin

  /** q79's oracle: SemDeDup replayed in SQL — the same integer-exact cell
    * assignment as q33, then within each cell every vector with a LOWER-id
    * cell-mate at cosine ≥ 0.4 is a semantic duplicate. Cosine is the explicit
    * double composition (list_cosine_similarity on FLOAT[] is single
    * precision — the q77 gotcha), matching Spark's dot/(norm·norm) exactly. */
  private val semanticDedupSql: String =
    s"""WITH ${ivfRankCtes(k = 16, iters = 5)},
       |asg AS MATERIALIZED (SELECT vec_id, cell FROM rank_all WHERE rn = 1),
       |ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |dup AS (SELECT DISTINCT b.vec_id
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  JOIN ev ea ON ea.vec_id = a.vec_id
       |  JOIN ev eb ON eb.vec_id = b.vec_id
       |  WHERE list_inner_product(ea.v, eb.v) /
       |    (sqrt(list_inner_product(ea.v, ea.v)) * sqrt(list_inner_product(eb.v, eb.v))) >= 0.4)
       |SELECT asg.vec_id, cast(asg.cell as int) AS cell, dup.vec_id IS NULL AS kept
       |FROM asg LEFT JOIN dup ON asg.vec_id = dup.vec_id""".stripMargin

  /** q82's oracle: the PQ pipeline replayed in SQL — 8 per-subspace
    * integer-exact k-means chains (each the q33 construction restricted to
    * its 8-dim slice), corpus encoding as per-subspace argmin, per-query
    * exact integer distance tables, and the ADC sum as a UNION ALL of the
    * 8 subspace contributions. */
  private val pqAnnSql: String = {
    val m = 8; val sub = 8; val ksub = 16; val iters = 5
    def subCtes(mi: Int): String = {
      val dlo = mi * sub + 1; val dhi = (mi + 1) * sub
      val iterCtes = (1 to iters).flatMap { it =>
        Seq(
          s"""a${it}_$mi AS MATERIALIZED (SELECT vec_id, cell FROM (
             |  SELECT p.vec_id, c.cell,
             |    row_number() OVER (PARTITION BY p.vec_id
             |      ORDER BY sum((p.x - c.v)*(p.x - c.v)), c.cell) AS rn
             |  FROM pts$mi p JOIN c${it - 1}_$mi c USING (d) GROUP BY p.vec_id, c.cell) WHERE rn = 1)""",
          s"""c${it}_$mi AS MATERIALIZED (SELECT pc.cell, pc.d,
             |  CASE WHEN s.n IS NULL THEN pc.v ELSE s.s // s.n END AS v
             | FROM c${it - 1}_$mi pc LEFT JOIN (
             |   SELECT a.cell, p.d, sum(p.x) AS s, count(*) AS n
             |   FROM a${it}_$mi a JOIN pts$mi p USING (vec_id) GROUP BY 1, 2) s
             |  ON s.cell = pc.cell AND s.d = pc.d)""")
      }.mkString(",\n")
      s"""pts$mi AS MATERIALIZED (SELECT vec_id, idx, ns, d, x FROM pts WHERE d BETWEEN $dlo AND $dhi),
         |c0_$mi AS (SELECT i.cell, p.d, p.x AS v FROM cells i JOIN pts$mi p ON p.idx = (i.cell * p.ns) // $ksub),
         |$iterCtes,
         |enc$mi AS (SELECT vec_id, cell AS code FROM (
         |  SELECT p.vec_id, c.cell,
         |    row_number() OVER (PARTITION BY p.vec_id
         |      ORDER BY sum((p.x - c.v)*(p.x - c.v)), c.cell) AS rn
         |  FROM ept p JOIN c${iters}_$mi c USING (d) GROUP BY p.vec_id, c.cell) WHERE rn = 1),
         |qd$mi AS (SELECT p.vec_id AS query_id, c.cell, sum((p.x - c.v)*(p.x - c.v)) AS dist
         |  FROM ept p JOIN c${iters}_$mi c USING (d) WHERE p.vec_id < 10 GROUP BY 1, 2),
         |ct$mi AS (SELECT q.query_id, e.vec_id AS neighbor_id, q.dist
         |  FROM enc$mi e JOIN qd$mi q ON q.cell = e.code)""".stripMargin
    }
    s"""WITH samp AS (SELECT vec_id, embedding,
       |    row_number() OVER (ORDER BY vec_id) - 1 AS idx, count(*) OVER () AS ns
       |  FROM embeddings WHERE vec_id < 1024),
       |p0 AS (SELECT vec_id, idx, ns, embedding, unnest(generate_series(1, len(embedding))) AS d FROM samp),
       |pts AS MATERIALIZED (SELECT vec_id, idx, ns, d, cast(floor(embedding[d]::DOUBLE * 1048576) as bigint) AS x FROM p0),
       |cells AS (SELECT unnest(generate_series(0, ${ksub - 1})) AS cell),
       |e0 AS (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS d FROM embeddings),
       |ept AS MATERIALIZED (SELECT vec_id, d, cast(floor(embedding[d]::DOUBLE * 1048576) as bigint) AS x FROM e0),
       |${(0 until m).map(subCtes).mkString(",\n")},
       |ad AS (SELECT query_id, neighbor_id, cast(sum(dist) as bigint) AS adist
       |  FROM (${(0 until m).map(mi => s"SELECT * FROM ct$mi").mkString(" UNION ALL ")})
       |  GROUP BY 1, 2),
       |r AS (SELECT query_id, neighbor_id, adist,
       |  row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rnk
       |  FROM ad WHERE query_id <> neighbor_id)
       |SELECT query_id, neighbor_id, adist, cast(rnk as int) AS rnk FROM r WHERE rnk <= 3""".stripMargin
  }

  /** q106 (gopherRepetition): one generated gram CTE per n — max of
    * count·charlen for the top-n caps (n = 2..4), Σ count·charlen over
    * grams occurring ≥2× for the dup-n caps (n = 5..10); every flag is the
    * operator's exact `mass·100 ≤ chars·threshold` cross-multiplication. */
  private def gopherRepetitionSql: String = {
    val names = graft.operators.TextOps.RepetitionThresholds.map(_._1)
    val ths = graft.operators.TextOps.RepetitionThresholds.map(_._2)
    val parts = (2 to 10).map { n =>
      val agg =
        if (n <= 4) "max(ct * clen)"
        else "sum(CASE WHEN ct >= 2 THEN ct * clen ELSE 0 END)"
      s"""a$n AS (SELECT doc_id, $agg AS mass FROM (
         |  SELECT doc_id, gram, cast(count(*) as bigint) AS ct,
         |    cast(length(gram) - ${n - 1} as bigint) AS clen
         |  FROM (SELECT doc_id, unnest([array_to_string(toks[i:i+${n - 1}], ' ')
         |    FOR i IN generate_series(1, greatest(len(toks) - ${n - 1}, 0))]) AS gram FROM s) u$n
         |  GROUP BY 1, 2) c$n GROUP BY 1)""".stripMargin
    }
    val massSel = names.zipWithIndex.map { case (nm, i) =>
      s"cast(coalesce(a${i + 2}.mass, 0) as bigint) AS mass_$nm" }.mkString(",\n ")
    val flagSel = names.zipWithIndex.map { case (nm, i) =>
      s"(coalesce(a${i + 2}.mass, 0) * 100 <= char_sum * ${ths(i)}) AS rule_$nm" }
      .mkString(",\n ")
    val keep = names.zipWithIndex.map { case (nm, i) =>
      s"coalesce(a${i + 2}.mass, 0) * 100 <= char_sum * ${ths(i)}" }.mkString(" AND ")
    val joins = (2 to 10).map(n => s"LEFT JOIN a$n ON s.doc_id = a$n.doc_id").mkString("\n")
    s"""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
       |s AS (SELECT doc_id, toks,
       |  cast(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) as bigint) AS char_sum FROM t),
       |${parts.mkString(",\n")}
       |SELECT s.doc_id, char_sum,
       | $massSel,
       | $flagSel,
       | ($keep) AS keep
       |FROM s
       |$joins""".stripMargin
  }

  /** q94 (bigramFluencyPruned) is EXACTLY equal to q70 by construction —
    * pruning below the rarity cutoff is lossless for the 1000·c<Σc filter —
    * so the scale variant shares q70's oracle verbatim instead of a weaker
    * rows-only check. */
  /** q107 (bloomIngestDedup) admits EXACTLY q74's set by construction — the
    * Bloom filter has no false negatives, so the filter-miss fast path and
    * the verified bloom-positive path partition q74's anti-join losslessly —
    * so the scale variant shares q74's oracle verbatim. */
  lazy val sql: Map[String, String] =
    base ++ Map(
      "q94_bigram_fluency_pruned" -> base("q70_bigram_fluency"),
      "q107_bloom_ingest" -> base("q74_ingest_dedup"),
      "q106_gopher_repetition" -> gopherRepetitionSql)

  private val base: Map[String, String] = Map(

    // q121 (epochPlan): the repetition-and-placement plan replayed with the
    // same integer milli-weights and md5-prefix hash coins — every copy row
    // and its shard is exact on both engines
    "q121_epoch_plan" ->
      """WITH d AS (SELECT doc_id, source,
        |    cast(regexp_extract(source, '(\d+)$', 1) as bigint) AS n FROM documents),
        |w AS (SELECT doc_id, source, 500 + (n % 7) * 350 AS wm,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT AS h FROM d),
        |c AS (SELECT doc_id, source,
        |    (wm // 1000) + CASE WHEN h * 1000 < (wm % 1000) * 4294967296
        |      THEN 1 ELSE 0 END AS copies
        |  FROM w)
        |SELECT doc_id, source, cast(ci as int) AS copy_idx,
        |  cast(('0x' || substr(md5(doc_id::VARCHAR || '_' || ci), 1, 8))::UBIGINT
        |    % 16 as int) AS shard
        |FROM c, unnest(generate_series(1, copies)) AS t(ci)""".stripMargin,

    // q122 (gapFillHourly): dense hourly axis from the bounds row, left
    // join of the (type, hour) aggregate, zero-filled — integer-exact
    "q122_gap_fill" ->
      """WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS h,
        |    cast(floor(value * 100) as bigint) AS cents FROM events),
        |c AS (SELECT event_type, h, count(*) AS ct, sum(cents) AS sum_cents
        |  FROM ev GROUP BY 1, 2),
        |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
        |axis AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b),
        |t AS (SELECT DISTINCT event_type FROM ev)
        |SELECT t.event_type, strftime(axis.h, '%Y-%m-%d %H:00:00') AS hour,
        |  coalesce(c.ct, 0) AS ct, cast(coalesce(c.sum_cents, 0) as bigint) AS sum_cents
        |FROM t CROSS JOIN axis
        |LEFT JOIN c ON c.event_type = t.event_type AND c.h = axis.h""".stripMargin,

    // q118 (audienceOverlap): exact pairwise (user,day)-audience overlap is
    // hash-compared; the sketch inclusion-exclusion estimate differs by HLL
    // implementation, so (q34/q117 pattern) each engine emits its OWN
    // within-tolerance flag computed from its own sketches.
    "q118_audience_overlap" ->
      """WITH el AS (SELECT DISTINCT event_type AS t,
        |    user_id::VARCHAR || '_' || strftime(cast(ts as date), '%Y-%m-%d') AS u
        |  FROM events),
        |uv AS (SELECT t, count(*) AS uv, approx_count_distinct(u) AS est FROM el GROUP BY 1),
        |ov AS (SELECT a.t AS type_a, b.t AS type_b, count(*) AS overlap_exact
        |  FROM el a JOIN el b ON a.u = b.u AND a.t < b.t GROUP BY 1, 2),
        |un AS (SELECT o.type_a, o.type_b, approx_count_distinct(el.u) AS est_union
        |  FROM ov o JOIN el ON el.t = o.type_a OR el.t = o.type_b GROUP BY 1, 2)
        |SELECT o.type_a, o.type_b, ua.uv AS uv_a, ub.uv AS uv_b, o.overlap_exact,
        |  abs(cast(ua.est + ub.est - un.est_union as double) - o.overlap_exact)
        |    / greatest(o.overlap_exact, 1) <= 0.2 AS approx_ok
        |FROM ov o
        |JOIN uv ua ON ua.t = o.type_a JOIN uv ub ON ub.t = o.type_b
        |JOIN un ON un.type_a = o.type_a AND un.type_b = o.type_b""".stripMargin,

    // q119 (scd2History): classic SCD2 assembly in SQL — collapse
    // consecutive duplicate states with lag, then lead/row_number intervals.
    // Ties break on event_id (unique) on both engines; open intervals close
    // with the 9999-12-31 sentinel so every cell hashes.
    "q119_scd2_history" ->
      """WITH e AS (SELECT user_id, event_type AS state, ts, event_id FROM events),
        |c AS (SELECT *, lag(state) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
        |ch AS (SELECT user_id, state, ts, event_id FROM c
        |  WHERE prev IS NULL OR prev <> state),
        |iv AS (SELECT user_id, state, ts,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version
        |  FROM ch)
        |SELECT user_id, state, strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  coalesce(strftime(vt, '%Y-%m-%d %H:%M:%S'), '9999-12-31 23:59:59') AS valid_to,
        |  cast(version as int) AS version, vt IS NULL AS is_current
        |FROM iv""".stripMargin,

    // q120 (zorderLayout): the 16-bit Morton spread replayed as the same
    // 4-round shift-or-mask integer sequence — bit-exact across engines;
    // bucket stats are the parquet-footer zone maps a z-ordered write
    // would produce.
    "q120_zorder_layout" ->
      """WITH base AS (SELECT (o_custkey & 65535) AS a,
        |    (date_diff('day', DATE '1992-01-01', cast(o_orderdate as date)) & 65535) AS b,
        |    o_custkey AS cust,
        |    date_diff('day', DATE '1992-01-01', cast(o_orderdate as date)) AS day
        |  FROM orders),
        |s1 AS (SELECT cust, day, ((a | (a << 8)) & 16711935) AS a,
        |    ((b | (b << 8)) & 16711935) AS b FROM base),
        |s2 AS (SELECT cust, day, ((a | (a << 4)) & 252645135) AS a,
        |    ((b | (b << 4)) & 252645135) AS b FROM s1),
        |s3 AS (SELECT cust, day, ((a | (a << 2)) & 858993459) AS a,
        |    ((b | (b << 2)) & 858993459) AS b FROM s2),
        |s4 AS (SELECT cust, day, ((a | (a << 1)) & 1431655765) AS a,
        |    ((b | (b << 1)) & 1431655765) AS b FROM s3),
        |z AS (SELECT cust, day, (a | (b << 1)) AS z FROM s4)
        |SELECT cast(z >> 22 as bigint) AS zbucket, count(*) AS ct,
        |  min(cust) AS min_cust, max(cust) AS max_cust,
        |  cast(min(day) as int) AS min_day, cast(max(day) as int) AS max_day
        |FROM z GROUP BY 1""".stripMargin,

    "q82_pq_ann" -> pqAnnSql,

    "q91_ivf_pq" -> ivfPqSql,

    "q33_ivf_ann" -> ivfAnnSql,

    "q204_ann_recall" -> annRecallSql,

    "q207_pq_recall" -> pqRecallSql,

    "q203_doremi_weights" -> doremiSql,

    // q206 (pmiCollocations): top-64 bigram collocations by grid PMI —
    // ln on products of exact integer counts, min-count floor 5, total
    // (pmi_q DESC, bigram) order on the cut; the bigram list comprehension
    // mirrors shinglesCol(toks, 2)
    "q206_pmi_collocations" ->
      """WITH t AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
        |uc AS (SELECT w, cast(count(*) as bigint) AS c
        |  FROM (SELECT unnest(toks) AS w FROM t) u GROUP BY 1),
        |n AS (SELECT cast(sum(c) as bigint) AS n FROM uc),
        |bc AS (SELECT bg, cast(count(*) as bigint) AS ct FROM (
        |  SELECT unnest([toks[i] || ' ' || toks[i + 1]
        |    FOR i IN generate_series(1, greatest(len(toks) - 1, 0))]) AS bg FROM t) b
        |  GROUP BY 1 HAVING count(*) >= 5),
        |j AS (SELECT bg, ct, x.c AS cx, y.c AS cy
        |  FROM bc JOIN uc x ON x.w = split_part(bg, ' ', 1)
        |  JOIN uc y ON y.w = split_part(bg, ' ', 2)),
        |s AS (SELECT bg AS bigram, ct, cx, cy,
        |    cast(floor(ln((ct * n.n)::DOUBLE) * 1048576) as bigint)
        |    - cast(floor(ln((cx * cy)::DOUBLE) * 1048576) as bigint) AS pmi_q
        |  FROM j, n)
        |SELECT bigram, ct, cx, cy, pmi_q,
        |  cast(pmi_q as double) / cast(1048576 as double) AS pmi
        |FROM s ORDER BY pmi_q DESC, bigram LIMIT 64""".stripMargin,

    // q205 (zipfTail): Hill tail-index per source over the top-64 token
    // counts — ln only on exact integer counts (q103 idiom), the rank-m
    // count is the top set's min (count-desc ranking), one truncating
    // division, and the double is a 2²⁰ power-of-2 rescale (IEEE-exact).
    "q205_zipf_tail" ->
      """WITH t AS (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents),
        |c AS (SELECT source, token, count(*) AS ct FROM t GROUP BY 1, 2),
        |n AS (SELECT source, count(*) AS n_terms FROM c GROUP BY 1),
        |r AS (SELECT source, ct, token,
        |    row_number() OVER (PARTITION BY source ORDER BY ct DESC, token) AS rnk FROM c),
        |top AS (SELECT source, cast(floor(ln(ct::DOUBLE) * 1048576) as bigint) AS lnq
        |  FROM r WHERE rnk <= 64),
        |a AS (SELECT source, count(*) AS m_used,
        |    cast(sum(lnq) - count(*) * min(lnq) as bigint) AS tail_sum_q
        |  FROM top GROUP BY 1 HAVING count(*) >= 2)
        |SELECT a.source, n.n_terms, cast(m_used as int) AS m_used, tail_sum_q,
        |  cast((m_used - 1) * 1099511627776 // greatest(tail_sum_q, 1) as bigint) AS alpha_q,
        |  cast(cast((m_used - 1) * 1099511627776 // greatest(tail_sum_q, 1) as bigint) as double)
        |    / cast(1048576 as double) AS alpha
        |FROM a JOIN n USING (source)""".stripMargin,

    "q108_kmeans_assign" ->
      (kmeansSql(k = 8, iters = 4) + "\nSELECT vec_id, cid, dist FROM assign"),

    "q110_pca_power" -> pcaPowerSql(iters = 8),

    // q111 (cmsHeavyHitters): the d=4 × w=256 Count-Min sketch replayed —
    // bucket = md5-prefix string, estimate = min over the 4 rows' cells,
    // joined to the exact top-10. cms_est ≥ exact_ct by the CMS theorem.
    "q111_cms_heavy_hitters" ->
      """WITH ev AS (SELECT user_id FROM events),
        |rr AS (SELECT unnest(generate_series(0, 3)) AS r),
        |cnt AS (SELECT r, substr(md5(r || '_' || user_id), 1, 2) AS b, count(*) AS c
        |  FROM ev CROSS JOIN rr GROUP BY 1, 2),
        |exact AS (SELECT user_id, count(*) AS exact_ct FROM ev GROUP BY 1),
        |top AS (SELECT user_id, exact_ct FROM (
        |    SELECT user_id, exact_ct,
        |      row_number() OVER (ORDER BY exact_ct DESC, user_id) AS rn
        |    FROM exact) WHERE rn <= 10),
        |est AS (SELECT t.user_id, t.exact_ct, min(c.c) AS cms_est
        |  FROM top t CROSS JOIN rr
        |  JOIN cnt c ON c.r = rr.r AND c.b = substr(md5(rr.r || '_' || t.user_id), 1, 2)
        |  GROUP BY 1, 2)
        |SELECT user_id, exact_ct, cast(cms_est as bigint) AS cms_est,
        |  cast(cms_est - exact_ct as bigint) AS overcount FROM est""".stripMargin,

    // q112 (editDistancePairs): oracle = the EXACT length-filtered full-DP
    // Levenshtein join (|Δlen| ≤ 24 is lossless: each edit changes length by
    // ≤ 1). The Spark side's LSH-banded candidates + thresholded banded DP
    // must reproduce it pair-for-pair — banding recall for edit-close pairs
    // is empirical (see Dedup.editDistancePairs scaladoc), and this
    // hash-match is the gate that would catch any recall loss. Integer ed:
    // both engines implement classic unit-cost Levenshtein.
    "q112_edit_distance_pairs" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db,
        |    levenshtein(a.text, b.text) AS ed
        |  FROM d a JOIN d b ON a.doc_id < b.doc_id AND abs(a.n - b.n) <= 24)
        |SELECT da, db, cast(ed AS int) AS ed FROM p WHERE ed <= 24""".stripMargin,

    // q116 (retentionCohorts): (user, day) dedup -> first-seen min ->
    // offset counts, all integer/date-exact on both engines
    "q116_retention_cohorts" ->
      """WITH ud AS (SELECT DISTINCT user_id, cast(ts as date) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort FROM ud GROUP BY 1)
        |SELECT cohort, cast(date_diff('day', cohort, d) as int) AS day_offset,
        |  count(*) AS active_users
        |FROM ud JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin,

    // q117 (incrementalStatsSketch): q115's MV with a mergeable-HLL distinct
    // measure. Sketch estimates differ by implementation (DataSketches vs
    // DuckDB), so the q34 self-check pattern applies: both engines output
    // their exact distinct (hash-compared) + their OWN within-tolerance
    // flag; the raw estimates stay out of the result.
    "q117_incremental_sketch" ->
      """SELECT event_type, cast(ts as date) AS event_date,
        |  count(*) AS ct,
        |  cast(sum(cast(floor(value * 100) as bigint)) as bigint) AS sum_cents,
        |  count(distinct user_id) AS uv_exact,
        |  abs(cast(approx_count_distinct(user_id) as double) - count(distinct user_id))
        |    / count(distinct user_id) <= 0.15 AS approx_ok
        |FROM events GROUP BY 1, 2""".stripMargin,

    // q115 (incrementalStats): the oracle recomputes the MV from ALL events
    // in one pass; the Spark side maintains it by aggregating only the
    // delta (event_id % 10 = 0) and algebraically merging with the base
    // snapshot aggregate — equality IS the maintenance-correctness proof.
    // Integer measures (count / floor-cents sum / max) keep it hash-exact.
    "q115_incremental_stats" ->
      """SELECT event_type, cast(ts as date) AS event_date,
        |  count(*) AS ct,
        |  cast(sum(cast(floor(value * 100) as bigint)) as bigint) AS sum_cents,
        |  cast(max(cast(floor(value * 100) as bigint)) as bigint) AS max_cents
        |FROM events GROUP BY 1, 2""".stripMargin,

    // q113 (bucketedJoin): result semantics are layout-independent — the
    // oracle is the plain join+agg; the bucketed co-location is a PLAN
    // property pinned in RelationalSpec (zero Exchange). Integer-exact
    // columns (count + floor-cents) avoid float-accumulation-order drift.
    "q113_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS line_ct,
        |  cast(sum(cast(floor(l_extendedprice * 100) as bigint)) as bigint) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    // q109 (kmeansPrototypes): the q108 training chain + per-cluster
    // most-central top-m ranking — the SSL-prototypes pruning rule
    "q109_kmeans_prototypes" ->
      (kmeansSql(k = 8, iters = 4) +
        """
          |SELECT cid, vec_id, dist, cast(rn as int) AS rnk FROM (
          |  SELECT cid, vec_id, dist,
          |    row_number() OVER (PARTITION BY cid ORDER BY dist, vec_id) AS rn
          |  FROM assign) WHERE rn <= 20""".stripMargin),

    "q79_semantic_dedup" -> semanticDedupSql,

    "q85_ingest_semdedup" -> ingestSemanticSql,

    // JL sparse sign projection: the q28 plane-sign derivation (md5 of
    // "p_d", d 0-based) over the 2^20 integer grid — exact integer sums
    "q87_random_project" ->
      """WITH e0 AS (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS d
        |  FROM embeddings),
        |q AS (SELECT vec_id, d, cast(floor(embedding[d]::DOUBLE * 1048576) as bigint) AS x FROM e0),
        |dims AS (SELECT unnest(generate_series(0, 15)) AS j),
        |ds AS (SELECT DISTINCT d FROM q),
        |sgn AS (SELECT j, d,
        |    CASE WHEN ('0x' || substr(md5(j || '_' || (d - 1)), 1, 2))::INT & 1 = 1
        |      THEN 1 ELSE -1 END AS s
        |  FROM dims CROSS JOIN ds)
        |SELECT q.vec_id, cast(sgn.j as int) AS j, cast(sum(sgn.s * q.x) as bigint) AS val
        |FROM q JOIN sgn USING (d) GROUP BY 1, 2""".stripMargin,

    // BM25 with the two documented divergences (raw Robertson idf ratio, not
    // ln — monotone; per-term floor(x·2²⁰) quantization before the sum) so
    // every arithmetic step is a deterministic IEEE +,*,/ in identical order.
    // hashing-trick embedder: same md5-first-8-bytes token hash as q27
    // (UBIGINT), bucket = h % 64 = low 6 bits, sign = bit 6; dense 64-dim
    // output (zeros included) via the dims cross join
    "q83_hash_embed" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS n FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
        |  GROUP BY 1, 2),
        |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h, n FROM tf),
        |c AS (SELECT doc_id, cast(h % 64 as int) AS d,
        |    cast(sum(CASE WHEN (h // 64) % 2 = 1 THEN n ELSE -n END) as bigint) AS val
        |  FROM h GROUP BY 1, 2),
        |dims AS (SELECT unnest(generate_series(0, 63)) AS d)
        |SELECT t.doc_id, cast(dims.d as int) AS d, coalesce(c.val, 0) AS val
        |FROM t CROSS JOIN dims
        |LEFT JOIN c ON c.doc_id = t.doc_id AND c.d = dims.d""".stripMargin,

    // PageRank over the exact near-dup pair graph (the q26 pair set, LSH
    // recall 1.0 on this fixture): 5 damped integer-exact rounds, scaled 1e6
    "q84_neardup_pagerank" -> {
      val iterCtes = (1 to 5).map { i =>
        s"""c$i AS (SELECT e.dst AS doc_id, sum((85 * r.pr) // (100 * g.deg)) AS s
           |  FROM edges e JOIN r${i - 1} r ON r.doc_id = e.src
           |  JOIN deg g ON g.src = e.src GROUP BY 1),
           |r$i AS (SELECT n.doc_id, cast(150000 + coalesce(c.s, 0) as bigint) AS pr
           |  FROM (SELECT src AS doc_id FROM deg) n LEFT JOIN c$i c USING (doc_id))"""
      }.mkString(",\n")
      s"""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
         |  FROM documents),
         |s AS (SELECT doc_id, unnest(list_distinct(
         |   [array_to_string(toks[i:i+2], ' ') FOR i IN generate_series(1, greatest(len(toks) - 2, 0))])) AS sh
         |  FROM t),
         |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
         |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
         |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |pairs AS (SELECT da, db FROM p JOIN sz x ON p.da = x.doc_id JOIN sz y ON p.db = y.doc_id
         |  WHERE cast(inter as double) / (x.n + y.n - inter) >= 0.5),
         |edges AS (SELECT da AS src, db AS dst FROM pairs UNION ALL SELECT db, da FROM pairs),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
         |r0 AS (SELECT src AS doc_id, cast(1000000 as bigint) AS pr FROM deg),
         |$iterCtes
         |SELECT doc_id, pr FROM r5""".stripMargin
    },

    "q81_bm25_search" ->
      """WITH qt(query, term) AS (VALUES ('q1','spark'),('q1','join'),
        |  ('q2','table'),('q2','scan'),('q3','window'),('q3','agg')),
        |tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, cast(len(regexp_extract_all(lower(text), '[a-z0-9]+')) as bigint) AS dl
        |  FROM documents),
        |stats AS (SELECT count(*) AS n, cast(sum(dl) as bigint) AS tot FROM dl),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |c AS (SELECT q.query, f.doc_id,
        |    cast(floor(
        |      (cast(2*(s.n - d.df) + 1 as double) / cast(2*d.df + 1 as double)) *
        |      ((f.tf * 2.2) / (f.tf + 1.2 * (0.25 + 0.75 * (l.dl / (cast(s.tot as double) / s.n))))) *
        |      1048576) as bigint) AS cs
        |  FROM qt q JOIN tf f USING (term) JOIN dft d USING (term)
        |  JOIN dl l ON l.doc_id = f.doc_id CROSS JOIN stats s),
        |sc AS (SELECT query, doc_id, cast(sum(cs) as bigint) AS score_q FROM c GROUP BY 1, 2),
        |r AS (SELECT query, doc_id, score_q,
        |  row_number() OVER (PARTITION BY query ORDER BY score_q DESC, doc_id) AS rnk FROM sc)
        |SELECT query, doc_id, score_q, cast(rnk as int) AS rnk FROM r WHERE rnk <= 10""".stripMargin,

    // skew profiler: top-10 heavy hitters of the events join key with exact
    // share/skew math (one double division / multiplication of exact longs)
    "q86_skew_profile" ->
      """WITH c AS (SELECT user_id, count(*) AS ct FROM events GROUP BY 1),
        |s AS (SELECT cast(sum(ct) as bigint) AS total, count(*) AS n_keys FROM c),
        |top AS (SELECT user_id, ct FROM c ORDER BY ct DESC, user_id LIMIT 10)
        |SELECT user_id, cast(ct as bigint) AS ct,
        |  cast(ct as double) / total AS share,
        |  (cast(ct as double) / total) * n_keys AS skew_x,
        |  cast(row_number() OVER (ORDER BY ct DESC, user_id) as int) AS rnk
        |FROM top CROSS JOIN s""".stripMargin,

    // linear classifier inference over the q83 features: md5-derived weights
    // ((first byte % 16) - 8), exact integer dot; zero buckets contribute 0
    // so only hit buckets need scoring
    "q88_classifier_filter" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS n
        |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2),
        |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h, n FROM tf),
        |c AS (SELECT doc_id, cast(h % 64 as int) AS d,
        |    cast(sum(CASE WHEN (h // 64) % 2 = 1 THEN n ELSE -n END) as bigint) AS val
        |  FROM h GROUP BY 1, 2),
        |w AS (SELECT j, (('0x' || substr(md5('w_' || j), 1, 2))::INT % 16) - 8 AS w
        |  FROM (SELECT unnest(generate_series(0, 63)) AS j)),
        |s AS (SELECT t.doc_id, cast(coalesce(sum(w.w * c.val), 0) as bigint) AS score
        |  FROM t LEFT JOIN c ON c.doc_id = t.doc_id LEFT JOIN w ON w.j = c.d
        |  GROUP BY 1)
        |SELECT doc_id, score, score >= 0 AS keep FROM s""".stripMargin,

    // CDC chunking: boundary at 1-based position i+1 where the winnow 8-gram
    // hash at 0-based start i (i>0) is 0 mod 64; chunk fp = md5 of the text
    "q89_cdc_chunks" -> {
      val M = graft.functions.TextFns.WinnowMod
      s"""WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents),
         |g0 AS (SELECT doc_id, text, unnest(generate_series(0, L - 8)) AS i FROM d),
         |g AS (SELECT doc_id, i, ($winnowGramExpr) % $M AS h FROM g0),
         |starts AS (SELECT doc_id, 1 AS s FROM d
         |  UNION SELECT doc_id, i + 1 AS s FROM g WHERE (h % 64) = 0 AND i > 0),
         |seg AS (SELECT doc_id, s,
         |    cast(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1 as int) AS seg_idx,
         |    lead(s) OVER (PARTITION BY doc_id ORDER BY s) AS nxt
         |  FROM starts)
         |SELECT seg.doc_id, seg_idx, cast(s as int) AS start,
         |  cast(coalesce(nxt, L + 1) - s as int) AS len,
         |  md5(substr(text, s, coalesce(nxt, L + 1) - s)) AS fp
         |FROM seg JOIN d ON seg.doc_id = d.doc_id""".stripMargin
    },

    // token-distribution drift store-vs-batch: Laplace-smoothed chi-square
    // contributions, floor(x*2^20)-quantized before ranking
    "q90_token_drift" ->
      """WITH wm AS (SELECT max(doc_id) // 3 AS wm FROM documents),
        |tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents),
        |st AS (SELECT token, count(*) AS store_ct FROM tok CROSS JOIN wm
        |  WHERE doc_id < wm GROUP BY 1),
        |bt AS (SELECT token, count(*) AS batch_ct FROM tok CROSS JOIN wm
        |  WHERE doc_id >= wm GROUP BY 1),
        |j AS (SELECT coalesce(st.token, bt.token) AS token,
        |    coalesce(store_ct, 0) AS store_ct, coalesce(batch_ct, 0) AS batch_ct
        |  FROM st FULL OUTER JOIN bt ON st.token = bt.token),
        |tot AS (SELECT cast(sum(store_ct) as bigint) AS st_tot,
        |    cast(sum(batch_ct) as bigint) AS b_tot, count(*) AS vocab FROM j),
        |c AS (SELECT token, cast(store_ct as bigint) AS store_ct,
        |    cast(batch_ct as bigint) AS batch_ct,
        |    cast(floor(((batch_ct - e) * (batch_ct - e) / e) * 1048576) as bigint) AS contrib_q
        |  FROM (SELECT j.*, (store_ct + 1)::DOUBLE / (st_tot + vocab) * b_tot AS e
        |        FROM j CROSS JOIN tot)),
        |top AS (SELECT * FROM c ORDER BY contrib_q DESC, token LIMIT 20)
        |SELECT token, store_ct, batch_ct, contrib_q,
        |  cast(row_number() OVER (ORDER BY contrib_q DESC, token) as int) AS rnk
        |FROM top""".stripMargin,

    // CCNet head/middle/tail: bigram-LM doc scores (quantized conditional
    // probabilities, tf-weighted integer sums) + exact interpolated tercile
    // cutoffs (quantile_cont ≡ Spark percentile, the q42-proven pairing)
    "q92_perplexity_buckets" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |g0 AS (SELECT doc_id, unnest(
        |   [array_to_string(toks[i:i+1], ' ') FOR i IN generate_series(1, greatest(len(toks) - 1, 0))]) AS gram
        |  FROM t),
        |gr AS (SELECT doc_id, gram, count(*) AS tf FROM g0 GROUP BY 1, 2),
        |corpus AS (SELECT gram, cast(sum(tf) as bigint) AS c12 FROM gr GROUP BY 1),
        |marg AS (SELECT split_part(gram, ' ', 1) AS w1, cast(sum(c12) as bigint) AS c1
        |  FROM corpus GROUP BY 1),
        |sc AS (SELECT doc_id, cast(sum(tf * q) as bigint) AS score_sum,
        |    cast(sum(tf) as bigint) AS n_bigrams
        |  FROM (SELECT g.doc_id, g.tf,
        |      cast(floor(cast(c.c12 as double) / m.c1 * 1048576) as bigint) AS q
        |    FROM gr g JOIN corpus c USING (gram)
        |    JOIN marg m ON m.w1 = split_part(g.gram, ' ', 1))
        |  GROUP BY 1),
        |w AS (SELECT t.doc_id, coalesce(score_sum, 0) AS score_sum,
        |    coalesce(n_bigrams, 0) AS n_bigrams,
        |    CASE WHEN coalesce(n_bigrams, 0) > 0
        |      THEN cast(coalesce(score_sum, 0) as double) / n_bigrams ELSE -1.0 END AS avg_q
        |  FROM t LEFT JOIN sc ON sc.doc_id = t.doc_id),
        |cuts AS (SELECT quantile_cont(avg_q, 1.0/3) AS c33, quantile_cont(avg_q, 2.0/3) AS c67
        |  FROM w WHERE n_bigrams > 0)
        |SELECT doc_id, n_bigrams, score_sum,
        |  CASE WHEN n_bigrams = 0 THEN 'tail'
        |       WHEN avg_q > c67 THEN 'head'
        |       WHEN avg_q > c33 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM w CROSS JOIN cuts""".stripMargin,

    // dedup-weighted per-source accounting over the exact near-dup clusters
    // (the q32 recursive-CTE labels; singletons get full weight)
    "q93_dedup_weighted" ->
      """WITH RECURSIVE t AS (SELECT doc_id, source,
        |   regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
        |s AS (SELECT doc_id, unnest(list_distinct(
        |   [array_to_string(toks[i:i+2], ' ') FOR i IN generate_series(1, greatest(len(toks) - 2, 0))])) AS sh
        |  FROM t),
        |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |e0 AS (SELECT da, db FROM p JOIN sz x ON p.da = x.doc_id JOIN sz y ON p.db = y.doc_id
        |  WHERE cast(inter as double) / (x.n + y.n - inter) >= 0.5),
        |edges AS (SELECT da AS a, db AS b FROM e0 UNION SELECT db, da FROM e0),
        |nodes AS (SELECT DISTINCT a AS v FROM edges),
        |reach AS (SELECT v AS src, v AS node FROM nodes
        |  UNION SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node),
        |lab AS (SELECT src AS doc_id, min(node) AS cluster_id FROM reach GROUP BY 1),
        |csz AS (SELECT cluster_id, count(*) AS csize FROM lab GROUP BY 1),
        |d AS (SELECT t.doc_id, t.source, cast(len(toks) as bigint) AS token_ct,
        |    1048576 // coalesce(csize, 1) AS w_q
        |  FROM t LEFT JOIN lab ON lab.doc_id = t.doc_id
        |  LEFT JOIN csz ON csz.cluster_id = lab.cluster_id)
        |SELECT source, count(*) AS docs, cast(sum(w_q) as bigint) AS eff_docs_q,
        | cast(sum(token_ct) as bigint) AS total_tokens,
        | cast(sum(token_ct * w_q) as bigint) AS eff_tokens_q
        |FROM d GROUP BY 1""".stripMargin,

    "q80_source_quota" ->
      """WITH t AS (SELECT doc_id, source,
        |  regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
        |s AS (SELECT doc_id, source, cast(len(toks) as bigint) AS token_ct,
        |  (len(toks) BETWEEN 30 AND 400 AND
        |   (CASE WHEN len(toks) = 0 THEN 0.0
        |     ELSE cast(len(list_filter(toks,
        |            t -> t IN ('the','a','of','and','is','to','in'))) as double) / len(toks)
        |    END) <= 0.5) AS good
        | FROM t),
        |r AS (SELECT doc_id, source, token_ct,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY good DESC, token_ct DESC, doc_id) AS rnk FROM s)
        |SELECT doc_id, source, token_ct, cast(rnk as int) AS rnk
        |FROM r WHERE rnk <= 15""".stripMargin,

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
        | cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_base_price,
        | cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2)))) as double) AS sum_disc_price,
        | cast(sum(cast(l_quantity as decimal(18,2))) as double) / count(*) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'""".stripMargin,

    "q03_star_enrichment" ->
      """SELECT r_name, n_name, count(*) AS order_ct,
        | cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS total_revenue,
        | count(distinct o_custkey) AS cust_ct
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q04_order_lines_join" ->
      """SELECT o_orderstatus, count(*) AS line_ct,
        | cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS amount
        |FROM lineitem JOIN orders
        | ON l_orderkey = o_orderkey
        | AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderstatus""".stripMargin,

    "q05_tumbling_window" ->
      """SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS stt,
        | strftime(time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes', '%Y-%m-%d %H:%M:%S') AS edt,
        | event_type, count(*) AS pv_ct,
        | cast(sum(cast(value as decimal(18,2))) as double) AS value_sum
        |FROM events GROUP BY 1, 2, 3""".stripMargin,

    "q06_daily_distinct" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS dt,
        | count(distinct user_id) AS uv, count(*) AS pv,
        | count(*) FILTER (WHERE event_type = 'purchase') AS purchase_ct,
        | cast(sum(CASE WHEN event_type = 'purchase' THEN cast(value as decimal(18,2)) ELSE cast(0 as decimal(18,2)) END) as double) AS purchase_amount
        |FROM events GROUP BY 1""".stripMargin,

    "q07_uv_dedup" ->
      """SELECT dt, user_id, event_id AS first_event_id FROM (
        | SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS dt, user_id, event_id,
        |  row_number() OVER (PARTITION BY date_trunc('day', ts), user_id ORDER BY ts, event_id) AS rn
        | FROM events) WHERE rn = 1""".stripMargin,

    "q08_is_new_repair" ->
      """WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS first_day FROM events GROUP BY 1)
        |SELECT strftime(date_trunc('day', e.ts), '%Y-%m-%d') AS dt,
        | count(*) FILTER (WHERE date_trunc('day', e.ts) = f.first_day) AS new_ct,
        | count(*) FILTER (WHERE date_trunc('day', e.ts) <> f.first_day) AS old_ct
        |FROM events e JOIN f USING (user_id) GROUP BY 1""".stripMargin,

    "q09_bounce_detect" ->
      """WITH s AS (SELECT user_id, ts, event_id,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events)
        |SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS dt, count(*) AS bounce_ct
        |FROM s WHERE nxt IS NULL OR nxt > ts + INTERVAL '30 minutes' GROUP BY 1""".stripMargin,

    "q10_union_stats" ->
      """WITH u AS (
        | SELECT 'interaction' AS stream, event_type, value FROM events WHERE event_type IN ('view', 'click')
        | UNION ALL
        | SELECT 'conversion' AS stream, event_type, value FROM events WHERE event_type = 'purchase')
        |SELECT stream, event_type, count(*) AS ct,
        | cast(sum(cast(value as decimal(18,2))) as double) AS value_sum
        |FROM u GROUP BY 1, 2""".stripMargin,

    "q11_keyword_tokens" ->
      """SELECT keyword, count(*) AS ct, count(distinct doc_id) AS doc_ct FROM (
        | SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS keyword FROM documents)
        |GROUP BY keyword""".stripMargin,

    "q12_unpivot_metrics" ->
      """WITH u AS (
        | SELECT l_returnflag, 'qty' AS metric, cast(l_quantity as decimal(18,2)) AS val FROM lineitem
        | UNION ALL SELECT l_returnflag, 'price', cast(l_extendedprice as decimal(18,2)) FROM lineitem
        | UNION ALL SELECT l_returnflag, 'disc', cast(l_discount as decimal(18,2)) FROM lineitem)
        |SELECT l_returnflag, metric, cast(sum(val) as double) AS total, count(*) AS ct
        |FROM u WHERE val > 0 GROUP BY 1, 2""".stripMargin,

    "q13_config_router" ->
      """SELECT sink_type, sink_table, count(*) AS ct, count(distinct user_id) AS user_ct
        |FROM events e JOIN (VALUES
        |  ('signup', 'dim_users', 'hbase'), ('purchase', 'fact_orders', 'kafka'),
        |  ('click', 'fact_traffic', 'kafka'), ('view', 'fact_traffic', 'kafka'),
        |  ('error', 'side_errors', 'kafka')) cfg(event_type, sink_table, sink_type)
        | ON e.event_type = cfg.event_type
        |GROUP BY 1, 2""".stripMargin,

    "q14_topn_per_nation" ->
      """WITH rev AS (
        | SELECT c_nationkey, o_custkey,
        |  cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS revenue, count(*) AS order_ct
        | FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY c_nationkey ORDER BY revenue DESC, o_custkey) AS rn FROM rev)
        |SELECT n_name, o_custkey AS custkey, revenue, order_ct, cast(rn as int) AS rn
        |FROM rk JOIN nation ON c_nationkey = n_nationkey WHERE rn <= 3""".stripMargin,

    // real JSON field extraction on both sides (Spark get_json_object $.k ↔
    // DuckDB json_extract), not a regex stand-in that only works while the
    // props fixture contains a single number
    "q15_json_props" ->
      """SELECT cast(json_extract_string(props, '$.k') as int) % 10 AS k_bucket, count(*) AS ct,
        | cast(sum(cast(value as decimal(18,2))) as double) AS value_sum
        |FROM events GROUP BY 1""".stripMargin,

    "q16_purchase_view_pairs" ->
      """SELECT strftime(date_trunc('day', p.ts), '%Y-%m-%d') AS dt,
        | count(*) AS pair_ct, count(distinct p.event_id) AS purchase_ct
        |FROM events p JOIN events v
        | ON p.user_id = v.user_id AND p.event_type = 'purchase' AND v.event_type = 'view'
        | AND v.ts BETWEEN p.ts - INTERVAL '30 minutes' AND p.ts
        |GROUP BY 1""".stripMargin,

    "q17_province_stats" ->
      """SELECT n_name AS province_name, count(distinct o_orderkey) AS order_count,
        | cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS order_amount
        |FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,

    "q18_dedup_exact" ->
      """SELECT md5(text) AS fingerprint, count(*) AS dup_ct, min(doc_id) AS keeper_doc_id
        |FROM documents GROUP BY 1""".stripMargin,

    "q19_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents WHERE doc_id < 500),
        |s AS (SELECT doc_id, unnest(list_distinct(
        |   [array_to_string(toks[i:i+2], ' ') FOR i IN generate_series(1, greatest(len(toks) - 2, 0))])) AS sh
        |  FROM t),
        |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT da, db, cast(inter as double) / (x.n + y.n - inter) AS jac
        |FROM p JOIN sz x ON p.da = x.doc_id JOIN sz y ON p.db = y.doc_id
        |WHERE cast(inter as double) / (x.n + y.n - inter) >= 0.5""".stripMargin,

    // containment near-dup (overlap coefficient ≥ 0.8): oracle = the exact
    // full shared-shingle join; the Spark side's prefix-filter candidates +
    // exact verify must reproduce it pair-for-pair (recall is a theorem —
    // pigeonhole over the smaller set's (n−ceil(0.8n)+1)-smallest shingles —
    // and this hash-match is its empirical confirmation). Integer selection
    // test, exact division for the reported cont.
    "q102_containment_pairs" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents WHERE doc_id < 500),
        |s AS (SELECT doc_id, unnest(list_distinct(
        |   [array_to_string(toks[i:i+2], ' ') FOR i IN generate_series(1, greatest(len(toks) - 2, 0))])) AS sh
        |  FROM t),
        |sz AS (SELECT doc_id, cast(count(*) as bigint) AS n FROM s GROUP BY 1),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db, cast(count(*) as bigint) AS inter
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT da, db, inter, least(x.n, y.n) AS n_small,
        |  cast(inter as double) / least(x.n, y.n) AS cont
        |FROM p JOIN sz x ON p.da = x.doc_id JOIN sz y ON p.db = y.doc_id
        |WHERE inter * 100 >= least(x.n, y.n) * 80""".stripMargin,

    // oracle = the exact shingle-Jaccard pair set (q19's SQL, uncapped):
    // LSH banding (16 bands × 4 rows) has MEASURED recall 1.0 on this corpus at
    // both sf0.01 and sf0.1 (and precision 1.0 by construction — every candidate
    // is verified with exact Jaccard), so the expected output IS the exact pair
    // set; any recall loss becomes a driver-visible failure. The general-case
    // recall ≥ 0.9 gate lives in DedupSimilaritySpec. jac values are computed
    // over 64-bit FNV shingle hashes on the Spark side — equal to string-set
    // Jaccard absent hash collisions, which the bit-equality here confirms.
    "q26_minhash_lsh" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, unnest(list_distinct(
        |   [array_to_string(toks[i:i+2], ' ') FOR i IN generate_series(1, greatest(len(toks) - 2, 0))])) AS sh
        |  FROM t),
        |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT da, db, cast(inter as double) / (x.n + y.n - inter) AS jac
        |FROM p JOIN sz x ON p.da = x.doc_id JOIN sz y ON p.db = y.doc_id
        |WHERE cast(inter as double) / (x.n + y.n - inter) >= 0.5""".stripMargin,

    // full SimHash reproduction: the token hash is the first 8 bytes of
    // md5(term) (big-endian ⇒ '0x'+first-16-hex-chars as UBIGINT), votes are
    // tf-weighted per bit, fingerprint bit = votes>0, candidates blocked on
    // the 4 16-bit segments, hamming via bit_count(xor) over the segments —
    // bit-for-bit the Dedup.simhashPairs pipeline, so the driver hash-compares
    // the exact pair set instead of recording no_oracle.
    "q27_simhash_pairs" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |th AS (SELECT doc_id, tf, ('0x' || substr(md5(term), 1, 16))::UBIGINT AS h FROM tf),
        |bits AS (SELECT doc_id, b,
        |    CASE WHEN sum(tf * (2 * cast((h >> b) & 1 AS BIGINT) - 1)) > 0 THEN 1 ELSE 0 END AS v
        |  FROM th, generate_series(0, 63) AS s(b) GROUP BY 1, 2),
        |seg AS (SELECT doc_id, b // 16 AS sg, sum(v * (1::BIGINT << (b % 16))) AS sv
        |  FROM bits GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |  FROM seg a JOIN seg b ON a.sg = b.sg AND a.sv = b.sv AND a.doc_id < b.doc_id),
        |ham AS (SELECT da, db, sum(bit_count(xor(sa.sv, sb.sv))) AS hamming
        |  FROM cand JOIN seg sa ON sa.doc_id = da JOIN seg sb ON sb.doc_id = db AND sb.sg = sa.sg
        |  GROUP BY 1, 2)
        |SELECT da, db, cast(hamming AS int) AS hamming FROM ham WHERE hamming <= 16""".stripMargin,

    // full hyperplane-LSH reproduction: ±1 plane signs from md5("p_d") low
    // bit, dots over floor(x·2²⁰)-quantized components (exact integer sums —
    // no float accumulation order to match), 4-bit bucket + hamming-1
    // multi-probe, exact-cosine re-rank within probed candidates (q23's
    // ranking parity) — bit-for-bit the Similarity.annLsh pipeline
    "q28_ann_lsh" ->
      """WITH pl AS (SELECT p, d,
        |   CASE WHEN ('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR), 1, 2))::INT & 1 = 1
        |        THEN 1 ELSE -1 END AS s
        |  FROM generate_series(0, 3) t1(p), generate_series(0, 63) t2(d)),
        |sg AS (SELECT e.vec_id, pl.p,
        |   sum(cast(floor(e.embedding[pl.d + 1]::DOUBLE * 1048576) as bigint) * pl.s) AS dot
        |  FROM embeddings e, pl GROUP BY 1, 2),
        |bk AS (SELECT vec_id, cast(sum(CASE WHEN dot >= 0 THEN 1 << p ELSE 0 END) as int) AS bucket
        |  FROM sg GROUP BY 1),
        |q AS (SELECT e.vec_id AS query_id, e.embedding AS qv, unnest([b.bucket,
        |    xor(b.bucket, 1), xor(b.bucket, 2), xor(b.bucket, 4), xor(b.bucket, 8)]) AS bucket
        |  FROM embeddings e JOIN bk b USING (vec_id) WHERE e.vec_id < 10),
        |c AS (SELECT e.vec_id AS neighbor_id, e.embedding AS cv, b.bucket
        |  FROM embeddings e JOIN bk b USING (vec_id)),
        |s AS (SELECT query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY list_cosine_similarity(qv, cv) DESC, neighbor_id) AS rnk
        | FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id)
        |SELECT query_id, neighbor_id, cast(rnk as int) AS rnk FROM s WHERE rnk <= 3""".stripMargin,

    // winnowing fingerprints reproduced positionally (see winnowFpCte): the
    // n_fps/min/max profile per doc, 0/null for docs shorter than one gram
    "q29_winnow_fingerprint" ->
      s"""WITH ${winnowFpCte("")},
         |agg AS (SELECT doc_id, count(*) AS n, min(m) AS mn, max(m) AS mx FROM fp GROUP BY 1)
         |SELECT d.doc_id, cast(coalesce(agg.n, 0) as int) AS n_fps, agg.mn AS min_fp, agg.mx AS max_fp
         |FROM d LEFT JOIN agg USING (doc_id)""".stripMargin,

    // connected components as SQL: recursive CTE closure over the exact
    // near-dup pair set (valid because q26's LSH pair set ≡ the exact pair set
    // on this corpus — see q26's note), label = min reachable doc_id. Proves
    // the two-regime clusters() (driver union-find / large-star-small-star)
    // computes real components, not just stable labels.
    "q32_neardup_clusters" ->
      """WITH RECURSIVE t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, unnest(list_distinct(
        |   [array_to_string(toks[i:i+2], ' ') FOR i IN generate_series(1, greatest(len(toks) - 2, 0))])) AS sh
        |  FROM t),
        |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |e0 AS (SELECT da, db FROM p JOIN sz x ON p.da = x.doc_id JOIN sz y ON p.db = y.doc_id
        |  WHERE cast(inter as double) / (x.n + y.n - inter) >= 0.5),
        |edges AS (SELECT da AS a, db AS b FROM e0 UNION SELECT db, da FROM e0),
        |nodes AS (SELECT DISTINCT a AS v FROM edges),
        |reach AS (SELECT v AS src, v AS node FROM nodes
        |  UNION SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node)
        |SELECT src AS doc_id, min(node) AS cluster_id FROM reach GROUP BY 1""".stripMargin,

    // quality-ranked canonical per near-dup cluster: q32's components +
    // (n_chars DESC, doc_id) ranking — keep the longest member, not min id
    "q78_canonical_docs" ->
      """WITH RECURSIVE t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, unnest(list_distinct(
        |   [array_to_string(toks[i:i+2], ' ') FOR i IN generate_series(1, greatest(len(toks) - 2, 0))])) AS sh
        |  FROM t),
        |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |e0 AS (SELECT da, db FROM p JOIN sz x ON p.da = x.doc_id JOIN sz y ON p.db = y.doc_id
        |  WHERE cast(inter as double) / (x.n + y.n - inter) >= 0.5),
        |edges AS (SELECT da AS a, db AS b FROM e0 UNION SELECT db, da FROM e0),
        |nodes AS (SELECT DISTINCT a AS v FROM edges),
        |reach AS (SELECT v AS src, v AS node FROM nodes
        |  UNION SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node),
        |labels AS (SELECT src AS doc_id, min(node) AS cluster_id FROM reach GROUP BY 1),
        |m AS (SELECT l.cluster_id, d.doc_id, d.n_chars,
        |   row_number() OVER (PARTITION BY l.cluster_id
        |     ORDER BY d.n_chars DESC, d.doc_id) AS rn
        |  FROM labels l JOIN documents d USING (doc_id))
        |SELECT cluster_id,
        | min(CASE WHEN rn = 1 THEN doc_id END) AS canonical_doc_id,
        | max(CASE WHEN rn = 1 THEN n_chars END) AS canonical_chars,
        | count(*) AS n_members, cast(sum(n_chars) as bigint) AS total_chars
        |FROM m GROUP BY 1""".stripMargin,

    // self-checking invariant oracle: BOTH engines run their own HLL sketch and
    // their own exact count, and the driver pins the within-tolerance flag —
    // the estimates themselves differ by sketch implementation and are not
    // output. Tolerance 0.15 = 3× Spark's default 5% rsd (measured max error:
    // Spark 9.6% at sf0.1, DuckDB 2.1%).
    "q34_approx_distinct" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS dt,
        | count(distinct user_id) AS uv_exact, count(*) AS pv,
        | abs(cast(approx_count_distinct(user_id) as double) - count(distinct user_id))
        |   / count(distinct user_id) <= 0.15 AS approx_ok
        |FROM events GROUP BY 1""".stripMargin,

    // MOSS-style containment over the winnowing fingerprint sets (key-capped
    // doc_id<500 like the Spark verifier path): shared distinct fingerprints /
    // the smaller set, ≥ 0.5 — small-int division is exact in double on both
    // engines, so containment hash-compares bit-equal
    "q35_winnow_pairs" ->
      s"""WITH ${winnowFpCte("WHERE doc_id < 500")},
         |n AS (SELECT doc_id, count(*) AS nf FROM fp GROUP BY 1),
         |sh AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS s
         |       FROM fp a JOIN fp b ON a.m = b.m AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT da, db, cast(s as double) / least(x.nf, y.nf) AS containment
         |FROM sh JOIN n x ON x.doc_id = da JOIN n y ON y.doc_id = db
         |WHERE cast(s as double) / least(x.nf, y.nf) >= 0.5""".stripMargin,

    // the full cleaning pipeline in SQL: quality filter → exact-dedup keeper
    // (min doc_id per md5) → connected-component losers over the exact near-dup
    // pairs AMONG SURVIVORS (≡ the LSH pairs, per q26's note) → anti-join.
    "q36_clean_corpus" ->
      """WITH RECURSIVE q AS (SELECT doc_id, text, lang, source,
        |    len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token_ct
        |  FROM documents WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 10),
        |k AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM q) WHERE rn = 1),
        |t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM k),
        |s AS (SELECT doc_id, unnest(list_distinct(
        |   [array_to_string(toks[i:i+2], ' ') FOR i IN generate_series(1, greatest(len(toks) - 2, 0))])) AS sh
        |  FROM t),
        |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |e0 AS (SELECT da, db FROM p JOIN sz x ON p.da = x.doc_id JOIN sz y ON p.db = y.doc_id
        |  WHERE cast(inter as double) / (x.n + y.n - inter) >= 0.5),
        |edges AS (SELECT da AS a, db AS b FROM e0 UNION SELECT db, da FROM e0),
        |nodes AS (SELECT DISTINCT a AS v FROM edges),
        |reach AS (SELECT v AS src, v AS node FROM nodes
        |  UNION SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node),
        |lab AS (SELECT src AS doc_id, min(node) AS cluster_id FROM reach GROUP BY 1),
        |losers AS (SELECT doc_id FROM lab WHERE doc_id <> cluster_id)
        |SELECT k.doc_id, k.lang, k.source, cast(k.token_ct as int) AS token_ct
        |FROM k LEFT JOIN losers USING (doc_id) WHERE losers.doc_id IS NULL""".stripMargin,

    // full reproduction of the int8 path in SQL: per-vector symmetric scale,
    // round-half-away quantization, integer dot products (exact in double:
    // 127²·64 partial sums ≪ 2⁵³), the same zero-norm guard and tie-break —
    // every arithmetic step is IEEE-identical, so the ranking hash-matches.
    "q51_quantized_knn" ->
      """WITH e1 AS (SELECT vec_id, embedding,
        |   127.0 / greatest(list_max(list_transform(embedding, x -> abs(cast(x as double)))), 1e-9) AS scale
        | FROM embeddings),
        |e2 AS (SELECT vec_id,
        |   list_transform(embedding, x -> cast(round(cast(x as double) * scale) as int)) AS qv
        | FROM e1),
        |e3 AS (SELECT vec_id, qv, sqrt(cast(list_inner_product(qv, qv) as double)) AS qn FROM e2),
        |q AS (SELECT vec_id AS query_id, qv AS qq, qn AS qqn FROM e3 WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id, qv AS cv, qn AS cn FROM e3),
        |s AS (SELECT query_id, neighbor_id,
        |  CASE WHEN qqn * cn > 0 THEN cast(list_inner_product(qq, cv) as double) / (qqn * cn)
        |       ELSE -2.0 END AS qcos
        | FROM q, c WHERE query_id <> neighbor_id),
        |r AS (SELECT query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id) AS rnk FROM s)
        |SELECT query_id, neighbor_id, cast(rnk as int) AS rnk FROM r WHERE rnk <= 3""".stripMargin,

    "q20_lang_id" ->
      """WITH t AS (SELECT lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
        |  len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS zh_ct FROM documents),
        |s AS (SELECT lang, zh_ct,
        |  len(list_filter(toks, t -> t IN ('the','a','of','and','is','to','in'))) AS en_ct,
        |  len(list_filter(toks, t -> t IN ('el','la','de','los','que','y'))) AS es_ct,
        |  len(list_filter(toks, t -> t IN ('der','die','das','und','ist'))) AS de_ct,
        |  len(list_filter(toks, t -> t IN ('le','les','et','est','une'))) AS fr_ct
        | FROM t)
        |SELECT lang, CASE WHEN zh_ct > 0 THEN 'zh'
        |  WHEN en_ct >= es_ct AND en_ct >= de_ct AND en_ct >= fr_ct THEN 'en'
        |  WHEN es_ct >= de_ct AND es_ct >= fr_ct THEN 'es'
        |  WHEN de_ct >= fr_ct THEN 'de' ELSE 'fr' END AS predicted, count(*) AS ct
        |FROM s GROUP BY 1, 2""".stripMargin,

    "q21_quality_score" ->
      """WITH t AS (SELECT source,
        |  len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token_ct,
        |  CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) = 0 THEN 0.0
        |   ELSE cast(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |          t -> t IN ('the','a','of','and','is','to','in'))) as double)
        |        / len(regexp_extract_all(lower(text), '[a-z0-9]+')) END AS stop_ratio
        | FROM documents)
        |SELECT source, count(*) AS docs, cast(sum(token_ct) as bigint) AS total_tokens,
        | count(*) FILTER (WHERE token_ct BETWEEN 30 AND 400 AND stop_ratio <= 0.5) AS good_ct,
        | cast(sum(token_ct) as double) / count(*) AS avg_tokens
        |FROM t GROUP BY 1""".stripMargin,

    "q22_token_count" ->
      """SELECT lang, count(*) AS docs,
        | cast(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))) as bigint) AS total_bpe_tokens,
        | cast(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))) as double) / count(*) AS avg_bpe_tokens
        |FROM documents GROUP BY 1""".stripMargin,

    "q23_knn_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        |s AS (SELECT query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY list_cosine_similarity(qv, cv) DESC, neighbor_id) AS rnk
        | FROM q, c WHERE query_id <> neighbor_id)
        |SELECT query_id, neighbor_id, cast(rnk as int) AS rnk FROM s WHERE rnk <= 5""".stripMargin,

    "q24_cosine_neardup" ->
      """SELECT a.vec_id AS va, b.vec_id AS vb
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < 500 AND b.vec_id < 500
        | AND a.vec_id < b.vec_id AND list_cosine_similarity(a.embedding, b.embedding) > 0.4""".stripMargin,

    "q25_multimodal_meta" ->
      """SELECT source, count(*) AS n_docs,
        | cast(sum(octet_length(encode(text))) as bigint) AS total_bytes,
        | cast(max(octet_length(encode(text))) as bigint) AS max_bytes
        |FROM documents GROUP BY 1""".stripMargin,

    // q30 (mediaFeatures): per-modality rollup of the REAL decodeMedia over
    // synthBmp/synthWav payloads, replayed numerically from the integer
    // recipes — image f0 is exactly 0/1 (binary 2x2 cells, white luma is
    // exactly 1.0 in IEEE doubles), audio f0 is sqrt(sum/k) over exact
    // 1/16-multiples, min/max are order-free comparisons
    "q30_media_features" ->
      """WITH m AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 64),
        |img AS (SELECT media_id, 'image' AS media_type, 150::BIGINT AS n_bytes,
        |  CASE WHEN (media_id * 31 + (media_id // 5) * 3) % 5 < 2
        |    THEN (1.0)::DOUBLE ELSE (0.0)::DOUBLE END AS f0
        | FROM m),
        |aud0 AS (SELECT media_id, 64 + (media_id % 5) * 16 AS n FROM m),
        |audj AS (SELECT media_id, n, cast(unnest(range(n // 8)) as bigint) AS j FROM aud0),
        |audv AS (SELECT media_id, n,
        |  (((media_id * 31 + (media_id // 5) * 3 + j * 7) % 5) - 2) * (0.25)::DOUBLE AS v FROM audj),
        |aud AS (SELECT media_id, 'audio' AS media_type,
        |  cast(44 + 2 * n as bigint) AS n_bytes,
        |  sqrt(sum(v * v) / (n // 8)) AS f0 FROM audv GROUP BY media_id, n),
        |u AS (SELECT * FROM img UNION ALL SELECT * FROM aud)
        |SELECT media_type, count(*) AS n_media,
        |  cast(sum(n_bytes) as bigint) AS total_bytes,
        |  count(*) AS n_decoded, min(f0) AS f0_min, max(f0) AS f0_max
        |FROM u GROUP BY 1""".stripMargin,

    // the oracle is the UNSALTED query: passing proves the two-stage salted
    // aggregation is value-identical to the plain groupBy
    "q31_salted_agg" ->
      """SELECT event_type, count(*) AS ct,
        | cast(sum(cast(value as decimal(18,2))) as double) AS value_sum
        |FROM events GROUP BY 1""".stripMargin,

    // gaps-and-islands twin of Spark's session_window: new session iff the
    // inactivity gap is >= 30 min (session end exclusive); edt = last + gap
    "q37_sessionize" ->
      """WITH s AS (
        | SELECT user_id, ts, event_id, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (
        | SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS UNBOUNDED PRECEDING) AS sid
        | FROM s)
        |SELECT user_id,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS stt,
        | strftime(max(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS edt,
        | count(*) AS events,
        | cast(sum(cast(value as decimal(18,2))) as double) AS value_sum
        |FROM g GROUP BY user_id, sid""".stripMargin,

    "q38_rollup_revenue" ->
      """SELECT c_mktsegment, o_orderstatus, count(*) AS order_ct,
        | cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY ROLLUP (c_mktsegment, o_orderstatus)""".stripMargin,

    // oracle = plain count(distinct): proves the typed HashSet Aggregator path
    "q40_exact_distinct_agg" ->
      """SELECT event_type, count(distinct user_id) AS distinct_users, count(*) AS ct
        |FROM events GROUP BY 1""".stripMargin,

    // deterministic content-hash sampling: identical md5 on both engines makes
    // the sample membership bit-reproducible (keep ≈ 0x199a/0x10000 ≈ 10%)
    "q41_hash_sample" ->
      """SELECT lang, count(*) AS sampled_docs,
        | cast(sum(n_chars) as bigint) AS sampled_chars
        |FROM documents
        |WHERE substr(md5(cast(doc_id as varchar)), 1, 4) < '199a'
        |GROUP BY 1""".stripMargin,

    // quantile_cont shares percentile()'s linear interpolation bit-for-bit
    "q42_percentiles" ->
      """SELECT event_type, quantile_cont(value, 0.5) AS p50,
        | quantile_cont(value, 0.9) AS p90, quantile_cont(value, 0.99) AS p99
        |FROM events GROUP BY 1""".stripMargin,

    // the q34 self-check pattern for quantile sketches: each engine runs its
    // OWN approximate quantile (different algorithms — raw estimates are not
    // output) against its exact percentile; the oracle pins the exact values
    // and the within-tolerance flags (5% relative + 0.5 absolute)
    "q95_percentile_check" ->
      """SELECT event_type,
        | quantile_cont(value, 0.5) AS p50,
        | quantile_cont(value, 0.9) AS p90,
        | quantile_cont(value, 0.99) AS p99,
        | abs(approx_quantile(value, 0.5) - quantile_cont(value, 0.5))
        |   <= abs(quantile_cont(value, 0.5)) * 0.05 + 0.5 AS ok50,
        | abs(approx_quantile(value, 0.9) - quantile_cont(value, 0.9))
        |   <= abs(quantile_cont(value, 0.9)) * 0.05 + 0.5 AS ok90,
        | abs(approx_quantile(value, 0.99) - quantile_cont(value, 0.99))
        |   <= abs(quantile_cont(value, 0.99)) * 0.05 + 0.5 AS ok99
        |FROM events GROUP BY 1""".stripMargin,

    "q43_grouping_sets" ->
      """SELECT c_mktsegment, o_orderstatus, count(*) AS order_ct,
        | cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus))""".stripMargin,

    "q44_except_customers" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders
        |EXCEPT
        |SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,

    "q45_cube_orders" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS order_ct,
        | cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS revenue
        |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin,

    "q46_ranking_functions" ->
      """SELECT c_mktsegment, c_custkey,
        | cast(rank() OVER w as int) AS rnk,
        | cast(dense_rank() OVER w as int) AS drnk,
        | cast(ntile(4) OVER w as int) AS quartile
        |FROM customer WHERE c_custkey <= 200
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)""".stripMargin,

    // duplicate-2-gram (Gopher-style repetition) rollup: long sums + one
    // double division at the edge on both engines
    "q47_repetition_score" ->
      """WITH t AS (SELECT lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
        |g AS (SELECT lang,
        |  [array_to_string(toks[i:i+1], ' ') FOR i IN generate_series(1, greatest(len(toks) - 1, 0))] AS grams
        | FROM t),
        |m AS (SELECT lang, len(grams) AS total, len(list_distinct(grams)) AS uniq
        | FROM g WHERE len(grams) > 0)
        |SELECT lang, count(*) AS docs,
        | cast(sum(total) as bigint) AS total_2grams,
        | cast(sum(uniq) as bigint) AS uniq_2grams,
        | count(*) FILTER (WHERE cast(uniq as double) / total < 0.6) AS repetitive_ct,
        | 1.0 - cast(sum(uniq) as double) / cast(sum(total) as bigint) AS dup_fraction
        |FROM m GROUP BY 1""".stripMargin,

    // deterministic 3-way split: same md5-threshold membership as q41
    "q48_split_assign" ->
      """SELECT lang,
        | CASE WHEN substr(md5(cast(doc_id as varchar)), 1, 4) < '1999' THEN 'val'
        |      WHEN substr(md5(cast(doc_id as varchar)), 1, 4) < '3333' THEN 'test'
        |      ELSE 'train' END AS split,
        | count(*) AS docs, cast(sum(n_chars) as bigint) AS chars
        |FROM documents GROUP BY 1, 2""".stripMargin,

    // sliding 10min/5min: every event covered by exactly the two panes the
    // unnest enumerates (stt = its 5-min bucket and the one before)
    "q49_sliding_window" ->
      """WITH s AS (
        | SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
        |                time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS w,
        |  event_type, value
        | FROM events)
        |SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS stt,
        | strftime(w + INTERVAL '10 minutes', '%Y-%m-%d %H:%M:%S') AS edt,
        | event_type, count(*) AS pv_ct,
        | cast(sum(cast(value as decimal(18,2))) as double) AS value_sum
        |FROM s GROUP BY 1, 2, 3""".stripMargin,

    // contamination vs the doc_id<20 stand-in benchmark: distinct 5-gram
    // overlap per corpus doc
    "q50_contamination" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(
        |   [array_to_string(toks[i:i+4], ' ') FOR i IN generate_series(1, greatest(len(toks) - 4, 0))])) AS g
        | FROM t),
        |b AS (SELECT DISTINCT g FROM g WHERE doc_id < 20)
        |SELECT g.doc_id, count(*) AS contaminated_grams
        |FROM g JOIN b USING (g)
        |WHERE g.doc_id >= 20
        |GROUP BY 1
        |HAVING count(*) >= 1""".stripMargin,

    // the oracle is DuckDB's NATIVE ASOF JOIN — proving the composed Spark
    // plan (union + forward-fill window) implements real as-of semantics;
    // views are deduped per (user, ts) so the pick is deterministic
    "q52_asof_join" ->
      """WITH v AS (SELECT user_id, ts, max(event_id) AS view_id FROM events
        |  WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.event_id AS purchase_id, v.view_id AS asof_view_id
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts""".stripMargin,

    // the oracle is the UNSALTED join: passing proves the salt-and-replicate
    // join is row-identical to the plain equi-join
    "q53_salted_join" ->
      """SELECT o_orderpriority, count(*) AS line_ct,
        | cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS amount
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    "q54_intersect_customers" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin,

    "q55_order_gaps" ->
      """SELECT o_custkey, o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        | cast(date_diff('day', lag(o_orderdate) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), o_orderdate) as int) AS gap_days
        |FROM orders WHERE o_custkey < 500""".stripMargin,

    // conditional-aggregation twin of Spark's pivot with explicit values —
    // identical static output schema on both engines
    "q56_pivot_events" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS dt,
        | cast(sum(cast(value as decimal(18,2))) FILTER (WHERE event_type = 'view') as double) AS view,
        | cast(sum(cast(value as decimal(18,2))) FILTER (WHERE event_type = 'click') as double) AS click,
        | cast(sum(cast(value as decimal(18,2))) FILTER (WHERE event_type = 'purchase') as double) AS purchase,
        | cast(sum(cast(value as decimal(18,2))) FILTER (WHERE event_type = 'signup') as double) AS signup,
        | cast(sum(cast(value as decimal(18,2))) FILTER (WHERE event_type = 'error') as double) AS error
        |FROM events GROUP BY 1""".stripMargin,

    "q57_profile_documents" ->
      """WITH a AS (SELECT count(*) AS n,
        |  count(text) AS text_nonnull, count(distinct text) AS text_distinct,
        |  cast(min(length(text)) as int) AS text_min_len, cast(max(length(text)) as int) AS text_max_len,
        |  count(lang) AS lang_nonnull, count(distinct lang) AS lang_distinct,
        |  cast(min(length(lang)) as int) AS lang_min_len, cast(max(length(lang)) as int) AS lang_max_len,
        |  count(source) AS source_nonnull, count(distinct source) AS source_distinct,
        |  cast(min(length(source)) as int) AS source_min_len, cast(max(length(source)) as int) AS source_max_len
        | FROM documents)
        |SELECT 'text' AS column_name, n AS n_rows, text_nonnull AS n_nonnull,
        |  text_distinct AS n_distinct, text_min_len AS min_len, text_max_len AS max_len FROM a
        |UNION ALL SELECT 'lang', n, lang_nonnull, lang_distinct, lang_min_len, lang_max_len FROM a
        |UNION ALL SELECT 'source', n, source_nonnull, source_distinct, source_min_len, source_max_len FROM a""".stripMargin,

    // mean/variance from EXACT decimal sums cast to double before dividing —
    // identical IEEE arithmetic on both engines, so the z>3 cut is bit-stable
    "q58_value_outliers" ->
      """WITH st AS (
        | SELECT event_type, count(*) AS n,
        |  sum(cast(value as decimal(18,2))) AS s,
        |  sum(cast(value as decimal(18,2)) * cast(value as decimal(18,2))) AS s2
        | FROM events GROUP BY 1),
        |m AS (SELECT event_type, cast(s as double) / n AS mean,
        |  cast(s2 as double) / n - (cast(s as double) / n) * (cast(s as double) / n) AS variance
        | FROM st)
        |SELECT e.event_type, count(*) AS outlier_ct, count(distinct e.user_id) AS outlier_users
        |FROM events e JOIN m ON e.event_type = m.event_type
        |WHERE abs((cast(cast(e.value as decimal(18,2)) as double) - m.mean) / sqrt(m.variance)) > 3.0
        |GROUP BY 1""".stripMargin,

    // embedding-modality dedup clusters: recursive-CTE components over the
    // EXACT cosine pair graph (the pair set q24 already proves both engines
    // agree on), label = min reachable vec_id
    "q59_embedding_clusters" ->
      """WITH RECURSIVE e0 AS (SELECT a.vec_id AS da, b.vec_id AS db
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id < 500 AND b.vec_id < 500 AND a.vec_id < b.vec_id
        |    AND list_cosine_similarity(a.embedding, b.embedding) > 0.4),
        |edges AS (SELECT da AS a, db AS b FROM e0 UNION SELECT db, da FROM e0),
        |nodes AS (SELECT DISTINCT a AS v FROM edges),
        |reach AS (SELECT v AS src, v AS node FROM nodes
        |  UNION SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node)
        |SELECT src AS vec_id, min(node) AS cluster_id FROM reach GROUP BY 1""".stripMargin,

    // tf/df ranking: exact integer counts, one double division — identical
    // ordering to tf·idf for any monotone idf, bit-stable across engines
    "q60_tfidf_terms" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |r AS (SELECT doc_id, term, tf, df,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY cast(tf as double) / df DESC, term) AS rnk
        |  FROM tf JOIN df USING (term))
        |SELECT doc_id, term, tf, df, cast(rnk as int) AS rnk FROM r WHERE rnk <= 3""".stripMargin,

    // class-capped sampling: min-count K over langs, per-lang md5-rank draw —
    // same engine-stable hash-membership discipline as q41/q48
    "q61_balanced_sample" ->
      """WITH d AS (SELECT lang, doc_id, n_chars, md5(cast(doc_id as varchar)) AS h FROM documents),
        |k AS (SELECT min(n) AS k FROM (SELECT count(*) AS n FROM d GROUP BY lang)),
        |r AS (SELECT lang, n_chars, row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rnk FROM d)
        |SELECT lang, count(*) AS kept_docs, cast(sum(n_chars) as bigint) AS kept_chars
        |FROM r, k WHERE rnk <= k.k GROUP BY 1""".stripMargin,

    // eval-integrity check: near-dup clusters spanning train/test/val splits
    // (q32's recursive-CTE components + q48's split CASE)
    "q62_split_leakage" ->
      """WITH RECURSIVE t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, unnest(list_distinct(
        |   [array_to_string(toks[i:i+2], ' ') FOR i IN generate_series(1, greatest(len(toks) - 2, 0))])) AS sh
        |  FROM t),
        |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |e0 AS (SELECT da, db FROM p JOIN sz x ON p.da = x.doc_id JOIN sz y ON p.db = y.doc_id
        |  WHERE cast(inter as double) / (x.n + y.n - inter) >= 0.5),
        |edges AS (SELECT da AS a, db AS b FROM e0 UNION SELECT db, da FROM e0),
        |nodes AS (SELECT DISTINCT a AS v FROM edges),
        |reach AS (SELECT v AS src, v AS node FROM nodes
        |  UNION SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node),
        |lab AS (SELECT src AS doc_id, min(node) AS cluster_id FROM reach GROUP BY 1),
        |sp AS (SELECT doc_id,
        |  CASE WHEN substr(md5(cast(doc_id as varchar)), 1, 4) < '1999' THEN 'val'
        |       WHEN substr(md5(cast(doc_id as varchar)), 1, 4) < '3333' THEN 'test'
        |       ELSE 'train' END AS split
        | FROM documents)
        |SELECT cluster_id, count(*) AS n_docs, count(distinct split) AS n_splits
        |FROM lab JOIN sp USING (doc_id)
        |GROUP BY 1 HAVING count(distinct split) > 1""".stripMargin,

    // strict ordered funnel: stage N+1 = first qualifying event at or after
    // the joined stage-N time; identical conditional-min chain on both engines
    "q63_session_funnel" ->
      """WITH s AS (
        | SELECT user_id, ts, event_id, event_type,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS UNBOUNDED PRECEDING) AS sid FROM s),
        |a1 AS (SELECT user_id, sid, min(ts) AS s_start,
        |        min(ts) FILTER (WHERE event_type = 'view') AS v
        |       FROM g GROUP BY 1, 2),
        |a2 AS (SELECT g.user_id, g.sid,
        |        min(g.ts) FILTER (WHERE g.event_type = 'click' AND g.ts >= a1.v) AS c
        |       FROM g JOIN a1 USING (user_id, sid) GROUP BY 1, 2),
        |a3 AS (SELECT g.user_id, g.sid,
        |        min(g.ts) FILTER (WHERE g.event_type = 'purchase' AND g.ts >= a2.c) AS p
        |       FROM g JOIN a2 USING (user_id, sid) GROUP BY 1, 2)
        |SELECT strftime(date_trunc('day', a1.s_start), '%Y-%m-%d') AS dt,
        | count(*) AS sessions,
        | count(a1.v) AS view_sessions,
        | count(a2.c) AS view_click_sessions,
        | count(a3.p) AS funnel_sessions
        |FROM a1 JOIN a2 USING (user_id, sid) JOIN a3 USING (user_id, sid)
        |GROUP BY 1""".stripMargin,

    // postings emitted as a joined string (array cells hash differently across
    // engines' parquet readers); numeric sort BEFORE the string cast
    "q64_inverted_index" ->
      """SELECT term, count(*) AS df,
        | array_to_string(list(doc_id ORDER BY doc_id)[1:10], ',') AS postings
        |FROM (SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS term
        |      FROM documents)
        |GROUP BY term""".stripMargin,

    "q65_vocab_top_terms" ->
      """WITH c AS (
        | SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents),
        |a AS (SELECT lang, term, count(*) AS ct FROM c GROUP BY 1, 2),
        |r AS (SELECT lang, term, ct,
        |  row_number() OVER (PARTITION BY lang ORDER BY ct DESC, term) AS rnk FROM a)
        |SELECT lang, term, ct, cast(rnk as int) AS rnk FROM r WHERE rnk <= 5""".stripMargin,

    // every rule is exact-integer arithmetic on both engines (mean word
    // length as 3·words ≤ chars ≤ 10·words; repetition as 2·uniq ≥ total)
    "q66_c4_rule_filter" ->
      """WITH t AS (SELECT doc_id, lower(text) AS lt,
        |   regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
        |s AS (SELECT doc_id, lt, toks,
        |   cast(len(toks) as bigint) AS word_ct,
        |   cast(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) as bigint) AS char_sum,
        |   [array_to_string(toks[i:i+1], ' ') FOR i IN generate_series(1, greatest(len(toks) - 1, 0))] AS grams
        | FROM t),
        |m AS (SELECT doc_id, word_ct, char_sum,
        |   cast(len(grams) as bigint) AS total2,
        |   cast(len(list_distinct(grams)) as bigint) AS uniq2,
        |   (list_contains(toks, 'the') OR list_contains(toks, 'a') OR list_contains(toks, 'of')
        |    OR list_contains(toks, 'to') OR list_contains(toks, 'and')) AS has_stop,
        |   (contains(lt, 'lorem ipsum') OR contains(lt, '{')) AS blocked
        | FROM s)
        |SELECT doc_id, word_ct,
        | word_ct >= 30 AS rule_min_words,
        | (char_sum >= word_ct * 3 AND char_sum <= word_ct * 10) AS rule_word_len,
        | has_stop AS rule_stopword,
        | (total2 = 0 OR uniq2 * 2 >= total2) AS rule_low_repetition,
        | NOT blocked AS rule_no_blocklist,
        | (word_ct >= 30 AND char_sum >= word_ct * 3 AND char_sum <= word_ct * 10
        |  AND has_stop AND (total2 = 0 OR uniq2 * 2 >= total2) AND NOT blocked) AS keep
        |FROM m""".stripMargin,

    // same RE2-compatible pattern strings as TextOps.Pii*; md5 agrees across
    // engines on identical input strings
    "q67_pii_scrub" ->
      """SELECT c_custkey,
        | cast(len(regexp_extract_all(lower(c_name), '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) as bigint) AS n_email,
        | cast(len(regexp_extract_all(lower(c_name), '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) as bigint) AS n_ip,
        | cast(len(regexp_extract_all(lower(c_name), '[0-9]{6,}')) as bigint) AS n_id,
        | regexp_replace(regexp_replace(regexp_replace(lower(c_name),
        |   '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |   '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '[IP]', 'g'),
        |   '[0-9]{6,}', '[ID]', 'g') AS redacted,
        | substr(md5(c_name), 1, 12) AS pseudonym
        |FROM customer""".stripMargin,

    // the oracle IS the single-partition window version the distributed
    // two-pass prefix sum replaces (same token regex as q22)
    "q68_sequence_packing" ->
      """WITH t AS (SELECT doc_id,
        |   cast(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) as bigint) AS n_tokens
        | FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |   coalesce(sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
        | FROM t)
        |SELECT doc_id, n_tokens,
        | cast(tok_before // 512 as bigint) AS seq_id,
        | cast(tok_before % 512 as bigint) AS seq_offset,
        | (tok_before % 512) + n_tokens > 512 AS spans_boundary
        |FROM c""".stripMargin,

    "q39_running_total" ->
      """SELECT o_custkey, o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        | cast(sum(cast(o_totalprice as decimal(18,2))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS run_revenue
        |FROM orders WHERE o_custkey < 500""".stripMargin,

    // span-level dedup scoring: a 10-token span position is duplicated when
    // its text appears in >= 2 distinct docs; small-int division exact
    "q69_span_dedup" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
        |s AS (SELECT doc_id, unnest(
        |   [array_to_string(toks[i:i+9], ' ') FOR i IN generate_series(1, greatest(len(toks) - 9, 0))]) AS g
        |  FROM t),
        |sh AS (SELECT g, count(DISTINCT doc_id) AS nd FROM s GROUP BY 1),
        |d AS (SELECT doc_id, count(*) AS n_spans,
        |   cast(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) as bigint) AS dup_spans
        |  FROM s JOIN sh USING (g) GROUP BY 1)
        |SELECT doc_id, n_spans, dup_spans,
        | cast(dup_spans as double) / n_spans AS dup_frac,
        | cast(dup_spans as double) / n_spans > 0.5 AS cull
        |FROM d""".stripMargin,

    // bigram-rarity fluency: rare = corpus probability < 1/1000, exact in
    // integers (1000*c < total); keep = rare fraction <= 0.25
    "q70_bigram_fluency" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
        |s AS (SELECT doc_id, unnest(
        |   [array_to_string(toks[i:i+1], ' ') FOR i IN generate_series(1, greatest(len(toks) - 1, 0))]) AS bg
        |  FROM t),
        |ct AS (SELECT bg, count(*) AS c FROM s GROUP BY 1),
        |tot AS (SELECT sum(c) AS t FROM ct),
        |d AS (SELECT doc_id, count(*) AS n_bigrams,
        |   cast(sum(CASE WHEN c * 1000 < t THEN 1 ELSE 0 END) as bigint) AS rare_ct
        |  FROM s JOIN ct USING (bg) CROSS JOIN tot GROUP BY 1)
        |SELECT doc_id, n_bigrams, rare_ct,
        | cast(rare_ct as double) / n_bigrams AS rare_frac,
        | cast(rare_ct as double) / n_bigrams <= 0.25 AS keep
        |FROM d""".stripMargin,

    // fixed-size token chunking with overlap (chunk 64, stride 48)
    "q71_chunk_docs" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
        |d AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
        |c AS (SELECT doc_id, toks, n,
        |   unnest(generate_series(0, (greatest(n - 64, 0) + 47) // 48)) AS chunk_idx
        |  FROM d)
        |SELECT doc_id, cast(chunk_idx as int) AS chunk_idx,
        | cast(chunk_idx * 48 as bigint) AS start_tok,
        | cast(least(64, n - chunk_idx * 48) as bigint) AS chunk_len,
        | toks[cast(chunk_idx * 48 + 1 as int)] AS first_term,
        | toks[cast(chunk_idx * 48 + least(64, n - chunk_idx * 48) as int)] AS last_term
        |FROM c""".stripMargin,

    // hard negatives: q23's exact cosine ranking with q59's cluster mates
    // excluded (cluster labels via the same recursive-CTE components)
    "q72_hard_negatives" ->
      """WITH RECURSIVE e0 AS (SELECT a.vec_id AS da, b.vec_id AS db
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id < 500 AND b.vec_id < 500 AND a.vec_id < b.vec_id
        |    AND list_cosine_similarity(a.embedding, b.embedding) > 0.4),
        |edges AS (SELECT da AS a, db AS b FROM e0 UNION SELECT db, da FROM e0),
        |nodes AS (SELECT DISTINCT a AS v FROM edges),
        |reach AS (SELECT v AS src, v AS node FROM nodes
        |  UNION SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node),
        |labels AS (SELECT src AS vec_id, min(node) AS cid FROM reach GROUP BY 1),
        |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        |s AS (SELECT query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY list_cosine_similarity(qv, cv) DESC, neighbor_id) AS rnk
        | FROM q JOIN c ON query_id <> neighbor_id
        | LEFT JOIN labels lq ON lq.vec_id = query_id
        | LEFT JOIN labels lc ON lc.vec_id = neighbor_id
        | WHERE lq.cid IS NULL OR lc.cid IS NULL OR lq.cid <> lc.cid)
        |SELECT query_id, neighbor_id, cast(rnk as int) AS rnk FROM s WHERE rnk <= 5""".stripMargin,

    // incremental-ingestion dedup, batch analog of Dedup.streamingIngest:
    // store = doc_id < max/3, batch = the rest; admitted = store-new
    // fingerprint, first occurrence wins in-batch
    "q74_ingest_dedup" ->
      """WITH d AS (SELECT doc_id, md5(text) AS fingerprint FROM documents),
        |wm AS (SELECT max(doc_id) // 3 AS wm FROM d),
        |s AS (SELECT DISTINCT fingerprint FROM d, wm WHERE doc_id < wm)
        |SELECT fingerprint, min(doc_id) AS admitted_doc_id, count(*) AS batch_dup_ct
        |FROM (SELECT b.fingerprint, b.doc_id FROM d b, wm WHERE b.doc_id >= wm) b
        |ANTI JOIN s USING (fingerprint)
        |GROUP BY 1""".stripMargin,

    // cross-modal dedup audit: q26's exact near-dup pair set joined to both
    // embeddings. The EMITTED cosine must be double-exact, so the oracle
    // spells out Spark's exact composition — dot(a,b)/(sqrt(dot(a,a))*
    // sqrt(dot(b,b))) over DOUBLE[] (DuckDB's list_cosine_similarity on
    // FLOAT[] returns single precision and hash-mismatches). (On this
    // synthetic fixture the embeddings are independent of the text, so
    // modality_agree is uniformly false — the audit correctly reports that
    // the vector modality corroborates nothing; the cos values still vary
    // and hash-compare.)
    "q77_modality_audit" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, unnest(list_distinct(
        |   [array_to_string(toks[i:i+2], ' ') FOR i IN generate_series(1, greatest(len(toks) - 2, 0))])) AS sh
        |  FROM t),
        |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT da, db, cast(inter as double) / (x.n + y.n - inter) AS jac
        |  FROM p JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
        |  WHERE cast(inter as double) / (x.n + y.n - inter) >= 0.5)
        |SELECT da, db, jac,
        | list_inner_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) /
        |  (sqrt(list_inner_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[])) *
        |   sqrt(list_inner_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[]))) AS cos,
        | list_inner_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) /
        |  (sqrt(list_inner_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[])) *
        |   sqrt(list_inner_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[]))) >= 0.4 AS modality_agree
        |FROM pairs JOIN embeddings ea ON ea.vec_id = da
        |JOIN embeddings eb ON eb.vec_id = db""".stripMargin,

    // incremental near-dup admission: exact shingle-Jaccard >= 0.5 pairs
    // CROSSING the store/batch split (valid as the expected LSH output for
    // the same reason as q26: measured recall 1.0 on this corpus, precision
    // 1.0 by construction)
    "q76_ingest_neardup" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, unnest(list_distinct(
        |   [array_to_string(toks[i:i+2], ' ') FOR i IN generate_series(1, greatest(len(toks) - 2, 0))])) AS sh
        |  FROM t),
        |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
        |wm AS (SELECT max(doc_id) // 3 AS wm FROM documents),
        |p AS (SELECT a.doc_id AS store_doc_id, b.doc_id AS batch_doc_id, count(*) AS inter
        |  FROM s a JOIN s b ON a.sh = b.sh CROSS JOIN wm
        |  WHERE a.doc_id < wm AND b.doc_id >= wm GROUP BY 1, 2)
        |SELECT store_doc_id, batch_doc_id,
        | cast(inter as double) / (x.n + y.n - inter) AS jac
        |FROM p JOIN sz x ON store_doc_id = x.doc_id JOIN sz y ON batch_doc_id = y.doc_id
        |WHERE cast(inter as double) / (x.n + y.n - inter) >= 0.5""".stripMargin,

    // boilerplate templates: >=3 docs sharing a verbatim 16-char prefix
    "q75_boilerplate" ->
      """SELECT substr(text, 1, 16) AS prefix, count(*) AS n_docs,
        | count(distinct source) AS n_sources, min(doc_id) AS example_doc_id
        |FROM documents GROUP BY 1 HAVING count(*) >= 3""".stripMargin,

    // BPE merge training, 3 rounds: word-frequency table → per-round pair
    // argmax (count DESC, pair ASC) → greedy left-to-right re-segmentation.
    // The greedy fold is re-derived here as a window-parity construction:
    // within each maximal run of consecutive pair matches, merges start at
    // even offsets (positions 1st, 3rd, … of the run) — provably the same
    // non-overlapping selection as the Spark side's aggregate-HOF fold.
    "q96_bpe_merges" ->
      (s"""WITH t AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
        |w AS (SELECT tok AS word, cast(count(*) as bigint) AS ct
        |  FROM (SELECT unnest(toks) AS tok FROM t) u GROUP BY 1),
        |s0 AS (SELECT word, ct,
        |  [substr(word, i, 1) FOR i IN generate_series(1, length(word))] AS syms FROM w),
        |""" + (1 to 3).map(bpeRound).mkString(",\n") + """
        |SELECT 1 AS round, a AS lhs, b AS rhs, pc AS pair_ct FROM top1
        |UNION ALL SELECT 2, a, b, pc FROM top2
        |UNION ALL SELECT 3, a, b, pc FROM top3""").stripMargin,

    // BPE encoding: the same 3 learned merges applied to the corpus — the
    // generated chain's final segmentation table s3 IS the encoded vocab;
    // output = subword-length distribution per word-type and occurrence
    "q97_bpe_encode" ->
      (s"""WITH t AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
        |w AS (SELECT tok AS word, cast(count(*) as bigint) AS ct
        |  FROM (SELECT unnest(toks) AS tok FROM t) u GROUP BY 1),
        |s0 AS (SELECT word, ct,
        |  [substr(word, i, 1) FOR i IN generate_series(1, length(word))] AS syms FROM w),
        |""" + (1 to 3).map(bpeRound).mkString(",\n") + """
        |SELECT cast(len(syms) as int) AS n_subwords, count(*) AS words,
        | cast(sum(ct) as bigint) AS occurrences
        |FROM s3 GROUP BY 1""").stripMargin,

    // WordPiece induction: the q96 chain with the likelihood argmax —
    // score_q = pc*10^15 // (ct(a)*ct(b)) in HUGEINT, ties lexicographic
    "q98_wordpiece_merges" ->
      (s"""WITH t AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
        |w AS (SELECT tok AS word, cast(count(*) as bigint) AS ct
        |  FROM (SELECT unnest(toks) AS tok FROM t) u GROUP BY 1),
        |s0 AS (SELECT word, ct,
        |  [substr(word, i, 1) FOR i IN generate_series(1, length(word))] AS syms FROM w),
        |""" + (1 to 3).map(wpRound).mkString(",\n") + """
        |SELECT 1 AS round, a AS lhs, b AS rhs, pc AS pair_ct, score_q FROM top1
        |UNION ALL SELECT 2, a, b, pc, score_q FROM top2
        |UNION ALL SELECT 3, a, b, pc, score_q FROM top3""").stripMargin,

    // tokenizer fertility: the q96 chain's final segmentation applied to
    // per-source word occurrences; fertility in exact integer micro units
    "q99_tokenizer_fertility" ->
      (s"""WITH t AS (SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
        |w AS (SELECT tok AS word, cast(count(*) as bigint) AS ct
        |  FROM (SELECT unnest(toks) AS tok FROM t) u GROUP BY 1),
        |s0 AS (SELECT word, ct,
        |  [substr(word, i, 1) FOR i IN generate_series(1, length(word))] AS syms FROM w),
        |""" + (1 to 3).map(bpeRound).mkString(",\n") + """,
        |sw AS (SELECT source, tok AS word, cast(count(*) as bigint) AS ct_src
        |  FROM (SELECT source, unnest(toks) AS tok FROM t) u GROUP BY 1, 2)
        |SELECT source, cast(sum(ct_src) as bigint) AS word_occurrences,
        |  cast(sum(ct_src * len(syms)) as bigint) AS subword_occurrences,
        |  cast(sum(ct_src * length(word)) as bigint) AS char_count,
        |  cast((cast(sum(ct_src * len(syms)) as bigint) * 1000000)
        |    // cast(sum(ct_src) as bigint) as bigint) AS fertility_micro
        |FROM sw JOIN s3 USING (word) GROUP BY 1""").stripMargin,

    // temperature-reweighted source sampling: sqrt-share doc budget, integer
    // 2^20-quantized shares, md5-prefix membership below a 52-bit hex
    // threshold — every step bit-identical to the Spark side
    "q100_temperature_sample" ->
      """WITH st AS (SELECT source, cast(count(*) as bigint) AS n_docs,
        |   cast(floor(sqrt(cast(count(*) as bigint)) * 1048576) as bigint) AS s_q
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT cast(sum(s_q) as bigint) AS s_tot FROM st),
        |thr AS (SELECT source, n_docs,
        |   cast(floor(((cast(1000 as bigint) * s_q) / (s_tot * n_docs)) * 4503599627370496) as bigint) AS t_raw
        |  FROM st, tot),
        |th AS (SELECT source, n_docs,
        |   CASE WHEN t_raw >= 4503599627370496 THEN 'ggggggggggggg'
        |        ELSE printf('%013x', t_raw) END AS thr_hex FROM thr)
        |SELECT d.source, max(th.n_docs) AS n_docs,
        |  cast(count(*) as bigint) AS kept_docs,
        |  cast(sum(d.n_chars) as bigint) AS kept_chars
        |FROM documents d JOIN th ON th.source = d.source
        |WHERE substr(md5(cast(d.doc_id as varchar)), 1, 13) < th.thr_hex
        |GROUP BY 1""".stripMargin,

    // DSIR importance selection: 256 md5 token buckets, add-one-smoothed
    // target/raw ratio per bucket in integer 2^20 units (HUGEINT // =
    // Spark's DECIMAL DIV), per-doc integer score, integer selection test
    "q101_dsir_select" ->
      """WITH t AS (SELECT doc_id, source,
        |   unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM documents),
        |b AS (SELECT doc_id, source, substr(md5(tok), 1, 2) AS bk,
        |   cast(count(*) as bigint) AS tf FROM t GROUP BY 1, 2, 3),
        |bc AS (SELECT bk, cast(sum(tf) as bigint) AS ct_raw,
        |   cast(coalesce(sum(tf) FILTER (WHERE source = 'src0'), 0) as bigint) AS ct_tgt
        |  FROM b GROUP BY 1),
        |tots AS (SELECT cast(sum(ct_raw) as bigint) AS n_raw,
        |   cast(sum(ct_tgt) as bigint) AS n_tgt FROM bc),
        |qv AS (SELECT bk,
        |   cast(((ct_tgt + 1)::HUGEINT * (n_raw + 256) * 1048576)
        |     // ((ct_raw + 1)::HUGEINT * (n_tgt + 256)) as bigint) AS q
        |  FROM bc, tots),
        |ds AS (SELECT doc_id, cast(sum(tf * q) as bigint) AS ss,
        |   cast(sum(tf) as bigint) AS nt
        |  FROM b JOIN qv USING (bk) GROUP BY 1),
        |dd AS (SELECT d.source, coalesce(ds.ss, 0) AS ss, coalesce(ds.nt, 0) AS nt
        |  FROM documents d LEFT JOIN ds ON ds.doc_id = d.doc_id)
        |SELECT source, cast(count(*) as bigint) AS n_docs,
        |  cast(sum(CASE WHEN ss > 1048576 * nt THEN 1 ELSE 0 END) as bigint) AS selected_docs,
        |  cast(sum(CASE WHEN ss > 1048576 * nt THEN nt ELSE 0 END) as bigint) AS selected_tokens,
        |  cast(sum(ss) as bigint) AS sum_score,
        |  cast(sum(nt) as bigint) AS sum_tokens
        |FROM dd GROUP BY 1""".stripMargin,

    // unigram-LM Viterbi scoring: substring-1..4 piece vocab, integer
    // 2^20-quantized log-probs, per-word DP replayed as a RECURSIVE CTE
    // carrying the last 4 dp values as a list (exact integer max at every
    // step — ties in path never change the unique best score)
    "q103_unigram_lm_score" ->
      """WITH RECURSIVE t AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
        |w AS (SELECT tok AS word, cast(count(*) as bigint) AS ct
        |  FROM (SELECT unnest(toks) AS tok FROM t) u GROUP BY 1),
        |pieces AS (SELECT ct, unnest(flatten(
        |   [[substr(word, i, l) FOR i IN generate_series(1, greatest(length(word) - l + 1, 0))]
        |    FOR l IN generate_series(1, 4)])) AS p FROM w),
        |pc AS (SELECT p, cast(sum(ct) as bigint) AS c FROM pieces GROUP BY 1),
        |tot AS (SELECT cast(sum(c) as bigint) AS tc FROM pc),
        |sc AS (SELECT p, cast(floor(ln(c::DOUBLE) * 1048576) as bigint)
        |    - (SELECT cast(floor(ln(tc::DOUBLE) * 1048576) as bigint) FROM tot) AS s FROM pc),
        |m AS (SELECT map(list(p), list(s)) AS mp FROM sc),
        |dp AS (
        |  SELECT word, ct, length(word) AS n, 0 AS i, [0::BIGINT] AS win FROM w
        |  UNION ALL
        |  SELECT word, ct, n, i + 1 AS i,
        |    CASE WHEN len(win) >= 4 THEN (win || [nd])[2:] ELSE win || [nd] END AS win
        |  FROM (
        |    SELECT word, ct, n, i, win,
        |      list_max([win[len(win) - k + 1] + mp[substr(word, i + 2 - k, k)][1]
        |        FOR k IN generate_series(1, least(4, i + 1))]) AS nd
        |    FROM dp, m WHERE i < n) q)
        |SELECT cast(length(word) as int) AS word_len, cast(count(*) as bigint) AS words,
        |  cast(sum(ct) as bigint) AS occurrences,
        |  cast(sum(ct * best) as bigint) AS total_score
        |FROM (SELECT word, ct, win[len(win)] AS best FROM dp WHERE i = n) f
        |GROUP BY 1""".stripMargin,

    // q114 (unigramLmPrune): the q103 forward DP extended to carry the
    // SEGMENTATION — cand is built k-ascending, so list_position(cand, max)
    // is the smallest score-tied k, exactly the Scala side's strict-> argmax;
    // segwin mirrors win as a last-4 window of piece lists. Usage counts,
    // the re-estimated 2^20-quantized log-probs, and the top-48 ranking are
    // all integer-or-total-ordered — bit-exact across engines.
    "q114_unigram_prune" ->
      """WITH RECURSIVE t AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
        |w AS (SELECT tok AS word, cast(count(*) as bigint) AS ct
        |  FROM (SELECT unnest(toks) AS tok FROM t) u GROUP BY 1),
        |pieces AS (SELECT ct, unnest(flatten(
        |   [[substr(word, i, l) FOR i IN generate_series(1, greatest(length(word) - l + 1, 0))]
        |    FOR l IN generate_series(1, 4)])) AS p FROM w),
        |pc AS (SELECT p, cast(sum(ct) as bigint) AS c FROM pieces GROUP BY 1),
        |tot AS (SELECT cast(sum(c) as bigint) AS tc FROM pc),
        |sc AS (SELECT p, cast(floor(ln(c::DOUBLE) * 1048576) as bigint)
        |    - (SELECT cast(floor(ln(tc::DOUBLE) * 1048576) as bigint) FROM tot) AS s FROM pc),
        |m AS (SELECT map(list(p), list(s)) AS mp FROM sc),
        |dp AS (
        |  SELECT word, ct, length(word) AS n, 0 AS i, [0::BIGINT] AS win,
        |    [[]::VARCHAR[]] AS segwin FROM w
        |  UNION ALL
        |  SELECT word, ct, n, i + 1 AS i,
        |    CASE WHEN len(win) >= 4 THEN (win || [nd])[2:] ELSE win || [nd] END AS win,
        |    CASE WHEN len(segwin) >= 4 THEN (segwin || [nseg])[2:] ELSE segwin || [nseg] END AS segwin
        |  FROM (
        |    SELECT word, ct, n, i, win, segwin,
        |      list_max(cand) AS nd,
        |      segwin[len(segwin) - list_position(cand, list_max(cand)) + 1]
        |        || [substr(word, i + 2 - list_position(cand, list_max(cand)),
        |                   list_position(cand, list_max(cand)))] AS nseg
        |    FROM (
        |      SELECT word, ct, n, i, win, segwin,
        |        [win[len(win) - k + 1] + mp[substr(word, i + 2 - k, k)][1]
        |          FOR k IN generate_series(1, least(4, i + 1))] AS cand
        |      FROM dp, m WHERE i < n) q0) q),
        |seg AS (SELECT ct, unnest(segwin[len(segwin)]) AS piece FROM dp WHERE i = n),
        |usg AS (SELECT piece, cast(sum(ct) as bigint) AS usage FROM seg GROUP BY 1),
        |ut AS (SELECT cast(sum(usage) as bigint) AS t FROM usg)
        |SELECT piece, usage,
        |  cast(floor(ln(usage::DOUBLE) * 1048576) as bigint)
        |    - (SELECT cast(floor(ln(t::DOUBLE) * 1048576) as bigint) FROM ut) AS new_score,
        |  cast(rn as int) AS rnk
        |FROM (SELECT piece, usage, row_number() OVER (ORDER BY usage DESC, piece) AS rn
        |      FROM usg) WHERE rn <= 48""".stripMargin,

    // Gopher/MassiveWeb rules: every rule is exact-integer cross-multiplied
    // arithmetic on both engines; top_gram_mass is a max of count·charlen
    // products (tie-free); whitespace classes are the explicit [ \t] (Java
    // \s and RE2 \s disagree on \x0B); the required-stopword set is the
    // q104 binding's corpus-live {the, a}
    "q104_gopher_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |   regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
        |   string_split(text, chr(10)) AS lns FROM documents),
        |s AS (SELECT doc_id, toks,
        |   cast(len(toks) as bigint) AS word_ct,
        |   cast(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) as bigint) AS char_sum,
        |   cast(coalesce(list_sum(list_transform(toks, x -> cast(regexp_matches(x, '[a-z]') as int))), 0) as bigint) AS alpha_ct,
        |   cast(list_contains(toks, 'the') as bigint) + cast(list_contains(toks, 'a') as bigint) AS stop_ct,
        |   cast(len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.')) as bigint) AS symbol_ct,
        |   cast(len(lns) as bigint) AS line_ct,
        |   cast(coalesce(list_sum(list_transform(lns, l -> cast(regexp_matches(l, '^[ \t]*[-*•]') as int))), 0) as bigint) AS bullet_ct,
        |   cast(coalesce(list_sum(list_transform(lns, l -> cast(regexp_matches(l, '\.\.\.[ \t]*$') as int))), 0) as bigint) AS ellipsis_ct,
        |   [array_to_string(toks[i:i+1], ' ') FOR i IN generate_series(1, greatest(len(toks) - 1, 0))] AS grams
        | FROM t),
        |gm AS (SELECT doc_id, gram, cast(count(*) as bigint) AS ct,
        |   cast(length(gram) - 1 as bigint) AS clen
        | FROM (SELECT doc_id, unnest(grams) AS gram FROM s) u GROUP BY 1, 2, 4),
        |mx AS (SELECT doc_id, max(ct * clen) AS top_gram_mass FROM gm GROUP BY 1)
        |SELECT s.doc_id, word_ct, char_sum,
        | cast(coalesce(mx.top_gram_mass, 0) as bigint) AS top_gram_mass,
        | (word_ct >= 50 AND word_ct <= 100000) AS rule_word_count,
        | (char_sum >= word_ct * 3 AND char_sum <= word_ct * 10) AS rule_word_len,
        | (alpha_ct * 5 >= word_ct * 4) AS rule_alpha,
        | (stop_ct >= 2) AS rule_stopwords,
        | (symbol_ct * 10 <= word_ct) AS rule_symbol,
        | (bullet_ct * 10 <= line_ct * 9 AND ellipsis_ct * 10 <= line_ct * 3) AS rule_lines,
        | (coalesce(mx.top_gram_mass, 0) * 5 <= char_sum) AS rule_top_gram,
        | ((word_ct >= 50 AND word_ct <= 100000)
        |  AND (char_sum >= word_ct * 3 AND char_sum <= word_ct * 10)
        |  AND (alpha_ct * 5 >= word_ct * 4) AND (stop_ct >= 2)
        |  AND (symbol_ct * 10 <= word_ct)
        |  AND (bullet_ct * 10 <= line_ct * 9 AND ellipsis_ct * 10 <= line_ct * 3)
        |  AND (coalesce(mx.top_gram_mass, 0) * 5 <= char_sum)) AS keep
        |FROM s LEFT JOIN mx ON s.doc_id = mx.doc_id""".stripMargin,

    // corpus snapshot diff: v1 drops doc_id%5=4, v2 drops doc_id%7=0 and
    // appends ' rev2' to doc_id%3=0; md5-of-text fingerprints and the q22
    // token regex make every class and the delta exact on both engines
    "q105_corpus_diff" ->
      """WITH v1 AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 5 <> 4),
        |v2 AS (SELECT doc_id, source,
        |   CASE WHEN doc_id % 3 = 0 THEN text || ' rev2' ELSE text END AS text
        | FROM documents WHERE doc_id % 7 <> 0),
        |j AS (SELECT coalesce(n.source, o.source) AS source,
        |   CASE WHEN o.doc_id IS NULL THEN 1 ELSE 0 END AS added,
        |   CASE WHEN n.doc_id IS NULL THEN 1 ELSE 0 END AS removed,
        |   CASE WHEN o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL
        |     AND md5(o.text) <> md5(n.text) THEN 1 ELSE 0 END AS changed,
        |   CASE WHEN o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL
        |     AND md5(o.text) = md5(n.text) THEN 1 ELSE 0 END AS unchanged,
        |   coalesce(cast(len(regexp_extract_all(lower(n.text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) as bigint), 0)
        |   - coalesce(cast(len(regexp_extract_all(lower(o.text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) as bigint), 0) AS tok_delta
        | FROM v1 o FULL OUTER JOIN v2 n ON o.doc_id = n.doc_id)
        |SELECT source, cast(sum(added) as bigint) AS n_added,
        | cast(sum(removed) as bigint) AS n_removed,
        | cast(sum(changed) as bigint) AS n_changed,
        | cast(sum(unchanged) as bigint) AS n_unchanged,
        | cast(sum(tok_delta) as bigint) AS token_delta
        |FROM j GROUP BY 1""".stripMargin,

    // token-budget mixture sampling: md5-rank draw per source, exact integer
    // cumsum, keep while cum <= 1000 tokens
    "q73_mixture_sample" ->
      """WITH d AS (SELECT source, doc_id, md5(cast(doc_id as varchar)) AS h,
        |   cast(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) as bigint) AS n_tokens
        |  FROM documents),
        |c AS (SELECT source, n_tokens,
        |   sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id) AS cum FROM d)
        |SELECT source, count(*) AS kept_docs, cast(sum(n_tokens) as bigint) AS kept_tokens
        |FROM c WHERE cum <= 1000 GROUP BY 1""".stripMargin,

    // q123 (recordLinkage): multi-pass blocking + additive Fellegi-Sunter
    // weights; levenshtein is unit-cost on both engines, cents exact
    "q123_record_linkage" ->
      """WITH c AS (SELECT c_custkey AS key, c_name AS name, c_nationkey AS nat,
        |    c_mktsegment AS seg, cast(floor(c_acctbal * 100) as bigint) AS cents
        |  FROM customer),
        |p1 AS (SELECT a.key AS ak, b.key AS bk FROM c a JOIN c b ON a.key < b.key
        |  AND a.nat = b.nat AND a.seg = b.seg
        |  AND floor(a.cents / 10000.0) = floor(b.cents / 10000.0)),
        |p2 AS (SELECT a.key AS ak, b.key AS bk FROM c a JOIN c b ON a.key < b.key
        |  AND a.nat = b.nat AND substr(a.name, -3, 3) = substr(b.name, -3, 3)),
        |cand AS (SELECT DISTINCT ak, bk FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)),
        |s AS (SELECT ak, bk, levenshtein(a.name, b.name) AS lev,
        |   (CASE WHEN levenshtein(a.name, b.name) <= 2 THEN 50 ELSE 0 END)
        | + (CASE WHEN a.nat = b.nat THEN 15 ELSE 0 END)
        | + (CASE WHEN a.seg = b.seg THEN 10 ELSE 0 END)
        | + (CASE WHEN abs(a.cents - b.cents) <= 10000 THEN 10 ELSE 0 END) AS score
        | FROM cand JOIN c a ON a.key = ak JOIN c b ON b.key = bk)
        |SELECT ak AS a_key, bk AS b_key, cast(lev as int) AS lev,
        | cast(score as int) AS score
        |FROM s WHERE score >= 60""".stripMargin,

    // q124 (hybridRrf): q81's integer-quantized BM25 leg at depth 20 +
    // q23's cosine leg, fused by integer RRF floor(1e6/(60+rank))
    "q124_hybrid_rrf" ->
      """WITH qt(query, term) AS (VALUES ('q1','spark'),('q1','join'),
        |  ('q2','table'),('q2','scan'),('q3','window'),('q3','agg')),
        |tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, cast(len(regexp_extract_all(lower(text), '[a-z0-9]+')) as bigint) AS dl
        |  FROM documents),
        |stats AS (SELECT count(*) AS n, cast(sum(dl) as bigint) AS tot FROM dl),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |cc AS (SELECT q.query, f.doc_id,
        |    cast(floor(
        |      (cast(2*(s.n - d.df) + 1 as double) / cast(2*d.df + 1 as double)) *
        |      ((f.tf * 2.2) / (f.tf + 1.2 * (0.25 + 0.75 * (l.dl / (cast(s.tot as double) / s.n))))) *
        |      1048576) as bigint) AS cs
        |  FROM qt q JOIN tf f USING (term) JOIN dft d USING (term)
        |  JOIN dl l ON l.doc_id = f.doc_id CROSS JOIN stats s),
        |sc AS (SELECT query, doc_id, cast(sum(cs) as bigint) AS score_q FROM cc GROUP BY 1, 2),
        |lex AS (SELECT query, doc_id, rnk_lex FROM (SELECT query, doc_id,
        |    row_number() OVER (PARTITION BY query ORDER BY score_q DESC, doc_id) AS rnk_lex
        |  FROM sc) WHERE rnk_lex <= 20),
        |qv AS (SELECT 'q' || vec_id AS query, vec_id AS qid, embedding AS qe
        |  FROM embeddings WHERE vec_id IN (1, 2, 3)),
        |dn AS (SELECT query, doc_id, rnk_vec FROM (SELECT q.query, e.vec_id AS doc_id,
        |    row_number() OVER (PARTITION BY q.query
        |      ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id) AS rnk_vec
        |  FROM qv q, embeddings e WHERE e.vec_id <> q.qid) WHERE rnk_vec <= 20),
        |f AS (SELECT coalesce(l.query, d.query) AS query,
        |    coalesce(l.doc_id, d.doc_id) AS doc_id, l.rnk_lex, d.rnk_vec
        |  FROM lex l FULL OUTER JOIN dn d ON l.query = d.query AND l.doc_id = d.doc_id),
        |g AS (SELECT query, doc_id,
        |    coalesce(cast(floor(1000000 / (60 + rnk_lex)) as bigint), 0)
        |  + coalesce(cast(floor(1000000 / (60 + rnk_vec)) as bigint), 0) AS rrf_score,
        |    rnk_lex IS NOT NULL AS in_lex, rnk_vec IS NOT NULL AS in_vec FROM f),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query
        |    ORDER BY rrf_score DESC, doc_id) AS rnk FROM g)
        |SELECT query, doc_id, rrf_score, cast(rnk as int) AS rnk, in_lex, in_vec
        |FROM r WHERE rnk <= 10""".stripMargin,

    // q125 (clusterSafeSplit): q32's exact-Jaccard components + singleton
    // fallback, split hashed on the CLUSTER id with the q48 thresholds
    "q125_cluster_safe_split" ->
      """WITH RECURSIVE t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, unnest(list_distinct(
        |   [array_to_string(toks[i:i+2], ' ') FOR i IN generate_series(1, greatest(len(toks) - 2, 0))])) AS sh
        |  FROM t),
        |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |e0 AS (SELECT da, db FROM p JOIN sz x ON p.da = x.doc_id JOIN sz y ON p.db = y.doc_id
        |  WHERE cast(inter as double) / (x.n + y.n - inter) >= 0.5),
        |edges AS (SELECT da AS a, db AS b FROM e0 UNION SELECT db, da FROM e0),
        |nodes AS (SELECT DISTINCT a AS v FROM edges),
        |reach AS (SELECT v AS src, v AS node FROM nodes
        |  UNION SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node),
        |lbl AS (SELECT src AS doc_id, min(node) AS cluster_id FROM reach GROUP BY 1),
        |fl AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
        |  FROM documents d LEFT JOIN lbl l ON l.doc_id = d.doc_id)
        |SELECT doc_id, cluster_id,
        | CASE WHEN substr(md5(cast(cluster_id as varchar)), 1, 4) < '1999' THEN 'val'
        |      WHEN substr(md5(cast(cluster_id as varchar)), 1, 4) < '3333' THEN 'test'
        |      ELSE 'train' END AS split
        |FROM fl""".stripMargin,

    // q126 (intervalOverlapJoin): sessions = the q37 gaps-and-islands twin
    // of session_window (en = last + 30 min, half-open); overlap join is the
    // PLAIN inequality join — proving the binned Spark plan loses no pair
    "q126_interval_overlap" ->
      """WITH s0 AS (SELECT user_id, ts, event_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS UNBOUNDED PRECEDING) AS sid FROM s0),
        |s AS (SELECT user_id, min(ts) AS st, max(ts) + INTERVAL '30 minutes' AS en,
        |   count(*) AS events FROM g GROUP BY user_id, sid),
        |h AS (SELECT DISTINCT event_type, date_trunc('hour', ts) AS h FROM events)
        |SELECT s.user_id, strftime(s.st, '%Y-%m-%d %H:%M:%S') AS stt,
        | strftime(s.en, '%Y-%m-%d %H:%M:%S') AS edt, s.events, h.event_type,
        | strftime(h.h, '%Y-%m-%d %H:00:00') AS hour
        |FROM s JOIN h ON h.h < s.en AND s.st < h.h + INTERVAL '1 hour'""".stripMargin,

    // q127 (thetaSketchOverlap): KMV sketch replayed exactly — 52-bit
    // md5-prefix hashes, per-type 1024 smallest, direct theta intersection;
    // the ESTIMATE itself hash-compares (unlike q118's engine-local HLL)
    "q127_theta_sketch" ->
      """WITH el AS (SELECT DISTINCT event_type AS t,
        |    user_id::VARCHAR || '_' || strftime(cast(ts as date), '%Y-%m-%d') AS u
        |  FROM events),
        |hh AS (SELECT t, ('0x' || substr(md5(u), 1, 13))::BIGINT AS h FROM el),
        |r AS (SELECT t, h FROM (SELECT t, h,
        |    row_number() OVER (PARTITION BY t ORDER BY h) AS rn FROM hh) WHERE rn <= 1024),
        |uv AS (SELECT t, count(*) AS uv FROM el GROUP BY 1),
        |th AS (SELECT t, CASE WHEN count(*) < 1024 THEN 4503599627370496
        |    ELSE max(h) END AS theta FROM r GROUP BY 1),
        |pr AS (SELECT a.t AS ta, b.t AS tb, least(a.theta, b.theta) AS theta
        |  FROM th a JOIN th b ON a.t < b.t),
        |cm AS (SELECT a.t AS ta, b.t AS tb, count(*) AS common
        |  FROM r a JOIN r b ON a.h = b.h AND a.t < b.t
        |  JOIN pr ON pr.ta = a.t AND pr.tb = b.t
        |  WHERE a.h < pr.theta GROUP BY 1, 2),
        |ex AS (SELECT a.t AS ta, b.t AS tb, count(*) AS overlap_exact
        |  FROM el a JOIN el b ON a.u = b.u AND a.t < b.t GROUP BY 1, 2)
        |SELECT ex.ta AS type_a, ex.tb AS type_b, ua.uv AS uv_a, ub.uv AS uv_b,
        | cast(coalesce(cm.common, 0) as bigint) AS common,
        | cast(coalesce(cm.common, 0) as double) * 4503599627370496.0
        |   / cast(pr.theta as double) AS est_overlap,
        | ex.overlap_exact,
        | abs(cast(coalesce(cm.common, 0) as double) * 4503599627370496.0
        |   / cast(pr.theta as double) - ex.overlap_exact)
        |   / greatest(ex.overlap_exact, 1) <= 0.15 AS approx_ok
        |FROM ex
        |JOIN pr ON pr.ta = ex.ta AND pr.tb = ex.tb
        |JOIN uv ua ON ua.t = ex.ta JOIN uv ub ON ub.t = ex.tb
        |LEFT JOIN cm ON cm.ta = ex.ta AND cm.tb = ex.tb""".stripMargin,

    // q128 (kAnonRelease): two-level generalization hierarchy — full
    // (nat, seg, band) groups >= k, residuals coarsen to (nat, seg, '*'),
    // what is still < k collapses into the single suppressed row
    "q128_kanon_release" ->
      """WITH c AS (SELECT cast(c_nationkey as bigint) AS nat, c_mktsegment AS seg,
        |    cast(floor(c_acctbal / 1000) as bigint) AS band FROM customer),
        |l0 AS (SELECT nat, seg, band, count(*) AS ct FROM c GROUP BY 1, 2, 3),
        |rel0 AS (SELECT cast(nat as varchar) AS nation, seg AS segment,
        |    cast(band as varchar) AS band, ct AS released, 'full' AS level
        |  FROM l0 WHERE ct >= 10),
        |l1 AS (SELECT nat, seg, cast(sum(ct) as bigint) AS ct FROM l0
        |  WHERE ct < 10 GROUP BY 1, 2),
        |rel1 AS (SELECT cast(nat as varchar) AS nation, seg AS segment,
        |    '*' AS band, ct AS released, 'coarse' AS level FROM l1 WHERE ct >= 10),
        |rel2 AS (SELECT '*' AS nation, '*' AS segment, '*' AS band,
        |    cast(sum(ct) as bigint) AS released, 'suppressed' AS level
        |  FROM l1 WHERE ct < 10 HAVING sum(ct) IS NOT NULL)
        |SELECT * FROM rel0 UNION ALL SELECT * FROM rel1 UNION ALL SELECT * FROM rel2""".stripMargin,

    // q129 (ingestLinkage): arriving rows (custkey % 10 = 0) linked against
    // the stored registry only; best candidate by (score, -lev, -b_key),
    // entity = best store key at threshold else self
    "q129_ingest_linkage" ->
      """WITH c AS (SELECT c_custkey AS key, c_name AS name, c_nationkey AS nat,
        |    c_mktsegment AS seg, cast(floor(c_acctbal * 100) as bigint) AS cents
        |  FROM customer),
        |a AS (SELECT * FROM c WHERE key % 10 = 0),
        |b AS (SELECT * FROM c WHERE key % 10 <> 0),
        |p1 AS (SELECT a.key AS ak, b.key AS bk FROM a JOIN b ON a.nat = b.nat
        |  AND a.seg = b.seg AND floor(a.cents / 10000.0) = floor(b.cents / 10000.0)),
        |p2 AS (SELECT a.key AS ak, b.key AS bk FROM a JOIN b ON a.nat = b.nat
        |  AND substr(a.name, -3, 3) = substr(b.name, -3, 3)),
        |cand AS (SELECT DISTINCT ak, bk FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)),
        |s AS (SELECT ak, bk, levenshtein(a.name, b.name) AS lev,
        |   (CASE WHEN levenshtein(a.name, b.name) <= 2 THEN 50 ELSE 0 END)
        | + (CASE WHEN a.nat = b.nat THEN 15 ELSE 0 END)
        | + (CASE WHEN a.seg = b.seg THEN 10 ELSE 0 END)
        | + (CASE WHEN abs(a.cents - b.cents) <= 10000 THEN 10 ELSE 0 END) AS score
        | FROM cand JOIN a ON a.key = ak JOIN b ON b.key = bk),
        |best AS (SELECT ak, bk, lev, score FROM (SELECT *, row_number() OVER
        |    (PARTITION BY ak ORDER BY score DESC, lev ASC, bk ASC) AS rn FROM s)
        |  WHERE rn = 1)
        |SELECT a.key AS batch_key,
        | CASE WHEN best.score >= 60 THEN best.bk ELSE a.key END AS entity_key,
        | cast(coalesce(best.score, 0) as int) AS best_score,
        | coalesce(best.score, 0) >= 60 AS matched
        |FROM a LEFT JOIN best ON best.ak = a.key""".stripMargin,

    // q130 (entityGroups): connected components over the q123 match pairs,
    // entity = min custkey of the component, singletons = self
    "q130_entity_groups" ->
      """WITH RECURSIVE c AS (SELECT c_custkey AS key, c_name AS name,
        |    c_nationkey AS nat, c_mktsegment AS seg,
        |    cast(floor(c_acctbal * 100) as bigint) AS cents FROM customer),
        |p1 AS (SELECT a.key AS ak, b.key AS bk FROM c a JOIN c b ON a.key < b.key
        |  AND a.nat = b.nat AND a.seg = b.seg
        |  AND floor(a.cents / 10000.0) = floor(b.cents / 10000.0)),
        |p2 AS (SELECT a.key AS ak, b.key AS bk FROM c a JOIN c b ON a.key < b.key
        |  AND a.nat = b.nat AND substr(a.name, -3, 3) = substr(b.name, -3, 3)),
        |cand AS (SELECT DISTINCT ak, bk FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)),
        |s AS (SELECT ak, bk,
        |   (CASE WHEN levenshtein(a.name, b.name) <= 2 THEN 50 ELSE 0 END)
        | + (CASE WHEN a.nat = b.nat THEN 15 ELSE 0 END)
        | + (CASE WHEN a.seg = b.seg THEN 10 ELSE 0 END)
        | + (CASE WHEN abs(a.cents - b.cents) <= 10000 THEN 10 ELSE 0 END) AS score
        | FROM cand JOIN c a ON a.key = ak JOIN c b ON b.key = bk),
        |e0 AS (SELECT ak, bk FROM s WHERE score >= 60),
        |edges AS (SELECT ak AS a, bk AS b FROM e0 UNION SELECT bk, ak FROM e0),
        |nodes AS (SELECT DISTINCT a AS v FROM edges),
        |reach AS (SELECT v AS src, v AS node FROM nodes
        |  UNION SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node),
        |lbl AS (SELECT src AS key, min(node) AS entity FROM reach GROUP BY 1)
        |SELECT c.key AS c_custkey, coalesce(lbl.entity, c.key) AS entity_id
        |FROM c LEFT JOIN lbl ON lbl.key = c.key""".stripMargin,

    // q131 (qualityChecks): Deequ-style constraint report — fused row-local
    // measures + key uniqueness on orders, referential integrity fractions
    // orders->customer and lineitem->orders
    "q131_quality_checks" ->
      """WITH om AS (SELECT count(*) AS sz,
        |    cast(sum(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) as double) / count(*) AS complete_custkey,
        |    cast(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) as double) / count(*) AS status_ok,
        |    cast(sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) as double) / count(*) AS price_positive,
        |    cast(count(DISTINCT o_orderkey) as double) AS dk
        |  FROM orders),
        |ri1 AS (SELECT cast(sum(CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE 0 END) as double)
        |    / count(*) AS m
        |  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o.o_custkey = c.c_custkey),
        |ri2 AS (SELECT cast(sum(CASE WHEN ok.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) as double)
        |    / count(*) AS m
        |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) ok
        |    ON l.l_orderkey = ok.o_orderkey)
        |SELECT 'size_min' AS check, 'orders' AS entity,
        |  cast(sz as double) AS metric, sz >= 1 AS passed FROM om
        |UNION ALL SELECT 'completeness_custkey', 'orders', complete_custkey,
        |  complete_custkey = 1.0 FROM om
        |UNION ALL SELECT 'uniqueness_orderkey', 'orders', dk / sz, dk = sz FROM om
        |UNION ALL SELECT 'compliance_status', 'orders', status_ok, status_ok = 1.0 FROM om
        |UNION ALL SELECT 'range_totalprice', 'orders', price_positive,
        |  price_positive = 1.0 FROM om
        |UNION ALL SELECT 'ri_orders_customer', 'orders', m, m = 1.0 FROM ri1
        |UNION ALL SELECT 'ri_lineitem_orders', 'lineitem', m, m = 1.0 FROM ri2""".stripMargin,

    // q132 (freqItems): Misra-Gries self-check — exact counts over the
    // derived geometric key replay exactly; the sketch flags are
    // theorem-constants (any bound violation would flip them on the Spark
    // side and hash-mismatch)
    "q132_freq_items" ->
      """WITH e AS (SELECT 'lvl_' || cast(
        |   (CASE WHEN event_id % 1024 >= 1 THEN 1 ELSE 0 END)
        | + (CASE WHEN event_id % 1024 >= 2 THEN 1 ELSE 0 END)
        | + (CASE WHEN event_id % 1024 >= 4 THEN 1 ELSE 0 END)
        | + (CASE WHEN event_id % 1024 >= 8 THEN 1 ELSE 0 END)
        | + (CASE WHEN event_id % 1024 >= 16 THEN 1 ELSE 0 END)
        | + (CASE WHEN event_id % 1024 >= 32 THEN 1 ELSE 0 END)
        | + (CASE WHEN event_id % 1024 >= 64 THEN 1 ELSE 0 END)
        | + (CASE WHEN event_id % 1024 >= 128 THEN 1 ELSE 0 END)
        | + (CASE WHEN event_id % 1024 >= 256 THEN 1 ELSE 0 END)
        | + (CASE WHEN event_id % 1024 >= 512 THEN 1 ELSE 0 END) as varchar) AS key
        | FROM events),
        |x AS (SELECT key, count(*) AS exact_ct FROM e GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM e)
        |SELECT x.key, x.exact_ct, n.n,
        | x.exact_ct > cast(n.n as double) / 5 AS guaranteed,
        | TRUE AS presence_ok, TRUE AS bound_ok
        |FROM x, n""".stripMargin,

    // q133 (marketBasket): A-priori pair mining — brand baskets per order,
    // frequent items prune before pairing, exact-integer support ratios
    "q133_market_basket" ->
      """WITH baskets AS (SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS item
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |nb AS (SELECT count(DISTINCT ok) AS n FROM baskets),
        |freq AS (SELECT item, count(*) AS item_ct FROM baskets
        |  GROUP BY 1 HAVING count(*) >= 50),
        |pruned AS (SELECT b.ok, b.item, f.item_ct FROM baskets b
        |  JOIN freq f ON f.item = b.item),
        |pairs AS (SELECT a.item AS item_a, b.item AS item_b,
        |    a.item_ct AS ct_a, b.item_ct AS ct_b, count(*) AS pair_ct
        |  FROM pruned a JOIN pruned b ON a.ok = b.ok AND a.item < b.item
        |  GROUP BY 1, 2, 3, 4 HAVING count(*) >= 50)
        |SELECT item_a, item_b, pair_ct,
        | cast(pair_ct as double) / (SELECT n FROM nb) AS support,
        | cast(pair_ct as double) / ct_a AS confidence,
        | cast(pair_ct as double) * (SELECT n FROM nb)
        |   / cast(ct_a * ct_b as double) AS lift
        |FROM pairs""".stripMargin,

    // q134 (dpRelease): discrete-Laplace noisy counts — noise replayed
    // exactly via trailing zeros of 52-bit md5 integers (geometric(1/2)
    // minus geometric(1/2) = two-sided geometric, epsilon = ln 2)
    "q134_dp_release" -> {
      def tz(h: String) =
        (1 to 52).map(j => s"(CASE WHEN $h % ${1L << j} = 0 THEN 1 ELSE 0 END)")
          .mkString(" + ")
      s"""WITH g AS (SELECT cast(c_nationkey as bigint) AS nation,
         |    c_mktsegment AS segment, count(*) AS true_ct
         |  FROM customer GROUP BY 1, 2),
         |h AS (SELECT nation, segment, true_ct,
         |  ('0x' || substr(md5('dp1_' || cast(nation as varchar) || '_' || segment), 1, 13))::BIGINT AS h1,
         |  ('0x' || substr(md5('dp2_' || cast(nation as varchar) || '_' || segment), 1, 13))::BIGINT AS h2
         |  FROM g)
         |SELECT nation, segment,
         | greatest(true_ct + cast((${tz("h1")}) - (${tz("h2")}) as bigint), 0) AS released,
         | cast(0.6931471805599453 as double) AS epsilon
         |FROM h""".stripMargin
    },

    // q135 (eventTransitions): first-order Markov transition counts and
    // row-normalized probabilities; lead ties break on event_id
    "q135_event_transitions" ->
      """WITH s AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |tr AS (SELECT event_type AS from_type, next_type AS to_type, count(*) AS ct
        |  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, sum(ct) AS from_total FROM tr GROUP BY 1)
        |SELECT tr.from_type, tr.to_type, tr.ct,
        | cast(tr.ct as double) / tot.from_total AS prob
        |FROM tr JOIN tot ON tot.from_type = tr.from_type""".stripMargin,

    // q136 (abTest): md5-coin 50/50 assignment, per-user conversion bit,
    // pooled two-proportion z-test — expression tree mirrored so doubles
    // hash-compare
    "q136_abtest_ztest" ->
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS converted,
        |    CASE WHEN ('0x' || substr(md5('exp1_' || cast(user_id as varchar)), 1, 13))::BIGINT % 2 = 0
        |      THEN 'A' ELSE 'B' END AS arm
        |  FROM events GROUP BY user_id),
        |a AS (SELECT arm, count(*) AS n, sum(converted) AS conv FROM u GROUP BY 1),
        |r AS (SELECT
        |    cast(sum(CASE WHEN arm = 'A' THEN n END) as bigint) AS n_a,
        |    cast(sum(CASE WHEN arm = 'A' THEN conv END) as bigint) AS conv_a,
        |    cast(sum(CASE WHEN arm = 'B' THEN n END) as bigint) AS n_b,
        |    cast(sum(CASE WHEN arm = 'B' THEN conv END) as bigint) AS conv_b
        |  FROM a),
        |z AS (SELECT n_a, conv_a, n_b, conv_b,
        |    cast(conv_a as double) / n_a AS rate_a,
        |    cast(conv_b as double) / n_b AS rate_b,
        |    cast(conv_a + conv_b as double) / (n_a + n_b) AS p
        |  FROM r)
        |SELECT n_a, conv_a, rate_a, n_b, conv_b, rate_b,
        | (rate_a - rate_b) / sqrt(p * (cast(1 as double) - p)
        |   * (cast(1 as double) / n_a + cast(1 as double) / n_b)) AS z_score,
        | abs((rate_a - rate_b) / sqrt(p * (cast(1 as double) - p)
        |   * (cast(1 as double) / n_a + cast(1 as double) / n_b)))
        |   > cast(1.96 as double) AS significant
        |FROM z""".stripMargin,

    // q137 (columnStats): ANALYZE profile via melt — exact stats
    // hash-compare; each engine pins its OWN approx-NDV-vs-exact flag
    // (q34 pattern: raw sketch values never cross engines)
    "q137_column_stats" -> {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice")
      val melt = cols.map(c =>
        s"SELECT '$c' AS col, cast($c as double) AS value FROM lineitem")
        .mkString(" UNION ALL ")
      s"""WITH m AS ($melt)
         |SELECT col, count(value) AS ct, min(value) AS min_val,
         | max(value) AS max_val, count(DISTINCT value) AS ndv,
         | abs(approx_count_distinct(value) - count(DISTINCT value))
         |   <= cast(count(DISTINCT value) as double) * 0.15 AS approx_ok
         |FROM m GROUP BY col""".stripMargin
    },

    // q138 (anomalyZscore): trailing 24h z-score over the q122 gap-filled
    // grid — exact long window sums, mirrored double expression tree
    "q138_anomaly_zscore" ->
      """WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS h,
        |    cast(floor(value * 100) as bigint) AS cents FROM events),
        |counts AS (SELECT event_type, h, count(*) AS ct FROM ev GROUP BY 1, 2),
        |axis AS (SELECT unnest(generate_series((SELECT min(h) FROM ev),
        |    (SELECT max(h) FROM ev), INTERVAL '1 hour')) AS h),
        |grid AS (SELECT t.event_type, strftime(a.h, '%Y-%m-%d %H:00:00') AS hour,
        |    coalesce(c.ct, 0) AS ct
        |  FROM (SELECT DISTINCT event_type FROM counts) t
        |  CROSS JOIN axis a
        |  LEFT JOIN counts c ON c.event_type = t.event_type AND c.h = a.h),
        |win AS (SELECT event_type, hour, ct,
        |    count(*) OVER w AS n,
        |    cast(sum(ct) OVER w as bigint) AS s,
        |    cast(sum(ct * ct) OVER w as bigint) AS ss
        |  FROM grid
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hour
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |sc AS (SELECT event_type, hour, ct,
        |    cast(s as double) / 24 AS mean,
        |    sqrt((cast(ss as double) - cast(s as double) * s / 24) / 23) AS sd
        |  FROM win WHERE n = 24)
        |SELECT event_type, hour, ct, mean,
        | CASE WHEN sd > 0 THEN (cast(ct as double) - mean) / sd END AS z,
        | coalesce(sd > 0 AND abs((cast(ct as double) - mean) / sd) > 3, FALSE)
        |   AS anomaly
        |FROM sc""".stripMargin,

    // q139 (triangleCounts): degree-ordered triangle enumeration over the
    // q133 co-occurrence graph (support >= 0.022), per-node clustering
    "q139_triangle_count" ->
      """WITH baskets AS (SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS item
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |nb AS (SELECT count(DISTINCT ok) AS n FROM baskets),
        |freq AS (SELECT item, count(*) AS item_ct FROM baskets
        |  GROUP BY 1 HAVING count(*) >= 50),
        |pruned AS (SELECT b.ok, b.item FROM baskets b JOIN freq f ON f.item = b.item),
        |pairs AS (SELECT a.item AS a, b.item AS b, count(*) AS pair_ct
        |  FROM pruned a JOIN pruned b ON a.ok = b.ok AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 50),
        |edges AS (SELECT a, b FROM pairs
        |  WHERE cast(pair_ct as double) / (SELECT n FROM nb) >= 0.022),
        |deg AS (SELECT v, count(*) AS d FROM
        |  (SELECT a AS v FROM edges UNION ALL SELECT b FROM edges) GROUP BY 1),
        |dir0 AS (SELECT
        |    CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
        |      THEN e.a ELSE e.b END AS u,
        |    CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
        |      THEN e.b ELSE e.a END AS v
        |  FROM edges e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b),
        |wedges AS (SELECT e1.u, e1.v AS v1, e2.v AS v2
        |  FROM dir0 e1 JOIN dir0 e2 ON e1.u = e2.u AND e1.v < e2.v),
        |und AS (SELECT least(u, v) AS v1, greatest(u, v) AS v2 FROM dir0),
        |tri AS (SELECT w.u, w.v1, w.v2 FROM wedges w
        |  JOIN und c ON c.v1 = w.v1 AND c.v2 = w.v2),
        |pern AS (SELECT v, count(*) AS triangles FROM
        |  (SELECT u AS v FROM tri UNION ALL SELECT v1 FROM tri
        |   UNION ALL SELECT v2 FROM tri) GROUP BY 1)
        |SELECT deg.v AS item, deg.d AS degree,
        | coalesce(pern.triangles, 0) AS triangles,
        | CASE WHEN deg.d >= 2 THEN cast(2.0 as double) * coalesce(pern.triangles, 0)
        |   / cast(deg.d * (deg.d - 1) as double) ELSE cast(0 as double) END
        |   AS clustering
        |FROM deg LEFT JOIN pern ON pern.v = deg.v""".stripMargin,

    // q140 (welchTtest): unequal-variance t-test over exact integer cents
    // moments; mirrored double expression tree incl. Satterthwaite df
    "q140_welch_ttest" ->
      """WITH p AS (SELECT user_id, cast(floor(value * 100) as bigint) AS c,
        |    CASE WHEN ('0x' || substr(md5('exp1_' || cast(user_id as varchar)), 1, 13))::BIGINT % 2 = 0
        |      THEN 'A' ELSE 'B' END AS arm
        |  FROM events WHERE event_type = 'purchase'),
        |a AS (SELECT arm, count(*) AS n, cast(sum(c) as bigint) AS s,
        |    cast(sum(c * c) as bigint) AS ss FROM p GROUP BY 1),
        |r AS (SELECT
        |    cast(sum(CASE WHEN arm = 'A' THEN n END) as bigint) AS n_a,
        |    cast(sum(CASE WHEN arm = 'A' THEN s END) as bigint) AS s_a,
        |    cast(sum(CASE WHEN arm = 'A' THEN ss END) as bigint) AS ss_a,
        |    cast(sum(CASE WHEN arm = 'B' THEN n END) as bigint) AS n_b,
        |    cast(sum(CASE WHEN arm = 'B' THEN s END) as bigint) AS s_b,
        |    cast(sum(CASE WHEN arm = 'B' THEN ss END) as bigint) AS ss_b
        |  FROM a),
        |m AS (SELECT n_a, n_b,
        |    cast(s_a as double) / n_a AS ma, cast(s_b as double) / n_b AS mb,
        |    ((cast(ss_a as double) - cast(s_a as double) * s_a / n_a) / (n_a - 1))
        |      / n_a AS wa,
        |    ((cast(ss_b as double) - cast(s_b as double) * s_b / n_b) / (n_b - 1))
        |      / n_b AS wb
        |  FROM r)
        |SELECT n_a, ma AS mean_cents_a, n_b, mb AS mean_cents_b,
        | (ma - mb) / sqrt(wa + wb) AS t_stat,
        | (wa + wb) * (wa + wb)
        |   / (wa * wa / (n_a - 1) + wb * wb / (n_b - 1)) AS df,
        | abs((ma - mb) / sqrt(wa + wb)) > cast(1.96 as double) AS significant
        |FROM m""".stripMargin,

    // q141 (classifierCalibration): q88's integer score binned fixed-width
    // against the q66 repetition rule as the independent agreement signal
    "q141_calibration" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS n
        |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2),
        |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h, n FROM tf),
        |c AS (SELECT doc_id, cast(h % 64 as int) AS d,
        |    cast(sum(CASE WHEN (h // 64) % 2 = 1 THEN n ELSE -n END) as bigint) AS val
        |  FROM h GROUP BY 1, 2),
        |w AS (SELECT j, (('0x' || substr(md5('w_' || j), 1, 2))::INT % 16) - 8 AS w
        |  FROM (SELECT unnest(generate_series(0, 63)) AS j)),
        |s AS (SELECT t.doc_id, cast(coalesce(sum(w.w * c.val), 0) as bigint) AS score,
        |    CASE WHEN 2 * len(list_distinct(any_value(t.toks))) >= len(any_value(t.toks))
        |      THEN 1 ELSE 0 END AS label
        |  FROM t LEFT JOIN c ON c.doc_id = t.doc_id LEFT JOIN w ON w.j = c.d
        |  GROUP BY t.doc_id),
        |b AS (SELECT min(score) AS lo, max(score) AS hi FROM s),
        |binned AS (SELECT s.doc_id, s.score, s.label,
        |    CASE WHEN b.hi = b.lo THEN 0
        |      ELSE cast(floor(cast((s.score - b.lo) * 10 as double)
        |        / (b.hi - b.lo + 1)) as bigint) END AS bin
        |  FROM s, b)
        |SELECT bin, count(*) AS n,
        | cast(sum(score) as double) / count(*) AS mean_score,
        | cast(sum(label) as double) / count(*) AS agree_rate
        |FROM binned GROUP BY bin""".stripMargin,

    // q142 (mmrRerank): all-integer MMR greedy (lambda = 1/2 => argmax of
    // rel - maxSim), unrolled to 5 selection rounds
    "q142_mmr_rerank" -> {
      def round(k: Int): String = {
        val prev = s"sel${k - 1}"
        s"""p$k AS (SELECT t.query_id, t.cand_id,
           |    t.rel - max(m.sim) AS score
           |  FROM top t
           |  JOIN sims m ON m.query_id = t.query_id AND m.ia = t.cand_id
           |  JOIN $prev s ON s.query_id = m.query_id AND s.cand_id = m.ib
           |  LEFT JOIN $prev x ON x.query_id = t.query_id AND x.cand_id = t.cand_id
           |  WHERE x.cand_id IS NULL
           |  GROUP BY t.query_id, t.cand_id, t.rel),
           |s$k AS (SELECT query_id, cand_id, score FROM (SELECT *,
           |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, cand_id) AS rn
           |  FROM p$k) WHERE rn = 1),
           |sel$k AS (SELECT query_id, cand_id FROM $prev
           |  UNION ALL SELECT query_id, cand_id FROM s$k)""".stripMargin
      }
      s"""WITH e1 AS (SELECT vec_id, embedding,
         |   127.0 / greatest(list_max(list_transform(embedding, x -> abs(cast(x as double)))), 1e-9) AS scale
         | FROM embeddings),
         |e2 AS (SELECT vec_id,
         |   list_transform(embedding, x -> cast(round(cast(x as double) * scale) as int)) AS qv
         | FROM e1),
         |q AS (SELECT vec_id AS query_id, qv AS qq FROM e2 WHERE vec_id < 3),
         |c AS (SELECT vec_id AS cand_id, qv AS cv FROM e2),
         |rel AS (SELECT query_id, cand_id,
         |   cast(list_inner_product(qq, cv) as bigint) AS rel, cv
         | FROM q, c WHERE query_id <> cand_id),
         |top AS (SELECT query_id, cand_id, rel, cv FROM (SELECT *,
         |    row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, cand_id) AS rn
         |  FROM rel) WHERE rn <= 12),
         |sims AS (SELECT a.query_id, a.cand_id AS ia, b.cand_id AS ib,
         |   cast(list_inner_product(a.cv, b.cv) as bigint) AS sim
         | FROM top a JOIN top b
         |   ON a.query_id = b.query_id AND a.cand_id <> b.cand_id),
         |s1 AS (SELECT query_id, cand_id, rel AS score FROM (SELECT *,
         |    row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, cand_id) AS rn
         |  FROM top) WHERE rn = 1),
         |sel1 AS (SELECT query_id, cand_id FROM s1),
         |${round(2)},
         |${round(3)},
         |${round(4)},
         |${round(5)}
         |SELECT query_id, 1 AS rank, cand_id, score AS mmr_score FROM s1
         |UNION ALL SELECT query_id, 2, cand_id, score FROM s2
         |UNION ALL SELECT query_id, 3, cand_id, score FROM s3
         |UNION ALL SELECT query_id, 4, cand_id, score FROM s4
         |UNION ALL SELECT query_id, 5, cand_id, score FROM s5""".stripMargin
    },

    // q143 (dbscan): key-capped quadratic neighbor stage, int L2^2 via
    // three integer dots, components over core-core edges (q130 pattern),
    // border resolved to MIN cluster, noise = -1
    "q143_dbscan" ->
      """WITH RECURSIVE e1 AS (SELECT vec_id, embedding,
        |   127.0 / greatest(list_max(list_transform(embedding, x -> abs(cast(x as double)))), 1e-9) AS scale
        | FROM embeddings WHERE vec_id < 500),
        |e2 AS (SELECT vec_id,
        |   list_transform(embedding, x -> cast(round(cast(x as double) * scale) as int)) AS qv
        | FROM e1),
        |sq AS (SELECT vec_id, qv, cast(list_inner_product(qv, qv) as bigint) AS s FROM e2),
        |pairs AS (SELECT a.vec_id AS va, b.vec_id AS vb
        |  FROM sq a JOIN sq b ON a.vec_id < b.vec_id
        |  WHERE a.s + b.s - 2 * cast(list_inner_product(a.qv, b.qv) as bigint) <= 150000),
        |sym AS (SELECT va, vb FROM pairs UNION ALL SELECT vb, va FROM pairs),
        |nbc AS (SELECT va AS id, count(*) + 1 AS n FROM sym GROUP BY 1),
        |core AS (SELECT id FROM nbc WHERE n >= 4),
        |ce AS (SELECT s.va AS a, s.vb AS b FROM sym s
        |  JOIN core ca ON ca.id = s.va JOIN core cb ON cb.id = s.vb),
        |nodes AS (SELECT DISTINCT a AS v FROM ce),
        |reach AS (SELECT v AS src, v AS node FROM nodes
        |  UNION SELECT r.src, e.b FROM reach r JOIN ce e ON e.a = r.node),
        |lbl AS (SELECT src AS id, min(node) AS cluster_id FROM reach GROUP BY 1),
        |corelbl AS (SELECT c.id, coalesce(l.cluster_id, c.id) AS cluster_id
        |  FROM core c LEFT JOIN lbl l ON l.id = c.id),
        |border AS (SELECT s.va AS id, min(cl.cluster_id) AS cluster_id
        |  FROM sym s JOIN corelbl cl ON cl.id = s.vb
        |  WHERE s.va NOT IN (SELECT id FROM core) GROUP BY 1)
        |SELECT e2.vec_id,
        | CASE WHEN c1.cluster_id IS NOT NULL THEN 'core'
        |      WHEN c2.cluster_id IS NOT NULL THEN 'border'
        |      ELSE 'noise' END AS role,
        | cast(coalesce(c1.cluster_id, c2.cluster_id, -1) as bigint) AS cluster_id
        |FROM e2
        |LEFT JOIN corelbl c1 ON c1.id = e2.vec_id
        |LEFT JOIN border c2 ON c2.id = e2.vec_id""".stripMargin,

    // q144 (groupRegression): closed-form per-nation OLS from exact
    // integer-cents moments (decimal product sums), doubles mirrored
    "q144_group_regression" ->
      """WITH j AS (SELECT cast(c_nationkey as bigint) AS nation,
        |    cast(floor(c_acctbal * 100) as bigint) AS x,
        |    cast(floor(o_totalprice * 100) as bigint) AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |m AS (SELECT nation, count(*) AS n,
        |    cast(sum(x) as bigint) AS sx, cast(sum(y) as bigint) AS sy,
        |    sum(cast(x * x as decimal(38,0))) AS sxx,
        |    sum(cast(x * y as decimal(38,0))) AS sxy,
        |    sum(cast(y * y as decimal(38,0))) AS syy
        |  FROM j GROUP BY 1),
        |d AS (SELECT nation, n,
        |    cast(n as double) AS dn, cast(sx as double) AS dsx,
        |    cast(sy as double) AS dsy, cast(sxx as double) AS dsxx,
        |    cast(sxy as double) AS dsxy, cast(syy as double) AS dsyy
        |  FROM m),
        |f AS (SELECT nation, n,
        |    dn * dsxy - dsx * dsy AS cov,
        |    dn * dsxx - dsx * dsx AS varx,
        |    dn * dsyy - dsy * dsy AS vary, dsx, dsy, dn
        |  FROM d)
        |SELECT nation, n,
        | CASE WHEN varx > 0 THEN cov / varx END AS slope,
        | CASE WHEN varx > 0 THEN (dsy - cov / varx * dsx) / dn END AS intercept,
        | CASE WHEN varx > 0 AND vary > 0 THEN cov * cov / (varx * vary) END AS r2
        |FROM f""".stripMargin,

    // q145 (chiSquare): full r x c grid incl. zero cells, per-cell terms
    // floor(x*2^20)-quantized before the cross-cell sum (commutative)
    "q145_chi_square" ->
      """WITH cells AS (SELECT cast(c_nationkey as bigint) AS nat,
        |    c_mktsegment AS seg, count(*) AS o FROM customer GROUP BY 1, 2),
        |rws AS (SELECT nat, cast(sum(o) as bigint) AS rt FROM cells GROUP BY 1),
        |cls AS (SELECT seg, cast(sum(o) as bigint) AS ct FROM cells GROUP BY 1),
        |tot AS (SELECT cast(sum(o) as bigint) AS n,
        |    count(DISTINCT nat) AS r, count(DISTINCT seg) AS c FROM cells),
        |grid AS (SELECT rws.nat, cls.seg, rws.rt, cls.ct,
        |    coalesce(cells.o, 0) AS o
        |  FROM rws CROSS JOIN cls
        |  LEFT JOIN cells ON cells.nat = rws.nat AND cells.seg = cls.seg),
        |q AS (SELECT cast(floor(
        |    ((cast(o as double) - cast(rt as double) * ct / tot.n)
        |     * (cast(o as double) - cast(rt as double) * ct / tot.n)
        |     / (cast(rt as double) * ct / tot.n)) * 1048576) as bigint) AS qv,
        |    tot.n, tot.r, tot.c
        |  FROM grid, tot)
        |SELECT cast(sum(qv) as double) / 1048576 AS chi2,
        | (r - 1) * (c - 1) AS df,
        | sqrt(cast(sum(qv) as double) / 1048576
        |   / cast(n * least(r - 1, c - 1) as double)) AS cramers_v
        |FROM q GROUP BY n, r, c""".stripMargin,

    // q146 (joinSizeEstimate): CMS inner-product join-size estimate —
    // shared md5 cells make the integer estimate itself hash-compare
    "q146_join_size" ->
      """WITH r4 AS (SELECT unnest(generate_series(0, 3)) AS r),
        |ca AS (SELECT r4.r, substr(md5(cast(r4.r as varchar) || '_' ||
        |      cast(user_id as varchar)), 1, 2) AS b, count(*) AS c
        |  FROM events, r4 WHERE event_type = 'click' GROUP BY 1, 2),
        |cb AS (SELECT r4.r, substr(md5(cast(r4.r as varchar) || '_' ||
        |      cast(user_id as varchar)), 1, 2) AS b, count(*) AS c
        |  FROM events, r4 WHERE event_type = 'purchase' GROUP BY 1, 2),
        |ip AS (SELECT ca.r, cast(sum(ca.c * cb.c) as bigint) AS ip
        |  FROM ca JOIN cb ON ca.r = cb.r AND ca.b = cb.b GROUP BY 1),
        |est AS (SELECT cast(min(ip) as bigint) AS est_size FROM ip),
        |fa AS (SELECT user_id, count(*) AS f FROM events
        |  WHERE event_type = 'click' GROUP BY 1),
        |fb AS (SELECT user_id, count(*) AS f FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |ex AS (SELECT cast(sum(fa.f * fb.f) as bigint) AS exact_size
        |  FROM fa JOIN fb ON fa.user_id = fb.user_id)
        |SELECT ex.exact_size, est.est_size,
        | est.est_size - ex.exact_size AS overcount,
        | est.est_size >= ex.exact_size AS never_under
        |FROM ex, est""".stripMargin,

    // q147 (itemCf): item-item cosine from co-purchase vectors, 2^20
    // quantized ranking, top-5 per item with lexicographic tiebreak
    "q147_item_cf" ->
      """WITH m AS (SELECT o.o_custkey AS u, p.p_brand AS item, count(*) AS ct
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |norms AS (SELECT item, cast(sum(ct * ct) as bigint) AS n2 FROM m GROUP BY 1),
        |co AS (SELECT a.item AS ia, b.item AS ib,
        |    cast(sum(a.ct * b.ct) as bigint) AS dot
        |  FROM m a JOIN m b ON a.u = b.u AND a.item <> b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |s AS (SELECT ia, ib, cast(floor(cast(dot as double)
        |    / (sqrt(cast(na.n2 as double)) * sqrt(cast(nb.n2 as double)))
        |    * 1048576) as bigint) AS q
        |  FROM co JOIN norms na ON na.item = ia JOIN norms nb ON nb.item = ib),
        |r AS (SELECT ia, ib, q,
        |    row_number() OVER (PARTITION BY ia ORDER BY q DESC, ib) AS rn FROM s)
        |SELECT ia AS item, ib AS neighbor, cast(rn as int) AS rnk,
        | cast(q as double) / 1048576 AS cos_q
        |FROM r WHERE rn <= 5""".stripMargin,

    // q148 (aqpEstimate): sampled estimate + CLT interval next to the exact
    // audit — md5-coin sample, exact long moments, mirrored doubles
    "q148_aqp_estimate" ->
      """WITH o AS (SELECT o_orderkey, cast(floor(o_totalprice * 100) as bigint) AS c,
        |   ('0x' || substr(md5('aqp1_' || cast(o_orderkey as varchar)), 1, 13))::BIGINT % 16 = 0
        |     AS in_sample
        |  FROM orders),
        |m AS (SELECT count(*) AS n_exact, cast(sum(c) as bigint) AS s_exact,
        |    cast(sum(CASE WHEN in_sample THEN 1 ELSE 0 END) as bigint) AS n_s,
        |    cast(sum(CASE WHEN in_sample THEN c ELSE 0 END) as bigint) AS s_s,
        |    cast(sum(CASE WHEN in_sample THEN c * c ELSE 0 END) as bigint) AS ss_s
        |  FROM o),
        |f AS (SELECT n_s, n_exact,
        |    cast(s_s as double) / n_s AS mean_s,
        |    cast(s_exact as double) / n_exact AS mean_x,
        |    cast(1.96 as double)
        |      * sqrt((cast(ss_s as double) - cast(s_s as double) * s_s / n_s)
        |          / (n_s - 1)) / sqrt(cast(n_s as double)) AS ci,
        |    cast(s_s as double) * 16 AS est_total, cast(s_exact as double) AS ex_total
        |  FROM m)
        |SELECT n_s AS n_sample, n_exact, mean_s AS est_mean_cents,
        | mean_x AS exact_mean_cents, ci AS ci_half,
        | abs(mean_s - mean_x) <= ci AS mean_in_ci,
        | est_total AS est_total_cents, ex_total AS exact_total_cents,
        | abs(est_total - ex_total) / ex_total AS total_rel_err
        |FROM f""".stripMargin,

    // q149 (skyline): Pareto frontier on (acctbal, lifetime spend) — the
    // oracle is the O(n²) NOT EXISTS dominance definition; the Spark side
    // is the local-then-merge sweep whose output this verifies exactly
    "q149_skyline" ->
      """WITH s AS (SELECT o_custkey, cast(sum(cast(floor(o_totalprice * 100) as bigint)) as bigint) AS sp
        |  FROM orders GROUP BY 1),
        |p AS (SELECT c_custkey AS custkey,
        |    cast(floor(c_acctbal * 100) as bigint) AS bal_cents,
        |    coalesce(s.sp, 0) AS spend_cents
        |  FROM customer LEFT JOIN s ON s.o_custkey = c_custkey)
        |SELECT custkey, bal_cents, spend_cents FROM p q
        |WHERE NOT EXISTS (SELECT 1 FROM p d
        |  WHERE d.bal_cents >= q.bal_cents AND d.spend_cents >= q.spend_cents
        |    AND (d.bal_cents > q.bal_cents OR d.spend_cents > q.spend_cents))""".stripMargin,

    // q150 (kCore): fixed-round peeling unrolled mechanically (deg/rem/alive/
    // edge CTE per round) + the converged audit column — the Spark loop's
    // rounds are mirrored 1:1, so peel_round labels hash-compare exactly.
    // Every CTE is MATERIALIZED: each round references the prior round's
    // frames several times, and DuckDB's default inlining expands that into
    // an exponential scan tree (observed: "too many open files" on the
    // events parquet at ulimit 20000) — the SQL twin of the Spark side's
    // per-round persist+cut
    "q150_kcore" -> {
      val k = 6; val rounds = 6
      val head =
        """WITH slots AS MATERIALIZED (SELECT DISTINCT user_id, event_type, date_trunc('day', ts) AS d FROM events),
          |e0 AS MATERIALIZED (SELECT x.user_id AS a, y.user_id AS b FROM slots x JOIN slots y
          |  ON x.event_type = y.event_type AND x.d = y.d AND x.user_id < y.user_id
          |  GROUP BY 1, 2 HAVING count(*) >= 26),
          |alive0 AS MATERIALIZED (SELECT a AS v FROM e0 UNION SELECT b FROM e0)""".stripMargin
      val steps = (1 to rounds).map { r =>
        s"""deg$r AS MATERIALIZED (SELECT v, count(*) AS dg FROM (SELECT a AS v FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1}) GROUP BY 1),
           |rem$r AS MATERIALIZED (SELECT al.v FROM alive${r - 1} al LEFT JOIN deg$r d ON d.v = al.v WHERE coalesce(d.dg, 0) < $k),
           |alive$r AS MATERIALIZED (SELECT v FROM alive${r - 1} WHERE v NOT IN (SELECT v FROM rem$r)),
           |e$r AS MATERIALIZED (SELECT a, b FROM e${r - 1} WHERE a NOT IN (SELECT v FROM rem$r) AND b NOT IN (SELECT v FROM rem$r))""".stripMargin
      }.mkString(",\n")
      val peels = (1 to rounds)
        .map(r => s"SELECT v, $r AS peel_round FROM rem$r").mkString(" UNION ALL ")
      head + ",\n" + steps + ",\n" +
        s"""fdeg AS MATERIALIZED (SELECT v, count(*) AS dg FROM (SELECT a AS v FROM e$rounds UNION ALL SELECT b FROM e$rounds) GROUP BY 1),
           |conv AS (SELECT count(*) = 0 AS converged FROM alive$rounds al
           |  LEFT JOIN fdeg d ON d.v = al.v WHERE coalesce(d.dg, 0) < $k),
           |pr AS ($peels)
           |SELECT al.v AS user_id, coalesce(pr.peel_round, 0) AS peel_round,
           |  CASE WHEN pr.v IS NULL THEN coalesce(fdeg.dg, 0) ELSE 0 END AS core_degree,
           |  (SELECT converged FROM conv) AS converged
           |FROM alive0 al LEFT JOIN pr ON pr.v = al.v
           |  LEFT JOIN fdeg ON fdeg.v = al.v""".stripMargin
    },

    // q152 (ewmaBurst): scaled-integer EWMA over the q122 gap-filled grid,
    // replayed as a per-type recursive CTE (bigint mul + floor div //)
    "q152_ewma_burst" ->
      """WITH RECURSIVE ev AS (SELECT event_type, date_trunc('hour', ts) AS h FROM events),
        |counts AS (SELECT event_type, h, count(*) AS ct FROM ev GROUP BY 1, 2),
        |axis AS (SELECT unnest(generate_series((SELECT min(h) FROM ev),
        |    (SELECT max(h) FROM ev), INTERVAL '1 hour')) AS h),
        |grid AS (SELECT t.event_type, strftime(a.h, '%Y-%m-%d %H:00:00') AS hour,
        |    cast(coalesce(c.ct, 0) as bigint) AS ct
        |  FROM (SELECT DISTINCT event_type FROM counts) t
        |  CROSS JOIN axis a
        |  LEFT JOIN counts c ON c.event_type = t.event_type AND c.h = a.h),
        |g AS (SELECT event_type, hour, ct,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hour) AS rn FROM grid),
        |rec AS (
        |  SELECT event_type, hour, ct, rn, cast(-1 as bigint) AS prev,
        |    ct * 1048576 AS s FROM g WHERE rn = 1
        |  UNION ALL
        |  SELECT g.event_type, g.hour, g.ct, g.rn, rec.s AS prev,
        |    (g.ct * 1048576 + 3 * rec.s) // 4 AS s
        |  FROM rec JOIN g ON g.event_type = rec.event_type AND g.rn = rec.rn + 1)
        |SELECT event_type, hour, ct, cast(s as double) / 1048576 AS ewma,
        | (prev >= 0 AND ct * 1048576 > 2 * prev AND ct >= 5) AS burst
        |FROM rec""".stripMargin,

    // q151 (kaplanMeier): censoring-aware survival curve — scaled-integer
    // product fold replayed as a recursive CTE (bigint mul + floor div //)
    "q151_kaplan_meier" ->
      """WITH RECURSIVE o AS (SELECT o_custkey, cast(o_orderdate as date) AS d FROM orders),
        |hor AS (SELECT max(d) - 180 AS cut FROM o),
        |sp AS (SELECT o_custkey, min(d) AS fd, max(d) AS ld FROM o GROUP BY 1),
        |cust AS (SELECT cast(date_diff('day', fd, ld) as bigint) AS dur,
        |    CASE WHEN ld <= (SELECT cut FROM hor) THEN 1 ELSE 0 END AS ev FROM sp),
        |life AS (SELECT dur, cast(count(*) as bigint) AS total,
        |    cast(sum(ev) as bigint) AS d_events FROM cust GROUP BY 1),
        |lt AS (SELECT dur, total, d_events,
        |    cast(sum(total) OVER (ORDER BY dur DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS n_risk,
        |    row_number() OVER (ORDER BY dur) AS rn FROM life),
        |rec AS (
        |  SELECT rn, dur, n_risk, d_events, total,
        |    cast((1099511627776 * (n_risk - d_events)) // n_risk as bigint) AS p
        |  FROM lt WHERE rn = 1
        |  UNION ALL
        |  SELECT lt.rn, lt.dur, lt.n_risk, lt.d_events, lt.total,
        |    cast((rec.p * (lt.n_risk - lt.d_events)) // lt.n_risk as bigint) AS p
        |  FROM rec JOIN lt ON lt.rn = rec.rn + 1)
        |SELECT dur AS duration_days, n_risk AS n_at_risk, d_events AS n_events,
        | total - d_events AS n_censored, p AS surv_scaled,
        | cast(p as double) / 1099511627776 AS survival
        |FROM rec""".stripMargin,

    // q153 (hdrQuantiles): integer-exact HDR bucketing replayed 1:1 —
    // msb via length(bin(v)) (both engines' bin() emit no leading zeros),
    // bucket key = lower bound (top-p-bits mask), rank walk as min(lo) over
    // cum >= ceil(q*n/100) on the cumulative-count window
    "q153_hdr_quantiles" ->
      """WITH v AS (SELECT event_type,
        |    greatest(cast(floor(value * 100) as bigint), 1) AS cents FROM events),
        |b AS (SELECT event_type,
        |    cents // (1::BIGINT << greatest(0, length(bin(cents)) - 1 - 5))
        |        * (1::BIGINT << greatest(0, length(bin(cents)) - 1 - 5)) AS lo
        |  FROM v),
        |bk AS (SELECT event_type, lo, count(*) AS ct FROM b GROUP BY 1, 2),
        |cum AS (SELECT event_type, lo, ct,
        |    sum(ct) OVER (PARTITION BY event_type ORDER BY lo) AS cum,
        |    sum(ct) OVER (PARTITION BY event_type) AS n
        |  FROM bk),
        |sel AS (SELECT event_type, cast(max(n) as bigint) AS n,
        |    min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN lo END) AS p50_lo,
        |    min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN lo END) AS p90_lo,
        |    min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN lo END) AS p99_lo
        |  FROM cum GROUP BY 1)
        |SELECT event_type, n,
        |  p50_lo, p50_lo + (1::BIGINT << greatest(0, length(bin(p50_lo)) - 1 - 5)) - 1 AS p50_hi,
        |  p90_lo, p90_lo + (1::BIGINT << greatest(0, length(bin(p90_lo)) - 1 - 5)) - 1 AS p90_hi,
        |  p99_lo, p99_lo + (1::BIGINT << greatest(0, length(bin(p99_lo)) - 1 - 5)) - 1 AS p99_hi,
        |  ((p50_lo + (1::BIGINT << greatest(0, length(bin(p50_lo)) - 1 - 5)) - 1 - p50_lo) * 32 <= p50_lo
        |   AND (p90_lo + (1::BIGINT << greatest(0, length(bin(p90_lo)) - 1 - 5)) - 1 - p90_lo) * 32 <= p90_lo
        |   AND (p99_lo + (1::BIGINT << greatest(0, length(bin(p99_lo)) - 1 - 5)) - 1 - p99_lo) * 32 <= p99_lo) AS width_ok
        |FROM sel""".stripMargin,

    // q154 (sketchRollup): each lattice node computed DIRECTLY (distinct
    // user hashes per slice, k smallest via row_number) — equality with
    // Spark's leaf-merge construction is the KMV union theorem, exercised
    // per node per run; estimates hash-compare (52-bit md5 integers)
    "q154_sketch_rollup" ->
      """WITH el AS (SELECT DISTINCT event_type AS t,
        |    strftime(cast(ts as date), '%Y-%m-%d') AS d, user_id::VARCHAR AS u
        |  FROM events),
        |base AS (SELECT t, d, u, ('0x' || substr(md5(u), 1, 13))::BIGINT AS h FROM el),
        |sl AS (
        |  SELECT 'leaf' AS level, t AS tk, d AS dk, u, h FROM base
        |  UNION ALL SELECT 'type', t, '*', u, h FROM base
        |  UNION ALL SELECT 'day', '*', d, u, h FROM base
        |  UNION ALL SELECT 'all', '*', '*', u, h FROM base),
        |ex AS (SELECT level, tk, dk, count(DISTINCT u) AS exact_uv
        |  FROM sl GROUP BY 1, 2, 3),
        |dh AS (SELECT DISTINCT level, tk, dk, h FROM sl),
        |rk AS (SELECT level, tk, dk, h,
        |    row_number() OVER (PARTITION BY level, tk, dk ORDER BY h) AS rn FROM dh),
        |st AS (SELECT level, tk, dk,
        |    cast(least(count(*), 512) as int) AS retained,
        |    count(*) AS nh,
        |    max(CASE WHEN rn = 512 THEN h END) AS hk
        |  FROM rk GROUP BY 1, 2, 3)
        |SELECT st.level, st.tk AS event_type, st.dk AS day, ex.exact_uv,
        |  st.retained,
        |  CASE WHEN st.nh < 512 THEN 4503599627370496 ELSE st.hk END AS theta_h,
        |  CASE WHEN st.nh < 512 THEN cast(st.retained as double)
        |    ELSE cast(511 as double) * cast(4503599627370496 as double) / cast(st.hk as double) END AS est,
        |  abs(CASE WHEN st.nh < 512 THEN cast(st.retained as double)
        |    ELSE cast(511 as double) * cast(4503599627370496 as double) / cast(st.hk as double) END
        |    - ex.exact_uv) <= greatest(ex.exact_uv, 1) * 0.15 AS approx_ok
        |FROM st JOIN ex ON ex.level = st.level AND ex.tk = st.tk AND ex.dk = st.dk""".stripMargin,
    // q155 (touchAttribution): trailing-24h touch windows replayed as a
    // range join; first/last via row_number over (tsm, eid); linear credit
    // in integer micro-units with the remainder on the last touch
    "q155_attribution" ->
      """WITH e AS (SELECT user_id, event_type AS tp, epoch_us(ts) AS tsm,
        |    event_id AS eid FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |p AS (SELECT user_id, eid, tsm FROM e WHERE tp = 'purchase'),
        |t AS (SELECT user_id, tp, tsm, eid FROM e WHERE tp IN ('view', 'click')),
        |wt AS (SELECT p.eid AS peid, t.tp, t.tsm, t.eid,
        |    row_number() OVER (PARTITION BY p.eid ORDER BY t.tsm, t.eid) AS rn,
        |    count(*) OVER (PARTITION BY p.eid) AS n
        |  FROM p JOIN t ON t.user_id = p.user_id
        |    AND t.tsm >= p.tsm - 86400000000 AND t.tsm < p.tsm),
        |conv AS (SELECT p.eid,
        |    coalesce(max(CASE WHEN w.rn = 1 THEN w.tp END), '(direct)') AS fst,
        |    coalesce(max(CASE WHEN w.rn = w.n THEN w.tp END), '(direct)') AS lst,
        |    coalesce(max(w.n), 0) AS n
        |  FROM p LEFT JOIN wt w ON w.peid = p.eid GROUP BY 1),
        |fc AS (SELECT fst AS tp, count(*) AS first_ct FROM conv GROUP BY 1),
        |lc AS (SELECT lst AS tp, count(*) AS last_ct FROM conv GROUP BY 1),
        |lin AS (
        |  SELECT tp, cast(sum(1000000 // n) as bigint) AS m FROM wt GROUP BY 1
        |  UNION ALL SELECT lst, cast(sum(1000000 - n * (1000000 // n)) as bigint)
        |    FROM conv WHERE n > 0 GROUP BY 1
        |  UNION ALL SELECT '(direct)', cast(1000000 * count(*) as bigint)
        |    FROM conv WHERE n = 0 HAVING count(*) > 0),
        |li AS (SELECT tp, cast(sum(m) as bigint) AS linear_micro FROM lin GROUP BY 1)
        |SELECT coalesce(fc.tp, lc.tp, li.tp) AS event_type,
        |  coalesce(first_ct, 0) AS first_ct, coalesce(last_ct, 0) AS last_ct,
        |  coalesce(linear_micro, 0) AS linear_micro
        |FROM fc
        |FULL JOIN lc ON lc.tp = fc.tp
        |FULL JOIN li ON li.tp = coalesce(fc.tp, lc.tp)""".stripMargin,

    // q156 (pitJoin): SCD2 intervals rebuilt with the same lag-collapse +
    // lead windows on RAW timestamps, then the point-in-time containment
    // join (vf <= ts < vt); unmatched purchases resolve to ('unknown', 0)
    "q156_pit_join" ->
      """WITH log AS (SELECT user_id, event_type AS state, ts, event_id
        |  FROM events WHERE event_type <> 'purchase'),
        |ch AS (SELECT user_id, state, ts, event_id,
        |    lag(state) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM log),
        |fl AS (SELECT user_id, state, ts AS vf,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt,
        |    cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) as int) AS version
        |  FROM ch WHERE prev IS NULL OR prev <> state),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |  coalesce(f.state, 'unknown') AS state, coalesce(f.version, 0) AS version
        |FROM p LEFT JOIN fl f ON f.user_id = p.user_id
        |  AND f.vf <= p.ts AND (f.vt IS NULL OR p.ts < f.vt)""".stripMargin,

    // q157 (bradleyTerry): the MM iterations unrolled mechanically (denom/
    // update/renorm CTE triple per iteration, all integer // in the same
    // canonical order as the Spark fold); MATERIALIZED because each q{t} is
    // referenced three times by iteration t+1 (the q150 inlining lesson)
    "q157_bradley_terry" -> {
      val iters = 10; val S = "1048576"
      val head =
        s"""WITH act AS (SELECT user_id, date_trunc('day', ts) AS d,
           |    event_type AS tp, count(*) AS ct FROM events GROUP BY 1, 2, 3),
           |mm AS (SELECT CASE WHEN a.ct > b.ct THEN a.tp ELSE b.tp END AS winner,
           |    CASE WHEN a.ct > b.ct THEN b.tp ELSE a.tp END AS loser
           |  FROM act a JOIN act b ON a.user_id = b.user_id AND a.d = b.d AND a.tp < b.tp
           |  WHERE a.ct <> b.ct),
           |wins AS MATERIALIZED (SELECT winner, loser, count(*) AS w FROM mm GROUP BY 1, 2),
           |nij AS MATERIALIZED (SELECT i, j, cast(sum(w) as bigint) AS n FROM (
           |    SELECT winner AS i, loser AS j, w FROM wins
           |    UNION ALL SELECT loser, winner, w FROM wins) GROUP BY 1, 2),
           |ty AS MATERIALIZED (SELECT t.tp, coalesce(wi.w, 0) AS wi, coalesce(mi.n, 0) AS mi
           |  FROM (SELECT DISTINCT event_type AS tp FROM events) t
           |  LEFT JOIN (SELECT winner AS tp, cast(sum(w) as bigint) AS w FROM wins GROUP BY 1) wi ON wi.tp = t.tp
           |  LEFT JOIN (SELECT i AS tp, cast(sum(n) as bigint) AS n FROM nij GROUP BY 1) mi ON mi.tp = t.tp),
           |kk AS (SELECT count(*) AS k FROM ty),
           |q0 AS (SELECT tp, $S::BIGINT AS p FROM ty)""".stripMargin
      val steps = (1 to iters).map { t =>
        s"""d$t AS MATERIALIZED (SELECT n.i AS tp,
           |    cast(sum((n.n * $S * $S) // (pi.p + pj.p)) as bigint) AS den
           |  FROM nij n JOIN q${t - 1} pi ON pi.tp = n.i JOIN q${t - 1} pj ON pj.tp = n.j
           |  GROUP BY 1),
           |m$t AS MATERIALIZED (SELECT ty.tp, cast(CASE WHEN coalesce(d.den, 0) = 0 THEN p.p
           |    ELSE (ty.wi * $S * $S) // d.den END as bigint) AS p
           |  FROM ty JOIN q${t - 1} p ON p.tp = ty.tp LEFT JOIN d$t d ON d.tp = ty.tp),
           |q$t AS MATERIALIZED (SELECT tp,
           |    cast((p * (SELECT k FROM kk) * $S) // (SELECT sum(p) FROM m$t) as bigint) AS p
           |  FROM m$t)""".stripMargin
      }.mkString(",\n")
      head + ",\n" + steps + "\n" +
        s"""SELECT ty.tp AS event_type, ty.wi AS wins, ty.mi AS matches,
           |  q.p AS strength_scaled, cast(q.p as double) / $S AS strength,
           |  cast(row_number() OVER (ORDER BY q.p DESC, ty.tp) as int) AS rank
           |FROM ty JOIN q$iters q ON q.tp = ty.tp""".stripMargin
    },

    // q158 (trendingScores): anchored dyadic decay replayed with the same
    // integer shifts over absolute (Monday-epoch) weeks, re-anchored to the
    // observed span; score is the exact dyadic raw/2^span
    "q158_trending" ->
      """WITH c AS (SELECT cast(json_extract_string(props, '$.k') as int) AS item,
        |    date_diff('day', DATE '1970-01-05', date_trunc('day', ts)) // 7 AS w,
        |    count(*) AS ct FROM events GROUP BY 1, 2),
        |b AS (SELECT min(w) AS w0, max(w) AS w1 FROM c),
        |s AS (SELECT item, cast(sum(ct) as bigint) AS total_ct,
        |    cast(sum(ct * (1::BIGINT << cast(c.w - b.w0 as int))) as bigint) AS raw_scaled,
        |    max(b.w1 - b.w0) AS maxw
        |  FROM c, b GROUP BY 1)
        |SELECT item, total_ct, raw_scaled,
        |  cast(raw_scaled as double)
        |    / cast((1::BIGINT << cast(maxw as int)) as double) AS score,
        |  cast(raw_scaled as double)
        |    / cast((1::BIGINT << cast(maxw as int)) as double)
        |    <= cast(total_ct as double) AS bound_ok,
        |  cast(row_number() OVER (ORDER BY raw_scaled DESC, item) as int) AS rank
        |FROM s""".stripMargin,

    // q159 (hierarchyFlatten): the parent chain walked one level at a time
    // by a recursive CTE — equality with Spark's pointer-doubling is the
    // log-rounds construction being proved against the sequential walk;
    // converged mirrors the audit (rounds=4 covers depth 16)
    "q159_hierarchy" ->
      """WITH RECURSIVE walk AS (
        |  SELECT p_partkey AS k, p_partkey AS cur, 0::BIGINT AS d FROM part
        |  UNION ALL
        |  SELECT k, cur // 10, d + 1 FROM walk WHERE cur > 9)
        |SELECT k AS p_partkey, cur AS root, d AS depth,
        |  (SELECT max(d) <= 16 FROM walk WHERE cur <= 9) AS converged
        |FROM walk WHERE cur <= 9""".stripMargin,

    // q160 (rfmSegments): HDR-bucket quintile boundaries replayed via
    // cumulative-count windows; scores compare bucket-lo vs boundary-lo
    // exactly as the Spark side does
    "q160_rfm" -> {
      def lo(c: String) =
        s"$c // (1::BIGINT << greatest(0, length(bin($c)) - 1 - 5))" +
          s" * (1::BIGINT << greatest(0, length(bin($c)) - 1 - 5))"
      def bcte(mt: String) =
        s"""${mt}bk AS (SELECT lo, count(*) AS ct
           |  FROM (SELECT ${lo(mt)} AS lo FROM cust) GROUP BY 1),
           |${mt}cm AS (SELECT lo, sum(ct) OVER (ORDER BY lo) AS cum,
           |    sum(ct) OVER () AS n FROM ${mt}bk),
           |${mt}bd AS (SELECT
           |    min(CASE WHEN cum >= (n + 4) // 5 THEN lo END) AS b1,
           |    min(CASE WHEN cum >= (2 * n + 4) // 5 THEN lo END) AS b2,
           |    min(CASE WHEN cum >= (3 * n + 4) // 5 THEN lo END) AS b3,
           |    min(CASE WHEN cum >= (4 * n + 4) // 5 THEN lo END) AS b4
           |  FROM ${mt}cm)""".stripMargin
      def sc(mt: String) =
        s"1 + CASE WHEN ${lo(mt)} > ${mt}bd.b1 THEN 1 ELSE 0 END" +
          s" + CASE WHEN ${lo(mt)} > ${mt}bd.b2 THEN 1 ELSE 0 END" +
          s" + CASE WHEN ${lo(mt)} > ${mt}bd.b3 THEN 1 ELSE 0 END" +
          s" + CASE WHEN ${lo(mt)} > ${mt}bd.b4 THEN 1 ELSE 0 END"
      s"""WITH cust AS (SELECT o_custkey AS ck,
         |    cast(date_diff('day', max(cast(o_orderdate as date)),
         |      (SELECT max(cast(o_orderdate as date)) FROM orders)) + 1 as bigint) AS r,
         |    count(*) AS f,
         |    cast(sum(cast(floor(o_totalprice * 100) as bigint)) as bigint) AS m
         |  FROM orders GROUP BY 1),
         |${bcte("r")},
         |${bcte("f")},
         |${bcte("m")}
         |SELECT custkey, recency_days, frequency, monetary_cents,
         |  r_score, f_score, m_score,
         |  cast(r_score * 100 + f_score * 10 + m_score as int) AS rfm
         |FROM (SELECT ck AS custkey, r AS recency_days, f AS frequency,
         |    m AS monetary_cents,
         |    cast(6 - (${sc("r")}) as int) AS r_score,
         |    cast(${sc("f")} as int) AS f_score,
         |    cast(${sc("m")} as int) AS m_score
         |  FROM cust, rbd, fbd, mbd)""".stripMargin
    },

    // q161 (journeyPaths): per-(user, day) ordered type path (ties on
    // event_id), capped at 8 steps, counted; top-50 by (journeys, path)
    "q161_journeys" ->
      """WITH j AS (SELECT user_id, date_trunc('day', ts) AS d,
        |    string_agg(event_type, '>' ORDER BY epoch_us(ts), event_id) FILTER (
        |      WHERE rn <= 8) AS path
        |  FROM (SELECT user_id, ts, event_id, event_type,
        |      row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
        |        ORDER BY epoch_us(ts), event_id) AS rn
        |    FROM events)
        |  GROUP BY 1, 2),
        |p AS (SELECT path, count(*) AS journeys,
        |    count(DISTINCT user_id) AS users FROM j GROUP BY 1)
        |SELECT path, journeys, users,
        |  cast(row_number() OVER (ORDER BY journeys DESC, path) as int) AS rank
        |FROM p QUALIFY rank <= 50""".stripMargin,

    // q162 (rankMovers): last-full-week vs prior-week item counts off one
    // scan; row_number ranks on (ct desc, item); absent weeks count 0
    "q162_rank_movers" ->
      """WITH e AS (SELECT cast(json_extract_string(props, '$.k') as int) AS item,
        |    date_diff('day', DATE '1970-01-05', date_trunc('day', ts)) // 7 AS w
        |  FROM events),
        |b AS (SELECT max(w) AS w1 FROM e),
        |wk AS (SELECT item,
        |    cast(sum(CASE WHEN w = b.w1 THEN 1 ELSE 0 END) as bigint) AS cur_ct,
        |    cast(sum(CASE WHEN w = b.w1 - 1 THEN 1 ELSE 0 END) as bigint) AS prev_ct
        |  FROM e, b WHERE w >= b.w1 - 1 GROUP BY 1)
        |SELECT item, prev_ct, cur_ct,
        |  cast(row_number() OVER (ORDER BY prev_ct DESC, item) as int) AS prev_rank,
        |  cast(row_number() OVER (ORDER BY cur_ct DESC, item) as int) AS cur_rank,
        |  cast(row_number() OVER (ORDER BY prev_ct DESC, item)
        |    - row_number() OVER (ORDER BY cur_ct DESC, item) as int) AS rank_delta
        |FROM wk""".stripMargin,

    // q163 (seqPatterns): gap-allowed length-2/3 subsequence support over
    // (user, day) journeys. The oracle enumerates by POSITIONAL SELF-JOIN
    // (rn < rn), a different construction from the Spark side's per-row HOF
    // expansion — equality proves the candidate generation, the presence
    // distinct, and the support counts. Same cap (8) and threshold (10).
    "q163_seq_patterns" ->
      """WITH c AS (SELECT user_id, d, tp, rn FROM (
        |    SELECT user_id, date_trunc('day', ts) AS d, event_type AS tp,
        |      row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
        |        ORDER BY epoch_us(ts), event_id) AS rn
        |    FROM events) WHERE rn <= 8),
        |p2 AS (SELECT DISTINCT a.user_id, a.d, a.tp || '>' || b.tp AS pattern
        |  FROM c a JOIN c b ON a.user_id = b.user_id AND a.d = b.d
        |    AND a.rn < b.rn),
        |p3 AS (SELECT DISTINCT a.user_id, a.d,
        |    a.tp || '>' || b.tp || '>' || e.tp AS pattern
        |  FROM c a JOIN c b ON a.user_id = b.user_id AND a.d = b.d
        |    AND a.rn < b.rn
        |  JOIN c e ON b.user_id = e.user_id AND b.d = e.d AND b.rn < e.rn),
        |u AS (SELECT * FROM p2 UNION ALL SELECT * FROM p3)
        |SELECT pattern, count(*) AS journeys,
        |  count(DISTINCT user_id) AS users
        |FROM u GROUP BY 1 HAVING count(*) >= 10""".stripMargin,

    // q164 (quotaSample): bottom-64 md5 hashes per lang stratum. The oracle
    // ranks with a window (the construction the Spark side deliberately
    // avoids) — equality proves the k-bounded aggregator selects exactly
    // the window's bottom-k with the same tiebreak.
    "q164_quota_sample" ->
      """WITH h AS (SELECT lang, doc_id,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT AS h
        |  FROM documents),
        |s AS (SELECT lang, count(*) AS stratum_docs FROM h GROUP BY 1),
        |r AS (SELECT lang, doc_id, h,
        |    cast(row_number() OVER (PARTITION BY lang
        |      ORDER BY h, doc_id) as int) AS r
        |  FROM h)
        |SELECT r.lang, s.stratum_docs, r.r, r.doc_id, r.h
        |FROM r JOIN s USING (lang) WHERE r.r <= 64""".stripMargin,

    // q165 (dayFunnel): day-grain milestone funnel. The Spark side is a
    // row-local fold in (tsm, eid) order; the oracle replays the SAME
    // positional semantics with struct-valued conditional mins (a click at
    // the view's exact micros counts only if it sorts after it) — a
    // different construction, so equality proves the fold.
    "q165_day_funnel" ->
      """WITH e AS (SELECT user_id, date_trunc('day', ts) AS d,
        |    epoch_us(ts) AS tsm, event_id AS eid, event_type AS tp
        |  FROM events),
        |a1 AS (SELECT user_id, d,
        |    min(struct_pack(t := tsm, e := eid)) FILTER (WHERE tp = 'view') AS v
        |  FROM e GROUP BY 1, 2),
        |a2 AS (SELECT e.user_id, e.d,
        |    min(struct_pack(t := e.tsm, e := e.eid)) FILTER (
        |      WHERE e.tp = 'click' AND a1.v IS NOT NULL
        |        AND struct_pack(t := e.tsm, e := e.eid) > a1.v) AS c
        |  FROM e JOIN a1 USING (user_id, d) GROUP BY 1, 2),
        |a3 AS (SELECT e.user_id, e.d,
        |    min(struct_pack(t := e.tsm, e := e.eid)) FILTER (
        |      WHERE e.tp = 'purchase' AND a2.c IS NOT NULL
        |        AND struct_pack(t := e.tsm, e := e.eid) > a2.c) AS p
        |  FROM e JOIN a2 USING (user_id, d) GROUP BY 1, 2)
        |SELECT strftime(a1.d, '%Y-%m-%d') AS dt, count(*) AS user_days,
        |  count(a1.v) AS v_days, count(a2.c) AS vc_days,
        |  count(a3.p) AS vcp_days
        |FROM a1 JOIN a2 USING (user_id, d) JOIN a3 USING (user_id, d)
        |GROUP BY 1""".stripMargin,

    // q166 (holtTrend): scaled-integer Holt level+trend over the q122 grid,
    // replayed as a per-type recursive CTE. The trend term goes negative;
    // Spark `div` and DuckDB `//` both TRUNCATE toward zero (measured —
    // an arithmetic shift would floor and diverge), so div/\// is the
    // pinned convention.
    "q166_holt_trend" ->
      """WITH RECURSIVE ev AS (SELECT event_type, date_trunc('hour', ts) AS h FROM events),
        |counts AS (SELECT event_type, h, count(*) AS ct FROM ev GROUP BY 1, 2),
        |axis AS (SELECT unnest(generate_series((SELECT min(h) FROM ev),
        |    (SELECT max(h) FROM ev), INTERVAL '1 hour')) AS h),
        |grid AS (SELECT t.event_type, strftime(a.h, '%Y-%m-%d %H:00:00') AS hour,
        |    cast(coalesce(c.ct, 0) as bigint) AS ct
        |  FROM (SELECT DISTINCT event_type FROM counts) t
        |  CROSS JOIN axis a
        |  LEFT JOIN counts c ON c.event_type = t.event_type AND c.h = a.h),
        |g AS (SELECT event_type, hour, ct,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hour) AS rn FROM grid),
        |rec AS (
        |  SELECT event_type, hour, ct, rn, cast(0 as bigint) AS n,
        |    cast(NULL as bigint) AS fc, ct * 1048576 AS l, cast(0 as bigint) AS b
        |  FROM g WHERE rn = 1
        |  UNION ALL
        |  SELECT g.event_type, g.hour, g.ct, g.rn, rec.n + 1,
        |    rec.l + rec.b AS fc,
        |    (g.ct * 1048576 + 3 * (rec.l + rec.b)) // 4 AS l,
        |    (((g.ct * 1048576 + 3 * (rec.l + rec.b)) // 4) - rec.l + 3 * rec.b) // 4 AS b
        |  FROM rec JOIN g ON g.event_type = rec.event_type AND g.rn = rec.rn + 1)
        |SELECT event_type, hour, ct,
        |  cast(l as double) / 1048576 AS level,
        |  cast(b as double) / 1048576 AS trend,
        |  cast(fc as double) / 1048576 AS fcast,
        |  coalesce(2 * abs(ct * 1048576 - fc) > greatest(fc, 5242880), false) AS anomaly
        |FROM rec""".stripMargin,

    // q167 (seqPack): concat-and-chunk sequence packing. The oracle IS the
    // single-window global prefix sum the Spark side's two-phase
    // distributed construction exists to avoid — equality proves the
    // group-offset + within-group decomposition.
    "q167_seq_pack" ->
      """WITH t AS (SELECT doc_id,
        |    cast(len(regexp_extract_all(lower(text), '[a-z0-9]+')) as bigint) AS token_ct
        |  FROM documents),
        |p AS (SELECT doc_id, token_ct,
        |    cast(coalesce(sum(token_ct) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) AS tok_offset
        |  FROM t)
        |SELECT doc_id, token_ct, tok_offset,
        |  tok_offset // 512 AS chunk_first,
        |  (tok_offset + greatest(token_ct, 1) - 1) // 512 AS chunk_last,
        |  (tok_offset + greatest(token_ct, 1) - 1) // 512
        |    - tok_offset // 512 AS crosses
        |FROM p""".stripMargin,

    // q168 (knnBfs): int8-quantized LSH-kNN graph (hamming<=1 hyperplane
    // buckets gate the candidate pairs — the q28 pl/sg/bk construction,
    // bit-identical planes from md5 over the 2^20 grid; bucket-salted
    // candidates via [[knnEdgeCtes]]; k smallest by the unique composite
    // d2*cap+vb), symmetrized, BFS from min vec_id. The recursive
    // (node, hops) UNION is bounded by nodes x maxdist; min(hops) at the
    // end is the BFS distance.
    "q168_knn_bfs" ->
      s"""WITH RECURSIVE ${knnEdgeCtes(2000, 3)},
        |src AS (SELECT min(vec_id) AS s FROM e2),
        |reach AS (SELECT s AS node, cast(0 as bigint) AS hops FROM src
        |  UNION SELECT e.b, r.hops + 1 FROM reach r JOIN edges e ON e.a = r.node
        |  WHERE r.hops < 32),
        |d AS (SELECT node, min(hops) AS hops FROM reach GROUP BY 1)
        |SELECT e2.vec_id, d.hops FROM e2 LEFT JOIN d ON d.node = e2.vec_id""".stripMargin,

    // q169 (bootstrapCi): Poisson-bootstrap CI. The oracle pays the
    // explode-by-replicate construction (corpus x reps rows) the Spark
    // side's 64-expression single scan avoids; the Carter-Wegman
    // (a + rep*b) mod P replicate hash and the ->Poisson(1) threshold
    // ladder are identical integer arithmetic in both engines.
    "q169_bootstrap_ci" -> {
      val thr = Seq(
        1656781714176973L, 3313563428353947L, 4141954285442434L,
        4418084571138597L, 4487117142562637L, 4500923656847445L,
        4503224742561580L, 4503553469092171L, 4503594559908495L)
      val wt = thr.map(t => s"(CASE WHEN h >= $t THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH j AS (SELECT c_mktsegment AS segment, o_orderkey AS okey,
         |    cast(floor(o_totalprice * 100) as bigint) AS cents
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         |jh AS (SELECT segment, okey, cents,
         |    ('0x' || substr(md5('bootA_' || cast(okey as varchar)), 1, 13))::BIGINT AS ha,
         |    ('0x' || substr(md5('bootB_' || cast(okey as varchar)), 1, 13))::BIGINT AS hb
         |  FROM j),
         |r AS (SELECT cast(range as bigint) AS rep FROM range(32)),
         |w AS (SELECT segment, rep, cents,
         |    (ha + rep * hb) % 4503599627370449 AS h
         |  FROM jh CROSS JOIN r),
         |cells AS (SELECT segment, rep,
         |    cast(sum(($wt) * cents) as bigint) AS swc,
         |    cast(sum($wt) as bigint) AS sw
         |  FROM w GROUP BY 1, 2),
         |means AS (SELECT segment, rep,
         |    cast(swc as double) / cast(sw as double) AS m
         |  FROM cells WHERE sw > 0),
         |arr AS (SELECT segment, list_sort(list(m)) AS a FROM means GROUP BY 1),
         |ex AS (SELECT segment, count(*) AS n_orders,
         |    cast(sum(cents) as bigint) AS sc FROM j GROUP BY 1)
         |SELECT ex.segment, ex.n_orders,
         |  cast(ex.sc as double) / cast(ex.n_orders as double) AS exact_mean,
         |  a[2] AS boot_lo, a[len(a) - 1] AS boot_hi,
         |  cast(ex.sc as double) / cast(ex.n_orders as double) >= a[2]
         |    AND cast(ex.sc as double) / cast(ex.n_orders as double)
         |      <= a[len(a) - 1] AS covered
         |FROM ex JOIN arr USING (segment)""".stripMargin
    },

    // q170 (markovAttribution): removal-effect attribution. Journey ->
    // transition counts -> 2^20 fixed-point absorption recurrence, 12
    // mechanically unrolled iteration CTEs (the q157 discipline — DuckDB
    // disallows aggregates over the recursive reference), one scenario row
    // per (full + each removed channel). Truncating // throughout (the
    // q166 pinned convention).
    "q170_markov_attrib" -> {
      def step(i: Int): String =
        s"""p$i AS (SELECT b.sc, b.rm, b.s, b.p0,
           |    b.p0 + cast(coalesce(sum(mc.p20 * q.p), 0) as bigint) // 1048576 AS p
           |  FROM base b
           |  LEFT JOIN mc ON mc.f = b.s
           |  LEFT JOIN p${i - 1} q ON q.sc = b.sc AND q.s = mc.t
           |    AND (b.rm IS NULL OR mc.t <> b.rm)
           |  GROUP BY b.sc, b.rm, b.s, b.p0)""".stripMargin
      s"""WITH e AS (SELECT user_id, date_trunc('day', ts) AS d, ts, event_id, event_type
         |  FROM events),
         |pos AS (SELECT *, row_number() OVER (PARTITION BY user_id, d
         |    ORDER BY ts, event_id) AS rn FROM e),
         |pp AS (SELECT user_id, d,
         |    min(CASE WHEN event_type = 'purchase' THEN rn END) AS prn
         |  FROM pos GROUP BY 1, 2),
         |kept AS (SELECT pos.*, pp.prn FROM pos JOIN pp USING (user_id, d)
         |  WHERE pp.prn IS NULL OR pos.rn <= pp.prn),
         |sq AS (SELECT *, lead(event_type) OVER (PARTITION BY user_id, d
         |    ORDER BY rn) AS nxt FROM kept),
         |tr AS (
         |  SELECT 'START' AS f,
         |    CASE WHEN event_type = 'purchase' THEN 'CONV' ELSE event_type END AS t
         |  FROM sq WHERE rn = 1
         |  UNION ALL
         |  SELECT event_type,
         |    CASE WHEN nxt = 'purchase' THEN 'CONV' ELSE nxt END
         |  FROM sq WHERE nxt IS NOT NULL AND event_type <> 'purchase'
         |  UNION ALL
         |  SELECT event_type, 'NULL'
         |  FROM sq WHERE nxt IS NULL AND event_type <> 'purchase'),
         |ct AS (SELECT f, t, count(*) AS c FROM tr GROUP BY 1, 2),
         |tot AS (SELECT f, sum(c) AS tc FROM ct GROUP BY 1),
         |m AS (SELECT ct.f, ct.t,
         |    (ct.c * 1048576) // cast(tot.tc as bigint) AS p20
         |  FROM ct JOIN tot USING (f)),
         |ch AS (SELECT DISTINCT f AS c FROM ct WHERE f <> 'START'),
         |mc AS (SELECT * FROM m WHERE t IN (SELECT c FROM ch)),
         |scen AS (SELECT 'full' AS sc, cast(NULL as varchar) AS rm
         |  UNION ALL SELECT c, c FROM ch),
         |states AS (SELECT 'START' AS s UNION ALL SELECT c FROM ch),
         |base AS (SELECT scen.sc, scen.rm, states.s,
         |    cast(coalesce((SELECT p20 FROM m
         |      WHERE m.f = states.s AND m.t = 'CONV'), 0) as bigint) AS p0
         |  FROM scen CROSS JOIN states),
         |p0 AS (SELECT sc, rm, s, p0, p0 AS p FROM base),
         |${(1 to 12).map(step).mkString(",\n")},
         |res AS (SELECT sc, p FROM p12 WHERE s = 'START'),
         |fin AS (SELECT r.sc AS channel, f.p AS pf, r.p AS pr
         |  FROM res r CROSS JOIN (SELECT p FROM res WHERE sc = 'full') f
         |  WHERE r.sc <> 'full'),
         |tt AS (SELECT cast(sum(pf - pr) as bigint) AS tre FROM fin)
         |SELECT channel,
         |  cast(pf as double) / 1048576 AS p_full,
         |  cast(pr as double) / 1048576 AS p_removed,
         |  cast(pf - pr as double) / 1048576 AS removal_effect,
         |  CASE WHEN tre > 0
         |    THEN cast(((pf - pr) * 1048576) // tre as double) / 1048576
         |  END AS share
         |FROM fin CROSS JOIN tt""".stripMargin
    },

    // q171 (positionalIndex): doc-range-chunked postings with 0-based token
    // positions, serialized as deterministic doc:tf:p1.p2 strings so the
    // bytes hash-compare (nested array-of-struct output would not).
    "q171_positional_index" ->
      """WITH tok AS (
        |  -- zipped unnests enumerate EVERY position (the old range(4096)
        |  -- cross join silently truncated docs longer than 4096 tokens)
        |  SELECT doc_id, unnest(ts) AS term,
        |    cast(unnest(range(len(ts))) as int) AS pos
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
        |    FROM documents)),
        |pd AS (SELECT term, doc_id, list_sort(list(pos)) AS positions,
        |    count(*) AS tf
        |  FROM tok GROUP BY 1, 2),
        |pe AS (SELECT term, doc_id, tf, doc_id // 256 AS chunk,
        |    doc_id || ':' || tf || ':' || array_to_string(positions, '.') AS entry
        |  FROM pd)
        |SELECT term, chunk, count(*) AS df, cast(sum(tf) as bigint) AS cf,
        |  string_agg(entry, '|' ORDER BY doc_id) AS postings
        |FROM pe GROUP BY 1, 2""".stripMargin,

    // q172 (whitenEmbeddings): per-dimension z-score on 2^20-quantized
    // components — exact integer moments, one mirrored double chain for
    // the final scaled score.
    "q172_whiten_embed" ->
      """WITH comp AS (
        |  SELECT vec_id, cast(i as int) AS dim,
        |    cast(floor(cast(embedding[i + 1] as double) * 1048576) as bigint) AS xq
        |  FROM embeddings CROSS JOIN range(64) t(i) WHERE i < len(embedding)),
        |mom AS (SELECT dim, count(*) AS n,
        |    sum(cast(xq as hugeint)) AS s, sum(cast(xq as hugeint) * xq) AS s2
        |  FROM comp GROUP BY 1),
        |mm AS (SELECT dim, n, s,
        |    cast(floor(sqrt(cast(n * s2 - s * s as double))) as hugeint) AS r
        |  FROM mom)
        |SELECT c.vec_id, c.dim, c.xq,
        |  CASE WHEN mm.r > 0 THEN
        |    greatest(cast(-127 as bigint), least(cast(127 as bigint),
        |      cast(floor(cast(mm.n * c.xq - mm.s as double)
        |        / cast(mm.r as double) * 32) as bigint)))
        |  ELSE cast(0 as bigint) END AS z32
        |FROM comp c JOIN mm USING (dim)""".stripMargin,

    // q173 (prioritySample): weighted priority sampling. The oracle is the
    // global row_number construction the Spark side's k-bounded topK
    // partial agg avoids; priorities are one exactly-rounded double
    // division, estimator weights 2^20 integer-quantized.
    "q173_priority_sample" ->
      """WITH d AS (SELECT doc_id, greatest(n_chars, 1) AS w,
        |    greatest(1, ('0x' || substr(md5('prio_'
        |      || cast(doc_id as varchar)), 1, 13))::BIGINT) AS h
        |  FROM documents),
        |p AS (SELECT doc_id, w,
        |    cast(w as double) * 4503599627370496 / cast(h as double) AS priority
        |  FROM d),
        |rk AS (SELECT *, row_number() OVER (ORDER BY priority DESC, doc_id) AS r
        |  FROM p),
        |tau AS (SELECT coalesce(cast(floor(
        |    max(CASE WHEN r = 65 THEN priority END) * 1048576) as bigint), 0) AS tau20
        |  FROM rk),
        |kept AS (SELECT rk.*, tau.tau20 FROM rk CROSS JOIN tau WHERE rk.r <= 64),
        |est AS (SELECT cast(sum(greatest(w * 1048576, tau20)) as bigint) AS est20
        |  FROM kept),
        |ex AS (SELECT cast(sum(w) as bigint) AS exact_total FROM d)
        |SELECT cast(k.r as int) AS r, k.doc_id, k.w, k.priority,
        |  cast(greatest(k.w * 1048576, k.tau20) as double) / 1048576 AS w_hat,
        |  cast(est.est20 as double) / 1048576 AS est_total,
        |  ex.exact_total,
        |  abs(est.est20 - ex.exact_total * 1048576) * 20
        |    <= ex.exact_total * 1048576 * 7 AS est_ok
        |FROM kept k CROSS JOIN est CROSS JOIN ex""".stripMargin,

    // q174 (knScore): interpolated Kneser-Ney bigram scoring, LM trained on
    // the store third (q90 split), all docs scored. Probabilities are
    // rationals over integer counts at discount D=3/4, floor(2^20*p) as ONE
    // HUGEINT integral division — mirrors Spark's decimal(38,0) div exactly.
    "q174_kn_score" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |wm AS (SELECT max(doc_id) // 3 AS wm FROM documents),
        |g0 AS (SELECT doc_id, unnest(
        |   [array_to_string(toks[i:i+1], ' ') FOR i IN generate_series(1, greatest(len(toks) - 1, 0))]) AS gram
        |  FROM t),
        |gr AS (SELECT doc_id, gram, count(*) AS tf FROM g0 GROUP BY 1, 2),
        |corpus AS (SELECT gram, cast(sum(tf) as bigint) AS c12
        |  FROM gr CROSS JOIN wm WHERE doc_id < wm GROUP BY 1),
        |marg AS (SELECT split_part(gram, ' ', 1) AS w1, cast(sum(c12) as bigint) AS c1,
        |    cast(count(*) as bigint) AS n1p FROM corpus GROUP BY 1),
        |cont AS (SELECT split_part(gram, ' ', 2) AS w2, cast(count(*) as bigint) AS cw2
        |  FROM corpus GROUP BY 1),
        |ct AS (SELECT cast(count(*) as bigint) AS ctot FROM corpus),
        |qq AS (SELECT g.doc_id, g.tf, c.c12,
        |    CASE WHEN m.c1 IS NOT NULL THEN
        |      (1048576::HUGEINT * (greatest(4 * coalesce(c.c12, 0) - 3, 0)::HUGEINT * ct.ctot
        |         + 3::HUGEINT * m.n1p * coalesce(co.cw2, 0)))
        |      // (4::HUGEINT * m.c1 * ct.ctot)
        |    ELSE (1048576::HUGEINT * coalesce(co.cw2, 0)) // ct.ctot END AS q
        |  FROM gr g
        |  LEFT JOIN corpus c USING (gram)
        |  LEFT JOIN marg m ON m.w1 = split_part(g.gram, ' ', 1)
        |  LEFT JOIN cont co ON co.w2 = split_part(g.gram, ' ', 2)
        |  CROSS JOIN ct),
        |sc AS (SELECT doc_id, cast(sum(tf * q) as bigint) AS kn_sum,
        |    cast(sum(tf) as bigint) AS n_bigrams,
        |    cast(sum(CASE WHEN c12 IS NULL THEN tf ELSE 0 END) as bigint) AS oov_tf
        |  FROM qq GROUP BY 1)
        |SELECT t.doc_id, coalesce(n_bigrams, 0) AS n_bigrams,
        |  coalesce(kn_sum, 0) AS kn_sum, coalesce(oov_tf, 0) AS oov_tf,
        |  CASE WHEN coalesce(n_bigrams, 0) > 0
        |    THEN coalesce(kn_sum, 0) // n_bigrams ELSE -1 END AS avg_q
        |FROM t LEFT JOIN sc ON sc.doc_id = t.doc_id""".stripMargin,

    // q175 (lpaCommunities): synchronous label propagation on the q168 kNN
    // graph, 4 unrolled rounds (plurality label, ties to the smaller
    // label). MATERIALIZED per round — each lN/cN is referenced twice and
    // naive inlining re-expands the quadratic graph join per reference
    // (the q150 lesson).
    "q175_lpa_communities" -> {
      val rounds = (1 to 4).map { r =>
        s"""c$r AS MATERIALIZED (SELECT e.b AS node, l.lbl, count(*) AS ct
           |  FROM edges e JOIN l${r - 1} l ON l.node = e.a GROUP BY 1, 2),
           |m$r AS MATERIALIZED (SELECT node, max(ct) AS mct FROM c$r GROUP BY 1),
           |l$r AS MATERIALIZED (SELECT l.node, coalesce(n.nl, l.lbl) AS lbl
           |  FROM l${r - 1} l LEFT JOIN (SELECT c.node, min(c.lbl) AS nl
           |    FROM c$r c JOIN m$r m ON m.node = c.node AND c.ct = m.mct
           |    GROUP BY 1) n ON n.node = l.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${knnEdgeCtes(2000, 3)},
         |l0 AS MATERIALIZED (SELECT vec_id AS node, vec_id AS lbl FROM e2),
         |$rounds,
         |sz AS (SELECT lbl, count(*) AS csize FROM l4 GROUP BY 1)
         |SELECT l4.node AS vec_id, l4.lbl AS community, sz.csize
         |FROM l4 JOIN sz USING (lbl)""".stripMargin
    },

    // q176 (cupedTtest): CUPED variance-reduced Welch test. X/Y are exact
    // integer cents split at the exact-micros window midpoint; moments in
    // HUGEINT ≡ Spark decimal(38,0); theta/means/variances/t mirror the
    // Spark double expression tree operation-for-operation.
    "q176_cuped" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us,
        |    cast(floor(value * 100) as bigint) AS c
        |  FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
        |u AS (SELECT user_id,
        |    cast(sum(CASE WHEN us < mid THEN c ELSE 0 END) as bigint) AS x,
        |    cast(sum(CASE WHEN us >= mid THEN c ELSE 0 END) as bigint) AS y
        |  FROM ev CROSS JOIN b GROUP BY 1),
        |p AS (SELECT x, y,
        |    CASE WHEN ('0x' || substr(md5('exp1_' || cast(user_id as varchar)), 1, 13))::BIGINT % 2 = 0
        |      THEN 'A' ELSE 'B' END AS arm
        |  FROM u),
        |a AS (SELECT arm, count(*) AS n,
        |    cast(sum(x) as bigint) AS sx, cast(sum(y) as bigint) AS sy,
        |    sum(cast(x as hugeint) * x) AS sxx,
        |    sum(cast(x as hugeint) * y) AS sxy,
        |    sum(cast(y as hugeint) * y) AS syy
        |  FROM p GROUP BY 1),
        |r AS (SELECT
        |    cast(sum(CASE WHEN arm = 'A' THEN n END) as bigint) AS n_a,
        |    cast(sum(CASE WHEN arm = 'A' THEN sx END) as bigint) AS sx_a,
        |    cast(sum(CASE WHEN arm = 'A' THEN sy END) as bigint) AS sy_a,
        |    sum(CASE WHEN arm = 'A' THEN sxx END) AS sxx_a,
        |    sum(CASE WHEN arm = 'A' THEN sxy END) AS sxy_a,
        |    sum(CASE WHEN arm = 'A' THEN syy END) AS syy_a,
        |    cast(sum(CASE WHEN arm = 'B' THEN n END) as bigint) AS n_b,
        |    cast(sum(CASE WHEN arm = 'B' THEN sx END) as bigint) AS sx_b,
        |    cast(sum(CASE WHEN arm = 'B' THEN sy END) as bigint) AS sy_b,
        |    sum(CASE WHEN arm = 'B' THEN sxx END) AS sxx_b,
        |    sum(CASE WHEN arm = 'B' THEN sxy END) AS sxy_b,
        |    sum(CASE WHEN arm = 'B' THEN syy END) AS syy_b
        |  FROM a),
        |m AS (SELECT r.*,
        |    cast(n_a as double) + cast(n_b as double) AS n,
        |    cast(sx_a as double) + cast(sx_b as double) AS sx,
        |    cast(sy_a as double) + cast(sy_b as double) AS sy,
        |    cast(sxx_a as double) + cast(sxx_b as double) AS sxx,
        |    cast(sxy_a as double) + cast(sxy_b as double) AS sxy
        |  FROM r),
        |th AS (SELECT m.*,
        |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta
        |  FROM m),
        |z AS (SELECT th.*,
        |    (cast(sy_a as double) - theta * cast(sx_a as double)) / cast(n_a as double) AS mz_a,
        |    (cast(sy_b as double) - theta * cast(sx_b as double)) / cast(n_b as double) AS mz_b,
        |    cast(sy_a as double) / cast(n_a as double) AS my_a,
        |    cast(sy_b as double) / cast(n_b as double) AS my_b
        |  FROM th),
        |v AS (SELECT z.*,
        |    (cast(syy_a as double) - 2.0 * theta * cast(sxy_a as double)
        |      + theta * theta * cast(sxx_a as double)
        |      - cast(n_a as double) * mz_a * mz_a) / (cast(n_a as double) - 1) AS vz_a,
        |    (cast(syy_b as double) - 2.0 * theta * cast(sxy_b as double)
        |      + theta * theta * cast(sxx_b as double)
        |      - cast(n_b as double) * mz_b * mz_b) / (cast(n_b as double) - 1) AS vz_b,
        |    (cast(syy_a as double) - cast(sy_a as double) * cast(sy_a as double)
        |      / cast(n_a as double)) / (cast(n_a as double) - 1) AS vy_a,
        |    (cast(syy_b as double) - cast(sy_b as double) * cast(sy_b as double)
        |      / cast(n_b as double)) / (cast(n_b as double) - 1) AS vy_b,
        |    (cast(syy_a as double) + cast(syy_b as double) - 2.0 * theta * sxy
        |      + theta * theta * sxx) AS szz,
        |    (sy - theta * sx) / n AS mz_all
        |  FROM z),
        |f AS (SELECT v.*,
        |    (my_a - my_b) / sqrt(vy_a / cast(n_a as double) + vy_b / cast(n_b as double)) AS t_raw,
        |    (mz_a - mz_b) / sqrt(vz_a / cast(n_a as double) + vz_b / cast(n_b as double)) AS t_adj,
        |    (szz - n * mz_all * mz_all) / (n - 1) AS vz_all,
        |    ((cast(syy_a as double) + cast(syy_b as double)) - sy * sy / n) / (n - 1) AS vy_all
        |  FROM v)
        |SELECT n_a, n_b, theta,
        |  my_a AS mean_raw_a, my_b AS mean_raw_b, t_raw,
        |  mz_a AS mean_adj_a, mz_b AS mean_adj_b, t_adj,
        |  1.0 - vz_all / vy_all AS var_reduction,
        |  abs(t_raw) > cast(1.96 as double) AS sig_raw,
        |  abs(t_adj) > cast(1.96 as double) AS sig_adj
        |FROM f""".stripMargin,

    // q177 (alsRank1): rank-1 ALS in 2^20 fixed point, 2 unrolled rounds.
    // Every iterate is one HUGEINT integral division ≡ Spark decimal div;
    // the MSE audit re-predicts every observed cell.
    "q177_als_rank1" ->
      """WITH r AS MATERIALIZED (SELECT o_custkey AS cust, p_brand AS item,
        |    cast(sum(l_quantity) as bigint) AS r
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |v0 AS (SELECT DISTINCT item, cast(1048576 as bigint) AS v FROM r),
        |u1 AS MATERIALIZED (SELECT cust,
        |    cast((1099511627776::HUGEINT * sum(cast(r.r as hugeint) * v))
        |      // sum(cast(v as hugeint) * v) as bigint) AS u
        |  FROM r JOIN v0 USING (item) GROUP BY 1),
        |v1 AS MATERIALIZED (SELECT item,
        |    cast((1099511627776::HUGEINT * sum(cast(r.r as hugeint) * u))
        |      // sum(cast(u as hugeint) * u) as bigint) AS v
        |  FROM r JOIN u1 USING (cust) GROUP BY 1),
        |u2 AS MATERIALIZED (SELECT cust,
        |    cast((1099511627776::HUGEINT * sum(cast(r.r as hugeint) * v))
        |      // sum(cast(v as hugeint) * v) as bigint) AS u
        |  FROM r JOIN v1 USING (item) GROUP BY 1),
        |v2 AS MATERIALIZED (SELECT item,
        |    cast((1099511627776::HUGEINT * sum(cast(r.r as hugeint) * u))
        |      // sum(cast(u as hugeint) * u) as bigint) AS v
        |  FROM r JOIN u2 USING (cust) GROUP BY 1),
        |cells AS (SELECT r.r * 1048576
        |      - cast((cast(u as hugeint) * v) // 1048576 as bigint) AS err
        |  FROM r JOIN u2 USING (cust) JOIN v2 USING (item)),
        |mse AS (SELECT cast(sum(cast(err as hugeint) * err)
        |      // (count(*)::HUGEINT * 1099511627776) as bigint) AS mse_q
        |  FROM cells),
        |nr AS (SELECT item, count(*) AS n_raters FROM r GROUP BY 1)
        |SELECT v2.item, v2.v AS v_q, nr.n_raters, mse.mse_q
        |FROM v2 JOIN nr USING (item) CROSS JOIN mse""".stripMargin,

    // q178 (rakeKeyphrases): RAKE — non-stopword runs (gaps-and-islands via
    // pos - row_number), chunked to <=4-token candidates, word ratio
    // (deg*2^20) div freq, phrase score = sum of ratios, per-doc argmax by
    // (score desc, phrase desc). All-integer scores; argmax as row_number.
    "q178_rake_keyphrases" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(ts) AS tok,
        |    cast(unnest(range(len(ts))) as int) AS pos
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
        |    FROM documents)),
        |nz AS (SELECT doc_id, tok, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS run
        |  FROM tok WHERE tok NOT IN ('the','a','of','and','is','to','in')),
        |mem AS (SELECT doc_id, tok, pos, run,
        |    (row_number() OVER (PARTITION BY doc_id, run ORDER BY pos) - 1) // 4 AS ci
        |  FROM nz),
        |m2 AS (SELECT m.*, count(*) OVER (PARTITION BY doc_id, run, ci) AS plen
        |  FROM mem m),
        |ws AS (SELECT tok,
        |    (cast(sum(plen) as bigint) * 1048576) // count(*) AS ratio
        |  FROM m2 GROUP BY 1),
        |ph AS (SELECT m.doc_id,
        |    string_agg(m.tok, ' ' ORDER BY m.pos) AS phrase,
        |    cast(sum(ws.ratio) as bigint) AS score
        |  FROM m2 m JOIN ws USING (tok)
        |  GROUP BY m.doc_id, m.run, m.ci),
        |r AS (SELECT doc_id, phrase, score,
        |    count(*) OVER (PARTITION BY doc_id) AS n_phrases,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, phrase DESC) AS rn
        |  FROM ph)
        |SELECT doc_id, cast(n_phrases as bigint) AS n_phrases,
        |  phrase AS top_phrase, score AS score_q
        |FROM r WHERE rn = 1""".stripMargin,

    // q179 (videoSegments): the video scene-cut + fingerprint logic
    // replayed from the synthY4m integer recipe — binary grid cells make
    // every float exact-dyadic: cut iff ANY cell flips (k/8 > 0.08 iff
    // k >= 1), mean_luma = (sum ones / 8.0) / n (one inexact division,
    // same op order), fingerprint bit iff 8*slot > total. Spark walks the
    // real Y4M container; this replays the arithmetic.
    "q179_video_segments" ->
      """WITH m AS (SELECT doc_id AS media_id, 2 + doc_id % 3 AS L,
        |    8 + (doc_id % 5) * 4 AS nf
        |  FROM documents WHERE doc_id < 64),
        |f AS (SELECT media_id, L, nf, cast(unnest(range(nf)) as bigint) AS fr FROM m),
        |g AS (SELECT media_id, nf, fr,
        |    cast(c.c as bigint) AS c,
        |    CASE WHEN (media_id * 31 + (fr // L) * 97 + c.c * 13) % 5 < 2
        |      THEN 1 ELSE 0 END AS v
        |  FROM f CROSS JOIN (SELECT unnest(range(8)) AS c) c),
        |diff AS (SELECT a.media_id, a.fr,
        |    max(CASE WHEN a.v <> b.v THEN 1 ELSE 0 END) AS cut
        |  FROM g a JOIN g b ON b.media_id = a.media_id AND b.fr = a.fr - 1
        |    AND b.c = a.c
        |  GROUP BY 1, 2),
        |fs AS (SELECT f.media_id, f.nf, f.fr,
        |    cast(coalesce(sum(d.cut)
        |      OVER (PARTITION BY f.media_id ORDER BY f.fr), 0) as int) AS seg
        |  FROM f LEFT JOIN diff d ON d.media_id = f.media_id AND d.fr = f.fr),
        |fones AS (SELECT media_id, fr, sum(v) AS ones FROM g GROUP BY 1, 2),
        |sgm AS (SELECT fs.media_id, fs.seg AS seg_idx,
        |    cast(min(fs.fr) as int) AS start_frame,
        |    cast(count(*) as int) AS n_frames,
        |    cast(min(fs.fr) as int) / 25.0 AS start_s,
        |    cast(count(*) as int) / 25.0 AS dur_s,
        |    (sum(fo.ones) / 8.0) / count(*) AS mean_luma
        |  FROM fs JOIN fones fo ON fo.media_id = fs.media_id AND fo.fr = fs.fr
        |  GROUP BY 1, 2),
        |sl AS (SELECT media_id, (fr * 4) // nf AS t, c, sum(v) AS sv
        |  FROM g GROUP BY 1, 2, 3),
        |tot AS (SELECT media_id, t, sum(sv) AS tv FROM sl GROUP BY 1, 2),
        |fp AS (SELECT media_id,
        |    cast(sum(CASE WHEN 8 * sv > tv
        |      THEN 1::BIGINT << cast(t * 8 + c as int) ELSE 0 END) as bigint) AS fp
        |  FROM sl JOIN tot USING (media_id, t) GROUP BY 1)
        |SELECT s.media_id, s.seg_idx, s.start_frame, s.n_frames,
        |  s.start_s, s.dur_s, s.mean_luma, fp.fp
        |FROM sgm s JOIN fp USING (media_id)""".stripMargin,

    // q197 (mediaDecode): the q179 recipe trick for the other two
    // modalities — Spark walks REAL BMP (javax.imageio) and REAL PCM-WAV
    // (javax.sound) container bytes from synthBmp/synthWav; this replays
    // every pooled-luma cell (exactly 0/1: binary 2x2 cells, white luma
    // exactly 1.0) and every RMS bin (sqrt of an exact 1/16-multiple sum
    // over (n/8)-sized bins, one identically-rounded division + sqrt)
    "q197_media_decode" ->
      """WITH m AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 64),
        |cells AS (SELECT cast(c.c as int) AS slot
        |  FROM (SELECT unnest(range(8)) AS c) c),
        |img AS (SELECT media_id, 'image' AS media_type, 150::BIGINT AS n_bytes,
        |  true AS decode_ok, 8 AS width, 4 AS height,
        |  CAST(NULL AS DOUBLE) AS sample_rate, CAST(NULL AS DOUBLE) AS duration_s,
        |  slot,
        |  CASE WHEN (media_id * 31 + (media_id // 5) * 3 + slot * 13) % 5 < 2
        |    THEN (1.0)::DOUBLE ELSE (0.0)::DOUBLE END AS fval
        | FROM m CROSS JOIN cells),
        |aud0 AS (SELECT media_id, 64 + (media_id % 5) * 16 AS n FROM m),
        |audj AS (SELECT media_id, n, cast(unnest(range(n)) as bigint) AS j FROM aud0),
        |audv AS (SELECT media_id, n, cast((j * 8) // n as int) AS slot,
        |  (((media_id * 31 + (media_id // 5) * 3 + j * 7) % 5) - 2) * (0.25)::DOUBLE AS v FROM audj),
        |aud AS (SELECT media_id, 'audio' AS media_type,
        |  cast(44 + 2 * n as bigint) AS n_bytes, true AS decode_ok,
        |  CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
        |  (8000.0)::DOUBLE AS sample_rate, n / (8000.0)::DOUBLE AS duration_s,
        |  slot, sqrt(sum(v * v) / (n // 8)) AS fval
        | FROM audv GROUP BY media_id, n, slot)
        |SELECT * FROM img UNION ALL SELECT * FROM aud""".stripMargin,

    // q180 (minKProb): min-k% probability membership score — the q174 KN
    // LM CTEs verbatim, then per doc an ordered cumulative take of the
    // ceil(20%) lowest-q tokens (tie-invariant: equal-q tokens contribute
    // equal addends however the boundary splits), mean = integer div,
    // suspect = above the corpus mean of means.
    "q180_mink_prob" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |wm AS (SELECT max(doc_id) // 3 AS wm FROM documents),
        |g0 AS (SELECT doc_id, unnest(
        |   [array_to_string(toks[i:i+1], ' ') FOR i IN generate_series(1, greatest(len(toks) - 1, 0))]) AS gram
        |  FROM t),
        |gr AS (SELECT doc_id, gram, count(*) AS tf FROM g0 GROUP BY 1, 2),
        |corpus AS (SELECT gram, cast(sum(tf) as bigint) AS c12
        |  FROM gr CROSS JOIN wm WHERE doc_id < wm GROUP BY 1),
        |marg AS (SELECT split_part(gram, ' ', 1) AS w1, cast(sum(c12) as bigint) AS c1,
        |    cast(count(*) as bigint) AS n1p FROM corpus GROUP BY 1),
        |cont AS (SELECT split_part(gram, ' ', 2) AS w2, cast(count(*) as bigint) AS cw2
        |  FROM corpus GROUP BY 1),
        |ct AS (SELECT cast(count(*) as bigint) AS ctot FROM corpus),
        |qq AS (SELECT g.doc_id, cast(g.tf as bigint) AS tf,
        |    cast(CASE WHEN m.c1 IS NOT NULL THEN
        |      (1048576::HUGEINT * (greatest(4 * coalesce(c.c12, 0) - 3, 0)::HUGEINT * ct.ctot
        |         + 3::HUGEINT * m.n1p * coalesce(co.cw2, 0)))
        |      // (4::HUGEINT * m.c1 * ct.ctot)
        |    ELSE (1048576::HUGEINT * coalesce(co.cw2, 0)) // ct.ctot END as bigint) AS q
        |  FROM gr g
        |  LEFT JOIN corpus c USING (gram)
        |  LEFT JOIN marg m ON m.w1 = split_part(g.gram, ' ', 1)
        |  LEFT JOIN cont co ON co.w2 = split_part(g.gram, ' ', 2)
        |  CROSS JOIN ct),
        |nb AS (SELECT doc_id, cast(sum(tf) as bigint) AS n_bigrams,
        |    (cast(sum(tf) as bigint) + 4) // 5 AS k_tokens
        |  FROM qq GROUP BY 1),
        |ord AS (SELECT doc_id, q, tf,
        |    coalesce(sum(tf) OVER (PARTITION BY doc_id ORDER BY q, tf
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        |  FROM qq),
        |mk AS (SELECT o.doc_id,
        |    cast(sum(greatest(least(nb.k_tokens - o.prior, o.tf), 0) * o.q) as bigint) AS mink_sum
        |  FROM ord o JOIN nb USING (doc_id) GROUP BY 1),
        |sc AS (SELECT t.doc_id,
        |    coalesce(nb.n_bigrams, 0) AS n_bigrams,
        |    coalesce(nb.k_tokens, 0) AS k_tokens,
        |    coalesce(mk.mink_sum, 0) AS mink_sum,
        |    CASE WHEN coalesce(nb.k_tokens, 0) > 0
        |      THEN coalesce(mk.mink_sum, 0) // nb.k_tokens ELSE -1 END AS mink_mean_q
        |  FROM t LEFT JOIN nb ON nb.doc_id = t.doc_id
        |    LEFT JOIN mk ON mk.doc_id = t.doc_id),
        |thr AS (SELECT cast(sum(mink_mean_q) as bigint) // count(*) AS mean_all
        |  FROM sc WHERE k_tokens > 0)
        |SELECT sc.doc_id, sc.n_bigrams, sc.k_tokens, sc.mink_sum,
        |  sc.mink_mean_q, sc.mink_mean_q > thr.mean_all AS suspect
        |FROM sc CROSS JOIN thr""".stripMargin,

    // q181 (sourceSelect): greedy max-coverage over (source, distinct-term)
    // sets, 4 unrolled rounds — argmax by (gain desc, source asc), covered
    // terms MATERIALIZED per round (the q175 inlining lesson), covered
    // total = running sum of gains.
    "q181_source_select" -> {
      val rounds = (2 to 4).map { r =>
        val prev = (1 until r).map(i => s"SELECT source FROM p$i").mkString(" UNION ALL ")
        s"""s$r AS (SELECT st.source, count(*) AS gain FROM st
           |  LEFT JOIN c${r - 1} c ON c.term = st.term
           |  WHERE c.term IS NULL AND st.source NOT IN ($prev)
           |  GROUP BY 1),
           |p$r AS MATERIALIZED (SELECT source, cast(gain as bigint) AS gain
           |  FROM s$r ORDER BY gain DESC, source LIMIT 1),
           |c$r AS MATERIALIZED (SELECT term FROM c${r - 1}
           |  UNION SELECT st.term FROM st JOIN p$r USING (source))""".stripMargin
      }.mkString(",\n")
      s"""WITH st AS MATERIALIZED (SELECT DISTINCT source, term FROM
         |  (SELECT source, unnest(
         |     [array_to_string(toks[i:i+2], ' ')
         |      FOR i IN generate_series(1, greatest(len(toks) - 2, 0))]) AS term
         |   FROM (SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
         |         FROM documents))),
         |s1 AS (SELECT source, count(*) AS gain FROM st GROUP BY 1),
         |p1 AS MATERIALIZED (SELECT source, cast(gain as bigint) AS gain
         |  FROM s1 ORDER BY gain DESC, source LIMIT 1),
         |c1 AS MATERIALIZED (SELECT DISTINCT st.term
         |  FROM st JOIN p1 USING (source)),
         |$rounds
         |SELECT cast(r as int) AS rank, source, gain,
         |  cast(sum(gain) OVER (ORDER BY r) as bigint) AS covered_total
         |FROM (
         |  SELECT 1 AS r, source, gain FROM p1
         |  UNION ALL SELECT 2, source, gain FROM p2
         |  UNION ALL SELECT 3, source, gain FROM p3
         |  UNION ALL SELECT 4, source, gain FROM p4)""".stripMargin
    },

    // q182 (budgetAllocate): capped water-filling budget split — same
    // quantized ratio sort, exact cross-multiplied prefix test with the
    // running-AND, floor'd proportional fill for the uncapped tail.
    "q182_budget_allocate" ->
      """WITH av AS (SELECT source, cast(sum(len(
        |    regexp_extract_all(lower(text), '[a-z0-9]+'))) as bigint) AS avail
        |  FROM documents GROUP BY 1),
        |wt AS (SELECT source, cast(count(*) as bigint) AS weight FROM
        |  (SELECT DISTINCT source, sh FROM
        |    (SELECT source, unnest(
        |       [array_to_string(toks[i:i+2], ' ')
        |        FOR i IN generate_series(1, greatest(len(toks) - 2, 0))]) AS sh
        |     FROM (SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |           FROM documents)))
        |  GROUP BY 1),
        |src AS (SELECT av.source, av.avail, wt.weight,
        |    (av.avail::HUGEINT * 1099511627776) // wt.weight AS rk
        |  FROM av JOIN wt USING (source)),
        |tot AS (SELECT cast(sum(avail) as bigint) AS tot_avail,
        |    cast(sum(avail) as bigint) // 5 AS budget FROM src),
        |walked AS (SELECT s.*, t.budget,
        |    coalesce(sum(avail) OVER (ORDER BY rk, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix_avail,
        |    sum(weight) OVER (ORDER BY rk, source
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS suffix_w
        |  FROM src s CROSS JOIN tot t),
        |passed AS (SELECT *, CASE WHEN avail::HUGEINT * suffix_w
        |      <= (budget - prefix_avail)::HUGEINT * weight THEN 1 ELSE 0 END AS pass
        |  FROM walked),
        |cp AS (SELECT *, min(pass) OVER (ORDER BY rk, source
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 AS capped
        |  FROM passed),
        |lam AS (SELECT max(budget) - cast(sum(CASE WHEN capped THEN avail ELSE 0 END) as bigint) AS num,
        |    cast(sum(CASE WHEN NOT capped THEN weight ELSE 0 END) as bigint) AS den
        |  FROM cp)
        |SELECT cp.source, cp.avail, cp.weight, cp.budget, cp.capped,
        |  CASE WHEN cp.capped THEN cp.avail
        |    ELSE cast((cp.weight::HUGEINT * lam.num) // lam.den as bigint) END AS allocated
        |FROM cp CROSS JOIN lam""".stripMargin,

    // q183 (dimAblation): Matryoshka prefix-dim recall — 2^20-grid integer
    // components, q51's exact double cosine over each prefix slice,
    // (qcos desc, neighbor) ranking, recall vs the 64-dim top-3.
    "q183_dim_ablation" ->
      """WITH e2 AS (SELECT vec_id, list_transform(embedding,
        |    x -> cast(floor(cast(x as double) * 1048576.0) as bigint)) AS qv
        |  FROM embeddings),
        |dm AS (SELECT unnest([8, 16, 32, 64]) AS dim),
        |q AS (SELECT vec_id AS query_id, qv AS qq FROM e2 WHERE vec_id < 10),
        |p AS (SELECT dm.dim, q.query_id, c.vec_id AS neighbor_id,
        |    q.qq[1:dm.dim] AS qs, c.qv[1:dm.dim] AS cs
        |  FROM q, e2 c, dm WHERE q.query_id <> c.vec_id),
        |s AS (SELECT dim, query_id, neighbor_id,
        |    sqrt(cast(list_inner_product(qs, qs) as double)) AS qn,
        |    sqrt(cast(list_inner_product(cs, cs) as double)) AS cn,
        |    cast(list_inner_product(qs, cs) as double) AS dt
        |  FROM p),
        |r AS (SELECT dim, query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY dim, query_id ORDER BY
        |      CASE WHEN qn * cn > 0 THEN dt / (qn * cn) ELSE -2.0 END DESC,
        |      neighbor_id) AS rnk
        |  FROM s),
        |tk AS (SELECT dim, query_id, neighbor_id FROM r WHERE rnk <= 3),
        |tr AS (SELECT query_id, neighbor_id FROM tk WHERE dim = 64)
        |SELECT tk.dim, cast(count(*) as bigint) AS possible,
        |  cast(sum(CASE WHEN tr.query_id IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS hits,
        |  (cast(sum(CASE WHEN tr.query_id IS NOT NULL THEN 1 ELSE 0 END) as bigint)
        |    * 1048576) // cast(count(*) as bigint) AS recall_q
        |FROM tk LEFT JOIN tr ON tr.query_id = tk.query_id
        |  AND tr.neighbor_id = tk.neighbor_id
        |GROUP BY 1""".stripMargin,

    // q184 (conformalThreshold): split-conformal calibration — the q88
    // score replay, a bottom-64-by-md5 calibration sample, per-alpha
    // threshold = floor((n+1)*alpha/100)-th smallest calibration score,
    // exact coverage counts on the held-out rest.
    "q184_conformal" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS n
        |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2),
        |hh AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h, n FROM tf),
        |c AS (SELECT doc_id, cast(h % 64 as int) AS d,
        |    cast(sum(CASE WHEN (h // 64) % 2 = 1 THEN n ELSE -n END) as bigint) AS val
        |  FROM hh GROUP BY 1, 2),
        |w AS (SELECT j, (('0x' || substr(md5('w_' || j), 1, 2))::INT % 16) - 8 AS w
        |  FROM (SELECT unnest(generate_series(0, 63)) AS j)),
        |sc AS (SELECT t.doc_id, cast(coalesce(sum(w.w * c.val), 0) as bigint) AS score,
        |    ('0x' || substr(md5('conf_' || cast(t.doc_id as varchar)), 1, 13))::BIGINT AS hs
        |  FROM t LEFT JOIN c ON c.doc_id = t.doc_id LEFT JOIN w ON w.j = c.d
        |  GROUP BY 1, 3),
        |cal AS (SELECT doc_id, score FROM
        |  (SELECT doc_id, score, row_number() OVER (ORDER BY hs, doc_id) AS rn FROM sc)
        |  WHERE rn <= 64),
        |nc AS (SELECT cast(count(*) as bigint) AS n_cal FROM cal),
        |cr AS (SELECT score, row_number() OVER (ORDER BY score) AS r FROM cal),
        |al AS (SELECT unnest([5, 10, 20]) AS alpha_pct),
        |th AS (SELECT al.alpha_pct, nc.n_cal,
        |    ((nc.n_cal + 1) * al.alpha_pct) // 100 AS k_rank
        |  FROM al CROSS JOIN nc),
        |thv AS (SELECT th.*, CASE WHEN th.k_rank >= 1
        |    THEN (SELECT cr.score FROM cr WHERE cr.r = th.k_rank)
        |    ELSE -9223372036854775808 END AS threshold
        |  FROM th),
        |test AS (SELECT score FROM sc
        |  WHERE doc_id NOT IN (SELECT doc_id FROM cal))
        |SELECT cast(thv.alpha_pct as int) AS alpha_pct, thv.n_cal, thv.k_rank,
        |  thv.threshold,
        |  cast(count(*) as bigint) AS n_test,
        |  cast(sum(CASE WHEN test.score >= thv.threshold THEN 1 ELSE 0 END) as bigint)
        |    AS n_pass,
        |  CASE WHEN count(*) > 0 THEN
        |    (cast(sum(CASE WHEN test.score >= thv.threshold THEN 1 ELSE 0 END) as bigint)
        |      * 1048576) // cast(count(*) as bigint)
        |  ELSE -1 END AS coverage_q
        |FROM thv CROSS JOIN test
        |GROUP BY 1, 2, 3, 4""".stripMargin,

    // q185 (madOutliers): per-source median/MAD robust outlier flags —
    // q88 score replay, quantile_cont ≡ percentile (q42 parity), same
    // double flag expression.
    "q185_mad_outliers" ->
      """WITH t AS (SELECT doc_id, source,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS n
        |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2),
        |hh AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h, n FROM tf),
        |c AS (SELECT doc_id, cast(h % 64 as int) AS d,
        |    cast(sum(CASE WHEN (h // 64) % 2 = 1 THEN n ELSE -n END) as bigint) AS val
        |  FROM hh GROUP BY 1, 2),
        |w AS (SELECT j, (('0x' || substr(md5('w_' || j), 1, 2))::INT % 16) - 8 AS w
        |  FROM (SELECT unnest(generate_series(0, 63)) AS j)),
        |sc AS (SELECT t.doc_id, t.source,
        |    cast(coalesce(sum(w.w * c.val), 0) as bigint) AS score
        |  FROM t LEFT JOIN c ON c.doc_id = t.doc_id LEFT JOIN w ON w.j = c.d
        |  GROUP BY 1, 2),
        |md AS (SELECT source, quantile_cont(score, 0.5) AS med FROM sc GROUP BY 1),
        |st AS (SELECT sc.source, max(md.med) AS med,
        |    quantile_cont(abs(cast(sc.score as double) - md.med), 0.5) AS mad,
        |    count(*) AS n
        |  FROM sc JOIN md USING (source) GROUP BY 1)
        |SELECT sc.doc_id, sc.source, sc.score, st.med, st.mad,
        |  abs(cast(sc.score as double) - st.med) > 3.0 * 1.4826 * st.mad AS outlier
        |FROM sc JOIN st USING (source)""".stripMargin,

    // q186 (noveltyCurve): per-source Heaps-growth curve over doc_id mod 8
    // slices — slice tokens, distinct shingles seen, first-seen vocab,
    // cumulatives, 2^20 novelty ratio. All integers.
    "q186_novelty_curve" ->
      """WITH d AS (SELECT doc_id, source,
        |    cast(('0x' || substr(md5('slice_' || cast(doc_id as varchar)), 1, 13))::BIGINT
        |      % 8 as int) AS slice,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |tk AS (SELECT source, slice, cast(sum(len(toks)) as bigint) AS slice_tokens
        |  FROM d GROUP BY 1, 2),
        |sh AS (SELECT DISTINCT source, slice, sh FROM
        |  (SELECT source, slice, unnest(
        |     [array_to_string(toks[i:i+2], ' ')
        |      FOR i IN generate_series(1, greatest(len(toks) - 2, 0))]) AS sh
        |   FROM d)),
        |seen AS (SELECT source, slice, cast(count(*) as bigint) AS slice_seen
        |  FROM sh GROUP BY 1, 2),
        |fresh AS (SELECT source, slice, cast(count(*) as bigint) AS slice_new FROM
        |  (SELECT source, sh, min(slice) AS slice FROM sh GROUP BY 1, 2)
        |  GROUP BY 1, 2)
        |SELECT tk.source, tk.slice, tk.slice_tokens, seen.slice_seen,
        |  coalesce(fresh.slice_new, 0) AS slice_new,
        |  cast(sum(tk.slice_tokens) OVER (PARTITION BY tk.source ORDER BY tk.slice)
        |    as bigint) AS cum_tokens,
        |  cast(sum(coalesce(fresh.slice_new, 0))
        |    OVER (PARTITION BY tk.source ORDER BY tk.slice) as bigint) AS cum_vocab,
        |  (coalesce(fresh.slice_new, 0) * 1048576) // seen.slice_seen AS novelty_q
        |FROM tk JOIN seen ON seen.source = tk.source AND seen.slice = tk.slice
        |  LEFT JOIN fresh ON fresh.source = tk.source AND fresh.slice = tk.slice""".stripMargin,

    // q187 (sourceOverlap): exact pairwise distinct-shingle intersection +
    // Broder Jaccard/containment per source pair.
    "q187_source_overlap" ->
      """WITH st AS (SELECT DISTINCT source, sh FROM
        |  (SELECT source, unnest(
        |     [array_to_string(toks[i:i+2], ' ')
        |      FOR i IN generate_series(1, greatest(len(toks) - 2, 0))]) AS sh
        |   FROM (SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |         FROM documents))),
        |sz AS (SELECT source, cast(count(*) as bigint) AS n FROM st GROUP BY 1),
        |iv AS (SELECT a.source AS src_a, b.source AS src_b,
        |    cast(count(*) as bigint) AS inter
        |  FROM st a JOIN st b ON a.sh = b.sh AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT iv.src_a, iv.src_b, x.n AS na, y.n AS nb, iv.inter,
        |  (iv.inter * 1048576) // (x.n + y.n - iv.inter) AS jaccard_q,
        |  (iv.inter * 1048576) // least(x.n, y.n) AS containment_q
        |FROM iv JOIN sz x ON x.source = iv.src_a JOIN sz y ON y.source = iv.src_b""".stripMargin,

    // q188 (termBurstiness): Church-Gale VMR per term over per-doc counts
    // (zeros fold out of every sum), HUGEINT-exact, 2^20-quantized,
    // top-20 by (vmr desc, term asc).
    "q188_term_burstiness" ->
      """WITH n AS (SELECT cast(count(*) as bigint) AS n_docs FROM documents),
        |tf AS (SELECT doc_id, tok AS term, cast(count(*) as bigint) AS tf
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |st AS (SELECT term, cast(count(*) as bigint) AS df,
        |    cast(sum(tf) as bigint) AS tf_sum,
        |    sum(tf::HUGEINT * tf) AS tf2_sum
        |  FROM tf GROUP BY 1 HAVING count(*) >= 5),
        |v AS (SELECT term, df, tf_sum,
        |    cast((1048576 * (n.n_docs::HUGEINT * st.tf2_sum
        |        - st.tf_sum::HUGEINT * st.tf_sum))
        |      // (n.n_docs::HUGEINT * st.tf_sum) as bigint) AS vmr_q
        |  FROM st CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (ORDER BY vmr_q DESC, term) AS rnk FROM v)
        |SELECT cast(rnk as int) AS rnk, term, df, tf_sum, vmr_q
        |FROM r WHERE rnk <= 20""".stripMargin,

    // q189 (filterKappa): Cohen's kappa per source between the q88
    // classifier and the repetition rule — exact rational, HUGEINT mirror,
    // truncating div (both engines truncate toward zero on negatives).
    "q189_filter_kappa" ->
      """WITH t AS (SELECT doc_id, source,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS n
        |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2),
        |hh AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h, n FROM tf),
        |c AS (SELECT doc_id, cast(h % 64 as int) AS d,
        |    cast(sum(CASE WHEN (h // 64) % 2 = 1 THEN n ELSE -n END) as bigint) AS val
        |  FROM hh GROUP BY 1, 2),
        |w AS (SELECT j, (('0x' || substr(md5('w_' || j), 1, 2))::INT % 16) - 8 AS w
        |  FROM (SELECT unnest(generate_series(0, 63)) AS j)),
        |lab AS (SELECT t.doc_id, t.source,
        |    cast(coalesce(sum(w.w * c.val), 0) as bigint) >= 0 AS a,
        |    2 * len(list_distinct(max(t.toks))) >= len(max(t.toks)) AS b
        |  FROM t LEFT JOIN c ON c.doc_id = t.doc_id LEFT JOIN w ON w.j = c.d
        |  GROUP BY 1, 2),
        |cf AS (SELECT source,
        |    cast(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) as bigint) AS n11,
        |    cast(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) as bigint) AS n10,
        |    cast(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) as bigint) AS n01,
        |    cast(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) as bigint) AS n00
        |  FROM lab GROUP BY 1),
        |k AS (SELECT *, n11 + n10 + n01 + n00 AS n,
        |    (n11 + n10)::HUGEINT * (n11 + n01)
        |      + (n01 + n00)::HUGEINT * (n10 + n00) AS e
        |  FROM cf)
        |SELECT source, n11, n10, n01, n00,
        |  CASE WHEN n::HUGEINT * n - e <> 0 THEN
        |    cast((1048576 * (n::HUGEINT * (n11 + n00) - e))
        |      // (n::HUGEINT * n - e) as bigint)
        |  END AS kappa_q
        |FROM k""".stripMargin,

    // q190 (cusumDrift): tabular CUSUM over 64 doc_id-range chunk means of
    // the q88 score — integer chunk means / target / allowance, the
    // two-sided recursion replayed as a recursive CTE over chunk rank.
    "q190_cusum_drift" ->
      """WITH RECURSIVE t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS n
        |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2),
        |hh AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h, n FROM tf),
        |cc AS (SELECT doc_id, cast(h % 64 as int) AS d,
        |    cast(sum(CASE WHEN (h // 64) % 2 = 1 THEN n ELSE -n END) as bigint) AS val
        |  FROM hh GROUP BY 1, 2),
        |w AS (SELECT j, (('0x' || substr(md5('w_' || j), 1, 2))::INT % 16) - 8 AS w
        |  FROM (SELECT unnest(generate_series(0, 63)) AS j)),
        |sc AS (SELECT t.doc_id, cast(coalesce(sum(w.w * cc.val), 0) as bigint) AS score
        |  FROM t LEFT JOIN cc ON cc.doc_id = t.doc_id LEFT JOIN w ON w.j = cc.d
        |  GROUP BY 1),
        |wd AS (SELECT max(doc_id) // 64 + 1 AS width FROM sc),
        |ch AS (SELECT cast(doc_id // wd.width as int) AS chunk,
        |    cast(count(*) as bigint) AS n_docs, cast(sum(score) as bigint) AS s
        |  FROM sc CROSS JOIN wd GROUP BY 1, wd.width),
        |cm AS (SELECT chunk, n_docs, (s * 1048576) // n_docs AS mean_q, s FROM ch),
        |gl AS (SELECT (cast(sum(s) as bigint) * 1048576) // sum(n_docs) AS mu_q,
        |    cast(count(*) as bigint) AS n_chunks
        |  FROM cm),
        |kk AS (SELECT cast(sum(abs(cm.mean_q - gl.mu_q)) as bigint)
        |      // (2 * max(gl.n_chunks)) AS k_q,
        |    max(gl.mu_q) AS mu_q
        |  FROM cm CROSS JOIN gl),
        |rk AS (SELECT cm.*, row_number() OVER (ORDER BY chunk) AS r FROM cm),
        |cu AS (
        |  SELECT rk.r, rk.chunk, rk.n_docs, rk.mean_q,
        |    greatest(0, rk.mean_q - kk.mu_q - kk.k_q) AS sp,
        |    greatest(0, -(rk.mean_q - kk.mu_q) - kk.k_q) AS sn
        |  FROM rk CROSS JOIN kk WHERE rk.r = 1
        |  UNION ALL
        |  SELECT rk.r, rk.chunk, rk.n_docs, rk.mean_q,
        |    greatest(0, cu.sp + rk.mean_q - kk.mu_q - kk.k_q),
        |    greatest(0, cu.sn - (rk.mean_q - kk.mu_q) - kk.k_q)
        |  FROM cu JOIN rk ON rk.r = cu.r + 1 CROSS JOIN kk)
        |SELECT cu.chunk, cu.n_docs, cast(cu.mean_q as bigint) AS mean_q,
        |  cast(kk.mu_q as bigint) AS mu_q, cast(kk.k_q as bigint) AS k_q,
        |  cast(cu.sp as bigint) AS s_pos, cast(cu.sn as bigint) AS s_neg,
        |  cu.sp > 4 * kk.k_q OR cu.sn > 4 * kk.k_q AS alarm
        |FROM cu CROSS JOIN kk""".stripMargin,

    // q191 (chao1Vocab): per-source Chao1 unseen-vocabulary estimate over
    // 3-gram shingle frequency-of-frequencies. All integers.
    "q191_chao1_vocab" ->
      """WITH g AS (SELECT source, sh, cast(count(*) as bigint) AS ct FROM
        |  (SELECT source, unnest(
        |     [array_to_string(toks[i:i+2], ' ')
        |      FOR i IN generate_series(1, greatest(len(toks) - 2, 0))]) AS sh
        |   FROM (SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |         FROM documents))
        |  GROUP BY 1, 2),
        |f AS (SELECT source, cast(count(*) as bigint) AS v_obs,
        |    cast(sum(ct) as bigint) AS tokens,
        |    cast(sum(CASE WHEN ct = 1 THEN 1 ELSE 0 END) as bigint) AS n1,
        |    cast(sum(CASE WHEN ct = 2 THEN 1 ELSE 0 END) as bigint) AS n2
        |  FROM g GROUP BY 1),
        |e AS (SELECT *, CASE WHEN n2 > 0 THEN (n1 * n1) // (2 * n2)
        |    ELSE (n1 * (n1 - 1)) // (2 * (n2 + 1)) END AS chao1_extra
        |  FROM f)
        |SELECT source, v_obs, tokens, n1, n2, chao1_extra,
        |  v_obs + chao1_extra AS v_hat,
        |  (v_obs * 1048576) // (v_obs + chao1_extra) AS coverage_q,
        |  ((tokens - n1) * 1048576) // tokens AS cov_gt_q
        |FROM e""".stripMargin,

    // q192 (packingPlan): pad-vs-pack capacity table per context length —
    // pure integer arithmetic over per-doc token counts.
    "q192_packing_plan" ->
      """WITH d AS (SELECT cast(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |    as bigint) AS len
        |  FROM documents),
        |x AS (SELECT d.len, cast(l.l as bigint) AS l
        |  FROM d CROSS JOIN (SELECT unnest([128, 512, 2048]) AS l) l),
        |a AS (SELECT l, cast(count(*) as bigint) AS n_docs,
        |    cast(sum(len) as bigint) AS total_tokens,
        |    cast(sum(least(len, l)) as bigint) AS kept_tokens,
        |    cast(sum(greatest(len - l, 0)) as bigint) AS truncated_tokens,
        |    cast(sum(l - least(len, l)) as bigint) AS pad_waste
        |  FROM x GROUP BY 1)
        |SELECT l, n_docs, total_tokens, kept_tokens, truncated_tokens, pad_waste,
        |  n_docs AS pad_bins,
        |  (total_tokens + l - 1) // l AS pack_bins,
        |  (kept_tokens * 1048576) // (n_docs * l) AS pad_efficiency_q,
        |  (total_tokens * 1048576) // (((total_tokens + l - 1) // l) * l)
        |    AS pack_efficiency_q
        |FROM a""".stripMargin,

    // q193 (centroidDrift): per-source 2^20-grid mean embeddings, pairwise
    // exact L2^2 between truncated-integer-mean centroids.
    "q193_centroid_drift" ->
      """WITH e AS (SELECT d.source,
        |    list_transform(em.embedding,
        |      x -> cast(floor(cast(x as double) * 1048576.0) as bigint)) AS q
        |  FROM (SELECT vec_id, embedding FROM embeddings) em
        |  JOIN (SELECT doc_id AS vec_id, source FROM documents) d USING (vec_id)),
        |dims AS (SELECT source, cast(i as int) AS dim, q[i + 1] AS x
        |  FROM e CROSS JOIN (SELECT unnest(range(64)) AS i) t WHERE i < len(q)),
        |cg AS (SELECT source, dim, cast(sum(x) as bigint) AS s,
        |    cast(count(*) as bigint) AS n
        |  FROM dims GROUP BY 1, 2),
        |cent AS (SELECT source, dim, s // n AS c, n FROM cg),
        |p AS (SELECT a.source AS src_a, b.source AS src_b,
        |    max(a.n) AS n_a, max(b.n) AS n_b,
        |    cast(sum((a.c - b.c) * (a.c - b.c)) as bigint) AS l2sq
        |  FROM cent a JOIN cent b ON a.dim = b.dim AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, n_a, n_b, l2sq FROM p""".stripMargin,

    // q194 (ksMatrix): bucketized two-sample KS per source pair — q88
    // score replay, q141 fixed-width 256-bin grid, cross-multiplied
    // integer CDF gap.
    "q194_ks_matrix" ->
      """WITH t AS (SELECT doc_id, source,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS n
        |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2),
        |hh AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h, n FROM tf),
        |cx AS (SELECT doc_id, cast(h % 64 as int) AS d,
        |    cast(sum(CASE WHEN (h // 64) % 2 = 1 THEN n ELSE -n END) as bigint) AS val
        |  FROM hh GROUP BY 1, 2),
        |w AS (SELECT j, (('0x' || substr(md5('w_' || j), 1, 2))::INT % 16) - 8 AS w
        |  FROM (SELECT unnest(generate_series(0, 63)) AS j)),
        |sc AS (SELECT t.doc_id, t.source,
        |    cast(coalesce(sum(w.w * cx.val), 0) as bigint) AS score
        |  FROM t LEFT JOIN cx ON cx.doc_id = t.doc_id LEFT JOIN w ON w.j = cx.d
        |  GROUP BY 1, 2),
        |bd AS (SELECT min(score) AS lo, max(score) AS hi FROM sc),
        |bn AS (SELECT source,
        |    CASE WHEN bd.hi = bd.lo THEN 0
        |      ELSE cast(floor((score - bd.lo) * 256.0 / (bd.hi - bd.lo + 1)) as bigint)
        |    END AS b, cast(count(*) as bigint) AS ct
        |  FROM sc CROSS JOIN bd GROUP BY 1, 2),
        |grid AS (SELECT s.source, g.b FROM (SELECT DISTINCT source FROM bn) s
        |  CROSS JOIN (SELECT cast(unnest(range(256)) as bigint) AS b) g),
        |cdf AS (SELECT grid.source, grid.b,
        |    cast(sum(coalesce(bn.ct, 0)) OVER (PARTITION BY grid.source
        |      ORDER BY grid.b) as bigint) AS cum
        |  FROM grid LEFT JOIN bn ON bn.source = grid.source AND bn.b = grid.b),
        |nn AS (SELECT source, cast(sum(ct) as bigint) AS n FROM bn GROUP BY 1),
        |pr AS (SELECT a.source AS src_a, b.source AS src_b,
        |    max(na.n) AS n_a, max(nb.n) AS n_b,
        |    max(abs(a.cum * nb.n - b.cum * na.n)) AS max_gap
        |  FROM cdf a JOIN cdf b ON a.b = b.b AND a.source < b.source
        |  JOIN nn na ON na.source = a.source JOIN nn nb ON nb.source = b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, n_a, n_b, cast(max_gap as bigint) AS max_gap,
        |  (cast(max_gap as bigint) * 1048576) // (n_a * n_b) AS ks_q
        |FROM pr""".stripMargin,

    // q195 (sourceAblation): leave-one-source-out deltas — q88 score
    // replay, source-unique shingle counts, exact-rational mean delta.
    "q195_source_ablation" ->
      """WITH t AS (SELECT doc_id, source,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS n
        |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2),
        |hh AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h, n FROM tf),
        |cx AS (SELECT doc_id, cast(h % 64 as int) AS d,
        |    cast(sum(CASE WHEN (h // 64) % 2 = 1 THEN n ELSE -n END) as bigint) AS val
        |  FROM hh GROUP BY 1, 2),
        |w AS (SELECT j, (('0x' || substr(md5('w_' || j), 1, 2))::INT % 16) - 8 AS w
        |  FROM (SELECT unnest(generate_series(0, 63)) AS j)),
        |sc AS (SELECT t.doc_id, t.source, len(max(t.toks)) AS n_toks,
        |    cast(coalesce(sum(w.w * cx.val), 0) as bigint) AS score
        |  FROM t LEFT JOIN cx ON cx.doc_id = t.doc_id LEFT JOIN w ON w.j = cx.d
        |  GROUP BY 1, 2),
        |per AS (SELECT source, cast(count(*) as bigint) AS n_docs,
        |    cast(sum(n_toks) as bigint) AS tokens, cast(sum(score) as bigint) AS s
        |  FROM sc GROUP BY 1),
        |uv AS (SELECT source, cast(count(*) as bigint) AS unique_vocab FROM
        |  (SELECT max(source) AS source FROM
        |    (SELECT DISTINCT source, sh FROM
        |      (SELECT source, unnest(
        |         [array_to_string(toks[i:i+2], ' ')
        |          FOR i IN generate_series(1, greatest(len(toks) - 2, 0))]) AS sh
        |       FROM t))
        |   GROUP BY sh HAVING count(DISTINCT source) = 1)
        |  GROUP BY 1),
        |tot AS (SELECT cast(sum(n_docs) as bigint) AS tn,
        |    cast(sum(tokens) as bigint) AS tt, cast(sum(s) as bigint) AS ts
        |  FROM per)
        |SELECT per.source, per.n_docs, per.tokens,
        |  (per.tokens * 1048576) // tot.tt AS token_share_q,
        |  coalesce(uv.unique_vocab, 0) AS unique_vocab,
        |  cast((1048576 * ((tot.ts - per.s)::HUGEINT * tot.tn
        |      - tot.ts::HUGEINT * (tot.tn - per.n_docs)))
        |    // (tot.tn::HUGEINT * (tot.tn - per.n_docs)) as bigint) AS dmean_q,
        |  cast((1048576 * ((tot.ts - per.s)::HUGEINT * tot.tn
        |      - tot.ts::HUGEINT * (tot.tn - per.n_docs)))
        |    // (tot.tn::HUGEINT * (tot.tn - per.n_docs)) as bigint) > 0 AS cut_candidate
        |FROM per LEFT JOIN uv USING (source) CROSS JOIN tot""".stripMargin,

    // q196 (sourceRedundancy): mean pairwise shingle Jaccard over a
    // per-source bottom-32-by-md5 doc sample — exact intersections,
    // quantize-then-average integer mean.
    "q196_source_redundancy" ->
      """WITH d AS (SELECT source, doc_id,
        |    list_distinct([array_to_string(toks[i:i+2], ' ')
        |      FOR i IN generate_series(1, greatest(len(toks) - 2, 0))]) AS shs,
        |    ('0x' || substr(md5('red_' || cast(doc_id as varchar)), 1, 13))::BIGINT AS h
        |  FROM (SELECT source, doc_id,
        |        regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |        FROM documents)),
        |smp AS (SELECT source, doc_id, shs FROM
        |  (SELECT *, row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
        |   FROM d)
        |  WHERE rn <= 32),
        |p AS (SELECT a.source,
        |    cast(len(list_intersect(a.shs, b.shs)) as bigint) AS inter,
        |    cast(len(a.shs) + len(b.shs) as bigint) AS szsum
        |  FROM smp a JOIN smp b ON a.source = b.source AND a.doc_id < b.doc_id),
        |j AS (SELECT source, CASE WHEN szsum - inter > 0
        |    THEN (inter * 1048576) // (szsum - inter) ELSE 0 END AS jac_q
        |  FROM p)
        |SELECT source, cast(count(*) as bigint) AS n_pairs,
        |  cast(sum(jac_q) as bigint) // count(*) AS mean_jac_q
        |FROM j GROUP BY 1""".stripMargin,

    // q198 (vocabCoverage): the TEXTBOOK rank-window construction — rank
    // the whole 3-shingle vocabulary by (ct DESC, term), sum the top V per
    // candidate size. The Spark side never sorts the vocabulary (it walks
    // the frequency-of-frequencies frame); coverage is tie-invariant, so
    // the two constructions are provably equal and this gate checks the
    // theorem, not a replay.
    "q198_vocab_coverage" ->
      """WITH tc AS (SELECT sh AS term, cast(count(*) as bigint) AS ct FROM
        |  (SELECT unnest(
        |     [array_to_string(toks[i:i+2], ' ')
        |      FOR i IN generate_series(1, greatest(len(toks) - 2, 0))]) AS sh
        |   FROM (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |         FROM documents))
        |  GROUP BY 1),
        |r AS (SELECT ct, row_number() OVER (ORDER BY ct DESC, term) AS rn FROM tc),
        |tot AS (SELECT cast(sum(ct) as bigint) AS total_tokens,
        |    cast(count(*) as bigint) AS v_obs FROM tc),
        |vs AS (SELECT cast(unnest([256, 1024, 4096, 16384]) as bigint) AS v)
        |SELECT vs.v, min(r.ct) AS threshold_ct,
        |  cast(sum(r.ct) as bigint) AS covered_tokens,
        |  max(tot.total_tokens) AS total_tokens, max(tot.v_obs) AS v_obs,
        |  ((max(tot.total_tokens) - cast(sum(r.ct) as bigint)) * 1000000)
        |    // max(tot.total_tokens) AS oov_ppm
        |FROM vs JOIN r ON r.rn <= vs.v CROSS JOIN tot
        |GROUP BY 1""".stripMargin,

    // q199 (kcenterCoreset): the greedy farthest-point traversal replayed
    // as unrolled CTE rounds — same 2²⁰ integer grid, (d² DESC, vec_id)
    // selection and (d², round) assignment tie orders as the Spark loop.
    "q199_kcenter_coreset" -> kcenterSql(8),

    // q200 (facilityLocation): greedy submodular representative selection
    // replayed as unrolled rounds — see the facilitySql scaladoc.
    "q200_facility_location" -> facilitySql(4, 16),

    // q201 (bhFdr): the BH step-up replayed with the SAME Scala-generated
    // z-space threshold constants the Spark side uses — see bhFdrSql.
    "q201_bh_fdr" -> bhFdrSql(0.05),

    // q202 (powerMde): the two-proportion power identity replayed with
    // the same Scala-computed z-sum constant — see powerMdeSql.
    "q202_power_mde" -> powerMdeSql(0.05, 0.8),
  )
}
