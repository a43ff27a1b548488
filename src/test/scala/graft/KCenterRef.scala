package graft

/** Driver-side reference for the q199 greedy k-center (Gonzalez traversal)
  * on the 2²⁰ grid — ONE definition shared by the batch spec
  * (DedupSimilaritySpec) and the streaming spec (KCenterStreamSpec) so the
  * reference cannot drift from itself. Semantics mirror the production
  * `Similarity.kcenterSelect` exactly: seed = lowest vec_id, each round the
  * (min-dist² DESC, vec_id ASC) maximum over the NOT-YET-CHOSEN points
  * (the duplicate-embedding exclusion, round-14 ADVICE #2), rounds clamped
  * at the point count. */
object KCenterRef {

  def grid(v: Seq[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 1048576.0).toLong).toArray

  def d2(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
    s
  }

  /** The greedy selection: (round, vecId, selD2, qv) in selection order. */
  def greedy(pts: Seq[(Long, Array[Long])], k: Int)
  : Seq[(Int, Long, Long, Array[Long])] = {
    val sorted = pts.sortBy(_._1)
    val chosen = scala.collection.mutable.ArrayBuffer(
      (0, sorted.head._1, 0L, sorted.head._2))
    val mind = scala.collection.mutable.Map(
      sorted.map(p => p._1 -> d2(p._2, sorted.head._2)).toSeq: _*)
    for (r <- 1 until math.min(k, sorted.length)) {
      val chosenIds = chosen.map(_._2).toSet
      val (vid, dd) = sorted.filterNot(p => chosenIds(p._1))
        .map(p => (p._1, mind(p._1)))
        .maxBy { case (id, d) => (d, -id) }
      val qv = sorted.find(_._1 == vid).get._2
      chosen += ((r, vid, dd, qv))
      sorted.foreach(p => mind(p._1) = math.min(mind(p._1), d2(p._2, qv)))
    }
    chosen.toSeq
  }

  /** Every point's (d², round) Voronoi assignment against a chosen set —
    * nearest center, ties to the earliest round. */
  def assign(pts: Seq[(Long, Array[Long])], centers: Seq[(Int, Array[Long])])
  : Map[Long, (Long, Int)] =
    pts.map { p =>
      p._1 -> centers.map(c => (d2(p._2, c._2), c._1)).minBy(identity)
    }.toMap
}
