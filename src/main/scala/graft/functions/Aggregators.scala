package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed aggregators.
  *
  * [[ExactDistinctLong]] is the faithful port of the reference's
  * exact-distinct-via-HashSet pattern (bean/ProductStats.java:77-86,
  * ProductStatsApp.java:236-246: `orderIdSet.addAll(...)` then `size()`):
  * a partial-aggregating distinct count that, unlike `count(distinct x)`,
  * needs no second shuffle stage, and unlike `collect_set(...).size` never
  * materializes the set as a Catalyst array per output row.
  *
  * Scale note: state is O(distinct keys per group). That is exactly the
  * reference's memory profile (it holds the HashSet per window pane). For
  * unbounded-cardinality groups at 100 TB the right degradation is
  * `approx_count_distinct` (documented divergence, SURVEY §7.3).
  */
object Aggregators {

  val exactDistinctLong: Aggregator[Long, scala.collection.mutable.HashSet[Long], Long] =
    new Aggregator[Long, scala.collection.mutable.HashSet[Long], Long] {
      def zero: scala.collection.mutable.HashSet[Long] = scala.collection.mutable.HashSet.empty
      def reduce(s: scala.collection.mutable.HashSet[Long], v: Long) = { s += v; s }
      def merge(a: scala.collection.mutable.HashSet[Long], b: scala.collection.mutable.HashSet[Long]) = {
        if (a.size >= b.size) { a ++= b; a } else { b ++= a; b }
      }
      def finish(s: scala.collection.mutable.HashSet[Long]): Long = s.size.toLong
      def bufferEncoder: Encoder[scala.collection.mutable.HashSet[Long]] =
        Encoders.kryo[scala.collection.mutable.HashSet[Long]]
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** Column form: `exactDistinct(col("order_id"))` — usable in untyped agg. */
  def exactDistinct(c: Column): Column = udaf(exactDistinctLong).apply(c)

  /** One (value, id, payload) candidate for [[topK]]; id is the deterministic
    * tiebreak so results are engine/run-stable; p rides along un-ordered (a
    * detail column the caller wants back WITHOUT a join-back to the scored
    * relation — re-deriving the scored subtree twice is what a join-back
    * costs, since different column pruning on the two branches defeats
    * exchange reuse). */
  case class Scored(v: Double, id: Long, p: Long)

  /** Bounded top-k per group: keeps the k largest (v DESC, id ASC) entries.
    *
    * The scale story vs `row_number() OVER (PARTITION BY g ORDER BY v DESC)`:
    * the window shuffles EVERY row to its group's partition and sorts there;
    * this aggregator partially aggregates map-side, so each mapper forwards at
    * most k rows per group it saw — shuffled bytes drop from O(rows) to
    * O(groups·k·mappers), and no sort ever runs over the full data. State is
    * O(k) per group (a k-bounded insertion buffer — at k ≤ a few hundred,
    * linear insert beats a heap's constant factor).
    */
  def topKAgg(k: Int): Aggregator[(Double, Long, Long), scala.collection.mutable.ArrayBuffer[(Double, Long, Long)], Seq[Scored]] =
    new Aggregator[(Double, Long, Long), scala.collection.mutable.ArrayBuffer[(Double, Long, Long)], Seq[Scored]] {
      type Buf = scala.collection.mutable.ArrayBuffer[(Double, Long, Long)]
      // buffer invariant: sorted by (v DESC, id ASC), length ≤ k
      private def lt(a: (Double, Long, Long), b: (Double, Long, Long)): Boolean =
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
      private def insert(s: Buf, x: (Double, Long, Long)): Buf = {
        if (s.length == k && !lt(x, s.last)) return s
        var i = 0
        while (i < s.length && lt(s(i), x)) i += 1
        s.insert(i, x)
        if (s.length > k) s.remove(k)
        s
      }
      def zero: Buf = scala.collection.mutable.ArrayBuffer.empty
      def reduce(s: Buf, v: (Double, Long, Long)): Buf = insert(s, v)
      def merge(a: Buf, b: Buf): Buf = { b.foreach(insert(a, _)); a }
      def finish(s: Buf): Seq[Scored] = s.toSeq.map(t => Scored(t._1, t._2, t._3))
      def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    }

  /** Column form: `topK(3, col("price"), col("id"), col("ct"))` →
    * array<struct<v,id,p>> sorted by (v DESC, id ASC). */
  def topK(k: Int, value: Column, id: Column, payload: Column): Column =
    udaf(topKAgg(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong, Encoders.scalaLong))
      .apply(value, id, payload)

  /** [[Scored]] with a STRING identity — for top-k over term/token keys
    * (vocabulary induction), where the tiebreak is lexicographic. */
  case class ScoredStr(v: Double, id: String, p: Long)

  /** [[topKAgg]] with a string id: same k-bounded buffer, same
    * (v DESC, id ASC) order with the id compared lexicographically. */
  def topKStrAgg(k: Int): Aggregator[(Double, String, Long), scala.collection.mutable.ArrayBuffer[(Double, String, Long)], Seq[ScoredStr]] =
    new Aggregator[(Double, String, Long), scala.collection.mutable.ArrayBuffer[(Double, String, Long)], Seq[ScoredStr]] {
      type Buf = scala.collection.mutable.ArrayBuffer[(Double, String, Long)]
      private def lt(a: (Double, String, Long), b: (Double, String, Long)): Boolean =
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
      private def insert(s: Buf, x: (Double, String, Long)): Buf = {
        if (s.length == k && !lt(x, s.last)) return s
        var i = 0
        while (i < s.length && lt(s(i), x)) i += 1
        s.insert(i, x)
        if (s.length > k) s.remove(k)
        s
      }
      def zero: Buf = scala.collection.mutable.ArrayBuffer.empty
      def reduce(s: Buf, v: (Double, String, Long)): Buf = insert(s, v)
      def merge(a: Buf, b: Buf): Buf = { b.foreach(insert(a, _)); a }
      def finish(s: Buf): Seq[ScoredStr] = s.toSeq.map(t => ScoredStr(t._1, t._2, t._3))
      def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      def outputEncoder: Encoder[Seq[ScoredStr]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredStr]]()
    }

  /** Column form: `topKStr(5, col("ct"), col("term"), col("ct"))` →
    * array<struct<v,id,p>> sorted by (v DESC, id lexicographic ASC). */
  def topKStr(k: Int, value: Column, id: Column, payload: Column): Column =
    udaf(topKStrAgg(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.STRING, Encoders.scalaLong))
      .apply(value, id, payload)

  /** Element-wise Long sum over `array<int>` vectors — the distributed
    * k-means M-step accumulator ([[graft.operators.Similarity.kmeansAssign]]).
    * Partial aggregation with ONE dim-length Long buffer per group per task:
    * the M-step shuffles k·dim longs per mapper regardless of corpus size,
    * where a collect-and-sum (or posexplode + per-dimension groupBy) would
    * move dim× the corpus through the shuffle. Empty groups never occur
    * (the group key comes from the rows themselves); a zero-length buffer
    * only marks an untouched partial and merges as the identity. */
  val vecSumAgg: Aggregator[Seq[Int], Array[Long], Seq[Long]] =
    new Aggregator[Seq[Int], Array[Long], Seq[Long]] {
      def zero: Array[Long] = Array.emptyLongArray
      def reduce(b: Array[Long], v: Seq[Int]): Array[Long] = {
        val acc = if (b.length == 0) new Array[Long](v.length) else b
        var i = 0
        while (i < v.length) { acc(i) += v(i); i += 1 }
        acc
      }
      def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        if (a.length == 0) return b
        if (b.length == 0) return a
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      def finish(b: Array[Long]): Seq[Long] = b.toSeq
      def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
      def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }

  /** Column form: `vecSum(col("q"))` over `array<int>` → `array<bigint>`. */
  def vecSum(c: Column): Column =
    udaf(vecSumAgg,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()).apply(c)

  /** MISRA–GRIES frequent-items sketch [Misra & Gries 1982], with the
    * MERGEABLE combine of Agarwal et al. ("Mergeable Summaries", PODS'12):
    * k counters bound the state; any item's estimate underestimates its
    * true count by at most n/(k+1) REGARDLESS of how partial sketches are
    * merged, and any item with true count > n/(k+1) is guaranteed present
    * in the final sketch. That order-independence of the GUARANTEE (not of
    * the counter values — those vary with partitioning) is what makes the
    * q132 self-check flags deterministic while the sketch itself is not.
    *
    * reduce: classic MG — hit increments; miss inserts while capacity
    * remains, else decrements every counter (dropping zeros). Miss cost is
    * O(k); at the k ≤ a few dozen this operator uses, that is cheaper than
    * a heap's constant factor (same call as [[topKAgg]]'s linear buffer).
    * merge: pointwise-sum both maps, then subtract the (k+1)-th largest
    * combined count from all and keep positives — the PODS'12 merge, which
    * is what preserves the n/(k+1) bound under Spark's arbitrary partial-
    * aggregation merge tree. State is O(k) per group and map-side
    * combinable: each mapper forwards one k-entry map, never the stream. */
  def misraGriesAgg(k: Int): Aggregator[String, scala.collection.mutable.HashMap[String, Long], Map[String, Long]] =
    new Aggregator[String, scala.collection.mutable.HashMap[String, Long], Map[String, Long]] {
      type Buf = scala.collection.mutable.HashMap[String, Long]
      def zero: Buf = scala.collection.mutable.HashMap.empty
      def reduce(s: Buf, v: String): Buf = {
        s.get(v) match {
          case Some(c) => s.update(v, c + 1L)
          case None if s.size < k => s.update(v, 1L)
          case None =>
            // decrement-all: every counter loses 1, zeros evict
            val dead = scala.collection.mutable.ArrayBuffer.empty[String]
            s.foreach { case (key, c) => if (c == 1L) dead += key else s.update(key, c - 1L) }
            dead.foreach(s.remove)
        }
        s
      }
      def merge(a: Buf, b: Buf): Buf = {
        if (b.isEmpty) return a
        if (a.isEmpty) return b
        b.foreach { case (key, c) => a.update(key, a.getOrElse(key, 0L) + c) }
        if (a.size > k) {
          // (k+1)-th largest combined count, subtracted from everyone
          val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          a.foreach { case (key, c) =>
            if (c - cut <= 0L) dead += key else a.update(key, c - cut)
          }
          dead.foreach(a.remove)
        }
        a
      }
      def finish(s: Buf): Map[String, Long] = s.toMap
      def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      def outputEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    }

  /** Column form: `misraGries(8, col("key"))` → `map<string,bigint>`. */
  def misraGries(k: Int, c: Column): Column =
    udaf(misraGriesAgg(k), Encoders.STRING).apply(c)

  /** PLURALITY vote per group (q175 LPA's per-round argmax): the value with
    * the highest count, ties to the SMALLEST value — exactly
    * `max(struct(ct, -lbl))` over per-(group, lbl) counts, but in ONE
    * exchange where the two-groupBy form pays two (r18, guide §2.4: the
    * first agg's (node, lbl) exchange carries the edge-grain join output,
    * corpus-scale for a kNN graph; this partial-aggregates the same votes
    * map-side into per-group count maps and ships those once). State is
    * O(distinct labels per group) = O(degree) for LPA neighbor votes — the
    * exactDistinctLong memory class, bounded by the kNN fan-in. */
  val pluralityLongAgg: Aggregator[Long, scala.collection.mutable.HashMap[Long, Long], Long] =
    new Aggregator[Long, scala.collection.mutable.HashMap[Long, Long], Long] {
      type Buf = scala.collection.mutable.HashMap[Long, Long]
      def zero: Buf = scala.collection.mutable.HashMap.empty
      def reduce(s: Buf, v: Long): Buf = { s.update(v, s.getOrElse(v, 0L) + 1L); s }
      def merge(a: Buf, b: Buf): Buf = {
        val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
        small.foreach { case (k, c) => big.update(k, big.getOrElse(k, 0L) + c) }
        big
      }
      def finish(s: Buf): Long = {
        var bestL = Long.MaxValue; var bestC = -1L
        s.foreach { case (l, c) =>
          if (c > bestC || (c == bestC && l < bestL)) { bestL = l; bestC = c }
        }
        bestL
      }
      def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** Column form: `plurality(col("lbl"))` → the most frequent value, ties
    * to the smallest. */
  def plurality(c: Column): Column = udaf(pluralityLongAgg).apply(c)
}
