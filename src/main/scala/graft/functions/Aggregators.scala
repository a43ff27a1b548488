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
}
