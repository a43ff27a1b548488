package graft.operators

import graft.SparkSuite
import graft.functions.TextFns._
import org.apache.spark.sql.functions._

/** Gates for the single-pass text kernels that replace composable column
  * chains on hot paths: the kernel must be row-for-row identical to the
  * column version it replaces on real testdata.
  */
class TextOpsSpec extends SparkSuite {

  test("langIdFast kernel ≡ the composable column version on real docs") {
    val d = graft.Tables.load(spark, sf001, "documents")
    val mismatches = d
      .withColumn("kernel", langIdFastUdf(col("text")))
      .withColumn("cols", langIdCol(col("text")))
      .filter(col("kernel") =!= col("cols"))
      .count()
    assert(mismatches == 0, s"$mismatches docs where kernel != column langId")
  }

  test("tfidfTopTerms broadcasts the vocabulary side of the df join") {
    val plan = TextOps.tfidfTopTerms(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"df (vocabulary) join must broadcast, not shuffle the corpus:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("balancedSample caps every language at the minority count") {
    val rows = TextOps.balancedSample(spark, sf001).collect()
    val kept = rows.map(_.getAs[Long]("kept_docs")).toSet
    assert(kept.size == 1, s"every lang keeps exactly K docs: $rows")
  }

  test("langIdFast CJK short-circuit and tiebreak order") {
    assert(langIdFast("今天 the weather") == "zh") // any CJK char wins
    assert(langIdFast("the le la") == "en")        // en >= others wins ties
    assert(langIdFast("xyz qrs") == "en")          // all-zero counts fall to en
    assert(langIdFast(null) == "fr")               // column version: all nulls → otherwise
  }
}
