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

  test("langIdFast CJK short-circuit and tiebreak order") {
    assert(langIdFast("今天 the weather") == "zh") // any CJK char wins
    assert(langIdFast("the le la") == "en")        // en >= others wins ties
    assert(langIdFast("xyz qrs") == "en")          // all-zero counts fall to en
    assert(langIdFast(null) == "fr")               // column version: all nulls → otherwise
  }
}
