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

  test("c4Stats kernel rules fire on synthesized failure cases") {
    // the fixture text never trips the blocklist or word-length rules, so
    // each rule is proven on a doc constructed to fail exactly that rule
    val stop30 = Array.fill(15)("the zebra").mkString(" ") // 30 words, has stopword
    assert(c4Stats(stop30)._1 == 30L)
    val cases = Seq(
      ("short the doc", "rule_min_words"),                          // < 30 words
      (Array.fill(30)("a").mkString(" "), "rule_word_len"),         // mean len 1 < 3
      (Array.fill(30)("zebra").mkString(" "), "rule_stopword"),     // no stopword
      (Array.fill(30)("the zebra").mkString(" ") + " lorem ipsum", "rule_no_blocklist"),
      ("the quick { brace", "rule_no_blocklist"))
    for ((text, rule) <- cases) {
      val (wc, cs, stop, t2, u2, blocked) = c4Stats(text)
      val flags = Map(
        "rule_min_words" -> (wc >= 30),
        "rule_word_len" -> (cs >= wc * 3 && cs <= wc * 10),
        "rule_stopword" -> stop,
        "rule_no_blocklist" -> !blocked)
      assert(!flags(rule), s"'$rule' should fail for: ${text.take(40)}")
    }
    // repetition: 'the zebra' * 15 alternates two tokens => 2 distinct 2-grams
    // out of 29 => dup fraction ~0.93 => rule fails
    val (_, _, _, t2, u2, _) = c4Stats(stop30)
    assert(t2 == 29L && u2 == 2L && !(u2 * 2 >= t2), "repetition rule must fire")
  }

  test("scrubCol redacts emails, IPv4s, and digit runs; pseudonym is stable") {
    import spark.implicits._
    val df = Seq(
      ("contact bob@example.com now", 1L, 0L, 0L),
      ("server at 10.0.42.7 port", 0L, 1L, 0L),
      ("account 123456789 flagged", 0L, 0L, 1L),
      ("clean text only", 0L, 0L, 0L)).toDF("raw", "e", "i", "d")
    val (ne, ni, nd, red) = TextOps.scrubCol(col("raw"))
    val rows = df.select(col("raw"), ne.as("ne"), ni.as("ni"), nd.as("nd"), red.as("red"),
      col("e"), col("i"), col("d")).collect()
    for (r <- rows) {
      assert(r.getAs[Int]("ne").toLong == r.getAs[Long]("e"), r.toString)
      assert(r.getAs[Int]("ni").toLong == r.getAs[Long]("i"), r.toString)
      assert(r.getAs[Int]("nd").toLong == r.getAs[Long]("d"), r.toString)
      val redacted = r.getAs[String]("red")
      assert(!redacted.contains("@"), s"email must be gone: $redacted")
      if (r.getAs[Long]("e") > 0)
        assert(redacted.contains("[EMAIL]"), s"email row must carry the tag: $redacted")
      assert(!redacted.contains("123456789"), s"digit run must be gone: $redacted")
      assert(!redacted.contains("10.0.42.7"), s"ip must be gone: $redacted")
    }
    // pseudonymization is deterministic and injective on distinct inputs
    val p = TextOps.piiScrub(spark, sf001).select("pseudonym").collect().map(_.getString(0))
    assert(p.toSet.size == p.length, "pseudonyms must be distinct per customer")
  }

  test("sequencePacking two-pass prefix sum ≡ the single-partition window") {
    import org.apache.spark.sql.expressions.Window
    val packed = TextOps.sequencePacking(spark, sf001, budget = 512L, partitions = 8)
    // the point of the op: the work actually ran on >1 partition
    assert(packed.rdd.getNumPartitions > 1)
    val d = graft.Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), bpeTokenCountCol(col("text")).cast("long").as("n_tokens"))
      .withColumn("before",
        coalesce(sum("n_tokens").over(
          Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        (col("before") / 512).cast("long").as("seq_id"),
        (col("before") % 512).as("seq_offset"),
        (col("before") % 512 + col("n_tokens") > 512).as("spans_boundary"))
    assert(packed.exceptAll(d).isEmpty && d.exceptAll(packed).isEmpty,
      "distributed packing must equal the window version row-for-row")
  }

  test("langIdFast CJK short-circuit and tiebreak order") {
    assert(langIdFast("今天 the weather") == "zh") // any CJK char wins
    assert(langIdFast("the le la") == "en")        // en >= others wins ties
    assert(langIdFast("xyz qrs") == "en")          // all-zero counts fall to en
    assert(langIdFast(null) == "fr")               // column version: all nulls → otherwise
  }
}
