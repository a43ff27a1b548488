package graft.functions

import graft.functions.TextFns._
import org.scalatest.funsuite.AnyFunSuite

class TextFnsSpec extends AnyFunSuite {

  test("tokenize: ASCII words, lowercased, punctuation-split") {
    assert(tokenize("Hello, World! x2") == Seq("hello", "world", "x2"))
    assert(tokenize("") == Seq.empty)
    assert(tokenize(null) == Seq.empty)
  }

  test("tokenize: CJK bigrams with unigram fallback") {
    assert(tokenize("今天天气") == Seq("今天", "天天", "天气"))
    assert(tokenize("搜indexed词") == Seq("搜", "indexed", "词"))
    assert(tokenize("spark 数据") == Seq("spark", "数据"))
  }

  test("minhash signature similarity approximates Jaccard") {
    val base = (1 to 60).map(i => s"tok$i shingle $i")
    val a = base
    val b = base.take(30) ++ (1 to 30).map(i => s"other$i") // J = 30/90 ≈ 0.33
    val est = sigSimilarity(
      minhash(a).toSeq, minhash(b).toSeq)
    assert(est > 0.13 && est < 0.55, s"estimate $est should be near 0.33")
    assert(sigSimilarity(minhash(a).toSeq, minhash(a).toSeq) == 1.0)
  }

  test("minhash is deterministic and permutation constants are fixed") {
    val s = Seq("a b c", "b c d")
    assert(minhash(s).toSeq == minhash(s).toSeq)
    assert(minhash(Seq.empty).forall(_ == Long.MaxValue))
  }

  test("simhash: identical docs collide, similar docs are close, disjoint far") {
    val a = ("the quick brown fox jumps over the lazy dog " * 5).split(" ").toSeq
    val b = a.updated(3, "wolf")
    val c = (1 to 40).map(i => s"zz$i")
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(simhash(a), simhash(a)) == 0)
    assert(ham(simhash(a), simhash(b)) < ham(simhash(a), simhash(c)))
  }

  test("shingleHashes matches fnv64 of the space-joined shingle strings") {
    val text = "The quick brown fox jumps over the lazy dog"
    val toks = tokenize(text)
    val expected = toks.sliding(3).map(w => fnv64(w.mkString(" "))).toSeq.distinct
    assert(shingleHashes(text).toSeq == expected)
    assert(shingleHashes("one two").isEmpty) // < n tokens
    assert(shingleHashes(null).isEmpty)
  }

  test("textBands: equal docs share all bands; disjoint docs share none") {
    val a = (1 to 50).map(i => s"w$i").mkString(" ")
    val c = (100 to 150).map(i => s"w$i").mkString(" ")
    assert(textBands(a, 16).toSeq == textBands(a, 16).toSeq)
    assert(textBands(a, 16).toSeq.intersect(textBands(c, 16).toSeq).isEmpty)
  }

  test("winnow: deterministic, subset-stable fingerprints") {
    val t = "the quick brown fox jumps over the lazy dog and keeps running far away"
    assert(winnow(t) == winnow(t))
    assert(winnow(t).nonEmpty)
    assert(winnow("short").isEmpty == ("short".length < 8))
  }

  test("rollingHash/fnv64 are stable (golden values)") {
    // pinned so an accidental constant change breaks loudly
    assert(fnv64("abc") == 0xe71fa2190541574bL)
    assert(rollingHash("abc") == (('a' * 1000003L + 'b') * 1000003L + 'c'))
  }

  test("property: tokenize output is lowercase alnum-only for random ASCII input") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val s = (1 to rnd.nextInt(80)).map(_ => (rnd.nextInt(95) + 32).toChar).mkString
      assert(tokenize(s).forall(t =>
        t.nonEmpty && t.forall(c => c.isDigit || (c >= 'a' && c <= 'z'))), s"input: $s")
    }
  }
}
