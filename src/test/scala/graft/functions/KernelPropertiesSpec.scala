package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.TextFns._

/** Property tests for the cross-engine-exact kernels the round-5 oracles
  * depend on: the oracle SQL re-derives these values independently, so any
  * hidden input-dependence (nulls, short strings, repeated tokens) would
  * surface as a driver hash mismatch — catch it here first on generated
  * inputs rather than only on the fixture.
  */
object KernelPropertiesSpec extends Properties("graft.kernels") {

  private val asciiText: Gen[String] =
    Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        (8, Gen.alphaLowerChar), (1, Gen.numChar), (2, Gen.const(' ')))).map(_.mkString))

  // direct polynomial evaluation — independent of the sliding kernel
  private def directGrams(t: String): Seq[Long] =
    (0 to t.length - 8).map(i =>
      t.substring(i, i + 8).foldLeft(0L)((h, c) => (h * WinnowBase + c) % WinnowMod))

  property("winnow emits only k-gram hashes, incl. the global min; empty below k") =
    Prop.forAll(asciiText) { t =>
      val fps = winnow(t).toSet
      if (t.length < 8) fps.isEmpty
      else {
        val grams = directGrams(t).toSet
        fps.nonEmpty && fps.subsetOf(grams) && fps.contains(grams.min)
      }
    }

  property("winnow is deterministic and its O(1) slide ≡ direct polynomial") =
    Prop.forAll(asciiText) { t =>
      winnow(t) == winnow(t) && (t.length < 8 || {
        // window-min over direct grams reproduces the kernel exactly
        val g = directGrams(t)
        val expected =
          if (g.length <= 16) Seq(g.min)
          else {
            val out = scala.collection.mutable.LinkedHashSet.empty[Long]
            (0 to g.length - 16).foreach(i => out += g.slice(i, i + 16).min)
            out.toSeq
          }
        winnow(t) == expected
      })
    }

  property("simhash commutes over token order and tf scaling; empty → 0") =
    Prop.forAll(Gen.listOf(Gen.identifier.map(_.take(8)))) { toks =>
      val h = simhash(toks)
      simhash(toks.reverse) == h &&
        simhash(toks ++ toks) == h &&
        (toks.nonEmpty || h == 0L)
    }

  property("gramCounts multiplicities sum to the span-position count") =
    Prop.forAll(asciiText, Gen.oneOf(2, 3, 10)) { (t, n) =>
      val m = gramCounts(t, n)
      // reference tokenization = the oracle's regex, independent of the kernel
      val toks = "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq
      m.values.sum == math.max(toks.length - n + 1, 0) &&
        m.keys.forall(g => g.split(' ').length == n)
    }

  property("hyperplaneSig is stable across calls and within Int range of nPlanes bits") =
    Prop.forAll(Gen.listOfN(64, Gen.chooseNum(-1.0f, 1.0f))) { v =>
      val s4 = VectorFns.hyperplaneSig(v, 4)
      VectorFns.hyperplaneSig(v, 4) == s4 && s4 >= 0 && s4 < 16
    }

  property("hashEmbed is additive over concatenation and order-free; |vec|₁ ≤ token count") =
    Prop.forAll(Gen.listOf(Gen.identifier.map(_.take(8)))) { toks =>
      val v = hashEmbed(toks)
      val doubled = hashEmbed(toks ++ toks)
      val shuffled = hashEmbed(toks.reverse)
      v.length == 64 &&
        doubled.toSeq == v.map(_ * 2).toSeq &&
        shuffled.toSeq == v.toSeq &&
        v.map(math.abs).sum <= toks.length
    }

  property("classifierScore ≡ weights · hashEmbed, and is additive like its features") =
    Prop.forAll(Gen.listOf(Gen.identifier.map(_.take(8)))) { toks =>
      val s = classifierScore(toks)
      val x = hashEmbed(toks)
      s == (0 until 64).map(j => classifierWeights(j) * x(j)).sum &&
        classifierScore(toks ++ toks) == 2 * s
    }

  property("cdcSegments exactly partitions any string; boundaries are content-defined") =
    Prop.forAll(asciiText) { t =>
      val segs = cdcSegments(t)
      val contiguous = segs.head._1 == 1 &&
        segs.sliding(2).forall {
          case Seq(a, b) => a._1 + a._2 == b._1
          case _ => true
        }
      val covers = segs.map(_._2).sum == t.length
      // shift resistance: every non-leading original chunk text survives a
      // single-char prefix insertion (boundaries re-derive from content)
      val origTexts = segs.map { case (s, l) => t.substring(s - 1, s - 1 + l) }
      val shifted = cdcSegments("Z" + t)
        .map { case (s, l) => ("Z" + t).substring(s - 1, s - 1 + l) }.toSet
      contiguous && covers && origTexts.drop(1).forall(shifted.contains)
    }

  property("projectPlanes: linear in the 2^20 grid quantization, sign-consistent with hyperplaneSig") =
    Prop.forAll(Gen.listOfN(64, Gen.chooseNum(-1.0f, 1.0f))) { v =>
      val p = VectorFns.projectPlanes(v, 4)
      val sig = VectorFns.hyperplaneSig(v, 4)
      p.length == 4 && (0 until 4).forall(i => (p(i) >= 0) == (((sig >> i) & 1) == 1))
    }

  // topK / topKStr buffer algebra: reduce over arbitrary partition splits,
  // then merge, must equal the global sort — the partial-aggregation
  // correctness the q14/q65/q80 scale paths stand on. Values are drawn from
  // a SMALL grid so ties (the tiebreak path) occur constantly.
  private val scoredRows: Gen[List[(Double, Long, Long)]] =
    Gen.listOf(for {
      v <- Gen.chooseNum(0, 5); id <- Gen.chooseNum(0L, 30L); p <- Gen.chooseNum(0L, 9L)
    } yield (v.toDouble, id, p))

  property("topKAgg over any partitioning ≡ global (v DESC, id ASC) sort take k") =
    Prop.forAll(scoredRows, Gen.oneOf(1, 3, 7), Gen.chooseNum(1, 5)) { (rows, k, nParts) =>
      val agg = Aggregators.topKAgg(k)
      val parts = rows.zipWithIndex.groupMap(_._2 % nParts)(_._1).values
      val merged = parts
        .map(p => p.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
        .foldLeft(agg.zero)((a, b) => agg.merge(a, b))
      val expected = rows.distinct.sortBy { case (v, id, _) => (-v, id) }
      // duplicates of the same (v,id) tuple may both survive — compare on
      // the ordered (v,id) sequence the contract defines
      val got = agg.finish(merged).map(s => (s.v, s.id))
      got == rows.sortBy { case (v, id, _) => (-v, id) }.map(t => (t._1, t._2)).take(k) &&
        got.length <= k && (expected.nonEmpty || got.isEmpty)
    }

  property("topKStrAgg over any partitioning ≡ global (v DESC, id lex ASC) sort take k") =
    Prop.forAll(
      Gen.listOf(for {
        v <- Gen.chooseNum(0, 5); id <- Gen.oneOf("a", "b", "ab", "ba", "z", "aa")
        p <- Gen.chooseNum(0L, 9L)
      } yield (v.toDouble, id, p)),
      Gen.oneOf(1, 3, 7), Gen.chooseNum(1, 5)) { (rows, k, nParts) =>
      val agg = Aggregators.topKStrAgg(k)
      val parts = rows.zipWithIndex.groupMap(_._2 % nParts)(_._1).values
      val merged = parts
        .map(p => p.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
        .foldLeft(agg.zero)((a, b) => agg.merge(a, b))
      val got = agg.finish(merged).map(s => (s.v, s.id))
      got == rows.sortBy { case (v, id, _) => (-v, id) }.map(t => (t._1, t._2)).take(k)
    }
}
