package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Parity vs CPython urllib.parse.urljoin over the generated golden corpus
  * (495 (base, rel, expected) triples covering RFC 3986 §5 corner cases). */
class UrlJoinSpec extends AnyFunSuite {

  private def lines(name: String): Vector[String] = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    require(in != null, s"missing golden $name")
    Source.fromInputStream(in, "UTF-8").getLines().toVector
  }

  test("urljoin matches CPython on the golden corpus") {
    var failures = List.empty[String]
    var count = 0
    for (l <- lines("urljoin_pairs.tsv") if l.nonEmpty) {
      val Array(base, rel, expected) = l.split("\t", -1)
      val got = PyUrl.urljoin(base, rel)
      count += 1
      if (got != expected)
        failures ::= s"urljoin($base, $rel) = $got, expected $expected"
    }
    assert(count > 400)
    assert(failures.isEmpty, s"\n${failures.reverse.take(25).mkString("\n")}\n(${failures.size} of $count failed)")
  }
}
