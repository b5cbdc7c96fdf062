package graft.frontier

import org.scalatest.funsuite.AnyFunSuite

/** Cuckoo filter contract (Fan et al. 2014 construction): zero false
  * negatives at and beyond design load, fpp far under the bloom default,
  * working deletion, deterministic serialized state, stash-backed overfill
  * behavior, and LSM interop through the SeenSet filter codec. */
class CuckooFilterSpec extends AnyFunSuite {

  private def urls(n: Int, tag: String): Vector[String] =
    (0 until n).map(i => s"https://h${i % 97}.example/$tag/p$i.html").toVector

  test("no false negatives at design load; fpp well under the bloom default") {
    val n = 100000
    val in = urls(n, "in")
    val cf = CuckooFilter.create(n)
    in.foreach(cf.put)
    assert(in.forall(cf.mightContain), "false negative on an inserted url")
    val probe = urls(200000, "absent")
    val fp = probe.count(cf.mightContain)
    // theoretical bound 2*4/2^16 ~ 1.2e-4; allow 4x slack on 200k probes
    assert(fp <= (200000 * 1.2e-4 * 4).toInt,
      s"fpp too high: $fp false positives over 200k probes")
  }

  test("delete removes an inserted url; survivors keep zero false negatives") {
    val in = urls(20000, "d")
    val cf = CuckooFilter.create(20000)
    in.foreach(cf.put)
    val (gone, kept) = in.splitAt(5000)
    gone.foreach(u => assert(cf.delete(u), s"delete failed for inserted url $u"))
    assert(kept.forall(cf.mightContain), "deletion caused a false negative on a survivor")
    // deleted urls mostly gone (residual hits are other urls' colliding
    // fingerprints — bounded by fpp, not by deletion correctness)
    val residual = gone.count(cf.mightContain)
    assert(residual <= 10, s"deleted urls still present: $residual of 5000")
    assert(cf.delete(urls(1, "no").head) == false || true) // never throws
  }

  test("multiset inserts: delete removes ONE copy, a second identical insert survives") {
    // the mechanism that keeps deletion safe under (bucket, fingerprint)
    // collisions between different urls: every put stores a copy, so
    // removing one occurrence never false-negatives the other
    val cf = CuckooFilter.create(1024)
    val u = "https://twice.example/p.html"
    cf.put(u); cf.put(u)
    assert(cf.delete(u))
    assert(cf.mightContain(u), "second inserted copy must survive one delete")
    assert(cf.delete(u))
    assert(!cf.mightContain(u))
  }

  test("overfill parks victims in the stash: still zero false negatives at 130% load") {
    val cap = 4096
    val in = urls((cap * 1.3).toInt, "of")
    val cf = CuckooFilter.create(cap)
    in.foreach(cf.put)
    assert(in.forall(cf.mightContain), "overfull filter false-negatived")
  }

  test("serialization round-trips exactly and is insert-order deterministic") {
    val in = urls(30000, "s")
    def build(): CuckooFilter = {
      val cf = CuckooFilter.create(30000)
      in.foreach(cf.put)
      cf
    }
    val a = build().serialized
    val b = build().serialized
    assert(java.util.Arrays.equals(a, b),
      "same insert order must produce identical bytes (replay-exactness)")
    val back = CuckooFilter.deserialize(a)
    assert(in.forall(back.mightContain))
    assert(back.size == build().size)
    // deserialized filter keeps working (insert + delete)
    back.put("https://new.example/x.html")
    assert(back.mightContain("https://new.example/x.html"))
    assert(back.delete(in.head))
  }

  test("payload sniffing: cuckoo magic vs spark bloom bytes") {
    val cf = CuckooFilter.create(64)
    cf.put("https://a.example/")
    assert(CuckooFilter.isCuckooPayload(cf.serialized))
    val bf = org.apache.spark.util.sketch.BloomFilter.create(64, 0.01)
    bf.putString("https://a.example/")
    assert(!CuckooFilter.isCuckooPayload(SeenSet.serialize(bf)))
    // codec dispatches both ways
    assert(SeenSet.deserializeFilter(cf.serialized).mightContain("https://a.example/"))
    assert(SeenSet.deserializeFilter(SeenSet.serialize(bf)).mightContain("https://a.example/"))
  }
}
