package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5.2(3)): invariants that goldens can't pin.
  * Minimal deterministic forAll (scalatestplus bridge unavailable offline):
  * 200 samples per property from a fixed seed. */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A])(check: A => Unit): Unit = forAllN(gen, 200)(check)

  private def forAllN[A](gen: Gen[A], samples: Int)(check: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    var n = 0
    while (n < samples && i < samples * 10) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(v) => check(v); n += 1
        case None    => ()
      }
      seed = seed.next
      i += 1
    }
    assert(n >= samples / 2, s"generator too sparse: only $n samples")
  }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "ftp", "mailto", "")
    host <- Gen.oneOf("example.com", "HOST.Example.COM:8080", "h.x:443", "a.b.c")
    path <- Gen.listOfN(3, Gen.oneOf("a", "b%20c", "..", ".", "x.y", "")).map(_.mkString("/"))
    q <- Gen.oneOf("", "?q=1", "?a=%41")
    f <- Gen.oneOf("", "#frag")
  } yield if (scheme.isEmpty) s"//$host/$path$q$f" else s"$scheme://$host/$path$q$f"

  test("utf-8 fast path: isValidUtf8 accept/reject and value match the strict decoder") {
    import java.nio.charset.{StandardCharsets, CodingErrorAction}
    // byte-array generator biased toward UTF-8 boundary cases: valid
    // multi-byte sequences, overlongs, surrogates, truncations, stray
    // continuations, and random noise
    val interesting: Gen[Array[Byte]] = {
      val chunk: Gen[Array[Byte]] = Gen.oneOf(
        Gen.asciiPrintableStr.map(_.getBytes(StandardCharsets.US_ASCII)),
        Gen.oneOf("é", "€", "中", "𝄞", "߿", "�").map(_.getBytes(StandardCharsets.UTF_8)),
        Gen.oneOf[Array[Byte]](
          Array(0xC0.toByte, 0xAF.toByte),               // overlong '/'
          Array(0xE0.toByte, 0x80.toByte, 0x80.toByte),  // overlong NUL
          Array(0xED.toByte, 0xA0.toByte, 0x80.toByte),  // surrogate D800
          Array(0xF4.toByte, 0x90.toByte, 0x80.toByte, 0x80.toByte), // > 10FFFF
          Array(0xF5.toByte, 0x80.toByte),               // invalid lead
          Array(0x80.toByte),                            // stray continuation
          Array(0xE2.toByte, 0x82.toByte),               // truncated 3-byte
          Array(0xF0.toByte, 0x9D.toByte, 0x84.toByte))) // truncated 4-byte
      Gen.listOf(chunk).map(_.flatten.toArray)
    }
    forAll(interesting) { bytes =>
      val strict = try {
        Some(StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(CodingErrorAction.REPORT)
          .onUnmappableCharacter(CodingErrorAction.REPORT)
          .decode(java.nio.ByteBuffer.wrap(bytes)).toString)
      } catch { case _: java.nio.charset.CharacterCodingException => None }
      assert(Rewriter.isValidUtf8(bytes) == strict.isDefined,
        s"validator disagrees with strict decoder on ${bytes.map(b => f"$b%02x").mkString(" ")}")
      if (strict.isDefined)
        assert(new String(bytes, StandardCharsets.UTF_8) == strict.get)
    }
  }

  test("css one-pass splice == sequential global replace whenever it claims equivalence") {
    // tiny alphabet forces frequent substring/overlap/containment collisions
    // AND the junction-consume shape (self-overlapping matches 'aa'/'bb'
    // whose alignment a replacement boundary can shift — the class the
    // round-4 review proved the first verification design blind to)
    val tok = Gen.oneOf("a", "b", "ab", "ba", "aa", "bb", "a.p", "x/a.p", ".", "/")
    val gen: Gen[(String, IndexedSeq[(String, String)])] = for {
      content <- Gen.listOf(tok).map(_.mkString)
      n <- Gen.choose(0, 4)
      repl <- Gen.listOfN(n, for { m <- tok; r <- tok } yield (m, r))
    } yield (content, repl.filter { case (m, r) => m.nonEmpty && m != r }
               .distinctBy(_._1).toIndexedSeq)
    var accepted = 0
    forAllN(gen, 5000) { case (content, repl) =>
      val out = new StringBuilder
      if (Rewriter.onePassCssSplice(content, repl, out)) {
        accepted += 1
        var c = content
        for ((m, r) <- repl) c = c.replace(m, r)
        assert(out.toString == c,
          s"splice mismatch for content='$content' repl=$repl: got '${out.toString}' want '$c'")
      }
    }
    assert(accepted > 100, s"guards too conservative: only $accepted accepted samples")
    // the review's confirmed counterexamples pin the junction-consume class
    for ((content, repl) <- Seq(
      ("abbaa", IndexedSeq(("bb" -> "ba"), ("aa" -> "ba"))),
      ("baaaa", IndexedSeq(("b" -> "ba"), ("aa" -> "bb"))))) {
      val want = repl.foldLeft(content) { case (c, (m, r)) => c.replace(m, r) }
      val out = new StringBuilder
      Rewriter.cssReplaceAll(content, repl, out)
      assert(out.toString == want,
        s"junction-consume parity: content='$content' got '${out.toString}' want '$want'")
    }
  }

  test("cssReplaceAll == sequential chain under DUPLICATED pairs (effective-replacement fold)") {
    // the duplicate path: a pair appearing k times applies its replace k
    // times sequentially (observable double-rewrite when r contains m);
    // cssReplaceAll folds that into an effective replacement and must
    // match the literal chain on every input, falling back when unsure
    val tok = Gen.oneOf("a", "b", "ab", "ba", "aa", "bb", "Xab", "bX", "a.p", "/a", ".")
    val gen = for {
      content <- Gen.listOf(tok).map(_.mkString)
      n <- Gen.choose(0, 5)
      chain <- Gen.listOfN(n, for { m <- tok; r <- tok } yield (m, r))
    } yield (content, chain.filter { case (m, r) => m.nonEmpty && m != r })
    forAllN(gen, 5000) { case (content, chain0) =>
      // duplicates with a CONSISTENT replacement per match (the resolver
      // memoizes per match, so real chains always satisfy this)
      val byMatch = chain0.toMap
      val chain = chain0.map { case (m, _) => (m, byMatch(m)) }.toIndexedSeq
      val want = chain.foldLeft(content) { case (c, (m, r)) => c.replace(m, r) }
      val out = new StringBuilder
      Rewriter.cssReplaceAll(content, chain, out)
      assert(out.toString == want,
        s"cssReplaceAll mismatch for content='$content' chain=$chain: got '${out.toString}' want '$want'")
    }
    // the Wikipedia-fixture shape: duplicated root-relative url whose
    // absolute replacement ends with it — folds to H*k + m
    val m = "/w/img/x.png"
    val r = "https://en.example" + m
    val out = new StringBuilder
    Rewriter.cssReplaceAll(s"url($m) body url($m)",
      IndexedSeq((m, r), (m, r)), out)
    val want = Seq((m, r), (m, r)).foldLeft(s"url($m) body url($m)") {
      case (c, (mm, rr)) => c.replace(mm, rr)
    }
    assert(out.toString == want && want.contains("https://en.examplehttps://en.example"),
      s"double-rewrite fold: got '${out.toString}' want '$want'")
  }

  test("css splice verification: junction-formed matches force fallback; benign boundaries splice") {
    def seq(content: String, repl: Seq[(String, String)]): String =
      repl.foldLeft(content) { case (c, (m, r)) => c.replace(m, r) }
    def spliceOrNone(content: String, repl: IndexedSeq[(String, String)]): Option[String] = {
      val out = new StringBuilder
      if (Rewriter.onePassCssSplice(content, repl, out)) Some(out.toString) else None
    }
    // ACTUAL junction: '.'->'b' next to 'a' forms m1='ab' which the
    // sequential chain rewrites — verification must roll back
    assert(spliceOrNone("a.", IndexedSeq(("." -> "b"), ("ab" -> "X"))).isEmpty)
    // rollback leaves output untouched even when non-empty before the call
    locally {
      val out = new StringBuilder("pre")
      assert(!Rewriter.onePassCssSplice("a.", IndexedSeq(("." -> "b"), ("ab" -> "X")), out))
      assert(out.toString == "pre")
    }
    // empty replacement whose deletion joins neighbors into another match
    assert(spliceOrNone("a.b", IndexedSeq(("." -> ""), ("ab" -> "X"))).isEmpty)
    // the ADVICE r3 end-to-end shape is covered by the processCssResource
    // parity test below; the REDUCED pair here has no junction in the
    // actual content, so r4's verification accepts it — with the
    // sequential result (r3's pre-guard refused on the mere possibility)
    for ((c, r) <- Seq(
      ("url(./x) url(d/x.png)",
        IndexedSeq(("./x" -> "https://h.x/d/x"), ("d/x.png" -> "pf/x.png"))),
      ("u v", IndexedSeq(("u" -> "w!"), ("v w" -> "z"))),
      ("q r", IndexedSeq(("q" -> "o"), ("xoy" -> "z"))),
      // 1-char boundary coincidence (r0 ends 'b', m1 starts 'b') with no
      // junction in content — the common base64-data-URI shape that made
      // the r3 guard fall back ~1/64 of the time per pair
      ("url(a.png) url(b.png)", IndexedSeq(("a.png" -> "xb"), ("b.png" -> "y")))
    )) {
      val got = spliceOrNone(c, r)
      assert(got.contains(seq(c, r)), s"content='$c': got $got want ${seq(c, r)}")
    }
    // and a junction-free pair is still accepted one-pass
    assert(spliceOrNone("url(one) url(two)",
      IndexedSeq(("one" -> "pf/1.css"), ("two" -> "pf/2.css")))
      .contains("url(pf/1.css) url(pf/2.css)"))
  }

  test("css junction rewrite parity end-to-end (ADVICE r3: comment text re-formed by splice miss)") {
    // util.py:236-276 sequential semantics: replace('./x','https://h.x/d/x')
    // rewrites the COMMENT's './x.png' too, and the later
    // replace('d/x.png', ...) then rewrites the junction-formed 'd/x.png'
    // inside the rewritten comment. Byte parity requires the sequential path.
    import graft.model.{WArchive, WResource}
    val png = WResource(Array[Byte](9), "image/png", "https://h.x/d/d/x.png", None, None)
    val mainRes = WResource("<html></html>".getBytes("UTF-8"), "text/html",
      "https://h.x/d/index.html", Some("utf-8"), None)
    val ctx = new Rewriter.ArchiveCtx(WArchive(mainRes, Vector(png), Vector.empty))
    val css = WResource(
      "/* ./x.png */ .a{background:url(./x)} .b{background:url(d/x.png)}".getBytes("UTF-8"),
      "text/css", "https://h.x/d/style.css", Some("utf-8"), None)
    val out = new StringBuilder
    Rewriter.processCssResource(ctx, css, out, "page_files", 0)
    // sequential chain: './x' -> absolute fallback 'https://h.x/d/x'
    // (comment becomes '/* https://h.x/d/x.png */'), then 'd/x.png' ->
    // 'page_files/x.png' rewrites BOTH the url() and the junction in the
    // comment
    assert(out.toString ==
      "/* https://h.x/page_files/x.png */ .a{background:url(https://h.x/d/x)} .b{background:url(page_files/x.png)}")
  }

  test("css duplicate-match double-rewrite parity (reference sequential semantics)") {
    // the reference replaces per match OCCURRENCE: a duplicated relative url
    // whose local path contains the match string gets rewritten TWICE
    // (verified against CPython: 'a.png' -> 'page_files/page_files/a.png')
    import graft.model.{WArchive, WResource}
    val png = WResource(Array[Byte](1, 2, 3), "image/png", "https://h.x/d/a.png", None, None)
    val mainRes = WResource("<html></html>".getBytes("UTF-8"), "text/html",
      "https://h.x/d/index.html", Some("utf-8"), None)
    val ctx = new Rewriter.ArchiveCtx(WArchive(mainRes, Vector(png), Vector.empty))
    def css(body: String) = WResource(body.getBytes("UTF-8"), "text/css",
      "https://h.x/d/style.css", Some("utf-8"), None)
    val out = new StringBuilder
    Rewriter.processCssResource(ctx,
      css(".a{background:url(a.png)} .b{background:url(a.png)}"), out, "page_files", 0)
    assert(out.toString ==
      ".a{background:url(page_files/page_files/a.png)} .b{background:url(page_files/page_files/a.png)}")
    // a SINGLE occurrence is rewritten once (String.replace never rescans
    // its own insertion within one call)
    val out1 = new StringBuilder
    Rewriter.processCssResource(ctx, css(".a{background:url(a.png)}"), out1, "page_files", 0)
    assert(out1.toString == ".a{background:url(page_files/a.png)}")
  }

  test("cssUrlFindAll == regex findall (url\\(([^\\)]+)\\)) on adversarial css") {
    // the hand scanner replaced the BnM regex on the extraction hot path
    // (r5); exact emulation incl. empty-group url(), unclosed parens,
    // overlapping/nested candidates, and find()-resume semantics
    val tokens = Gen.oneOf("url(", ")", "(", "u", "url", "a", "url()",
      "url(x)", " ", "url(a b)", "uurl(", "'", "x)y", "url(()")
    val gen = Gen.listOf(tokens).map(_.mkString)
    forAllN(gen, 3000) { css =>
      val viaRegex = {
        val m = graft.core.Rewriter.rxStyleSheetUrl.matcher(css)
        val b = Vector.newBuilder[String]
        while (m.find()) b += m.group(1)
        b.result()
      }
      val viaScan = graft.core.Rewriter.cssUrlFindAll(css)
      assert(viaScan == viaRegex, s"css=<$css> scan=$viaScan regex=$viaRegex")
    }
  }

  test("canonicalize is idempotent") {
    forAll(urlGen) { u =>
      PyUrl.canonicalize(u) match {
        case Some(c) => assert(PyUrl.canonicalize(c).contains(c), s"not idempotent: $u -> $c")
        case None    => ()
      }
    }
  }

  test("canonicalize fast path: fast-accepted == slow-path-unchanged (r6 differential)") {
    // the r6 already-canonical scan may only accept a url the FULL
    // normalization path would return verbatim. Generator is biased to
    // canonical-looking urls so the fast branch actually fires, with
    // oddity injections (case, ports, dots, escapes, queries, slashes)
    // exercising the reject→slow path agreement.
    val seg = Gen.oneOf("p1", "a-b", "x.y", "idx", "UP", "p%41", "a b", ".", "..",
      "", "f.html", "q?x", "#f", "héllo", "a;b", "p~z")
    val host = Gen.oneOf("host1.example", "Host1.EXAMPLE", "h.example:80",
      "h.example:443", "h.example:8080", "u@h.example", "h_x.example", "h.example")
    val gen = for {
      scheme <- Gen.oneOf("https", "http", "HTTPS", "ftp")
      h <- host
      n <- Gen.choose(0, 4)
      segs <- Gen.listOfN(n, seg)
      slash <- Gen.oneOf("", "/")
    } yield s"$scheme://$h/${segs.mkString("/")}$slash"
    var fastHits = 0
    forAllN(gen, 20000) { u =>
      if (PyUrl.isCanonicalFast(u)) {
        fastHits += 1
        assert(PyUrl.canonicalizeSlow(u).contains(u),
          s"fast path accepted a url the slow path would change: $u -> ${PyUrl.canonicalizeSlow(u)}")
      } else {
        // nothing to assert beyond slow-path totality; canonicalize()
        // takes the slow branch for these by construction
        PyUrl.canonicalizeSlow(u)
      }
    }
    assert(fastHits > 500, s"generator never exercised the fast path ($fastHits hits)")
    // and the raw url generator for wild shapes
    forAll(urlGen) { u =>
      if (PyUrl.isCanonicalFast(u))
        assert(PyUrl.canonicalizeSlow(u).contains(u), s"fast/slow diverge on $u")
    }
  }

  test("canonical urls always have a host and http(s) scheme") {
    forAll(urlGen) { u =>
      PyUrl.canonicalize(u).foreach { c =>
        assert(c.startsWith("http://") || c.startsWith("https://"))
        assert(PyUrl.hostOf(c).nonEmpty)
      }
    }
  }

  test("escape/unescape round-trip for arbitrary strings") {
    forAll(Gen.asciiPrintableStr) { s =>
      assert(PyHtml.unescape(PyHtml.escape(s)) == s)
    }
  }

  test("local paths are unique within an archive and order-deterministic") {
    import graft.model.{WArchive, WResource}
    val nameGen = Gen.listOfN(12, Gen.oneOf(
      "https://h.x/img.png", "https://h.x/a/img.png", "https://h.x/b/img.png",
      "https://h.x/con.png", "https://h.x/", "data:image/png;base64,AA",
      "https://h.x/x.jpeg", "https://h.x/q?y=1", "https://h.x/%3c%3e.png"))
    forAll(nameGen) { urls =>
      val subs = urls.distinct.map(u => WResource(Array[Byte](1), "image/png", u, None, None)).toVector
      val a = WArchive(WResource(Array[Byte](1), "text/html", "https://h.x/main.html", Some("utf-8"), None),
        subs, Vector.empty)
      val p1 = WebArchiveOps.makeLocalPaths(a)
      val p2 = WebArchiveOps.makeLocalPaths(a)
      assert(p1 == p2, "not deterministic")
      val names = p1.map(_._2)
      assert(names.distinct.size == names.size, s"collision in $names")
    }
  }

  test("bloom filters never produce false negatives") {
    import org.apache.spark.util.sketch.BloomFilter
    forAll(Gen.listOfN(200, Gen.alphaNumStr.suchThat(_.nonEmpty))) { items =>
      val bf = BloomFilter.create(1000, 0.01)
      items.foreach(bf.putString)
      assert(items.forall(bf.mightContainString), "bloom false negative!")
      // serialization round-trip preserves membership
      val rt = graft.frontier.SeenSet.deserialize(graft.frontier.SeenSet.serialize(bf))
      assert(items.forall(rt.mightContainString))
    }
  }

  test("fingerprint64 equals the naive sort-all-grams implementation") {
    val textGen = Gen.listOf(Gen.oneOf("alpha", "beta", "Gamma", "DELTA", "e", "f42"))
      .map(_.mkString(" "))
    def naive(text0: String): Long = {
      val text = text0.toLowerCase
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val grams =
        if (toks.length >= 5) (0 to toks.length - 5).map(j => toks.slice(j, j + 5).mkString(" "))
        else Seq(toks.mkString(" "))
      val hashes = grams.map(g => com.google.common.hash.Hashing.murmur3_128()
        .hashString(g, java.nio.charset.StandardCharsets.UTF_8).asLong()).sorted.take(8)
      def mix(h0: Long): Long = {
        var h = h0 + 0x9E3779B97F4A7C15L
        h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
        h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
        h ^ (h >>> 31)
      }
      var acc = 0x27D4EB2F165667C5L
      for (m <- hashes) acc = mix(acc ^ m)
      acc
    }
    forAll(textGen) { t =>
      assert(graft.sql.Fingerprint64Expr.fingerprint(t) == naive(t))
    }
  }

  test("strict cp1252 parity: undefined bytes raise like CPython") {
    import graft.model.WResource
    val res = WResource(Array[Byte](0x41, 0x81.toByte, 0x42), "text/plain",
      "https://h.x/t.txt", Some("windows-1252"), None)
    intercept[Exception](Rewriter.resourceText(res))
    intercept[Exception](Rewriter.encodeText("a" + 0x81.toChar + "b", "windows-1252"))
    // defined cp1252 bytes still decode fine (smart quotes)
    val ok = WResource(Array[Byte](0x93.toByte, 0x94.toByte), "text/plain",
      "https://h.x/t2.txt", Some("windows-1252"), None)
    assert(Rewriter.resourceText(ok) == "" + 0x201c.toChar + 0x201d.toChar)
  }

  test("robots longest-match semantics") {
    import graft.frontier.RobotsRules
    val r = RobotsRules(Vector("/private", "/tmp"), Vector("/private/ok"), None)
    assert(!r.allowed("/private/x"))
    assert(r.allowed("/private/ok/page.html"))
    assert(r.allowed("/public"))
    assert(!r.allowed("/tmp"))
    assert(RobotsRules(Vector(""), Vector.empty, None).allowed("/anything"))
  }

  test("robots.txt parsing: groups, agents, crawl-delay") {
    val body =
      """# comment
        |User-agent: evilbot
        |Disallow: /
        |
        |User-agent: *
        |Disallow: /cgi-bin/
        |Allow: /cgi-bin/public
        |Crawl-delay: 2.5
        |""".stripMargin
    val r = graft.frontier.RobotsRules.parse(body, "graft")
    assert(r.disallow == Vector("/cgi-bin/"))
    assert(r.allow == Vector("/cgi-bin/public"))
    assert(r.crawlDelay.contains(2.5))
    assert(!r.allowed("/cgi-bin/secret"))
    assert(r.allowed("/cgi-bin/public/x"))
    val evil = graft.frontier.RobotsRules.parse(body, "evilbot")
    assert(!evil.allowed("/anything"))
  }
}
