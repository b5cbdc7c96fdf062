package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{WArchive, WResource}
import scala.io.Source

/** Per-rule rewrite parity: 132 (kind, mode, input, expected) cases captured
  * by feeding snippets through the reference rewriter (test.py:320-586
  * coverage plus entity/CDATA/bogus-markup pins). */
class RewriterCasesSpec extends AnyFunSuite {

  private val H = "https://example.com"
  // b"\x89PNG\r\n\x1a\n" + 16 zero bytes + b"fakepng-payload-\x01\x02\x03"
  private val PNG: Array[Byte] = {
    val b = Array.newBuilder[Byte]
    b += 0x89.toByte
    b ++= "PNG".getBytes("US-ASCII")
    b ++= Array[Byte](0x0d, 0x0a, 0x1a, 0x0a)
    b ++= Array.fill[Byte](16)(0)
    b ++= "fakepng-payload-".getBytes("US-ASCII")
    b ++= Array[Byte](1, 2, 3)
    b.result()
  }

  private val ctxArchive = WArchive(
    WResource("<html></html>".getBytes("UTF-8"), "text/html", s"$H/index.html", Some("utf-8"), None),
    Vector(
      WResource("p { color: blue }".getBytes("UTF-8"), "text/css", s"$H/style.css", Some("utf-8"), None),
      WResource(PNG, "image/png", s"$H/images/image.png", None, None)),
    Vector.empty)

  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => sb.append('\t'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case other => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private val cases: Vector[(String, String, String, String)] = {
    val in = getClass.getResourceAsStream("/golden/rewriter_cases.tsv")
    require(in != null)
    Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).map { l =>
      val a = l.split("\t", -1)
      (a(0), a(1), unesc(a(2)), unesc(a(3)))
    }.toVector
  }

  test("case corpus is present") { assert(cases.size >= 130) }

  private def dirFor(mode: String): String = mode match {
    case "subdir"  => "page_files"
    case "samedir" => ""
    case "datauri" => null
  }

  for (((kind, mode, input, expected), idx) <- cases.zipWithIndex) {
    test(s"case $idx [$kind/$mode]: ${input.take(60)}") {
      val ctx = new Rewriter.ArchiveCtx(ctxArchive)
      val out = new StringBuilder
      kind match {
        case "html" =>
          val res = WResource(input.getBytes("UTF-8"), "text/html",
            s"$H/case$idx.html", Some("utf-8"), None)
          Rewriter.processHtmlResource(ctx, res, out, dirFor(mode), 0)
        case "xhtml" =>
          val res = WResource(input.getBytes("UTF-8"), "application/xhtml+xml",
            s"$H/case$idx.xhtml", Some("utf-8"), None)
          Rewriter.processHtmlResource(ctx, res, out, dirFor(mode), 0)
        case "css" =>
          val res = WResource(input.getBytes("UTF-8"), "text/css",
            s"$H/sheets/case$idx.css", Some("utf-8"), None)
          Rewriter.processCssResource(ctx, res, out, dirFor(mode), 0)
      }
      assert(out.toString == expected,
        s"\ninput:    $input\ngot:      ${out.toString}\nexpected: $expected")
    }
  }
}
