package graft.core

import scala.io.Source
import scala.collection.immutable.TreeMap

/** HTML escaping/unescaping with CPython `html` module parity.
  *
  * The reference pipeline (see /root/reference/webarchive/util.py:207 and
  * CPython html/parser.py:325) unescapes attribute values with
  * `html.unescape` and re-escapes emitted values with `html.escape(v, True)`.
  * Byte-identical output therefore requires the WHATWG HTML5 named character
  * reference table (public spec data, snapshotted to resources) including
  * the no-trailing-semicolon legacy names and the windows-1252 numeric
  * charref remapping.
  */
object PyHtml {

  private def loadTsv(name: String): Iterator[Array[String]] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    require(in != null, s"missing resource graft/$name")
    Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).map(_.split("\t", -1))
  }

  /** name (may or may not include ';') -> replacement string */
  val html5Entities: Map[String, String] = loadTsv("html5_entities.tsv").map { a =>
    val cps = if (a.length > 1 && a(1).nonEmpty) a(1).split(" ").map(_.toInt) else Array.empty[Int]
    a(0) -> new String(cps, 0, cps.length)
  }.toMap

  /** numeric charref codepoint -> replacement (HTML5 windows-1252 mapping) */
  val invalidCharrefs: Map[Int, String] = loadTsv("invalid_charrefs.tsv").map { a =>
    val cps = a(1).split(" ").map(_.toInt)
    a(0).toInt -> new String(cps, 0, cps.length)
  }.toMap

  val invalidCodepoints: Set[Int] = loadTsv("invalid_codepoints.tsv").map(_(0).toInt).toSet

  /** Longest-prefix lookup support for semicolon-less entities: all names
    * sorted so we can test decreasing prefixes of a candidate. */
  private val maxNameLen: Int = html5Entities.keysIterator.map(_.length).max

  /** Python html.escape(s, quote=True). Fast path: most attr values —
    * including multi-hundred-KB base64 data URIs — contain nothing to
    * escape; scan first and return the original string unchanged. */
  def escape(s: String): String = {
    // fast path via String.indexOf (intrinsified/vectorized) — profiled
    // hotter than the rewrite itself when scanning char-by-char
    if (s.indexOf('&') < 0 && s.indexOf('<') < 0 && s.indexOf('>') < 0 &&
        s.indexOf('"') < 0 && s.indexOf('\'') < 0) return s
    val sb = new StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      (s.charAt(i): @annotation.switch) match {
        case '&'  => sb.append("&amp;")
        case '<'  => sb.append("&lt;")
        case '>'  => sb.append("&gt;")
        case '"'  => sb.append("&quot;")
        case '\'' => sb.append("&#x27;")
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private def replaceNumericCharref(body: String): String = {
    // body like "#123;" or "#x1F;" possibly without trailing ';'
    val t = body.stripSuffix(";")
    val num =
      try {
        if (t.length > 1 && (t.charAt(1) == 'x' || t.charAt(1) == 'X'))
          java.lang.Long.parseLong(t.substring(2), 16)
        else java.lang.Long.parseLong(t.substring(1))
      } catch { case _: NumberFormatException => return "�" }
    if (num > Int.MaxValue) return "�"
    val n = num.toInt
    invalidCharrefs.get(n) match {
      case Some(r) => r
      case None =>
        if (0xD800 <= n && n <= 0xDFFF || n > 0x10FFFF) "�"
        else if (invalidCodepoints.contains(n)) ""
        else new String(Character.toChars(n))
    }
  }

  private def replaceNamedCharref(body: String): String = {
    // body: up to 32 chars of [^\t\n\f <&#;]{1,32} optionally followed by ';'
    if (html5Entities.contains(body)) return html5Entities(body)
    // find the longest matching prefix (legacy no-semicolon names)
    // CPython checks prefixes of length >= 2 only (range(len(s)-1, 1, -1))
    var x = body.length - 1
    while (x > 1) {
      val p = body.substring(0, x)
      if (html5Entities.contains(p)) return html5Entities(p) + body.substring(x)
      x -= 1
    }
    "&" + body
  }

  /** Python html.unescape(s): replaces all &name;/&name/&#N;/&#xN; refs.
    * Regex in CPython: &(#[0-9]+;?|#[xX][0-9a-fA-F]+;?|[^\t\n\f <&#;]{1,32};?)
    */
  def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val m = matchCharref(s, i + 1)
        if (m == 0) { sb.append('&'); i += 1 }
        else {
          val body = s.substring(i + 1, i + 1 + m)
          if (body.charAt(0) == '#') sb.append(replaceNumericCharref(body))
          else sb.append(replaceNamedCharref(body))
          i += 1 + m
        }
      }
    }
    sb.toString
  }

  /** Length of the charref body starting at `start` (after '&'), or 0. */
  private def matchCharref(s: String, start: Int): Int = {
    val n = s.length
    if (start >= n) return 0
    if (s.charAt(start) == '#') {
      var j = start + 1
      if (j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) {
        j += 1
        val d0 = j
        while (j < n && isHex(s.charAt(j))) j += 1
        if (j == d0) return 0
      } else {
        val d0 = j
        while (j < n && s.charAt(j).isDigit) j += 1
        if (j == d0) return 0
      }
      if (j < n && s.charAt(j) == ';') j += 1
      j - start
    } else {
      // [^\t\n\f <&#;]{1,32};?
      var j = start
      val lim = math.min(n, start + 32)
      while (j < lim && !isNameStop(s.charAt(j))) j += 1
      if (j == start) return 0
      if (j < n && s.charAt(j) == ';') j += 1
      j - start
    }
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def isNameStop(c: Char): Boolean =
    c == '\t' || c == '\n' || c == '\f' || c == ' ' || c == '<' || c == '&' || c == '#' || c == ';'
}
