package graft.core

import java.nio.charset.{MalformedInputException, UnmappableCharacterException}
import java.util.zip.GZIPInputStream

/** CPython-parity decode/encode for the five CJK charsets whose JDK
  * implementations observably diverge from the reference runtime's codecs
  * (r5 exhaustive 2-byte differential: Shift_JIS/EUC-JP map JIS 0x213D to
  * U+2014 where CPython emits U+2015; Java's GBK accepts 2,149 sequences
  * CPython rejects and maps 0xA892 to U+2641 vs U+2295; Java's Big5
  * swaps several punctuation mappings and rejects 2 sequences CPython
  * accepts; EUC-KR accepts 2 sequences CPython rejects). The reference
  * decodes with CPython, so parity means CPython's tables — which are
  * ENUMERATED directly from CPython by tools/gen_charset_tables.py into
  * src/main/resources/charsets/<enc>.tsv.gz and decoded here with the
  * codecs' no-lookahead unit structure:
  *
  *  - a byte that strict-decodes alone is a 1-byte unit and never a lead;
  *  - otherwise it is a lead iff some 2-byte sequence starting with it
  *    decodes; a lead followed by an invalid or missing trail is a strict
  *    error (no backtracking) — CPython semantics;
  *  - euc-jp additionally has 0x8F-led 3-byte units (JIS X 0212 via SS3).
  *
  * gb2312 matched the JDK exactly across the exhaustive differential and
  * stays on the JDK decoder. The walk itself is pinned by a
  * python-generated multi-unit corpus (CharsetParitySpec). */
object PyCharsets {

  final class Table(
      val singles: Array[String],            // byte -> unit text, null = not a unit
      val doubles: Array[Array[String]],     // lead -> trail -> text, null = not a lead
      val triples: java.util.HashMap[Integer, String], // euc-jp 0x8F: (a<<8|b) -> text
      val comps: java.util.HashMap[java.lang.Long, String], // euc-kr a4d4: 6 trailing bytes -> text
      val enc: java.util.HashMap[String, Array[Byte]]) // single-codepoint text -> bytes

  /** CPython `encodings.normalize_encoding` parity: keep [a-zA-Z0-9.],
    * collapse every other run to a single '_', lowercase. This is the
    * normalization CPython applies before its alias lookup, so any
    * spelling CPython routes to these five codecs lands on the table. */
  private def normalizeEncoding(name: String): String = {
    val sb = new java.lang.StringBuilder(name.length)
    var i = 0
    var punct = false
    while (i < name.length) {
      val c = name.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '.') {
        if (punct && sb.length > 0) sb.append('_')
        punct = false
        sb.append(Character.toLowerCase(c))
      } else punct = true
      i += 1
    }
    sb.toString
  }

  /** Canonical name + every CPython `encodings.aliases` spelling for the
    * five table-backed codecs (post-normalization keys; enumerated from
    * CPython's alias map — r5 ADVICE low: a page declaring 'csshiftjis'
    * previously fell through to Java's divergent Shift_JIS). */
  private val Supported: Map[String, String] = Map(
    "shift_jis" -> "shift_jis", "csshiftjis" -> "shift_jis", "s_jis" -> "shift_jis",
    "shiftjis" -> "shift_jis", "sjis" -> "shift_jis", "x_mac_japanese" -> "shift_jis",
    "euc_jp" -> "euc-jp", "eucjp" -> "euc-jp", "u_jis" -> "euc-jp", "ujis" -> "euc-jp",
    "euc_kr" -> "euc-kr", "euckr" -> "euc-kr", "korean" -> "euc-kr",
    "ks_c_5601" -> "euc-kr", "ks_c_5601_1987" -> "euc-kr", "ks_x_1001" -> "euc-kr",
    "ksc5601" -> "euc-kr", "ksx1001" -> "euc-kr", "x_mac_korean" -> "euc-kr",
    "gbk" -> "gbk", "936" -> "gbk", "cp936" -> "gbk", "ms936" -> "gbk",
    "big5" -> "big5", "big5_tw" -> "big5", "csbig5" -> "big5",
    "x_mac_trad_chinese" -> "big5")

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Table]()

  def tableFor(encName: String): Option[Table] =
    Supported.get(normalizeEncoding(encName)).map(res =>
      cache.computeIfAbsent(res, load(_)))

  private def unhex(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  private def load(res: String): Table = {
    val in = getClass.getResourceAsStream(s"/charsets/$res.tsv.gz")
    require(in != null, s"charset table missing: $res (run tools/gen_charset_tables.py)")
    val singles = new Array[String](256)
    val doubles = new Array[Array[String]](256)
    val triples = new java.util.HashMap[Integer, String]()
    val comps = new java.util.HashMap[java.lang.Long, String]()
    val enc = new java.util.HashMap[String, Array[Byte]]()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(new GZIPInputStream(in), "UTF-8"))
    try {
      var line = reader.readLine()
      while (line != null) {
        if (line.nonEmpty) {
          val a = line.split(" ", 3)
          if (a(0) == "D") {
            val seq = unhex(a(1))
            val text = new String(unhex(a(2)), "UTF-8")
            seq.length match {
              case 1 => singles(seq(0) & 0xFF) = text
              case 2 =>
                val lead = seq(0) & 0xFF
                if (doubles(lead) == null) doubles(lead) = new Array[String](256)
                doubles(lead)(seq(1) & 0xFF) = text
              case 3 =>
                triples.put(((seq(1) & 0xFF) << 8) | (seq(2) & 0xFF), text)
              case _ => sys.error(s"bad unit length in $res: ${a(1)}")
            }
          } else if (a(0) == "C") {
            // euc-kr composition: the 6 bytes AFTER the a4d4 lead pair
            val seq = unhex(a(1))
            var k = 0L
            var j = 0
            while (j < 6) { k = (k << 8) | (seq(j) & 0xFFL); j += 1 }
            comps.put(k, new String(unhex(a(2)), "UTF-8"))
          } else {
            enc.put(new String(unhex(a(1)), "UTF-8"), unhex(a(2)))
          }
        }
        line = reader.readLine()
      }
    } finally reader.close()
    new Table(singles, doubles, triples, comps, enc)
  }

  /** Strict decode with CPython unit semantics; throws
    * MalformedInputException like the JDK strict path (resourceText's
    * callers treat both identically). */
  def decode(t: Table, d: Array[Byte]): String = {
    val n = d.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val b = d(i) & 0xFF
      val s1 = t.singles(b)
      if (s1 != null) { sb.append(s1); i += 1 }
      else {
        val t2 = t.doubles(b)
        if (t2 != null) {
          if (i + 1 >= n) throw new MalformedInputException(n - i)
          val v = t2(d(i + 1) & 0xFF)
          if (v == null) {
            // euc-kr jamo composition unit: a4d4 leads an 8-byte sequence
            // (a4d4 is deliberately absent from the pair table — alone or
            // with an invalid tail it is a strict error, like CPython)
            if (b == 0xA4 && (d(i + 1) & 0xFF) == 0xD4 && !t.comps.isEmpty) {
              if (i + 7 >= n) throw new MalformedInputException(n - i)
              var k = 0L
              var j = i + 2
              while (j < i + 8) { k = (k << 8) | (d(j) & 0xFFL); j += 1 }
              val cv = t.comps.get(k)
              if (cv == null) throw new MalformedInputException(8)
              sb.append(cv); i += 8
            } else throw new MalformedInputException(2)
          } else { sb.append(v); i += 2 }
        } else if (b == 0x8F && !t.triples.isEmpty) {
          if (i + 2 >= n) throw new MalformedInputException(n - i)
          val v = t.triples.get(((d(i + 1) & 0xFF) << 8) | (d(i + 2) & 0xFF))
          if (v == null) throw new MalformedInputException(3)
          sb.append(v); i += 3
        } else throw new MalformedInputException(1)
      }
    }
    sb.toString
  }

  /** Strict encode (CPython raises on unmappable; so do we). */
  def encode(t: Table, s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length * 2)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val k = Character.charCount(cp)
      val b = t.enc.get(s.substring(i, i + k))
      if (b == null) throw new UnmappableCharacterException(k)
      out.write(b, 0, b.length)
      i += k
    }
    out.toByteArray
  }
}
