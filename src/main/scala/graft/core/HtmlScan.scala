package graft.core

/** Hand-rolled scanners semantically identical to the CPython html.parser
  * regexes (tagfind_tolerant / attrfind_tolerant /
  * locatestarttagend_tolerant / endtagfind / comment- and cdata-close).
  *
  * Why: the JDK compiles the Unicode-space character classes in those
  * regexes into chained union predicates (Pattern$BmpCharPredicate lambda
  * stacks) that dominate extraction CPU and stop scaling past ~8 threads.
  * These scanners are single-pass with the regexes' exact backtracking
  * behavior (the only genuine backtrack point is an unclosed quoted
  * attribute value, which rewinds to just after the attr name).
  * Equivalence vs the original regexes is enforced by a differential
  * property test (HtmlScanDiffSpec).
  */
object HtmlScan {

  import HtmlTok.pyIsSpace

  /** [^\t\n\r\f />\x00] complement — chars that END a tag name. */
  @inline private def isTagNameStop(c: Char): Boolean =
    c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == ' ' ||
    c == '/' || c == '>' || c == '\u0000'

  /** attr-name continuation stop: [\s/=>] (first char additionally ends on
    * '=' never — handled by caller). */
  @inline private def isAttrNameStop(c: Char): Boolean =
    pyIsSpace(c) || c == '/' || c == '=' || c == '>'

  @inline private def isLookbehindOk(prev: Char): Boolean =
    prev == '\'' || prev == '"' || prev == '/' || pyIsSpace(prev)

  /** Matches the value-indicator group `\s*=+\s*('…'|"…"|bare)` starting at
    * `at` (just after an attr name) with the regexes' exact backtracking:
    * an unclosed quoted value backtracks the greedy `\s*`/`=+` quantifiers —
    * if spaces preceded the quote, the value becomes an EMPTY bare match at
    * the last space; else if more than one '=', a bare value starting at
    * the last '='; else the whole group fails.
    * Returns (valueStart, valueEnd) or null if the group fails/absent. */
  private[core] def valueGroupWithStart(s: String, at: Int): Array[Int] = {
    val n = s.length
    var v = at
    while (v < n && pyIsSpace(s.charAt(v))) v += 1
    if (v >= n || s.charAt(v) != '=') return null
    val eqStart = v
    while (v < n && s.charAt(v) == '=') v += 1
    val eqEnd = v // after all '='s
    var c = v
    while (c < n && pyIsSpace(s.charAt(c))) c += 1
    val spaceCount = c - eqEnd
    // greedy attempt at position c
    if (c < n && (s.charAt(c) == '\'' || s.charAt(c) == '"')) {
      val close = s.indexOf(s.charAt(c), c + 1)
      if (close >= 0) return Array(c, close + 1)
      // unclosed quote: backtrack
      if (spaceCount > 0) {
        val p = eqEnd + spaceCount - 1 // at the last space: empty bare value
        return Array(p, p)
      }
      if (eqEnd - eqStart > 1) {
        // =+ gives back one '=': bare value starts at the last '='
        var ve = eqEnd - 1
        while (ve < n && s.charAt(ve) != '>' && !pyIsSpace(s.charAt(ve))) ve += 1
        return Array(eqEnd - 1, ve)
      }
      return null
    }
    var ve = c
    while (ve < n && s.charAt(ve) != '>' && !pyIsSpace(s.charAt(ve))) ve += 1
    Array(c, ve)
  }

  /** Like valueGroupWithStart but returns only the end (or -1). */
  private def valueGroup(s: String, at: Int): Int = {
    val r = valueGroupWithStart(s, at)
    if (r == null) -1 else r(1)
  }

  /** locatestarttagend_tolerant: match end at position `at` (must point at
    * '<' + ascii letter; callers guarantee). Never fails. */
  def startTagEnd(s: String, at: Int): Int = {
    val n = s.length
    var j = at + 2 // '<' + first letter
    while (j < n && !isTagNameStop(s.charAt(j))) j += 1
    // (?:[\s/]* (attr)* )?
    var k = j
    while (k < n && (pyIsSpace(s.charAt(k)) || s.charAt(k) == '/')) k += 1
    j = k
    var cont = true
    while (cont) {
      cont = false
      if (j < n && j > at) {
        val c = s.charAt(j)
        if (isLookbehindOk(s.charAt(j - 1)) && c != '>' && c != '/' && !pyIsSpace(c)) {
          // attr name: [^\s/>][^\s/=>]*
          j += 1
          while (j < n && !isAttrNameStop(s.charAt(j))) j += 1
          // optional value group: \s*=+\s* (quoted|bare) \s*
          val vg = valueGroup(s, j)
          if (vg >= 0) {
            var v = vg
            while (v < n && pyIsSpace(s.charAt(v))) v += 1 // trailing \s* in group
            j = v
          } // else: value group fails; j stays after the name
          // separators (?:\s|/(?!>))*
          var sep = true
          while (sep && j < n) {
            val sc = s.charAt(j)
            if (pyIsSpace(sc)) j += 1
            else if (sc == '/' && !(j + 1 < n && s.charAt(j + 1) == '>')) j += 1
            else sep = false
          }
          cont = true
        }
      }
    }
    // trailing \s*
    while (j < n && pyIsSpace(s.charAt(j))) j += 1
    j
  }

  /** tagfind_tolerant anchored at `at`: returns (nameEnd, matchEnd) or null
    * when the first char is not an ascii letter. */
  def tagFind(s: String, at: Int): Array[Int] = {
    val n = s.length
    if (at >= n) return null
    val c0 = s.charAt(at)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return null
    var j = at + 1
    while (j < n && !isTagNameStop(s.charAt(j))) j += 1
    val nameEnd = j
    var sep = true
    while (sep && j < n) {
      val sc = s.charAt(j)
      if (pyIsSpace(sc)) j += 1
      else if (sc == '/' && !(j + 1 < n && s.charAt(j + 1) == '>')) j += 1
      else sep = false
    }
    Array(nameEnd, j)
  }

  /** attrfind_tolerant anchored at `at` (lookbehind on s(at-1)).
    * Returns null on no match, else (name, rawValue, end) where rawValue is
    * null when the value group is absent. */
  final case class Attr(name: String, rawValue: String, end: Int)

  def attrFind(s: String, at: Int): Attr = {
    val n = s.length
    if (at >= n || at == 0) return null
    if (!isLookbehindOk(s.charAt(at - 1))) return null
    val c0 = s.charAt(at)
    if (c0 == '>' || c0 == '/' || pyIsSpace(c0)) return null
    var j = at + 1
    while (j < n && !isAttrNameStop(s.charAt(j))) j += 1
    val name = s.substring(at, j)
    var rawValue: String = null
    val vg = valueGroupWithStart(s, j)
    if (vg != null) { rawValue = s.substring(vg(0), vg(1)); j = vg(1) }
    // note: attrfind has NO trailing \s* inside the value group
    var sep = true
    while (sep && j < n) {
      val sc = s.charAt(j)
      if (pyIsSpace(sc)) j += 1
      else if (sc == '/' && !(j + 1 < n && s.charAt(j + 1) == '>')) j += 1
      else sep = false
    }
    Attr(name, rawValue, j)
  }

  /** endtagfind anchored at `at`: '</' \s* ([a-zA-Z][-.a-zA-Z0-9:_]*) \s* '>'
    * Returns (nameStart, nameEnd, matchEnd) or null. */
  def endTagFind(s: String, at: Int): Array[Int] = {
    val n = s.length
    if (at + 2 > n || s.charAt(at) != '<' || s.charAt(at + 1) != '/') return null
    var j = at + 2
    while (j < n && pyIsSpace(s.charAt(j))) j += 1
    if (j >= n) return null
    val c0 = s.charAt(j)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return null
    val ns = j
    j += 1
    while (j < n && {
      val c = s.charAt(j)
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '.' || c == ':' || c == '_'
    }) j += 1
    val ne = j
    while (j < n && pyIsSpace(s.charAt(j))) j += 1
    if (j < n && s.charAt(j) == '>') Array(ns, ne, j + 1) else null
  }

  /** search `--\s*>` from `from`; returns (start, end) or null. */
  def commentClose(s: String, from: Int): Array[Int] = {
    val n = s.length
    var i = from
    while (i < n) {
      val d = s.indexOf("--", i)
      if (d < 0) return null
      var j = d + 2
      while (j < n && pyIsSpace(s.charAt(j))) j += 1
      if (j < n && s.charAt(j) == '>') return Array(d, j + 1)
      i = d + 1
    }
    null
  }

  /** search `</\s*elem\s*>` (case-insensitive elem) from `from`. */
  def cdataClose(s: String, from: Int, elem: String): Array[Int] = {
    val n = s.length
    var i = from
    while (i < n) {
      val lt = s.indexOf("</", i)
      if (lt < 0) return null
      var j = lt + 2
      while (j < n && pyIsSpace(s.charAt(j))) j += 1
      if (s.regionMatches(true, j, elem, 0, elem.length)) {
        var k = j + elem.length
        while (k < n && pyIsSpace(s.charAt(k))) k += 1
        if (k < n && s.charAt(k) == '>') return Array(lt, k + 1)
      }
      i = lt + 1
    }
    null
  }

  /** declname `[a-zA-Z][-_.a-zA-Z0-9]*\s*` anchored; returns end or -1. */
  def declName(s: String, at: Int): Int = {
    val n = s.length
    if (at >= n) return -1
    val c0 = s.charAt(at)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return -1
    var j = at + 1
    while (j < n && {
      val c = s.charAt(j)
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '_' || c == '.'
    }) j += 1
    while (j < n && pyIsSpace(s.charAt(j))) j += 1
    j
  }
}
