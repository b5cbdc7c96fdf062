package graft.core

/** URL splitting/joining with CPython `urllib.parse` observable parity.
  *
  * The reference resolves every rewritten URL through `urljoin`
  * (/root/reference/webarchive/webarchive.py:347-361), so byte-identical
  * extraction output requires matching CPython's quirks, not java.net.URI:
  * WHATWG C0/space lstrip + tab/CR/LF removal, params (';') handling on the
  * last path segment, the uses_relative/uses_netloc scheme lists, and the
  * legacy segment-filtering in relative resolution. Validated against the
  * generated `urljoin_pairs.tsv` golden corpus.
  */
object PyUrl {

  final case class Split(scheme: String, netloc: String, path: String,
                         query: String, fragment: String)

  final case class Parsed(scheme: String, netloc: String, path: String,
                          params: String, query: String, fragment: String)

  private val usesRelative = Set("", "ftp", "http", "gopher", "nntp", "imap",
    "wais", "file", "https", "shttp", "mms", "prospero", "rtsp", "rtsps",
    "rtspu", "sftp", "svn", "svn+ssh", "ws", "wss")

  private val usesNetloc = Set("", "ftp", "http", "gopher", "nntp", "telnet",
    "imap", "wais", "file", "mms", "https", "shttp", "snews", "prospero",
    "rtsp", "rtsps", "rtspu", "rsync", "svn", "svn+ssh", "sftp", "nfs",
    "git", "git+ssh", "ws", "wss")

  private val usesParams = Set("", "ftp", "hdl", "prospero", "http", "imap",
    "https", "shttp", "rtsp", "rtsps", "rtspu", "sip", "sips", "mms",
    "sftp", "tel")

  private def isSchemeChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
    (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'

  private def stripUnsafe(s: String): String = {
    // lstrip C0 control chars and space, then remove all \t \r \n
    var i = 0
    while (i < s.length && s.charAt(i) <= ' ') i += 1
    val t = s.substring(i)
    if (t.indexOf('\t') < 0 && t.indexOf('\r') < 0 && t.indexOf('\n') < 0) t
    else t.filterNot(c => c == '\t' || c == '\r' || c == '\n')
  }

  /** CPython urlsplit(url, scheme, allow_fragments=True). */
  def urlsplit(url0: String, defaultScheme: String = ""): Split = {
    var url = stripUnsafe(url0)
    var scheme = defaultScheme
    var netloc = ""
    var query = ""
    var fragment = ""
    val ci = url.indexOf(':')
    // index loop, not substring(0,ci).forall: urlsplit runs once per
    // rewritten url and the closure + substring showed at ~4% of the
    // 1-core extraction profile (r5 JFR)
    if (ci > 0 && url.charAt(0) < 128 && url.charAt(0).isLetter && {
          var k = 0
          var ok = true
          while (ok && k < ci) { ok = isSchemeChar(url.charAt(k)); k += 1 }
          ok
        }) {
      scheme = url.substring(0, ci).toLowerCase
      url = url.substring(ci + 1)
    }
    if (url.startsWith("//")) {
      var delim = url.length
      var c = 2
      for (ch <- Array('/', '?', '#')) {
        val w = url.indexOf(ch, 2)
        if (w >= 0 && w < delim) delim = w
      }
      netloc = url.substring(2, delim)
      url = url.substring(delim)
    }
    val hi = url.indexOf('#')
    if (hi >= 0) { fragment = url.substring(hi + 1); url = url.substring(0, hi) }
    val qi = url.indexOf('?')
    if (qi >= 0) { query = url.substring(qi + 1); url = url.substring(0, qi) }
    Split(scheme, netloc, url, query, fragment)
  }

  /** CPython urlparse: urlsplit + params split from last path segment. */
  def urlparse(url: String, defaultScheme: String = ""): Parsed = {
    val s = urlsplit(url, defaultScheme)
    if (usesParams.contains(s.scheme) && s.path.indexOf(';') >= 0) {
      val slash = s.path.lastIndexOf('/')
      val i = if (slash >= 0) s.path.indexOf(';', slash) else s.path.indexOf(';')
      if (i < 0) Parsed(s.scheme, s.netloc, s.path, "", s.query, s.fragment)
      else Parsed(s.scheme, s.netloc, s.path.substring(0, i),
                  s.path.substring(i + 1), s.query, s.fragment)
    } else Parsed(s.scheme, s.netloc, s.path, "", s.query, s.fragment)
  }

  def urlunsplit(scheme: String, netloc: String, path0: String,
                 query: String, fragment: String): String = {
    var url = path0
    if (netloc.nonEmpty ||
        (scheme.nonEmpty && usesNetloc.contains(scheme) && !url.startsWith("//"))) {
      if (url.nonEmpty && !url.startsWith("/")) url = "/" + url
      url = "//" + netloc + url
    }
    if (scheme.nonEmpty) url = scheme + ":" + url
    if (query.nonEmpty) url = url + "?" + query
    if (fragment.nonEmpty) url = url + "#" + fragment
    url
  }

  def urlunparse(p: Parsed): String = {
    val path = if (p.params.nonEmpty) p.path + ";" + p.params else p.path
    urlunsplit(p.scheme, p.netloc, path, p.query, p.fragment)
  }

  /** CPython urljoin(base, url). */
  def urljoin(base: String, url: String): String = {
    if (base.isEmpty) return url
    if (url.isEmpty) return base
    val b = urlparse(base, "")
    val u = urlparse(url, b.scheme)
    if (u.scheme != b.scheme || !usesRelative.contains(u.scheme)) return url
    var netloc = u.netloc
    if (usesNetloc.contains(u.scheme)) {
      if (u.netloc.nonEmpty)
        return urlunparse(u)
      netloc = b.netloc
    }
    if (u.path.isEmpty && u.params.isEmpty) {
      val query = if (u.query.isEmpty) b.query else u.query
      return urlunparse(Parsed(u.scheme, netloc, b.path, b.params, query, u.fragment))
    }
    val baseParts0 = b.path.split("/", -1).toBuffer
    if (baseParts0.nonEmpty && baseParts0.last != "") baseParts0.remove(baseParts0.length - 1)
    val segments: scala.collection.mutable.Buffer[String] =
      if (u.path.startsWith("/")) u.path.split("/", -1).toBuffer
      else {
        val segs = baseParts0 ++ u.path.split("/", -1)
        // filter out empty interior elements (segments[1:-1] = filter(None, ...))
        if (segs.length > 2)
          segs.head +: segs.slice(1, segs.length - 1).filter(_.nonEmpty) :+ segs.last
        else segs
      }
    val resolved = scala.collection.mutable.Buffer.empty[String]
    for (seg <- segments) {
      if (seg == "..") { if (resolved.nonEmpty) resolved.remove(resolved.length - 1) }
      else if (seg == ".") ()
      else resolved.append(seg)
    }
    if (segments.nonEmpty && (segments.last == "." || segments.last == ".."))
      resolved.append("")
    val joined = resolved.mkString("/")
    urlunparse(Parsed(u.scheme, netloc, if (joined.isEmpty) "/" else joined,
                      u.params, u.query, u.fragment))
  }

  // ----------------------------------------------------------------------
  // Frontier-side canonicalization (engine addition, BASELINE.json F9):
  // RFC 3986 §6 normalization — lowercase scheme+host, drop default port,
  // uppercase percent-escapes / decode unreserved, remove dot segments,
  // drop fragment, empty path -> "/".
  // ----------------------------------------------------------------------

  private def isUnreserved(b: Int): Boolean = {
    val c = b.toChar
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
    (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'
  }

  private def normPercent(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        val v = Character.digit(s.charAt(i + 1), 16) * 16 + Character.digit(s.charAt(i + 2), 16)
        if (isUnreserved(v)) sb.append(v.toChar)
        else sb.append('%').append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def removeDotSegments(path: String): String = {
    val out = scala.collection.mutable.Buffer.empty[String]
    var trailingSlash = false
    val segs = path.split("/", -1)
    var i = 0
    while (i < segs.length) {
      val s = segs(i)
      val last = i == segs.length - 1
      s match {
        case "." => if (last) trailingSlash = true
        case ".." =>
          if (out.nonEmpty) out.remove(out.length - 1)
          if (last) trailingSlash = true
        case "" => if (last) trailingSlash = true
        case x => out.append(x); if (last) trailingSlash = false
        }
      i += 1
    }
    "/" + out.mkString("/") + (if (trailingSlash && out.nonEmpty) "/" else if (out.isEmpty) "" else "")
  }

  /** One-pass check that `url` is ALREADY in canonical form, i.e. the
    * full [[canonicalize]] machinery would return it unchanged: lowercase
    * http/https scheme, lowercase host with no userinfo/port/escapes, a
    * non-empty path with no dot or empty segments, no query/fragment, all
    * printable ASCII. Most discovered outlinks on a real crawl are
    * already canonical, and the full path (urlsplit + percent
    * normalization + dot-segment removal, several allocations) showed up
    * as ~10 core-s per 1.6M-link epoch in the r6 profile. Conservative:
    * any character or shape this scan is unsure about falls through to
    * the full path, so the result is identical by construction (pinned by
    * a 200k-case differential in PyUrlSpec). */
  private[core] def isCanonicalFast(u: String): Boolean = {
    val n = u.length
    var i =
      if (u.startsWith("https://")) 8
      else if (u.startsWith("http://")) 7
      else return false
    if (i >= n) return false
    // host: [a-z0-9.-]+ only (rejects userinfo, ports, uppercase, IPv6)
    val hostStart = i
    var c = ' '
    while (i < n && { c = u.charAt(i)
                      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
                      c == '.' || c == '-' }) i += 1
    if (i == hostStart) return false
    if (i >= n || u.charAt(i) != '/') return false // needs an explicit path
    // path: printable ASCII below DEL, no %?#\ or ws; no "//" or "/." segments
    // (a trailing "/" is canonical-preserved by removeDotSegments)
    var prev = ' '
    while (i < n) {
      c = u.charAt(i)
      if (c <= ' ' || c >= 127 || c == '%' || c == '?' || c == '#' || c == '\\')
        return false
      if (prev == '/' && (c == '/' || c == '.')) return false
      prev = c
      i += 1
    }
    true
  }

  /** Canonical form for frontier dedup/scheduling. Returns None for URLs
    * that can't be crawled (no http/https scheme or no host). */
  def canonicalize(url: String): Option[String] =
    if (isCanonicalFast(url)) Some(url) else canonicalizeSlow(url)

  /** The full normalization path (differential reference for the fast
    * path — PropertySpec pins fast-accepted == slow-unchanged). */
  private[core] def canonicalizeSlow(url: String): Option[String] = {
    val s = urlsplit(url.trim)
    val scheme = s.scheme
    if (scheme != "http" && scheme != "https") return None
    if (s.netloc.isEmpty) return None
    var host = s.netloc.toLowerCase
    // strip userinfo
    val at = host.lastIndexOf('@')
    if (at >= 0) host = host.substring(at + 1)
    // strip default port
    val defPort = if (scheme == "http") ":80" else ":443"
    if (host.endsWith(defPort)) host = host.substring(0, host.length - defPort.length)
    if (host.isEmpty || host.exists(c => c == '/' || c == '\\' || c.isWhitespace)) return None
    val path = removeDotSegments(normPercent(if (s.path.isEmpty) "/" else s.path))
    val q = normPercent(s.query)
    Some(scheme + "://" + host + (if (path.isEmpty) "/" else path) +
         (if (q.nonEmpty) "?" + q else ""))
  }

  /** Registrable host of a canonical URL ("" if malformed). */
  def hostOf(canonicalUrl: String): String = {
    val i = canonicalUrl.indexOf("://")
    if (i < 0) return ""
    val rest = canonicalUrl.substring(i + 3)
    val e = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    if (e < 0) rest else rest.substring(0, e)
  }
}
