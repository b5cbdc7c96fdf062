#!/usr/bin/env python3
"""Golden-fixture generator (fixture-prep time only; NOT part of the engine).

Runs the read-only reference (/root/reference, bmjcode/pywebarchive) on a
corpus of synthetic webarchives + its shipped Wikipedia sample, and snapshots:
  - input .webarchive bytes          -> golden/archives/<name>.webarchive
  - to_html() output (utf-8 bytes)   -> golden/tohtml/<name>.html
  - multi-file extract() output tree -> golden/extract/<name>/** + manifest.tsv
  - url -> local_path index          -> golden/localpaths/<name>.tsv
  - urljoin parity corpus            -> golden/urljoin_pairs.tsv
  - mimetypes.guess_extension pins   -> golden/mime_ext.tsv
  - per-rule rewriter cases          -> golden/rewriter_cases.tsv

Deterministic: fixed inputs, no randomness, no timestamps.
"""
import sys, os, io, shutil, hashlib, plistlib, base64

sys.path.insert(0, "/root/reference")
import webarchive  # noqa
from webarchive import util as wutil  # noqa
from urllib.parse import urljoin
import mimetypes

OUT = "/root/repo/src/test/resources/golden"
REF_SAMPLE = "/root/reference/webarchive/sample_data/Wikipedia.webarchive"

def res(url, mime, data, enc=None, frame=None):
    d = {"WebResourceURL": url, "WebResourceMIMEType": mime,
         "WebResourceData": data if isinstance(data, bytes) else data.encode(enc or "utf-8")}
    if enc is not None:
        d["WebResourceTextEncodingName"] = enc
    if frame is not None:
        d["WebResourceFrameName"] = frame
    return d

def arch(main, subs=(), frames=()):
    d = {"WebMainResource": main}
    if subs: d["WebSubresources"] = list(subs)
    if frames: d["WebSubframeArchives"] = list(frames)
    return d

PNG = (b"\x89PNG\r\n\x1a\n" + b"\x00" * 16 + b"fakepng-payload-\x01\x02\x03")
JPG = b"\xff\xd8\xff\xe0fakejpg-payload\xff\xd9"

H = "https://example.com"

ARCHIVES = {}

# --- basic: every HTML rewrite rule in one page -----------------------------
basic_css = (
    "body { background: url(bg.png); }\n"
    ".a { background: url('logo.png'); }\n"
    ".b { background: url(\"https://example.com/logo.png\"); }\n"
    ".c { background: url(https://other.example.org/ext.png); }\n"
    ".d { background: url(); }\n"
    ".e { background: url( ); }\n"
)
basic_html = """<!DOCTYPE html>
<html>
<head>
<title>Basic &amp; test &#65; &#x41; &copy; &unknownent;</title>
<link rel="stylesheet" href="style.css">
<link rel="stylesheet" href="https://other.example.org/ext.css">
<style>
.inline { background: url(bg.png); }
.inline2 { background: url("https://example.com/logo.png"); }
</style>
<script src="app.js"></script>
</head>
<body>
<!-- a comment <with brackets> -->
<a href="page2.html">rel link</a>
<a href="https://other.example.org/abs.html">abs link</a>
<a href="bg.png">link to subresource</a>
<form action="submit.cgi" method="post"><input type="text" name="q" value=""></form>
<img src="bg.png" alt="rel sub">
<img src="https://example.com/logo.png" alt="abs sub">
<img src="https://other.example.org/nope.png" alt="external">
<img srcset="bg.png 1x, logo.png 2x, https://other.example.org/big.png 3x" src="bg.png">
<img srcset="bg.png">
<p>Literal text URL: https://example.com/bg.png should not be rewritten.</p>
<p>Entities stay: &lt;tag&gt; &amp;&nbsp;&#169;</p>
<input type="checkbox" checked>
<td nowrap>bare attr</td>
<p title="5 &lt; 6 &amp; 7 &gt; 4 &quot;q&quot; 'a'">attr entities</p>
<p title="">empty attr</p>
</body>
</html>
"""
ARCHIVES["basic"] = arch(
    res(f"{H}/index.html", "text/html", basic_html, "utf-8"),
    [res(f"{H}/bg.png", "image/png", PNG),
     res(f"{H}/logo.png", "image/png", PNG + b"2"),
     res(f"{H}/style.css", "text/css", basic_css, "utf-8"),
     res(f"{H}/app.js", "text/javascript", "var x = 1 < 2; // &amp; <tag>\n", "utf-8")])

# --- xhtml: mime-declared XHTML ----------------------------------------------
xhtml_html = """<?xml version="1.0" encoding="UTF-8"?>
<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN" "http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd">
<html xmlns="http://www.w3.org/1999/xhtml">
<head><title>XHTML</title><link rel="stylesheet" href="style.css" /></head>
<body>
<img src="bg.png" alt="x" />
<br />
<hr>
<input type="checkbox" checked>
<img src="https://other.example.org/e.png" alt="ext"/>
</body>
</html>
"""
ARCHIVES["xhtml"] = arch(
    res(f"{H}/x.xhtml", "application/xhtml+xml", xhtml_html, "utf-8"),
    [res(f"{H}/bg.png", "image/png", PNG),
     res(f"{H}/style.css", "text/css", "b { color: red }", "utf-8")])

# --- sniff: text/html mime but XHTML doctype → mode flips after decl --------
sniff_html = """<img src="bg.png"><!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Transitional//EN" "x.dtd"><br><img src="bg.png"><input checked>"""
ARCHIVES["sniff"] = arch(
    res(f"{H}/s.html", "text/html", sniff_html, "utf-8"),
    [res(f"{H}/bg.png", "image/png", PNG)])

# --- frames: depth-2 subframe archives ---------------------------------------
frame_inner = arch(
    res(f"{H}/frame1.html", "text/html",
        '<html><body><img src="f1.png">frame one</body></html>', "utf-8", frame="f1"),
    [res(f"{H}/f1.png", "image/png", PNG + b"f1")])
frame_inner2 = arch(
    res(f"{H}/frame2.html", "text/html",
        '<html><body><a href="rel.html">x</a>frame two</body></html>', "utf-8", frame="f2"))
frames_html = ('<html><body><frameset><frame src="frame1.html" name="f1">'
               '<frame src="frame2.html" name="f2"></frameset>'
               '<img src="shared.png"></body></html>')
ARCHIVES["frames"] = arch(
    res(f"{H}/frames.html", "text/html", frames_html, "utf-8"),
    [res(f"{H}/shared.png", "image/png", PNG)],
    [frame_inner, frame_inner2])

# --- deepframes: 3-level frame nesting (tests full recursion in extraction;
#     the Spark ROW schema is depth-2 + counts, but extract/to_html recurse) --
deep3 = arch(
    res(f"{H}/d3.html", "text/html", '<body>level3<img src="l3.png"></body>', "utf-8", frame="f3"),
    [res(f"{H}/l3.png", "image/png", PNG + b"3")])
deep2 = arch(
    res(f"{H}/d2.html", "text/html", '<frame src="d3.html">', "utf-8", frame="f2"),
    [res(f"{H}/l2.png", "image/png", PNG + b"2")],
    [deep3])
ARCHIVES["deepframes"] = arch(
    res(f"{H}/d1.html", "text/html", '<frame src="d2.html"><img src="l1.png">', "utf-8"),
    [res(f"{H}/l1.png", "image/png", PNG + b"1")],
    [deep2])

# --- names: local-path uniquification stress ---------------------------------
ARCHIVES["names"] = arch(
    res(f"{H}/dir/index.html", "text/html",
        '<img src="a/img.png"><img src="b/img.png"><img src="c/img.jpeg">'
        '<img src="data:image/png;base64,AAAA"><img src="https://example.com/">'
        '<img src="con.png"><img src="com1.png"><img src="weird%3C%3E.png">'
        '<img src="photo.jpeg">', "utf-8"),
    [res(f"{H}/dir/a/img.png", "image/png", PNG + b"a"),
     res(f"{H}/dir/b/img.png", "image/png", PNG + b"b"),
     res(f"{H}/dir/c/img.jpeg", "image/jpeg", JPG),
     res("data:image/png;base64,AAAA", "image/png", PNG + b"d"),
     res(f"{H}/", "image/png", PNG + b"e"),
     res(f"{H}/dir/con.png", "image/png", PNG + b"f"),
     res(f"{H}/dir/com1.png", "image/png", PNG + b"g"),
     res(f"{H}/dir/weird%3C%3E.png", "image/png", PNG + b"h"),
     res(f"{H}/dir/photo.jpeg", "image/jpeg", JPG + b"i")])

# --- nonhtml_main: main resource is JavaScript -------------------------------
ARCHIVES["nonhtml_main"] = arch(
    res(f"{H}/app.js", "text/javascript", "console.log('hello <b> &amp;');\n", "utf-8"))

# --- encoding: windows-1252 + undeclared-encoding text subresource -----------
w1252_html = ('<html><head><meta charset="windows-1252"></head>'
              '<body>caf\xe9 “smart quotes” <img src="bg.png"></body></html>')
ARCHIVES["encoding"] = arch(
    {"WebResourceURL": f"{H}/enc.html", "WebResourceMIMEType": "text/html",
     "WebResourceData": w1252_html.encode("windows-1252"),
     "WebResourceTextEncodingName": "Windows-1252"},  # mixed case → lowered
    [res(f"{H}/bg.png", "image/png", PNG),
     {"WebResourceURL": f"{H}/plain.txt", "WebResourceMIMEType": "text/plain",
      "WebResourceData": "no declared encoding \xe9".encode("utf-8")}])

# --- utf-16 family: BOM consumed; CPython defaults to NATIVE (LE) order
# without a BOM while Java's UTF-16 charset assumes BE — the r5 parity fix
# pins all three observable shapes (BOM, BOM-less LE -> real text,
# BOM-less BE -> the reference's deterministic mojibake) plus the encode
# side (extract re-encodes the utf-16 main as BOM + LE). ---------------------
u16_html = ('<html><head><style>.x { background: url(bg.png); }</style></head>'
            '<body>h\xe9llo ☃ w\xf6rld <img src="bg.png"></body></html>')
for _u16name, _u16bytes in [
    ("utf16_bom", u16_html.encode("utf-16")),
    ("utf16_nobom_le", u16_html.encode("utf-16-le")),
    ("utf16_nobom_be", u16_html.encode("utf-16-be"))]:
    ARCHIVES[_u16name] = arch(
        {"WebResourceURL": f"{H}/u16.html", "WebResourceMIMEType": "text/html",
         "WebResourceData": _u16bytes, "WebResourceTextEncodingName": "utf-16"},
        [res(f"{H}/bg.png", "image/png", PNG)])

# --- CJK charsets through the table-driven CPython-parity codecs, each
# carrying a KNOWN-DIVERGENT character so the golden pins the divergence
# end-to-end (Shift_JIS/EUC-JP 0x213D -> U+2015 HORIZONTAL BAR where the
# JDK says U+2014; GBK 0xA892 -> U+2295; Big5 0xA240/0xA15A -> U+FF3C/
# U+2574 where the JDK swaps). ------------------------------------------------
for _cjkname, _cjkenc, _cjktext in [
    ("shiftjis", "Shift_JIS", '日本語テキスト ― ｱｲｳ'),
    ("eucjp", "euc-jp", '日本語 ― と補助漢字'),
    ("gbkarch", "gbk", '中文简体 ⊕ 文本'),
    ("big5arch", "big5", '繁體字 ＼ ╴ 文字')]:
    ARCHIVES[_cjkname] = arch(
        {"WebResourceURL": f"{H}/{_cjkname}.html", "WebResourceMIMEType": "text/html",
         "WebResourceData": (f'<html><body>{_cjktext} '
                             '<img src="bg.png"></body></html>').encode(_cjkenc.lower()),
         "WebResourceTextEncodingName": _cjkenc},
        [res(f"{H}/bg.png", "image/png", PNG)])

# --- csschain: css referencing other subresources (data-uri recursion) -------
css_a = "@import url(b.css);\n.x { background: url(bg.png); }\n"
css_b = ".y { background: url(bg.png); }\n"
ARCHIVES["csschain"] = arch(
    res(f"{H}/c.html", "text/html",
        '<link rel="stylesheet" href="a.css"><img src="bg.png">', "utf-8"),
    [res(f"{H}/a.css", "text/css", css_a, "utf-8"),
     res(f"{H}/b.css", "text/css", css_b, "utf-8"),
     res(f"{H}/bg.png", "image/png", PNG)])

# --- malformed: HTMLParser tolerance pins ------------------------------------
malformed_html = """<html><body>
<p>unclosed paragraph
<b>nested <i>mis</b>matched</i>
<script type="text/javascript">if (a < b && c > d) { x("</scr" + "ipt>"); }</script>
<SCRIPT>var y = "<b>not a tag</b>";</SCRIPT>
<style>p < q { color: red }</style>
<!bogus comment>
<?php echo "pi"; ?>
<![CDATA[ raw cdata <tag> ]]>
<p class=unquoted id = spaced data-x>attrs</p>
<p 5 < 6 stray angle
<img src="bg.png"
</body>
"""
ARCHIVES["malformed"] = arch(
    res(f"{H}/m.html", "text/html", malformed_html, "utf-8"),
    [res(f"{H}/bg.png", "image/png", PNG)])

# --- attrentity: entity handling in attribute values -------------------------
attrent_html = ('<a href="page?a=1&amp;b=2">q</a>'
                '<a href="page?a=1&b=2">raw amp</a>'
                '<p title="&copy; &trade; &#169; &#xA9; &notareal;">t</p>'
                '<img src="bg.png" alt="a&ampb">')
ARCHIVES["attrentity"] = arch(
    res(f"{H}/ae.html", "text/html", attrent_html, "utf-8"),
    [res(f"{H}/bg.png", "image/png", PNG)])

# --- fallback: unknown marked section → AssertionError → raw passthrough ----
# (reference bug: truncate(0) without seek(0) → NUL padding; pinned verbatim)
ARCHIVES["fallback"] = arch(
    res(f"{H}/f.html", "text/html",
        '<p>before</p><img src="bg.png"><![bogus]>after', "utf-8"),
    [res(f"{H}/bg.png", "image/png", PNG)])

# --- empty page (no subresources) --------------------------------------------
ARCHIVES["nosubs"] = arch(
    res(f"{H}/solo.html", "text/html",
        "<html><body><a href='rel.html'>only link</a></body></html>", "utf-8"))


def sha256(b):
    return hashlib.sha256(b).hexdigest()

def dump_archive(name, data_bytes):
    adir = os.path.join(OUT, "archives")
    os.makedirs(adir, exist_ok=True)
    with open(os.path.join(adir, name + ".webarchive"), "wb") as f:
        f.write(data_bytes)

def process(name, data_bytes):
    dump_archive(name, data_bytes)
    tmp_in = f"/tmp/fixt_{name}.webarchive"
    with open(tmp_in, "wb") as f:
        f.write(data_bytes)
    a = webarchive.open(tmp_in)

    # to_html golden (utf-8 bytes of the str)
    os.makedirs(os.path.join(OUT, "tohtml"), exist_ok=True)
    if wutil.is_html_mime_type(a.main_resource.mime_type):
        th = a.to_html()
        with open(os.path.join(OUT, "tohtml", name + ".html"), "wb") as f:
            f.write(th.encode("utf-8"))

    # local paths golden
    os.makedirs(os.path.join(OUT, "localpaths"), exist_ok=True)
    a._make_local_paths()
    with open(os.path.join(OUT, "localpaths", name + ".tsv"), "w") as f:
        for url, lp in a._local_paths.items():
            f.write(f"{url}\t{lp}\n")

    # multi-file extraction golden
    xdir = os.path.join(OUT, "extract", name)
    shutil.rmtree(xdir, ignore_errors=True)
    os.makedirs(xdir, exist_ok=True)
    out_html = os.path.join(xdir, "page.html")
    a.extract(out_html)
    manifest = []
    for root, _dirs, files in os.walk(xdir):
        for fn in sorted(files):
            p = os.path.join(root, fn)
            rel = os.path.relpath(p, xdir)
            with open(p, "rb") as f:
                manifest.append((rel, sha256(f.read())))
    manifest.sort()
    with open(os.path.join(xdir, "manifest.tsv"), "w") as f:
        for rel, h in manifest:
            f.write(f"{rel}\t{h}\n")
    print(f"  {name}: resources={a.resource_count()} files={len(manifest)}")

def gen_urljoin():
    bases = [
        "http://a/b/c/d;p?q", "https://example.com/wiki/Main_Page",
        "https://example.com/a/b/", "https://example.com", "https://example.com/",
        "http://u:p@h:8080/x/y?q#f", "https://example.com/a/b/c.html?x=1#frag",
        "file:///tmp/x/y.html", "data:text/html,hi",
    ]
    rels = [
        "", "g", "./g", "g/", "/g", "//g", "//other.example.org/z", "?y", "g?y",
        "#s", "g#s", "g?y#s", ";x", "g;x", "g;x?y#s", ".", "./", "..", "../",
        "../g", "../..", "../../", "../../g", "../../../g", "../../../../g",
        "/./g", "/../g", "g.", ".g", "g..", "..g", "./../g", "./g/.", "g/./h",
        "g/../h", "g;x=1/./y", "g;x=1/../y", "?y#s", "http://z/", "HTTPS://UP.example/Q",
        "mailto:x@y.z", "javascript:void(0)", "data:image/png;base64,AA==",
        "style.css", "a/b/../c.png", "%7Efoo", "foo%20bar", "foo bar",
        "//example.com/abs", "ftp://f/g", "g:h", "./g:h", "page2.html",
        "/wiki/Special:Search", "../static/images/x.png",
    ]
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "urljoin_pairs.tsv"), "w") as f:
        for b in bases:
            for r in rels:
                j = urljoin(b, r)
                f.write(f"{b}\t{r}\t{j}\n")

def gen_mime():
    # snapshot AFTER importing webarchive (its add_type overrides applied)
    mimes = sorted(set(list(mimetypes.types_map.values()) + [
        "text/html", "application/xhtml+xml", "text/css", "text/javascript",
        "application/x-javascript", "application/javascript", "font/woff",
        "font/woff2", "application/font-woff", "application/x-font-woff",
        "image/png", "image/jpeg", "image/gif", "image/svg+xml", "image/webp",
        "image/x-icon", "image/vnd.microsoft.icon", "application/json",
        "application/octet-stream", "text/plain", "audio/mpeg", "video/mp4",
        "font/ttf", "font/otf", "application/pdf", "image/avif",
        "application/wasm", "text/xml", "application/xml", "image/bmp",
        "image/tiff", "audio/ogg", "video/webm", "application/zip",
        "application/gzip", "text/csv", "text/markdown", "image/apng",
    ]))
    with open(os.path.join(OUT, "mime_ext.tsv"), "w") as f:
        for m in mimes:
            e = mimetypes.guess_extension(m) or ""
            f.write(f"{m}\t{e}\n")

def gen_rewriter_cases():
    """Feed HTML snippets through the reference rewriter in all three modes
    (multi-file subdir, multi-file samedir, single-file/data-URI) and snapshot
    output. The archive context mirrors reference test.py's RewriterTest."""
    sub_css = "p { color: blue }"
    sub_png = PNG
    ctx = arch(
        res(f"{H}/index.html", "text/html", "<html></html>", "utf-8"),
        [res(f"{H}/style.css", "text/css", sub_css, "utf-8"),
         res(f"{H}/images/image.png", "image/png", sub_png)])
    tmp = "/tmp/fixt_ctx.webarchive"
    with open(tmp, "wb") as f:
        f.write(plistlib.dumps(ctx, fmt=plistlib.FMT_BINARY))
    a = webarchive.open(tmp)

    html_cases = [
        '<a href="https://other.example.org/x.html">x</a>',
        '<a href="relative.html">x</a>',
        '<a href="https://example.com/style.css">x</a>',
        '<a href="style.css">x</a>',
        '<img src="https://other.example.org/x.png">',
        '<img src="https://example.com/images/image.png">',
        '<img src="images/image.png">',
        '<link rel="stylesheet" href="https://other.example.org/x.css">',
        '<link rel="stylesheet" href="https://example.com/style.css">',
        '<link rel="stylesheet" href="style.css">',
        '<style>p { background: url(images/image.png) }</style>',
        '<style>p { background: url(https://other.example.org/x.png) }</style>',
        '<form action="submit.cgi">x</form>',
        '<img srcset="images/image.png 1x, https://other.example.org/b.png 2x" src="images/image.png">',
        '<p>https://example.com/style.css</p>',
        '<p title="">x</p>',
        '<input checked>',
        '<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0//EN" "d.dtd"><br><input checked>',
        '<br><img src="images/image.png"><input checked>',
        '<p>&amp; &#65; &#x41; &copy; &bogus; text</p>',
        '<p title="&amp; &#65; &copy;">attr</p>',
        '<script>var a = "<b>" && 1 < 2;</script>',
        '<!-- comment --><!bogus><?pi?>',
        '<div CLASS="Mixed" ID=Case>x</div>',
        # tokenizer edge pins
        '<p>&amp no-semicolon &copy more</p>',
        '<p>text &amp</p>',                      # entity cut at EOF-ish
        '<p>&# bail ; later</p>',                # bad charref with ; ahead
        '<p>&#xZZ;</p>',
        '<p>&;</p><p>& lone</p>',
        '<p title="a&ampb">ent-in-attr-nosemi</p>',
        '<p title="&quot;q&quot;">quoted</p>',
        '<style>@media x { p { background: url( spaced.png ) } }</style>',
        '<a href="">empty href</a>',
        '<img src="">',
        '<a href="#frag">frag only</a>',
        '<a href="?q=1">query only</a>',
        '<img srcset="">',
        '<img srcset=" , ">',
        '<p>unterminated <!-- comment',
        '<p>unterminated <unclosed',
        '<p>tag at end<',
        '<script>until eof',
        '<style>p { background: url(images/image.png) }',  # unterminated style
        '<p data-x data-y=1 data-z>mixed attrs</p>',
        "<p title='single quoted'>sq</p>",
        '<br/><hr /><img src="images/image.png"/>',
        '<P><DIV><SPAN CLASS=U>case</SPAN></DIV></P>',
        '<a href="images/image.png#frag">sub with frag</a>',
        '<img src="images/image.png?v=2">',
        '<a href="//other.example.org/x">scheme-relative</a>',
        '<img src="//example.com/images/image.png">',
    ]
    css_cases = [
        'p { background: url(images/image.png) }',
        'p { background: url("images/image.png") }',
        "p { background: url('images/image.png') }",
        'p { background: url(https://example.com/images/image.png) }',
        'p { background: url(https://other.example.org/x.png) }',
        'p { background: url() }',
        '@import url(style.css);',
        'p { background: url(images/image.png) } q { background: url(images/image.png) }',
    ]
    rows = []
    for mode, subdir in (("subdir", "page_files"), ("samedir", ""), ("datauri", None)):
        for i, case in enumerate(html_cases):
            r = webarchive.webresource.WebResource(
                a, case.encode("utf-8"), "text/html", f"{H}/case{i}.html", "utf-8")
            out = io.StringIO()
            wutil.process_html_resource(r, out, subdir)
            rows.append(("html", mode, case, out.getvalue()))
        for i, case in enumerate(css_cases):
            r = webarchive.webresource.WebResource(
                a, case.encode("utf-8"), "text/css", f"{H}/sheets/case{i}.css", "utf-8")
            out = io.StringIO()
            wutil.process_css_resource(r, out, subdir)
            rows.append(("css", mode, case, out.getvalue()))
        # xhtml-mime variants of a few html cases
        for i, case in enumerate(html_cases[:12]):
            r = webarchive.webresource.WebResource(
                a, case.encode("utf-8"), "application/xhtml+xml",
                f"{H}/case{i}.xhtml", "utf-8")
            out = io.StringIO()
            wutil.process_html_resource(r, out, subdir)
            rows.append(("xhtml", mode, case, out.getvalue()))

    def esc(s):
        return s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n").replace("\r", "\\r")
    with open(os.path.join(OUT, "rewriter_cases.tsv"), "w") as f:
        for kind, mode, inp, out in rows:
            f.write(f"{kind}\t{mode}\t{esc(inp)}\t{esc(out)}\n")
    print(f"  rewriter cases: {len(rows)}")

def gen_entities():
    """HTML5 named character reference table + invalid charref maps
    (public WHATWG spec data, snapshotted from CPython's html module) into
    MAIN resources — the engine needs these at runtime for attr-value
    unescaping parity."""
    import html as html_mod
    import html.entities as ent
    mdir = "/root/repo/src/main/resources/graft"
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, "html5_entities.tsv"), "w") as f:
        for name, chars in sorted(ent.html5.items()):
            cps = " ".join(str(ord(c)) for c in chars)
            f.write(f"{name}\t{cps}\n")
    from html import _invalid_charrefs, _invalid_codepoints
    with open(os.path.join(mdir, "invalid_charrefs.tsv"), "w") as f:
        for k, v in sorted(_invalid_charrefs.items()):
            cps = " ".join(str(ord(c)) for c in v)
            f.write(f"{k}\t{cps}\n")
    with open(os.path.join(mdir, "invalid_codepoints.tsv"), "w") as f:
        for k in sorted(_invalid_codepoints):
            f.write(f"{k}\n")
    # mime table also goes to main resources (engine runtime dependency)
    shutil.copy(os.path.join(OUT, "mime_ext.tsv"), os.path.join(mdir, "mime_ext.tsv"))

def main():
    os.makedirs(OUT, exist_ok=True)
    # Wikipedia sample: copy verbatim + goldens
    with open(REF_SAMPLE, "rb") as f:
        wiki = f.read()
    process("wikipedia", wiki)
    for name, d in ARCHIVES.items():
        process(name, plistlib.dumps(d, fmt=plistlib.FMT_BINARY))
    # one XML-format plist variant to exercise the XML read path
    process("basic_xml", plistlib.dumps(ARCHIVES["basic"], fmt=plistlib.FMT_XML))
    gen_urljoin()
    gen_mime()
    gen_rewriter_cases()
    gen_entities()
    print("done ->", OUT)

if __name__ == "__main__":
    main()
