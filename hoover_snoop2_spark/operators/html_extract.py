"""Main-content extraction from HTML: DOM-tree boilerplate stripping with
text-density and link-density block scoring (readability/jusText-style).

The reference delegates HTML text to Apache Tika over HTTP
(snoop/data/analyzers/tika.py:95-145) and then strips residual tags with
bleach (html.py:20-23, email.py:160-169).  Tika is not runnable offline, so
— per the project north_rule — this module is a from-scratch extractor whose
pinned output is the regression oracle (same pattern as the reference's
hash-pinned fixture tests, testsuite/test_blobs.py:8-28).

Algorithm (classic block-scoring, cf. jusText / boilerpipe papers):

1. stream-parse with ``html.parser`` (stdlib, lenient on broken markup);
2. drop non-content subtrees structurally: ``script style noscript template
   svg nav header footer aside form iframe``;
3. drop subtrees whose class/id names mark boilerplate (cookie banners,
   comment sections, share bars, related-article boxes) — the
   readability "unlikely candidates" heuristic: these have LOW link
   density, so the structural and density rules alone would keep them;
4. segment character data into *blocks* at block-level element boundaries
   (p, h1-h6, li, td, blockquote, pre, div, ...);
5. score each block: ``link_density`` = chars emitted inside <a> / total
   chars; drop blocks with link_density > 0.33 (link farms, sidebars,
   breadcrumbs) or fewer than 2 characters;
6. emit surviving blocks NFC-normalized, whitespace-folded, joined \\n\\n.
"""

from __future__ import annotations

import unicodedata
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..functions.textutils import decode_html, fold_ws

#: subtrees never containing main content
_DROP_TAGS = frozenset(
    "script style noscript template svg nav header footer aside form iframe "
    "button select option head title".split()
)

#: tags that terminate/open a text block
_BLOCK_TAGS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li td th dt dd pre blockquote figcaption div "
    "article section main table tr ul ol br hr".split()
)

#: class/id substrings marking boilerplate subtrees (readability's
#: "unlikely candidates" — public heuristic: cookie/consent banners,
#: comments, share/social bars, related/promo boxes, pagination)
import re as _re

_UNLIKELY_RE = _re.compile(
    r"cookie|consent|banner|comment|community|disqus|share|social|sponsor|"
    r"related|promo|advert|shoutbox|sidebar|pagination|pager|popup|breadcrumb",
    _re.IGNORECASE,
)

#: a block mostly made of anchor text is navigation, not content
MAX_LINK_DENSITY = 0.33

#: minimum folded length for a block to count as content
MIN_BLOCK_CHARS = 2


#: void elements never initiate a class-based drop (no closing tag)
_VOID_TAGS = frozenset(
    "br hr img input meta link area base col embed source track wbr".split()
)


class _BlockParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []  # (text, chars, link_chars)
        self._buf: list[str] = []
        self._chars = 0
        self._link_chars = 0
        # stack of [tag, nested_same_tag_count] for dropped subtrees
        self._drop_stack: list[list] = []
        self._a_depth = 0

    @staticmethod
    def _is_unlikely(attrs) -> bool:
        for key, value in attrs:
            if key in ("class", "id") and value and _UNLIKELY_RE.search(value):
                return True
        return False

    def _flush(self) -> None:
        # most flushes are empty (adjacent block tags) — skip the regex
        # fold on the fast paths; isspace() is a C scan
        if not self._buf:
            self._chars = self._link_chars = 0
            return
        joined = "".join(self._buf)
        if not joined or joined.isspace():
            self._buf, self._chars, self._link_chars = [], 0, 0
            return
        text = fold_ws(joined)
        if text:
            self.blocks.append((text, self._chars, self._link_chars))
        self._buf, self._chars, self._link_chars = [], 0, 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if self._drop_stack:
            if tag == self._drop_stack[-1][0] and tag not in _VOID_TAGS:
                self._drop_stack[-1][1] += 1  # nested same tag inside drop
            return
        if tag in _DROP_TAGS or (
            tag not in _VOID_TAGS and self._is_unlikely(attrs)
        ):
            self._drop_stack.append([tag, 0])
            return
        if tag == "a":
            self._a_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if self._drop_stack:
            top = self._drop_stack[-1]
            if tag == top[0]:
                if top[1] > 0:
                    top[1] -= 1
                else:
                    self._drop_stack.pop()
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._drop_stack:
            return
        self._buf.append(data)
        n = len(data.strip())
        self._chars += n
        if self._a_depth:
            self._link_chars += n

    def close(self) -> None:  # noqa: D102 — flush trailing text
        super().close()
        self._flush()


# ---------------------------------------------------------------------------
# Fast one-shot scanner (r6 optimization).
#
# ``_BlockParser`` above is the semantic reference: html.parser's
# ``goahead`` loop costs ~0.9 µs/tag in pure-Python dispatch (line
# tracking, method indirection, per-tag attribute regex work), which made
# the block scorer the #1 CPU sink of the whole extraction kernel (90 ms
# per 1 MB page — profiled: 5.75 s of a 6.29 s html batch inside
# html/parser.py).  ``_scan_blocks`` below replays the EXACT tokenizer
# semantics of HTMLParser(convert_charrefs=True) for the one-shot
# feed(text)+close() case — same tag/comment/declaration/CDATA handling,
# same data chunking, same recovery on malformed markup (the regexes are
# pinned copies of the html.parser/_markupbase definitions, so a stdlib
# upgrade cannot silently change extraction output) — with the
# _BlockParser handler logic inlined:
#
# - no line/offset tracking (updatepos was ~10% of parse time),
# - attribute parsing is skipped inside dropped subtrees and for
#   drop/void tags (attrs only feed the unlikely-candidates check),
# - data inside dropped subtrees skips the entity unescape,
# - common-case tags (no attributes) take a single-regex fast path.
#
# Equivalence with _BlockParser is pinned by tests/test_html_fast.py:
# a structured+random differential fuzz suite plus the golden corpus
# byte-identity tests.
# ---------------------------------------------------------------------------

from html import unescape as _unescape

#: pinned html.parser (CPython 3.11) tokenizer regexes
_tagfind_tolerant = _re.compile(r'([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*')
_attrfind_tolerant = _re.compile(
    r'((?<=[\'"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*'
    r'(\'[^\']*\'|"[^"]*"|(?![\'"])[^>\s]*))?(?:\s|/(?!>))*')
_locatestarttagend_tolerant = _re.compile(r"""
  <[a-zA-Z][^\t\n\r\f />\x00]*       # tag name
  (?:[\s/]*                          # optional whitespace before attribute name
    (?:(?<=['"\s/])[^\s/>][^\s/=>]*  # attribute name
      (?:\s*=+\s*                    # value indicator
        (?:'[^']*'                   # LITA-enclosed value
          |"[^"]*"                   # LIT-enclosed value
          |(?!['"])[^>\s]*           # bare value
         )
        \s*                          # possibly followed by a space
       )?(?:\s|/(?!>))*
     )*
   )?
  \s*                                # trailing whitespace
""", _re.VERBOSE)
_endtagfind = _re.compile(r'</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>')
_commentclose = _re.compile(r'--\s*>')
_markedsectionclose = _re.compile(r']\s*]\s*>')
_msmarkedsectionclose = _re.compile(r']\s*>')
_declname_match = _re.compile(r'[a-zA-Z][-_.a-zA-Z0-9]*\s*').match

#: fast paths: attribute-less start tag / plain end tag (the overwhelming
#: majority of tags in real pages); anything else falls through to the
#: tolerant stdlib-equivalent machinery
_simple_start = _re.compile(r'<([a-zA-Z][^\t\n\r\f />\x00]*)\s*(/?)>').match
_simple_end = _endtagfind.match

#: per-tag CDATA closers (script/style), compiled once
_cdata_close = {
    "script": _re.compile(r'</\s*script\s*>', _re.I),
    "style": _re.compile(r'</\s*style\s*>', _re.I),
}


class _AbortScan(Exception):
    """Raised where html.parser would raise (unknown marked section /
    missing declaration name) — the caller keeps the blocks emitted so
    far, exactly like the try/except around _BlockParser.feed."""


def _scan_blocks(rawdata: str) -> list[tuple[str, int, int]]:
    """One-shot scan → [(block_text, chars, link_chars)], byte-identical
    to _BlockParser().feed(rawdata) + close()."""
    blocks: list[tuple[str, int, int]] = []
    buf: list[str] = []
    chars = 0
    link_chars = 0
    drop_stack: list[list] = []  # [tag, nested_same_tag_count]
    a_depth = 0

    block_tags = _BLOCK_TAGS
    drop_tags = _DROP_TAGS
    void_tags = _VOID_TAGS
    unlikely_search = _UNLIKELY_RE.search

    def flush() -> None:
        nonlocal buf, chars, link_chars
        if not buf:
            chars = link_chars = 0
            return
        joined = "".join(buf)
        if not joined or joined.isspace():
            buf, chars, link_chars = [], 0, 0
            return
        text = fold_ws(joined)
        if text:
            blocks.append((text, chars, link_chars))
        buf, chars, link_chars = [], 0, 0

    def data(d: str) -> None:
        # only reached when drop_stack is empty (call sites gate on it)
        nonlocal chars, link_chars
        buf.append(d)
        n = len(d.strip())
        chars += n
        if a_depth:
            link_chars += n

    def starttag(tag: str, unlikely: bool) -> None:
        nonlocal a_depth
        if drop_stack:
            if tag == drop_stack[-1][0] and tag not in void_tags:
                drop_stack[-1][1] += 1
            return
        if tag in drop_tags or unlikely:
            drop_stack.append([tag, 0])
            return
        if tag == "a":
            a_depth += 1
        if tag in block_tags and buf:
            # empty-buffer flush is a no-op by invariant (chars/link_chars
            # only become nonzero via data(), which always appends) — skip
            # the call for the ~50% of block boundaries with nothing queued
            flush()

    def endtag(tag: str) -> None:
        nonlocal a_depth
        if drop_stack:
            top = drop_stack[-1]
            if tag == top[0]:
                if top[1] > 0:
                    top[1] -= 1
                else:
                    drop_stack.pop()
            return
        if tag == "a":
            a_depth = max(0, a_depth - 1)
        if tag in block_tags and buf:
            flush()

    n = len(rawdata)
    i = 0
    find = rawdata.find
    cdata_elem: str | None = None
    try:
        while i < n:
            if cdata_elem is not None:
                # CDATA content (script/style): only the matching close
                # tag is markup; character data is never unescaped and —
                # since script/style always sit under an active drop —
                # never reaches the buffer, so it is skipped outright.
                m = _cdata_close[cdata_elem].search(rawdata, i)
                if m is None:
                    # unterminated: html.parser swallows the rest (the
                    # post-loop tail emit is gated on cdata being off),
                    # but close() still flushes buffered text
                    i = n
                    break
                i = m.start()
                # parse_endtag on the matched close tag
                gt = find(">", i + 1) + 1
                em = _endtagfind.match(rawdata, i)
                endtag(em.group(1).lower())
                cdata_elem = None
                i = gt
                continue
            j = find("<", i)
            if j < 0:
                j = n
            if i < j:
                if not drop_stack:
                    d = rawdata[i:j]
                    data(_unescape(d) if "&" in d else d)
                i = j
            if i == n:
                break
            c = rawdata[i + 1:i + 2]
            if ("a" <= c <= "z") or ("A" <= c <= "Z"):
                # --- parse_starttag ---
                m = _simple_start(rawdata, i)
                if m is not None:
                    tag = m.group(1).lower()
                    unlikely = False
                    startend = bool(m.group(2))
                    k = m.end()
                else:
                    k, tag, unlikely, startend = _slow_starttag(
                        rawdata, i, drop_stack, drop_tags, void_tags,
                        unlikely_search,
                    )
                    if k < 0:
                        i = _recover(rawdata, i, drop_stack, data)
                        continue
                    if tag is None:  # bogus start tag → raw text as data
                        if not drop_stack:
                            data(rawdata[i:k])
                        i = k
                        continue
                if startend:  # <tag/> → handle_startendtag: start + end
                    starttag(tag, unlikely)
                    endtag(tag)
                else:
                    starttag(tag, unlikely)
                    if tag in _cdata_close:
                        cdata_elem = tag
                i = k
            elif c == "/":
                # --- parse_endtag ---
                m = _simple_end(rawdata, i)
                if m is not None:
                    endtag(m.group(1).lower())
                    i = m.end()
                    continue
                gt = find(">", i + 1)
                if gt < 0:
                    i = _recover(rawdata, i, drop_stack, data)
                    continue
                gt += 1
                nm = _tagfind_tolerant.match(rawdata, i + 2)
                if nm is None:
                    if rawdata[i:i + 3] == "</>":
                        i += 3
                    else:  # bogus comment: skip to '>'
                        i = gt
                    continue
                endtag(nm.group(1).lower())
                i = find(">", nm.end()) + 1
            elif c == "!":
                if rawdata[i + 2:i + 4] == "--":
                    m = _commentclose.search(rawdata, i + 4)
                    if m is None:
                        i = _recover(rawdata, i, drop_stack, data)
                        continue
                    i = m.end()
                elif rawdata[i + 2:i + 3] == "[":
                    k = _marked_section(rawdata, i)
                    if k < 0:  # unterminated → goahead recovery
                        i = _recover(rawdata, i, drop_stack, data)
                        continue
                    i = k
                elif rawdata[i + 2:i + 9].lower() == "doctype":
                    gt = find(">", i + 9)
                    if gt < 0:
                        i = _recover(rawdata, i, drop_stack, data)
                        continue
                    i = gt + 1
                else:  # bogus comment
                    gt = find(">", i + 2)
                    if gt < 0:
                        i = _recover(rawdata, i, drop_stack, data)
                        continue
                    i = gt + 1
            elif c == "?":
                gt = find(">", i + 2)
                if gt < 0:
                    i = _recover(rawdata, i, drop_stack, data)
                    continue
                i = gt + 1
            elif i + 1 < n:
                if not drop_stack:
                    data("<")
                i += 1
            else:
                break
        if i < n and not drop_stack:
            d = rawdata[i:n]
            data(_unescape(d) if "&" in d else d)
        flush()  # close()
    except _AbortScan:
        pass  # keep blocks emitted so far (same as the try around feed)
    return blocks


def _recover(rawdata: str, i: int, drop_stack: list, data) -> int:
    """goahead's end-of-input recovery for an unterminated construct:
    emit raw-until-next-delimiter as (unescaped) data."""
    k = rawdata.find(">", i + 1)
    if k < 0:
        k = rawdata.find("<", i + 1)
        if k < 0:
            k = i + 1
    else:
        k += 1
    if not drop_stack:
        d = rawdata[i:k]
        data(_unescape(d) if "&" in d else d)
    return k


def _slow_starttag(rawdata, i, drop_stack, drop_tags, void_tags,
                   unlikely_search):
    """Full parse_starttag for tags with attributes / malformed tags.

    Returns (endpos, tag, unlikely, startend); endpos < 0 → incomplete
    (recovery); tag None → invalid tag, emit rawdata[i:endpos] as data."""
    # check_for_whole_start_tag
    m = _locatestarttagend_tolerant.match(rawdata, i)
    j = m.end()
    nxt = rawdata[j:j + 1]
    if nxt == ">":
        endpos = j + 1
    elif nxt == "/":
        if rawdata.startswith("/>", j):
            endpos = j + 2
        else:
            endpos = j if j > i else i + 1
    elif nxt == "":
        return -1, None, False, False
    elif nxt in ("abcdefghijklmnopqrstuvwxyz=/"
                 "ABCDEFGHIJKLMNOPQRSTUVWXYZ"):
        return -1, None, False, False
    else:
        endpos = j if j > i else i + 1

    tm = _tagfind_tolerant.match(rawdata, i + 1)
    k = tm.end()
    tag = tm.group(1).lower()
    # attributes matter only for the unlikely-candidates check, which is
    # only consulted for non-dropped, non-drop-tag, non-void tags
    need_attrs = not drop_stack and tag not in drop_tags and tag not in void_tags
    unlikely = False
    while k < endpos:
        am = _attrfind_tolerant.match(rawdata, k)
        if am is None:
            break
        if need_attrs and not unlikely:
            attrname, rest, attrvalue = am.group(1, 2, 3)
            if attrname.lower() in ("class", "id") and rest:
                if attrvalue[:1] == "'" == attrvalue[-1:] or \
                        attrvalue[:1] == '"' == attrvalue[-1:]:
                    attrvalue = attrvalue[1:-1]
                if attrvalue:
                    if "&" in attrvalue:
                        attrvalue = _unescape(attrvalue)
                    if unlikely_search(attrvalue):
                        unlikely = True
        k = am.end()
    end = rawdata[k:endpos].strip()
    if end not in (">", "/>"):
        return endpos, None, False, False
    return endpos, tag, unlikely, end == "/>"


def _marked_section(rawdata: str, i: int) -> int:
    """_markupbase.parse_marked_section; raises _AbortScan where the
    stdlib would raise (unknown keyword / missing name)."""
    nm = _declname_match(rawdata, i + 3)
    if nm is None:
        raise _AbortScan  # _scan_name error path
    s = nm.group()
    name = s.strip().lower()
    if i + 3 + len(s) == len(rawdata):
        return -1  # name runs to end of buffer
    if name in ("temp", "cdata", "ignore", "include", "rcdata"):
        m = _markedsectionclose.search(rawdata, i + 3)
    elif name in ("if", "else", "endif"):
        m = _msmarkedsectionclose.search(rawdata, i + 3)
    else:
        raise _AbortScan  # unknown status keyword
    if m is None:
        return -1
    return m.end()


def extract_blocks(html_text: str) -> list[str]:
    """Parse + score; return surviving content blocks in document order."""
    out: list[str] = []
    for text, chars, link_chars in _scan_blocks(html_text):
        if len(text) < MIN_BLOCK_CHARS:
            continue
        if chars > 0 and (link_chars / chars) > MAX_LINK_DENSITY:
            continue
        out.append(text)
    return out


def html_to_text(data: bytes) -> str:
    """bytes → decoded (meta-charset aware) → block-scored main content,
    NFC-normalized, blocks joined with blank lines."""
    html_text = decode_html(data)
    blocks = [unicodedata.normalize("NFC", b) for b in extract_blocks(html_text)]
    return "\n\n".join(blocks)


def strip_tags(fragment: str) -> str:
    """Tag-strip for HTML email parts — analog of the reference's bleach
    ``clean_str`` (html.py:20-23): keep text content, drop markup."""
    return "\n\n".join(t for t, _, _ in _scan_blocks(fragment))


@F.pandas_udf(StringType())
def html_to_text_udf(data: pd.Series) -> pd.Series:
    return data.map(lambda b: html_to_text(b) if b is not None else None)


def apply_html_extract(df: DataFrame, data_col: str = "html") -> DataFrame:
    """Add an ``html_text`` column; keep the plan declarative so Catalyst
    prunes ``data_col`` from the scan when downstream drops it."""
    return df.withColumn("html_text", html_to_text_udf(F.col(data_col)))


def robots_directives(html_col) -> dict[str, F.Column]:
    """Crawl-politeness gate columns from raw html — pure JVM regexps, no
    DOM pass: ``noindex``/``nofollow`` from the robots meta tag and the
    rel=canonical target.  A training pipeline drops noindex pages before
    extraction (publisher opt-out) and groups re-crawl variants by their
    canonical url; both predicates push into the scan as plain column
    expressions."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    directives = F.lower(
        F.regexp_extract(
            c, r'(?i)<meta\s+name="robots"\s+content="([^"]*)"', 1
        )
    )
    return {
        "robots_noindex": directives.contains("noindex"),
        "robots_nofollow": directives.contains("nofollow"),
        "canonical_url": F.regexp_extract(
            c, r'(?i)<link\s+rel="canonical"\s+href="([^"]*)"', 1
        ),
    }


class _TableParser(HTMLParser):
    """``<table>`` structure parser: tables → rows → cell strings.

    Deterministic, documented semantics (not browser-perfect layout):
    nested tables become their own entries, emitted in close order
    (inner-first), and their cells do NOT leak into the parent cell's
    text; inline markup inside a cell is stripped; character references
    decode (``convert_charrefs``); cell text is whitespace-folded;
    colspan/rowspan are ignored (one cell per ``<td>``/``<th>``).  The
    reference renders tables through Tika's HTML handler
    (tika.py:95-145), which likewise flattens them to cell text; the
    structured rows feed the same ``explode_row`` machinery the CSV
    path uses (archives.py:206-234).
    """

    def __init__(self) -> None:
        super().__init__()
        self.tables: list[list[list[str]]] = []
        self._stack: list[dict] = []
        # depth inside script/style/etc. subtrees — their character data
        # is code, not cell text (same drop set as the block extractor)
        self._drop_depth = 0

    def _ctx(self):
        return self._stack[-1] if self._stack else None

    def _end_cell(self, ctx: dict) -> None:
        if ctx["in_cell"]:
            ctx["row"].append(fold_ws("".join(ctx["buf"])).strip())
            ctx["buf"] = []
            ctx["in_cell"] = False

    def _end_row(self, ctx: dict) -> None:
        self._end_cell(ctx)
        if ctx["in_row"]:
            ctx["rows"].append(ctx["row"])
            ctx["row"] = []
            ctx["in_row"] = False

    def handle_starttag(self, tag, attrs):  # noqa: D102
        if tag in _DROP_TAGS and tag not in _VOID_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return  # the whole dropped subtree is invisible, tables included
        if tag == "table":
            self._stack.append(
                {
                    "rows": [],
                    "row": [],
                    "buf": [],
                    "in_row": False,
                    "in_cell": False,
                }
            )
            return
        ctx = self._ctx()
        if ctx is None:
            return
        if tag == "tr":
            self._end_row(ctx)
            ctx["in_row"] = True
        elif tag in ("td", "th"):
            self._end_cell(ctx)
            # broken markup: a cell outside any <tr> opens an implicit row
            ctx["in_row"] = True
            ctx["in_cell"] = True

    def handle_endtag(self, tag):  # noqa: D102
        if tag in _DROP_TAGS and tag not in _VOID_TAGS:
            if self._drop_depth:
                self._drop_depth -= 1
            return
        if self._drop_depth:
            return
        ctx = self._ctx()
        if ctx is None:
            return
        if tag == "table":
            self._end_row(ctx)
            self._stack.pop()
            self.tables.append(ctx["rows"])
        elif tag == "tr":
            self._end_row(ctx)
        elif tag in ("td", "th"):
            self._end_cell(ctx)

    def handle_data(self, data):  # noqa: D102
        if self._drop_depth:
            return
        ctx = self._ctx()
        if ctx is not None and ctx["in_cell"]:
            ctx["buf"].append(data)


def extract_tables(html_text: str) -> list[list[list[str]]]:
    """All ``<table>`` elements as rows of cell strings (see
    :class:`_TableParser` for the exact semantics)."""
    parser = _TableParser()
    try:
        parser.feed(html_text)
        parser.close()
    except Exception:
        pass
    # truncated markup: flush tables left open at EOF (outer-most last,
    # matching the close-order contract)
    while parser._stack:
        ctx = parser._stack.pop()
        parser._end_row(ctx)
        parser.tables.append(ctx["rows"])
    return parser.tables


_TABLES_TYPE = ArrayType(ArrayType(ArrayType(StringType())))


@F.pandas_udf(_TABLES_TYPE)
def html_tables_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched table extraction; accepts raw bytes (meta-charset
    aware decode) or an already-decoded string column."""

    def one(v):
        if v is None:
            return []
        if isinstance(v, (bytes, bytearray)):
            v = decode_html(bytes(v))
        return extract_tables(v)

    return html.map(one)


def heading_outline(html_col: F.Column) -> F.Column:
    """Hierarchical section numbering over a page's ``<h1>``-``<h6>``
    headings — the document-outline signal search UIs (including
    hoover's) build from Tika's structured HTML output.  Returns
    ``array<string>`` of ``"1.2.1 title"`` entries in document order:
    each heading increments its level's counter and resets all deeper
    ones (naive HTML5 outline; a level skipped by the author shows as
    0, e.g. ``h3`` directly under ``h1`` → ``1.0.1``).

    Entirely JVM-side: ``regexp_extract_all`` pulls (level, title)
    pairs and one ``aggregate`` threads the six counters through the
    heading sequence — no Python, no shuffle, scan-adjacent at any
    scale."""
    levels = F.regexp_extract_all(html_col, F.lit(r"<h([1-6])>"), 1)
    titles = F.regexp_extract_all(
        html_col, F.lit(r"<h[1-6]>([^<]*)</h[1-6]>"), 1
    )
    heads = F.zip_with(
        levels,
        titles,
        lambda l, t: F.struct(
            l.cast("int").alias("lvl"), t.alias("title")
        ),
    )
    zero = F.struct(
        F.array_repeat(F.lit(0), 6).alias("c"),
        F.array().cast("array<string>").alias("out"),
    )

    def step(acc, h):
        newc = F.transform(
            F.sequence(F.lit(1), F.lit(6)),
            lambda j: F.when(j < h["lvl"], F.element_at(acc["c"], j))
            .when(j == h["lvl"], F.element_at(acc["c"], j) + 1)
            .otherwise(F.lit(0)),
        )
        num = F.array_join(
            F.transform(
                F.sequence(F.lit(1), h["lvl"]),
                lambda j: F.element_at(newc, j).cast("string"),
            ),
            ".",
        )
        entry = F.concat_ws(" ", num, h["title"])
        return F.struct(
            newc.alias("c"),
            F.concat(acc["out"], F.array(entry)).alias("out"),
        )

    return F.aggregate(heads, zero, step, lambda acc: acc["out"])


def head_metadata(html_col, url_col=None) -> dict[str, F.Column]:
    """Page metadata from the HTML ``<head>`` — the title/OpenGraph/
    publish-date fields hoover's UI shows per document (the reference
    surfaces them through Tika's metadata map, tika.py:95-145; search
    engines and training pipelines read the same tags for dedup keys and
    temporal filtering).  Pure JVM regexps over the raw html — no DOM
    pass, no Python — so the projection stays scan-adjacent at any scale
    and pushes through column pruning like any other expression.

    Returned columns (absent tag → NULL, never ``''``):

    - ``title`` — ``<title>`` text;
    - ``og_title`` / ``og_description`` — OpenGraph properties;
    - ``author`` — ``<meta name="author">``;
    - ``display_title`` — ``og:title`` falling back to ``<title>``
      (the precedence link-preview renderers use);
    - ``published`` — ``article:published_time`` meta, falling back to
      a ``/YYYY/MM/DD/`` segment of the url when ``url_col`` is given
      (the blog-permalink heuristic trafilatura-style date extractors
      apply before giving up).
    """
    c = F.col(html_col) if isinstance(html_col, str) else html_col

    def meta(attr: str, name: str) -> F.Column:
        pat = rf'(?i)<meta\s+{attr}="{name}"\s+content="([^"]*)"'
        return F.nullif(F.regexp_extract(c, pat, 1), F.lit(""))

    title = F.nullif(
        F.regexp_extract(c, r"(?i)<title>([^<]*)</title>", 1), F.lit("")
    )
    og_title = meta("property", "og:title")
    og_desc = meta("property", "og:description")
    author = meta("name", "author")
    published = meta("property", "article:published_time")
    if url_col is not None:
        u = F.col(url_col) if isinstance(url_col, str) else url_col
        pat = r"/(\d{4})/(\d{2})/(\d{2})/"
        y = F.regexp_extract(u, pat, 1)
        url_date = F.when(
            y != "",
            F.concat_ws(
                "-",
                y,
                F.regexp_extract(u, pat, 2),
                F.regexp_extract(u, pat, 3),
            ),
        )
        published = F.coalesce(published, url_date)
    return {
        "title": title,
        "og_title": og_title,
        "og_description": og_desc,
        "author": author,
        "display_title": F.coalesce(og_title, title),
        "published": published,
    }


@F.pandas_udf(StringType())
def decode_html_udf(data: pd.Series) -> pd.Series:
    """Arrow-batched ``decode_html``: meta-charset probe first, then the
    magic encoding ladder (BOM → NUL/binary → ascii → utf-8 → latin-1) —
    the exact byte→str step the html analyze kernel runs before block
    scoring (reference sniffs the same way via libmagic's encoding field,
    magic.py + digests.py:171-200).  Exposed standalone so the ladder is
    driver-oracle certifiable (q99) and usable as a one-Project decode
    over raw crawl bytes."""
    return data.map(lambda b: decode_html(b) if b is not None else None)


def jsonld_fields(html_col) -> dict[str, F.Column]:
    """schema.org JSON-LD metadata from the page's
    ``<script type="application/ld+json">`` block — the structured-data
    channel news sites and blogs publish alongside the visible HTML
    (search engines prefer it over scraped heuristics; the reference
    surfaces the same article fields through Tika's metadata map,
    tika.py:95-145).  The script body is pulled with one JVM regexp and
    the fields with ``get_json_object`` — Catalyst's built-in JsonPath
    evaluator — so the whole projection is codegen'd, no Python and no
    UDF json parsing at any scale.

    Returned columns (absent block or field → NULL):

    - ``ld_type`` — ``@type`` (Article, NewsArticle, BlogPosting, …);
    - ``headline`` / ``date_published`` / ``publisher`` — the
      like-named schema.org properties;
    - ``author_name`` — ``author.name`` accepting BOTH encodings the
      wild uses: a single author object or an array of author objects
      (first entry wins), via a coalesce of the two JsonPaths.
    """
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    js = F.nullif(
        F.regexp_extract(
            c,
            r'(?is)<script type="application/ld\+json">(.*?)</script>',
            1,
        ),
        F.lit(""),
    )

    def g(path: str) -> F.Column:
        return F.get_json_object(js, path)

    return {
        "ld_type": g("$['@type']"),
        "headline": g("$.headline"),
        "date_published": g("$.datePublished"),
        "author_name": F.coalesce(g("$.author.name"), g("$.author[0].name")),
        "publisher": g("$.publisher.name"),
    }


def hreflang_alternates(html_col) -> dict[str, F.Column]:
    """``<link rel="alternate" hreflang=..>`` extraction — the i18n
    cluster declaration search engines use to group language variants
    of one page (and a crawl pipeline uses to dedup translations
    before language-specific training splits).  Two aligned
    ``regexp_extract_all`` pulls (same pattern, different groups)
    zipped into (hreflang, href) pairs — all JVM, order-preserving,
    no DOM pass.

    Returns ``langs`` (array of hreflang codes in document order),
    ``hrefs`` (aligned targets) and ``x_default`` (the x-default
    target, NULL when absent)."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    pat = r'<link rel="alternate" hreflang="([^"]+)" href="([^"]+)"\s*/?>'
    langs = F.regexp_extract_all(c, F.lit(pat), 1)
    hrefs = F.regexp_extract_all(c, F.lit(pat), 2)
    x_default = F.nullif(
        F.regexp_extract(
            c,
            r'<link rel="alternate" hreflang="x-default" href="([^"]+)"',
            1,
        ),
        F.lit(""),
    )
    return {"langs": langs, "hrefs": hrefs, "x_default": x_default}


def soft404_verdict(title_col, body_col) -> F.Column:
    """Soft-404 / error-page triage: pages served with HTTP 200 whose
    CONTENT is an error or a wall — the classic crawl-corpus poison
    (C4 and CCNet both gate on it; the reference records the analog
    per-blob as ``broken_reason``).  Pure JVM regexps over title and
    body, first match wins, ``ok`` otherwise.  Verdicts:
    ``not_found`` / ``forbidden`` / ``login_wall`` / ``empty`` /
    ``ok``."""
    t = F.col(title_col) if isinstance(title_col, str) else title_col
    b = F.col(body_col) if isinstance(body_col, str) else body_col
    tl = F.lower(F.coalesce(t, F.lit("")))
    bl = F.lower(F.coalesce(b, F.lit("")))
    return (
        F.when(
            tl.rlike(r"(404|page not found|not found)")
            | bl.rlike(r"(could not be found|does not exist"
                       r"|page not found)"),
            F.lit("not_found"),
        )
        .when(
            tl.rlike(r"(403|access denied|forbidden)")
            | bl.rlike(r"access denied"),
            F.lit("forbidden"),
        )
        .when(
            tl.rlike(r"(log ?in|sign ?in required)")
            | bl.rlike(r"(please log ?in to continue|subscribers only)"),
            F.lit("login_wall"),
        )
        .when(F.length(F.trim(bl)) == 0, F.lit("empty"))
        .otherwise(F.lit("ok"))
    )


def crawl_directives(html_col) -> dict[str, F.Column]:
    """Page-level crawl directives: ``<meta name="robots">`` noindex /
    nofollow flags (the page-side half of the robots.txt gate, q49/
    q78 — a compliant indexer honors BOTH) and the ``<meta
    http-equiv="refresh">`` redirect (delay + target url), which
    feeds the same chain resolution as HTTP redirects (q76).  All JVM
    regexps in one Project."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    robots = F.lower(F.regexp_extract(
        c, r'(?i)<meta name="robots" content="([^"]*)"', 1
    ))
    refresh = F.regexp_extract(
        c,
        r'(?i)<meta http-equiv="refresh"\s+'
        r'content="(\d+)\s*;\s*url=([^"]+)"',
        2,
    )
    delay = F.regexp_extract(
        c,
        r'(?i)<meta http-equiv="refresh"\s+'
        r'content="(\d+)\s*;\s*url=([^"]+)"',
        1,
    )
    return {
        "noindex": robots.rlike(r"(^|[,\s])noindex($|[,\s])"),
        "nofollow": robots.rlike(r"(^|[,\s])nofollow($|[,\s])"),
        "refresh_url": F.nullif(refresh, F.lit("")),
        "refresh_seconds": F.nullif(delay, F.lit("")).cast("long"),
    }


def decode_entities(col) -> F.Column:
    """HTML character-reference decoding, expression-only: tokenize
    into numeric refs (``&#233;`` / ``&#x41;``), named refs and
    literal runs with one ``regexp_extract_all``, then decode per
    token — numeric refs become the codepoint via
    ``decode(unhex(lpad(conv(n,10,16),8,'0')), 'UTF-32')`` (full
    Unicode, surrogate/range-guarded so hostile refs pass through
    instead of killing the task under Spark 4's strict codecs), and a
    named subset (the W3C core + the typography set real pages use)
    via CASE.  Unknown named refs stay as-is, like browsers render
    them."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.regexp_extract_all(
        c, F.lit("(&#[Xx][0-9A-Fa-f]+;|&#[0-9]+;|&[a-zA-Z]+;|&|[^&]+)"), 1
    )
    NAMED = {
        "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
        "nbsp": " ", "copy": "©", "reg": "®",
        "eacute": "é", "egrave": "è", "agrave": "à", "ccedil": "ç",
        "uuml": "ü", "ouml": "ö", "auml": "ä", "szlig": "ß",
        "mdash": "—", "ndash": "–", "hellip": "…",
        "rsquo": "’", "lsquo": "‘",
        "rdquo": "”", "ldquo": "“",
    }

    def cp_char(n):
        # codepoint -> char via UTF-32 decode; guard range + surrogates
        ok = (n > 0) & (n <= 0x10FFFF) & ~((n >= 0xD800) & (n <= 0xDFFF))
        return F.when(
            ok, F.decode(F.unhex(F.lpad(F.conv(n.cast("string"), 10, 16),
                                        8, "0")), "UTF-32")
        )

    def fix(t):
        dec = F.regexp_extract(t, r"^&#([0-9]+);$", 1)
        hexs = F.regexp_extract(t, r"^&#[Xx]([0-9A-Fa-f]+);$", 1)
        name = F.regexp_extract(t, r"^&([a-zA-Z]+);$", 1)
        named = None
        for k, v in NAMED.items():
            cond = name == k
            named = (F.when(cond, F.lit(v)) if named is None
                     else named.when(cond, F.lit(v)))
        named = named.otherwise(t)  # unknown named ref: keep literal
        return (
            F.when(dec != "", F.coalesce(cp_char(dec.cast("long")), t))
            .when(hexs != "",
                  F.coalesce(cp_char(F.conv(hexs, 16, 10).cast("long")), t))
            .when(name != "", named)
            .otherwise(t)
        )

    return F.array_join(F.transform(toks, fix), "")


def html_to_markdown(html_col) -> F.Column:
    """Structure-preserving HTML→Markdown for a constrained subset
    (h1-h3, p, li, a, strong/b, em/i) — modern training pipelines
    increasingly keep document STRUCTURE as markdown instead of the
    flat text ``html_to_text`` emits, so headings and links survive
    into the training corpus.  A fixed JVM ``regexp_replace`` chain:
    inline marks first (links → ``[text](href)``, bold, italics),
    then block elements to their markdown forms, then any leftover
    tag is stripped and blank runs collapse.  Zero Python; pages with
    markup outside the subset degrade to plain text rather than
    erroring (the leftover-tag strip)."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    r = F.regexp_replace
    out = c
    # inline
    out = r(out, r'(?is)<a\s+href="([^"]*)"[^>]*>(.*?)</a>', r"[$2]($1)")
    out = r(out, r"(?is)<(?:b|strong)>(.*?)</(?:b|strong)>", r"**$1**")
    out = r(out, r"(?is)<(?:i|em)>(.*?)</(?:i|em)>", r"*$1*")
    # blocks
    out = r(out, r"(?is)<h1[^>]*>(.*?)</h1>", "\n\n# $1\n\n")
    out = r(out, r"(?is)<h2[^>]*>(.*?)</h2>", "\n\n## $1\n\n")
    out = r(out, r"(?is)<h3[^>]*>(.*?)</h3>", "\n\n### $1\n\n")
    out = r(out, r"(?is)<p[^>]*>(.*?)</p>", "\n\n$1\n\n")
    out = r(out, r"(?is)<li[^>]*>(.*?)</li>", "\n- $1")
    out = r(out, r"(?is)</?(?:ul|ol)[^>]*>", "\n")
    # leftover tags, whitespace discipline
    out = r(out, r"(?s)<[^>]+>", "")
    out = r(out, r"[ \t]+\n", "\n")
    out = r(out, r"\n{3,}", "\n\n")
    # F.trim strips spaces only — edge newlines need the regexp form
    return r(out, r"(?s)^\s+|\s+$", "")


def svg_to_text(data: bytes) -> str:
    """SVG text extraction — character data of text-bearing elements
    (<text>/<tspan>/<title>/<desc>), markup and style/script/defs
    subtrees dropped.  The reference Tika-extracts ``image/svg+xml``
    (_tika_mime_types.py:1219); Tika's handler emits the document's
    character data, which for SVG is exactly these elements."""
    import html as _html
    import re as _re
    import unicodedata as _u

    text = decode_html(data)
    text = _re.sub(r"<(style|script|defs|metadata)\b.*?</\1\s*>", " ",
                   text, flags=_re.DOTALL | _re.IGNORECASE)
    text = _re.sub(r"<!--.*?-->", " ", text, flags=_re.DOTALL)
    text = _re.sub(r"<[^>]*>", " ", text)
    text = _html.unescape(text)
    text = _u.normalize("NFC", " ".join(text.split()))
    return text
