"""URL canonicalization — the dedup-prep every web-crawl pipeline runs
before url-keyed joins (the reference keys documents by path/url inside a
collection; at WARC scale the same page arrives under trivially-different
urls).

Rules (the common-crawl-style canonical subset, all pure column exprs):

- fragment stripped;
- scheme + host lowercased; default ports (:80 http / :443 https) removed;
- tracking params (utm_*, fbclid, gclid, ref) dropped;
- remaining query params sorted (codepoint order — identical in Spark and
  DuckDB's binary collation, which is what the q41 oracle checks);
- empty path → '/'; path case preserved (paths are case-sensitive).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

#: params stripped during canonicalization (shared with the q41 oracle)
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="


def canonicalize_url(col: F.Column) -> F.Column:
    no_frag = F.regexp_replace(col, r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    after = F.regexp_replace(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(after, r"^([^/?]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    pathq = F.regexp_replace(after, r"^[^/?]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (~p.rlike(TRACKING_PARAM_RE)) & (p != ""),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


#: public-suffix subset for registrable-domain extraction.  The real
#: Mozilla PSL is ~9k rules; pipelines embed it as a broadcast table —
#: this deterministic subset keeps the operator testable offline while
#: the lookup shape (longest matching suffix wins) is the real one.
#: Two-label entries must be checked before their one-label parent.
PUBLIC_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "co.in",
    "github.io", "blogspot.com",
    "com", "org", "net", "edu", "gov", "io", "de", "fr", "uk", "jp",
    "au", "br", "cn", "in", "us", "info", "biz",
]


def registrable_domain(host_col) -> F.Column:
    """eTLD+1 (the "registrable domain") from a hostname — the grouping
    key crawl politeness, per-site caps (q45) and domain priors (q63)
    should really use: ``news.bbc.co.uk`` → ``bbc.co.uk``, not
    ``co.uk``.  Longest-matching public suffix wins, evaluated as a
    CASE chain over JVM ``endswith`` tests (two-label suffixes first),
    then one label is prepended with a regexp pull.  Unknown TLDs fall
    back to the last two labels (the PSL's implicit ``*`` rule).  Pure
    expressions: the suffix list compiles INTO the plan, so there is
    no join and no Python at any scale — swap ``PUBLIC_SUFFIXES`` for
    the full broadcast PSL table if exotic TLD fidelity matters."""
    h = F.col(host_col) if isinstance(host_col, str) else host_col
    h = F.lower(h)
    expr = None
    for suf in sorted(PUBLIC_SUFFIXES, key=lambda s: -s.count(".")):
        esc = suf.replace(".", r"\.")
        cond = h.rlike(rf"(^|\.){esc}$")
        # label immediately left of the suffix, plus the suffix
        pull = F.regexp_extract(h, rf"([^.]+\.{esc})$", 1)
        val = F.when(pull != "", pull).otherwise(h)  # host IS the suffix
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    fallback = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    return expr.otherwise(F.when(fallback != "", fallback).otherwise(h))


def ascii_fold(col) -> F.Column:
    """Accent folding for search keys (ES ``asciifolding`` analyzer
    analog — hoover's index applies it before matching): lowercase,
    strip combining marks of NFD-decomposable latin letters, and map
    the common non-decomposable ones (ø, ß, æ, œ, đ, þ).  Implemented
    as JVM ``translate`` over the precomposed latin-1/latin-2 range —
    zero Python, zero shuffle; text outside the mapped range passes
    through unchanged (folding is a search-key transform, not a
    lossless one)."""
    c = F.col(col) if isinstance(col, str) else col
    src = ("àáâãäåāăąèéêëēĕėęěìíîïĩīĭįòóôõöōŏőùúûüũūŭůűýÿñçćĉčśŝšźżžĝğġ"
           "ĥĵķĺļľŀłńņňŕŗřţťŧŵŷđ")
    # fold target = NFD base letter; ŀłđŧ do not decompose, map by hand
    _manual = {"ŀ": "l", "ł": "l", "đ": "d", "ŧ": "t"}
    dst = "".join(
        _manual.get(ch, unicodedata.normalize("NFD", ch)[0]) for ch in src
    )
    folded = F.translate(F.lower(c), src, dst)
    for a, b in (("ß", "ss"), ("æ", "ae"), ("œ", "oe"), ("ø", "o"),
                 ("þ", "th")):
        folded = F.replace(folded, F.lit(a), F.lit(b))
    return folded


def idn_decode_host_py(host: str | None) -> str | None:
    """Pure-Python IDN host decode: every ``xn--`` (ACE) label decodes
    via RFC 3492 punycode (stdlib codec); malformed labels stay as-is
    (a crawl normalizer must never throw on hostile input)."""
    if host is None:
        return None
    out = []
    for label in host.lower().split("."):
        if label.startswith("xn--"):
            try:
                out.append(label[4:].encode("ascii").decode("punycode"))
                continue
            except (UnicodeError, ValueError):
                pass
        out.append(label)
    return ".".join(out)


@F.pandas_udf(StringType())
def idn_decode_host_udf(s: pd.Series) -> pd.Series:
    """Arrow-batched ``idn_decode_host_py`` — IDN hosts are the one
    URL-normalization step with no JVM expression (punycode needs the
    RFC 3492 insertion-sort state machine); everything else in this
    module stays expression-only."""
    return s.map(idn_decode_host_py)

#: RFC 3986 unreserved set — percent-escapes of these MUST decode
_UNRESERVED_RE = "[A-Za-z0-9._~-]"


def percent_normalize(col) -> F.Column:
    """RFC 3986 §6.2.2 percent-encoding normalization, expression-only:
    tokenize into ``%XX`` escapes vs literal runs with one
    ``regexp_extract_all``, then per token either decode (when the
    escaped byte is unreserved — ``%41`` → ``A``) or uppercase the hex
    (``%3f`` → ``%3F``), and re-join.  The whole transform is JVM
    higher-order functions over one array — no shuffle, no Python —
    so it composes with ``canonicalize_url`` in the same Project.
    Multi-byte UTF-8 escapes are left encoded (only unreserved ASCII
    may decode, per the RFC)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.regexp_extract_all(
        c, F.lit("(%[0-9A-Fa-f]{2}|%|[^%]+)"), 1
    )

    def fix(t):
        is_esc = t.rlike("^%[0-9A-Fa-f]{2}$")
        code = F.conv(F.substring(t, 2, 2), 16, 10).cast("int")
        ch = F.char(code)
        return F.when(
            is_esc & ch.rlike(f"^{_UNRESERVED_RE}$"), ch
        ).when(is_esc, F.upper(t)).otherwise(t)

    return F.array_join(F.transform(toks, fix), "")


def absolutize(base_col, href_col, dot_iters: int = 3) -> F.Column:
    """RFC 3986 §5 reference resolution for crawl outlinks, expression-
    only: absolute hrefs pass through, ``//host/x`` inherits the base
    scheme, ``/x`` the base origin, ``?q`` replaces the base query, and
    relative paths join the base path's directory; dot segments
    (``./`` and ``x/../``) are removed with ``dot_iters`` bounded
    regexp passes (each pass removes one nesting level — 3 covers any
    sane link; raise it for adversarial depth).  Fragments are
    stripped first on both sides (a fetch key never includes them).
    Everything is JVM regexps/CASE — the outlink explode this feeds is
    the crawl frontier's row source, so the resolver must not cost a
    UDF."""
    b = F.col(base_col) if isinstance(base_col, str) else base_col
    h = F.col(href_col) if isinstance(href_col, str) else href_col
    b = F.regexp_replace(b, "#.*$", "")
    h = F.regexp_replace(h, "#.*$", "")
    scheme = F.regexp_extract(b, r"^([a-z][a-z0-9+.-]*):", 1)
    origin = F.regexp_extract(b, r"^([a-z][a-z0-9+.-]*://[^/?]+)", 1)
    base_path = F.regexp_extract(b, r"^[a-z][a-z0-9+.-]*://[^/?]+([^?]*)", 1)
    base_path = F.when(base_path == "", F.lit("/")).otherwise(base_path)
    base_noq = F.concat(origin, base_path)
    dirname = F.regexp_extract(base_path, r"^(.*/)", 1)
    dirname = F.when(dirname == "", F.lit("/")).otherwise(dirname)
    resolved = (
        F.when(h == "", b)
        .when(h.rlike(r"^[a-z][a-z0-9+.-]*://"), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        .when(h.startswith("?"), F.concat(base_noq, h))
        .otherwise(F.concat(origin, dirname, h))
    )
    for _ in range(dot_iters):
        resolved = F.regexp_replace(resolved, r"/\./", "/")
        resolved = F.regexp_replace(
            resolved, r"/[^/.?][^/?]*/\.\./", "/"
        )
    return resolved


def surt_key(col) -> F.Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the canonical
    url form web archives sort and range-scan by (Wayback/OpenWayback
    CDX convention; the reference keys captures by plain url, which
    cannot prefix-scan a domain).  Reversing the host labels puts every
    page of ``example.com`` — and every subdomain — into one
    lexicographic run, so a 100-TB CDX sorted by SURT answers
    "everything under this registrable domain" with a range scan
    instead of a full shuffle.

    Rules (the common canonicalized-SURT subset, all pure column exprs
    in one Project — composes with ``canonicalize_url``):

    - fragment stripped; scheme dropped entirely;
    - host lowercased, default ports (:80/:443) stripped, leading
      ``www.`` removed, labels reversed and comma-joined, ``)`` closes
      the host;
    - path lowercased (Wayback canonicalizer semantics; empty → ``/``);
    - tracking params dropped, the rest codepoint-sorted.
    """
    c = F.col(col) if isinstance(col, str) else col
    no_frag = F.regexp_replace(c, r"#.*$", "")
    after = F.regexp_replace(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(after, r"^([^/?]*)", 1))
    host = F.regexp_replace(hostport, r":(80|443)$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    pathq = F.lower(F.regexp_replace(after, r"^[^/?]*", ""))
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_replace(pathq, r"^[^?]*\??", "")
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    sorted_q = F.array_join(F.array_sort(kept), "&")
    return F.concat(
        rev_host,
        F.lit(")"),
        path,
        F.when(sorted_q == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), sorted_q)
        ),
    )
