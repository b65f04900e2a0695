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

from pyspark.sql import functions as F

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
