"""Round-4 web-metadata / text-repair / thread operators:

- ``head_metadata`` — title/OpenGraph/publish-date from <head>,
- ``jsonld_fields`` — schema.org JSON-LD article metadata,
- mojibake gate + repair (``mojibake_score`` / ``repair_mojibake``),
- ``resolve_roots`` — pointer-doubling parent-chain flattening,
- ``dsir_log_weights`` — DSIR hashed-unigram importance weights,
- the q94 Spark-4.1 regression: a pandas UDF over a NESTED-lambda
  argument must still execute after other pandas-UDF queries ran in
  the session (ExtractPythonUDFs bug; see q94's planning barrier).
"""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from hoover_snoop2_spark.functions.textutils import (
    MOJIBAKE_RE,
    mojibake_score,
    repair_mojibake,
)
from hoover_snoop2_spark.operators.graph import resolve_roots
from hoover_snoop2_spark.operators.html_extract import (
    head_metadata,
    html_to_text_udf,
    jsonld_fields,
)
from hoover_snoop2_spark.operators.sampling import dsir_log_weights


def test_head_metadata_precedence_and_url_fallback(spark):
    rows = [
        Row(
            url="https://x.example/2021/07/09/post",
            html=(
                "<head><title>Plain</title>"
                '<meta property="og:title" content="OG wins">'
                "</head>"
            ),
        ),
        Row(url="https://x.example/about", html="<head><title>T2</title></head>"),
        Row(
            url="https://x.example/2020/01/02/a",
            html=(
                "<head><title>T3</title>"
                '<meta property="article:published_time" '
                'content="2019-12-31T00:00:00Z"></head>'
            ),
        ),
    ]
    df = spark.createDataFrame(rows)
    m = head_metadata("html", url_col="url")
    got = df.select(
        m["display_title"].alias("dt"), m["published"].alias("pub")
    ).collect()
    assert got[0].dt == "OG wins"
    assert got[0].pub == "2021-07-09"  # url permalink fallback
    assert got[1].dt == "T2" and got[1].pub is None
    assert got[2].pub == "2019-12-31T00:00:00Z"  # meta beats url


def test_jsonld_author_object_and_array(spark):
    obj = (
        '<script type="application/ld+json">{"@type":"Article",'
        '"headline":"H1","author":{"name":"Solo"},'
        '"publisher":{"name":"P"}}</script>'
    )
    arr = (
        '<script type="application/ld+json">{"@type":"NewsArticle",'
        '"headline":"H2","datePublished":"2022-03-04",'
        '"author":[{"name":"First"},{"name":"Other"}]}</script>'
    )
    df = spark.createDataFrame(
        [Row(html=f"<html><head>{obj}</head></html>"),
         Row(html=f"<html><head>{arr}</head></html>"),
         Row(html="<html><head></head></html>")]
    )
    m = jsonld_fields("html")
    got = df.select(
        m["ld_type"].alias("t"),
        m["author_name"].alias("a"),
        m["date_published"].alias("d"),
    ).collect()
    assert (got[0].t, got[0].a, got[0].d) == ("Article", "Solo", None)
    assert (got[1].t, got[1].a, got[1].d) == (
        "NewsArticle", "First", "2022-03-04"
    )
    assert (got[2].t, got[2].a, got[2].d) == (None, None, None)


def _moji(s: str) -> str:
    return s.encode("utf-8").decode("iso-8859-1")


def test_mojibake_gate_and_repair(spark):
    import re

    # gate: fires on misdecoded sequences, silent on real accents
    assert re.search(MOJIBAKE_RE, _moji("café"))
    assert re.search(MOJIBAKE_RE, _moji("it’s"))
    assert not re.search(MOJIBAKE_RE, "café crème naïve")

    rows = [
        Row(t="plain"),
        Row(t="café crème"),
        Row(t=_moji("café crème")),
        Row(t=_moji("it’s “q”")),
        # gate fires (Â½) but a bare latin-1 é makes the round trip
        # invalid UTF-8 — must stay byte-identical
        Row(t=_moji("½") + " é mix"),
        Row(t=None),
    ]
    df = spark.createDataFrame(rows)
    got = df.select(
        mojibake_score("t").alias("s"), repair_mojibake("t").alias("f")
    ).collect()
    assert [r.s for r in got[:5]] == [0, 0, 2, 3, 1]
    assert got[1].f == "café crème"     # untouched
    assert got[2].f == "café crème"     # repaired
    assert got[3].f == "it’s “q”"       # 3-byte sequences repaired
    assert got[4].f == _moji("½") + " é mix"  # conservative: unchanged
    assert got[5].f is None and got[5].s is None


def test_resolve_roots_chains_and_dangling(spark):
    # forest: 10<-11<-12<-13, root 20 alone, 30<-31, and 40's parent 99
    # is absent from the frame (dangling: resolves to 99)
    rows = [
        Row(id=10, parent=None), Row(id=11, parent=10),
        Row(id=12, parent=11), Row(id=13, parent=12),
        Row(id=20, parent=None),
        Row(id=30, parent=None), Row(id=31, parent=30),
        Row(id=40, parent=99), Row(id=41, parent=40),
    ]
    got = {
        r.id: (r.root, r.depth)
        for r in resolve_roots(
            spark.createDataFrame(rows), "id", "parent", rounds=3
        ).collect()
    }
    assert got[10] == (10, 0)
    assert got[13] == (10, 3)
    assert got[20] == (20, 0)
    assert got[31] == (30, 1)
    assert got[40] == (99, 1)   # nearest known ancestor is the dangle
    assert got[41] == (99, 2)


def test_dsir_weights_prefer_target_like_text(spark):
    # target rows speak "alpha beta", raw-only rows speak "gamma delta";
    # a held-out alpha-beta doc must outscore a gamma-delta doc
    rows = [Row(doc_id=i, text="alpha beta alpha", is_target=True)
            for i in range(5)]
    rows += [Row(doc_id=10 + i, text="gamma delta gamma", is_target=False)
             for i in range(5)]
    rows += [Row(doc_id=100, text="alpha beta", is_target=False),
             Row(doc_id=101, text="gamma delta", is_target=False)]
    out = {
        r.doc_id: r.log_weight
        for r in dsir_log_weights(
            spark.createDataFrame(rows), id_col="doc_id",
            text_col="text", target_col="is_target", n_buckets=64
        ).collect()
    }
    assert out[100] > out[101]
    assert all(math.isfinite(v) for v in out.values())


def test_pandas_udf_nested_lambda_arg_after_other_udf(spark):
    """Spark 4.1 regression pinned: ExtractPythonUDFs loses a pandas
    UDF whose argument embeds nested NamedLambdaVariables on every
    planning after the session's first pandas-UDF query — the session
    fixture here has already run other UDF tests, so this exercises
    the poisoned state.  The planning barrier (materializing the
    lambda synthesis behind an Exchange) must keep it executable."""
    df = spark.range(20)
    doc = F.col("id")
    nested = F.concat(
        F.lit("<html><body>"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), (doc % 3 + 2).cast("int")),
                lambda i: F.concat(
                    F.lit("<p>"),
                    F.array_join(
                        F.transform(
                            F.sequence(F.lit(1), (doc % 2 + 2).cast("int")),
                            lambda j: F.concat(
                                F.lit("w"), i.cast("string"),
                                F.lit("x"), j.cast("string"),
                            ),
                        ),
                        " ",
                    ),
                    F.lit("</p>"),
                ),
            ),
            "",
        ),
        F.lit("</body></html>"),
    )
    # other pandas-UDF work first (poison the session state)
    spark.range(3).select(
        html_to_text_udf(F.encode(F.lit("<p>x y</p>"), "UTF-8"))
    ).collect()
    barrier = (
        df.select("id", nested.alias("h"))
        .repartition(4)
        .select("id", html_to_text_udf(F.encode(F.col("h"), "UTF-8")).alias("t"))
    )
    got = {r.id: r.t for r in barrier.collect()}
    assert len(got) == 20 and all(t.startswith("w1x1") for t in got.values())


def test_hreflang_alternates_alignment_and_default(spark):
    from hoover_snoop2_spark.operators.html_extract import (
        hreflang_alternates,
    )

    rows = [
        Row(html=(
            '<link rel="alternate" hreflang="en" href="https://x/en">'
            '<link rel="alternate" hreflang="de" href="https://x/de">'
            '<link rel="alternate" hreflang="x-default" href="https://x/">'
        )),
        Row(html="<html>no alternates</html>"),
    ]
    df = spark.createDataFrame(rows)
    m = hreflang_alternates("html")
    got = df.select(
        m["langs"].alias("l"), m["hrefs"].alias("h"),
        m["x_default"].alias("d"),
    ).collect()
    assert got[0].l == ["en", "de", "x-default"]
    assert got[0].h == ["https://x/en", "https://x/de", "https://x/"]
    assert got[0].d == "https://x/"
    assert got[1].l == [] and got[1].d is None


def test_soft404_verdict_rungs(spark):
    from hoover_snoop2_spark.operators.html_extract import soft404_verdict

    rows = [
        Row(title="My Article", body="Interesting prose."),
        Row(title="404 Not Found", body="x"),
        Row(title="Oops", body="This page does not exist."),
        Row(title="403 Forbidden", body="x"),
        Row(title="Welcome", body="Subscribers only."),
        Row(title="T", body="   "),
        Row(title=None, body=None),
    ]
    got = [
        r.v
        for r in spark.createDataFrame(rows)
        .select(soft404_verdict("title", "body").alias("v"))
        .collect()
    ]
    assert got == ["ok", "not_found", "not_found", "forbidden",
                   "login_wall", "empty", "empty"]


def test_registrable_domain_psl_rules(spark):
    from hoover_snoop2_spark.functions.urls import registrable_domain

    rows = [
        Row(h="news.bbc.co.uk"), Row(h="WWW.Example.COM"),
        Row(h="a.github.io"), Row(h="b.github.io"),
        Row(h="deep.sub.example.org.uk"), Row(h="weird.multi.part.tldx"),
        Row(h="com"),
    ]
    got = [
        r.d for r in spark.createDataFrame(rows)
        .select(registrable_domain("h").alias("d")).collect()
    ]
    assert got == [
        "bbc.co.uk", "example.com",
        "a.github.io", "b.github.io",      # private registry: NOT merged
        "example.org.uk", "part.tldx",     # unknown TLD: last two labels
        "com",                             # bare suffix: unchanged
    ]


def test_ascii_fold_accents_and_passthrough(spark):
    from hoover_snoop2_spark.functions.urls import ascii_fold

    rows = [Row(t="Crème BRÛLÉE"), Row(t="Łódź œuvre ß Ørsted þing"),
            Row(t="東京 unchanged"), Row(t="already plain 123")]
    got = [
        r.f for r in spark.createDataFrame(rows)
        .select(ascii_fold("t").alias("f")).collect()
    ]
    assert got == ["creme brulee", "lodz oeuvre ss orsted thing",
                   "東京 unchanged", "already plain 123"]


def test_iban_mod97_public_examples(spark):
    from hoover_snoop2_spark.operators.entities import iban_mod97_valid

    rows = [
        Row(i="DE89370400440532013000", v=True),
        Row(i="GB82WEST12345698765432", v=True),
        Row(i="FR1420041010050500013M02606", v=True),
        Row(i="NL91ABNA0417164300", v=True),
        Row(i="DE89370400440532013001", v=False),   # last digit off
        Row(i="GB82WEST12345698765431", v=False),
        Row(i="", v=None), Row(i=None, v=None),
    ]
    got = (
        spark.createDataFrame([Row(i=r.i) for r in rows])
        .select("i", iban_mod97_valid("i").alias("valid")).collect()
    )
    for expect, g in zip(rows, got):
        assert g.valid == expect.v, (g.i, g.valid, expect.v)


def test_idn_decode_and_percent_normalize(spark):
    from hoover_snoop2_spark.functions.urls import (
        idn_decode_host_py,
        idn_decode_host_udf,
        percent_normalize,
    )

    assert idn_decode_host_py("www.xn--bcher-kva.example") == \
        "www.bücher.example"
    assert idn_decode_host_py("xn--wgbh1c.example") == "مصر.example"
    assert idn_decode_host_py("xn--!!bad!!.com") == "xn--!!bad!!.com"

    rows = [
        Row(h="XN--MNCHEN-3YA.de", u="https://x/%41%2f%7e"),
        Row(h="plain.com", u="/100%25%x%"),
    ]
    got = (
        spark.createDataFrame(rows)
        .select(
            idn_decode_host_udf("h").alias("d"),
            percent_normalize("u").alias("n"),
        )
        .collect()
    )
    assert got[0].d == "münchen.de"
    assert got[0].n == "https://x/A%2F~"
    assert got[1].d == "plain.com"
    assert got[1].n == "/100%25%x%"


def test_absolutize_reference_resolution(spark):
    from hoover_snoop2_spark.functions.urls import absolutize

    base = "https://h.example/a/b/page.html"
    rows = [
        Row(b=base, h="http://other/x"),
        Row(b=base, h="//cdn.example/y"),
        Row(b=base, h="/root/z"),
        Row(b=base, h="sib.html"),
        Row(b=base, h="../up/w"),
        Row(b=base, h="./same/v"),
        Row(b=base, h="?q=1"),
        Row(b=base, h="#frag-only"),
        Row(b="https://h.example", h="rel"),   # origin-only base
    ]
    got = [
        r.r for r in spark.createDataFrame(rows)
        .select(absolutize("b", "h").alias("r")).collect()
    ]
    assert got == [
        "http://other/x",
        "https://cdn.example/y",
        "https://h.example/root/z",
        "https://h.example/a/b/sib.html",
        "https://h.example/a/up/w",
        "https://h.example/a/b/same/v",
        "https://h.example/a/b/page.html?q=1",
        "https://h.example/a/b/page.html",
        "https://h.example/rel",
    ]


def test_crawl_directives_tokens_and_refresh(spark):
    from hoover_snoop2_spark.operators.html_extract import crawl_directives

    rows = [
        Row(html='<meta name="robots" content="index, nofollowup">'),
        Row(html='<meta name="robots" content="NOINDEX, NOFOLLOW">'),
        Row(html='<meta http-equiv="refresh" content="0; url=https://t/x">'),
    ]
    m = crawl_directives("html")
    got = spark.createDataFrame(rows).select(
        m["noindex"].alias("ni"), m["nofollow"].alias("nf"),
        m["refresh_seconds"].alias("rs"), m["refresh_url"].alias("ru"),
    ).collect()
    assert (got[0].ni, got[0].nf) == (False, False)  # substring must not fire
    assert (got[1].ni, got[1].nf) == (True, True)    # case-insensitive
    assert (got[2].rs, got[2].ru) == (0, "https://t/x")


def test_decode_entities_numeric_named_hostile(spark):
    from hoover_snoop2_spark.operators.html_extract import decode_entities

    rows = [
        Row(t="caf&#233; &amp; cr&egrave;me"),
        Row(t="it&#x2019;s &#x1F600; wide"),      # astral plane too
        Row(t="keep &bogus; and &#1114112; and bare & alone"),
    ]
    got = [
        r.d for r in spark.createDataFrame(rows)
        .select(decode_entities("t").alias("d")).collect()
    ]
    assert got[0] == "café & crème"
    assert got[1] == "it’s 😀 wide"
    assert got[2] == "keep &bogus; and &#1114112; and bare & alone"


def test_html_to_markdown_subset(spark):
    from hoover_snoop2_spark.operators.html_extract import html_to_markdown

    rows = [
        Row(html=(
            "<html><body><h1>T</h1><p>Hi <strong>x</strong> and "
            '<a href="https://a/b">lnk</a>.</p>'
            "<ul><li>one</li><li><em>two</em></li></ul>"
            "<table><tr><td>dropped-tag content kept</td></tr></table>"
            "</body></html>"
        )),
    ]
    got = spark.createDataFrame(rows).select(
        html_to_markdown("html").alias("md")
    ).collect()[0].md
    assert got == (
        "# T\n\nHi **x** and [lnk](https://a/b).\n\n"
        "- one\n- *two*\ndropped-tag content kept"
    )
