"""Quality/token functions edge cases + the full oracle gate at sf0.001
(the same comparison the driver runs at sf0.01)."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def test_token_count_edges(spark):
    from hoover_snoop2_spark.functions.quality import token_count

    rows = [(0, ""), (1, "   "), (2, "one"), (3, " a  b\tc \n d "), (4, None)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["n"] for r in
           df.select("id", token_count(F.col("text")).alias("n")).collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: 4, 4: None}


def test_fingerprint_normalization(spark):
    from hoover_snoop2_spark.functions.quality import fingerprint

    rows = [(0, "Hello  World"), (1, "hello world"), (2, " HELLO\tWORLD ")]
    df = spark.createDataFrame(rows, "id long, text string")
    fps = [r["fp"] for r in df.select(fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] == fps[2]


def _normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                v = "nan" if math.isnan(v) else round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def test_all_oracles_match(spark):
    """Every oracle_sql() entry must agree with its queries() entry —
    row count, column names, order-insensitive values."""
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    qs, os_ = e.queries(), e.oracle_sql()
    for name, sql in os_.items():
        sdf = qs[name](spark, SF_DIR)
        srows = [r.asDict() for r in sdf.collect()]
        dtab = con.execute(sql).fetch_arrow_table()
        assert sorted(sdf.columns) == sorted(dtab.column_names), name
        a = _normalize(srows, sdf.columns)
        b = _normalize(dtab.to_pylist(), dtab.column_names)
        assert len(a) == len(b), (name, len(a), len(b))
        assert a == b, (name, next((x, y) for x, y in zip(a, b) if x != y))


def test_rows_only_queries_run(spark):
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    for name, fn in qs.items():
        if name in os_:
            continue
        assert fn(spark, SF_DIR).count() >= 0, name


def test_entry_runs(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_drop_common_paragraphs(spark):
    """Paragraphs shared by >= min_docs distinct docs are dropped from
    every doc; unique content survives in original order; docs reduced to
    nothing disappear (callers coalesce)."""
    from hoover_snoop2_spark.operators.dedup import drop_common_paragraphs

    boiler = "Subscribe to our newsletter"
    rows = [
        (1, f"unique one\n\n{boiler}\n\nalso unique"),
        (2, f"{boiler}\n\nsecond doc body"),
        (3, f"third doc body\n\n{boiler}"),
        (4, boiler),                       # all-boilerplate doc
        (5, "no boilerplate here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["id"]: r["clean_text"]
           for r in drop_common_paragraphs(df, "doc_id", "text",
                                           min_docs=3).collect()}
    assert got[1] == "unique one\n\nalso unique"
    assert got[2] == "second doc body"
    assert got[3] == "third doc body"
    assert 4 not in got                    # nothing survived
    assert got[5] == "no boilerplate here at all"


def test_drop_common_paragraphs_distinct_doc_count(spark):
    """The threshold counts DISTINCT documents — one doc repeating a
    paragraph 10 times does not make it corpus-boilerplate."""
    from hoover_snoop2_spark.operators.dedup import drop_common_paragraphs

    rows = [(1, "\n\n".join(["echo echo"] * 10)), (2, "other text")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["id"]: r["clean_text"]
           for r in drop_common_paragraphs(df, "doc_id", "text",
                                           min_docs=2).collect()}
    assert got[1] == "\n\n".join(["echo echo"] * 10)


def test_mask_pii(spark):
    from pyspark.sql import functions as F

    from hoover_snoop2_spark.functions.quality import mask_pii

    rows = [
        (1, "mail bob.smith+x@corp.example.org now"),
        (2, "server at 192.168.1.254 port 80"),
        (3, "card 4111111111111111 and ssn 123456789"),
        (4, "version 1.2.3 stays; short 12345 stays"),
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    got = {r["id"]: r["m"]
           for r in df.select("id", mask_pii(F.col("t")).alias("m")).collect()}
    assert got[1] == "mail <EMAIL> now"
    assert got[2] == "server at <IP> port 80"
    assert got[3] == "card <NUM> and ssn <NUM>"
    assert got[4] == "version 1.2.3 stays; short 12345 stays"


def test_canonicalize_url_edges(spark):
    from pyspark.sql import functions as F

    from hoover_snoop2_spark.functions.urls import canonicalize_url

    rows = [
        (1, "HTTP://WWW.Example.COM:80/A/B?z=1&a=2#frag"),
        (2, "https://host.example:443"),
        (3, "https://host.example/path?utm_source=x&utm_medium=y"),
        (4, "http://host.example:8080/x?b=2&a=1"),
        (5, "https://host.example/CaseSensitive/Path"),
    ]
    df = spark.createDataFrame(rows, "id int, url string")
    got = {r["id"]: r["c"] for r in
           df.select("id", canonicalize_url(F.col("url")).alias("c")).collect()}
    assert got[1] == "http://www.example.com/A/B?a=2&z=1"   # port+frag gone, sorted
    assert got[2] == "https://host.example/"                # empty path → /
    assert got[3] == "https://host.example/path"            # all-tracking query gone
    assert got[4] == "http://host.example:8080/x?a=1&b=2"   # non-default port kept
    assert got[5] == "https://host.example/CaseSensitive/Path"  # path case kept


def test_c4_line_clean_rules(spark):
    from hoover_snoop2_spark.functions.quality import c4_line_clean

    pages = [
        # kept: 5 good lines -> passes everything
        (0, ["one two three.", "a b c!", 'q w e?', 'x y z"', "m n o."]),
        # line filters: no punct / short / javascript dropped
        (1, ["one two three", "a b.", "uses javascript here.",
             "good line here.", "also a keeper.", "third good one.",
             "fourth good one.", "fifth good one."]),
        # page drops: badword, lorem ipsum, brace
        (2, ["badword1 is here.", "k l m.", "n o p.", "q r s.", "t u v."]),
        (3, ["lorem ipsum dolor sit.", "k l m.", "n o p.", "q r s.",
             "t u v."]),
        (4, ["code { block }.", "k l m.", "n o p.", "q r s.", "t u v."]),
        # too few survivors
        (5, ["only one good line.", "and two more words."]),
    ]
    df = spark.createDataFrame(pages, "id long, lines array<string>")
    cols = c4_line_clean(F.col("lines"))
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            *(cols[k].alias(k) for k in (
                "n_kept", "kept_text", "drop_badword", "drop_lorem",
                "drop_brace", "pass_overall",
            )),
        ).collect()
    }
    assert out[0]["pass_overall"] and out[0]["n_kept"] == 5
    # doc 1: 8 lines, 3 dropped by line rules -> 5 kept, passes
    assert out[1]["n_kept"] == 5 and out[1]["pass_overall"]
    assert "javascript" not in out[1]["kept_text"]
    assert "one two three\n" not in out[1]["kept_text"] + "\n"
    for i, flag in ((2, "drop_badword"), (3, "drop_lorem"), (4, "drop_brace")):
        assert out[i][flag] and not out[i]["pass_overall"]
        others = {"drop_badword", "drop_lorem", "drop_brace"} - {flag}
        assert not any(out[i][o] for o in others)
    assert out[5]["n_kept"] == 2 and not out[5]["pass_overall"]


def test_fineweb_gates_each_discriminate(spark):
    """q226: all three FineWeb line-structure gates must actually fire
    on the synthetic pages (a gate that never rejects is untested)."""
    from hoover_snoop2_spark.queries import QUERIES

    df = QUERIES["q226_fineweb_filters"](spark, SF_DIR)
    agg = df.agg(
        F.sum((~F.col("keep_punct")).cast("int")).alias("p"),
        F.sum((~F.col("keep_dupline")).cast("int")).alias("d"),
        F.sum((~F.col("keep_short")).cast("int")).alias("s"),
        F.sum(F.col("pass_fineweb").cast("int")).alias("kept"),
    ).first()
    assert agg.p > 0 and agg.d > 0 and agg.s > 0
    assert 0 < agg.kept < df.count()
