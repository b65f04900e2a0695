"""Fan-out edge paths: deferred (round-based) children when a listing
exceeds the in-kernel budget, and whole-subtree cloning for duplicate
container urls."""

import io
import zipfile
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hoover_snoop2_spark.corpus import PAGES_PA_SCHEMA


def _zip(members):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, data in members:
            z.writestr(name, data)
    return buf.getvalue()


def _pages(tmp_path, rows):
    t = pa.Table.from_pydict(
        {
            "url": [r[0] for r in rows],
            "warc_ts": [datetime(2024, 1, 1, tzinfo=timezone.utc)] * len(rows),
            "html": [r[1] for r in rows],
            "text": [""] * len(rows),
            "lang": ["en"] * len(rows),
        },
        schema=PAGES_PA_SCHEMA,
    )
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    return p


def test_duplicate_container_subtree_cloned(spark, tmp_path):
    """Two urls with identical zip bytes: the dup url must get the whole
    subtree (children included) under its own prefix."""
    from hoover_snoop2_spark.plans.pipeline import run_extraction

    z = _zip([("inner/a.txt", b"alpha content here"), ("b.txt", b"beta stuff")])
    p = _pages(tmp_path, [
        ("https://x.example/one.zip", z),
        ("https://x.example/two.zip", z),
    ])
    out, _ = run_extraction(spark, spark.read.parquet(p))
    rows = {r["url"]: r for r in out.collect()}
    assert set(rows) == {
        "https://x.example/one.zip",
        "https://x.example/one.zip//inner/a.txt",
        "https://x.example/one.zip//b.txt",
        "https://x.example/two.zip",
        "https://x.example/two.zip//inner/a.txt",
        "https://x.example/two.zip//b.txt",
    }
    assert rows["https://x.example/two.zip//b.txt"]["text"] == "beta stuff"
    assert (
        rows["https://x.example/two.zip//inner/a.txt"]["parent_url"]
        == "https://x.example/two.zip"
    )
    # clones share blob identity with the original subtree
    assert (
        rows["https://x.example/one.zip//b.txt"]["sha3_256"]
        == rows["https://x.example/two.zip//b.txt"]["sha3_256"]
    )


def test_deferred_children_round(spark, tmp_path):
    """A listing over the inline budget defers to a driver round and still
    produces identical digests."""
    from hoover_snoop2_spark.plans.pipeline import run_extraction

    z = _zip([(f"f{i}.txt", f"content number {i}".encode()) for i in range(5)])
    p = _pages(tmp_path, [("https://x.example/big.zip", z)])
    out, _ = run_extraction(spark, spark.read.parquet(p), inline_max_children=2)
    rows = {r["url"]: r["text"] for r in out.collect()}
    assert len(rows) == 6
    for i in range(5):
        assert rows[f"https://x.example/big.zip//f{i}.txt"] == f"content number {i}"


def test_deferred_children_of_duplicate_parent(spark, tmp_path):
    """Deferred children must also fan out under duplicate parents."""
    from hoover_snoop2_spark.plans.pipeline import run_extraction

    z = _zip([("p.txt", b"pp"), ("q.txt", b"qq")])
    p = _pages(tmp_path, [
        ("https://x.example/d1.zip", z),
        ("https://x.example/d2.zip", z),
    ])
    out, _ = run_extraction(spark, spark.read.parquet(p), inline_max_children=1)
    urls = {r["url"] for r in out.collect()}
    assert "https://x.example/d2.zip//p.txt" in urls
    assert "https://x.example/d2.zip//q.txt" in urls
    assert len(urls) == 6
