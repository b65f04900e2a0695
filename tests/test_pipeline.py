"""End-to-end pipeline: byte-identical golden parity over the synthetic
corpus — the analog of the reference's full-dispatcher integration test
(test_integration.py:46-151) at tractable scale."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hoover_snoop2_spark.corpus import PAGES_PA_SCHEMA


def test_no_missing_urls(spark, corpus_dir, digests):
    golden = spark.read.parquet(f"{corpus_dir}/expected_digests.parquet")
    j = golden.join(digests.select("url", "status"), "url", "left")
    assert j.filter(F.col("status").isNull()).count() == 0


def test_byte_identical_text(spark, corpus_dir, digests):
    golden = spark.read.parquet(f"{corpus_dir}/expected_digests.parquet")
    j = golden.alias("g").join(digests.alias("d"), "url")
    bad = j.filter(
        F.coalesce(F.col("d.text"), F.lit("")) != F.coalesce(F.col("g.text"), F.lit(""))
    )
    assert bad.count() == 0, bad.select("url").take(5)


def test_dedup_ran_once_per_blob(spark, corpus_dir, digests):
    # duplicate payloads must agree on sha3 and text
    dup = (
        digests.groupBy("sha3_256")
        .agg(F.countDistinct("text").alias("n_texts"), F.count("*").alias("n_urls"))
    )
    assert dup.filter(F.col("n_texts") > 1).count() == 0
    # the corpus injects duplicates → at least one sha with >1 url
    assert dup.filter(F.col("n_urls") > 1).count() > 0


def test_statuses_and_containers(digests):
    by_status = {r["status"]: r["count"] for r in digests.groupBy("status").count().collect()}
    assert by_status.get("skipped", 0) > 0  # binary-skip category
    assert by_status["success"] > 0
    assert digests.filter(F.col("is_container")).count() > 0
    assert digests.filter(F.col("depth") > 0).count() > 0  # children exist


def test_email_fields(digests):
    emails = digests.filter(F.col("mime_type") == "message/rfc822")
    assert emails.count() > 0
    bad = emails.filter(
        F.col("subject").isNull() | F.col("email_date").isNull()
        | (F.size("email_from") == 0)
    )
    assert bad.count() == 0


def test_word_count_is_text_length(digests):
    # the reference's quirky definition (digests.py:887-893)
    bad = digests.filter(F.col("word_count") != F.coalesce(F.length("text"), F.lit(0)))
    assert bad.count() == 0


def test_depth_cap_stops_runaway(spark, tmp_path):
    """Deep nesting: zip^8 must stop at max_depth without hanging."""
    import io
    import zipfile
    from datetime import datetime, timezone

    from hoover_snoop2_spark.plans.pipeline import run_extraction

    data = b"innermost"
    for i in range(8):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr(f"level{i}", data)
        data = buf.getvalue()
    t = pa.Table.from_pydict(
        {
            "url": ["https://x.example/deep.zip"],
            "warc_ts": [datetime(2024, 1, 1, tzinfo=timezone.utc)],
            "html": [data],
            "text": [""],
            "lang": ["en"],
        },
        schema=PAGES_PA_SCHEMA,
    )
    pq.write_table(t, str(tmp_path / "deep.parquet"))
    out, _ = run_extraction(
        spark,
        spark.read.parquet(str(tmp_path / "deep.parquet")),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_depth=3,
    )
    depths = [r["depth"] for r in out.select("depth").collect()]
    assert max(depths) == 3
    assert len(depths) == 4  # root + 3 unpacked levels


def test_incremental_resume(spark, corpus_dir, digests, tmp_path):
    """Second run over the same pages with previous digests → no rework,
    same row count (is_completed memoization analog, tasks.py:356-364)."""
    from hoover_snoop2_spark.plans.pipeline import run_extraction

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    prev = digests
    out, _ = run_extraction(
        spark, pages, checkpoint_dir=str(tmp_path / "ck2"), previous_digests=prev
    )
    assert out.count() == prev.count()


def test_office_docprops_dates(spark, corpus_dir, digests):
    """date-created/date-modified from docProps/core.xml (OOXML) and
    meta.xml (ODF) match the golden values for every office doc
    (reference get_date_created/modified, tika.py:148-176)."""
    golden = spark.read.parquet(f"{corpus_dir}/expected_digests.parquet")
    # the encrypted legacy .xls slice of the xlsx band has no docProps —
    # its golden dates are null by construction
    g = golden.filter(
        F.col("category").isin("docx", "odt", "pptx", "xlsx")
        & F.col("date_created").isNotNull()
    )
    assert g.count() > 0
    j = g.alias("g").join(digests.alias("d"), "url")
    bad = j.filter(
        (F.col("d.date_created") != F.col("g.date_created"))
        | (F.col("d.date_modified") != F.col("g.date_modified"))
        | F.col("d.date_created").isNull()
        | F.col("d.date_modified").isNull()
    )
    assert bad.count() == 0, bad.select("url", "d.date_created",
                                        "g.date_created").take(5)


def test_analyze_udf_row_counters(spark, corpus_dir, tmp_path):
    """Accumulator-backed per-partition counters (metrics stage
    'analyze_udf') count every row the kernel emitted, without an extra
    action (reference task-matrix counters, admin.py:149-276)."""
    from hoover_snoop2_spark.plans.pipeline import run_extraction

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    digests, metrics = run_extraction(
        spark, pages, checkpoint_dir=str(tmp_path / "ck_acc")
    )
    n_digests = digests.count()
    udf_rows = (
        metrics.filter(F.col("stage") == "analyze_udf")
        .agg(F.sum("rows").alias("n")).first()["n"]
    )
    # the kernel emits every unique-blob digest subtree (+ any deferred
    # child rows); url-level clones are relational fan-out AFTER the UDF,
    # so emitted rows never exceed the url-level digest count
    assert 0 < udf_rows <= n_digests
    rounds = {r["round"] for r in
              metrics.filter(F.col("stage") == "analyze_udf").collect()}
    assert 0 in rounds  # at minimum the root round is counted
