"""Filesystem directory ingest (reference filesystem.walk parity):
mixed-type tree → pages rows → full extraction, including the
same-directory `.partial.emlx` sibling contract."""

import pytest

from hoover_snoop2_spark.sources.filesystem import read_directory, read_files


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("collection")
    (root / "docs").mkdir()
    (root / "docs" / "page.html").write_bytes(
        b"<html><body><article><p>Filesystem walk article text, long "
        b"enough to be the dominant block on this little page.</p>"
        b"</article></body></html>")
    (root / "docs" / "note.txt").write_bytes(
        b"Plain note body from the directory tree.")

    from hoover_snoop2_spark.operators.xls_crypto import encrypt_xls
    from hoover_snoop2_spark.operators.xls_extract import build_xls

    (root / "docs" / "sheet.xls").write_bytes(
        encrypt_xls(build_xls(["k", "v"], [["a", "1"]]), "VelvetSweatshop"))

    # Apple Mail layout: zeroed part + sibling payload in one directory
    mail = root / "Mail" / "INBOX.mbox"
    mail.mkdir(parents=True)
    body = (b"Subject: partial\r\nMIME-Version: 1.0\r\n"
            b"Content-Type: multipart/mixed; boundary=B\r\n\r\n"
            b"--B\r\nContent-Type: text/plain\r\n\r\nkept part\r\n"
            b"--B\r\nContent-Type: text/plain\r\n"
            b"X-Apple-Content-Length: 9\r\n\r\n\r\n--B--\r\n")
    (mail / "7.partial.emlx").write_bytes(
        str(len(body)).encode() + b"\n" + body + b"<plist/>")
    (mail / "7.2.emlxpart").write_bytes(b"big piece")
    return str(root)


def test_read_files_walks_recursively(spark, tree):
    files = read_files(spark, tree)
    names = {p.split("/")[-1] for p in
             [r.path for r in files.select("path").collect()]}
    assert {"page.html", "note.txt", "sheet.xls",
            "7.partial.emlx", "7.2.emlxpart"} <= names


def test_pages_shape_and_glob(spark, tree):
    pages = read_directory(spark, tree)
    assert pages.columns == ["url", "warc_ts", "html"]
    only_html = read_directory(spark, tree, path_glob="*.html")
    assert only_html.count() == 1


def test_emlxpart_joins_parent_and_drops_fragment(spark, tree):
    pages = read_directory(spark, tree)
    urls = [r.url for r in pages.select("url").collect()]
    assert not any(u.endswith(".emlxpart") for u in urls)
    row = pages.filter("url like '%partial.emlx'").collect()[0]
    assert b"big piece" in bytes(row.html)  # payload re-attached


def test_full_extraction_over_directory(spark, tree):
    from pyspark.sql import functions as F

    from hoover_snoop2_spark.plans.pipeline import run_extraction

    digests, _ = run_extraction(spark, read_directory(spark, tree),
                                checkpoint_dir=None)
    d = {r["url"].split("/")[-1]: r for r in digests.collect()
         if "//" not in r["url"].replace("file://", "", 1)}
    assert "Filesystem walk article text" in d["page.html"]["text"]
    assert d["note.txt"]["text"].startswith("Plain note body")
    assert d["sheet.xls"]["table_row_count"] == 2  # decrypted BIFF8
    assert "kept part" in d["7.partial.emlx"]["text"]
    assert "big piece" in d["7.partial.emlx"]["text"]
    # child rows (the xls row explode) use the parent//name convention
    kids = digests.filter(F.col("url").contains("sheet.xls//"))
    assert kids.count() == 1


def test_streaming_directory_watch(spark, tmp_path):
    """source_format='files': drop files into a raw directory, stream
    them through the incremental pipeline (the beat-driven re-walk
    analog), then drop MORE files and re-trigger — only the delta
    extracts, urls never duplicate."""
    from pyspark.sql import functions as F

    from hoover_snoop2_spark.streaming.extract_stream import (
        start_extract_stream,
    )

    src = tmp_path / "watch"
    src.mkdir()
    (src / "one.txt").write_bytes(b"Watched file one body.")
    (src / "two.html").write_bytes(
        b"<html><body><article><p>Watched article two, with enough body "
        b"text to dominate block scoring.</p></article></body></html>")

    out = str(tmp_path / "digests_out")
    ckpt = str(tmp_path / "stream_ckpt")
    q = start_extract_stream(spark, str(src), out, source_format="files",
                             checkpoint_location=ckpt)
    q.awaitTermination()
    first = spark.read.parquet(out)
    assert first.count() == 2

    # second drop + RESTART from the stream checkpoint → only the new
    # file is read, landing in a later epoch partition
    (src / "three.txt").write_bytes(b"Late arrival three.")
    q = start_extract_stream(spark, str(src), out, source_format="files",
                             checkpoint_location=ckpt)
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert got.groupBy("url").count().filter(F.col("count") > 1).count() == 0
    texts = {r.url.split("/")[-1]: r.text for r in got.collect()}
    assert texts["three.txt"].startswith("Late arrival")
    assert "Watched article two" in texts["two.html"]
