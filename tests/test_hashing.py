"""Standalone four-hash column API (models.py:66-71 analog)."""

import hashlib


def test_with_content_hashes(spark):
    from hoover_snoop2_spark.functions.hashing import with_content_hashes

    payloads = [b"alpha", b"", None]
    df = spark.createDataFrame([(p,) for p in payloads], "html binary")
    row = df.withColumns(with_content_hashes("html")).collect()[0]
    assert row["sha3_256"] == hashlib.sha3_256(b"alpha").hexdigest()
    assert row["sha256"] == hashlib.sha256(b"alpha").hexdigest()
    assert row["sha1"] == hashlib.sha1(b"alpha").hexdigest()
    assert row["md5"] == hashlib.md5(b"alpha").hexdigest()
    assert row["size"] == 5


def test_blob_repo_path():
    from hoover_snoop2_spark.functions.hashing import blob_repo_path

    sha = "ab" + "cd" + "e" * 60
    assert blob_repo_path(sha) == f"ab/cd/{'e' * 60}"
