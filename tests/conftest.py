"""Shared fixtures: one SparkSession for the whole test run (the reference
testsuite similarly reuses one Django DB setup, testsuite/conftest.py)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from hoover_snoop2_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """300-doc deterministic synthetic corpus + golden digests."""
    from hoover_snoop2_spark.corpus import generate_pages

    d = tmp_path_factory.mktemp("corpus")
    generate_pages(300, str(d))
    return str(d)


@pytest.fixture(scope="session")
def digests(spark, corpus_dir, tmp_path_factory):
    """Pipeline output over the session corpus (computed once)."""
    from hoover_snoop2_spark.plans.pipeline import run_extraction

    ckpt = tmp_path_factory.mktemp("ckpt")
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    out, metrics = run_extraction(spark, pages, checkpoint_dir=str(ckpt))
    return out
