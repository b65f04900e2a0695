"""Content-addressed hashing of blob bytes — the standalone column API.

The reference hashes every blob with md5+sha1+sha256+sha3_256 in a single
streaming pass and uses ``sha3_256`` as the primary key / dedup key
(reference: snoop/data/models.py:55-113).  Spark has builtin ``md5`` and
``sha2`` for BinaryType; sha1/sha3_256 need a pandas UDF (hashlib releases
the GIL, so Arrow batches hash at native speed).

NOTE: the extraction pipeline itself no longer uses these UDFs on its hot
path — it dedups on the JVM-side ``F.sha2`` key and computes all four
reported hashes inside the analyze kernel, where the bytes already crossed
the Arrow boundary (plans/pipeline.py).  This module remains the
column-level API for callers hashing an arbitrary binary DataFrame.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def sha3_256_bytes(data: bytes) -> str:
    return hashlib.sha3_256(data or b"").hexdigest()


def sha1_bytes(data: bytes) -> str:
    return hashlib.sha1(data or b"").hexdigest()


@F.pandas_udf(StringType())
def sha3_256_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda b: hashlib.sha3_256(b or b"").hexdigest())


@F.pandas_udf(StringType())
def sha1_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda b: hashlib.sha1(b or b"").hexdigest())


def with_content_hashes(col: str = "html") -> dict[str, Column]:
    """Column map reproducing the reference's four-hash blob identity
    (models.py:66-71).  md5/sha256 stay JVM-side (codegen'd builtins)."""
    c = F.col(col)
    return {
        "sha3_256": sha3_256_udf(c),
        "sha256": F.sha2(c, 256),
        "sha1": sha1_udf(c),
        "md5": F.md5(c),
        "size": F.coalesce(F.length(c), F.lit(0)).cast("long"),
    }


def blob_repo_path(sha: str) -> str:
    """Sharded blob path convention ``sha[:2]/sha[2:4]/sha[4:]``
    (models.py:32-38) — reused as a partition-path convention."""
    return f"{sha[:2]}/{sha[2:4]}/{sha[4:]}"
