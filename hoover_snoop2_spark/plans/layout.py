"""Z-order (Morton) clustering for multi-dimensional data skipping.

Parquet/Iceberg scans prune files by min/max column statistics.  A layout
sorted by ONE column localizes only that column: every file's extent on
any OTHER column spans the whole domain, so a predicate on it prunes
nothing.  Interleaving the bits of two (or more) columns into one Morton
z-value and range-partitioning on it localizes ALL interleaved columns at
once — every file covers a small rectangle of the (x, y) space, and a box
predicate on either axis skips most files.  This is the `ALTER TABLE ...
WRITE ORDERED BY zorder(...)` layout Iceberg/Delta apply to exactly the
corpus shape the north rule names (url-hash x size-class over 10^12
pages); here it is built from first principles so the pruning claim is a
CERTIFIED query result (q196) instead of a config flag.

All math is integer bit-twiddling (the classic parallel-prefix bit
spread), identical in Spark and DuckDB, so the layout audit is
oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _spread8(v: Column) -> Column:
    """Spread an 8-bit value's bits into the even positions of 16 bits
    (0bABCDEFGH -> 0b0A0B0C0D0E0F0G0H) via the magic-mask ladder."""
    v = v.bitwiseAND(F.lit(255))
    v = (v.bitwiseOR(F.shiftleft(v, 4))).bitwiseAND(F.lit(0x0F0F))
    v = (v.bitwiseOR(F.shiftleft(v, 2))).bitwiseAND(F.lit(0x3333))
    v = (v.bitwiseOR(F.shiftleft(v, 1))).bitwiseAND(F.lit(0x5555))
    return v


def zvalue8(x: Column, y: Column) -> Column:
    """16-bit Morton code of two 8-bit coordinates: x's bits land in the
    odd positions, y's in the even — lexicographic order on the result
    is z-order on (x, y)."""
    return F.shiftleft(_spread8(x), 1).bitwiseOR(_spread8(y))


def spread8_sql(v: str) -> str:
    """DuckDB spelling of _spread8 (operators, not function forms)."""
    s = f"(({v}) & 255)"
    s = f"((({s}) | (({s}) << 4)) & 3855)"
    s = f"((({s}) | (({s}) << 2)) & 13107)"
    s = f"((({s}) | (({s}) << 1)) & 21845)"
    return s


def zvalue8_sql(x: str, y: str) -> str:
    """DuckDB spelling of zvalue8."""
    return f"((({spread8_sql(x)}) << 1) | ({spread8_sql(y)}))"
