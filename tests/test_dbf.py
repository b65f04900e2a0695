"""dBase .dbf reader: writer/reader round-trip, field-type mapping,
deleted rows, structural sniff, truncation fuzz, analyze dispatch."""
import random
import struct

import pytest

from hoover_snoop2_spark.operators.dbf_extract import (
    DbfBroken,
    build_dbf,
    dbf_to_table,
    looks_like_dbf,
)


def test_roundtrip_basic():
    header = ["NAME", "CITY", "QTY"]
    rows = [["ada", "paris", "12"], ["bo", "oslo", "7"],
            ["celine", "lyon", "1024"]]
    blob = build_dbf(header, rows)
    info, kids = dbf_to_table(blob)
    assert info["table-columns"] == header
    assert info["table-row-count"] == 4  # header + 3, csv parity
    assert len(kids) == 3
    assert kids[0][0] == "1.txt"
    for (name, text), row in zip(kids, rows):
        for v in row:
            assert v in text


def test_deleted_rows_skipped():
    blob = build_dbf(["A"], [["one"], ["two"], ["three"]], deleted={1})
    info, kids = dbf_to_table(blob)
    assert info["table-row-count"] == 3
    assert all("two" not in t for _, t in kids)


def test_logical_and_memo_fields():
    blob = build_dbf(["OK", "NOTE"], [["T", "x"], ["F", "y"], ["?", "z"]],
                     types=["L", "M"])
    _info, kids = dbf_to_table(blob)
    texts = [t for _, t in kids]
    assert "true" in texts[0] and "false" in texts[1]
    # memo fields surface empty
    assert "x" not in texts[0]


def test_sniffer():
    blob = build_dbf(["F1"], [["val"]])
    assert looks_like_dbf(blob)
    assert not looks_like_dbf(b"\x00" * 100)
    assert not looks_like_dbf(b"plain text file contents" * 10)
    # corrupt the descriptor terminator
    nohdr = bytearray(blob)
    (hsize,) = struct.unpack_from("<H", nohdr, 8)
    nohdr[hsize - 1] = 0x00
    assert not looks_like_dbf(bytes(nohdr))


def test_truncation_typed():
    blob = build_dbf(["A", "B"], [["aa", "bb"], ["cc", "dd"]])
    with pytest.raises(DbfBroken):
        dbf_to_table(blob[: len(blob) - 4])
    with pytest.raises(DbfBroken):
        dbf_to_table(blob[:20])


def test_fuzz_roundtrip():
    rng = random.Random(11)
    for _ in range(20):
        ncols = rng.randint(1, 6)
        header = [f"C{j}" for j in range(ncols)]
        rows = [
            ["".join(rng.choice("abcdef 123") for _ in range(rng.randint(0, 12))).strip()
             or "x" for _ in range(ncols)]
            for _ in range(rng.randint(0, 15))
        ]
        info, kids = dbf_to_table(build_dbf(header, rows))
        assert info["table-row-count"] == len(rows) + 1
        assert len(kids) == len(rows)


def test_analyze_dispatch():
    from hoover_snoop2_spark.operators.analyze import analyze_blob

    blob = build_dbf(["NAME", "ROLE"], [["ada", "eng"], ["bo", "ops"]])
    out = analyze_blob("k", blob)
    assert out[0]["mime_type"] == "application/x-dbf"
    assert out[0]["status"] == "success"
    assert out[0]["table_columns"] == ["NAME", "ROLE"]
    assert out[0]["table_row_count"] == 3
    assert [c["child_name"] for c in out[1:]] == ["1.txt", "2.txt"]
