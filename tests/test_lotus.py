"""Lotus 1-2-3 WK1 reader: round-trip, label prefixes, numeric cells,
sparse grids, truncation fuzz, analyze dispatch."""
import random
import struct

import pytest

from hoover_snoop2_spark.operators.lotus_extract import (
    Wk1Broken,
    build_wk1,
    looks_like_wk1,
    wk1_to_table,
)


def test_roundtrip_labels_and_numbers():
    header = ["NAME", "SCORE", "NOTE"]
    rows = [["ada", "91", "good"], ["bo", "7.5", "meh"]]
    blob = build_wk1(header, rows)
    info, kids = wk1_to_table(blob)
    assert info["table-columns"] == header
    assert info["table-row-count"] == 3
    assert len(kids) == 2
    assert "91" in kids[0][1] and "7.5" in kids[1][1]


def test_label_prefix_stripping():
    # hand-built LABEL records with each alignment prefix
    out = bytearray(struct.pack("<HHH", 0x0000, 2, 0x0406))
    for c, (prefix, text) in enumerate(
            [(b"'", b"left"), (b'"', b"right"), (b"^", b"center")]):
        cell = prefix + text + b"\x00"
        out += struct.pack("<HHBHH", 0x000F, 5 + len(cell), 0xFF, c, 0) + cell
    out += struct.pack("<HH", 0x0001, 0)
    info, _ = wk1_to_table(bytes(out))
    assert info["table-columns"] == ["left", "right", "center"]


def test_integer_record():
    out = bytearray(struct.pack("<HHH", 0x0000, 2, 0x0406))
    out += struct.pack("<HHBHH", 0x000F, 5 + 3, 0xFF, 0, 0) + b"'h\x00"
    out += struct.pack("<HHBHHh", 0x000D, 7, 0xFF, 0, 1, -321)
    out += struct.pack("<HH", 0x0001, 0)
    info, kids = wk1_to_table(bytes(out))
    assert info["table-columns"] == ["h"]
    assert "-321" in kids[0][1]


def test_sparse_grid_fills_blanks():
    out = bytearray(struct.pack("<HHH", 0x0000, 2, 0x0406))
    out += struct.pack("<HHBHH", 0x000F, 5 + 3, 0xFF, 0, 0) + b"'a\x00"
    out += struct.pack("<HHBHH", 0x000F, 5 + 3, 0xFF, 2, 2) + b"'z\x00"
    out += struct.pack("<HH", 0x0001, 0)
    info, kids = wk1_to_table(bytes(out))
    assert info["table-col-count"] == 3
    assert info["table-row-count"] == 3
    assert len(kids) == 2


def test_sniffer_and_truncation():
    blob = build_wk1(["A"], [["x"]])
    assert looks_like_wk1(blob)
    assert not looks_like_wk1(b"\x00\x00\x02\x00\xff\xff")
    for cut in (3, len(blob) - 2, len(blob) - 6):
        with pytest.raises(Wk1Broken):
            wk1_to_table(blob[:cut])


def test_fuzz_roundtrip():
    rng = random.Random(21)
    for _ in range(20):
        ncols = rng.randint(1, 5)
        header = [f"H{j}" for j in range(ncols)]
        rows = [
            [rng.choice([str(rng.randint(-500, 500)),
                         "w" * rng.randint(1, 8),
                         str(rng.random())[:8]])
             for _ in range(ncols)]
            for _ in range(rng.randint(0, 12))
        ]
        info, kids = wk1_to_table(build_wk1(header, rows))
        assert info["table-columns"] == header
        assert len(kids) == len(rows)


def test_analyze_dispatch():
    from hoover_snoop2_spark.operators.analyze import analyze_blob

    blob = build_wk1(["Q", "N"], [["alpha", "3"], ["beta", "4"]])
    out = analyze_blob("k", blob)
    assert out[0]["mime_type"] == "application/vnd.lotus-1-2-3"
    assert out[0]["status"] == "success"
    assert out[0]["table_columns"] == ["Q", "N"]
    assert [c["child_name"] for c in out[1:]] == ["1.txt", "2.txt"]
