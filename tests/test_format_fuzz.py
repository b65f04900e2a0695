"""Corruption fuzz across the round-4 format families: every fixture
builder's output, truncated at random points and bit-flipped, must
flow through ``analyze_blob`` as a typed row — never an exception,
never a hang.  (The 100-TB contract: one bad blob degrades one row.)"""
import random

import pytest

from hoover_snoop2_spark.operators.analyze import analyze_blob


def _fixtures():
    from hoover_snoop2_spark.functions.snappy_codec import (
        snappy_compress_framed)
    from hoover_snoop2_spark.operators.cab_extract import build_cab
    from hoover_snoop2_spark.operators.chm_extract import build_chm
    from hoover_snoop2_spark.operators.dbf_extract import build_dbf
    from hoover_snoop2_spark.operators.legacy_encodings import (
        build_applefile, build_binhex, build_uuencode)
    from hoover_snoop2_spark.operators.lotus_extract import build_wk1
    from hoover_snoop2_spark.operators.midi_stats import build_midi
    from hoover_snoop2_spark.operators.onenote_extract import build_onenote
    from hoover_snoop2_spark.operators.pe_extract import build_pe
    from hoover_snoop2_spark.operators.tnef_extract import build_tnef
    from hoover_snoop2_spark.operators.torrent_extract import bencode
    from hoover_snoop2_spark.operators.vba_extract import build_vba_project
    from hoover_snoop2_spark.operators.visio_extract import build_vsdx

    return {
        "tnef": build_tnef(subject="s", body="b" * 50, sender="a@b",
                           attachments=[("f.txt", b"payload")],
                           body_mode="rtf", date=(2020, 1, 2, 3, 4, 5)),
        "uuencode": build_uuencode([("f.bin", bytes(range(200)))]),
        "binhex": build_binhex("f.txt", b"data fork " * 20, rsrc=b"RR"),
        "applefile": build_applefile("n.txt", b"fork" * 30, dates=(1, 2)),
        "onenote": build_onenote([b"embedded" * 20, b"x"]),
        "vba": build_vba_project([("M", "Sub A()\r\nEnd Sub\r\n" * 20)]),
        "dbf": build_dbf(["A", "B"], [["aa", "bb"]] * 10),
        "wk1": build_wk1(["H1", "H2"], [["x", "42"]] * 8),
        "vsdx": build_vsdx([["shape one", "shape two"]]),
        "chm": build_chm([("t.txt", b"topic body " * 40)]),
        "cab-mszip": build_cab([("f.txt", b"cab content " * 40)], "mszip"),
        "cab-lzx": build_cab([("f.txt", b"cab content " * 40)], "lzx"),
        "snappy": snappy_compress_framed(b"framed payload " * 50),
        "torrent": bencode({b"announce": b"http://t.example",
                            b"info": {b"name": b"n", b"length": 5,
                                      b"piece length": 16384,
                                      b"pieces": b"\x00" * 20}}),
        "pe": build_pe(timestamp=1234567890),
        "midi": build_midi([[(0, b"\x90\x3c\x40"), (480, b"\x80\x3c\x40")]]),
    }


@pytest.mark.parametrize("name", sorted(_fixtures()))
def test_truncation_and_bitflip_never_raise(name):
    blob = _fixtures()[name]
    import zlib

    rng = random.Random(zlib.crc32(name.encode()))  # stable across runs
    variants = [blob]
    for _ in range(12):
        variants.append(blob[: rng.randrange(1, len(blob))])
    for _ in range(12):
        b = bytearray(blob)
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        variants.append(bytes(b))
    for v in variants:
        rows = analyze_blob("x" * 64, v)
        assert rows, name
        assert rows[0]["status"] in ("success", "broken", "skipped"), (
            name, rows[0]["status"])
