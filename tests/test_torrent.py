"""Bencode codec + .torrent metainfo extraction."""
import random

import pytest

from hoover_snoop2_spark.operators.torrent_extract import (
    TorrentBroken,
    bdecode,
    bencode,
    looks_like_torrent,
    torrent_to_text,
)


def _torrent(multi=False, extra=None):
    info = {b"name": b"dataset-dump", b"piece length": 262144,
            b"pieces": b"\x00" * 40}
    if multi:
        info[b"files"] = [
            {b"path": [b"dir", b"a.txt"], b"length": 123},
            {b"path": [b"b.bin"], b"length": 456789},
        ]
    else:
        info[b"length"] = 999
    top = {b"announce": b"http://tr.example/announce", b"info": info}
    top.update(extra or {})
    return bencode(top)


def test_roundtrip_canonical():
    rng = random.Random(41)

    def rand_val(depth=0):
        kinds = ["int", "bytes"] + (["list", "dict"] if depth < 3 else [])
        k = rng.choice(kinds)
        if k == "int":
            return rng.randint(-10**12, 10**12)
        if k == "bytes":
            return bytes(rng.randrange(256) for _ in range(rng.randrange(0, 20)))
        if k == "list":
            return [rand_val(depth + 1) for _ in range(rng.randrange(0, 4))]
        return {bytes([65 + i]) + b"k": rand_val(depth + 1)
                for i in range(rng.randrange(0, 4))}

    for _ in range(50):
        v = rand_val()
        enc = bencode(v)
        assert bdecode(enc) == v
        assert bencode(bdecode(enc)) == enc  # canonical byte-exactness


def test_text_single_and_multi():
    text, date = torrent_to_text(_torrent())
    assert "name = dataset-dump" in text
    assert "announce = http://tr.example/announce" in text
    assert "length = 999" in text
    assert date is None

    text, _ = torrent_to_text(_torrent(multi=True))
    assert "file = dir/a.txt (123)" in text
    assert "file = b.bin (456789)" in text


def test_creation_date():
    blob = _torrent(extra={b"creation date": 1000000000})
    _, date = torrent_to_text(blob)
    assert date == "2001-09-09T01:46:40Z"


def test_bad_bencode_typed():
    for bad in (b"d3:fooe", b"i01e", b"d1:bi1e1:ai2ee",  # unsorted keys
                b"5:abc", b"li1e", b"i--2e"):
        with pytest.raises(TorrentBroken):
            bdecode(bad)


def test_sniffer_gate():
    assert looks_like_torrent(_torrent())
    assert not looks_like_torrent(b"dear sir, this is prose")
    assert not looks_like_torrent(b"de")  # valid bencode, no info/announce


def test_analyze_dispatch():
    from hoover_snoop2_spark.operators.analyze import analyze_blob

    out = analyze_blob("k", _torrent(multi=True,
                                     extra={b"creation date": 1500000000}))
    d = out[0]
    assert d["mime_type"] == "application/x-bittorrent"
    assert d["status"] == "success"
    assert "dataset-dump" in d["text"]
    assert d["date_created"] == "2017-07-14T02:40:00Z"
