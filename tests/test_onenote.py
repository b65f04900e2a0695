"""OneNote FileDataStoreObject extraction: writer/scanner round-trip,
padding variants, truncation fuzz, and the analyze-level recursion."""
import random
import struct

import pytest

from hoover_snoop2_spark.operators.onenote_extract import (
    OneNoteBroken,
    build_onenote,
    extract_onenote_files,
    looks_like_onenote,
    onenote_kind,
)


def test_roundtrip_and_padding():
    rng = random.Random(5)
    for trial in range(25):
        payloads = [
            bytes(rng.randrange(256) for _ in range(rng.choice(
                [0, 1, 7, 8, 9, 100, 4096, 5001])))
            for _ in range(rng.randint(0, 4))
        ]
        blob = build_onenote(payloads, filler=b"\x00" * rng.randrange(0, 64))
        got = extract_onenote_files(blob)
        assert [p for _, p in got] == payloads, trial
        assert [n for n, _ in got] == [f"embedded{i}"
                                       for i in range(len(payloads))]


def test_sniffer_kinds():
    one = build_onenote([b"x"], kind="one")
    toc = build_onenote([], kind="onetoc2")
    assert looks_like_onenote(one) and looks_like_onenote(toc)
    assert onenote_kind(one) == "one"
    assert onenote_kind(toc) == "onetoc2"
    assert not looks_like_onenote(b"\x00" * 16)


def test_truncation_typed():
    blob = build_onenote([b"payload bytes here", b"second"])
    for cut in (len(blob) - 3, len(blob) - 20, len(blob) - 30):
        with pytest.raises(OneNoteBroken) as ei:
            extract_onenote_files(blob[:cut])
        assert ei.value.reason == "onenote_truncated"


def test_bogus_length_typed():
    blob = bytearray(build_onenote([b"abcdefgh"]))
    hdr = blob.find(bytes.fromhex("e716e3bd65261145a4c48d4d0b7a9eac"))
    struct.pack_into("<Q", blob, hdr + 16, 1 << 40)  # absurd cbLength
    with pytest.raises(OneNoteBroken):
        extract_onenote_files(bytes(blob))


def test_analyze_recurses_embedded_pdf_like():
    from hoover_snoop2_spark.operators.analyze import analyze_blob

    inner_txt = b"embedded plain text payload"
    blob = build_onenote([inner_txt], filler=b"\x11" * 32)
    out = analyze_blob("k", blob)
    assert out[0]["mime_type"] == "application/onenote"
    assert out[0]["status"] == "success"
    assert [(c["child_name"], c["child_data"]) for c in out[1:]] == [
        ("embedded0", inner_txt)
    ]


# --- [MS-ONESTORE] node-tree walk (section text, r5) ----------------------


def test_section_text_roundtrip():
    from hoover_snoop2_spark.operators.onenote_extract import (
        build_onenote_section,
        extract_onenote_text,
    )

    texts = ["Meeting notes for Tuesday", "Follow-up: send the draft",
             "日本語のメモ — unicode"]
    blob = build_onenote_section(texts)
    assert extract_onenote_text(blob) == "\n".join(texts)


def test_section_text_with_embedded_files():
    from hoover_snoop2_spark.operators.onenote_extract import (
        build_onenote_section,
        extract_onenote_files,
        extract_onenote_text,
    )

    blob = build_onenote_section(["note body"], embedded=[b"PAYLOAD1"])
    assert extract_onenote_text(blob) == "note body"
    assert [b for _, b in extract_onenote_files(blob)] == [b"PAYLOAD1"]


def test_section_text_fail_loud_never_wrong():
    """Bit flips either keep the correct text, drop to '', or lose a
    span — the walk must never raise and never emit garbage strings
    that were not in a property payload."""
    import random

    from hoover_snoop2_spark.operators.onenote_extract import (
        build_onenote_section,
        extract_onenote_text,
    )

    texts = ["alpha beta gamma", "delta epsilon"]
    blob = build_onenote_section(texts)
    rng = random.Random(17)
    for _ in range(200):
        mutated = bytearray(blob)
        for _ in range(rng.randint(1, 4)):
            mutated[rng.randrange(len(mutated))] ^= 1 << rng.randrange(8)
        got = extract_onenote_text(bytes(mutated))
        assert isinstance(got, str)


def test_no_node_tree_is_empty_not_error():
    from hoover_snoop2_spark.operators.onenote_extract import (
        extract_onenote_text,
    )

    assert extract_onenote_text(build_onenote([b"x"])) == ""
    assert extract_onenote_text(b"\x00" * 2048) == ""


def test_analyze_carries_section_text():
    from hoover_snoop2_spark.operators.analyze import analyze_blob
    from hoover_snoop2_spark.operators.onenote_extract import (
        build_onenote_section,
    )

    blob = build_onenote_section(["the notebook text"],
                                 embedded=[b"inner bytes"])
    out = analyze_blob("k", blob)
    assert out[0]["status"] == "success"
    assert out[0]["text"] == "the notebook text"
    assert out[1]["child_data"] == b"inner bytes"
