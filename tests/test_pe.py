"""PE/COFF header metadata: fixture round-trip, sniff gating, analyze."""
import pytest

from hoover_snoop2_spark.operators.pe_extract import (
    PeBroken,
    build_pe,
    looks_like_pe,
    parse_pe,
)


def test_parse_fields():
    blob = build_pe(machine=0x8664, n_sections=5, timestamp=1000000000,
                    pe32plus=True, subsystem=2)
    meta = parse_pe(blob)
    assert meta["machine"] == "x86-64"
    assert meta["n_sections"] == 5
    assert meta["timestamp"] == "2001-09-09T01:46:40Z"
    assert meta["pe_format"] == "pe32+"
    assert meta["subsystem"] == "windows-gui"


def test_pe32_and_unknown_machine():
    blob = build_pe(machine=0x014C, pe32plus=False, subsystem=3)
    meta = parse_pe(blob)
    assert meta["machine"] == "i386"
    assert meta["pe_format"] == "pe32"
    assert meta["subsystem"] == "windows-cui"


def test_sniff_demands_pe_chain():
    assert looks_like_pe(build_pe())
    assert not looks_like_pe(b"MZ" + b"\x00" * 200)  # stub, no PE sig
    assert not looks_like_pe(b"MZ")
    with pytest.raises(PeBroken):
        parse_pe(b"MZ" + b"\x00" * 100)


def test_analyze_dispatch():
    from hoover_snoop2_spark.operators.analyze import analyze_blob

    out = analyze_blob("k", build_pe(timestamp=1500000000))
    assert out[0]["mime_type"] == "application/x-msdownload"
    assert out[0]["status"] == "success"
    assert out[0]["date_created"] == "2017-07-14T02:40:00Z"
    # MZ without a PE chain stays a bare DOS executable
    out = analyze_blob("k", b"MZ" + b"\x00" * 300)
    assert out[0]["mime_type"] == "application/x-dosexec"
