"""Legacy .xls BIFF8 extraction ([MS-XLS] over CFB)."""

import hashlib

from hoover_snoop2_spark.operators.analyze import analyze_blob
from hoover_snoop2_spark.operators.xls_extract import (
    build_xls,
    is_xls,
    xls_to_table,
)


def test_round_trip():
    xls = build_xls(["name", "qty"], [["widget", "3"], ["gädget", "7"]])
    assert is_xls(xls)
    info, children = xls_to_table(xls)
    assert info["table-columns"] == ["name", "qty"]
    assert info["table-row-count"] == 3
    assert children == [
        ("1.txt", "name = widget\nqty = 3\n"),
        ("2.txt", "name = gädget\nqty = 7\n"),
    ]


def test_analyze_routes_xls():
    xls = build_xls(["a", "b"], [["1", "2"]])
    rows = analyze_blob(hashlib.sha3_256(xls).hexdigest(), xls)
    digest = rows[0]
    assert digest["mime_type"] == "application/vnd.ms-excel"
    assert digest["table_row_count"] == 2
    assert rows[1]["child_name"] == "1.txt"
    assert rows[1]["child_data"] == b"a = 1\nb = 2\n"


def test_non_biff_ole_passthrough():
    fake = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + bytes(1024)
    assert not is_xls(fake)
    digest = analyze_blob("x", fake)[0]
    assert digest["mime_type"] == "application/vnd.ms-excel"
    assert digest["status"] in ("success", "broken")


def test_rk_value_sign_extension():
    # RK integers are 30-bit SIGNED: -7 encodes with the top bit set
    from hoover_snoop2_spark.operators.xls_extract import _rk_value

    def enc_int(v, cw=False):
        return ((v & 0x3FFFFFFF) << 2) | 0x02 | (0x01 if cw else 0)

    assert _rk_value(enc_int(7)) == "7"
    assert _rk_value(enc_int(-7)) == "-7"
    assert _rk_value(enc_int(-7, cw=True)) == "-0.07"
    assert _rk_value(enc_int(-(1 << 29))) == str(-(1 << 29))
    # IEEE-double RK with a negative value (sign lives in the float bits)
    import struct as _s
    top = _s.unpack("<Q", _s.pack("<d", -12.5))[0] >> 32
    assert _rk_value(top & 0xFFFFFFFC) == "-12.5"
