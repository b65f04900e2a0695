"""Property tests for the legacy-Office RC4 suite: any content, any
password, any variant/key size → decrypt(encrypt(x)) extracts exactly
what the plain path extracts."""

from hypothesis import given, settings
from hypothesis import strategies as st

from hoover_snoop2_spark.functions.archive_crypto import set_archive_password

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
    min_size=1, max_size=80,
).map(lambda s: s.strip() or "x")
_password = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=0x2FF),
    min_size=1, max_size=24)
_variant = st.sampled_from([("rc4", 128), ("capi", 40), ("capi", 128)])


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(_text, min_size=1, max_size=3),
                min_size=1, max_size=4),
       _password, _variant)
def test_xls_rc4_round_trip(rows, password, variant):
    from hoover_snoop2_spark.operators.xls_crypto import encrypt_xls
    from hoover_snoop2_spark.operators.xls_extract import (
        build_xls,
        xls_to_table,
    )

    width = max(len(r) for r in rows)
    rows = [r + ["pad"] * (width - len(r)) for r in rows]
    header = [f"c{i}" for i in range(width)]
    plain = build_xls(header, rows)
    enc = encrypt_xls(plain, password, variant=variant[0],
                      key_bits=variant[1])
    set_archive_password(password)
    try:
        assert xls_to_table(enc) == xls_to_table(plain)
    finally:
        set_archive_password(None)


@settings(max_examples=40, deadline=None)
@given(st.lists(_text, min_size=1, max_size=5), _password, _variant)
def test_doc_rc4_round_trip(paras, password, variant):
    from hoover_snoop2_spark.operators.doc_crypto import encrypt_doc
    from hoover_snoop2_spark.operators.doc_extract import (
        build_doc_file,
        doc_to_text,
    )

    plain = build_doc_file(paras)
    enc = encrypt_doc(plain, password, variant=variant[0],
                      key_bits=variant[1])
    set_archive_password(password)
    try:
        assert doc_to_text(enc) == doc_to_text(plain)
    finally:
        set_archive_password(None)


@settings(max_examples=40, deadline=None)
@given(st.lists(_text, min_size=1, max_size=5), _password,
       st.sampled_from([40, 128]))
def test_ppt_rc4_round_trip(blocks, password, key_bits):
    from hoover_snoop2_spark.operators.ppt_crypto import build_encrypted_ppt
    from hoover_snoop2_spark.operators.ppt_extract import (
        build_ppt,
        ppt_to_text,
    )

    enc = build_encrypted_ppt(blocks, password, key_bits=key_bits)
    set_archive_password(password)
    try:
        assert ppt_to_text(enc) == ppt_to_text(build_ppt(blocks))
    finally:
        set_archive_password(None)


def test_truncation_and_bitflip_never_crash_analyze():
    """Corrupt encrypted legacy-Office files surface typed broken rows,
    never exceptions, through the analyze kernel."""
    import hashlib

    from hoover_snoop2_spark.operators.analyze import analyze_blob
    from hoover_snoop2_spark.operators.doc_crypto import encrypt_doc
    from hoover_snoop2_spark.operators.doc_extract import build_doc_file
    from hoover_snoop2_spark.operators.ppt_crypto import build_encrypted_ppt
    from hoover_snoop2_spark.operators.xls_crypto import encrypt_xls
    from hoover_snoop2_spark.operators.xls_extract import build_xls

    fixtures = [
        encrypt_xls(build_xls(["a", "b"], [["1", "2"]]), "VelvetSweatshop"),
        encrypt_doc(build_doc_file(["hello", "world"]), "VelvetSweatshop"),
        build_encrypted_ppt(["slide one", "slide two"], "VelvetSweatshop"),
    ]
    for fx in fixtures:
        for cut in range(64, len(fx), 97):
            data = fx[:cut]
            rows = analyze_blob(hashlib.sha3_256(data).hexdigest(), data)
            assert rows and rows[0]["status"] in ("success", "broken", "skipped")
        for pos in range(0, len(fx), 211):
            data = fx[:pos] + bytes([fx[pos] ^ 0xFF]) + fx[pos + 1:]
            rows = analyze_blob(hashlib.sha3_256(data).hexdigest(), data)
            assert rows and rows[0]["status"] in ("success", "broken", "skipped")
