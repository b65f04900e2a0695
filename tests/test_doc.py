"""Legacy Word .doc piece-table extraction ([MS-DOC] over CFB)."""

import hashlib

import pytest

from hoover_snoop2_spark.operators.analyze import analyze_blob
from hoover_snoop2_spark.operators.doc_extract import (
    DocBroken,
    build_doc_file,
    doc_to_text,
    is_word_doc,
)

PARAS = ["First paragraph of the memo.",
         "Second paragraph with café details.",
         "Closing line."]


@pytest.mark.parametrize("compressed", [False, True])
def test_round_trip(compressed):
    doc = build_doc_file(PARAS, compressed=compressed)
    assert is_word_doc(doc)
    assert doc_to_text(doc) == "\n\n".join(PARAS)


def test_analyze_routes_doc():
    doc = build_doc_file(PARAS)
    digest = analyze_blob(hashlib.sha3_256(doc).hexdigest(), doc)[0]
    assert digest["mime_type"] == "application/msword"
    assert digest["text"] == "\n\n".join(PARAS)


def test_garbage_ole_broken():
    with pytest.raises(DocBroken):
        doc_to_text(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + bytes(1024))


def test_filetype_doc():
    from hoover_snoop2_spark.functions.filetypes import get_filetype

    assert get_filetype("application/msword") == "doc"
