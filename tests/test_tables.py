"""CSV sniff + explode — reference rules archives.py:106-141, 206-234."""

import pytest

from hoover_snoop2_spark.operators.tables import (
    corrected_table_mime,
    explode_row,
    explode_table,
    guess_csv_dialect,
    table_info,
)


@pytest.mark.parametrize("delim,want_mime", [
    (",", "text/csv"),
    (";", "text/csv"),
    ("|", "text/csv"),
    (":", "text/csv"),
    ("\t", "text/tab-separated-values"),
])
def test_sniff_delimiters(delim, want_mime):
    data = (
        delim.join(["a", "b", "c"]) + "\n"
        + "\n".join(delim.join([f"x{i}", f"y{i}", f"z{i}"]) for i in range(5))
    ).encode()
    assert guess_csv_dialect(data, "us-ascii").delimiter == delim
    assert corrected_table_mime(data, "text/plain", "us-ascii") == want_mime


def test_prose_not_table():
    data = b"This is just a sentence of prose.\nAnd another one follows here.\n"
    assert corrected_table_mime(data, "text/plain", "us-ascii") == "text/plain"


def test_table_info():
    data = b"h1,h2,h3\n1,2,3\n4,5,6\n"
    info = table_info(data, "text/csv", "us-ascii")
    assert info["table-columns"] == ["h1", "h2", "h3"]
    assert info["table-row-count"] == 3
    assert info["table-col-count"] == 3


def test_explode_row_caps():
    # 1024-char cell cap + 200-col cap (archives.py:217-219)
    row = ["x" * 2000] + ["v"] * 300
    text = explode_row(row, None)
    lines = text.splitlines()
    assert len(lines) == 200
    assert lines[0] == "C1 = " + "x" * 1024


def test_explode_table_children():
    data = b"a,b\n1,2\n3,4\n"
    got = explode_table(data, "text/csv", "us-ascii")
    assert got == [("1.txt", "a = 1\nb = 2\n"), ("2.txt", "a = 3\nb = 4\n")]
