"""Native SQLite reader, validated against databases created by the
stdlib ``sqlite3`` module (an independent C implementation)."""
import random
import sqlite3
import tempfile

import pytest

from hoover_snoop2_spark.operators.sqlite_extract import (
    SqliteBroken,
    _columns_from_sql,
    _Db,
    sqlite_to_tables,
)


def _make_db(setup):
    f = tempfile.mktemp(suffix=".db")
    con = sqlite3.connect(f)
    setup(con)
    con.commit()
    con.close()
    return open(f, "rb").read()


def _rows(data: bytes, table: str):
    db = _Db(data)
    tables = {r[1]: (int(r[3]), r[4]) for _x, r in db.table_rows(1)
              if r[0] == "table"}
    root, sql = tables[table]
    cols, ipk = _columns_from_sql(sql or "")
    out = []
    for rowid, rec in db.table_rows(root):
        rec = list(rec)
        if 0 <= ipk < len(rec) and rec[ipk] is None:
            rec[ipk] = rowid
        out.append(tuple(rec))
    return out


def test_all_serial_types_exact():
    def setup(con):
        con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, i INT, "
                    "f REAL, s TEXT, b BLOB, n TEXT)")
        con.execute("INSERT INTO t VALUES (1, -1, 0.5, 'héllo', x'00ff', NULL)")
        con.execute("INSERT INTO t VALUES (2, 0, -1e300, '', x'', 'x')")
        con.execute("INSERT INTO t VALUES (3, 1, 3.14159, 'longer text "
                    "value here', x'deadbeefcafe', NULL)")
        con.execute("INSERT INTO t VALUES (4, 9223372036854775807, 1.0, "
                    "'max', NULL, NULL)")
        con.execute("INSERT INTO t VALUES (5, -9223372036854775808, 2.0, "
                    "'min', NULL, NULL)")

    data = _make_db(setup)
    f = tempfile.mktemp()
    open(f, "wb").write(data)
    expected = list(sqlite3.connect(f).execute(
        "SELECT * FROM t ORDER BY id"))
    got = sorted(_rows(data, "t"))
    assert [tuple(r) for r in expected] == got


def test_overflow_and_multipage():
    big = "Z" * 50000  # multi-page overflow chain

    def setup(con):
        con.execute("CREATE TABLE big (k INTEGER PRIMARY KEY, v TEXT)")
        con.execute("INSERT INTO big VALUES (1, ?)", (big,))
        for i in range(2, 3000):
            con.execute("INSERT INTO big VALUES (?, ?)", (i, f"row{i}"))

    data = _make_db(setup)
    got = _rows(data, "big")
    assert len(got) == 2999
    assert got[0] == (1, big)
    assert got[-1] == (2999, "row2999")


def test_random_fuzz_vs_stdlib():
    rng = random.Random(31)

    def setup(con):
        con.execute("CREATE TABLE r (a INTEGER PRIMARY KEY, b, c, d)")
        for i in range(1, 400):
            v = rng.random()
            con.execute(
                "INSERT INTO r VALUES (?, ?, ?, ?)",
                (i,
                 rng.choice([None, rng.randint(-2**40, 2**40), "s" * (i % 37)]),
                 rng.choice([None, v, -v * 1e12]),
                 rng.choice([None, bytes([i % 256]) * (i % 61)])))

    data = _make_db(setup)
    f = tempfile.mktemp()
    open(f, "wb").write(data)
    expected = [tuple(r) for r in sqlite3.connect(f).execute(
        "SELECT * FROM r ORDER BY a")]
    assert _rows(data, "r") == expected


def test_utf16_encoding():
    def setup(con):
        con.execute("PRAGMA encoding='UTF-16le'")
        con.execute("CREATE TABLE u (x TEXT)")
        con.execute("INSERT INTO u VALUES ('héllo wörld — ünïcode')")

    data = _make_db(setup)
    assert _rows(data, "u") == [("héllo wörld — ünïcode",)]


def test_without_rowid_skipped_and_views_ignored():
    def setup(con):
        con.execute("CREATE TABLE norm (a INTEGER PRIMARY KEY, b TEXT)")
        con.execute("INSERT INTO norm VALUES (1, 'keep')")
        con.execute("CREATE TABLE wr (k TEXT PRIMARY KEY, v TEXT) "
                    "WITHOUT ROWID")
        con.execute("INSERT INTO wr VALUES ('a', 'b')")
        con.execute("CREATE VIEW vv AS SELECT * FROM norm")
        con.execute("CREATE INDEX ix ON norm (b)")

    data = _make_db(setup)
    info, kids = sqlite_to_tables(data)
    names = {n.split("/")[0] for n, _ in kids}
    assert names == {"norm"}


def test_column_sql_parse():
    cols, ipk = _columns_from_sql(
        'CREATE TABLE t ("quoted name" TEXT, [brack] INT, `tick` BLOB, '
        "plain INTEGER PRIMARY KEY, CHECK (plain > 0), "
        "FOREIGN KEY (plain) REFERENCES o(x))")
    assert cols == ["quoted name", "brack", "tick", "plain"]
    assert ipk == 3


def test_truncation_typed():
    data = _make_db(lambda con: con.execute(
        "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT)"))
    with pytest.raises(SqliteBroken):
        sqlite_to_tables(data[:50])
    with pytest.raises(SqliteBroken):
        sqlite_to_tables(b"SQLite format 3\x00" + b"\x00" * 84)


def test_analyze_dispatch():
    from hoover_snoop2_spark.operators.analyze import analyze_blob

    def setup(con):
        con.execute("CREATE TABLE msgs (id INTEGER PRIMARY KEY, body TEXT)")
        con.execute("INSERT INTO msgs VALUES (1, 'hello db')")
        con.execute("INSERT INTO msgs VALUES (2, 'bye db')")

    data = _make_db(setup)
    out = analyze_blob("k", data)
    assert out[0]["mime_type"] == "application/vnd.sqlite3"
    assert out[0]["status"] == "success"
    assert out[0]["table_columns"] == ["id", "body"]
    assert out[0]["table_row_count"] == 3
    assert [c["child_name"] for c in out[1:]] == ["msgs/1.txt", "msgs/2.txt"]
    assert b"hello db" in out[1]["child_data"]
