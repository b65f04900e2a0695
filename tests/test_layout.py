"""Z-order layout (plans/layout.py): Morton codes and data-skipping."""

from pyspark.sql import functions as F

from hoover_snoop2_spark.plans.layout import zvalue8, zvalue8_sql


def _py_morton(x: int, y: int) -> int:
    z = 0
    for bit in range(8):
        z |= ((x >> bit) & 1) << (2 * bit + 1)
        z |= ((y >> bit) & 1) << (2 * bit)
    return z


def test_zvalue8_matches_bitwise_reference(spark):
    pts = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 23)]
    df = spark.createDataFrame(pts, "x int, y int")
    rows = df.select(
        "x", "y", zvalue8(F.col("x"), F.col("y")).alias("z")
    ).collect()
    for r in rows:
        assert r["z"] == _py_morton(r["x"], r["y"]), (r["x"], r["y"])


def test_zvalue8_sql_matches_spark_expression(spark):
    import duckdb

    pts = [(x, y) for x in range(0, 256, 13) for y in range(0, 256, 29)]
    df = spark.createDataFrame(pts, "x int, y int")
    got_spark = sorted(
        (r["x"], r["y"], r["z"])
        for r in df.select(
            "x", "y", zvalue8(F.col("x"), F.col("y")).alias("z")
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (x INT, y INT)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    got_duck = sorted(
        con.execute(
            f"SELECT x, y, {zvalue8_sql('x', 'y')} AS z FROM pts"
        ).fetchall()
    )
    assert got_spark == got_duck


def test_zorder_bins_localize_both_axes(spark):
    """Under z-order binning every bin's (x, y) extents form a small
    rectangle; under single-axis sorting the other axis is unlocalized.
    Quantified: sum of per-bin x-extent widths must be far smaller for
    the z layout than the y-sorted layout on a uniform grid."""
    pts = [(x, y) for x in range(256) for y in range(0, 256, 8)]
    df = spark.createDataFrame(pts, "x int, y int")
    z = df.select(
        "x",
        "y",
        F.shiftright(zvalue8(F.col("x"), F.col("y")), 11).alias("bin"),
    )
    zext = z.groupBy("bin").agg(
        (F.max("x") - F.min("x")).alias("w")
    )
    z_width = zext.agg(F.sum("w")).collect()[0][0] / zext.count()
    # y-sorted layout: same number of bins by y range
    lin = df.select("x", "y", F.shiftright(F.col("y"), 3).alias("bin"))
    lext = lin.groupBy("bin").agg((F.max("x") - F.min("x")).alias("w"))
    l_width = lext.agg(F.sum("w")).collect()[0][0] / lext.count()
    assert z_width * 2 < l_width, (z_width, l_width)
