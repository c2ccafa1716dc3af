"""Measured data-skipping test for the Z-order writer."""
import glob
import os

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _file_ranges(path: str, col: str):
    """(min, max) of `col` per parquet file, from footer statistics only."""
    out = {}
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out[f] = (lo, hi)
    return out


def _candidate_fraction(ranges: dict, point) -> float:
    """Fraction of files whose [min,max] could contain `point` — the
    fraction a footer-pruning scan must read."""
    hits = sum(1 for lo, hi in ranges.values() if lo <= point <= hi)
    return hits / len(ranges)


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Z-order clustering must give per-file min/max ranges tight enough
    that a point predicate on EITHER dimension prunes most files, while
    a naive (unsorted) layout leaves nearly every file a candidate.
    This is footer-statistics arithmetic, not a plan assertion — the
    same numbers drive Spark's parquet pruning and Delta data skipping."""
    from pyspark.sql import functions as F

    from designing_data_warehouse_in_sql_server_spark.sources.layout import (
        write_zordered,
    )
    from designing_data_warehouse_in_sql_server_spark.sources.parquet import load_table

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("datediff(o_orderdate, DATE '1992-01-01')").alias("epoch_days"),
    )
    naive = str(tmp_path / "naive")
    zord = str(tmp_path / "zorder")
    n_files = 16
    orders.repartition(n_files).write.mode("overwrite").parquet(naive)
    write_zordered(orders, zord, "o_custkey", "epoch_days", n_files)

    med = orders.selectExpr(
        "percentile_cont(0.5) WITHIN GROUP (ORDER BY o_custkey) AS c",
        "percentile_cont(0.5) WITHIN GROUP (ORDER BY epoch_days) AS d",
    ).first()
    probe_cust = int(med.c)  # mid-domain customer
    probe_day = int(med.d)  # mid-domain day

    for col, probe in (("o_custkey", probe_cust), ("epoch_days", probe_day)):
        naive_frac = _candidate_fraction(_file_ranges(naive, col), probe)
        z_frac = _candidate_fraction(_file_ranges(zord, col), probe)
        # naive round-robin layout: every file spans ~the full domain
        assert naive_frac >= 0.9, (col, naive_frac)
        # z-ordered: a point predicate must prune at least half the files
        assert z_frac <= 0.5, (col, z_frac)
        assert z_frac < naive_frac


def test_zordered_write_preserves_rows(spark, tmp_path):
    from designing_data_warehouse_in_sql_server_spark.sources.layout import (
        write_zordered,
    )
    from designing_data_warehouse_in_sql_server_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("datediff(o_orderdate, DATE '1992-01-01')").alias("epoch_days"),
    )
    out = str(tmp_path / "z")
    write_zordered(orders, out, "o_custkey", "epoch_days", 8)
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)


# ---------------------------------------------------------------------------
# Hilbert-curve key (round 8)
# ---------------------------------------------------------------------------
def _xy2d_ref(bits: int, x: int, y: int) -> int:
    """Independent pure-Python reference: the classic iterative xy->d
    transform from the public Hilbert-curve literature, written with
    bitwise ops (the engine version uses only div/%/CASE)."""
    n = 1 << bits
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def _hilbert_grid(spark, bits: int):
    """All (x, y, hkey) cells of the full 2^bits x 2^bits grid."""
    from pyspark.sql import functions as F

    from designing_data_warehouse_in_sql_server_spark.sources.layout import (
        with_hilbert_key,
    )

    n = 1 << bits
    cells = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x int, y int"
    )
    return with_hilbert_key(cells, F.col("x"), F.col("y"), "hkey", bits=bits).collect()


def test_hilbert_key_is_a_bijection_on_the_full_grid(spark):
    """Every cell of the 16x16 grid maps to a distinct key in
    [0, 256) — the curve visits each cell exactly once."""
    rows = _hilbert_grid(spark, bits=4)
    keys = sorted(r.hkey for r in rows)
    assert keys == list(range(256))


def test_hilbert_consecutive_keys_are_grid_adjacent(spark):
    """THE Hilbert property (and the one Morton lacks): consecutive
    curve positions are neighboring grid cells — |dx| + |dy| == 1 for
    every unit step, so a contiguous key range always covers a compact
    connected region. Morton's bit-interleave violates this at every
    power-of-two boundary (checked as the contrast)."""
    rows = _hilbert_grid(spark, bits=4)
    by_key = {r.hkey: (r.x, r.y) for r in rows}
    for d in range(255):
        (x0, y0), (x1, y1) = by_key[d], by_key[d + 1]
        assert abs(x1 - x0) + abs(y1 - y0) == 1, (d, (x0, y0), (x1, y1))
    # contrast: Morton order takes at least one non-adjacent jump
    from pyspark.sql import functions as F

    from designing_data_warehouse_in_sql_server_spark.sources.layout import morton_key

    n = 16
    cells = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x int, y int"
    )
    # scale 4-bit coords up to the 16-bit domain morton_key interleaves
    mrows = cells.select(
        "x", "y", morton_key(F.col("x") * 4096, F.col("y") * 4096).alias("mkey")
    ).collect()
    m_by_key = {r.mkey: (r.x, r.y) for r in mrows}
    mkeys = sorted(m_by_key)
    jumps = sum(
        1
        for a, b in zip(mkeys, mkeys[1:])
        if abs(m_by_key[b][0] - m_by_key[a][0])
        + abs(m_by_key[b][1] - m_by_key[a][1])
        > 1
    )
    assert jumps > 0


def test_hilbert_key_matches_bitwise_reference_at_16_bits(spark):
    """Engine key (div/%/CASE arithmetic) == classic bitwise reference
    on deterministic pseudo-random 16-bit points, including the domain
    corners."""
    from pyspark.sql import functions as F

    from designing_data_warehouse_in_sql_server_spark.sources.layout import (
        with_hilbert_key,
    )

    pts = [(0, 0), (65535, 65535), (0, 65535), (65535, 0), (32768, 32767)]
    seed = 1234567
    for _ in range(200):
        seed = (seed * 1103515245 + 12345) % (1 << 31)
        x = seed % 65536
        seed = (seed * 1103515245 + 12345) % (1 << 31)
        y = seed % 65536
        pts.append((x, y))
    df = spark.createDataFrame(pts, "x int, y int")
    got = with_hilbert_key(df, F.col("x"), F.col("y"), "hkey").collect()
    for r in got:
        assert r.hkey == _xy2d_ref(16, r.x, r.y), (r.x, r.y)


def test_hilbert_layout_prunes_both_dimensions(spark, tmp_path):
    """Same footer-statistics skipping check as the z-order twin: files
    range-partitioned on the Hilbert key carry per-file min/max ranges
    tight enough that a mid-domain point predicate on EITHER dimension
    prunes at least half the files."""
    from pyspark.sql import functions as F

    from designing_data_warehouse_in_sql_server_spark.sources.layout import (
        with_hilbert_key,
    )
    from designing_data_warehouse_in_sql_server_spark.sources.parquet import load_table

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("datediff(o_orderdate, DATE '1992-01-01')").alias("epoch_days"),
    )
    # rescale both dims to the full 16-bit range, as the z-order writer
    # does, so both contribute comparable key significance
    b = orders.agg(
        F.min("o_custkey").alias("clo"), F.max("o_custkey").alias("chi"),
        F.min("epoch_days").alias("dlo"), F.max("epoch_days").alias("dhi"),
    ).first()
    sx = ((F.col("o_custkey") - b.clo) * 65535 / max(b.chi - b.clo, 1)).cast("long")
    sy = ((F.col("epoch_days") - b.dlo) * 65535 / max(b.dhi - b.dlo, 1)).cast("long")
    hil = str(tmp_path / "hilbert")
    n_files = 16
    (
        with_hilbert_key(orders, sx, sy, "__hkey")
        .repartitionByRange(n_files, "__hkey")
        .sortWithinPartitions("__hkey")
        .drop("__hkey")
        .write.mode("overwrite")
        .parquet(hil)
    )
    med = orders.selectExpr(
        "percentile_cont(0.5) WITHIN GROUP (ORDER BY o_custkey) AS c",
        "percentile_cont(0.5) WITHIN GROUP (ORDER BY epoch_days) AS d",
    ).first()
    for col, probe in (("o_custkey", int(med.c)), ("epoch_days", int(med.d))):
        frac = _candidate_fraction(_file_ranges(hil, col), probe)
        assert frac <= 0.5, (col, frac)


def test_hilbert_beats_morton_on_2d_range_probes(spark, tmp_path):
    """The locality claim, measured: over a deterministic 5x5 grid of
    2-D range probes (each ~10% of each domain), the Hilbert layout
    must leave no MORE candidate files than Morton — and on this
    fixture it's ~30% fewer (0.15 vs 0.22 measured when pinned).
    Single-dimension pruning is comparable between the curves; compact
    2-D regions are where the unit-step property pays."""
    from pyspark.sql import functions as F

    from designing_data_warehouse_in_sql_server_spark.sources.layout import (
        hilbert_frame,
        zordered_frame,
    )
    from designing_data_warehouse_in_sql_server_spark.sources.parquet import load_table

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("datediff(o_orderdate, DATE '1992-01-01')").alias("epoch_days"),
    )
    b = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("epoch_days"), F.max("epoch_days")
    ).first()
    clo, chi, dlo, dhi = b

    def mean_fraction(frame_fn, path):
        (
            frame_fn(orders, "o_custkey", "epoch_days")
            .repartitionByRange(16, "__zkey")
            .sortWithinPartitions("__zkey")
            .drop("__zkey")
            .write.mode("overwrite")
            .parquet(path)
        )
        rc = _file_ranges(path, "o_custkey")
        rd = _file_ranges(path, "epoch_days")
        tot, n = 0.0, 0
        for i in range(5):
            for j in range(5):
                c0 = clo + (chi - clo) * (i * 2 + 1) // 12
                c1 = c0 + max((chi - clo) // 10, 1)
                d0 = dlo + (dhi - dlo) * (j * 2 + 1) // 12
                d1 = d0 + max((dhi - dlo) // 10, 1)
                hits = sum(
                    1
                    for f in rc
                    if rc[f][0] <= c1 and rc[f][1] >= c0
                    and rd[f][0] <= d1 and rd[f][1] >= d0
                )
                tot += hits / len(rc)
                n += 1
        return tot / n

    m = mean_fraction(zordered_frame, str(tmp_path / "m"))
    h = mean_fraction(hilbert_frame, str(tmp_path / "h"))
    assert h <= m, (h, m)
    assert h <= 0.25  # absolute bound: compact probes prune hard


def test_hilbert_oracle_sql_survives_high_custkeys(spark, tmp_path):
    """Regression (ADVICE r8): the DuckDB oracle's per-level offset
    ``1073741824 * quadrant`` was typed INT32 and overflowed for any row
    whose top-level quadrant is nonzero (o_custkey % 65536 >= 32768) —
    unreachable at sf<=0.01 but fatal at the scales the harness depends
    on. Pin oracle == Spark on custkeys straddling the 32768 boundary."""
    import duckdb
    from pyspark.sql import functions as F

    from designing_data_warehouse_in_sql_server_spark.plans.quality import (
        HILBERT_ORACLE,
    )
    from designing_data_warehouse_in_sql_server_spark.sources.layout import (
        with_hilbert_key,
    )

    rows = [
        (k, ck, f"1992-01-{1 + (ck % 28):02d}")
        for k, ck in enumerate(
            [1, 1500, 32767, 32768, 40000, 65535, 65536, 99999, 131071]
        )
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_orderdate string"
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    path = str(tmp_path / "orders_hi")
    df.write.parquet(path)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    oracle = dict(con.execute(HILBERT_ORACLE).fetchall())

    got = with_hilbert_key(
        df.select(
            "o_orderkey",
            "o_custkey",
            F.expr("datediff(o_orderdate, DATE '1992-01-01')").alias("epoch_days"),
        ),
        F.col("o_custkey"),
        F.col("epoch_days"),
        "hkey",
    ).collect()
    assert len(oracle) == len(rows)
    for r in got:
        assert oracle[r.o_orderkey] == r.hkey, (r.o_orderkey, r.hkey)
