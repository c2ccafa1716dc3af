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
