"""Layout-maintenance operators: compaction preserves data and fixes the
file count; date-partitioned writes prune at the directory level."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from com_danliris_service_etl_spark.operators.maintenance import (
    compact_small_files,
    fact_layout_stats,
    write_partitioned_fact,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_compact_small_files_roundtrip(spark, tmp_path):
    """A fact fragmented into many tiny files compacts to few files with
    identical contents."""
    target = str(tmp_path / "fact")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    li.repartition(64).write.parquet(target)  # simulate micro-batch litter
    assert fact_layout_stats(spark, target)["n_files"] == 64

    before_rows = li.count()
    report = compact_small_files(spark, target, target_file_bytes=64 * 1024 * 1024)
    assert report["before"]["n_files"] == 64
    assert report["after"]["n_files"] < 8
    assert report["after"]["total_bytes"] > 0

    after = spark.read.parquet(target)
    assert after.count() == before_rows
    # contents identical: anti-join both ways is empty
    cols = after.columns
    assert after.exceptAll(li.select(cols)).count() == 0
    assert li.select(cols).exceptAll(after).count() == 0


def test_partitioned_write_prunes_directories(spark, tmp_path):
    """A date filter on a date-partitioned fact must reach the scan as a
    partition filter — the physical plan reads one day, not the table."""
    target = str(tmp_path / "orders_by_day")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    write_partitioned_fact(orders, target, date_col="o_orderdate")

    one_day = orders.select(F.to_date("o_orderdate").alias("d")).first().d
    read = spark.read.parquet(target).filter(F.col("__p_date") == F.lit(one_day))
    plan = _plan(read)
    assert "PartitionFilters" in plan, plan
    assert "__p_date" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0], plan

    expected = orders.filter(F.to_date("o_orderdate") == F.lit(one_day)).count()
    assert read.count() == expected > 0


def test_zorder_layout_tightens_file_spans(spark, tmp_path):
    """Z-order clustering must shrink per-file min/max spans (the footer
    stats parquet row-group skipping uses) on BOTH clustering columns vs
    an unclustered round-robin layout of the same data."""
    import glob

    import pyarrow.parquet as pq

    from com_danliris_service_etl_spark.operators.maintenance import write_zordered

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "n_chars")
    plain_dir, z_dir = str(tmp_path / "plain"), str(tmp_path / "zorder")
    docs.repartition(8).write.parquet(plain_dir)
    write_zordered(docs, z_dir, "n_chars", "doc_id", n_files=8)

    def mean_span(path, col):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            los, his = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        los.append(c.statistics.min)
                        his.append(c.statistics.max)
            if los:
                spans.append(max(his) - min(los))
        assert spans, f"no stats for {col} under {path}"
        return sum(spans) / len(spans)

    # round-robin files each cover ~the full value range; z-ordered files
    # must be substantially tighter on BOTH dimensions
    for col in ("doc_id", "n_chars"):
        assert mean_span(z_dir, col) < 0.6 * mean_span(plain_dir, col), col

    # the rewrite is content-preserving
    z = spark.read.parquet(z_dir)
    assert z.count() == docs.count()
    assert z.exceptAll(docs).count() == 0 and docs.exceptAll(z).count() == 0
