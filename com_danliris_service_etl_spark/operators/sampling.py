"""Deterministic corpus sampling for training-data pipelines.

Random sampling (``sample()``/``TABLESAMPLE``) is nondeterministic across
engines, partitionings and reruns — useless for reproducible train/val/test
splits or auditable downsampling at 100 TB. Both operators here derive
their randomness from a content hash (md5 of the stable id), so:

- the assignment of any row is reproducible from the row alone (no global
  state, no seed plumbing, no shuffle for the split itself);
- re-running over a grown corpus never reassigns an existing row (stable
  splits under append — the property that matters for training);
- the DuckDB oracle computes the identical value, so the split is
  VERIFIED, not just documented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash_bucket(id_col: str, mod: int) -> F.Column:
    """Uniform bucket in [0, mod) from the first 8 md5 hex chars of the id
    rendered as a string — stable across engines and partitionings."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
    return (h.cast("long") % mod).alias("bucket")


def hash_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Train/val/test split by id-hash bucket (out of 100): rows never move
    between splits as the corpus grows, and the split needs no shuffle at
    all — it is a per-row projection pipelined into the scan."""
    bucket = _hash_bucket(id_col, 100)
    split = (
        F.when(F.col("bucket") < train_pct, "train")
        .when(F.col("bucket") < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return docs.select(id_col, bucket).withColumn("split", split)


def quota_per_group(
    docs: DataFrame,
    group_cols: tuple[str, ...] = ("lang", "source"),
    cap: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-group downsampling: keep at most ``cap`` rows per
    group, chosen by hash rank (not arrival order, which is partition-
    dependent). One shuffle on the group key — the quota is the standard
    lever against source/language domination in a mixed 100 TB corpus;
    skewed groups split by AQE since ranking is a window, and the hash
    ranking means the KEPT SET is stable under corpus growth except for
    genuine displacement by lower-hash newcomers."""
    from pyspark.sql import Window

    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*group_cols).orderBy(h, id_col)
    return (
        docs.select(id_col, *group_cols)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .select(id_col, *group_cols, F.col("__rk").alias("sample_rank"))
    )
