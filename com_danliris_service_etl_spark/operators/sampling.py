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


def mixture_sample(
    docs: DataFrame,
    rates: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    resolution: int = 1_000_000,
) -> DataFrame:
    """Corpus MIXING by per-group sampling rate — the standard lever for
    composing a training mixture ("web at 0.3, books at 1.0, code at
    0.8"): each row keeps iff its id-hash bucket (out of ``resolution``)
    falls below its group's rate. Deterministic Bernoulli-by-hash:

    - zero shuffle — the keep decision is a per-row projection pipelined
      into the scan (the rates table is a plain literal CASE; even as a
      joined table it would broadcast);
    - append-stable and engine-reproducible like every sampler here (the
      decision is a pure function of the id);
    - rates compose with reruns: raising a group's rate keeps a SUPERSET
      of the previously kept rows (the bucket threshold just moves up),
      which makes incremental mixture changes cheap to materialize.

    Rows whose group is absent from ``rates`` use ``default_rate``.
    Emits every row with its (bucket, rate, kept) verdict so audits can
    see the negative space; the pipeline filter is `kept`."""
    bucket = _hash_bucket(id_col, resolution)
    rate = None
    for g, r in sorted(rates.items()):
        cond = F.col(group_col) == g
        rate = F.when(cond, float(r)) if rate is None else rate.when(cond, float(r))
    rate = F.lit(float(default_rate)) if rate is None else rate.otherwise(float(default_rate))
    return docs.select(id_col, group_col, bucket, rate.alias("rate")).withColumn(
        "kept", F.col("bucket") < F.col("rate") * resolution
    )


def weighted_sample_per_group(
    docs: DataFrame,
    weight_col: str,
    group_cols: tuple[str, ...] = ("lang",),
    k: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement, per group —
    the corpus-mixing primitive (upweight high-quality or rare-domain
    documents) — via A-ES exponential keys: each row draws u ∈ (0,1)
    from its id hash and ranks by u^(1/w); the top-k per group is a
    weighted sample without replacement (Efraimidis-Spirakis). Same
    shape as `quota_per_group`: one shuffle on the group key, top-k via
    window — and because u comes from the id hash, the sample is
    reproducible across engines, partitionings, and reruns. The rank key
    is ROUNDED (12dp) with the id as tiebreak so libm pow() ulp
    differences across engines cannot flip ranks. Weights must be
    positive; rows with w <= 0 are excluded (a zero-weight row is never
    sampled)."""
    from pyspark.sql import Window

    # u in (0,1): first 8 md5 hex chars as uint32, +1 to avoid u=0
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967297.0)
    key = F.round(F.pow(u, F.lit(1.0) / F.col("weight").cast("double")), 12)
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__key").desc(), F.col(id_col)
    )
    return (
        docs.filter(F.col(weight_col) > 0)
        .select(id_col, *group_cols, F.col(weight_col).alias("weight"))
        .withColumn("__key", key)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .select(id_col, *group_cols, "weight", "sample_rank")
    )


def cluster_safe_split(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Leakage-safe train/val/test split: `hash_split` assigns DOCUMENTS
    independently, so two near-duplicates can land in train and test —
    the classic eval-leakage bug. Here the unit of assignment is the
    near-duplicate CLUSTER: connected components over the candidate-pair
    graph (`dedup.dedup_clusters`), then one md5-bucket split of the
    CLUSTER id — every member of a cluster lands in the same split by
    construction. Candidate pairs (LSH) are used UNVERIFIED on purpose:
    a false-positive edge only over-merges clusters, which keeps the
    split conservative (never leaks); verification only matters when a
    pair decides a DELETION.

    Output: (doc_id, cluster_id, bucket, split); singleton documents are
    their own cluster. Append-stability holds when new documents receive
    LARGER ids than existing ones (the normal ingest): the cluster id is
    the member MINIMUM, so a larger-id joiner inherits the cluster's
    existing label and split, and untouched clusters never move. A new
    doc with a SMALLER id than its cluster (backfills, id reuse) lowers
    the min label and re-buckets that whole cluster — unavoidable under
    any content-independent labeling; pin splits across such ingests by
    persisting the (cluster_id → split) map of the prior run.

    Scale shape: the cluster pass is the dedup pipeline's own (bounded
    LSH buckets → iterative min-label propagation, `dedup_clusters`'s
    docstring); the split itself adds one left join of docs onto the
    cluster map (cluster map ≈ only docs that HAVE a near-dup — usually
    a small fraction, broadcastable) and a per-row hash projection."""
    from com_danliris_service_etl_spark.operators.dedup import dedup_clusters

    cl = dedup_clusters(edges, id_a=a_col, id_b=b_col).select(
        F.col("doc_id").alias("__id"), F.col("cluster_id").alias("__cl")
    )
    # No cast on the singleton fallback: dedup_clusters preserves the id
    # type (string ids stay strings), and a lossy cast would NULL every
    # singleton's cluster id — silently dumping the un-clustered majority
    # of the corpus into one split.
    cluster = F.coalesce(F.col("__cl"), F.col(id_col))
    h = F.conv(F.substring(F.md5(cluster.cast("string")), 1, 8), 16, 10)
    bucket = (h.cast("long") % 100).alias("bucket")
    split = (
        F.when(F.col("bucket") < train_pct, "train")
        .when(F.col("bucket") < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return (
        docs.select(id_col)
        .join(cl, F.col(id_col) == F.col("__id"), "left")
        .select(F.col(id_col), cluster.alias("cluster_id"), bucket)
        .withColumn("split", split)
    )
