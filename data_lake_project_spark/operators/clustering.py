"""Distributed k-means over an embedding column (Lloyd's algorithm).

Unsupervised corpus clustering — the domain-discovery pass of a
training-data mixture (cluster the corpus, inspect/weight clusters,
feed cluster ids to ``dataset.temperature_sample``). Complements
``similarity.ivf_topk``: IVF trains its coarse quantizer on a bounded
driver-side sample (the FAISS recipe — good enough for routing);
this operator runs full-corpus Lloyd iterations so every vector
participates in the centroid update, the fidelity a mixture weighting
needs.

Reference parity: the reference has no clustering; this extends the
embedding family (SURVEY §2 similarity/dedup ops) with the standard
unsupervised step.

Scale shape (100 TB):
- Assignment is a map-only pass: centroids ship as a broadcast numpy
  matrix inside an Arrow-batched iterator UDF; each batch does ONE
  (batch × k) BLAS matmul. No shuffle, no Python per-row cost.
- The centroid update is fused into the assignment scan: each Arrow
  batch combines its rows into (cluster, pos, sum, n) partials inside
  the UDF (the map-side combine), the shuffle moves k*dim rows per
  batch, and the driver collects k*dim floats (bounded by model size,
  NOT data size — the treeAggregate shape MLlib uses).
- Iterations are driver-coordinated (k-means is inherently
  synchronous); each iteration is exactly one scan + one tiny shuffle.
- Determinism: seeds are the k lowest-id vectors, ties in assignment
  break to the lowest cluster id, empty clusters keep their previous
  centroid, and the partials merge accumulates in exact decimal —
  same corpus + same partitioning → bit-identical model, run over
  run. Across DIFFERENT partitionings (resized cluster) the
  per-batch float partials regroup and the centroid can move in the
  last ulp; pin the input layout if bit-reproducibility across
  topologies matters.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Assign each vector to its nearest-by-cosine centroid.

    Map-only: one Arrow-batched matmul per batch against the
    broadcast centroid matrix. Ties break to the lowest cluster id
    (argmax semantics), zero vectors go to cluster 0.
    """
    from data_lake_project_spark.functions import reserve_columns

    reserve_columns(df, "kmeans_assign", cluster_col)
    cu = _unit_rows(np.asarray(centroids, dtype=np.float64))
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(cluster_col, LongType()),
        ]
    )

    # closure must stay free of module globals (cloudpickle would pin a
    # worker-side import of this package; the driver seam runs from an
    # arbitrary cwd) — normalize inline.
    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            m = np.array([np.asarray(v, dtype=np.float64) for v in b[vec_col]])
            if m.dtype == object or m.ndim != 2 or m.shape[1] != cu.shape[1]:
                raise ValueError(
                    f"embedding width mismatch: centroids are "
                    f"{cu.shape[1]}-wide, batch vectors are not"
                )
            n = np.linalg.norm(m, axis=1, keepdims=True)
            n[n == 0] = 1.0
            sims = (m / n) @ cu.T
            yield pd.DataFrame(
                {
                    id_col: b[id_col].astype("int64"),
                    cluster_col: np.argmax(sims, axis=1).astype("int64"),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(assign, out_schema)


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Fit k cosine-kmeans centroids with full-corpus Lloyd steps.

    Seeds: vectors of the k lowest ids (bounded k-row collect).
    Per iteration: ONE fused scan — each Arrow batch assigns its rows
    (matmul vs the broadcast centroid matrix) and emits per-batch
    (cluster, pos, sum, n) partials, so the shuffle carries k*dim rows
    per batch, never the corpus; the collect is model-sized (k*dim).
    Empty clusters keep their previous centroid. Returns the (k, dim)
    centroid matrix.
    """
    seed_rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    if len(seed_rows) < k:
        raise ValueError(
            f"kmeans_fit: corpus has {len(seed_rows)} vectors, fewer than k={k}"
        )
    cents = np.array(
        [[float(x) for x in r[vec_col]] for r in seed_rows], dtype=np.float64
    )
    dim = cents.shape[1]
    from pyspark.sql.types import DoubleType, IntegerType

    part_schema = StructType(
        [
            StructField("cluster", LongType()),
            StructField("pos", IntegerType()),
            StructField("s", DoubleType()),
            StructField("n", LongType()),
        ]
    )
    for _ in range(max(0, iters)):
        cu = _unit_rows(cents)

        # Fused assign + partial centroid update: each Arrow batch does
        # the matmul AND combines its rows into per-(cluster, pos)
        # partial sums — the map-side combine — so the shuffle moves
        # k*dim rows per batch, never per-vector data. No join, no
        # posexplode of the corpus. (Closure stays module-global-free:
        # cu/dim are plain numpy/py values.)
        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for b in batches:
                if not len(b):
                    continue
                m = np.array(
                    [np.asarray(v, dtype=np.float64) for v in b[vec_col]]
                )
                if m.dtype == object or m.ndim != 2 or m.shape[1] != dim:
                    raise ValueError(
                        f"embedding width mismatch: seeds are {dim}-wide, "
                        f"batch vectors are not"
                    )
                nn = np.linalg.norm(m, axis=1, keepdims=True)
                nn[nn == 0] = 1.0
                a = np.argmax((m / nn) @ cu.T, axis=1)
                cl, ps, ss, ns = [], [], [], []
                for ci in np.unique(a):
                    members = m[a == ci]
                    sums = members.sum(axis=0)
                    cl.extend([int(ci)] * dim)
                    ps.extend(range(dim))
                    ss.extend(float(x) for x in sums)
                    ns.extend([len(members)] * dim)
                yield pd.DataFrame(
                    {"cluster": cl, "pos": ps, "s": ss, "n": ns}
                )

        # dec_sum: the partials merge must be order-independent (a
        # double F.sum would drift in the last ulp with shuffle fetch
        # order, making the fitted model vary run-to-run); decimal
        # accumulation pins run-over-run determinism on a fixed
        # partitioning. (Across DIFFERENT partitionings the per-batch
        # float partials themselves regroup — see docstring.)
        from data_lake_project_spark.functions import dec_sum

        sums = (
            df.select(vec_col)
            .mapInPandas(partials, part_schema)
            .groupBy("cluster", "pos")
            .agg(dec_sum(F.col("s"), 12).alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        nxt = cents.copy()
        acc = np.zeros((k, dim))
        cnt = np.zeros(k, dtype=np.int64)
        for r in sums:
            acc[r["cluster"], r["pos"]] = r["s"]
            cnt[r["cluster"]] = r["n"]
        for ci in range(k):
            if cnt[ci]:
                nxt[ci] = acc[ci] / cnt[ci]
        cents = nxt
    return cents


def kmeans_inertia(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Mean cosine distance (1 - similarity) of each vector to its
    assigned centroid — the convergence/quality probe. One map-only
    pass + a scalar agg. ``id_col`` is accepted for signature symmetry
    but not shipped through Arrow (only the vector column scans)."""
    from pyspark.sql.types import DoubleType

    cu = _unit_rows(np.asarray(centroids, dtype=np.float64))
    out_schema = StructType([StructField("d", DoubleType())])

    # module-global-free closure (see kmeans_assign note)
    def dist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            m = np.array([np.asarray(v, dtype=np.float64) for v in b[vec_col]])
            if m.dtype == object or m.ndim != 2 or m.shape[1] != cu.shape[1]:
                raise ValueError(
                    f"embedding width mismatch: centroids are "
                    f"{cu.shape[1]}-wide, batch vectors are not"
                )
            n = np.linalg.norm(m, axis=1, keepdims=True)
            n[n == 0] = 1.0
            sims = (m / n) @ cu.T
            yield pd.DataFrame({"d": 1.0 - sims.max(axis=1)})

    row = (
        df.select(vec_col)
        .mapInPandas(dist, out_schema)
        .agg(F.avg("d").alias("m"))
        .collect()[0]
    )
    return float(row["m"])
