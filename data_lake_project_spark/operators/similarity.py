"""Similarity search over embedding columns (north star).

Brute-force top-k cosine as the exact baseline, and an LSH-bucketed
variant as the 100 TB path.

Scale design: the probe side is always tiny (a handful of query
vectors) so the brute-force plan is ``broadcast(probes) x corpus`` —
a broadcast nested-loop whose cost is one corpus scan, embarrassingly
parallel, no shuffle except the final per-probe top-k (a
``TakeOrderedAndProject`` after repartition by probe). The LSH
variant buckets the corpus once (random-hyperplane signs) and probes
only matching buckets — corpus scan shrinks by ~2^bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_lake_project_spark.functions import pround, spread


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return dot / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe.

    Deterministic: ranks on ``(round(cosine, d) DESC, id)`` so ULP
    noise in float summation can never reorder the result.
    Output: (probe_id, vec_id, cosine) — cosine rounded.
    """
    c = spread(corpus).select(
        F.col(id_col), _as_double(vec_col).alias("__cv")
    ).withColumn("__cn", _norm(F.col("__cv")))
    p = probes.select(
        F.col(probe_id_col), _as_double(vec_col).alias("__pv")
    ).withColumn("__pn", _norm(F.col("__pv")))

    dot = F.aggregate(
        F.zip_with("__pv", "__cv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = pround(dot / (F.col("__pn") * F.col("__cn")), round_digits)

    joined = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col(probe_id_col) != F.col(id_col))
        .withColumn("cosine", sim)
    )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(probe_id_col, id_col, "cosine")
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH buckets.

    Hyperplanes are deterministic pseudo-random vectors derived from
    ``md5`` of (bit, dim) — reproducible across runs without an RNG.
    They are constants, so they are computed driver-side and embedded
    as literal arrays (a per-row md5 expression tree was ~8x slower).
    Probes search only their own bucket; recall grows with fewer bits
    or multi-probe (flip one bit) which is enabled here.
    """
    import hashlib

    dim = len(corpus.select(vec_col).first()[0])

    def plane(bit: int):
        # Deterministic +-1 hyperplane from md5 parity per dimension.
        vals = [
            1.0
            if int(hashlib.md5(f"{bit}:{d}".encode()).hexdigest()[:4], 16) % 2 == 0
            else -1.0
            for d in range(dim)
        ]
        return F.array(*[F.lit(v) for v in vals])

    def signature(vcol):
        bits_cols = []
        for i in range(bits):
            dot = F.aggregate(
                F.zip_with(vcol, plane(i), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits_cols.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)))
        out = F.lit(0)
        for i, b in enumerate(bits_cols):
            out = out + b * (2**i)
        return out

    c = spread(corpus).withColumn("__v", _as_double(vec_col)).withColumn(
        "__bucket", signature(F.col("__v"))
    )
    p = probes.withColumn("__v", _as_double(vec_col)).withColumn(
        "__bucket", signature(F.col("__v"))
    )
    # Multi-probe: each probe also visits buckets at Hamming distance 1.
    p = p.withColumn(
        "__bucket",
        F.explode(
            F.array_union(
                F.array(F.col("__bucket")),
                F.array(
                    *[
                        F.col("__bucket").bitwiseXOR(F.lit(2**i))
                        for i in range(bits)
                    ]
                ),
            )
        ),
    )

    joined = c.select(
        id_col, "__bucket", F.col("__v").alias("__cv")
    ).join(
        F.broadcast(
            p.select(probe_id_col, "__bucket", F.col("__v").alias("__pv"))
        ),
        "__bucket",
    )
    sim = pround(
        F.aggregate(
            F.zip_with("__pv", "__cv", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (_norm(F.col("__pv")) * _norm(F.col("__cv"))),
        4,
    )
    joined = joined.filter(F.col(probe_id_col) != F.col(id_col)).withColumn(
        "cosine", sim
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(probe_id_col, id_col, "cosine")
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Approximate top-k via an IVF coarse quantizer.

    Index: centroids are the vectors of the ``n_centroids`` lowest ids
    (deterministic seeding — no RNG, no training step; a k-means
    refinement is a drop-in upgrade that only changes the literals).
    Each corpus vector is assigned to its most-cosine-similar centroid
    (one narrow pass, centroids embedded as literal arrays). Probes
    search their ``nprobe`` closest centroid buckets, so the exact
    cosine runs against ~nprobe/n_centroids of the corpus.

    At 100 TB the assignment pass is a map-only scan; the bucket join
    shuffles the corpus once on bucket id (uniform when centroids are
    spread); per-probe state is the nprobe bucket list.
    """
    cents = [
        (r[0], [float(x) for x in r[1]])
        for r in corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_centroids)
        .collect()
    ]
    cnorms = [sum(x * x for x in v) ** 0.5 for _, v in cents]
    dim = len(cents[0][1])
    # ONE flat literal array of all centroid components (+ a norms
    # array) sliced per centroid inside transform() — a per-centroid
    # literal-array tree was ~n_centroids x bigger and dominated plan
    # compile time.
    flat = F.array(*[F.lit(x) for _, v in cents for x in v])
    norms = F.array(*[F.lit(n) for n in cnorms])

    def sims_array(vcol, vnorm):
        """Array of (cosine-to-centroid, centroid_idx) structs.

        ``vnorm`` must be a materialized column, not an inline
        ``_norm(vcol)`` expression — the lambda body is re-evaluated
        per centroid, which would recompute the self-dot-product
        ``n_centroids`` times per row.
        """
        return F.transform(
            F.sequence(F.lit(0), F.lit(len(cents) - 1)),
            lambda i: F.struct(
                (
                    F.aggregate(
                        F.zip_with(
                            vcol,
                            F.slice(flat, i * dim + 1, dim),
                            lambda a, b: a * b,
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    / (vnorm * F.element_at(norms, i + 1))
                ).alias("s"),
                i.cast("int").alias("i"),
            ),
        )

    c = (
        corpus.withColumn("__v", _as_double(vec_col))
        .withColumn("__nrm", _norm(F.col("__v")))
        .withColumn(
            "__bucket",
            F.element_at(
                F.reverse(F.array_sort(sims_array(F.col("__v"), F.col("__nrm")))), 1
            )["i"],
        )
    )
    p = (
        probes.withColumn("__v", _as_double(vec_col))
        .withColumn("__nrm", _norm(F.col("__v")))
        .withColumn(
            "__bucket",
            F.explode(
                F.transform(
                    F.slice(
                        F.reverse(
                            F.array_sort(sims_array(F.col("__v"), F.col("__nrm")))
                        ),
                        1,
                        nprobe,
                    ),
                    lambda s: s["i"],
                )
            ),
        )
    )

    joined = c.select(id_col, "__bucket", F.col("__v").alias("__cv")).join(
        F.broadcast(p.select(probe_id_col, "__bucket", F.col("__v").alias("__pv"))),
        "__bucket",
    )
    sim = pround(
        F.aggregate(
            F.zip_with("__pv", "__cv", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (_norm(F.col("__pv")) * _norm(F.col("__cv"))),
        4,
    )
    joined = joined.filter(F.col(probe_id_col) != F.col(id_col)).withColumn(
        "cosine", sim
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(probe_id_col, id_col, "cosine")
    )
