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
    impl: str = "expr",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe.

    Deterministic: ranks on ``(round(cosine, d) DESC, id)`` so ULP
    noise in float summation can never reorder the result.
    Output: (probe_id, vec_id, cosine) — cosine rounded.

    ``exclude_self`` drops corpus rows whose id EQUALS the probe id —
    correct when probes ARE corpus rows (q22's self-neighbor query),
    WRONG when probe ids live in an independent namespace that merely
    overlaps corpus ids (a query-id 3 must not hide document 3 —
    q145's hybrid retrieval). Explicit parameter by the round-5
    review rule: never bake one namespace's semantics into a shared
    serving path.

    ``impl='arrow'`` replaces the per-pair JVM lambda scoring with one
    X·Pᵀ BLAS matmul per corpus Arrow batch (``mapInPandas``; the
    probe matrix rides a broadcast) plus batch-local top-k, so the
    final shuffle carries ~(batches x probes x k) candidate rows
    instead of the full corpus x probes score stream. Same ranking
    contract; parity CI-pinned against 'expr'. This is the 100 TB
    shape for the exact baseline — scoring cost is one BLAS pass over
    the corpus, network cost is k rows per probe per batch.
    """
    if impl == "arrow":
        return _brute_force_topk_arrow(
            corpus,
            probes,
            k,
            id_col,
            vec_col,
            probe_id_col,
            round_digits,
            exclude_self,
        )
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

    joined = c.crossJoin(F.broadcast(p))
    if exclude_self:
        joined = joined.filter(F.col(probe_id_col) != F.col(id_col))
    joined = joined.withColumn("cosine", sim)
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(probe_id_col, id_col, "cosine")
    )


def knn_graph(
    vecs: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mutual: bool = True,
    round_digits: int = 4,
    impl: str = "expr",
    method: str = "exact",
    bits: int = 6,
    n_tables: int = 4,
    dim: int | None = None,
    max_corpus: int | None = 200_000,
    force: bool = False,
) -> DataFrame:
    """Exact k-nearest-neighbor graph over an embedding table —
    every vector probes the corpus it belongs to. With ``mutual``
    (the default) an edge survives only when EACH endpoint ranks the
    other inside its own top-k — the standard symmetrization that
    strips hub artifacts (a density hub sits in everyone's top-k;
    almost nobody sits in its). The mutual edge list is the building
    block for density-based diversity sampling and graph dedup: feed
    it to ``dedup.connected_components`` for similarity clusters.

    Output: (src, dst, cosine) with ``src < dst`` under ``mutual``
    (cosine is symmetric, so one undirected row per pair); the raw
    directed (src, dst, cosine) top-k edges otherwise.

    Scale: ``method='exact'`` is deliberately brute-force — correct
    baseline first (the q163-q166 recall-report pattern measures
    approximations AGAINST it). ``method='lsh'`` IS the corpus-scale
    shape shipped: candidates come from the deterministic md5-plane
    multi-table LSH buckets (``bits``/``n_tables``/``dim`` as in
    ``lsh_bucketed_topk``; each probe scans ~L*(bits+1)/2^bits of the
    corpus), and q183's report measures the graph-level recall the
    approximation costs. Either way the mutual semi-join and
    everything after are (N x k)-sized regardless of corpus width.
    The directed edge frame feeds two consumers (both join sides), so
    it is eagerly cut once.

    ``max_corpus``/``force``: the ``'exact'`` lane is O(n²) BY DESIGN
    (a certification baseline — the fuzzy_join ``max_block``
    contract applied to the one other deliberately-quadratic
    operator). Rather than silently accept a 10⁹-row corpus into an
    all-pairs cross-score, it fails fast (one tiny count job) when
    the corpus exceeds ``max_corpus`` rows; pass ``force=True`` (or
    ``max_corpus=None``) to run anyway. Production shapes at scale:
    ``method='lsh'`` here, per-IVF-bucket scoring, or serving the
    persisted maintained index (``operators/knn_index.py``).
    """
    if method == "exact" and max_corpus is not None and not force:
        n = vecs.count()
        if n > max_corpus:
            raise ValueError(
                f"knn_graph(method='exact'): corpus has {n} rows > "
                f"max_corpus={max_corpus} — the exact lane scores all "
                "O(n²) pairs and is a certification baseline, not a "
                "production path. Use method='lsh', per-IVF-bucket "
                "scoring, or the persisted knn_index; pass force=True "
                "to run the quadratic scan anyway."
            )
    probes = vecs.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col)
    )
    if method == "lsh":
        # the corpus-scale scorer: candidates come from the md5-
        # derived multi-table LSH buckets (each probe scans
        # ~L*(bits+1)/2^bits of the corpus), the same deterministic
        # planes q33/q166 pin — the graph-level recall vs 'exact' is
        # what q183's report measures
        directed = lsh_bucketed_topk(
            vecs,
            probes,
            k=k,
            bits=bits,
            n_tables=n_tables,
            dim=dim,
            id_col=id_col,
            vec_col=vec_col,
        )
    elif method == "exact":
        directed = brute_force_topk(
            vecs,
            probes,
            k=k,
            id_col=id_col,
            vec_col=vec_col,
            round_digits=round_digits,
            impl=impl,
            exclude_self=True,
        )
    else:
        raise ValueError(
            f"knn_graph: unknown method {method!r} (exact | lsh)"
        )
    edges = directed.select(
        F.col("probe_id").alias("src"),
        F.col(id_col).alias("dst"),
        "cosine",
    )
    if not mutual:
        return edges
    edges = edges.localCheckpoint(eager=True)
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return edges.join(rev, ["src", "dst"], "left_semi").filter(
        F.col("src") < F.col("dst")
    )


def _brute_force_topk_arrow(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    probe_id_col: str,
    round_digits: int,
    exclude_self: bool = True,
) -> DataFrame:
    """Arrow/BLAS twin of brute_force_topk (see its docstring).

    The probe side is tiny by contract (a handful of query vectors),
    so collecting it driver-side is the same bounded action the IVF
    trainer performs; it reaches executors as a broadcast numpy
    matrix, NOT a join side.
    """
    import numpy as np
    import pandas as pd

    # id types follow the inputs (string/int probe ids both work)
    pid_t = dict(probes.dtypes)[probe_id_col]
    cid_t = dict(corpus.dtypes)[id_col]
    out_schema = f"{probe_id_col} {pid_t}, {id_col} {cid_t}, cosine double"
    prows = probes.select(probe_id_col, vec_col).collect()
    if not prows:  # expr path returns empty here; match it
        return corpus.sparkSession.createDataFrame([], out_schema)
    pids = np.array([r[0] for r in prows])
    P = np.array([[float(x) for x in r[1]] for r in prows], dtype="float64")
    pn = np.linalg.norm(P, axis=1)
    pn[pn == 0] = 1.0
    scale = float(10**round_digits)
    bc = corpus.sparkSession.sparkContext.broadcast((pids, P, pn))

    def score(batches):
        bpids, bP, bpn = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            x = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            xn = np.linalg.norm(x, axis=1)
            xn[xn == 0] = 1.0
            sims = (x @ bP.T) / np.outer(xn, bpn)
            sims = np.floor(sims * scale + 0.5) / scale
            out_p, out_i, out_c = [], [], []
            for j in range(len(bpids)):
                col = sims[:, j]
                if exclude_self:
                    mask = ids != bpids[j]
                    cids, cc = ids[mask], col[mask]
                else:
                    cids, cc = ids, col
                # batch-local top-k under the GLOBAL ranking contract
                # (rounded cosine desc, id asc) — lexsort's last key
                # is primary
                order = np.lexsort((cids, -cc))[:k]
                out_p.extend([bpids[j]] * len(order))
                out_i.extend(cids[order])
                out_c.extend(cc[order])
            yield pd.DataFrame(
                {probe_id_col: out_p, id_col: out_i, "cosine": out_c}
            )

    cand = corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        score, schema=out_schema
    )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        cand.withColumn("__rk", F.row_number().over(w))
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
    dim: int | None = None,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH buckets.

    Hyperplanes are deterministic pseudo-random vectors derived from
    ``md5`` of (table, bit, dim) — reproducible across runs without an
    RNG. They are constants, so they are computed driver-side and
    embedded as literal arrays (a per-row md5 expression tree was ~8x
    slower). Probes search only their own bucket per table; recall
    grows along three standard axes, all exposed here:

    - fewer ``bits`` (bigger buckets),
    - multi-probe (each probe also visits Hamming-distance-1 buckets
      — always on),
    - more ``n_tables``: L independent hash tables whose candidate
      sets are unioned then deduped — the classic recall lever. The
      corpus is indexed once per table (an L-way explode, exactly the
      L-fold index space any multi-table LSH pays); expected scanned
      fraction is ~``L*(bits+1)/2^bits`` of the corpus.

    ``dim`` (embedding dimensionality) is REQUIRED: Spark array columns
    carry no length in the schema, so discovering it would cost a
    hidden ``.first()`` Spark job before the index pass. Callers know
    their embedding width — pass it.
    """
    import hashlib

    if dim is None:
        raise ValueError(
            "lsh_bucketed_topk requires dim (embedding width): array "
            "columns carry no length in the schema and probing for it "
            "would run an extra Spark job per call"
        )

    # ONE flat literal array of every hyperplane component, indexed by
    # (table*bits + bit)*dim, sliced inside the lambdas below — the
    # per-plane literal-array tree compiled n_tables*bits separate
    # zip_with/aggregate nodes and dominated plan compile time (same
    # lesson as the IVF centroid literals).
    def plane_val(table: int, bit: int, d: int) -> float:
        return (
            1.0
            if int(hashlib.md5(f"{table}:{bit}:{d}".encode()).hexdigest()[:4], 16) % 2
            == 0
            else -1.0
        )

    # F.lit(list) builds ONE ArrayType literal node — a CreateArray of
    # n_tables*bits*dim child literals made the plan (and codegen) big
    # enough to dominate cold runs.
    flat = F.lit(
        [
            plane_val(t, b, d)
            for t in range(n_tables)
            for b in range(bits)
            for d in range(dim)
        ]
    )

    def all_signatures(vcol):
        """array<int> of composite bucket ids, one per table.

        Bit i of table t is the sign of vcol . plane(t, i); bits fold
        MSB-first into an int via acc*2+bit. Composite id is
        (table << bits) | signature so the bucket join stays a single
        equi-key across all tables.
        """
        return F.transform(
            F.sequence(F.lit(0), F.lit(n_tables - 1)),
            lambda t: F.aggregate(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                F.lit(0),
                lambda acc, i: acc * 2
                + F.when(
                    F.aggregate(
                        F.zip_with(
                            vcol,
                            F.slice(flat, (t * bits + i) * dim + 1, dim),
                            lambda x, y: x * y,
                        ),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    )
                    >= 0,
                    F.lit(1),
                ).otherwise(F.lit(0)),
            )
            + t * (2**bits),
        )

    c = spread(corpus).withColumn("__v", _as_double(vec_col)).withColumn(
        "__bucket", F.explode(all_signatures(F.col("__v")))
    )
    p = probes.withColumn("__v", _as_double(vec_col)).withColumn(
        "__sigs", all_signatures(F.col("__v"))
    )
    # Multi-probe: each probe also visits buckets at Hamming distance 1
    # within every table. __sigs is a materialized column, so the XOR
    # flips below are integer ops on it — they never re-evaluate the
    # dot-product tree.
    probe_buckets = []
    for t in range(n_tables):
        sig = F.element_at("__sigs", t + 1)
        probe_buckets.append(F.array(sig))
        probe_buckets.append(
            F.array(*[sig.bitwiseXOR(F.lit(2**i)) for i in range(bits)])
        )
    all_buckets = probe_buckets[0]
    for b in probe_buckets[1:]:
        all_buckets = F.array_union(all_buckets, b)
    p = p.withColumn("__bucket", F.explode(all_buckets))

    # Norms are computed ONCE per side before the join and carried as
    # columns — recomputing _norm() inside the joined sim expression
    # would redo the self-dot-product once per (probe, candidate) pair.
    joined = c.withColumn("__cn", _norm(F.col("__v"))).select(
        id_col, "__bucket", F.col("__v").alias("__cv"), "__cn"
    ).join(
        F.broadcast(
            p.withColumn("__pn", _norm(F.col("__v"))).select(
                probe_id_col, "__bucket", F.col("__v").alias("__pv"), "__pn"
            )
        ),
        "__bucket",
    )
    sim = pround(
        F.aggregate(
            F.zip_with("__pv", "__cv", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (F.col("__pn") * F.col("__cn")),
        4,
    )
    joined = joined.filter(F.col(probe_id_col) != F.col(id_col)).withColumn(
        "cosine", sim
    )
    # A pair can match in several tables — dedupe before ranking.
    # (Cosine is identical for every copy of a pair, so any survivor
    # is fine; distinct-on-projection keeps it deterministic anyway.)
    joined = joined.select(probe_id_col, id_col, "cosine").distinct()
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
    lloyd_iters: int = 1,
    centroids: list | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF coarse quantizer.

    Index: seeds are the vectors of the ``n_centroids`` lowest ids,
    refined by ``lloyd_iters`` deterministic k-means steps over a
    fixed low-id sample (no RNG anywhere: same corpus → same
    centroids). Each corpus vector is assigned to its most-cosine-
    similar centroid (one narrow pass, centroids embedded as literal
    arrays). Probes search their ``nprobe`` closest centroid buckets,
    so the exact cosine runs against ~nprobe/n_centroids of the corpus.

    At 100 TB the assignment pass is a map-only scan; the bucket join
    shuffles the corpus once on bucket id (uniform when centroids are
    spread); per-probe state is the nprobe bucket list. The training
    sample is bounded (``sample_size`` rows collected to the driver,
    the standard IVF recipe — FAISS trains on a sample too).

    ``centroids`` (list of ``n_centroids`` equal-width float vectors)
    skips training entirely: NO Spark job runs before the index pass —
    the production path when a codebook already exists (train once,
    reuse per batch; the FAISS deployment shape).  ``dim``, when given,
    is validated against the centroid/sample width so a wrong-width
    codebook fails fast driver-side instead of mid-scan.
    """
    import numpy as np

    if centroids is not None:
        if len(centroids) != n_centroids:
            raise ValueError(
                f"ivf_topk: {len(centroids)} centroids supplied but "
                f"n_centroids={n_centroids}"
            )
        widths = {len(v) for v in centroids}
        if len(widths) != 1:
            raise ValueError(
                f"ivf_topk: ragged centroid widths {sorted(widths)}"
            )
        if dim is not None and widths != {dim}:
            raise ValueError(
                f"ivf_topk: centroid width {widths.pop()} != dim={dim}"
            )
        seeds = np.array([[float(x) for x in v] for v in centroids])
    else:
        sample_size = max(n_centroids * 32, 256)
        sample = np.array(
            [
                [float(x) for x in r[0]]
                for r in corpus.select(vec_col, id_col)
                .orderBy(id_col)
                .limit(sample_size)
                .collect()
            ]
        )
        if sample.size == 0:
            raise ValueError(
                "ivf_topk: corpus is empty — cannot train centroids "
                "(pass centroids= to search with an existing codebook)"
            )
        if sample.shape[0] < n_centroids:
            raise ValueError(
                f"ivf_topk: corpus has {sample.shape[0]} vectors, fewer "
                f"than n_centroids={n_centroids}"
            )
        if dim is not None and sample.shape[1] != dim:
            raise ValueError(
                f"ivf_topk: embedding width {sample.shape[1]} != dim={dim}"
            )
        # One (or more) Lloyd steps under cosine from lowest-id seeds:
        # assign sample rows to the nearest-by-cosine seed, replace each
        # seed with its cluster mean. Empty clusters keep their previous
        # centroid. Deterministic ties: argmax takes the lowest index.
        seeds = _train_cosine_centroids(
            sample, n_centroids, max(0, lloyd_iters)
        )
    cents_vals = [
        [float(x) for x in seeds[i]] for i in range(n_centroids)
    ]
    c = _ivf_assign(corpus, cents_vals, id_col, vec_col)
    return _ivf_search(
        c.select(id_col, "__bucket", "__v", "__nrm"),
        probes,
        cents_vals,
        nprobe,
        k,
        id_col,
        vec_col,
        probe_id_col,
        # inline contract (q22/q33/q37 family): probes ARE corpus
        # members under the same id namespace — self-matches excluded
        exclude_self=True,
    )


def pq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    m_subspaces: int = 16,
    n_codes: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    codebooks=None,
    dim: int | None = None,
    lloyd_iters: int = 8,
) -> DataFrame:
    """Approximate top-k via product quantization (ADC scan) — the
    memory-side ANN complement to IVF's bucket pruning: each UNIT
    corpus vector compresses to ``m_subspaces`` byte-sized codes
    (nearest per-subspace centroid), and probes score rows with
    ``m`` table lookups + adds instead of ``dim`` multiplies.
    At 100 TB the win is the index footprint: m bytes/vector instead
    of 4*dim, so the scan is bandwidth-, not FLOP-, bound.

    Training mirrors ``ivf_topk``: a bounded lowest-id sample (the
    FAISS recipe — codebooks train on a sample), per-subspace
    deterministic k-means (lowest-id seeds, one Lloyd step, lowest
    index on ties) — no RNG, same corpus → same codebooks. Pass
    ``codebooks`` (shape m x n_codes x dim/m) to skip training: zero
    pre-index Spark jobs, the train-once / encode-per-batch shape.

    Scoring: probe vectors are collected driver-side (bounded probe
    contract, as ``brute_force_topk``) into per-probe lookup tables
    LUT[s][c] = <probe_sub, codebook[s][c]>; the asymmetric-distance
    score sum_s LUT[s][code_s] approximates the cosine (both sides
    unit-normalized). Ranking: (round(score, 4) DESC, id) — same
    determinism contract as the exact baseline.

    Rows-only correctness (quantization error is the point); recall
    floor vs ``brute_force_topk`` is CI-pinned. Output:
    (probe_id, vec_id, score).
    """
    import numpy as np

    if codebooks is not None:
        try:
            cb = np.asarray(codebooks, dtype=float)
        except (ValueError, TypeError) as e:
            raise ValueError(
                f"pq_topk: codebooks is not a rectangular numeric "
                f"array: {e}"
            ) from e
        if cb.ndim != 3 or cb.shape[0] != m_subspaces or cb.shape[1] != n_codes:
            raise ValueError(
                f"pq_topk: codebooks shape {cb.shape} != "
                f"({m_subspaces}, {n_codes}, d/m)"
            )
        dsub = cb.shape[2]
        if dim is not None and dsub * m_subspaces != dim:
            raise ValueError(
                f"pq_topk: codebook width {dsub * m_subspaces} != dim={dim}"
            )
    else:
        sample_size = max(n_codes * 32, 256)
        sample = np.array(
            [
                [float(x) for x in r[0]]
                for r in corpus.select(vec_col, id_col)
                .orderBy(id_col)
                .limit(sample_size)
                .collect()
            ]
        )
        if sample.size == 0:
            raise ValueError(
                "pq_topk: corpus is empty — cannot train codebooks "
                "(pass codebooks= to search with an existing index)"
            )
        d = sample.shape[1]
        if dim is not None and d != dim:
            raise ValueError(f"pq_topk: embedding width {d} != dim={dim}")
        if d % m_subspaces != 0:
            raise ValueError(
                f"pq_topk: dim {d} not divisible by m_subspaces="
                f"{m_subspaces}"
            )
        if sample.shape[0] < n_codes:
            raise ValueError(
                f"pq_topk: corpus has {sample.shape[0]} vectors, fewer "
                f"than n_codes={n_codes}"
            )
        dsub = d // m_subspaces
        nrm = np.linalg.norm(sample, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        unit = sample / nrm
        cb = _train_pq_codebooks(
            unit, m_subspaces, n_codes, dsub, max(1, lloyd_iters)
        )

    encoded = _pq_encode(corpus, cb, None, id_col, vec_col)
    return _adc_search(
        encoded,
        probes,
        cb,
        k,
        m_subspaces,
        n_codes,
        dsub,
        id_col,
        probe_id_col,
        vec_col,
        ctx="pq_topk",
    )


def ivfpq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    m_subspaces: int = 16,
    n_codes: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    dim: int | None = None,
    lloyd_iters: int = 8,
    centroids: list | None = None,
    codebooks=None,
) -> DataFrame:
    """IVF + PQ composed — the production FAISS index shape: a coarse
    quantizer prunes the scan to ``nprobe``/``n_centroids`` of the
    corpus (IVF's win) and product-quantized codes make the surviving
    scan m-lookups-per-row cheap and m-bytes-per-row small (PQ's
    win). Against q129's full ADC scan, the bucket equi-join replaces
    the broadcast cross product: candidates = corpus x
    (nprobe/n_centroids), keyed on the bucket id.

    Training mirrors ``ivf_topk``/``pq_topk``: one bounded lowest-id
    sample collect trains BOTH the coarse centroids (cosine k-means)
    and the per-subspace codebooks (L2 k-means on unit vectors) —
    deterministic throughout, no RNG. One Arrow pass encodes each
    corpus vector to (bucket, codes). Probes resolve their nprobe
    buckets and lookup tables driver-side (bounded probe contract)
    and meet the corpus in a broadcast equi-join on the bucket key.

    Rows-only correctness; recall floor CI-pinned. Output:
    (probe_id, vec_id, score) — ADC approximate cosine, ranked
    (round(score, 4) DESC, id).

    ``centroids`` (n_centroids x dim) and ``codebooks``
    (m_subspaces x n_codes x dim/m) skip training entirely — the
    train-once / encode-per-batch production shape ``ivf_topk`` and
    ``pq_topk`` already expose (zero pre-index Spark jobs). Supply
    BOTH or NEITHER: a half-injected index (fresh centroids against a
    stale codebook or vice versa) silently mixes two quantizers.
    """
    import numpy as np

    if (centroids is None) != (codebooks is None):
        raise ValueError(
            "ivfpq_topk: supply both centroids and codebooks, or "
            "neither — a half-injected index mixes two quantizers"
        )
    if centroids is not None:
        if len(centroids) != n_centroids:
            raise ValueError(
                f"ivfpq_topk: {len(centroids)} centroids supplied but "
                f"n_centroids={n_centroids}"
            )
        widths = {len(v) for v in centroids}
        if len(widths) != 1:
            raise ValueError(
                f"ivfpq_topk: ragged centroid widths {sorted(widths)}"
            )
        seeds = np.array([[float(x) for x in v] for v in centroids])
        try:
            cb = np.asarray(codebooks, dtype=float)
        except (ValueError, TypeError) as e:
            raise ValueError(
                f"ivfpq_topk: codebooks is not a rectangular numeric "
                f"array: {e}"
            ) from e
        if cb.ndim != 3 or cb.shape[0] != m_subspaces or cb.shape[1] != n_codes:
            raise ValueError(
                f"ivfpq_topk: codebooks shape {cb.shape} != "
                f"({m_subspaces}, {n_codes}, d/m)"
            )
        d = seeds.shape[1]
        if dim is not None and d != dim:
            raise ValueError(
                f"ivfpq_topk: centroid width {d} != dim={dim}"
            )
        if cb.shape[2] * m_subspaces != d:
            raise ValueError(
                f"ivfpq_topk: codebook width {cb.shape[2] * m_subspaces}"
                f" != centroid width {d}"
            )
        dsub = d // m_subspaces
        cn = np.linalg.norm(seeds, axis=1, keepdims=True)
        cn[cn == 0] = 1.0
        cent_unit = seeds / cn
        encoded = _pq_encode(corpus, cb, cent_unit, id_col, vec_col)
        return _adc_search(
            encoded,
            probes,
            cb,
            k,
            m_subspaces,
            n_codes,
            dsub,
            id_col,
            probe_id_col,
            vec_col,
            ctx="ivfpq_topk",
            cent_unit=cent_unit,
            nprobe=nprobe,
        )

    sample_size = max(n_codes * 32, n_centroids * 32, 256)
    sample = np.array(
        [
            [float(x) for x in r[0]]
            for r in corpus.select(vec_col, id_col)
            .orderBy(id_col)
            .limit(sample_size)
            .collect()
        ]
    )
    if sample.size == 0:
        raise ValueError("ivfpq_topk: corpus is empty")
    d = sample.shape[1]
    if dim is not None and d != dim:
        raise ValueError(f"ivfpq_topk: embedding width {d} != dim={dim}")
    if d % m_subspaces != 0:
        raise ValueError(
            f"ivfpq_topk: dim {d} not divisible by m_subspaces="
            f"{m_subspaces}"
        )
    if sample.shape[0] < max(n_codes, n_centroids):
        raise ValueError(
            f"ivfpq_topk: sample of {sample.shape[0]} vectors is "
            f"smaller than the codebook/centroid count"
        )
    dsub = d // m_subspaces
    nrm = np.linalg.norm(sample, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    unit = sample / nrm

    # coarse centroids: cosine k-means, lowest-id seeds (ivf recipe)
    seeds = _train_cosine_centroids(
        sample, n_centroids, max(1, lloyd_iters)
    )
    cn = np.linalg.norm(seeds, axis=1, keepdims=True)
    cn[cn == 0] = 1.0
    cent_unit = seeds / cn

    # per-subspace codebooks on unit vectors (pq recipe)
    cb = _train_pq_codebooks(
        unit, m_subspaces, n_codes, dsub, max(1, lloyd_iters)
    )

    encoded = _pq_encode(corpus, cb, cent_unit, id_col, vec_col)
    return _adc_search(
        encoded,
        probes,
        cb,
        k,
        m_subspaces,
        n_codes,
        dsub,
        id_col,
        probe_id_col,
        vec_col,
        ctx="ivfpq_topk",
        cent_unit=cent_unit,
        nprobe=nprobe,
    )


# ---------------------------------------------------------------------------
# Shared ANN internals: deterministic trainers + encode/search stages.
#
# The one-shot operators above (ivf_topk / pq_topk / ivfpq_topk) and the
# persisted-index API (operators.ann_index.build_ann_index /
# search_ann_index) compose the SAME stage functions, so a saved index
# searches identically to the inline path — the round-trip equivalence is
# CI-pinned, not hoped for.
# ---------------------------------------------------------------------------


def _train_cosine_centroids(sample, n_centroids, iters):
    """Deterministic cosine k-means over a bounded driver-side sample:
    lowest-id seeds, ``iters`` Lloyd steps (assign by max cosine,
    lowest index on ties; empty clusters keep their seed). No RNG —
    same sample → same centroids. Returns raw-space (n, dim) seeds."""
    import numpy as np

    snorm = np.linalg.norm(sample, axis=1, keepdims=True)
    snorm[snorm == 0] = 1.0
    sunit = sample / snorm
    seeds = sample[:n_centroids].copy()
    for _ in range(iters):
        cn = np.linalg.norm(seeds, axis=1, keepdims=True)
        cn[cn == 0] = 1.0
        assign = np.argmax(sunit @ (seeds / cn).T, axis=1)
        for ci in range(n_centroids):
            members = sample[assign == ci]
            if len(members):
                seeds[ci] = members.mean(axis=0)
    return seeds


def _train_pq_codebooks(unit, m_subspaces, n_codes, dsub, iters):
    """Deterministic per-subspace L2 k-means on UNIT vectors (the PQ
    recipe): lowest-id seeds, argmin assignment (lowest index on
    ties), empty clusters keep seeds. Returns (m, n_codes, dsub)."""
    import numpy as np

    cb = np.empty((m_subspaces, n_codes, dsub))
    for s in range(m_subspaces):
        sub = unit[:, s * dsub : (s + 1) * dsub]
        seeds = sub[:n_codes].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - seeds[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(n_codes):
                members = sub[assign == c]
                if len(members):
                    seeds[c] = members.mean(axis=0)
        cb[s] = seeds
    return cb


def _pq_encode(corpus, cb, cent_unit, id_col, vec_col):
    """One Arrow pass encoding each corpus vector to its PQ codes
    (and, when ``cent_unit`` is given, its IVF coarse bucket):
    unit-normalize, per-subspace argmin against the codebook — one
    vectorized distance matrix per (batch, subspace); a JVM
    expression tree here would carry m*n_codes nested aggregates and
    its eval cost explodes with the codebook (measured minutes vs
    seconds at m=16). Closure captures ONLY plain lists (no module
    globals), so the vanilla-session seam survives executor
    pickling."""
    cb_list = [[[float(x) for x in code] for code in sub] for sub in cb]
    cent_list = (
        None
        if cent_unit is None
        else [[float(x) for x in v] for v in cent_unit]
    )
    m_ = len(cb_list)
    dsub_ = len(cb_list[0][0])
    id_type = dict(corpus.dtypes)[id_col]
    vec_name = vec_col
    with_bucket = cent_list is not None

    def encode(batches):
        import numpy as _np
        import pandas as _pd

        cbs = _np.array(cb_list)
        cents = _np.array(cent_list) if with_bucket else None
        for pdf in batches:
            if not len(pdf):
                continue
            V = _np.array(
                [_np.asarray(v, dtype=float) for v in pdf[vec_name]]
            )
            # An injected codebook narrower than the corpus would
            # otherwise slice the first m*dsub dims and SILENTLY drop
            # the rest — wrong top-k with no error (the trained paths
            # can't hit this: the sample width IS the corpus width).
            if V.shape[1] != m_ * dsub_:
                raise ValueError(
                    f"_pq_encode: corpus vectors are {V.shape[1]}-wide "
                    f"but the codebook covers {m_ * dsub_} dims"
                )
            nrm = _np.linalg.norm(V, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            U = V / nrm
            out = _np.empty((len(U), m_), dtype=_np.int32)
            for s in range(m_):
                sub = U[:, s * dsub_ : (s + 1) * dsub_]
                d2 = ((sub[:, None, :] - cbs[s][None, :, :]) ** 2).sum(
                    axis=2
                )
                out[:, s] = _np.argmin(d2, axis=1)
            data = {"__id": pdf[id_col].values}
            if with_bucket:
                data["__bucket"] = _np.argmax(
                    U @ cents.T, axis=1
                ).astype(_np.int32)
            data["__codes"] = out.tolist()
            yield _pd.DataFrame(data)

    schema = (
        f"__id {id_type}, "
        + ("__bucket int, " if with_bucket else "")
        + "__codes array<int>"
    )
    return (
        corpus.select(id_col, vec_col)
        .mapInPandas(encode, schema)
        .withColumnRenamed("__id", id_col)
    )


def _adc_search(
    encoded,
    probes,
    cb,
    k,
    m_subspaces,
    n_codes,
    dsub,
    id_col,
    probe_id_col,
    vec_col,
    ctx,
    cent_unit=None,
    nprobe=None,
):
    """ADC scoring over an encoded corpus: per-probe lookup tables
    LUT[s][c] = <probe_sub, codebook[s][c]> built driver-side
    (bounded probe contract), shipped as a broadcast frame; the score
    sum_s LUT[s][code_s] runs as a JVM ``aggregate`` over the codes
    column. With ``cent_unit`` the probes resolve their ``nprobe``
    coarse buckets and meet the corpus in a bucket equi-join (IVF+PQ);
    without it every probe scans all codes via a broadcast cross
    product (plain PQ). Ranking: (round(score, 4) DESC, id)."""
    import numpy as np

    probe_rows = probes.select(probe_id_col, vec_col).orderBy(
        probe_id_col
    ).collect()
    if not probe_rows:
        raise ValueError(f"{ctx}: probe set is empty")
    bucketed = cent_unit is not None
    rows = []
    for r in probe_rows:
        p = np.array([float(x) for x in r[1]])
        if p.shape[0] != m_subspaces * dsub:
            # same silent-truncation class as the corpus check in
            # _pq_encode: the LUT slices below would ignore trailing
            # dims of a wider probe
            raise ValueError(
                f"{ctx}: probe {r[0]!r} is {p.shape[0]}-wide but the "
                f"codebook covers {m_subspaces * dsub} dims"
            )
        n_ = np.linalg.norm(p)
        p = p / (n_ if n_ > 0 else 1.0)
        lut = [
            float(p[s * dsub : (s + 1) * dsub] @ cb[s][c])
            for s in range(m_subspaces)
            for c in range(n_codes)
        ]
        if bucketed:
            order = np.argsort(-(cent_unit @ p))
            rows.append((r[0], [int(b) for b in order[:nprobe]], lut))
        else:
            rows.append((r[0], lut))
    # probe-id type follows the input (string/int probe ids both work).
    # Bucketed: ONE row per probe with its bucket LIST, exploded
    # JVM-side — shipping the (m*n_codes)-double LUT once per probe
    # instead of once per probed bucket (nprobe x smaller driver
    # payload; external review finding, round 5).
    pid_t = dict(probes.dtypes)[probe_id_col]
    if bucketed:
        lut_df = probes.sparkSession.createDataFrame(
            rows,
            f"{probe_id_col} {pid_t}, __buckets array<int>, "
            "__lut array<double>",
        ).select(
            probe_id_col,
            F.explode("__buckets").alias("__bucket"),
            "__lut",
        )
    else:
        lut_df = probes.sparkSession.createDataFrame(
            rows, f"{probe_id_col} {pid_t}, __lut array<double>"
        )
    if bucketed:
        # The probed buckets are known driver-side, so prune the
        # corpus with a STATIC In-filter before the join: on a
        # bucket-partitioned persisted codes table (ann_index) this
        # becomes compile-time PARTITION PRUNING — the scan reads only
        # the nprobe probed buckets' directories; inline it's a cheap
        # narrowing filter the equi-join implied anyway. (Broadcast
        # DPP doesn't fire here: the build side is an unfiltered local
        # relation, which fails Spark's selective-predicate heuristic.)
        encoded = encoded.filter(
            F.col("__bucket").isin(
                sorted({b for r in rows for b in r[1]})
            )
        )
    score = F.aggregate(
        F.sequence(F.lit(0), F.lit(m_subspaces - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.col("__lut"),
            s * n_codes + F.element_at(F.col("__codes"), s + 1) + 1,
        ),
    )
    if bucketed:
        scored = encoded.join(F.broadcast(lut_df), "__bucket").select(
            probe_id_col, id_col, pround(score, 4).alias("score")
        )
    else:
        scored = encoded.crossJoin(F.broadcast(lut_df)).select(
            probe_id_col, id_col, pround(score, 4).alias("score")
        )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _centroid_sims_factory(cents_vals):
    """Literal-expression factory for IVF centroid scoring: ONE flat
    literal array of all centroid components (+ a norms array) sliced
    per centroid inside transform() — a per-centroid literal-array
    tree was ~n_centroids x bigger and dominated plan compile time.
    ``F.lit(list)`` keeps it a single ArrayType literal node rather
    than a CreateArray with n_centroids*dim children."""
    cnorms = [sum(x * x for x in v) ** 0.5 for v in cents_vals]
    dim = len(cents_vals[0])
    n_cents = len(cents_vals)
    flat = F.lit([x for v in cents_vals for x in v])
    norms = F.lit(list(cnorms))

    def sims_array(vcol, vnorm):
        """Array of (cosine-to-centroid, centroid_idx) structs.

        ``vnorm`` must be a materialized column, not an inline
        ``_norm(vcol)`` expression — the lambda body is re-evaluated
        per centroid, which would recompute the self-dot-product
        ``n_centroids`` times per row.
        """
        return F.transform(
            F.sequence(F.lit(0), F.lit(n_cents - 1)),
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

    return sims_array


def _ivf_assign(corpus, cents_vals, id_col, vec_col):
    """IVF index pass: append ``__v`` (double vector), ``__nrm`` and
    ``__bucket`` (nearest-by-cosine centroid) to the corpus — one
    map-only scan with the centroids embedded as literal arrays."""
    sims_array = _centroid_sims_factory(cents_vals)
    return (
        corpus.withColumn("__v", _as_double(vec_col))
        .withColumn("__nrm", _norm(F.col("__v")))
        .withColumn(
            # coalesce with a non-null literal makes the column
            # NON-NULLABLE (element_at alone is nullable), so the
            # bucket equi-join does NOT infer an isnotnull(__bucket)
            # filter — which would clone this whole centroid-scoring
            # tree into a scan-side Filter and evaluate it twice per
            # row (audit_plans.py caught a 23k-char Condition).
            # Semantically a no-op: the centroid array is a constant,
            # element_at(.., 1) on it never returns NULL.
            "__bucket",
            F.coalesce(
                F.element_at(
                    F.reverse(
                        F.array_sort(
                            sims_array(F.col("__v"), F.col("__nrm"))
                        )
                    ),
                    1,
                )["i"],
                F.lit(0),
            ),
        )
    )


def _ivf_search(
    codes,
    probes,
    cents_vals,
    nprobe,
    k,
    id_col,
    vec_col,
    probe_id_col,
    prune_scan: bool = False,
    exclude_self: bool = False,
):
    """Exact-cosine search over an IVF-assigned corpus: probes resolve
    their ``nprobe`` closest centroid buckets (same literal-expression
    scoring as the index pass, so tie behavior matches), broadcast
    into a bucket equi-join, exact cosine over the surviving
    candidates. ``codes`` carries (id, __bucket, __v, __nrm) — the
    norms computed ONCE at index time ride along instead of being
    recomputed per joined pair.

    ``exclude_self``: drop rows where probe id == corpus id — correct
    ONLY when probes are drawn from the corpus under the SAME id
    namespace (the inline ``ivf_topk`` contract, q37). A serving path
    whose probe ids live in a different namespace (q143 packs chunk
    ids; query ids 1..3 collide with real chunk ids) must leave this
    OFF or colliding ids silently drop legitimate corpus rows — and a
    string-probe-id vs bigint-corpus-id comparison would raise under
    ANSI. The PQ/IVFPQ lanes never had an implicit self-filter; False
    here makes the kinds consistent.

    ``prune_scan``: collect the probes' resolved buckets (one tiny
    bounded job — probes are a handful by contract) and pre-filter
    ``codes`` with a static In — on a bucket-partitioned persisted
    codes table this is compile-time partition pruning. Off for the
    inline one-shot (codes are computed, not scanned; the filter
    would only re-evaluate the assignment expression)."""
    sims_array = _centroid_sims_factory(cents_vals)
    p = (
        probes.withColumn("__v", _as_double(vec_col))
        .withColumn("__nrm", _norm(F.col("__v")))
        .withColumn(
            "__bucket",
            F.explode(
                F.transform(
                    F.slice(
                        F.reverse(
                            F.array_sort(
                                sims_array(F.col("__v"), F.col("__nrm"))
                            )
                        ),
                        1,
                        nprobe,
                    ),
                    lambda s: s["i"],
                )
            ),
        )
    )
    if prune_scan:
        probed = sorted(
            r["__bucket"]
            for r in p.select("__bucket").distinct().collect()
        )
        codes = codes.filter(F.col("__bucket").isin(probed))
    joined = codes.select(
        id_col,
        "__bucket",
        F.col("__v").alias("__cv"),
        F.col("__nrm").alias("__cn"),
    ).join(
        F.broadcast(
            p.select(
                probe_id_col,
                "__bucket",
                F.col("__v").alias("__pv"),
                F.col("__nrm").alias("__pn"),
            )
        ),
        "__bucket",
    )
    sim = pround(
        F.aggregate(
            F.zip_with("__pv", "__cv", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (F.col("__pn") * F.col("__cn")),
        4,
    )
    if exclude_self:
        joined = joined.filter(F.col(probe_id_col) != F.col(id_col))
    joined = joined.withColumn("cosine", sim)
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(probe_id_col, id_col, "cosine")
    )


# ---------------------------------------------------------------------------
# Scalar (int8) quantization — the OTHER standard embedding
# compression next to PQ (q129): one uint8 code PER DIMENSION from a
# global per-dim min/max affine map. 4x smaller storage than fp32
# at far lower distortion than PQ's codebook quantization. Scoring
# runs on DEQUANTIZED codes (the FAISS SQ8 decode) — and unlike the
# PQ/IVF lanes every step (quantize, decode, dot, norm, divide,
# sqrt) is a correctly-rounded IEEE op on identical operands in any
# engine, so sq_topk is oracle-hashable: the only ANN-family lane
# with a hard DuckDB differential rather than a recall floor.
# ---------------------------------------------------------------------------


def sq_stats(
    corpus: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> tuple[list[float], list[float]]:
    """Global per-dimension (min, max) in ONE partial-aggregated pass
    with no explode: 2*dim scalar aggregates, a 1-row result. The
    collect is model-sized (2*dim doubles) — same class as an IVF
    codebook."""
    v = _as_double(vec_col)
    row = corpus.agg(
        *[F.min(F.element_at(v, i + 1)).alias(f"mn{i}") for i in range(dim)],
        *[F.max(F.element_at(v, i + 1)).alias(f"mx{i}") for i in range(dim)],
    ).collect()[0]
    mins = [row[f"mn{i}"] for i in range(dim)]
    maxs = [row[f"mx{i}"] for i in range(dim)]
    return mins, maxs


def _sq_codes(vec_col: str, mins: list[float], maxs: list[float]):
    """int8 code array: least(255, floor((x-mn)*255/(mx-mn))) - 128,
    stored as TINYINT so the encoded table is literally one byte per
    dimension (the 4x over fp32). floor of the same IEEE quotient is
    engine-portable (identical operands, identical op order — the
    toolbox rule); constant dims code to -128 (level 0)."""
    mn_arr = F.array(*[F.lit(float(m)) for m in mins])
    mx_arr = F.array(*[F.lit(float(m)) for m in maxs])
    return F.transform(
        _as_double(vec_col),
        lambda x, i: (
            F.when(
                F.element_at(mx_arr, i + 1) == F.element_at(mn_arr, i + 1),
                F.lit(0).cast("long"),
            )
            .otherwise(
                # clamp the DOUBLE before floor (floor's long cast —
                # and any later narrowing — would throw under ANSI on
                # an extreme-drift dimension folded under a tiny
                # trained range, instead of clamping as documented).
                # For in-envelope values this is op-for-op identical
                # to the oracle's floor-then-clamp on BIGINT.
                F.floor(
                    F.least(
                        F.lit(255.0),
                        F.greatest(
                            F.lit(0.0),
                            (x - F.element_at(mn_arr, i + 1))
                            * F.lit(255.0)
                            / (
                                F.element_at(mx_arr, i + 1)
                                - F.element_at(mn_arr, i + 1)
                            ),
                        ),
                    )
                )
            )
            - F.lit(128)
        ).cast("tinyint"),
    )


def sq_encode(
    corpus: DataFrame,
    mins: list[float],
    maxs: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors to (id, codes array<tinyint>) under fixed
    stats — a narrow map, no shuffle; this is the persisted
    4x-compressed serving table (one byte per dimension)."""
    return corpus.select(
        F.col(id_col), _sq_codes(vec_col, mins, maxs).alias("codes")
    )


def _sq_reconstruct(codes_col, mins: list[float], maxs: list[float]):
    """Dequantize a code array: x̂_i = mn_i + level_i * step_i with
    level_i = code_i + 128 (undo the tinyint shift) and step_i =
    (mx_i - mn_i) / 255 — the FAISS SQ8 decode. The integer un-shift
    is exact, and every float op is a correctly-rounded IEEE double
    op on identical operands, so any engine reconstructs
    bit-identical values (an oracle can use the unshifted 0..255
    levels directly)."""
    mn_arr = F.array(*[F.lit(float(m)) for m in mins])
    step_arr = F.array(
        *[
            F.lit((float(mx) - float(mn)) / 255.0)
            for mn, mx in zip(mins, maxs)
        ]
    )
    return F.transform(
        codes_col,
        lambda c, i: F.element_at(mn_arr, i + 1)
        + (c.cast("int") + F.lit(128)).cast("double")
        * F.element_at(step_arr, i + 1),
    )


def sq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    stats: tuple[list[float], list[float]] | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k cosine over DEQUANTIZED int8 codes: both sides are
    encoded with the corpus stats, reconstructed (`_sq_reconstruct`),
    and ranked on ``pround(cosine, 4)`` with an id tie-break — the
    q22 broadcast-probe shape, but the corpus scan reads 4x fewer
    bytes. Scoring on reconstructions (not raw integer dots) is what
    keeps the ranking faithful to cosine: an affine-shifted integer
    dot picks up per-vector bias terms that do not cancel, and its
    ordering is garbage for anisotropic embeddings (measured: 0.06
    recall@10 on the fixture vs 1.00 for this design). Deterministic
    AND oracle-hashable: quantization floor/least/greatest, decode
    mul/add, dot/norm folds, divide and sqrt are all correctly-rounded
    IEEE ops on identical operands in any engine.

    Output: (probe_id, vec_id, qcosine).
    """
    mins, maxs = stats if stats is not None else sq_stats(corpus, vec_col, dim)
    return _sq_search(
        sq_encode(corpus, mins, maxs, id_col, vec_col),
        sq_encode(probes, mins, maxs, probe_id_col, vec_col),
        mins,
        maxs,
        k,
        id_col,
        probe_id_col,
        exclude_self,
    )


def _sq_search(
    codes: DataFrame,
    probe_codes: DataFrame,
    mins: list[float],
    maxs: list[float],
    k: int,
    id_col: str,
    probe_id_col: str,
    exclude_self: bool,
) -> DataFrame:
    """THE scoring path for both the inline (``sq_topk``) and
    persisted (``sq_index.search_sq_index``) int8 lanes — q157 ==
    q155 holds by construction only because both call this one body
    (the ``search_bm25_index``/``_ivf_search`` single-path
    convention). Inputs are (id, codes array<tinyint>) frames encoded
    under the SAME stats."""
    c = (
        spread(codes)
        .withColumn("__cv", _sq_reconstruct(F.col("codes"), mins, maxs))
        .drop("codes")
        .withColumn("__cn", _norm(F.col("__cv")))
    )
    p = (
        probe_codes.withColumn(
            "__pv", _sq_reconstruct(F.col("codes"), mins, maxs)
        )
        .drop("codes")
        .withColumn("__pn", _norm(F.col("__pv")))
    )
    joined = c.crossJoin(F.broadcast(p))
    if exclude_self:
        joined = joined.filter(F.col(probe_id_col) != F.col(id_col))
    dot = F.aggregate(
        F.zip_with("__pv", "__cv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = pround(dot / (F.col("__pn") * F.col("__cn")), 4)
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("qcosine").desc(), F.col(id_col)
    )
    return (
        joined.withColumn("qcosine", sim)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(probe_id_col, id_col, "qcosine")
    )


def recall_report(
    exact: DataFrame,
    approx: DataFrame,
    probe_id_col: str = "probe_id",
    id_col: str = "vec_id",
    round_digits: int = 4,
) -> DataFrame:
    """Per-probe recall of an ANN lane measured against its exact
    baseline — the observability query an ANN deployment runs when
    tuning nprobe/bits/codebooks (the q148 recipe applied to the
    similarity family). Both inputs are (probe_id, id, score) top-k
    frames; the report is per-probe counts plus
    ``recall = n_hit / n_exact`` — deterministic integers and one
    exact-rational division, so a SQL oracle can re-derive it.

    Both inputs are consumed twice (own count + the intersection), so
    each is eagerly cut first — they are (probes x k)-sized, and
    without the cut the expensive search subtrees re-evaluate per
    consumer (the q141/q148 multi-consumer rule).
    """
    e = exact.select(probe_id_col, id_col).localCheckpoint(eager=True)
    a = approx.select(probe_id_col, id_col).localCheckpoint(eager=True)
    ne = e.groupBy(probe_id_col).agg(
        F.count("*").cast("long").alias("n_exact")
    )
    na = a.groupBy(probe_id_col).agg(
        F.count("*").cast("long").alias("n_approx")
    )
    nh = (
        e.join(a, [probe_id_col, id_col], "left_semi")
        .groupBy(probe_id_col)
        .agg(F.count("*").cast("long").alias("n_hit"))
    )
    # full_outer, not left: a probe that appears ONLY in the approx
    # frame (a buggy ANN lane emitting hits for unknown probes) must
    # surface as an n_exact=0 / null-recall anomaly row, not be
    # silently dropped from the audit
    return (
        ne.join(na, probe_id_col, "full_outer")
        .join(nh, probe_id_col, "left")
        .select(
            probe_id_col,
            F.coalesce("n_exact", F.lit(0)).cast("long").alias("n_exact"),
            F.coalesce("n_approx", F.lit(0)).cast("long").alias("n_approx"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.when(
                F.col("n_exact") > 0,
                pround(
                    F.coalesce("n_hit", F.lit(0)).cast("double")
                    / F.col("n_exact").cast("double"),
                    round_digits,
                ),
            ).alias("recall"),
        )
    )
