"""Persisted int8 scalar-quantization index — the fifth
train-once/serve-many lifecycle (dense-exact lane), next to
ann_index (IVF/PQ approximate), dedup_index, the BM25 lexical index,
and the HLL sketch rollup.

The artifact is the COMPRESSION: the corpus is encoded once into a
1-byte-per-dimension ``array<tinyint>`` codes table (4x smaller than
fp32), and every search after scans codes instead of raw embeddings —
same exact-ranking contract as ``similarity.sq_topk`` (scoring on
dequantized codes; every op correctly-rounded IEEE, so results stay
oracle-hashable). Maintenance is the ann_index contract: O(delta)
appends encoding ONLY the new vectors with the FROZEN stats model
(anti-join replay guard by default, ``assume_new_ids=True`` for the
strictly-O(delta) fast path).

Frozen-stats caveat (the FAISS SQ deployment contract): folds clamp
out-of-range dimensions to the trained [min, max] envelope, so a
drifting corpus degrades gracefully but a regime change warrants a
rebuild. Rebuild-vs-fold equality is CI-pinned under the same stats.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from data_lake_project_spark import fs
from data_lake_project_spark.operators.similarity import (
    sq_encode,
    sq_stats,
)


@dataclass
class SqIndex:
    codes: DataFrame  # (id, codes array<tinyint>)
    mins: list[float]
    maxs: list[float]
    params: dict


def build_sq_index(
    corpus: DataFrame,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> SqIndex:
    """One stats pass (2*dim scalar aggregates, no explode) + one
    narrow encode map."""
    mins, maxs = sq_stats(corpus, vec_col, dim)
    codes = sq_encode(corpus, mins, maxs, id_col, vec_col)
    return SqIndex(
        codes,
        mins,
        maxs,
        {"dim": dim, "id_col": id_col, "vec_col": vec_col},
    )


def save_sq_index(
    index: SqIndex, path: str, id_buckets: int | None = None
) -> None:
    """Codes as parquet, stats model as one small JSON (written last —
    a reader that sees the model sees the codes).

    ``id_buckets``: opt-in id-bucket layout (``erasure.
    write_id_bucketed``) for erase-heavy deployments — codes partition
    by a deterministic hash bucket of the id, so GDPR erasure (and its
    doomed-row scan) prunes to the touched bucket dirs instead of
    rewriting the whole table. Serving is unchanged: the bucket column
    is dropped on load."""
    path = path.rstrip("/")
    if id_buckets is not None:
        from data_lake_project_spark.operators.erasure import (
            write_id_bucketed,
        )

        write_id_bucketed(
            index.codes,
            f"{path}/codes",
            index.params["id_col"],
            n_buckets=id_buckets,
        )
    else:
        index.codes.write.mode("overwrite").parquet(f"{path}/codes")
    spark = index.codes.sparkSession
    model = {
        "mins": index.mins,
        "maxs": index.maxs,
        "params": index.params,
    }
    fs.write_text(spark, f"{path}/model.json", json.dumps(model))


def load_sq_index(spark: SparkSession, path: str) -> SqIndex:
    path = path.rstrip("/")
    model = json.loads(fs.read_text(spark, f"{path}/model.json"))
    codes = spark.read.parquet(f"{path}/codes")
    # id-bucketed layout: the bucket column is erase-path plumbing,
    # not index data — serving sees the identical schema either way
    from data_lake_project_spark.operators.erasure import (
        id_bucket_params,
    )

    meta = id_bucket_params(spark, f"{path}/codes")
    if meta is not None and meta["bucket_col"] in codes.columns:
        codes = codes.drop(meta["bucket_col"])
    return SqIndex(
        codes,
        [float(x) for x in model["mins"]],
        [float(x) for x in model["maxs"]],
        model["params"],
    )


def sq_index_apply(
    spark: SparkSession,
    path: str,
    new_corpus: DataFrame,
    assume_new_ids: bool = False,
) -> SqIndex:
    """O(delta) fold: encode ONLY the delta with the saved stats and
    parquet-append. Same replay-guard contract as ``ann_index_apply``:
    the default anti-join makes a replayed batch a no-op (a positional
    codes table DOES duplicate results on replay, unlike the HLL
    sketch lane); ``assume_new_ids=True`` skips the guard for
    upstream-gated ingest."""
    idx = load_sq_index(spark, path)
    p = idx.params
    if not assume_new_ids:
        existing = idx.codes.select(p["id_col"]).distinct()
        new_corpus = new_corpus.join(existing, p["id_col"], "left_anti")
    delta = sq_encode(
        new_corpus, idx.mins, idx.maxs, p["id_col"], p["vec_col"]
    )
    codes_path = f"{path.rstrip('/')}/codes"
    from data_lake_project_spark.operators.erasure import (
        append_id_bucketed,
        id_bucket_params,
    )

    meta = id_bucket_params(spark, codes_path)
    if meta is not None:
        append_id_bucketed(delta, codes_path, meta=meta)
    else:
        delta.write.mode("append").parquet(codes_path)
    return load_sq_index(spark, path)


def search_sq_index(
    index: SqIndex,
    probes: DataFrame,
    k: int = 10,
    probe_id_col: str = "probe_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact dequantized-cosine top-k over the stored codes — served
    by the SAME ``similarity._sq_search`` body as the inline
    ``sq_topk`` (single-scoring-path convention), so q157 == q155 by
    construction; only the corpus encode is skipped (the probe side
    encodes on the fly with the stored stats). Output:
    (probe_id, id, qcosine)."""
    from data_lake_project_spark.operators.similarity import _sq_search

    p = index.params
    return _sq_search(
        index.codes,
        sq_encode(probes, index.mins, index.maxs, probe_id_col, p["vec_col"]),
        index.mins,
        index.maxs,
        k,
        p["id_col"],
        probe_id_col,
        exclude_self,
    )
