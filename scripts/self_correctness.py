"""Self-run of the driver's correctness protocol over ALL declared
queries, committed as ``CORRECTNESS_SELF_r{N}.json``.

The driver's per-round sweep has recorded only ~50 entries since
round 2, leaving most oracle-green queries without a driver row; this
script makes the evidence artifact exist from the repo side: for every
``QUERIES`` entry it runs the Spark query and the DuckDB oracle at
sf0.01 and records row-count + schema + order-insensitive value-hash
matches in the driver's exact JSON shape (plus a per-query wall-clock
so a time-budget cap can be ruled in or out).

Usage: python scripts/self_correctness.py [sf_dir] [out.json]
"""

from __future__ import annotations

import hashlib
import json
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

from data_lake_project_spark.queries import ORACLE, QUERIES
from data_lake_project_spark.session import get_spark


def canon(rows, cols):
    """Sort columns by name, rows by stringified values (the same
    canonicalization as scripts/compare.py / the driver's t2)."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else f"{v:.6g}"
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in idx], out


def value_hash(rows):
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = (
        sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_SELF.json"
    )
    spark = get_spark("self_correctness", shuffle_partitions=8)
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    report: dict[str, dict] = {}
    t_total = time.perf_counter()
    for name, fn in QUERIES.items():
        entry = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            entry["spark_rows"] = len(s_rows)
        except Exception as e:  # noqa: BLE001
            entry["err"] = f"spark: {e}"[:300]
            entry["seconds"] = round(time.perf_counter() - t0, 3)
            report[name] = entry
            print(f"ERR  {name}: {entry['err']}")
            continue
        if name not in ORACLE:
            entry["err"] = "no_oracle"
            entry["seconds"] = round(time.perf_counter() - t0, 3)
            report[name] = entry
            print(f"rows {name}: {len(s_rows)} rows (no oracle)")
            continue
        try:
            res = con.execute(ORACLE[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            entry["err"] = f"oracle: {e}"[:300]
            entry["seconds"] = round(time.perf_counter() - t0, 3)
            report[name] = entry
            print(f"ERR  {name}: {entry['err']}")
            continue
        sc, sr = canon(s_rows, s_cols)
        dc, dr = canon(d_rows, d_cols)
        entry["oracle_rows"] = len(dr)
        entry["rows_match"] = len(sr) == len(dr)
        entry["schema_match"] = sc == dc
        entry["hash_match"] = (
            entry["rows_match"]
            and entry["schema_match"]
            and value_hash(sr) == value_hash(dr)
        )
        entry["seconds"] = round(time.perf_counter() - t0, 3)
        report[name] = entry
        tag = "PASS" if entry["hash_match"] else "FAIL"
        print(f"{tag} {name} ({len(sr)} rows, {entry['seconds']}s)")

    n_green = sum(1 for e in report.values() if e["hash_match"])
    n_rows_only = sum(
        1 for e in report.values() if e["err"] == "no_oracle"
    )
    n_bad = len(report) - n_green - n_rows_only
    summary = {
        "sf_dir": sf_dir,
        "queries": len(report),
        "hash_green": n_green,
        "rows_only": n_rows_only,
        "failed": n_bad,
        "total_seconds": round(time.perf_counter() - t_total, 1),
    }
    with open(out_path, "w") as f:
        json.dump({"_summary": summary, **report}, f, indent=1)
    print(json.dumps(summary))
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
