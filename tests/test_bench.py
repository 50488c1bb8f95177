"""bench.py harness unit tests (no Spark session needed).

The driver captures only the tail of bench.py's stdout; rounds 3/6/7
landed BENCH_r*.json as ``parsed: null`` because the single 165-entry
JSON line got front-truncated. ``compact_payload`` is the fix: the
full map goes to bench_out.json, stdout gets a bounded line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

from bench import compact_payload  # noqa: E402


def _payload(n: int) -> dict:
    return {
        "metric": "suite_seconds",
        "value": float(n),
        "unit": "sec",
        "queries": {f"q{i:03d}": float(i % 7) + 0.1 for i in range(n)},
        "sf": 0.1,
    }


def test_small_suite_passes_through_unchanged():
    p = _payload(10)
    assert compact_payload(p) is p


def test_large_suite_truncates_to_slowest_max_queries():
    p = _payload(165)
    out = compact_payload(p)
    assert out["n_queries"] == 165
    assert len(out["queries"]) == 24
    # the parameter is honored, not a dead knob
    assert len(compact_payload(_payload(165), max_queries=10)["queries"]) == 10
    small = _payload(9)
    assert compact_payload(small, max_queries=10) is small
    kept_min = min(out["queries"].values())
    # Every kept entry is at least as slow as every dropped one.
    dropped = [
        v for k, v in p["queries"].items() if k not in out["queries"]
    ]
    assert all(v <= kept_min for v in dropped)
    # Schema keys the driver relies on survive.
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in out
    assert out["value"] == p["value"]
    # the pointer is an ABSOLUTE path (the one main() writes), not a
    # bare name a consumer would resolve against its own cwd
    assert os.path.isabs(out["full_per_query"])
    assert out["full_per_query"].endswith("bench_out.json")
    # an explicit full_path is passed through verbatim
    assert (
        compact_payload(_payload(165), full_path="/x/y.json")[
            "full_per_query"
        ]
        == "/x/y.json"
    )
    # loadavg stamps survive compaction when present
    stamped = _payload(165)
    stamped["loadavg_start"] = 1.23
    stamped["loadavg_end"] = 4.56
    c = compact_payload(stamped)
    assert c["loadavg_start"] == 1.23 and c["loadavg_end"] == 4.56


def test_compact_line_is_bounded_json():
    out = compact_payload(_payload(1000))
    line = json.dumps(out)
    assert len(line) < 2000
    assert json.loads(line)["n_queries"] == 1000
