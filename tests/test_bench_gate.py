"""Unit tests for bench.py's round-over-round regression gate (no Spark).

The gate must (a) normalize away run-level ambient slowdown before
flagging, (b) ignore sub-noise micro-query jitter via the absolute floor,
(c) flag a genuine per-query blow-up, (d) refuse to compare across scale
factors.
"""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _detail(queries, sf=0.1):
    return {"sf": sf, "queries": queries}


def test_uniform_ambient_slowdown_not_flagged():
    prev = _detail({"a": 1.0, "b": 2.0, "c": 4.0})
    cur = _detail({"a": 1.4, "b": 2.8, "c": 5.6})  # everything 1.4x — co-tenancy
    r = bench.compare_details(prev, cur)
    assert r["comparable"] and r["common"] == 3
    assert abs(r["scale"] - 1.4) < 1e-9
    assert r["flagged"] == {}


def test_genuine_regression_flagged_through_ambient_noise():
    prev = _detail({"a": 1.0, "b": 2.0, "c": 1.0})
    # run is globally ~1.2x slower, but c alone blew up 5x
    cur = _detail({"a": 1.2, "b": 2.4, "c": 5.0})
    r = bench.compare_details(prev, cur)
    assert list(r["flagged"]) == ["c"]
    assert r["flagged"]["c"]["normalized_ratio"] > 2.0


def test_micro_query_jitter_under_abs_floor_ignored():
    prev = _detail({"a": 10.0, "tiny": 0.02})
    cur = _detail({"a": 10.0, "tiny": 0.09})  # 4.5x ratio but 70ms — noise
    r = bench.compare_details(prev, cur)
    assert r["flagged"] == {}


def test_sf_mismatch_not_comparable():
    r = bench.compare_details(
        _detail({"a": 1.0}, sf=0.01), _detail({"a": 9.0}, sf=0.1)
    )
    assert r["comparable"] is False and r["flagged"] == {}


def test_new_and_removed_queries_excluded_from_common_set():
    prev = _detail({"a": 1.0, "gone": 3.0})
    cur = _detail({"a": 1.0, "new": 50.0})
    r = bench.compare_details(prev, cur)
    assert r["common"] == 1 and r["flagged"] == {}


def test_scaling_gate_flags_superlinear_scaler():
    # catalog scales ~3x sf0.01 -> sf0.1 (fixed overhead absorbed by the
    # median); one query scales 30x — the accidental quadratic
    small = {"a": 0.2, "b": 0.3, "c": 0.25, "quad": 0.2}
    large = {"a": 0.6, "b": 0.9, "c": 0.8, "quad": 6.0}
    r = bench.scaling_gate(small, large)
    assert r["comparable"] and r["common"] == 4
    assert list(r["flagged"]) == ["quad"]
    assert r["flagged"]["quad"]["sf_ratio"] == 30.0


def test_scaling_gate_uniform_scaling_not_flagged():
    small = {"a": 0.2, "b": 0.3, "c": 0.25}
    large = {n: t * 8 for n, t in small.items()}  # everyone 8x: fine
    r = bench.scaling_gate(small, large)
    assert r["comparable"] and not r["flagged"]


def test_scaling_gate_noise_floor_ignores_fast_queries():
    # 10x-vs-median ratio but the large-SF time is sub-floor noise
    small = {"a": 0.2, "b": 0.3, "c": 0.001}
    large = {"a": 0.4, "b": 0.6, "c": 0.05}
    r = bench.scaling_gate(small, large)
    assert not r["flagged"]
