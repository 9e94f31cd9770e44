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


def test_scaling_gate_t_small_floor_exempts_overhead_dominated_rows():
    # r08 churn class: sub-second t_small walls are overhead-dominated,
    # their ratios swing 3-6x vs median with zero code change.  Below the
    # 0.5 s floor only the unconditional hard ratio (>8x) may flag.
    small = {"a": 1.0, "b": 1.2, "c": 0.9, "churny": 0.1}
    # 7x ratio: above factor x median (6x) but below the 8x hard bar
    large = {"a": 2.0, "b": 2.4, "c": 1.8, "churny": 0.7}
    r = bench.scaling_gate(small, large)
    assert "churny" not in r["flagged"]
    assert r["thresholds"]["t_small_floor_sec"] == 0.5
    # ...but the same vs-median excess ABOVE the floor still flags
    small2 = {"a": 1.0, "b": 1.2, "c": 0.9, "quad": 0.6}
    large2 = {"a": 2.0, "b": 2.4, "c": 1.8, "quad": 7.2}
    r2 = bench.scaling_gate(small2, large2)
    assert list(r2["flagged"]) == ["quad"]
    assert r2["flagged"]["quad"]["hard"] is True  # 12x also trips the hard bar


def test_scaling_gate_hard_ratio_pierces_t_small_floor():
    # a genuine blow-up shows through any overhead: >8x flags even below
    # the t_small floor
    small = {"a": 1.0, "b": 1.2, "c": 0.9, "blowup": 0.3}
    large = {"a": 2.0, "b": 2.4, "c": 1.8, "blowup": 3.0}  # 10x > hard 8x
    r = bench.scaling_gate(small, large)
    assert list(r["flagged"]) == ["blowup"]
    assert r["flagged"]["blowup"]["hard"] is True


def test_plain_run_carries_scaling_section_forward_fresh_when_unchanged():
    """r10 verdict task 3: a plain bench re-run must NOT mark the
    committed scaling table stale when the catalog and corpora it
    measured are unchanged — freshness keys on the fingerprint, not on
    which run wrote the file last."""
    registry = {"a": None, "b": None}
    fp = bench.scaling_fingerprint(registry, "/root/testdata", "/root/testdata")
    prev = {
        "queries": {"a": 1.0},
        "scaling_vs_small": {
            "median_sf_ratio": 1.4,
            "flagged": {},
            "fingerprint": fp,
            "small_sf_dir": "/root/testdata",
        },
    }
    detail = {"queries": {"a": 1.1}}
    out = bench.carry_forward_scaling(
        detail, prev, False, registry, "/root/testdata"
    )
    assert out["scaling_vs_small"]["stale"] is False
    assert out["scaling_vs_small"]["median_sf_ratio"] == 1.4


def test_plain_run_marks_scaling_stale_when_catalog_changed():
    registry = {"a": None, "b": None}
    fp = bench.scaling_fingerprint(registry, "/root/testdata", "/root/testdata")
    prev = {
        "scaling_vs_small": {
            "median_sf_ratio": 1.4,
            "fingerprint": fp,
            "small_sf_dir": "/root/testdata",
        }
    }
    grown = {"a": None, "b": None, "c": None}  # new registration
    out = bench.carry_forward_scaling(
        {"queries": {}}, prev, False, grown, "/root/testdata"
    )
    assert out["scaling_vs_small"]["stale"] is True
    # and a fingerprint-less legacy table is conservatively stale
    prev2 = {"scaling_vs_small": {"median_sf_ratio": 1.4}}
    out2 = bench.carry_forward_scaling(
        {"queries": {}}, prev2, False, registry, "/root/testdata"
    )
    assert out2["scaling_vs_small"]["stale"] is True


def test_scaling_run_does_not_resurrect_stale_section():
    # on a --scaling run main() writes the fresh section itself; the
    # carry-forward must not touch it
    prev = {"scaling_vs_small": {"median_sf_ratio": 9.9, "stale": True}}
    detail = {"scaling_vs_small": {"median_sf_ratio": 1.4, "flagged": {}}}
    out = bench.carry_forward_scaling(detail, prev, True, {}, "/root/testdata")
    assert "stale" not in out["scaling_vs_small"]
    assert out["scaling_vs_small"]["median_sf_ratio"] == 1.4


def test_plain_run_without_previous_scaling_section_is_noop():
    out = bench.carry_forward_scaling(
        {"queries": {}}, {}, False, {}, "/root/testdata"
    )
    assert "scaling_vs_small" not in out


def test_never_driver_checked_derivation(tmp_path):
    """--verify scope: registered minus every name in any committed
    CORRECTNESS_r*.json, resilient to unreadable files."""
    import json

    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"a": {}, "b": {}})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({"c": {}}))
    (tmp_path / "CORRECTNESS_r03.json").write_text("{not json")
    # valid JSON but not a dict: must be skipped, not crash on .keys()
    (tmp_path / "CORRECTNESS_r04.json").write_text(json.dumps(["a", "d"]))
    registry = {"a": 1, "b": 1, "c": 1, "d": 1, "e": 1}
    got = bench._never_driver_checked(str(tmp_path), registry)
    assert got == ["d", "e"]


def test_time_catalog_records_cold_and_min(spark):
    """r13 verdict task 1: both executions are recorded — `timings` is the
    min-of-2 regression baseline, `colds` is run 1 (which pays any
    session-cache build its plan triggers), so shared-artifact builds are
    visible in BENCH_DETAIL instead of excised by the protocol."""

    class _Q:
        def build(self, s, sf_dir):
            return s.range(100)

    timings, colds, errors = bench._time_catalog(spark, {"q": _Q()}, "unused")
    assert errors == {}
    assert set(timings) == set(colds) == {"q"}
    assert colds["q"] >= timings["q"] > 0
