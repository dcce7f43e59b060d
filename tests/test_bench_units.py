"""Unit tests for the bench harness helpers (no Spark session)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_regression_check_phase_robust():
    """A uniform machine slow phase (every query ~7x) must flag nothing;
    a single genuinely regressed query in a normal phase must flag."""
    from bench import regression_check

    ref = {"a": 0.3, "b": 0.5, "c": 0.8, "d": 0.27}
    uniform_slow = {"a": 2.1, "b": 3.6, "c": 5.9, "d": 3.8}
    assert regression_check(uniform_slow, ref) == {}

    one_bad = {"a": 0.36, "b": 0.62, "c": 4.2, "d": 0.3}
    out = regression_check(one_bad, ref)
    assert set(out) == {"c"} and out["c"]["ratio"] > 5

    assert regression_check({"a": 0.36, "b": 0.55}, ref) == {}
    assert regression_check({}, {}) == {}
    # tiny absolute timings never flag, whatever the ratio
    assert regression_check({"a": 0.4}, {"a": 0.05}) == {}


def test_load_reference_timings_unwraps_driver_envelope(tmp_path, monkeypatch):
    import json

    import bench

    bdir = tmp_path
    (bdir / "BENCH_r01.json").write_text(
        json.dumps({"parsed": {"queries": {"q": 1.0}}})
    )
    monkeypatch.setattr(bench.os.path, "dirname", lambda _: str(bdir))
    path, ref = bench.load_reference_timings()
    assert ref == {"q": 1.0} and path.endswith("BENCH_r01.json")
