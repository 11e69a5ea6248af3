"""Unit tests for bench.py's measurement-infrastructure helpers.

The bench harness is product code (DESIGN.md §8: measurement
infrastructure caused every round-3 artifact failure) — its pure helpers
get the same unit coverage as engine code.
"""

import importlib.util
import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "bench_mod", os.path.join(HERE, "bench.py"))
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_classify_error_environmental_vs_engine():
    env = [
        "HTTP 500: tpu_compile_helper subprocess exit code 1",
        "UNAVAILABLE: TPU worker process crashed or restarted",
        "DEADLINE_EXCEEDED: rpc timed out",
        "Connection reset by peer",
        "failed to connect to coordinator",
    ]
    eng = [
        "RESOURCE_EXHAUSTED: out of memory allocating 12GB",
        "ValueError: query position 5 has interval width 900",
        "AssertionError: matches differ",
    ]
    for m in env:
        assert bench.classify_error(m) == "environmental", m
    for m in eng:
        assert bench.classify_error(m) == "engine", m


def test_coldrun_stats():
    s = bench.coldrun_stats([50.0, 38.0, 52.0])
    assert s == {"n": 3, "median": 50.0, "min": 38.0, "max": 52.0}


def test_recent_coldruns_parses_log(tmp_path, monkeypatch):
    log = tmp_path / "BENCH_COLDRUNS.log"
    lines = ["# comment", "## run1: rc=0"]
    for v in (40.0, 45.5, 51.2):
        lines.append(json.dumps({"metric": "query_mbp_per_s_per_chip",
                                 "value": v, "unit": "Mbp/s",
                                 "vs_baseline": 2.0}))
    lines.append(json.dumps({"metric": "other_metric", "value": 99.0}))
    lines.append("{broken json")
    log.write_text("\n".join(lines) + "\n")
    monkeypatch.setattr(bench, "COLDRUNS_FILE", str(log))
    assert bench._recent_coldruns() == [40.0, 45.5, 51.2]
    assert bench._recent_coldruns(limit=2) == [45.5, 51.2]


def test_committed_coldruns_log_parses():
    # the real committed log must parse and hold a sane distribution
    vals = bench._recent_coldruns(limit=1000)
    assert len(vals) >= 10
    s = bench.coldrun_stats(vals)
    assert 20 < s["min"] <= s["median"] <= s["max"] < 200


def test_isolated_scenario_retries_environmental_once(monkeypatch):
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("HTTP 500: tpu_compile_helper subprocess "
                               "exit code 1")
        return {"mbp_per_s": 42.0}

    errors = []
    res = bench.isolated_scenario("flaky", flaky, errors)
    assert res == {"mbp_per_s": 42.0} and calls["n"] == 2
    assert errors == []


def test_isolated_scenario_engine_error_no_retry():
    calls = {"n": 0}

    def broken():
        calls["n"] += 1
        raise ValueError("matches differ")

    errors = []
    res = bench.isolated_scenario("broken", broken, errors)
    assert calls["n"] == 1                       # engine errors: no retry
    assert res["error_class"] == "engine"
    assert errors == [{"scenario": "broken", "class": "engine",
                       "error": "matches differ"}]


def test_isolated_scenario_persistent_environmental_recorded():
    def down():
        raise RuntimeError("UNAVAILABLE: TPU worker process crashed")

    errors = []
    res = bench.isolated_scenario("down", down, errors)
    assert res["error_class"] == "environmental" and res["retried"]
    assert errors[0]["class"] == "environmental"
