"""Prose/artifact consistency is enforced by the suite (VERDICT r4 #2a).

scripts/check_claims.py verifies every [BD: path = value] marker in
DESIGN.md/README.md against the committed BENCH_DETAIL.json and rejects
"zero errors" prose over a non-empty artifact errors list. These tests run
the checker on the committed files (so a divergent commit has a red suite)
and unit-test its failure modes on synthetic inputs.
"""

import importlib.util
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "check_claims", os.path.join(HERE, "scripts", "check_claims.py"))
check_claims = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check_claims)


def test_committed_prose_matches_committed_artifact():
    assert check_claims.main() == 0, (
        "DESIGN.md/README.md numeric claims diverge from BENCH_DETAIL.json "
        "— see stderr; fix the prose or regenerate the artifact")


def test_checker_catches_divergence():
    detail = {"chr21": {"mbp_per_s": 77.0}, "errors": []}
    texts = {"DESIGN.md": "final artifact: chr21 [BD: chr21.mbp_per_s = "
                          "91.5 ±10%] Mbp/s"}
    problems = check_claims.check(detail, texts)
    assert any("outside the band" in p for p in problems)


def test_checker_accepts_within_band_and_exact():
    detail = {"chr21": {"mbp_per_s": 88.0, "matches": 286645}, "errors": []}
    texts = {"DESIGN.md": "chr21 [BD: chr21.mbp_per_s = 91.5 ±10%] with "
                          "[BD: chr21.matches = 286645 exact] matches"}
    assert check_claims.check(detail, texts) == []


def test_checker_rejects_zero_errors_over_error_entry():
    detail = {"errors": [{"scenario": "rank_kernel.nibble_4kb_error",
                          "class": "environmental", "error": "HTTP 500"}]}
    texts = {"DESIGN.md": "shipped with zero errors [BD: x.y = 1]"}
    problems = check_claims.check(detail, texts)
    assert any("zero errors" in p for p in problems)


def test_checker_rejects_unresolvable_path():
    detail = {"errors": []}
    texts = {"README.md": "[BD: nope.missing = 5]"}
    problems = check_claims.check(detail, texts)
    assert any("does not resolve" in p for p in problems)
