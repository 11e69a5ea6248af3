#!/usr/bin/env python
"""Artifact claims checker: prose numbers must match the committed artifact.

VERDICT r3 and r4 both caught DESIGN.md citing benchmark numbers that the
committed BENCH_DETAIL.json contradicted (r3: 100x; r4: config2 91.5 vs
77.0, "zero errors" over a present error key) — and both times the only
enforcement was a human re-read. This script is the missing machanism
(VERDICT r4 #2a): every number DESIGN.md/README.md claim ABOUT THE CURRENT
ARTIFACT is written as an explicit marker,

    [BD: <key>.<path> = <number>]          # +-15% jitter band (default)
    [BD: <key>.<path> = <number> ±<p>%]    # explicit band
    [BD: <key>.<path> = <number> exact]    # counts: must match exactly

and this checker resolves each path in BENCH_DETAIL.json and fails when
the artifact disagrees beyond the band. Historical numbers (perf ledgers
of past rounds) stay as plain prose — only current-artifact claims carry
markers, and only markers are enforced.

Additionally:
  * any prose claim of "zero errors" fails unless the artifact's top-level
    `errors` list exists and is empty;
  * a BENCH_DETAIL.json without the `errors` key fails (pre-classification
    artifacts cannot honestly claim anything).

Run directly (exit 1 on failure) or via tests/test_artifact_claims.py,
which makes `pytest` the enforcement point: a commit with divergent prose
has a red suite.
"""

from __future__ import annotations

import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(HERE, "BENCH_DETAIL.json")
PROSE = [os.path.join(HERE, "DESIGN.md"), os.path.join(HERE, "README.md")]

_MARKER = re.compile(
    r"\[BD:\s*(?P<path>[A-Za-z0-9_.\-]+)\s*=\s*(?P<num>-?[0-9][0-9_.]*)"
    r"\s*(?:(?:±|\+-)\s*(?P<pct>[0-9.]+)\s*%|(?P<exact>exact))?\s*\]")


def resolve(detail: dict, path: str):
    node = detail
    for part in path.split("."):
        if not isinstance(node, dict) or part not in node:
            return None
        node = node[part]
    return node


def check(detail: dict, texts: dict[str, str]) -> list[str]:
    problems: list[str] = []
    if "errors" not in detail:
        problems.append(
            "BENCH_DETAIL.json has no top-level 'errors' list — regenerate "
            "with the classifying bench (bench.py --all)")
    n_markers = 0
    for fname, text in texts.items():
        for m in _MARKER.finditer(text):
            n_markers += 1
            path = m.group("path")
            claimed = float(m.group("num").replace("_", ""))
            got = resolve(detail, path)
            if got is None or not isinstance(got, (int, float)):
                problems.append(
                    f"{fname}: [BD: {path}] does not resolve to a number "
                    f"in BENCH_DETAIL.json (got {got!r})")
                continue
            if m.group("exact"):
                if float(got) != claimed:
                    problems.append(
                        f"{fname}: claims {path} = {claimed:g} exact, "
                        f"artifact records {got:g}")
            else:
                pct = float(m.group("pct")) if m.group("pct") else 15.0
                tol = abs(claimed) * pct / 100.0
                if abs(float(got) - claimed) > tol:
                    problems.append(
                        f"{fname}: claims {path} = {claimed:g} "
                        f"(±{pct:g}%), artifact records {got:g} — "
                        f"outside the band")
        # "zero errors" prose is only honest when the artifact agrees,
        # including per-variant sub-errors (the r4 failure mode)
        for zm in re.finditer(r"zero errors", text, re.IGNORECASE):
            line = text[:zm.start()].count("\n") + 1
            errs = detail.get("errors")
            if errs is None or len(errs) > 0:
                problems.append(
                    f"{fname}:{line}: claims 'zero errors' but the "
                    f"artifact's errors list is {errs!r}")
    if n_markers == 0:
        problems.append(
            "no [BD: ...] markers found in DESIGN.md/README.md — "
            "current-artifact claims must be written as markers so this "
            "checker can enforce them")
    return problems


def main() -> int:
    with open(ARTIFACT) as f:
        detail = json.load(f)
    texts = {}
    for p in PROSE:
        if os.path.exists(p):
            with open(p) as f:
                texts[os.path.basename(p)] = f.read()
    problems = check(detail, texts)
    for p in problems:
        print(f"CLAIM MISMATCH: {p}", file=sys.stderr)
    if not problems:
        n = sum(len(_MARKER.findall(t)) for t in texts.values())
        print(f"claims check: {n} marker(s) verified against "
              f"BENCH_DETAIL.json, zero-errors prose consistent")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
