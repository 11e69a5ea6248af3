"""Structured logging / observability (SURVEY.md §5 "Metrics / logging").

The reference prints wall-clock phase timings to stderr; here a tiny
structured logger records phases with derived throughput (Mbp/s, achieved
GB/s against the roofline) and renders either the reference-style
human-readable summary (-v) or machine-readable JSON lines
(SLAMEM_LOG_JSON=1).
"""

from __future__ import annotations

import json
import os
import sys
import time
from contextlib import contextmanager

# v5e HBM roofline, used to report achieved fraction (BASELINE metric frame)
V5E_HBM_GBPS = 819.0


class PhaseLog:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.json_mode = os.environ.get("SLAMEM_LOG_JSON") == "1"
        self.records: list[dict] = []

    @contextmanager
    def phase(self, name: str, **fields):
        """Time a phase. Yields the mutable field dict so callers can attach
        values only known at exit (bytes touched, pair counts); derived
        throughput/roofline metrics are computed from the final fields."""
        t0 = time.perf_counter()
        try:
            yield fields
        finally:
            dt = time.perf_counter() - t0
            rec = {"phase": name, "seconds": round(dt, 6), **fields}
            if "bp" in fields and dt > 0:
                rec["mbp_per_s"] = round(fields["bp"] / 1e6 / dt, 3)
            if "bytes" in fields and dt > 0:
                gbps = fields["bytes"] / 1e9 / dt
                rec["gb_per_s"] = round(gbps, 2)
                rec["hbm_fraction"] = round(gbps / V5E_HBM_GBPS, 4)
            self.records.append(rec)
            if self.enabled:
                self.emit(rec)

    def emit(self, rec: dict) -> None:
        if self.json_mode:
            print(json.dumps(rec), file=sys.stderr)
        else:
            extra = " ".join(f"{k}={v}" for k, v in rec.items()
                             if k not in ("phase", "seconds"))
            print(f"[slamem] {rec['phase']}: {rec['seconds']:.3f}s {extra}",
                  file=sys.stderr)


NULL_LOG = PhaseLog(enabled=False)
