#!/usr/bin/env python
"""Chr-scale correctness proof: seed == scan full match-set equality at
chr21 scale on the real chip (VERDICT r4 #4).

Oracle parity tops out ~60 Kbp; chr21/chr1 correctness previously rested
on match-count invariance across optimizations. This run closes the gap:
the two INDEPENDENT engines — the sparse-seeded sort/gather flagship and
the FM backward-scan + LCP-shorten engine (the reference's algorithm
shape, SURVEY.md §3.2) — must produce the identical sorted
(ref_pos, q_pos, len) set on the bench's chr21 configuration (40 Mbp
strain pair, -l 50). They share no frontend code: the seed engine never
touches BWT/occ; the scan engine never touches the K-mer table.

Writes seedscan_chr21.log (committed). TPU-serialized: run alone.
"""

import os
import time

SIZE = int(os.environ.get("SEEDSCAN_SIZE", 40_000_000))
MINLEN = 50
CPU = os.environ.get("SEEDSCAN_CPU", "0") == "1"
LOG = os.environ.get("SEEDSCAN_LOG", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "seedscan_chr21.log"))


def main() -> int:
    t0 = time.perf_counter()
    lines = []

    def log(msg):
        line = f"[{time.perf_counter() - t0:8.1f}s] {msg}"
        print(line, flush=True)
        lines.append(line)

    import numpy as np

    import jax

    if CPU:
        # the 40 Mbp scan-lane program crashes THIS sandbox's remote TPU
        # worker (kernel fault, backend-independent — see DESIGN.md §9);
        # engine equality is platform-independent, so the full-scale proof
        # runs on the CPU backend while the TPU run covers the largest
        # scale the worker tolerates
        jax.config.update("jax_platforms", "cpu")

    from slamem_tpu.config import Config
    from slamem_tpu.engine.scan_mode import find_scan_matches
    from slamem_tpu.engine.seed_mode import find_seed_matches
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    dev = jax.devices()[0]
    log(f"device: {dev} (platform {dev.platform})")
    # EXACTLY the bench chr21 configuration (bench.py build_inputs at
    # size=40_000_000, minlen=50) so the proof covers the artifact rows
    ref, qry = strain_pair(SIZE, seed=20260816, sub_rate=0.015,
                           indel_rate=0.0015)
    log(f"inputs: {SIZE/1e6:.0f} Mbp strain pair, -l {MINLEN} "
        f"(bench chr21 statistics, same seed)")
    t1 = time.perf_counter()
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    log(f"index build: {time.perf_counter() - t1:.1f}s (n={index.n})")

    cfg = Config(min_length=MINLEN)
    t1 = time.perf_counter()
    m_seed = find_seed_matches(index, qry, cfg)
    t_seed = time.perf_counter() - t1
    log(f"seed engine: {int(m_seed.length.size)} matches in {t_seed:.2f}s "
        f"({len(qry)/1e6/t_seed:.1f} Mbp/s), stats={m_seed.stats}")

    t1 = time.perf_counter()
    m_scan = find_scan_matches(index, qry, cfg)
    t_scan = time.perf_counter() - t1
    log(f"scan engine: {int(m_scan.length.size)} matches in {t_scan:.2f}s "
        f"({len(qry)/1e6/t_scan:.2f} Mbp/s)")

    def tuples(m):
        a = np.stack([np.asarray(m.refpos), np.asarray(m.qpos),
                      np.asarray(m.length)], axis=1)
        return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]

    ts, tc = tuples(m_seed), tuples(m_scan)
    equal = ts.shape == tc.shape and bool(np.array_equal(ts, tc))
    log(f"EQUALITY: sorted (ref_pos, q_pos, len) sets identical -> {equal} "
        f"(seed {ts.shape[0]}, scan {tc.shape[0]})")
    if not equal and ts.shape[0] and tc.shape[0]:
        import itertools

        sset = set(map(tuple, ts.tolist()))
        cset = set(map(tuple, tc.tolist()))
        for t in itertools.islice(sset - cset, 5):
            log(f"  seed-only: {t}")
        for t in itertools.islice(cset - sset, 5):
            log(f"  scan-only: {t}")
    log(f"RESULT: {'PASS' if equal else 'FAIL'}")
    with open(LOG, "w") as f:
        f.write("\n".join(lines) + "\n")
    return 0 if equal else 1


if __name__ == "__main__":
    raise SystemExit(main())
