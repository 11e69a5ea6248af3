#!/usr/bin/env python
"""Work-balance + collective-wire report for the distributed paths.

Real multi-host hardware is not reachable in this sandbox (SURVEY.md §0), so
1->N host scaling efficiency (BASELINE north star >= 80%) cannot be timed.
What CAN be measured, and is platform-independent, is the quantity that
determines it: how evenly the per-chip work divides and how many bytes the
collective merge moves per chip. This script measures both on a fake
N-device CPU mesh for N in {1, 2, 4, 8}:

  * replicated path (data-parallel query blocks): per-device candidate-pair
    mass from the frontend's width cumsum, split the way the mesh dispatch
    splits positions;
  * SA-rank-sharded path (config #5): per-slab interval mass from the
    per-slab frontends, i.e. the pairs each shard expands;
  * collective wire: the run-triple all_gather payload per device
    (3 * run_capacity int32 + scalars), vs the raw-pair alternative.

Emits one JSON line per mesh size. Run on CPU:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/scaling_report.py
"""

from __future__ import annotations

import json
import sys

import numpy as np


def main() -> int:
    import jax

    from slamem_tpu.config import Config
    from slamem_tpu.dist.mesh import make_mesh
    from slamem_tpu.dist.sharded import (find_seed_matches_sharded,
                                         shard_tables, sharded_frontend,
                                         sharded_frontend_join)
    from slamem_tpu.engine import seed_mode as sm
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    size = int(sys.argv[sys.argv.index("--size") + 1]) if "--size" in sys.argv \
        else 2_000_000
    minlen = 20
    ref, qry = strain_pair(size, seed=20260818, sub_rate=0.015,
                           indel_rate=0.0015)
    qry = qry[: size // 4]
    cfg = Config(min_length=minlen)
    index = build_index(ref)
    jax.block_until_ready(index.sa)

    qp, qt = sm.query_to_device(qry)
    m_p = int(qp.shape[0])
    k, stride, _ = sm.choose_seed_plan(index.n, m_p, cfg)
    refk, sa_aug = sm.seed_table(index, k)

    # replicated-path frontend width per SAMPLE position (what the mesh
    # dispatch splits contiguously across devices)
    lo, width, cum, summary = sm.query_frontend(refk, qt, k, stride)
    w_h = np.asarray(width).astype(np.int64)
    total_pairs = int(w_h.sum())

    run_cap_wire = 3 * 4  # 3 int32 per run slot

    base = {"size": size, "query_bp": len(qry), "k": k, "stride": stride,
            "total_pairs": total_pairs}
    for ndev in (1, 2, 4, 8):
        if ndev > len(jax.devices()):
            break
        mesh = make_mesh(ndev)
        # replicated mesh path: contiguous position blocks per device
        splits = np.array_split(w_h, ndev)
        rep = [int(s.sum()) for s in splits]
        rep_bal = (max(rep) / (sum(rep) / len(rep))) if sum(rep) else 1.0

        # sharded path: per-slab interval mass == pairs each shard expands
        shard = None
        if ndev > 1:
            refk_sh, sa_sh, starts_sh, shift, probes = shard_tables(
                index, k, mesh)
            slab = -(-index.n // ndev)
            if sm.prefer_bucket(slab, m_p // stride, len(refk_sh), probes):
                _, w_l, _, _ = sharded_frontend(mesh, refk_sh, starts_sh,
                                                qt, k, shift, probes, stride)
            else:
                _, w_l, _, _ = sharded_frontend_join(mesh, refk_sh, qt, k,
                                                     stride)
            per_slab = np.asarray(w_l).astype(np.int64).sum(axis=1)
            shard = [int(x) for x in per_slab]
            shard_bal = (max(shard) / (sum(shard) / len(shard))
                         if sum(shard) else 1.0)
            m = find_seed_matches_sharded(index, qry, cfg, mesh)
        else:
            shard_bal = 1.0
            m = sm.find_seed_matches(index, qry, cfg, mesh=mesh)
        run_cap = max(4096, int(cfg.pair_capacity) // 16)
        print(json.dumps({
            **base, "ndev": ndev,
            "replicated_pairs_per_dev": rep,
            "replicated_balance_max_over_mean": round(rep_bal, 4),
            "sharded_pairs_per_slab": shard,
            "sharded_balance_max_over_mean": round(shard_bal, 4),
            "wire_bytes_per_dev_runs": run_cap * run_cap_wire,
            "wire_bytes_per_dev_rawpairs": int(cfg.pair_capacity) * 8,
            "matches": int(m.length.size)}))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
