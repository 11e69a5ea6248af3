#!/usr/bin/env python
"""Randomized cross-check soak: engines vs oracle and vs each other.

Each trial draws a random scenario (size, mutation rates, N runs, min
length, mode, frontend, sparse on/off, sharded or replicated, dense
boundary backend) and asserts the engine's tuple set equals the oracle's
(small sizes) or the default engine's (all sizes). Designed to run for a
while on CPU during TPU outages:

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/soak.py --trials 40 --seed 1
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> int:
    import jax  # noqa: F401  (backend selected by env)

    from slamem_tpu.config import Config, MatchMode
    from slamem_tpu.dist.mesh import make_mesh
    from slamem_tpu.dist.sharded import find_seed_matches_sharded
    from slamem_tpu.engine.seed_mode import apply_mode_filter, \
        find_seed_matches
    from slamem_tpu.index.build import build_index
    from slamem_tpu.oracle import oracle_matches
    from slamem_tpu.utils.synth import mutate, random_genome, with_n_runs

    trials = int(sys.argv[sys.argv.index("--trials") + 1]) \
        if "--trials" in sys.argv else 20
    seed0 = int(sys.argv[sys.argv.index("--seed") + 1]) \
        if "--seed" in sys.argv else 0
    rng = np.random.default_rng(20260818 + seed0)

    def tuples(m):
        return sorted(zip(m.refpos.tolist(), m.qpos.tolist(),
                          m.length.tolist()))

    t00 = time.time()
    for t in range(trials):
        size = int(rng.integers(3_000, 60_000))
        sub = float(rng.uniform(0.002, 0.05))
        ind = float(rng.uniform(0.0, 0.01))
        minlen = int(rng.integers(12, 51))
        mode = MatchMode(str(rng.choice(["mem", "mem", "mem", "mum", "mam"])))
        ref = random_genome(size, seed=int(rng.integers(1 << 30)))
        if rng.random() < 0.5:
            ref = with_n_runs(ref, int(rng.integers(1, 4)),
                              int(rng.integers(5, 60)),
                              seed=int(rng.integers(1 << 30)))
        qry = mutate(ref, sub, ind, seed=int(rng.integers(1 << 30)))
        if rng.random() < 0.3:
            qry = with_n_runs(qry, 1, int(rng.integers(5, 40)),
                              seed=int(rng.integers(1 << 30)))
        idx = build_index(ref)

        base_cfg = Config(min_length=minlen, mode=mode)
        want = tuples(apply_mode_filter(
            find_seed_matches(idx, qry, base_cfg), base_cfg))
        if size <= 25_000:  # oracle is the ground truth where affordable
            exp = sorted(map(tuple, oracle_matches(ref, qry, minlen, mode.value)))
            assert want == exp, (t, size, minlen, mode.value, "oracle mismatch",
                                 len(want), len(exp))

        # variant battery, all must agree with the default engine
        variants = []
        for fe in ("join", "bucket"):
            variants.append(Config(min_length=minlen, mode=mode,
                                   frontend=fe))
        variants.append(Config(min_length=minlen, mode=mode,
                               sparse_seeds="off"))
        if mode.value == "mem":
            variants.append(Config(min_length=minlen, mode=mode,
                                   match_backend="boundary"))
        cap = int(rng.choice([256, 1024, 1 << 22]))
        variants.append(Config(min_length=minlen, mode=mode,
                               pair_capacity=cap))
        for cfg in variants:
            got = tuples(apply_mode_filter(
                find_seed_matches(idx, qry, cfg), cfg))
            assert got == want, (t, size, minlen, mode, cfg.frontend,
                                 cfg.sparse_seeds, cfg.match_backend,
                                 cfg.pair_capacity, len(got), len(want))
        ndev = int(rng.choice([2, 4, 8]))
        cfg = Config(min_length=minlen, mode=mode)
        got = tuples(apply_mode_filter(
            find_seed_matches_sharded(idx, qry, cfg, make_mesh(ndev)), cfg))
        assert got == want, (t, size, minlen, mode, f"sharded{ndev}",
                             len(got), len(want))
        # virtual slabs (r5): same multi-slab program, one device, slab
        # count drawn independently of any device count
        nsl = int(rng.choice([2, 3, 5, 8]))
        got = tuples(apply_mode_filter(
            find_seed_matches_sharded(idx, qry, cfg, None, n_slabs=nsl),
            cfg))
        assert got == want, (t, size, minlen, mode, f"virtual{nsl}",
                             len(got), len(want))
        print(f"trial {t}: size={size} L={minlen} mode={mode} "
              f"matches={len(want)} ok ({time.time() - t00:.0f}s)",
              flush=True)
        if (t + 1) % 5 == 0:
            # every trial compiles fresh random shapes; without draining
            # the jit executable cache + the device-table caches the
            # process accumulates ~4.5 GB/trial of host RAM and dies with
            # LLVM 'Cannot allocate memory' around trial 27 (r4 repro)
            from slamem_tpu.utils.devcache import clear_device_caches

            clear_device_caches()
            jax.clear_caches()
    print("SOAK OK", trials, "trials")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
