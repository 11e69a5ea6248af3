#!/usr/bin/env python
"""Sharded == replicated equality at >= 32 Mbp on the fake 8-device mesh.

VERDICT r4 missing #1 asked for sharded-path correctness evidence beyond
the 2 Mbp tests: this script runs BASELINE config #5's program shapes at
32 Mbp reference / 8 Mbp query (dissimilar-genome mutation rates, -l 50)
on the CPU backend with 8 fake devices and asserts three engines agree
exactly:

  * replicated fused engine (the chr1 headline path),
  * mesh-sharded engine (8 SA-rank slabs, one per fake device),
  * virtual-slab engine (8 slabs iterated on ONE device — the program the
    real single-chip bench runs at 250 Mbp).

It also logs the slab memory account (per-slab table bytes, per-device
buffer bytes at the converged plan) and the process RSS high-water, so
"the slab tables fit" is a recorded number, not an assumption.

Writes sharded_scale.log (committed). Runtime ~10-20 min on 4 CPU cores.
"""

import os
import resource
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["SLAMEM_ADAPTIVE_DISK"] = "0"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

SIZE = 32_000_000
QUERY = 8_000_000
MINLEN = 50

LOG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "sharded_scale.log")


def main() -> int:
    t0 = time.perf_counter()
    lines: list[str] = []

    def log(msg: str) -> None:
        line = f"[{time.perf_counter() - t0:8.1f}s] {msg}"
        print(line, flush=True)
        lines.append(line)

    import jax

    # the sandbox sitecustomize imports jax before this script's env vars
    # exist; the config update retargets the backend as long as none has
    # initialized yet (same dance as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8
    import numpy as np

    from slamem_tpu.config import Config
    from slamem_tpu.dist.mesh import make_mesh
    from slamem_tpu.dist import sharded
    from slamem_tpu.engine import seed_mode
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    log(f"inputs: {SIZE/1e6:.0f} Mbp ref / {QUERY/1e6:.0f} Mbp query, "
        f"-l {MINLEN}, sub 3% indel 0.3% (config #5 statistics)")
    ref, qry = strain_pair(SIZE, seed=20260820, sub_rate=0.03,
                           indel_rate=0.003)
    qry = qry[:QUERY]
    log("index build (CPU, prefix doubling): start")
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    log(f"index build: done (n={index.n})")

    cfg = Config(min_length=MINLEN)
    mesh = make_mesh(8)

    def tuples(m):
        return sorted(zip(m.refpos.tolist(), m.qpos.tolist(),
                          m.length.tolist()))

    log("replicated engine: start")
    m_rep = seed_mode.find_seed_matches(index, qry, cfg)
    t_rep = tuples(m_rep)
    log(f"replicated: {len(t_rep)} matches, stats={m_rep.stats}")

    log("mesh-sharded engine (8 devices x 1 slab): start")
    m_mesh = sharded.find_seed_matches_sharded(index, qry, cfg, mesh)
    t_mesh = tuples(m_mesh)
    log(f"mesh-sharded: {len(t_mesh)} matches, stats={m_mesh.stats}")

    log("virtual-slab engine (1 device x 8 slabs): start")
    m_virt = sharded.find_seed_matches_sharded(index, qry, cfg, None,
                                               n_slabs=8)
    t_virt = tuples(m_virt)
    log(f"virtual-slab: {len(t_virt)} matches, stats={m_virt.stats}")

    ok = t_rep == t_mesh == t_virt and len(t_rep) > 0
    log(f"EQUALITY: replicated == mesh-sharded == virtual-slab -> {ok} "
        f"({len(t_rep)} matches)")

    # ---- slab memory account (the "does it fit" number) ----
    k, stride, _ = seed_mode.choose_seed_plan(index.n, int(
        seed_mode.pad_query(qry).shape[0]), cfg)
    refk_p, sa_p, starts_st, bases, lasts, shift, probes, slab = \
        sharded.virtual_slab_tables(index, k, 8)
    tab = {
        "refk_words_bytes": sum(int(np.prod(w.shape)) * 4 for w in refk_p),
        "sa_bytes": int(np.prod(sa_p.shape)) * 4,
        "slab_bucket_tables_bytes": int(np.prod(starts_st.shape)) * 4,
        "slab_rows": slab, "shift": shift, "probes": probes,
    }
    per_dev = {
        "slab_refk_bytes": slab * 4 * len(refk_p),
        "slab_sa_bytes": slab * 4,
        "slab_bucket_table_bytes": int(starts_st.shape[1]) * 4,
    }
    log(f"slab tables (8 slabs, total): {tab}")
    log(f"per-device slab footprint: {per_dev} "
        f"(= {sum(per_dev.values())/1e6:.1f} MB/device at 32 Mbp; "
        f"x{250/32:.1f} at chr1 = "
        f"{sum(per_dev.values())*250/32/1e9:.2f} GB/device)")
    wb = int(m_mesh.stats["pairs"])
    log(f"pair mass: mesh {wb}, virtual {m_virt.stats['pairs']}, "
        f"replicated {m_rep.stats['pairs']}")
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    log(f"process RSS high-water: {rss_gb:.2f} GB "
        f"(all three engines + 8 fake devices in one address space)")
    log(f"RESULT: {'PASS' if ok else 'FAIL'}")

    with open(LOG, "w") as f:
        f.write("\n".join(lines) + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
