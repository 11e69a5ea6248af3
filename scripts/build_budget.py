#!/usr/bin/env python
"""chr1 index-build budget, term by term, MEASURED on the real chip.

VERDICT r4 #7: chr1 build_s (~64 s) dominates any cold config-#5 run;
write the 8f-style term budget for the build and try the one cheap lever
it exposes. Terms (each grounded on a host fetch — block_until_ready is
unreliable on the axon tunnel):

  * host->device text upload — plain uint8 vs the 2-bit packed wire
    (utils/pack2.py, now build_index's default for numpy inputs >= 1 MB);
  * initial_ranks dispatch;
  * each prefix-doubling round (host-looped _doubling_round so rounds are
    individually visible; production uses the fused _doubling_all
    while_loop — same rounds, one dispatch);
  * final argsort;
  * _finish_index (BWT + occ checkpoints + C[]);
  * end-to-end build_index for comparison (includes the while_loop
    fusion win over the host-looped sum).

Writes build_budget.log (committed). TPU-serialized: run alone.
"""

import os
import sys
import time

SIZE = int(os.environ.get("BUILD_BUDGET_SIZE", 250_000_000))
LOG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "build_budget.log")


def main() -> int:
    t0 = time.perf_counter()
    lines = []

    def log(msg):
        line = f"[{time.perf_counter() - t0:8.1f}s] {msg}"
        print(line, flush=True)
        lines.append(line)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from slamem_tpu.index import build as B
    from slamem_tpu.utils.pack2 import codes_to_device, pack_codes_2bit
    from slamem_tpu.utils.synth import strain_pair

    dev = jax.devices()[0]
    log(f"device: {dev} (platform {dev.platform})")
    ref, _ = strain_pair(SIZE, seed=20260816, sub_rate=0.03,
                         indel_rate=0.003)
    log(f"input: {SIZE/1e6:.0f} Mbp synthetic (chr1 bench statistics)")

    def timed(label, fn, n=2):
        ts = []
        for _ in range(n):
            t1 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t1)
        log(f"{label}: {min(ts):.3f}s (runs: "
            + ", ".join(f"{t:.3f}" for t in ts) + ")")
        return min(ts)

    # --- term 1: text upload, plain vs packed ---
    def plain_upload():
        t = jnp.asarray(ref.copy())            # cache-busted
        np.asarray(t[:1])

    def packed_upload():
        r = ref.copy()
        n = len(r)
        plane = r if n % 4 == 0 else np.concatenate(
            [r, np.zeros(4 - n % 4, np.uint8)])
        t = codes_to_device(plane, n)
        np.asarray(t[:1])

    t_up_plain = timed("upload plain uint8 (250 MB)", plain_upload)
    # host pack cost alone (numpy SWAR)
    t_pack = timed("host 2-bit pack (numpy SWAR)",
                   lambda: pack_codes_2bit(ref[:len(ref) // 4 * 4]))
    t_up_packed = timed("upload packed (62.5 MB plane + unpack)",
                        packed_upload)

    # --- terms 2-5: the build pipeline, round by round ---
    text = jnp.concatenate([jnp.asarray(ref), jnp.full((1,), 5, jnp.uint8)])
    np.asarray(text[:1])
    np_sz = B._padded_size(int(text.shape[0]))
    padded = jnp.concatenate(
        [text, jnp.full((np_sz - int(text.shape[0]),), 5, jnp.uint8)]) \
        if np_sz > int(text.shape[0]) else text

    def ground(x):
        np.asarray(x[:1] if hasattr(x, "shape") and x.ndim else x)

    t1 = time.perf_counter()
    rank = B.initial_ranks(padded)
    ground(rank)
    log(f"initial_ranks: {time.perf_counter() - t1:.3f}s")

    n_pad = int(padded.shape[0])
    k = 1
    rounds = 0
    while True:
        t1 = time.perf_counter()
        rank, max_rank = B._doubling_round(rank, jnp.int32(k))
        mr = int(np.asarray(max_rank))
        dt = time.perf_counter() - t1
        rounds += 1
        log(f"doubling round {rounds} (k={k}): {dt:.3f}s "
            f"(max_rank {mr} / {n_pad - 1})")
        if mr == n_pad - 1 or k >= n_pad:
            break
        k *= 2
    log(f"rounds to dense ranks: {rounds} (early exit at k={k})")

    t1 = time.perf_counter()
    sa = jnp.argsort(rank[:int(text.shape[0])]).astype(jnp.int32)
    ground(sa)
    t_argsort = time.perf_counter() - t1
    log(f"final argsort: {t_argsort:.3f}s")

    t1 = time.perf_counter()
    bwt, occ, counts = B._finish_index(text, sa, 128)
    ground(bwt)
    t_finish = time.perf_counter() - t1
    log(f"_finish_index (BWT + occ + C[]): {t_finish:.3f}s")

    # --- end to end (production path: packed upload + fused while_loop) ---
    def full_build():
        idx = B.build_index(ref.copy())
        jax.block_until_ready(idx.sa)
        ground(idx.sa)

    t_full = timed("build_index end-to-end (production)", full_build, n=2)
    log(f"BUDGET SUMMARY: upload {t_up_packed:.2f}s (plain would be "
        f"{t_up_plain:.2f}s; host pack {t_pack:.2f}s of it), "
        f"{rounds} doubling rounds, argsort {t_argsort:.2f}s, finish "
        f"{t_finish:.2f}s, production end-to-end {t_full:.2f}s")
    log("serving answer for repeated references remains -save/-load "
        "(index/serialize.py): the build is a one-time cost per reference")

    with open(LOG, "w") as f:
        f.write("\n".join(lines) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
