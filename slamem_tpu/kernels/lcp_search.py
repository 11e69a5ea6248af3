"""Batched, branchless LCP-interval queries (SURVEY.md §2 kernels/lcp_search).

The reference answers "parent LCP interval" queries by binary search over its
sampled LCP array, one query at a time. Here the primitive is PSV/NSV
(previous/next smaller value) over the full LCP array through an F-ary
block-minimum pyramid: every query is a fixed number of 128-wide masked
gather+reduce steps — no data-dependent branching, thousands of lanes in
lockstep, which is the shape the VPU wants.

Queries served:
  * psv(j, v): largest i <= j with LCP[i] <  v   (left edge of an expansion)
  * nsv(j, v): smallest i >= j with LCP[i] < v   (right edge)
  * expand(l, r, v): the SA range of the enclosing interval at depth >= v —
    i.e. I(*, v) from any deeper interval [l, r): one psv + one nsv;
  * parent depth of [l, r): max(LCP[l], LCP[r]).

Sentinels: position 0 and position n carry LCP -1, so every query resolves
without bounds logic (depth-0 expansion returns the full range [0, n)).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

F = 128  # pyramid fan-out: one VPU-lane-width gather+reduce per level

_NEG = jnp.int32(-1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LcpPyramid:
    """LCP array + block minima; all engines share one instance per index."""

    levels: tuple[jax.Array, ...]  # levels[0] = LCP_ext (n+1,), then minima
    n: int                         # number of SA rows

    def tree_flatten(self):
        return (self.levels, self.n)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(levels=tuple(children), n=aux)

    @classmethod
    def build(cls, lcp: jax.Array) -> "LcpPyramid":
        """lcp: (n,) int32 with lcp[0] arbitrary (overwritten by sentinel)."""
        n = int(lcp.shape[0])
        ext = jnp.concatenate(
            [_NEG[None], lcp[1:].astype(jnp.int32), _NEG[None]])  # (n+1,)
        levels = [ext]
        cur = ext
        while cur.shape[0] > F:
            pad = (-cur.shape[0]) % F
            padded = jnp.concatenate(
                [cur, jnp.full((pad,), jnp.iinfo(jnp.int32).max, jnp.int32)])
            cur = padded.reshape(-1, F).min(axis=1)
            levels.append(cur)
        return cls(levels=tuple(levels), n=n)


def _last_below(vals: jax.Array, upto: jax.Array, v: jax.Array) -> jax.Array:
    """Per lane: largest idx <= upto with vals[lane, idx] < v, else -1."""
    idx = jnp.arange(F, dtype=jnp.int32)[None, :]
    hit = (vals < v[:, None]) & (idx <= upto[:, None])
    return jnp.max(jnp.where(hit, idx, -1), axis=1)


def _first_below(vals: jax.Array, frm: jax.Array, v: jax.Array) -> jax.Array:
    """Per lane: smallest idx >= frm with vals[lane, idx] < v, else F."""
    idx = jnp.arange(F, dtype=jnp.int32)[None, :]
    hit = (vals < v[:, None]) & (idx >= frm[:, None])
    return jnp.min(jnp.where(hit, idx, F), axis=1)


def _gather_block(level: jax.Array, block: jax.Array) -> jax.Array:
    base = block[:, None] * F + jnp.arange(F, dtype=block.dtype)[None, :]
    size = level.shape[0]
    safe = jnp.clip(base, max=size - 1)
    vals = level[safe]
    return jnp.where(base < size, vals, jnp.iinfo(jnp.int32).max)


def psv(pyr: LcpPyramid, j: jax.Array, v: jax.Array) -> jax.Array:
    """Batched previous-smaller-value; j int32 (B,), v int32 (B,).

    Always resolves (sentinel at 0). Ascends the pyramid until the partial
    block left of j contains a value < v, then descends to the exact index.
    """
    j = j.astype(jnp.int32)
    v = v.astype(jnp.int32)
    nlev = len(pyr.levels)
    # Ascend: per level, the last qualifying index within the partial block.
    pos = j
    found = jnp.full(j.shape, -1, jnp.int32)      # level at which a hit exists
    hit_idx = jnp.zeros(j.shape, jnp.int32)       # index within that level
    for t in range(nlev):
        blk = pos // F
        off = pos - blk * F
        vals = _gather_block(pyr.levels[t], blk)
        cand = _last_below(vals, off, v)
        ok = (cand >= 0) & (found < 0)
        found = jnp.where(ok, t, found)
        hit_idx = jnp.where(ok, blk * F + cand, hit_idx)
        pos = blk - 1  # next level examines strictly-left blocks
    # Descend: a hit at level t names a block at level t-1, and so on.
    res = hit_idx
    for t in range(nlev - 1, 0, -1):
        active = found >= t
        blk = res  # index within level t == block id within level t-1
        vals = _gather_block(pyr.levels[t - 1], blk)
        cand = _last_below(vals, jnp.full(res.shape, F - 1, jnp.int32), v)
        res = jnp.where(active, blk * F + cand, res)
    return res


def nsv(pyr: LcpPyramid, j: jax.Array, v: jax.Array) -> jax.Array:
    """Batched next-smaller-value (sentinel at n resolves every query)."""
    j = j.astype(jnp.int32)
    v = v.astype(jnp.int32)
    nlev = len(pyr.levels)
    pos = j
    found = jnp.full(j.shape, -1, jnp.int32)
    hit_idx = jnp.zeros(j.shape, jnp.int32)
    for t in range(nlev):
        blk = pos // F
        off = pos - blk * F
        vals = _gather_block(pyr.levels[t], blk)
        cand = _first_below(vals, off, v)
        ok = (cand < F) & (found < 0)
        found = jnp.where(ok, t, found)
        hit_idx = jnp.where(ok, blk * F + cand, hit_idx)
        pos = blk + 1
    res = hit_idx
    for t in range(nlev - 1, 0, -1):
        active = found >= t
        blk = res
        vals = _gather_block(pyr.levels[t - 1], blk)
        cand = _first_below(vals, jnp.zeros(res.shape, jnp.int32), v)
        res = jnp.where(active, blk * F + cand, res)
    return res


def expand(pyr: LcpPyramid, l: jax.Array, r: jax.Array, v: jax.Array
           ) -> tuple[jax.Array, jax.Array]:
    """Enclosing SA range at depth >= v of intervals [l, r) (batched).

    Rows [l', r') share a prefix of length >= v with each other; v <= 0
    returns the full range. Requires the true interval depth >= v.
    """
    lp = psv(pyr, l, v)
    rp = nsv(pyr, r, v)
    return lp, rp


def parent_depth(pyr: LcpPyramid, l: jax.Array, r: jax.Array) -> jax.Array:
    """Depth of the parent lcp-interval of [l, r): max(LCP[l], LCP[r]).

    Clamped at 0 (the root interval); sentinel -1 entries make boundary
    handling automatic.
    """
    ext = pyr.levels[0]
    ln = jnp.clip(l.astype(jnp.int32), 0, pyr.n)
    rn = jnp.clip(r.astype(jnp.int32), 0, pyr.n)
    return jnp.maximum(jnp.maximum(ext[ln], ext[rn]), 0)
