"""LCP array construction — capability parity with lcparray.c (SURVEY.md §2).

The reference derives a *sampled* LCP array during BWT construction to save
2014-era RAM; here the full LCP array is computed by a fully-vectorized
O(n log n) method and consumed through a block-minimum pyramid
(kernels/lcp_search.py) that answers the same parent-interval queries the
sampled structure served, branchlessly and batched.

Construction: re-run the prefix-doubling rounds keeping every rank array
(rank_t distinguishes prefixes of length 2^t), then resolve
lcp(sa[j-1], sa[j]) for all adjacent pairs at once by binary descent:
h += 2^t wherever rank_t[a+h] == rank_t[b+h]. Each level is one
gather+compare over all pairs — no sequential Kasai scan anywhere.

Rank equality at level t implies both suffixes have >= 2^t characters left
and they agree on all of them (truncated suffixes get -1 components and
specials carry unique ranks, so equality never crosses an N, a separator or
the text end) — which is exactly the lcp semantics the engines need.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slamem_tpu.index.build import _doubling_round, initial_ranks


def _rank_rounds(text: jax.Array) -> list[jax.Array]:
    """All doubling rank arrays: rounds[t] distinguishes 2^t-char prefixes."""
    n = int(text.shape[0])
    rank = initial_ranks(text)
    rounds = [rank]
    k = 1
    while True:
        rank, max_rank = _doubling_round(rank, jnp.int32(k))
        rounds.append(rank)
        if int(max_rank) == n - 1 or k >= n:
            break
        k *= 2
    return rounds


@jax.jit
def _descend(a: jax.Array, b: jax.Array, h: jax.Array, rt: jax.Array,
             step: jax.Array) -> jax.Array:
    n = rt.shape[0]
    ia = jnp.clip(a + h, max=n - 1)
    ib = jnp.clip(b + h, max=n - 1)
    eq = (rt[ia] == rt[ib]) & (a + h < n) & (b + h < n)
    return jnp.where(eq, h + step, h)


def lcp_adjacent(text: jax.Array, sa: jax.Array) -> jax.Array:
    """LCP[j] = lcp(suffix sa[j-1], suffix sa[j]); LCP[0] = 0. int32 (n,)."""
    n = int(sa.shape[0])
    if n <= 1:
        return jnp.zeros((n,), jnp.int32)
    rounds = _rank_rounds(text)
    a = sa[:-1].astype(jnp.int64)
    b = sa[1:].astype(jnp.int64)
    h = jnp.zeros((n - 1,), jnp.int64)
    for t in reversed(range(len(rounds))):
        h = _descend(a, b, h, rounds[t], jnp.int64(1 << t))
    return jnp.concatenate([jnp.zeros((1,), jnp.int32), h.astype(jnp.int32)])
