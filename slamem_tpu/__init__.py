"""slamem_tpu — a TPU-native maximal-exact-match (MEM) finding engine.

A from-scratch re-design of the capabilities of fjdf/slaMEM (Fernandes &
Freitas, Bioinformatics 2014) for TPU hardware: the FM-index build runs as a
JAX sort/scan pipeline, and the query path is a batched, data-parallel
seed-and-run pipeline (sorted-suffix search + diagonal run extraction) plus a
backward-search scan engine, instead of the reference's sequential
pointer-chasing loop.

Reference parity notes cite SURVEY.md sections (the reference mount was empty;
SURVEY.md is the authoritative spec for this project).
"""

__version__ = "0.1.0"

import jax as _jax

# The index build packs (rank, rank@+k) pairs and the seed engine packs
# K<=31-mers into int64 sort keys; without x64 jax silently downcasts them to
# int32 and corrupts both. Enabled once, package-wide, before any tracing.
_jax.config.update("jax_enable_x64", True)

from slamem_tpu.config import Config, MatchMode  # noqa: F401
