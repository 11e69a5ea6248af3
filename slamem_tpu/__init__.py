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

# Compiles on tunneled/remote TPU backends cost minutes; persist them.
import os as _os

_cache_dir = _os.environ.get("SLAMEM_JAX_CACHE",
                             _os.path.expanduser("~/.cache/slamem_jax"))
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # cache is an optimization only
    pass

from slamem_tpu.config import Config, MatchMode  # noqa: F401
