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

from slamem_tpu.config import Config, MatchMode  # noqa: F401
