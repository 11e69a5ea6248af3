"""Index save/load — the checkpoint story (SURVEY.md §5 "Checkpoint/resume").

The reference can avoid rebuilds by persisting its FM-index ([REPO-MEM:L]);
here the packed arrays serialize as a versioned npz. Query streaming is
restartable at batch granularity because the engine is stateless between
rounds; the index is the only artifact worth checkpointing.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from slamem_tpu.index.build import FMIndex

FORMAT_VERSION = 1


def save_index(path: str, index: FMIndex) -> None:
    np.savez_compressed(
        path,
        version=np.int64(FORMAT_VERSION),
        occ_block=np.int64(index.occ_block),
        text=np.asarray(index.text),
        sa=np.asarray(index.sa),
        bwt=np.asarray(index.bwt),
        occ_ckpt=np.asarray(index.occ_ckpt),
        counts=np.asarray(index.counts),
    )


def load_index(path: str) -> FMIndex:
    with np.load(path) as z:
        version = int(z["version"])
        if version != FORMAT_VERSION:
            raise ValueError(
                f"index file {path!r} has format version {version}, "
                f"this build reads version {FORMAT_VERSION}")
        index = FMIndex(
            text=jnp.asarray(z["text"]),
            sa=jnp.asarray(z["sa"]),
            bwt=jnp.asarray(z["bwt"]),
            occ_ckpt=jnp.asarray(z["occ_ckpt"]),
            counts=jnp.asarray(z["counts"]),
            occ_block=int(z["occ_block"]),
        )
        # digest from the host copy (build_index strips its appended
        # terminator before hashing; mirror that so save/load round-trips
        # key the same adaptive records)
        from slamem_tpu.engine.adaptive import text_digest
        from slamem_tpu.index.build import register_digest

        register_digest(index, text_digest(z["text"][:-1]))
        return index
