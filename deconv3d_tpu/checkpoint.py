"""Checkpoint / resume of sampler state (SURVEY.md §5.3–5.4).

The reference only persists at end-of-run (``run.save()``); a crash loses
everything.  Here the full sampler state — including the RNG key — is a
pytree, so a checkpoint is a complete, bit-exact resume point: a run
resumed from sweep k produces the identical chain to an uninterrupted run
(guaranteed by test_sampler.test_segmented_equals_single_run +
test_checkpoint roundtrips).

Format: a single NPZ holding the flattened pytree leaves plus a treedef
fingerprint; small, portable, no orbax dependency in the core path.
"""

from __future__ import annotations

import json
from typing import Tuple

import jax
import numpy as np

from .sampler import SamplerState


def _normalize(path: str) -> str:
    """np.savez appends '.npz' to extensionless paths; load must match."""
    return path if path.endswith(".npz") else path + ".npz"


def save_state(path: str, state: SamplerState, meta: dict | None = None) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload["treedef"] = np.array(str(treedef))
    payload["meta"] = np.array(json.dumps(meta or {}))
    np.savez(_normalize(path), **payload)


def save_state_orbax(path: str, state: SamplerState,
                     meta: dict | None = None, async_: bool = False):
    """Orbax-backed checkpoint (multi-host-capable; optional async writes).

    The NPZ format above is the default (small, dependency-light,
    single-host).  Orbax adds: sharded multi-host saves (each host writes
    its shards), atomic directory commits, and async background writes —
    the right backend once a Run spans hosts (SURVEY.md §5.4 / ROADMAP r1
    item 6).  ``path`` is a directory.  Returns the checkpointer when
    ``async_`` (caller must ``.wait_until_finished()`` before exit).
    """
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = (
        ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        if async_ else ocp.StandardCheckpointer()
    )
    meta_bytes = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    ).copy()  # strings are not a StandardCheckpointHandler leaf type
    payload = {
        "state": jax.tree_util.tree_map(np.asarray, state),
        "meta": {"json": meta_bytes},
    }
    ckptr.save(path, payload, force=True)
    if async_:
        return ckptr
    ckptr.close()
    return None


def load_state_orbax(path: str, like: SamplerState) -> Tuple[SamplerState, dict]:
    """Restore an orbax checkpoint into the structure of ``like``."""
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    # orbax restores pytrees as name-keyed dicts; rebuild the dataclass by
    # field name (leaf ORDER differs: dicts come back alphabetical)
    state = type(like)(**restored["state"])
    meta = json.loads(bytes(np.asarray(restored["meta"]["json"],
                                       dtype=np.uint8)).decode())
    return state, meta


def load_state(path: str, like: SamplerState) -> Tuple[SamplerState, dict]:
    """Restore state into the structure of ``like`` (shape/dtype template)."""
    with np.load(_normalize(path)) as z:
        like_leaves, treedef = jax.tree_util.tree_flatten(like)
        if str(treedef) != str(z["treedef"]):
            raise ValueError(
                f"checkpoint treedef mismatch: {z['treedef']} vs {treedef}"
            )
        n = len(like_leaves)
        leaves = [z[f"leaf_{i}"] for i in range(n)]
        for i, (got, want) in enumerate(zip(leaves, like_leaves)):
            if got.shape != want.shape:
                raise ValueError(
                    f"checkpoint leaf {i} shape {got.shape} != {want.shape}"
                )
        meta = json.loads(str(z["meta"]))
    return jax.tree_util.tree_unflatten(treedef, leaves), meta
