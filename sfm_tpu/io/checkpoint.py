"""Checkpoint / resume (SURVEY.md §5 gap: the reference keeps map and poses
only in RAM).  The whole engine state is one pytree of arrays, so a
checkpoint is a flat npz; resuming restores bit-identical state."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SfMConfig
from ..engine.state import SfMState, init_state


def save_state(path: str, state: SfMState) -> None:
    leaves, treedef = jax.tree.flatten(state)
    np.savez_compressed(path, n=len(leaves),
                        **{f"leaf_{i}": np.asarray(l)
                           for i, l in enumerate(leaves)})


def load_state(path: str, cfg: SfMConfig) -> SfMState:
    proto = init_state(cfg)
    leaves, treedef = jax.tree.flatten(proto)
    z = np.load(path)
    n = int(z["n"])
    if n != len(leaves):
        raise ValueError(
            f"checkpoint has {n} leaves, config expects {len(leaves)} — "
            "was it saved with a different SfMConfig?")
    loaded = []
    for i, ref in enumerate(leaves):
        arr = z[f"leaf_{i}"]
        if arr.shape != ref.shape:
            raise ValueError(
                f"leaf {i}: checkpoint shape {arr.shape} != config shape "
                f"{ref.shape} — static capacities must match")
        loaded.append(jnp.asarray(arr))
    return jax.tree.unflatten(treedef, loaded)
