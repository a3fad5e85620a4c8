"""Batched multi-scan throughput mode (BASELINE.json config: "64 independent
scans vmapped on one host").

The reference is strictly single-scan (one CSfM object); here the whole
engine state is a pytree, so N independent scans are one vmap over the step
function, and the batch axis can additionally be sharded over a device mesh
("scan" axis) with pjit — data parallelism over scans."""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SfMConfig
from ..engine.state import SfMState, init_state, CameraParams
from ..engine.step import build_step


def init_batched_state(cfg: SfMConfig, batch: int) -> SfMState:
    """A batch of independent engine states with decorrelated RNG keys."""
    proto = init_state(cfg)
    state = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape).copy(), proto)
    return state._replace(key=jax.random.split(jax.random.PRNGKey(7), batch))


def build_batched_step(cfg: SfMConfig, cam: CameraParams):
    """(states [B,...], images [B,H,W]) -> (states, metrics) — one vmapped
    jitted step for the whole fleet of scans."""
    step = build_step(cfg, cam)
    return jax.vmap(step)


def build_sharded_step(cfg: SfMConfig, cam: CameraParams, mesh: Mesh,
                       axis: str = "scan"):
    """The batched step with the batch axis sharded over ``axis`` of the
    mesh: jit moves each scan's state+frame to its device; XLA inserts no
    collectives (scans are independent) so scaling is embarrassingly
    parallel over ICI-connected chips."""
    vstep = build_batched_step(cfg, cam)
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def spec_like(tree):
        return jax.tree.map(lambda _: shard, tree)

    def step(states, images):
        return vstep(states, images)

    return jax.jit(step, donate_argnums=(0,))


def shard_batched_state(state: SfMState, mesh: Mesh, axis: str = "scan"
                        ) -> SfMState:
    """Place a batched state with its leading axis sharded over the mesh."""
    shard = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, shard), state)
