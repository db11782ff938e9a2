"""Mesh construction and state/batch sharding specs."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ftrl_ffm_tpu.models.base import ModelState


def make_mesh(
    data: int = 0,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "model") mesh.

    data == 0 means "use all remaining devices on the data axis".
    """
    devices = list(devices if devices is not None else jax.devices())
    if data <= 0:
        if len(devices) % model:
            raise ValueError(f"{len(devices)} devices not divisible by model={model}")
        data = len(devices) // model
    n = data * model
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    grid = np.array(devices[:n]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def rows_per_shard(n_rows: int, n_shards: int) -> int:
    return -(-n_rows // n_shards)


def padded_rows(n_rows: int, n_shards: int) -> int:
    """Table rows padded so every "model" shard holds an equal block."""
    return rows_per_shard(n_rows, n_shards) * n_shards


def state_pspecs(state: ModelState) -> ModelState:
    """PartitionSpec pytree: feature tables row-sharded on "model",
    bias/step replicated."""
    table_1d = P("model")
    table_2d = P("model", None)
    return ModelState(
        bias_n=P(),
        bias_z=P(),
        lin_n=table_1d,
        lin_z=table_1d,
        lin_w=table_1d,
        vec_n=None if state.vec_n is None else table_2d,
        vec_z=None if state.vec_z is None else table_2d,
        vec_w=None if state.vec_w is None else table_2d,
        step=P(),
    )


def pad_state_tables(state: ModelState, n_shards: int) -> ModelState:
    """Zero-pad table row counts to a multiple of the model-shard count.

    Padding rows sit past n_feats and are never addressed (valid ids are
    < n_feats; the batch-padding sentinel id == n_feats is masked out in the
    sharded step).  w-table padding is zero — padding rows are never gathered.
    """
    r = state.lin_n.shape[0]
    rp = padded_rows(r, n_shards)
    if rp == r:
        return state

    def pad(x):
        if x is None:
            return None
        widths = [(0, rp - r)] + [(0, 0)] * (x.ndim - 1)
        return jax.numpy.pad(x, widths)

    return state._replace(
        lin_n=pad(state.lin_n),
        lin_z=pad(state.lin_z),
        lin_w=pad(state.lin_w),
        vec_n=pad(state.vec_n),
        vec_z=pad(state.vec_z),
        vec_w=pad(state.vec_w),
    )


def shard_state(state: ModelState, mesh: Mesh) -> ModelState:
    """Pad tables and place the state with its canonical shardings."""
    n_shards = mesh.shape["model"]
    state = pad_state_tables(state, n_shards)
    specs = state_pspecs(state)

    def place(x, spec):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, spec))

    return ModelState(*(place(x, s) for x, s in zip(state, specs)))


def batch_pspecs() -> tuple:
    """Batch arrays row-sharded on "data", replicated on "model":
    (fields, feats, vals, y, sample_w)."""
    two_d = P("data", None)
    one_d = P("data")
    return (two_d, two_d, two_d, one_d, one_d)
