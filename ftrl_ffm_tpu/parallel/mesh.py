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


def interleave_ids(ids, n_shards: int, rows_local: int, n_feats: int):
    """Feature id -> physical table row under modulo-interleaved placement.

    Row placement is round-robin over model shards: feature id lives on shard
    (id % M) at local row (id // M), i.e. physical row
    p = (id % M) * rows_local + id // M.  This balances per-shard lookup load
    for both frequency-sorted ids and per-field vocab ranges — the "hash (or
    permutation-block) row placement" of SURVEY §2b:101 — while keeping each
    shard's physical block contiguous (M = 1 is the identity).  Ids >=
    n_feats (the batch padding sentinel and out-of-range ids, which the
    reference filters at src/model/ftrl_model.cpp:36-42) map to the global
    drop sentinel M * rows_local.
    """
    import jax.numpy as jnp

    ok = (ids >= 0) & (ids < n_feats)
    if n_shards == 1:
        # identity placement; still normalize sentinel/out-of-range ids
        return jnp.where(ok, ids, rows_local)
    p = (ids % n_shards) * rows_local + ids // n_shards
    return jnp.where(ok, p, n_shards * rows_local)


def interleave_table(tab, n_shards: int):
    """Logical (id-ordered) table rows -> physical interleaved placement."""
    if tab is None or n_shards == 1:
        return tab
    rp = tab.shape[0]
    rl = rp // n_shards
    ids = np.arange(rp)
    # physical row (id % M) * Rl + id // M holds logical row id
    inv = np.empty(rp, np.int64)
    inv[(ids % n_shards) * rl + ids // n_shards] = ids
    return tab[inv]


def deinterleave_table(tab, n_shards: int):
    """Physical interleaved rows -> logical id order (for export/tests)."""
    if tab is None or n_shards == 1:
        return tab
    rp = tab.shape[0]
    rl = rp // n_shards
    ids = np.arange(rp)
    return tab[(ids % n_shards) * rl + ids // n_shards]


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
    """Pad tables, interleave rows over model shards, place with canonical
    shardings.  The placed state is in PHYSICAL row order (see
    interleave_ids); unshard_state inverts."""
    n_shards = mesh.shape["model"]
    state = pad_state_tables(state, n_shards)
    specs = state_pspecs(state)

    def place(x, spec):
        if x is None:
            return None
        if spec in (P("model"), P("model", None)):
            x = interleave_table(np.asarray(x), n_shards)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return ModelState(*(place(x, s) for x, s in zip(state, specs)))


def unshard_state(state: ModelState, n_shards: int, n_feats: int) -> ModelState:
    """Sharded physical state -> host-local logical state (id row order,
    sliced back to n_feats rows).  The inverse of shard_state for tests,
    export and checkpointing."""
    def back(x, is_table):
        if x is None:
            return None
        if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
            # multi-host: gather the global array onto every host first
            from jax.experimental import multihost_utils

            x = multihost_utils.process_allgather(x, tiled=True)
        x = np.asarray(x)
        if is_table:
            x = deinterleave_table(x, n_shards)[:n_feats]
        # host numpy out: every caller (checkpoint writer, exports, tests)
        # consumes bytes on host — a device put here would round-trip the
        # full logical tables through device-0 HBM (~15 GB at 1M rows)
        return x

    return ModelState(
        bias_n=back(state.bias_n, False),
        bias_z=back(state.bias_z, False),
        lin_n=back(state.lin_n, True),
        lin_z=back(state.lin_z, True),
        lin_w=back(state.lin_w, True),
        vec_n=back(state.vec_n, True),
        vec_z=back(state.vec_z, True),
        vec_w=back(state.vec_w, True),
        step=back(state.step, False),
    )


# batch_pspecs lives in parallel/sharded.py (parameterized by lookup mode)
