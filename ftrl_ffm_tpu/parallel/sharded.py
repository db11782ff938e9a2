"""The sharded FTRL train/eval step: shard_map over a ("data", "model") mesh.

Replaces the reference's hogwild thread parallelism
(reference: src/task/ftrl_offline.cpp:85-100, per-feature mutexes at
src/include/model/ftrl_model.h:49) with deterministic SPMD:

  * batch row-sharded over "data";
  * feature tables (n, z accumulators) row-sharded over "model" in contiguous
    id blocks;
  * **lookup**: each table shard gathers its local hits (others contribute 0)
    and a `psum` over "model" assembles full weight rows on every device;
  * **update**: per-occurrence grads are `all_gather`ed over "data" so every
    table shard sees the global batch's (id, g, g2) stream, then applies the
    closed-form FTRL step to its own rows only — one deterministic update per
    unique feature id per step, no races by construction.

All collectives are XLA (`psum`, `all_gather`) and ride ICI on a real slice.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ftrl_ffm_tpu.config import Config
from ftrl_ffm_tpu.ftrl import FtrlParams, dedup_and_update, ftrl_accumulate, ftrl_weights
from ftrl_ffm_tpu.models.base import Batch, ModelState, binary_logloss
from ftrl_ffm_tpu.ops.interactions import (
    ffm_logits_and_grads,
    fm_logits_and_grads,
    linear_logits,
)
from ftrl_ffm_tpu.parallel.mesh import batch_pspecs, state_pspecs


class ShardedStep:
    """Jitted sharded train/eval steps for one model config on one mesh."""

    def __init__(self, cfg: Config, mesh: Mesh, state: ModelState):
        self.cfg = cfg
        self.mesh = mesh
        self.params = FtrlParams(cfg.w_alpha, cfg.w_beta, cfg.w_l1, cfg.w_l2)
        self.n_feats = cfg.n_feats

        sspecs = state_pspecs(state)
        bspecs = Batch(*batch_pspecs())
        train_out_specs = (sspecs, P("data"), P(), P())
        self.train_step = jax.jit(
            shard_map(
                self._train_step,
                mesh=mesh,
                in_specs=(sspecs, bspecs),
                out_specs=train_out_specs,
                check_vma=False,
            ),
            donate_argnums=0,
        )
        eval_out_specs = (P(), P(), P("data"))
        self.eval_step = jax.jit(
            shard_map(
                self._eval_step,
                mesh=mesh,
                in_specs=(sspecs, bspecs),
                out_specs=eval_out_specs,
                check_vma=False,
            )
        )

    # ---- sharded table access (runs on per-device local views) ----
    def _local_lookup_mask(self, tab_rows: int, ids: jax.Array):
        """(local_ids, in_shard_mask) for this device's contiguous row block."""
        shard = jax.lax.axis_index("model")
        offset = shard * tab_rows
        mask = (ids >= offset) & (ids < offset + tab_rows) & (ids < self.n_feats)
        lid = jnp.clip(ids - offset, 0, tab_rows - 1)
        return lid, mask

    def _lookup_linear(self, lin_n, lin_z, ids):
        """w rows for `ids`, assembled across table shards via psum("model").

        The functional analogue of the reference's lazy update_linear_w
        (reference: src/model/ftrl_model.cpp:52-59), sharded."""
        lid, mask = self._local_lookup_mask(lin_n.shape[0], ids)
        w = ftrl_weights(jnp.take(lin_n, lid), jnp.take(lin_z, lid), self.params)
        w = jnp.where(mask, w, 0.0)
        return jax.lax.psum(w, "model")

    def _lookup_vec(self, vec_n, vec_z, vec_init, ids):
        lid, mask = self._local_lookup_mask(vec_n.shape[0], ids)
        vn = jnp.take(vec_n, lid, axis=0)
        vz = jnp.take(vec_z, lid, axis=0)
        w = ftrl_weights(vn, vz, self.params)
        if vec_init is not None:
            untouched = jnp.logical_and(vn == 0, vz == 0)
            w = jnp.where(untouched, jnp.take(vec_init, lid, axis=0), w)
        w = jnp.where(mask[..., None], w, 0.0)
        return jax.lax.psum(w, "model")

    def _logits_and_grads(self, state: ModelState, batch: Batch, train: bool):
        cfg = self.cfg
        ids = batch.feats  # [b, F] local
        bias_w = ftrl_weights(state.bias_n, state.bias_z, self.params)
        w_lin = self._lookup_linear(state.lin_n, state.lin_z, ids)
        lin = linear_logits(w_lin, batch.vals, bias_w)
        if cfg.model_type == "LR":
            return lin, None
        v = self._lookup_vec(state.vec_n, state.vec_z, state.vec_init, ids)
        if cfg.model_type == "FM":
            logits, dv = fm_logits_and_grads(v, batch.vals, lin)
            return logits, (dv if train else None)
        b, f, _ = v.shape
        v = v.reshape(b, f, cfg.n_fields, cfg.n_factors)
        logits, dv = ffm_logits_and_grads(
            v, batch.fields, batch.vals, lin, cfg.n_fields, compute_grads=train
        )
        if dv is not None:
            dv = dv.reshape(b, f, cfg.n_fields * cfg.n_factors)
        return logits, dv

    def _scatter_update(self, n_tab, z_tab, ids_flat, g, g2, w_init=None):
        """Global gradient stream -> this shard's FTRL update.

        ids/g/g2 are all_gathered over "data" (so the dedup sees the whole
        global batch), remapped to local row coordinates; out-of-shard ids hit
        the drop sentinel."""
        ids_g = jax.lax.all_gather(ids_flat, "data", axis=0, tiled=True)
        g_g = jax.lax.all_gather(g, "data", axis=0, tiled=True)
        g2_g = jax.lax.all_gather(g2, "data", axis=0, tiled=True)
        tab_rows = n_tab.shape[0]
        lid, mask = self._local_lookup_mask(tab_rows, ids_g)
        lid = jnp.where(mask, lid, tab_rows)  # sentinel -> dropped by scatter
        return dedup_and_update(n_tab, z_tab, lid, g_g, g2_g, self.params, w_init=w_init)

    # ---- steps (bodies run per device under shard_map) ----
    def _train_step(self, state: ModelState, batch: Batch):
        p = self.params
        logits, dlogit_dv = self._logits_and_grads(state, batch, train=True)
        gs = (jax.nn.sigmoid(logits) - batch.y) * batch.sample_w  # [b]

        # Bias: global grad sums over "data", replicated update.
        bias_w = ftrl_weights(state.bias_n, state.bias_z, p)
        sum_g = jax.lax.psum(jnp.sum(gs), "data")
        sum_g2 = jax.lax.psum(jnp.sum(gs * gs), "data")
        bias_n, bias_z = ftrl_accumulate(
            state.bias_n, state.bias_z, bias_w, sum_g, sum_g2, p
        )

        ids_flat = batch.feats.reshape(-1)
        g_lin = (gs[:, None] * batch.vals).reshape(-1)
        lin_n, lin_z = self._scatter_update(
            state.lin_n, state.lin_z, ids_flat, g_lin, g_lin * g_lin
        )

        vec_n, vec_z = state.vec_n, state.vec_z
        if dlogit_dv is not None:
            g_vec = (gs[:, None, None] * dlogit_dv).reshape(-1, dlogit_dv.shape[-1])
            vec_n, vec_z = self._scatter_update(
                state.vec_n,
                state.vec_z,
                ids_flat,
                g_vec,
                g_vec * g_vec,
                w_init=state.vec_init,
            )

        new_state = ModelState(
            bias_n=bias_n,
            bias_z=bias_z,
            lin_n=lin_n,
            lin_z=lin_z,
            vec_n=vec_n,
            vec_z=vec_z,
            vec_init=state.vec_init,
            step=state.step + 1,
        )
        per_loss = binary_logloss(logits, batch.y) * batch.sample_w
        loss_sum = jax.lax.psum(jnp.sum(per_loss), "data")
        count = jax.lax.psum(jnp.sum(batch.sample_w), "data")
        return new_state, logits, loss_sum, count

    def _eval_step(self, state: ModelState, batch: Batch):
        logits, _ = self._logits_and_grads(state, batch, train=False)
        per_loss = binary_logloss(logits, batch.y) * batch.sample_w
        loss_sum = jax.lax.psum(jnp.sum(per_loss), "data")
        count = jax.lax.psum(jnp.sum(batch.sample_w), "data")
        return loss_sum, count, logits

    # ---- host-side batch placement ----
    def place_batch(self, arrays) -> Batch:
        fields, feats, vals, y, sample_w = arrays
        specs = batch_pspecs()
        put = lambda a, s: jax.device_put(a, NamedSharding(self.mesh, s))
        return Batch(
            fields=put(fields, specs[0]),
            feats=put(feats, specs[1]),
            vals=put(vals, specs[2]),
            y=put(y, specs[3]),
            sample_w=put(sample_w, specs[4]),
        )
