"""The sharded FTRL train/eval step: shard_map over a ("data", "model") mesh.

Replaces the reference's hogwild thread parallelism
(reference: src/task/ftrl_offline.cpp:85-100, per-feature mutexes at
src/include/model/ftrl_model.h:49) with deterministic SPMD:

  * batch row-sharded over "data";
  * (n, z, w) feature tables row-sharded over "model" in contiguous id blocks;
  * **lookup**: each table shard gathers its local w rows (others contribute
    0) and a `psum` over "model" assembles full weight rows on every device;
  * **update**: each device scatter-adds its batch shard's per-occurrence
    (g, g^2) into dense local-table-shaped accumulators, a `psum` over "data"
    completes the global per-feature sums, and one fused elementwise pass
    applies the closed-form FTRL step to the local rows — one deterministic
    update per feature id per step, no races by construction.

All collectives are XLA (`psum`) and ride ICI on a real slice.  The dense
G/G2 psum is the classic data-parallel gradient all-reduce; it is the right
choice while table shards fit comfortably in HBM (alternative for very large
tables: all_gather the [nnz] id/grad stream instead — smaller when
B*F*D << R_local*D).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ftrl_ffm_tpu.config import Config
from ftrl_ffm_tpu.ftrl import (
    FtrlParams,
    ftrl_accumulate,
    ftrl_weights,
    scatter_grads,
    select_ftrl_update,
    sparse_ftrl_update,
)
from ftrl_ffm_tpu.models.base import (
    Batch,
    ModelState,
    TrainOut,
    binary_logloss,
    widen_batch,
)
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
        train_out_specs = TrainOut(sspecs, P("data"), P(), P())
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

        # Multi-step variants: lax.scan over a [S, ...] stack of batches in
        # ONE dispatch — amortizes host->device dispatch latency (the analogue
        # of the reference's 20000-line consumer chunks, pc_task.h:34).
        multi_bspecs = Batch(*(P(None, *s) for s in batch_pspecs()))
        self.train_multi = jax.jit(
            shard_map(
                self._train_multi,
                mesh=mesh,
                in_specs=(sspecs, multi_bspecs),
                out_specs=(sspecs, P(), P()),
                check_vma=False,
            ),
            donate_argnums=0,
        )
        self.eval_multi = jax.jit(
            shard_map(
                self._eval_multi,
                mesh=mesh,
                in_specs=(sspecs, multi_bspecs),
                out_specs=(P(), P(), P(), P()),
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

    def _lookup_linear(self, lin_w, ids):
        """w rows for `ids`, assembled across table shards via psum("model").

        One gather per table — w is stored, like the reference's lin_w read in
        its hot loop (reference: src/model/ftrl_model.cpp:44-50)."""
        lid, mask = self._local_lookup_mask(lin_w.shape[0], ids)
        w = jnp.where(mask, jnp.take(lin_w, lid), 0.0)
        return jax.lax.psum(w, "model")

    def _lookup_vec(self, vec_w, ids):
        lid, mask = self._local_lookup_mask(vec_w.shape[0], ids)
        w = jnp.where(
            mask[..., None],
            jnp.take(vec_w, lid, axis=0),
            jnp.zeros((), vec_w.dtype),
        )
        # each element is owned by exactly one shard (others contribute 0),
        # so a bf16 psum is exact; compute continues in f32
        return jax.lax.psum(w, "model").astype(jnp.float32)

    def _logits_and_grads(self, state: ModelState, batch: Batch, train: bool):
        cfg = self.cfg
        ids = batch.feats  # [b, F] local
        bias_w = ftrl_weights(state.bias_n, state.bias_z, self.params)
        w_lin = self._lookup_linear(state.lin_w, ids)
        lin = linear_logits(w_lin, batch.vals, bias_w)
        if cfg.model_type == "LR":
            return lin, None
        v = self._lookup_vec(state.vec_w, ids)
        if cfg.model_type == "FM":
            logits, dv = fm_logits_and_grads(v, batch.vals, lin)
            return logits, (dv if train else None)
        logits, dv = ffm_logits_and_grads(
            v,
            batch.fields,
            batch.vals,
            lin,
            cfg.n_fields,
            cfg.n_factors,
            compute_grads=train,
        )
        return logits, dv

    def _train_logits_gvec(self, state: ModelState, batch: Batch):
        """(logits, gs-scaled factor grads) for the local batch shard.

        FFM on TPU routes through the fused Pallas kernel (ops/ffm_pallas.py)
        — pallas_call composes with shard_map since it is per-device local
        compute; collectives stay outside the kernel."""
        cfg = self.cfg
        b_local = batch.feats.shape[0]
        use_pallas = cfg.model_type == "FFM" and b_local % 8 == 0 and (
            cfg.use_pallas == "on"
            or (cfg.use_pallas == "auto" and jax.default_backend() == "tpu")
        )
        if use_pallas:
            from ftrl_ffm_tpu.ops.ffm_pallas import ffm_fused_logits_grads

            bias_w = ftrl_weights(state.bias_n, state.bias_z, self.params)
            w_lin = self._lookup_linear(state.lin_w, batch.feats)
            lin = linear_logits(w_lin, batch.vals, bias_w)
            v = self._lookup_vec(state.vec_w, batch.feats.reshape(-1))
            return ffm_fused_logits_grads(
                v,
                batch.fields,
                batch.vals,
                lin,
                batch.y,
                batch.sample_w,
                cfg.n_fields,
                cfg.n_factors,
                compute_grads=True,
            )
        logits, dv = self._logits_and_grads(state, batch, train=True)
        if dv is None:
            return logits, None, None
        gs = (jax.nn.sigmoid(logits) - batch.y) * batch.sample_w
        return logits, gs[:, None, None] * dv, None

    def _table_update(self, n_tab, z_tab, w_tab, ids, g, g2):
        """Global FTRL step on this device's table shard.

        Dense mode: local scatter-add into table-shaped accumulators +
        psum("data") (the classic dense-grad all-reduce) + fused closed-form
        pass.  Sparse mode (huge table shards): all_gather the (id, g, g^2)
        stream over "data" so each shard sees the whole global batch, then
        update touched local rows only — O(global nnz) temps instead of
        O(R_local).  ids may be batch-shaped [b, F] (dense scatters use
        batched index dims); the sparse path flattens."""
        tab_rows = n_tab.shape[0]
        row_width = n_tab.shape[1] if n_tab.ndim > 1 else 1
        nnz_local = ids.shape[0] * (ids.shape[1] if ids.ndim > 1 else 1)
        global_nnz = nnz_local * self.mesh.shape["data"]
        update = select_ftrl_update(
            tab_rows, row_width, global_nnz, self.cfg.update_mode
        )
        if update is sparse_ftrl_update:
            ids_g = jax.lax.all_gather(ids, "data", axis=0, tiled=True)
            g_g = jax.lax.all_gather(g, "data", axis=0, tiled=True)
            g2_g = jax.lax.all_gather(g2, "data", axis=0, tiled=True)
            lid, mask = self._local_lookup_mask(tab_rows, ids_g)
            lid = jnp.where(mask, lid, tab_rows)  # out-of-shard -> dropped
            return sparse_ftrl_update(n_tab, z_tab, w_tab, lid, g_g, g2_g, self.params)
        lid, mask = self._local_lookup_mask(tab_rows, ids)
        lid = jnp.where(mask, lid, tab_rows)  # out-of-shard -> drop sentinel
        sum_g, sum_g2 = scatter_grads(n_tab.shape, lid, g, g2)
        sum_g = jax.lax.psum(sum_g, "data")
        sum_g2 = jax.lax.psum(sum_g2, "data")
        w_f32 = w_tab.astype(n_tab.dtype)
        new_n, new_z = ftrl_accumulate(n_tab, z_tab, w_f32, sum_g, sum_g2, self.params)
        new_w = jnp.where(new_n > 0, ftrl_weights(new_n, new_z, self.params), w_f32)
        return new_n, new_z, new_w.astype(w_tab.dtype)

    # ---- steps (bodies run per device under shard_map) ----
    def _train_step(self, state: ModelState, batch: Batch):
        p = self.params
        batch = widen_batch(batch)
        logits, g_vec, g2_vec = self._train_logits_gvec(state, batch)
        gs = (jax.nn.sigmoid(logits) - batch.y) * batch.sample_w  # [b]

        # Bias: global grad sums over "data", replicated update.
        bias_w = ftrl_weights(state.bias_n, state.bias_z, p)
        sum_g = jax.lax.psum(jnp.sum(gs), "data")
        sum_g2 = jax.lax.psum(jnp.sum(gs * gs), "data")
        bias_n, bias_z = ftrl_accumulate(
            state.bias_n, state.bias_z, bias_w, sum_g, sum_g2, p
        )

        ids = batch.feats.reshape(-1)  # flat [b*F]
        g_lin = (gs[:, None] * batch.vals).reshape(-1)
        lin_n, lin_z, lin_w = self._table_update(
            state.lin_n, state.lin_z, state.lin_w, ids, g_lin, g_lin * g_lin
        )

        vec_n, vec_z, vec_w = state.vec_n, state.vec_z, state.vec_w
        if g_vec is not None:
            d = state.vec_w.shape[-1]
            g_vec = g_vec.reshape(ids.shape[0], d)
            g2_vec = g_vec * g_vec if g2_vec is None else g2_vec.reshape(ids.shape[0], d)
            vec_n, vec_z, vec_w = self._table_update(
                state.vec_n, state.vec_z, state.vec_w, ids, g_vec, g2_vec
            )

        count = jax.lax.psum(jnp.sum(batch.sample_w), "data")
        new_state = ModelState(
            bias_n=bias_n,
            bias_z=bias_z,
            lin_n=lin_n,
            lin_z=lin_z,
            lin_w=lin_w,
            vec_n=vec_n,
            vec_z=vec_z,
            vec_w=vec_w,
            step=state.step + (count > 0).astype(jnp.int32),
        )
        per_loss = binary_logloss(logits, batch.y) * batch.sample_w
        loss_sum = jax.lax.psum(jnp.sum(per_loss), "data")
        return TrainOut(new_state, logits, loss_sum, count)

    def _eval_step(self, state: ModelState, batch: Batch):
        batch = widen_batch(batch)
        logits, _ = self._logits_and_grads(state, batch, train=False)
        per_loss = binary_logloss(logits, batch.y) * batch.sample_w
        loss_sum = jax.lax.psum(jnp.sum(per_loss), "data")
        count = jax.lax.psum(jnp.sum(batch.sample_w), "data")
        return loss_sum, count, logits

    # ---- multi-step (scan) bodies ----
    def _train_multi(self, state: ModelState, batches: Batch):
        def body(st, b):
            out = self._train_step(st, b)
            return out.state, (out.loss_sum, out.count)

        state, (ls, ct) = jax.lax.scan(body, state, batches)
        return state, jnp.sum(ls), jnp.sum(ct)

    def _eval_multi(self, state: ModelState, batches: Batch):
        from ftrl_ffm_tpu.metrics import AUC_BINS as bins, StreamingAUC

        def body(carry, b):
            ls0, ct0, pos0, neg0 = carry
            b = widen_batch(b)
            logits, _ = self._logits_and_grads(state, b, train=False)
            per_loss = binary_logloss(logits, b.y) * b.sample_w
            pos, neg = StreamingAUC.bucket_counts(logits, b.y, b.sample_w, bins)
            return (
                ls0 + jnp.sum(per_loss),
                ct0 + jnp.sum(b.sample_w),
                pos0 + pos,
                neg0 + neg,
            ), None

        init = (
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
            jnp.zeros((bins,), jnp.float32),
            jnp.zeros((bins,), jnp.float32),
        )
        (ls, ct, pos, neg), _ = jax.lax.scan(body, init, batches)
        return (
            jax.lax.psum(ls, "data"),
            jax.lax.psum(ct, "data"),
            jax.lax.psum(pos, "data"),
            jax.lax.psum(neg, "data"),
        )

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

    def place_batch_multi(self, arrays) -> Batch:
        """Place a [S, ...]-stacked batch group (leading dim unsharded)."""
        specs = [P(None, *s) for s in batch_pspecs()]
        put = lambda a, s: jax.device_put(a, NamedSharding(self.mesh, s))
        return Batch(*(put(a, s) for a, s in zip(arrays, specs)))
