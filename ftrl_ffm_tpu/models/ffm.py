"""Field-aware factorization machine with FTRL (reference: src/model/ffm.cpp).

Factor table layout matches the reference: each feature row holds
n_fields * n_factors weights, slot (field, k) = field * n_factors + k
(reference: src/model/ffm.cpp:17-28, :63-65).  The pairwise m<n loop becomes a
field-bucketed contraction (see ops/interactions.py::ffm_logits_and_grads).

Note: the reference's v_sif2 update uses `v_gif2 * v_gif1` where the FTRL
recurrence calls for `v_gif2 * v_gif2` (src/model/ffm.cpp:118) — an apparent
typo we deliberately do NOT reproduce.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ftrl_ffm_tpu.models.base import Batch, Model, ModelState
from ftrl_ffm_tpu.ops.interactions import ffm_logits_and_grads, linear_logits


class FFM(Model):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.n_fields = cfg.n_fields
        self.n_factors = cfg.n_factors
        # the interaction math runs over field_pad >= n_fields fields; the
        # extra fields never occur, so their slots are inert (Config.field_pad)
        self.field_pad = cfg.field_pad

    def _export_vec_layout(self, vec_w):
        from ftrl_ffm_tpu.ops.layout import kmajor_to_reference

        return kmajor_to_reference(
            vec_w, self.n_fields, self.n_factors, self.field_pad
        )

    def _import_vec_layout(self, vec_w):
        from ftrl_ffm_tpu.ops.layout import reference_to_kmajor

        return reference_to_kmajor(
            vec_w, self.n_fields, self.n_factors, self.field_pad
        )

    def _use_pallas(self) -> bool:
        mode = self.cfg.use_pallas
        if mode == "on":
            return True
        if mode == "off":
            return False
        return jax.default_backend() == "tpu"

    def _emits_combined(self) -> bool:
        return self._use_pallas()

    def _emits_aug_combined(self) -> bool:
        return self._use_pallas()

    def _train_grads(
        self,
        state: ModelState,
        batch: Batch,
        split: bool,
        payload_dtype=None,
        aug: bool = False,
    ):
        """Fused Pallas path on TPU: one VMEM pass computes logits and the
        FTRL payload — no [B, F, C*K] HBM intermediates and no concat (the
        kernel writes the combined [B*F, 2E] layout, or separate g/g2 for
        the huge-table in-place update, directly; payload_dtype bf16 halves
        its write + the scatter's read/RMW bytes)."""
        b = batch.feats.shape[0]
        if not self._use_pallas() or b % 8:
            return super()._train_grads(state, batch, split, payload_dtype)
        from ftrl_ffm_tpu.ops.ffm_pallas import ffm_fused_logits_grads

        w = self._gather_linear(state, batch.feats)
        lin = linear_logits(w, batch.vals, self.bias_weight(state))
        # flat [B*F, E] gather: single 2-D row-major stream into the kernel
        v = self._gather_vec(state, batch.feats.reshape(-1))
        do_aug = aug and not split and self.field_pad > self.n_fields
        logits, *payload = ffm_fused_logits_grads(
            v,
            batch.fields,
            batch.vals,
            lin,
            batch.y,
            batch.sample_w,
            self.field_pad,
            self.n_factors,
            compute_grads=True,
            combined_out=not split,
            out_dtype=payload_dtype or jnp.float32,
            # linear grad rides in dead lane (k=0, c=n_fields) of the
            # padded factor row (see Config.field_pad)
            aug_lane=self.n_fields if do_aug else -1,
        )
        return logits, tuple(payload), do_aug

    def _logits_and_grads(self, state: ModelState, batch: Batch, train: bool):
        w = self._gather_linear(state, batch.feats)
        lin = linear_logits(w, batch.vals, self.bias_weight(state))
        if not train and self._use_pallas() and batch.feats.shape[0] % 8 == 0:
            # inference-only fused kernel: the serving/eval hot path
            from ftrl_ffm_tpu.ops.ffm_pallas import ffm_fused_logits

            v = self._gather_vec(state, batch.feats.reshape(-1))
            logits = ffm_fused_logits(
                v, batch.fields, batch.vals, lin, self.field_pad, self.n_factors
            )
            return logits, None
        v = self._gather_vec(state, batch.feats)  # [B, F, C'*K]
        logits, dlogit_dv = ffm_logits_and_grads(
            v,
            batch.fields,
            batch.vals,
            lin,
            self.field_pad,
            self.n_factors,
            compute_grads=train,
        )
        return logits, dlogit_dv
