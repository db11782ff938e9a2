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

from ftrl_ffm_tpu.models.base import Batch, Model, ModelState
from ftrl_ffm_tpu.ops.interactions import ffm_logits_and_grads, linear_logits


class FFM(Model):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.n_fields = cfg.n_fields
        self.n_factors = cfg.n_factors

    def _logits_and_grads(self, state: ModelState, batch: Batch, train: bool):
        w = self._gather_linear(state, batch.feats)
        lin = linear_logits(w, batch.vals, self.bias_weight(state))
        v = self._gather_vec(state, batch.feats)  # [B, F, C*K]
        logits, dlogit_dv = ffm_logits_and_grads(
            v,
            batch.fields,
            batch.vals,
            lin,
            self.n_fields,
            self.n_factors,
            compute_grads=train,
        )
        return logits, dlogit_dv
