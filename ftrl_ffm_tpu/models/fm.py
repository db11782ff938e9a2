"""Factorization machine with FTRL (reference: src/model/fm.cpp).

Uses the O(F*K) sum-of-squares logit (reference: src/model/fm.cpp:40-67) and
the grad g = gs * (x * sum_vx - v * x^2) (reference: src/model/fm.cpp:88),
batched.  The reference's shared `sum_vx` member was a cross-thread data race
(src/include/model/fm.h:24); here it is a per-sample tensor — the race is
designed out.
"""

from __future__ import annotations

from ftrl_ffm_tpu.models.base import Batch, Model, ModelState
from ftrl_ffm_tpu.ops.interactions import fm_logits_and_grads, linear_logits


class FM(Model):
    def _logits_and_grads(self, state: ModelState, batch: Batch, train: bool):
        w = self._gather_linear(state, batch.feats)
        lin = linear_logits(w, batch.vals, self.bias_weight(state))
        v = self._gather_vec(state, batch.feats)  # [B, F, K]
        logits, dlogit_dv = fm_logits_and_grads(v, batch.vals, lin)
        return logits, (dlogit_dv if train else None)
