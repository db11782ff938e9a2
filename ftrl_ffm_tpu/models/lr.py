"""Logistic regression with FTRL (reference: src/model/lr.cpp:9-24)."""

from __future__ import annotations

from ftrl_ffm_tpu.models.base import Batch, Model, ModelState
from ftrl_ffm_tpu.ops.interactions import linear_logits


class LR(Model):
    def _logits_and_grads(self, state: ModelState, batch: Batch, train: bool):
        w = self._gather_linear(state, batch.feats)
        logits = linear_logits(w, batch.vals, self.bias_weight(state))
        return logits, None
