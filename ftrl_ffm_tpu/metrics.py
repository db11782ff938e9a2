"""Metrics: streaming log-loss and AUC.

The reference reports only per-epoch log-loss (sum of per-thread accumulators
/ count — src/task/ftrl_online.cpp:82-94).  AUC is a new capability: a
streaming histogram AUC that never materializes all scores (device-friendly,
fixed memory), plus an exact O(n log n) variant for small eval sets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Shared histogram width for streaming AUC: every producer of bucket counts
# (Trainer, ShardedStep) must use the same value or the merge is silently
# wrong.  Error is O(1/AUC_BINS).
AUC_BINS = 8192


@jax.jit
def kahan_add(sums, comps, parts):
    """One compensated-summation (Kahan) step over tuples of accumulators.

    Restores the reference's double accounting (it accumulates per-thread
    `double` loss over whole passes, src/task/ftrl_online.cpp:82-94) for
    device-side f32 metric chains without enabling global x64: naive f32
    chaining loses O(n_batches) ulps over a 10^8-example pass, compensated
    summation stays at O(1) ulps regardless of pass length.  Works
    elementwise on vectors (AUC histograms) as well as scalars."""
    new_sums, new_comps = [], []
    for s, c, x in zip(sums, comps, parts):
        y = x - c
        t = s + y
        new_comps.append((t - s) - y)
        new_sums.append(t)
    return tuple(new_sums), tuple(new_comps)


class LossAccumulator:
    """Host-side double-precision mean of per-batch loss sums
    (reference accumulates double loss per thread then reduces:
    src/task/ftrl_online.cpp:82-94)."""

    def __init__(self):
        self.loss_sum = 0.0
        self.count = 0.0

    def update(self, loss_sum, count):
        self.loss_sum += float(loss_sum)
        self.count += float(count)

    @property
    def mean(self) -> float:
        return self.loss_sum / self.count if self.count else float("nan")

    def reset(self):
        self.loss_sum = 0.0
        self.count = 0.0


class StreamingAUC:
    """Histogram-bucketed AUC over sigmoid scores in [0, 1].

    Accumulates positive/negative counts into `n_bins` buckets on device and
    closes the AUC with the trapezoidal rank formula; error is O(1/n_bins).
    """

    def __init__(self, n_bins: int = AUC_BINS):
        self.n_bins = n_bins
        self.pos = np.zeros(n_bins, np.float64)
        self.neg = np.zeros(n_bins, np.float64)

    @staticmethod
    def bucket_counts(logits: jax.Array, y: jax.Array, w: jax.Array, n_bins: int):
        """Jit-friendly per-batch histogram (call inside the eval step)."""
        y = y.astype(jnp.float32)
        w = w.astype(jnp.float32)
        scores = jax.nn.sigmoid(logits)
        idx = jnp.clip((scores * n_bins).astype(jnp.int32), 0, n_bins - 1)
        pos = jnp.zeros((n_bins,), jnp.float32).at[idx].add(y * w)
        neg = jnp.zeros((n_bins,), jnp.float32).at[idx].add((1.0 - y) * w)
        return pos, neg

    def update(self, pos, neg):
        self.pos += np.asarray(pos, np.float64)
        self.neg += np.asarray(neg, np.float64)

    def result(self) -> float:
        total_pos = self.pos.sum()
        total_neg = self.neg.sum()
        if total_pos == 0 or total_neg == 0:
            return float("nan")
        # ranks: negatives below each bucket + half of ties within the bucket
        cum_neg = np.cumsum(self.neg) - self.neg
        auc_sum = np.sum(self.pos * (cum_neg + 0.5 * self.neg))
        return float(auc_sum / (total_pos * total_neg))

    def error_bound(self) -> float:
        """A-posteriori bound on |result() − exact AUC|.

        Scores in different buckets are strictly ordered, so cross-bucket
        (pos, neg) pairs are ranked exactly; a within-bucket pair is scored
        0.5 by the histogram while its true contribution is in [0, 1], an
        error of at most 0.5 per pair.  Hence
            |binned − exact| ≤ 0.5 · Σ_b pos_b·neg_b / (P·N).
        For scores spread over many buckets this is O(1/n_bins); for
        adversarial distributions clustered inside one bucket it honestly
        approaches 0.5 (the histogram then carries no ranking information —
        use auc_mode="exact").  Tested against exact_auc on adversarial
        clustered score distributions in tests/test_metrics.py."""
        total_pos = self.pos.sum()
        total_neg = self.neg.sum()
        if total_pos == 0 or total_neg == 0:
            return float("nan")
        return float(0.5 * np.sum(self.pos * self.neg) / (total_pos * total_neg))

    def reset(self):
        self.pos[:] = 0
        self.neg[:] = 0


def exact_auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Exact AUC via rank statistic.

    CLI-reachable with --auc_mode exact (Trainer.evaluate collects all eval
    scores host-side); the constraint is that the eval set's scores fit host
    memory.  Ties get the midrank, matching sklearn's roc_auc_score."""
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels)
    n = len(scores)
    # vectorized midranks (a per-tie-group Python loop is O(n) interpreter
    # work — tens of seconds at 10M scores): for tie group g spanning
    # sorted positions [start_g, end_g), midrank = (start_g + end_g + 1)/2
    uniq, inv, counts = np.unique(scores, return_inverse=True,
                                  return_counts=True)
    ends = np.cumsum(counts)              # 1-based end rank per group
    starts = ends - counts                # 0-based start rank per group
    mid = (starts + ends + 1) / 2.0       # midrank per group
    ranks = mid[inv]                      # per-sample, original order
    l = labels
    n_pos = float(l.sum())
    n_neg = float(n - n_pos)
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return float((ranks[l > 0].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))
