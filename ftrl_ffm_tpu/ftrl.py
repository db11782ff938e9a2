"""FTRL-Proximal core: accumulator state, closed-form weights, batched updates.

The reference keeps, for every trainable coordinate, the FTRL accumulator pair
(n, z) plus a lazily-materialized weight w = f(n, z)
(reference: src/include/model/ftrl_model.h:28-50).  Here the weight is a *pure
function* of the accumulators — there is no stored weight table to keep in
sync, no per-row mutex, and the whole update is one functional transform.

Closed form (reference: src/include/model/ftrl_model.h:28-33):

    w = 0                                             if |z| <= l1
    w = -(z - sgn(z) * l1) / (l2 + (beta + sqrt(n)) / alpha)   otherwise

Accumulator update for a batch-aggregated gradient (reference applies this
per coordinate per sample, src/model/ftrl_model.cpp:66-77; the mini-batch
generalization sums g and g^2 over the batch before one sigma step —
identical to the reference at batch size 1):

    sigma = (sqrt(n + sum_g2) - sqrt(n)) / alpha
    z    += sum_g - sigma * w
    n    += sum_g2
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class FtrlParams(NamedTuple):
    """Static FTRL hyper-parameters (closed over by jitted steps)."""

    alpha: float = 1e-4
    beta: float = 1.0
    l1: float = 0.1
    l2: float = 5.0


def ftrl_weights(n: jax.Array, z: jax.Array, p: FtrlParams) -> jax.Array:
    """Closed-form FTRL-Proximal weight from accumulators, elementwise.

    Note sgn in the reference maps 0 -> -1 (src/include/utils/utils.h:15-18),
    but sgn(z) is only evaluated when |z| > l1 >= 0, so z != 0 there and the
    convention never matters.
    """
    sgn_z = jnp.where(z > 0, 1.0, -1.0).astype(z.dtype)
    w = -(z - sgn_z * p.l1) / (p.l2 + (p.beta + jnp.sqrt(n)) / p.alpha)
    return jnp.where(jnp.abs(z) <= p.l1, jnp.zeros_like(w), w)


def ftrl_accumulate(
    n: jax.Array,
    z: jax.Array,
    w: jax.Array,
    sum_g: jax.Array,
    sum_g2: jax.Array,
    p: FtrlParams,
) -> tuple[jax.Array, jax.Array]:
    """One FTRL accumulator step given batch-aggregated g and g^2.

    `w` must be the weight the gradients were computed against (i.e. the
    pre-update materialized weight), matching the reference's read of lin_w[i]
    inside update_linear_nz (src/model/ftrl_model.cpp:68-74).
    """
    sigma = (jnp.sqrt(n + sum_g2) - jnp.sqrt(n)) / p.alpha
    new_z = z + sum_g - sigma * w
    new_n = n + sum_g2
    return new_n, new_z


def dedup_and_update(
    n_tab: jax.Array,
    z_tab: jax.Array,
    ids: jax.Array,
    g: jax.Array,
    g2: jax.Array,
    p: FtrlParams,
    w_gathered: jax.Array | None = None,
    w_init: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Aggregate per-occurrence grads by feature id and apply one FTRL step.

    This is the deterministic, race-free TPU replacement for the reference's
    per-feature mutexes (src/model/ftrl_model.cpp:52-77): the same feature id
    appearing many times in a batch has its g and g^2 summed with a sorted
    segment-sum, then a single closed-form update touches each unique row once.

    Args:
      n_tab, z_tab: full accumulator tables, shape [R] or [R, D].
      ids: int32 [N] flat feature ids; entries == R (one past the end) are
        padding sentinels and are dropped by the scatter.
      g, g2: per-occurrence gradient and squared gradient, [N] or [N, D].
      p: FTRL hyper-parameters.
      w_gathered: optional pre-computed weights at the *occurrence* level; if
        None they are re-derived from the tables at the unique-row level
        (identical because w is a pure function of (n, z)).
      w_init: optional random-init table [R, D]; when given, coordinates with
        n == 0 and z == 0 use w_init instead of the closed form ("keep_init"
        factor semantics — see Config.factor_semantics).

    Returns:
      (new_n_tab, new_z_tab)
    """
    del w_gathered  # w is re-derived at unique-row level; kept for API clarity
    num = ids.shape[0]
    order = jnp.argsort(ids)
    sids = jnp.take(ids, order)
    sg = jnp.take(g, order, axis=0)
    sg2 = jnp.take(g2, order, axis=0)

    # Run-length structure of the sorted id list.
    is_start = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sids[1:] != sids[:-1]]
    )
    seg = jnp.cumsum(is_start) - 1  # run index per element, [N]

    sum_g = jax.ops.segment_sum(sg, seg, num_segments=num)
    sum_g2 = jax.ops.segment_sum(sg2, seg, num_segments=num)

    # Unique id per run; rows never written stay at the drop sentinel.
    sentinel = n_tab.shape[0]
    uniq = jnp.full((num,), sentinel, dtype=ids.dtype).at[seg].set(sids)

    n_rows = jnp.take(n_tab, uniq, axis=0, mode="clip")
    z_rows = jnp.take(z_tab, uniq, axis=0, mode="clip")
    w_rows = ftrl_weights(n_rows, z_rows, p)
    if w_init is not None:
        untouched = jnp.logical_and(n_rows == 0, z_rows == 0)
        init_rows = jnp.take(w_init, uniq, axis=0, mode="clip")
        w_rows = jnp.where(untouched, init_rows, w_rows)

    new_n_rows, new_z_rows = ftrl_accumulate(n_rows, z_rows, w_rows, sum_g, sum_g2, p)

    # mode="drop" discards sentinel rows (and any out-of-range id).
    n_tab = n_tab.at[uniq].set(new_n_rows, mode="drop")
    z_tab = z_tab.at[uniq].set(new_z_rows, mode="drop")
    return n_tab, z_tab


def bias_update(
    bias_n: jax.Array,
    bias_z: jax.Array,
    grad_per_sample: jax.Array,
    p: FtrlParams,
) -> tuple[jax.Array, jax.Array]:
    """FTRL step on the global bias (reference: src/model/ftrl_model.cpp:79-85).

    grad_per_sample: [B] per-sample dL/dlogit (already masked for padding).
    """
    w = ftrl_weights(bias_n, bias_z, p)
    sum_g = jnp.sum(grad_per_sample)
    sum_g2 = jnp.sum(grad_per_sample * grad_per_sample)
    return ftrl_accumulate(bias_n, bias_z, w, sum_g, sum_g2, p)
