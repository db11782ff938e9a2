"""Probe: canonical-fields FFM kernel cost vs the general fused kernel.

For one-feature-per-field data in canonical slot order (fields[b] == [0..C-1]
for every sample — the bench workload, and real Criteo after standard prep),
the FFM interaction algebra collapses:

    onehot[m, c] = delta(m == c)   =>  s[b,c,:]  = vals[b,c] * v[b,c,:]
                                       T[b,m,:]  = s_t[b,m,:]
    oh_e[m,(k,c)] = delta(c == m)  =>  self-mask is a static iota pattern

i.e. both MXU matmuls and both mask builds disappear; what remains is one
elementwise scale, the K slice-transposes (field crossing is intrinsic), the
reductions, and the payload write.  This measures that kernel against the
general one at the bench shape to validate the expected ~3 ms win.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("BATCH", 8192))
C = 39          # real fields
CP = 40         # padded fields (field_pad)
K = 16
E = CP * K      # 640
AUG_LANE = C    # dead lane (k=0, c=39)


def _canon_kernel(vals_ref, lin_ref, y_ref, sw_ref, v_ref, logits_ref, out_ref):
    tb = vals_ref.shape[0]
    f = vals_ref.shape[1]
    e = v_ref.shape[-1]
    c = CP

    v = v_ref[:].reshape(tb, f, e)
    vals = vals_ref[:]
    xv = v * vals[:, :, None]          # [TB, F, E]; xv[b, m, :] = x_m * v_m
    # s[b, cbucket, (k,d)] for canonical fields = x_c * v[c] at bucket c:
    # but we only ever need s_t[b, m, (k,c')] = s[b, c', (k,m)] = xv[b, c', (k,m)]
    # -> s_t = per-k last-two-dims transpose of xv's (m, c') block structure.
    if os.environ.get("NOTR"):
        s_t = xv + 1.0  # timing probe: skip the field-crossing transposes
    else:
        s_t = jnp.concatenate(
            [jnp.swapaxes(xv[:, :, kk * c : (kk + 1) * c], 1, 2) for kk in range(K)],
            axis=2,
        )                               # [TB, C', E] (rows beyond C are pad)
    # self term: slot (k, c) of row m contributes only when c == m
    slot_field = jax.lax.broadcasted_iota(jnp.int32, (1, f, e), 2) % c
    row_id = jax.lax.broadcasted_iota(jnp.int32, (1, f, e), 1)
    self_mask = (slot_field == row_id).astype(jnp.float32)  # static pattern
    self_sq = jnp.sum(jnp.sum(self_mask * xv * xv, axis=2), axis=1, keepdims=True)
    cross = jnp.sum(jnp.sum(xv * s_t, axis=2), axis=1, keepdims=True)
    logits = lin_ref[:] + 0.5 * (cross - self_sq)
    logits_ref[:] = logits

    gs = (jax.nn.sigmoid(logits) - y_ref[:]) * sw_ref[:]
    gx = gs * vals
    g = gx[:, :, None] * (s_t - self_mask * xv)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, e), 2)
    g = jnp.where(lane == AUG_LANE, gx[:, :, None], g)
    g = g.reshape(tb * f, e)
    out_ref[:, :e] = g
    out_ref[:, e:] = g * g


@functools.partial(jax.jit, static_argnames=("block_b",))
def canon(v, vals, lin, y, sw, block_b=int(os.environ.get('CBB', 32))):
    b, f = vals.shape
    grid = (b // block_b,)
    row = pl.BlockSpec((block_b, f), lambda i: (i, 0), memory_space=pltpu.VMEM)
    sc = pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vs = pl.BlockSpec((block_b * f, E), lambda i: (i, 0), memory_space=pltpu.VMEM)
    os_ = pl.BlockSpec((block_b * f, 2 * E), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col = lambda x: x.reshape(b, 1)
    v = jax.lax.optimization_barrier(v)
    logits, gg2 = pl.pallas_call(
        _canon_kernel,
        grid=grid,
        in_specs=[row, sc, sc, sc, vs],
        out_specs=[sc, os_],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b * f, 2 * E), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(vals, col(lin), col(y), col(sw), v)
    return logits[:, 0], gg2


def main():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(0, 0.1, (B * CP, E)).astype(np.float32))
    vals = jnp.ones((B, CP), jnp.float32)
    lin = jnp.asarray(rng.normal(0, 0.1, B).astype(np.float32))
    y = jnp.asarray((rng.random(B) > 0.5).astype(np.float32))
    sw = jnp.ones((B,), jnp.float32)

    # correctness vs the general kernel with canonical fields
    from ftrl_ffm_tpu.ops.ffm_pallas import ffm_fused_logits_grads
    fields = jnp.tile(jnp.arange(CP, dtype=jnp.int32), (B, 1))
    # zero out pad-column vals like the real batch does (cols >= C are padding)
    vals_in = vals.at[:, C:].set(0.0)
    lo_ref, gg_ref = ffm_fused_logits_grads(
        v, fields, vals_in, lin, y, sw, CP, K, compute_grads=True,
        combined_out=True, aug_lane=AUG_LANE)
    if not os.environ.get("NOTR"):
        lo, gg = canon(v, vals_in, lin, y, sw)
        print("logit err:", float(jnp.abs(lo - lo_ref).max()),
              " gg2 err:", float(jnp.abs(gg - gg_ref).max()), flush=True)

    def time_it(fn, *args):
        def run(n):
            t0 = time.perf_counter()
            xx = args[0]
            acc = None
            for _ in range(n):
                out = fn(xx, *args[1:])
                xx = xx + out[0][0] * 1e-30
            float(xx[0, 0])
            return time.perf_counter() - t0
        run(2)
        t1, t2 = run(4), run(16)
        return (t2 - t1) / 12 * 1e3

    general = functools.partial(
        ffm_fused_logits_grads, fields=fields, vals=vals_in, lin=lin, y=y,
        sample_w=sw, n_fields=CP, n_factors=K, compute_grads=True,
        combined_out=True, aug_lane=AUG_LANE)
    t_gen = time_it(lambda v_: general(v_), v)
    t_can = time_it(lambda v_: canon(v_, vals_in, lin, y, sw), v)
    print(f"general: {t_gen:.2f} ms   canonical: {t_can:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
