"""Fused Pallas TPU kernel for the FFM interaction: logits + grads in one pass.

The XLA formulation (ops/interactions.py::ffm_logits_and_grads) materializes
several [B, F, C*K] HBM intermediates (s_t, t, oh_e masks, dlogit_dv) around
the MXU contractions.  This kernel keeps everything per batch-tile in VMEM:
one read of the gathered factor rows v, one write of the per-occurrence
gradient g — HBM traffic collapses to the unavoidable in/out tensors.

Math (identical to the XLA path; reference: src/model/ffm.cpp:57-70 logit,
:107-123 grads).  The factor tables are stored **factor-major** (slot
(k, c) = k*C + c, see ops/layout.py) precisely so that the per-factor slice
v[:, :, k*C:(k+1)*C] is a contiguous lane range — Mosaic supports contiguous
lane slicing and last-two-dims transposes but not minor-dim-splitting
reshapes:

    s[c, (k,d)]   = sum_m xoh[m, c] * v[m, (k,d)]      (MXU, one wide matmul)
    s_t[d, (k,c)] = s[c, (k,d)]                        (K slice-transposes)
    cross         = <s, s_t>;  self = sum oh_e * (x v)^2
    logit         = lin + 0.5 * (cross - self)
    gs            = (sigmoid(logit) - y) * sample_w
    T[m, (k,c)]   = sum_d onehot[m,d] * s_t[d, (k,c)]  (MXU, one wide matmul)
    g[m, (k,c)]   = gs * x_m * (T[m,(k,c)] - oh_e * x_m * v[m,(k,c)])

Grid: 1-D over batch tiles; each [TB, F, E] block of v streams through VMEM
(Pallas double-buffers block in/out automatically).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ffm_fused_kernel(
    fields_ref,  # [TB, F] int32
    vals_ref,    # [TB, F] f32
    lin_ref,     # [TB, 1] f32 (bias + linear logits)
    y_ref,       # [TB, 1] f32
    sw_ref,      # [TB, 1] f32
    v_ref,       # [TB*F, E] f32, E = K*C factor-major (2-D: the gathered-row
                 # stream keeps its natural row-major layout end to end)
    logits_ref,  # out [TB, 1] f32
    *out_refs,   # combined: one [TB*F, 2E] ref (g in lanes [:E], g^2 in
                 # [E:]) feeding ONE FTRL scatter (ftrl.py::
                 # dense_ftrl_update2); split: two [TB*F, E] refs (g, g^2)
                 # for the huge-table in-place update
    n_fields: int,
    n_factors: int,
    compute_grads: bool,
    aug_lane: int,
):
    c, k = n_fields, n_factors
    tb, f = fields_ref.shape
    e = v_ref.shape[-1]

    # leading-dims reshape (minor dim untouched — Mosaic-supported)
    v = v_ref[:].reshape(tb, f, e)    # [TB, F, E]
    vals = vals_ref[:]                # [TB, F]
    field_ids = jax.lax.broadcasted_iota(jnp.int32, (tb, f, c), 2)
    onehot = (fields_ref[:][:, :, None] == field_ids).astype(jnp.float32)
    xoh = onehot * vals[:, :, None]   # [TB, F, C]

    # s[b, c_bucket, (k,d)] — ONE batched matmul over the full row width.
    s = jax.lax.dot_general(
        xoh, v,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                  # [TB, C, E]

    # s_t[b, d, (k,c)] = s[b, c, (k,d)]: per-k contiguous-lane slices, each a
    # last-two-dims transpose (tpu.transpose), re-assembled along lanes.
    s_t = jnp.concatenate(
        [jnp.swapaxes(s[:, :, kk * c : (kk + 1) * c], 1, 2) for kk in range(k)],
        axis=2,
    )                                  # [TB, C, E]

    # self term across all k at once (slot (k,c) has field c = slot mod C)
    slot_field = jax.lax.broadcasted_iota(jnp.int32, (tb, f, e), 2) % c
    oh_e = (fields_ref[:][:, :, None] == slot_field).astype(jnp.float32)
    xv = v * vals[:, :, None]
    self_sq = jnp.sum(
        jnp.sum(oh_e * xv * xv, axis=2), axis=1, keepdims=True
    )                                  # [TB, 1]

    # cross = sum_{c,d,k} S[c,d,k] * S[d,c,k] = <s, s_t> elementwise.
    # (per-sample accumulators stay rank-2 [TB, 1]: Mosaic wants >= 2D)
    cross = jnp.sum(jnp.sum(s * s_t, axis=2), axis=1, keepdims=True)

    # NOTE: the linear-logit contribution from the mirrored dead lane is
    # deliberately computed OUTSIDE this kernel (models/ffm.py) — an extra
    # in-kernel reduction re-triggered the runtime-flaky gather ->
    # custom-call device deadlock on the target runtime.
    logits = lin_ref[:] + 0.5 * (cross - self_sq)       # [TB, 1]
    logits_ref[:] = logits

    if compute_grads:
        gs = (jax.nn.sigmoid(logits) - y_ref[:]) * sw_ref[:]   # [TB, 1]
        gx = gs * vals                                   # [TB, F]
        # T[b, m, (k,c)] = sum_d onehot[b,m,d] * s_t[b,d,(k,c)] — one wide
        # batched matmul.
        t = jax.lax.dot_general(
            onehot, s_t,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                # [TB, F, E]
        g = gx[:, :, None] * (t - oh_e * xv)
        if aug_lane >= 0:
            # the linear-table gradient g_lin = gs * x rides in dead lane
            # `aug_lane` of the padded factor row (slot (0, n_fields), which
            # no occurrence selects — its factor grad is always zero), so
            # ONE plain [TB*F, 2E] payload feeds the factor AND linear
            # scatter stats with zero extra columns (kills the separate
            # 319k-index linear scatter, measured 3.9 ms at B=8192)
            lane = jax.lax.broadcasted_iota(jnp.int32, (tb, f, e), 2)
            g = jnp.where(lane == aug_lane, gx[:, :, None], g)
        # grads are computed f32 in VMEM; the store casts to the payload
        # dtype (Config.acc_dtype: bf16 halves the dominant HBM passes)
        if len(out_refs) == 1:
            g = g.reshape(tb * f, e)
            dt = out_refs[0].dtype
            out_refs[0][:, :e] = g.astype(dt)
            out_refs[0][:, e:] = (g * g).astype(dt)
        else:
            g = g.reshape(tb * f, e)
            out_refs[0][:] = g.astype(out_refs[0].dtype)
            out_refs[1][:] = (g * g).astype(out_refs[1].dtype)
    else:
        for ref in out_refs:
            ref[:] = jnp.zeros_like(ref)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fields", "n_factors", "compute_grads", "block_b", "interpret",
        "combined_out", "out_dtype", "aug_lane",
    ),
)
def ffm_fused_logits_grads(
    v: jax.Array,        # [B*F, E] gathered factor rows (factor-major)
    fields: jax.Array,   # [B, F] int32
    vals: jax.Array,     # [B, F] f32
    lin: jax.Array,      # [B] bias + linear logits
    y: jax.Array,        # [B] labels (ignored when compute_grads=False)
    sample_w: jax.Array, # [B]
    n_fields: int,
    n_factors: int,
    compute_grads: bool = True,
    block_b: int = 0,
    interpret: bool = False,
    combined_out: bool = True,
    out_dtype=jnp.float32,
    aug_lane: int = -1,
):
    """Fused FFM logits + per-occurrence grads.

    combined_out=True returns (logits [B], gg2 [B*F, 2E]) where gg2[:, :E]
    is the factor grad already scaled by gs = (sigmoid(logit) - y) *
    sample_w and gg2[:, E:] is its elementwise square — the combined payload
    for the single FTRL scatter (ftrl.py::dense_ftrl_update2).  aug_lane >= 0
    additionally writes the linear-table gradient gs * x into that (dead)
    lane of the factor block, feeding ftrl.py::dense_ftrl_update2_aug.
    combined_out=False returns (logits, g, g2) as separate [B*F, E] tensors
    for the huge-table in-place update (ftrl.py::dense_ftrl_update_inplace),
    whose two scatters target different destinations.  Emitting g^2 from
    VMEM saves an HBM mul pass either way; 2-D in/out keeps the
    gather->kernel->scatter chain in one row-major layout, avoiding relayout
    copies around the custom call.
    """
    b, f = fields.shape
    e = v.shape[-1]
    if block_b <= 0:
        # VMEM: v in + gg2 out, double-buffered (~6 block-units), plus live
        # temporaries; keep the streaming buffers under ~12 MB.
        block_b = 128
        while block_b > 8 and (b % block_b or 6 * block_b * f * e * 4 > 12 << 20):
            block_b //= 2
    if b % block_b:
        raise ValueError(f"batch {b} not divisible by block_b {block_b}")
    grid = (b // block_b,)

    kernel = functools.partial(
        _ffm_fused_kernel,
        n_fields=n_fields,
        n_factors=n_factors,
        compute_grads=compute_grads,
        # the dead-lane fold applies to split payloads too (the huge-table
        # in-place z-scatter then maintains the linear mirror as well)
        aug_lane=aug_lane,
    )
    row_spec = pl.BlockSpec((block_b, f), lambda i: (i, 0), memory_space=pltpu.VMEM)
    # per-sample scalars ride as [B, 1] — rank-1 VMEM blocks must be
    # 128-multiples on TPU, rank-2 (TB, 1) blocks are fine
    scalar_spec = pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec(
        (block_b * f, e), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    if combined_out:
        out_specs = [pl.BlockSpec(
            (block_b * f, 2 * e), lambda i: (i, 0), memory_space=pltpu.VMEM
        )]
        out_shape = [jax.ShapeDtypeStruct((b * f, 2 * e), out_dtype)]
    else:
        out_specs = [v_spec, v_spec]
        out_shape = [
            jax.ShapeDtypeStruct((b * f, e), out_dtype),
            jax.ShapeDtypeStruct((b * f, e), out_dtype),
        ]
    col = lambda x: x.reshape(b, 1)
    # A direct gather -> Mosaic-custom-call edge deadlocks at runtime on the
    # current TPU runtime (device never completes the program); the barrier
    # forces the gathered rows to materialize as a plain buffer first.
    # Zero-cost: the [B*F, E] gather output materializes either way.
    v = jax.lax.optimization_barrier(v)
    logits, *grads = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, scalar_spec, scalar_spec, scalar_spec, v_spec],
        out_specs=[scalar_spec] + out_specs,
        out_shape=[jax.ShapeDtypeStruct((b, 1), jnp.float32)] + out_shape,
        compiler_params=pltpu.CompilerParams(
            # three [TB, F, E]-unit streaming buffers (double-buffered) plus
            # temporaries exceed the 16 MB default scoped-vmem budget
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fields, vals, col(lin), col(y), col(sample_w), v)
    return (logits[:, 0], *grads)


def _ffm_logits_kernel(
    fields_ref,  # [TB, F] int32
    vals_ref,    # [TB, F] f32
    lin_ref,     # [TB, 1] f32
    v_ref,       # [TB*F, E] f32
    logits_ref,  # out [TB, 1] f32
    *,
    n_fields: int,
    n_factors: int,
):
    c, k = n_fields, n_factors
    tb, f = fields_ref.shape
    e = v_ref.shape[-1]

    v = v_ref[:].reshape(tb, f, e)
    vals = vals_ref[:]
    field_ids = jax.lax.broadcasted_iota(jnp.int32, (tb, f, c), 2)
    onehot = (fields_ref[:][:, :, None] == field_ids).astype(jnp.float32)
    xoh = onehot * vals[:, :, None]
    s = jax.lax.dot_general(
        xoh, v,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    s_t = jnp.concatenate(
        [jnp.swapaxes(s[:, :, kk * c : (kk + 1) * c], 1, 2) for kk in range(k)],
        axis=2,
    )
    slot_field = jax.lax.broadcasted_iota(jnp.int32, (tb, f, e), 2) % c
    oh_e = (fields_ref[:][:, :, None] == slot_field).astype(jnp.float32)
    xv = v * vals[:, :, None]
    self_sq = jnp.sum(jnp.sum(oh_e * xv * xv, axis=2), axis=1, keepdims=True)
    cross = jnp.sum(jnp.sum(s * s_t, axis=2), axis=1, keepdims=True)
    logits_ref[:] = lin_ref[:] + 0.5 * (cross - self_sq)


@functools.partial(
    jax.jit, static_argnames=("n_fields", "n_factors", "block_b", "interpret")
)
def ffm_fused_logits(
    v: jax.Array,        # [B*F, E] gathered factor rows (factor-major)
    fields: jax.Array,   # [B, F] int32
    vals: jax.Array,     # [B, F] f32
    lin: jax.Array,      # [B] bias + linear logits
    n_fields: int,
    n_factors: int,
    block_b: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Inference-only FFM logits — the serving/eval hot path.

    Same math as the training kernel minus the gradient outputs: HBM traffic
    collapses to one read of v (no [B*F, E] writes at all)."""
    b, f = fields.shape
    e = v.shape[-1]
    if block_b <= 0:
        block_b = 128
        while block_b > 8 and (b % block_b or 2 * block_b * f * e * 4 > 12 << 20):
            block_b //= 2
    if b % block_b:
        raise ValueError(f"batch {b} not divisible by block_b {block_b}")

    kernel = functools.partial(
        _ffm_logits_kernel, n_fields=n_fields, n_factors=n_factors
    )
    row_spec = pl.BlockSpec((block_b, f), lambda i: (i, 0), memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((block_b * f, e), lambda i: (i, 0), memory_space=pltpu.VMEM)
    # see ffm_fused_logits_grads: gather -> custom call must not fuse
    v = jax.lax.optimization_barrier(v)
    logits = pl.pallas_call(
        kernel,
        grid=(b // block_b,),
        in_specs=[row_spec, row_spec, scalar_spec, v_spec],
        out_specs=scalar_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fields, vals, lin.reshape(b, 1), v)
    return logits[:, 0]
