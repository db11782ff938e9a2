"""Pallas TPU kernel for the huge-table FTRL closed-form pass.

The in-place update (ftrl.py::dense_ftrl_update_inplace) ends with a pure
elementwise pass over the whole (n, z', w, A) tables:

    sigma = (sqrt(n + A) - sqrt(n)) / alpha
    z     = z' - sigma * w          (z' already holds z + sum_g, scattered)
    n     = n + A
    w     = closed_form(n, z)   where touched, else keep w

The XLA fori_loop form (kept as the fallback) runs at ~1.45x the streaming
floor at R=1M — its dynamic_slice / dynamic_update_slice pairs add block
copies.  This kernel streams the four tables block-by-block through VMEM
with the three outputs aliased onto the input tables (true in-place: no
extra HBM copies, no table-sized temporaries).  Measured R=1M, D=640:
31.7 ms (fori_loop) -> ~22 ms (this kernel) of a ~79 ms step.

reference math: src/include/model/ftrl_model.h:28-33 (closed form),
src/model/ftrl_model.cpp:66-77 (accumulator update).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pass_kernel(n_ref, z_ref, w_ref, a_ref, n_out, z_out, w_out,
                 *, alpha, beta, l1, l2):
    # single source of truth for the math: ftrl.py (plain jnp, so it lowers
    # inside the kernel); this body must stay equivalent to ftrl.py::
    # dense_ftrl_update_inplace's blk() fallback
    from ftrl_ffm_tpu.ftrl import UNTOUCHED_N, FtrlParams, ftrl_weights

    p = FtrlParams(alpha=alpha, beta=beta, l1=l1, l2=l2)
    n = n_ref[:]
    a = a_ref[:].astype(n.dtype)
    w = w_ref[:].astype(n.dtype)
    sigma = (jnp.sqrt(n + a) - jnp.sqrt(n)) / alpha
    new_z = z_ref[:] - sigma * w
    new_n = n + a
    new_w = jnp.where(new_n > UNTOUCHED_N, ftrl_weights(new_n, new_z, p), w)
    n_out[:] = new_n
    z_out[:] = new_z
    w_out[:] = new_w.astype(w_out.dtype)


def _block_rows(r: int, d: int, budget_bytes: int = 64 << 20) -> int:
    """Largest 8-multiple divisor of r whose 7 double-buffered [br, d] f32
    blocks fit the VMEM budget; 0 if none exists (caller falls back)."""
    per_row = 7 * 2 * d * 4
    cap = max(8, budget_bytes // per_row)
    best = 0
    for br in range(8, min(r, cap) + 1, 8):
        if r % br == 0:
            best = br
    return best


@functools.partial(
    jax.jit, static_argnames=("alpha", "beta", "l1", "l2", "br", "interpret")
)
def _run(n_tab, z_tab, w_tab, a, alpha, beta, l1, l2, br, interpret=False):
    r, d = n_tab.shape
    kern = functools.partial(
        _pass_kernel, alpha=alpha, beta=beta, l1=l1, l2=l2
    )
    spec = pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(r // br,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((r, d), n_tab.dtype),
            jax.ShapeDtypeStruct((r, d), z_tab.dtype),
            jax.ShapeDtypeStruct((r, d), w_tab.dtype),
        ],
        # outputs overwrite the input tables in place — no HBM copies
        input_output_aliases={0: 0, 1: 1, 2: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20,
        ),
        interpret=interpret,
    )(n_tab, z_tab, w_tab, a)


def closed_form_pass_pallas(n_tab, z_tab, w_tab, a, p, interpret=False):
    """(n, z', w, A) -> (n_new, z_new, w_new) streamed in place, or None if
    the shape doesn't admit an aligned block decomposition (caller uses the
    fori_loop fallback)."""
    if n_tab.ndim != 2 or (jax.default_backend() != "tpu" and not interpret):
        return None
    r, d = n_tab.shape
    if d % 128:
        return None
    br = _block_rows(r, d)
    if not br:
        return None
    return _run(
        n_tab, z_tab, w_tab, a,
        float(p.alpha), float(p.beta), float(p.l1), float(p.l2), br,
        interpret=interpret,
    )
