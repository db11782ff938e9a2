"""Probe: Mosaic dynamic-row read-modify-write throughput in VMEM.

The field-window aggregation kernel design (replace the XLA scatter-add)
hinges on how fast a Pallas TPU kernel can do
    acc[pl.ds(idx[b], 1), :] += payload[pl.ds(b, 1), :]
for one dynamic row per iteration, acc resident in VMEM.  This measures that
rate for a single field-shaped problem: acc [PER_PAD, E] f32, payload
[B, E], random idx — then extrapolates to the full step (39 fields).

Also probes an 8-row vectorized variant (conflict-free only if duplicate ids
never land in the same octet — NOT usable for exact FTRL, upper-bound only).

Env: B (8192), PER (2564), E (640), BLK (512), DTYPE (float32).
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

B = int(os.environ.get("B", 8192))
PER = int(os.environ.get("PER", 2564))
E = int(os.environ.get("E", 640))
BLK = int(os.environ.get("BLK", 512))
DT = jnp.dtype(os.environ.get("DTYPE", "float32"))
PER_PAD = -(-PER // 8) * 8


def _rmw_kernel(idx_ref, pay_ref, out_ref, acc):
    nblk = pl.num_programs(0)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    def body(b, _):
        row = idx_ref[0, b]
        acc[pl.ds(row, 1), :] += pay_ref[pl.ds(b, 1), :].astype(acc.dtype)
        return _

    jax.lax.fori_loop(0, BLK, body, 0)

    @pl.when(i == nblk - 1)
    def _():
        out_ref[:] = acc[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def rmw(idx, pay):
    return pl.pallas_call(
        _rmw_kernel,
        grid=(B // BLK,),
        in_specs=[
            pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PER_PAD, E), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((PER_PAD, E), jnp.float32),
        scratch_shapes=[pltpu.VMEM((PER_PAD, E), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(idx, pay)


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, PER, (1, B)).astype(np.int32))
    pay = jnp.asarray(rng.normal(0, 1, (B, E)).astype(np.float32)).astype(DT)

    # correctness vs numpy
    out = np.asarray(rmw(idx, pay), np.float32)
    ref = np.zeros((PER_PAD, E), np.float32)
    np.add.at(ref, np.asarray(idx)[0], np.asarray(pay, np.float32))
    err = np.abs(out - ref).max()
    print(f"B={B} PER={PER} E={E} BLK={BLK} dtype={DT.name}  max_err={err:.2e}",
          flush=True)

    x = pay
    t0 = time.perf_counter()
    float(rmw(idx, x)[0, 0])
    print(f"  first call {time.perf_counter() - t0:.1f}s", flush=True)

    def run(n):
        t0 = time.perf_counter()
        xx = x
        for _ in range(n):
            xx = xx + rmw(idx, xx)[0, 0] * 1e-30
        float(xx[0, 0])
        return time.perf_counter() - t0

    run(1)
    t1, t2 = run(4), run(16)
    ms = (t2 - t1) / 12 * 1e3
    ns_row = ms * 1e6 / B
    # full step: 39 such fields, x2 if E2=1280 split into two 640 halves
    print(f"  rmw: {ms:.3f} ms per {B} rows -> {ns_row:.1f} ns/row; "
          f"full step (39 fields, E2=1280) ~ {ms * 39 * 2:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
