"""Probe: per-row async-DMA gather rate from a Pallas TPU kernel.

The fused sorted-segment-scatter design (replace XLA's scatter fusion, which
materializes the permuted payload — ~2x the necessary traffic) requires
issuing one HBM->VMEM row DMA per occurrence from inside the kernel.  XLA's
own gather engine does ~17 ns/row on 2560 B rows; if Mosaic-issued row DMAs
get anywhere close (<= ~30 ns/row), the fused kernel wins ~8 ms/step.

Kernel: for each block of BLK rows, issue BLK row-DMAs payload[perm[j]] ->
vmem slab, wait, fold the slab into a running vector sum (cheap VPU), write
the sum at the end.  Reports ns/row vs the XLA take() baseline.

Env: NNZ (319488), E2 (1280), BLK (512), DTYPE (float32).
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

NNZ = int(os.environ.get("NNZ", 319488))
E2 = int(os.environ.get("E2", 1280))
BLK = int(os.environ.get("BLK", 512))
DT = jnp.dtype(os.environ.get("DTYPE", "float32"))


def _gather_kernel(perm_ref, pay_hbm, out_ref, slab, sems, acc):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    def issue(j, _):
        src = pay_hbm.at[pl.ds(perm_ref[j], 1), :]
        dst = slab.at[pl.ds(j, 1), :]
        pltpu.make_async_copy(src, dst, sems.at[j % 8]).start()
        return _

    jax.lax.fori_loop(0, BLK, issue, 0)

    def drain(j, _):
        pltpu.make_async_copy(
            pay_hbm.at[pl.ds(0, 1), :], slab.at[pl.ds(j, 1), :], sems.at[j % 8]
        ).wait()
        return _

    jax.lax.fori_loop(0, BLK, drain, 0)

    acc[:] += jnp.sum(slab[:].astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[0:1, :] = acc[:]


@jax.jit
def dma_gather_sum(perm, pay):
    return pl.pallas_call(
        _gather_kernel,
        grid=(NNZ // BLK,),
        in_specs=[
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((8, E2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, E2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BLK, E2), DT),
            pltpu.SemaphoreType.DMA((8,)),
            pltpu.VMEM((1, E2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(perm, pay)


@jax.jit
def xla_gather_sum(perm, pay):
    return jnp.max(jnp.take(pay, perm, axis=0, mode="clip").astype(jnp.float32))


def main():
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(NNZ).astype(np.int32))
    pay = jnp.asarray(rng.normal(0, 1, (NNZ, E2)).astype(np.float32)).astype(DT)

    out = np.asarray(dma_gather_sum(perm, pay), np.float32)
    ref = np.asarray(pay, np.float32).sum(axis=0)
    err = np.abs(out[0] / ref - 1).max()
    print(f"NNZ={NNZ} E2={E2} BLK={BLK} dtype={DT.name}  rel_err={err:.2e}",
          flush=True)

    for name, fn in (("pallas_dma", lambda p: dma_gather_sum(perm, p)[0, 0]),
                     ("xla_take", lambda p: xla_gather_sum(perm, p))):
        def run(n):
            t0 = time.perf_counter()
            xx = pay
            for _ in range(n):
                xx = xx + (fn(xx) * 1e-30).astype(DT)
            float(xx[0, 0])
            return time.perf_counter() - t0
        run(2)
        t1, t2 = run(4), run(16)
        ms = (t2 - t1) / 12 * 1e3
        print(f"  {name:10s} {ms:8.2f} ms  {ms * 1e6 / NNZ:6.1f} ns/row",
              flush=True)


if __name__ == "__main__":
    main()
