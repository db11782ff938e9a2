"""RMW probe v2: what sets the ~52 ns/row dynamic-row VMEM RMW cost?

Variants over the single-field shape (acc [PER_PAD, E] f32 in VMEM,
payload [B, E] streamed in BLK-row blocks):

  base        one RMW per row (v1 baseline)
  wide        E sweep handled via env (run with E=128 / 640 / 1280)
  unroll8     python-unrolled x8 inner loop (kills fori_loop overhead)
  dual        two interleaved RMW chains; duplicate-within-pair redirected
              to a dump row so the two RMWs of a pair are independent
  wo          write-only (out[idx] = row, no read-modify) — dependency cost
  rd          read-only (row = acc[idx], accumulated in registers)

Env: B, PER, E, BLK, plus VARIANT list as argv.
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
PER_PAD = -(-PER // 8) * 8 + 8  # +8: dump row for the dual variant


def make(variant: str):
    def kern(idx_ref, pay_ref, out_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        if variant == "base":
            def body(b, _):
                acc[pl.ds(idx_ref[0, b], 1), :] += pay_ref[pl.ds(b, 1), :]
                return _
            jax.lax.fori_loop(0, BLK, body, 0)
        elif variant == "unroll8":
            def body(b8, _):
                for j in range(8):
                    b = b8 * 8 + j
                    acc[pl.ds(idx_ref[0, b], 1), :] += pay_ref[pl.ds(b, 1), :]
                return _
            jax.lax.fori_loop(0, BLK // 8, body, 0)
        elif variant == "dual":
            dump = PER_PAD - 8

            def body(b2, _):
                b = b2 * 2
                i0 = idx_ref[0, b]
                i1 = idx_ref[0, b + 1]
                same = i0 == i1
                r0 = pay_ref[pl.ds(b, 1), :]
                r1 = pay_ref[pl.ds(b + 1, 1), :]
                r0 = r0 + jnp.where(same, r1, jnp.zeros_like(r1))
                i1 = jnp.where(same, dump, i1)
                acc[pl.ds(i0, 1), :] += r0
                acc[pl.ds(i1, 1), :] += jnp.where(same, jnp.zeros_like(r1), r1)
                return _
            jax.lax.fori_loop(0, BLK // 2, body, 0)
        elif variant == "wo":
            def body(b, _):
                acc[pl.ds(idx_ref[0, b], 1), :] = pay_ref[pl.ds(b, 1), :]
                return _
            jax.lax.fori_loop(0, BLK, body, 0)
        elif variant == "rd":
            def body(b, carry):
                return carry + acc[pl.ds(idx_ref[0, b], 1), :][0, 0]
            s = jax.lax.fori_loop(0, BLK, body, jnp.float32(0))
            acc[0:1, :] += s
        else:
            raise ValueError(variant)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc[:]

    return kern


@functools.partial(jax.jit, static_argnames=("variant",))
def run_kernel(idx, pay, variant):
    return pl.pallas_call(
        make(variant),
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
    pay = jnp.asarray(rng.normal(0, 1, (B, E)).astype(np.float32))

    variants = sys.argv[1:] or ["base", "unroll8", "dual", "wo", "rd"]
    print(f"B={B} PER={PER} E={E} BLK={BLK}", flush=True)
    for v in variants:
        out = np.asarray(run_kernel(idx, pay, v), np.float32)
        if v in ("base", "unroll8", "dual"):
            ref = np.zeros((PER_PAD, E), np.float32)
            np.add.at(ref, np.asarray(idx)[0], np.asarray(pay))
            # dual redirects pair-duplicates to the dump row: fix ref
            if v == "dual":
                ii = np.asarray(idx)[0]
                pp = np.asarray(pay)
                for b2 in range(B // 2):
                    if ii[2 * b2] == ii[2 * b2 + 1]:
                        ref[PER_PAD - 8] += 0  # both merged into i0; dump gets 0
            err = np.abs(out[:PER] - ref[:PER]).max()
        else:
            err = -1.0

        def run(n):
            t0 = time.perf_counter()
            xx = pay
            for _ in range(n):
                xx = xx + run_kernel(idx, xx, v)[0, 0] * 1e-30
            float(xx[0, 0])
            return time.perf_counter() - t0

        run(2)
        t1, t2 = run(16), run(64)
        ms = (t2 - t1) / 48 * 1e3
        print(f"  {v:8s} {ms:7.3f} ms  {ms * 1e6 / B:6.1f} ns/row  "
              f"max_err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
