"""Micro-benchmarks for the FTRL payload-aggregation redesign.

Answers, on the real chip, the questions that decide how to replace the
transaction-bound XLA scatter (the dominant op of the train step at
B=8192, C=39, E=640 — see BASELINE.md):

  sort_flat     argsort of the flat [B*C] id stream (the sparse path's wall?)
  sort_cols     per-column argsort of [B, C] ids (cheaper batched sort?)
  take_perm     payload permute-gather [B*C, 2E] by a random perm
  scat_full     scatter-add of all B*C rows (the current dense2 aggregation)
  scat_uniq     scatter-add of the ~deduped unique rows only (what dedup buys)
  seg_sorted    jax.ops.segment_sum over the sorted payload
  scat_sorted   lax scatter-add with indices_are_sorted=True

Each timed with the difference method (two chained runs, one readback).
Env: BATCH (8192), N_FEATS (100000), C (39), E (640), DTYPE (bfloat16).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = int(os.environ.get("BATCH", 8192))
C = int(os.environ.get("C", 39))
R = int(os.environ.get("N_FEATS", 100_000))
E2 = 2 * int(os.environ.get("E", 640))
DT = jnp.dtype(os.environ.get("DTYPE", "bfloat16"))
NNZ = B * C


def chain_time(f, *args, iters=(4, 16)):
    """Difference-method ms/op for y = f(x, *args) chained through x.

    NB: the readback is float(xx) — an actual scalar device->host transfer.
    jax.block_until_ready is NOT a synchronization point through the axon
    relay backend (measured: 20 chained 16 ms scatters "complete" in 0.5 ms
    under block_until_ready; float() readback shows the real time)."""
    g = jax.jit(f)
    x = jnp.zeros((), jnp.float32)
    float(g(x, *args))

    def run(n):
        t0 = time.perf_counter()
        xx = x
        for _ in range(n):
            xx = g(xx, *args) * 1e-30
        float(xx)
        return time.perf_counter() - t0

    run(1)
    t1, t2 = run(iters[0]), run(iters[1])
    return (t2 - t1) / (iters[1] - iters[0]) * 1e3


def main():
    rng = np.random.default_rng(0)
    per = R // C
    ids2d = (rng.integers(0, per, (B, C)) + np.arange(C) * per).astype(np.int32)
    ids = jnp.asarray(ids2d.reshape(-1))
    ids_2d = jnp.asarray(ids2d)
    uniq_np = np.unique(ids2d.reshape(-1))
    n_uniq = uniq_np.size
    uniq = jnp.asarray(
        np.pad(uniq_np, (0, NNZ - n_uniq), constant_values=R).astype(np.int32)
    )
    perm = jnp.asarray(rng.permutation(NNZ).astype(np.int32))
    sids = jnp.asarray(np.sort(ids2d.reshape(-1)).astype(np.int32))
    payload = jnp.asarray(rng.normal(0, 1, (NNZ, E2)).astype(np.float32)).astype(DT)
    print(f"B={B} C={C} R={R} E2={E2} dtype={DT.name} nnz={NNZ} uniq={n_uniq}",
          flush=True)

    which = sys.argv[1:] or [
        "sanity_mm", "sort_flat", "sort_cols", "argsort_flat", "take_perm",
        "scat_full", "scat_uniq", "seg_sorted", "scat_sorted",
    ]

    def report(name, f, *args):
        if name not in which:
            return
        ms = chain_time(f, *args)
        print(f"  {name:12s} {ms:8.2f} ms", flush=True)

    # NB: reductions must not be algebraically removable — XLA rewrites
    # sum(scatter_add(zeros, ...)) -> sum(updates) and folds argsort().sum();
    # max() and index-weighted sums survive.
    def wmax(a):
        return jnp.max(a.astype(jnp.float32))

    mm = jnp.asarray(rng.normal(0, 1, (1024, 1024)).astype(np.float32))
    report("sanity_mm",
           lambda x, m: (jnp.dot(m + x, m, precision="highest")).max(), mm)
    report("sort_flat",
           lambda x, i: wmax(jnp.sort(i + x.astype(jnp.int32))
                             * jnp.arange(i.shape[0])), ids)
    report("sort_cols",
           lambda x, i: wmax(jnp.sort(i + x.astype(jnp.int32), axis=0)
                             * jnp.arange(i.shape[0])[:, None]), ids_2d)
    report("argsort_flat",
           lambda x, i: wmax(jnp.argsort(i + x.astype(jnp.int32))
                             * jnp.arange(i.shape[0])), ids)
    report("take_perm",
           lambda x, p, pay: wmax(jnp.take(pay + x.astype(DT), p, axis=0,
                                           mode="clip")),
           perm, payload)
    report("scat_full",
           lambda x, i, pay: wmax(jnp.zeros((R, E2), DT).at[i].add(
               pay + x.astype(DT), mode="drop")),
           ids, payload)
    report("scat_uniq",
           lambda x, i, pay: wmax(jnp.zeros((R, E2), DT).at[i].add(
               pay + x.astype(DT), mode="drop")),
           uniq, payload)
    report("seg_sorted",
           lambda x, i, pay: wmax(jax.ops.segment_sum(
               pay + x.astype(DT), i, num_segments=R,
               indices_are_sorted=True)),
           sids, payload)

    def scat_sorted(x, i, pay):
        zeros = jnp.zeros((R, E2), DT)
        return jax.lax.scatter_add(
            zeros, i[:, None], pay + x.astype(DT),
            jax.lax.ScatterDimensionNumbers(
                update_window_dims=(1,), inserted_window_dims=(0,),
                scatter_dims_to_operand_dims=(0,)),
            indices_are_sorted=True, unique_indices=False,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
        ).max().astype(jnp.float32)

    report("scat_sorted", scat_sorted, sids, payload)


if __name__ == "__main__":
    main()
