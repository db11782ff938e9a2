"""Micro-benchmarks for the huge-table lazy-w FTRL redesign (R=1M regime).

Round-2 verdict asked: store only (n, z), compute w at gather time, and
delete the w-table write-back and/or the O(R*D) closed-form pass
(the reference's own lazy materialization,
reference: src/model/ftrl_model.cpp:52-59).  These probes price the pieces
and the composed candidates on the real chip:

  gather1       take [nnz] rows from ONE [R, E] table   (current fwd: w)
  gather2       two takes from two [R, E] tables        (lazy fwd: n, z)
  gather_wide   one take from a [R, 2E] table           (interleaved n||z)
  scat_z        z.at[ids].add(g)  (in-place scatter, current)
  scat_acc      zeros(R, E).at[ids].add(g2)  (accumulator scatter, current)
  pass4         Pallas closed-form pass (n, z, w, A) -> (n, z, w)  (current)
  pass3         no-w variant (n, z, A) -> (n, z), w never stored
  sortagg       argsort ids + permute [nnz, 2E] + segment sums + uniq ids
  scatback_set  two .at[uniq].set([nnz, E], sorted) write-backs
  cand_now      composed: lazy fwd + current scatters + pass3 (no w table)
  cand_sorted   composed: lazy fwd + sorted segsum update, no O(R) pass

Timing: difference method with a float() readback (block_until_ready is a
no-op through the axon relay).  Env: BATCH (8192), N_FEATS (1000000),
C (39), E (640).
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

B = int(os.environ.get("BATCH", 8192))
C = int(os.environ.get("C", 39))
R = int(os.environ.get("N_FEATS", 1_000_000))
E = int(os.environ.get("E", 640))
NNZ = B * C
ALPHA, BETA, L1, L2 = 1e-4, 1.0, 0.1, 5.0


def chain_time(f, *args, iters=(3, 9)):
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


def _pass3_kernel(n_ref, z_ref, a_ref, n_out, z_out, *, alpha):
    from ftrl_ffm_tpu.ftrl import FtrlParams, ftrl_weights  # noqa: F401

    n = n_ref[:]
    a = a_ref[:]
    sigma = (jnp.sqrt(n + a) - jnp.sqrt(n)) / alpha
    # w computed lazily from PRE-update (n, z_pre): here we approximate the
    # byte traffic only (micro probe) — w = f(n, z') with z' already holding
    # z + sum_g; the real integration reconstructs z_pre = z' - sum_g or
    # restructures the scatter order.  Same FLOPs and bytes either way.
    p = FtrlParams(alpha, BETA, L1, L2)
    w = ftrl_weights(n, z_ref[:], p)
    z_out[:] = z_ref[:] - sigma * w
    n_out[:] = n + a


def pass3(n_tab, z_tab, a):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ftrl_ffm_tpu.ops.ftrl_pallas import _block_rows

    r, d = n_tab.shape
    br = _block_rows(r, d)
    kern = functools.partial(_pass3_kernel, alpha=ALPHA)
    spec = pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(r // br,),
        in_specs=[spec] * 3,
        out_specs=[spec] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((r, d), n_tab.dtype),
            jax.ShapeDtypeStruct((r, d), z_tab.dtype),
        ],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(n_tab, z_tab, a)


def main():
    from ftrl_ffm_tpu.ftrl import FtrlParams, ftrl_weights
    from ftrl_ffm_tpu.ops.ftrl_pallas import closed_form_pass_pallas

    p = FtrlParams(ALPHA, BETA, L1, L2)
    rng = np.random.default_rng(0)
    per = R // C
    ids2d = (rng.integers(0, per, (B, C)) + np.arange(C) * per).astype(np.int32)
    ids = jnp.asarray(ids2d.reshape(-1))
    uniq_ct = np.unique(ids2d).size
    print(f"B={B} C={C} R={R} E={E} nnz={NNZ} uniq={uniq_ct}", flush=True)

    which = sys.argv[1:] or [
        "gather1", "gather2", "gather_wide", "scat_z", "scat_acc",
        "pass4", "pass3", "sortagg", "scatback_set",
        "cand_now", "cand_sorted",
    ]

    def report(name, f, *args):
        if name not in which:
            return
        try:
            ms = chain_time(f, *args)
        except Exception as e:  # noqa: BLE001
            print(f"  {name:13s} FAILED: {type(e).__name__}: {e}", flush=True)
            return
        print(f"  {name:13s} {ms:8.2f} ms", flush=True)

    def wmax(a):
        return jnp.max(a.astype(jnp.float32))

    need = set(which)
    tab = jnp.asarray(rng.normal(0, 0.1, (R, E)).astype(np.float32))
    tab2 = tab * 1.5
    g = jnp.asarray(rng.normal(0, 1e-3, (NNZ, E)).astype(np.float32))
    gg2 = (
        jnp.concatenate([g, g * g], axis=-1)
        if need & {"sortagg", "cand_sorted"}
        else None
    )

    report("gather1",
           lambda x, t, i: wmax(jnp.take(t, i, axis=0, mode="clip") + x),
           tab, ids)
    report("gather2",
           lambda x, t, t2, i: wmax(
               jnp.take(t, i, axis=0, mode="clip")
               + jnp.take(t2, i, axis=0, mode="clip") + x),
           tab, tab2, ids)
    if "gather_wide" in need:
        wide = jnp.concatenate([tab, tab2], axis=-1)
        report("gather_wide",
               lambda x, t, i: wmax(jnp.take(t, i, axis=0, mode="clip") + x),
               wide, ids)
        del wide
    report("scat_z",
           lambda x, t, i, gg: wmax(t.at[i].add(gg + x, mode="drop")),
           tab, ids, g)
    report("scat_acc",
           lambda x, i, gg: wmax(
               jnp.zeros((R, E), jnp.float32).at[i].add(gg + x, mode="drop")),
           ids, g)

    # Pass probes chain the donated tables themselves (aliased outputs with
    # NO donation would copy each table first — 2.56 GB apiece — and OOM)
    def time_pass(n_tables: int) -> float:
        a = jnp.abs(tab2) * 1e-6

        if n_tables == 4:
            f = jax.jit(
                lambda n, z, w, a: closed_form_pass_pallas(n, z, w, a, p),
                donate_argnums=(0, 1, 2),
            )
            state = (jnp.abs(tab), tab2, tab * 0.1)
        else:
            f = jax.jit(
                lambda n, z, a: pass3(n, z, a), donate_argnums=(0, 1)
            )
            state = (jnp.abs(tab), tab2)
        state = f(*state, a)
        float(jnp.max(state[0]))

        def run(k):
            nonlocal state
            t0 = time.perf_counter()
            for _ in range(k):
                state = f(*state, a)
            float(jnp.max(state[0]))
            return time.perf_counter() - t0

        run(1)
        t1, t2 = run(3), run(9)
        return (t2 - t1) / 6 * 1e3

    if "pass4" in need:
        print(f"  pass4         {time_pass(4):8.2f} ms", flush=True)
    if "pass3" in need:
        print(f"  pass3         {time_pass(3):8.2f} ms", flush=True)

    def sortagg(x, i, pay):
        order = jnp.argsort(i + x.astype(jnp.int32))
        sids = jnp.take(i, order)
        spay = jnp.take(pay, order, axis=0)
        is_start = jnp.concatenate([jnp.ones((1,), bool), sids[1:] != sids[:-1]])
        seg = jnp.cumsum(is_start) - 1
        sums = jax.ops.segment_sum(
            spay, seg, num_segments=NNZ, indices_are_sorted=True
        )
        uniq = jnp.full((NNZ,), R, jnp.int32).at[seg].set(sids, mode="drop")
        return wmax(sums) + wmax(uniq.astype(jnp.float32))

    report("sortagg", sortagg, ids, gg2)

    suniq = jnp.asarray(
        np.pad(np.unique(ids2d), (0, NNZ - uniq_ct), constant_values=R
               ).astype(np.int32))
    kw = dict(mode="drop", indices_are_sorted=True)
    report("scatback_set",
           lambda x, t, t2, u, pay: wmax(
               t.at[u].set(pay + x, **kw)) + wmax(
               t2.at[u].set(pay * 2 + x, **kw)),
           tab, tab2, suniq, g)

    # ---- composed candidates (fwd gather + full update path) ----
    def cand_now(x, n, z, i, gg):
        # lazy fwd: gather n, z; w elementwise (feeds the "kernel" dep)
        gn = jnp.take(n, i, axis=0, mode="clip")
        gz = jnp.take(z, i, axis=0, mode="clip")
        gw = ftrl_weights(gn + x, gz, p)
        gval = gg * (1 + 1e-20 * wmax(gw))  # dependency, no real compute
        z2 = z.at[i].add(gval, mode="drop")
        a = jnp.zeros((R, E), jnp.float32).at[i].add(gval * gval, mode="drop")
        out = pass3(jnp.abs(n), z2, a)
        return wmax(out[0]) + wmax(out[1])

    report("cand_now", cand_now, jnp.abs(tab), tab2, ids, g)

    def cand_sorted(x, n, z, i, gg):
        gn = jnp.take(n, i, axis=0, mode="clip")
        gz = jnp.take(z, i, axis=0, mode="clip")
        gw = ftrl_weights(gn + x, gz, p)
        pay = jnp.concatenate([gg, gg * gg], axis=-1) * (1 + 1e-20 * wmax(gw))
        order = jnp.argsort(i)
        sids = jnp.take(i, order)
        spay = jnp.take(pay, order, axis=0)
        is_start = jnp.concatenate([jnp.ones((1,), bool), sids[1:] != sids[:-1]])
        seg = jnp.cumsum(is_start) - 1
        sums = jax.ops.segment_sum(
            spay, seg, num_segments=NNZ, indices_are_sorted=True
        )
        uniq = jnp.full((NNZ,), R, jnp.int32).at[seg].set(sids, mode="drop")
        occ = jnp.zeros((NNZ,), jnp.int32).at[seg].set(order, mode="drop")
        n_rows = jnp.take(gn, occ, axis=0)
        z_rows = jnp.take(gz, occ, axis=0)
        sum_g, sum_g2 = sums[:, :E], sums[:, E:]
        sigma = (jnp.sqrt(n_rows + sum_g2) - jnp.sqrt(n_rows)) / ALPHA
        w_rows = ftrl_weights(n_rows, z_rows, p)
        new_z = z_rows + sum_g - sigma * w_rows
        new_n = n_rows + sum_g2
        kw2 = dict(mode="drop", indices_are_sorted=True)
        n2 = n.at[uniq].set(new_n, **kw2)
        z2 = z.at[uniq].set(new_z, **kw2)
        return wmax(n2) + wmax(z2)

    report("cand_sorted", cand_sorted, jnp.abs(tab), tab2, ids, gg2)


if __name__ == "__main__":
    main()
