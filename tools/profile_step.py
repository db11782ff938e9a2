"""Device-step microbenchmark: difference-method timing of one train/eval step.

Times the jitted FTRL step on synthetic Criteo-shaped batches (39 fields,
k=16) with the difference method — two chained runs of N1 and N2 steps, one
readback each, step = (t2 - t1) / (N2 - N1) — which cancels dispatch and
readback overhead and defeats async-queue artifacts (each step's state feeds
the next, so steps cannot overlap or be elided).  Compare the result with
`python tools/roofline.py` for the %-of-roofline figure published in
BASELINE.md.

Usage:
    python tools/profile_step.py [phase ...]
phases (default: pallas xla infer):
    pallas   full FFM train step, fused Pallas kernel path
    xla      full FFM train step, pure-XLA interaction path
    infer    inference/eval step (fused inference kernel on TPU)
    sharded  ShardedStep on a 1x1 mesh (shard_map + collectives overhead)
    huge     train step at N_FEATS=1M (auto-selects the in-place update)
    trace    jax.profiler trace of 5 chained train steps; prints the top
             device ops by ms/step (the BASELINE.md step breakdown)
    tiny     trivial jit (relay/device liveness probe)
Env: BATCH (8192), N_FEATS (100000), run under JAX_PLATFORMS=cpu for a
functional (not perf) check off-TPU.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(use_pallas: str = "auto", update_mode: str = "auto"):
    import jax.numpy as jnp

    from ftrl_ffm_tpu.config import Config
    from ftrl_ffm_tpu.models import Batch, make_model

    b = int(os.environ.get("BATCH", 8192))
    r = int(os.environ.get("N_FEATS", 100_000))
    c, k = 39, 16
    cfg = Config(
        model_type="FFM", n_fields=c, n_feats=r, n_factors=k, batch_size=b,
        max_nnz=c, use_pallas=use_pallas,
        update_mode=os.environ.get("UPDATE_MODE", update_mode),
        acc_dtype=os.environ.get("ACC_DTYPE", "float32"),
        table_dtype=os.environ.get("TABLE_DTYPE", "float32"),
    )
    bb = int(os.environ.get("BLOCK_B", 0))
    if bb:
        # pin the Pallas batch-tile size (kernel block_b sweep)
        import functools

        import ftrl_ffm_tpu.ops.ffm_pallas as fp

        fp.ffm_fused_logits_grads = functools.partial(
            fp.ffm_fused_logits_grads, block_b=bb
        )
    model = make_model(cfg)
    state = model.init()
    rng = np.random.default_rng(0)
    per = r // c
    ids = rng.integers(0, per, (b, c)) + np.arange(c) * per
    batch = Batch(
        fields=jnp.asarray(np.tile(np.arange(c, dtype=np.int32), (b, 1))),
        feats=jnp.asarray(ids.astype(np.int32)),
        vals=jnp.ones((b, c), jnp.float32),
        y=jnp.asarray((rng.random(b) > 0.5).astype(np.float32)),
        sample_w=jnp.ones((b,), jnp.float32),
    )
    return cfg, model, state, batch


def _jit_train(model, state):
    """Jitted train step with the Trainer's layout pinning
    (models/base.py::state_formats); returns (step_fn, placed_state)."""
    import jax

    from ftrl_ffm_tpu.models.base import TrainOut, state_formats

    fmt = state_formats(state)
    kw = {}
    if fmt is not None:
        state = jax.device_put(state, fmt, donate=True)  # avoid 2x-state OOM
        auto = fmt.bias_n
        kw = dict(
            in_shardings=(fmt, auto),
            out_shardings=TrainOut(
                state=fmt, logits=auto, loss_sum=auto, count=auto
            ),
        )
    return jax.jit(model.train_step, donate_argnums=0, **kw), state


def time_train(cfg, model, state, batch) -> float:
    f, state = _jit_train(model, state)

    def run(n: int, st):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = f(st, batch)
            st = out.state
        float(out.loss_sum)  # one chained readback
        return time.perf_counter() - t0, st

    _, state = run(1, state)  # compile + first step
    _, state = run(1, state)
    t1, state = run(4, state)
    t2, state = run(16, state)
    return (t2 - t1) / 12 * 1e3


def time_infer(cfg, model, state, batch) -> float:
    import jax
    import jax.numpy as jnp

    f = jax.jit(model.eval_step)

    def run(n: int):
        t0 = time.perf_counter()
        ls = jnp.float32(0)
        for _ in range(n):
            # chain: perturb the input by ~0 so steps depend on each other
            loss, cnt, logits = f(state, batch._replace(vals=batch.vals + ls))
            ls = loss * 1e-30
        float(ls)
        return time.perf_counter() - t0

    run(1)
    run(1)
    t1, t2 = run(4), run(16)
    return (t2 - t1) / 12 * 1e3


def time_sharded(cfg, model, state, batch) -> float:
    from ftrl_ffm_tpu.parallel import ShardedStep, make_mesh, shard_state

    mesh = make_mesh(1, 1)
    sstate = shard_state(state, mesh)
    step = ShardedStep(cfg, mesh, sstate)
    sbatch = step.place_batch(tuple(np.asarray(a) for a in batch[:5]))

    def run(n: int, st):
        t0 = time.perf_counter()
        ls = None
        for _ in range(n):
            st, logits, ls, ct, _ = step.train_step(st, sbatch)
        float(ls)
        return time.perf_counter() - t0, st

    _, sstate = run(1, sstate)
    _, sstate = run(1, sstate)
    t1, sstate = run(4, sstate)
    t2, sstate = run(16, sstate)
    return (t2 - t1) / 12 * 1e3


def trace_step(cfg, model, state, batch, steps: int = 5) -> None:
    """Capture a jax.profiler trace of `steps` chained train steps and print
    per-op device time (reads the trace.json.gz the TPU backend emits)."""
    import collections
    import glob
    import gzip
    import json
    import tempfile

    import jax

    f, state = _jit_train(model, state)
    out = f(state, batch)
    float(out.loss_sum)  # compile + warm-up outside the trace
    tmp = tempfile.mkdtemp(prefix="ftrl_trace_")
    with jax.profiler.trace(tmp):
        for _ in range(steps):
            out = f(out.state, batch)
        float(out.loss_sum)
    dur: collections.Counter = collections.Counter()
    for p in glob.glob(f"{tmp}/**/*.trace.json.gz", recursive=True):
        with gzip.open(p) as fh:
            data = json.load(fh)
        for e in data.get("traceEvents", []):
            if e.get("ph") == "X":
                dur[e.get("name", "?")] += e.get("dur", 0)
    print(f"trace: top device ops (ms/step over {steps} steps), {tmp}")
    for name, d in dur.most_common(24):
        print(f"  {d / 1e3 / steps:9.3f} ms  {name[:100]}", flush=True)


def main() -> None:
    phases = sys.argv[1:] or ["pallas", "xla", "infer"]
    for phase in phases:
        if phase == "tiny":
            import jax
            import jax.numpy as jnp

            t0 = time.time()
            print(float(jax.jit(lambda v: (v * 1.7).sum())(jnp.arange(2048.0))))
            print(f"tiny: ok in {time.time() - t0:.1f}s", flush=True)
            continue
        if phase == "huge":
            os.environ.setdefault("N_FEATS", "1000000")
        use_pallas = "off" if phase == "xla" else "auto"
        cfg, model, state, batch = build(use_pallas)
        if phase == "trace":
            trace_step(cfg, model, state, batch)
            continue
        timer = {"infer": time_infer, "sharded": time_sharded}.get(phase, time_train)
        ms = timer(cfg, model, state, batch)
        print(
            f"{phase}: {ms:.2f} ms/step -> {cfg.batch_size / ms * 1e3:,.0f} ex/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
