"""End-to-end benchmark matrix: reproduces the README performance table.

Each row is a full Trainer run (host parse + device pipeline) on synthetic
Criteo-shaped data, timed like bench.py (best epoch of 2 after a warm-up
epoch).  Run on the TPU host:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_matrix.py [row ...]

rows (default: ffm fm lr):
    ffm      FFM k=16, 100k feats, online        (the bench.py headline)
    fm       FM k=16, online
    lr       LR, online
    ffm1m    FFM k=16, 1M feature rows, online   (huge-table in-place path)
    offline  FFM k=16, offline (in-memory, shuffled)
    eval     FFM k=16 eval/serving throughput (inference kernel)
Env: ROWS_SAMPLES (400000), ACC_DTYPE, TABLE_DTYPE forwarded to Config.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SAMPLES = int(os.environ.get("ROWS_SAMPLES", 400_000))
N_FIELDS = 39


def ensure_data(n_feats: int) -> str:
    path = f"/tmp/ftrl_ffm_tpu_bench_{N_SAMPLES}_{n_feats}.txt"
    if os.path.exists(path) and os.path.getsize(path) > 0:
        return path
    rng = np.random.default_rng(7)
    per = n_feats // N_FIELDS
    ids = (
        rng.integers(0, per, (N_SAMPLES, N_FIELDS))
        + np.arange(N_FIELDS) * per
    )
    w = rng.normal(0, 0.3, n_feats)
    logit = w[ids].sum(axis=1) + rng.normal(0, 1, N_SAMPLES)
    y = (logit > 0).astype(int)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for i in range(N_SAMPLES):
            toks = [str(y[i])] + [
                f"{c}:{ids[i, c]}:1" for c in range(N_FIELDS)
            ]
            f.write(" ".join(toks) + "\n")
    os.replace(tmp, path)
    return path


def run_row(row: str) -> dict:
    import jax

    from ftrl_ffm_tpu.config import Config
    from ftrl_ffm_tpu.train import Trainer

    n_feats = 1_000_000 if row == "ffm1m" else 100_000
    path = ensure_data(n_feats)
    kw = dict(
        train_data=path,
        model_type={"fm": "FM", "lr": "LR"}.get(row, "FFM"),
        n_fields=N_FIELDS,
        n_feats=n_feats,
        n_factors=16,
        online=row != "offline",
        n_epochs=1,
        batch_size=8192,
        max_nnz=N_FIELDS,
        n_threads=3,
        acc_dtype=os.environ.get("ACC_DTYPE", "float32"),
        table_dtype=os.environ.get("TABLE_DTYPE", "float32"),
    )
    if kw["model_type"] == "FFM":
        kw["file_type"] = "libffm"
    trainer = Trainer(Config(**kw))
    trainer.train_epoch()  # warm-up: compile + page-in
    jax.block_until_ready(trainer.state.lin_z)

    if row == "eval":
        trainer.cfg.eval_data = path
        trainer.evaluate()  # warm-up: compile the eval/AUC jit
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            loss, auc = trainer.evaluate()
            times.append(time.perf_counter() - t0)
        return {"row": row, "examples_per_s": round(N_SAMPLES / min(times), 1),
                "eval_loss": round(loss, 4)}

    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        loss = trainer.train_epoch()
        jax.block_until_ready(trainer.state.lin_z)
        times.append(time.perf_counter() - t0)
    return {
        "row": row,
        "examples_per_s": round(N_SAMPLES / min(times), 1),
        "train_loss": round(loss, 4),
    }


def main() -> None:
    rows = sys.argv[1:] or ["ffm", "fm", "lr"]
    if len(rows) > 1:
        # one subprocess per row: rows contaminate each other in-process
        # (lingering device state + CPU contention measured eval at 184k
        # in sequence vs 548k alone)
        import subprocess

        for row in rows:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), row], check=True
            )
        return
    for row in rows:
        print(json.dumps(run_row(row)), flush=True)


if __name__ == "__main__":
    main()
