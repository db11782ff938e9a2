"""Training orchestration: online (streaming) and offline (in-memory) modes.

Mirrors the reference's task layer (src/task/ftrl_online.cpp:42-67,
src/task/ftrl_offline.cpp:44-61): per-epoch train pass with running train
log-loss computed from the pre-update training logits, followed by an eval
pass, both printed in the reference's format.  The concurrency runtime
(producer/consumer threads, thread pool) is replaced by a host prefetch
thread feeding jitted device steps.
"""

from __future__ import annotations

import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ftrl_ffm_tpu.config import Config, detect_file_type
from ftrl_ffm_tpu.data.loader import batch_iterator, load_file
from ftrl_ffm_tpu.data.parser import sniff_max_nnz
from ftrl_ffm_tpu.data.stream import StreamReader
from ftrl_ffm_tpu.metrics import LossAccumulator, StreamingAUC
from ftrl_ffm_tpu.models import Batch, make_model
from ftrl_ffm_tpu.models.base import ModelState

AUC_BINS = 8192


class Trainer:
    def __init__(self, cfg: Config, state: Optional[ModelState] = None):
        if not cfg.file_type and cfg.train_data:
            cfg.file_type = detect_file_type(cfg.train_data)
        cfg.validate_file_type()
        if cfg.max_nnz <= 0 and cfg.train_data:
            cfg.max_nnz = sniff_max_nnz(cfg.train_data, cfg.file_type)
        self.cfg = cfg
        self.model = make_model(cfg)
        self.state = state if state is not None else self.model.init()

        self._steps_done = 0
        self._sharded = None
        use_mesh = cfg.mesh_model > 1 or cfg.mesh_data > 1 or cfg.mesh_data == 0
        if use_mesh:
            from ftrl_ffm_tpu.parallel import ShardedStep, make_mesh, shard_state

            mesh = make_mesh(cfg.mesh_data, cfg.mesh_model)
            if cfg.batch_size % mesh.shape["data"]:
                raise ValueError(
                    f"batch_size {cfg.batch_size} not divisible by "
                    f"mesh_data {mesh.shape['data']}"
                )
            self.state = shard_state(self.state, mesh)
            self._sharded = ShardedStep(cfg, mesh, self.state)
            self._train_step = self._sharded.train_step
            self._eval_step = jax.jit(self._eval_with_auc_sharded)
        else:
            self._train_step = jax.jit(self.model.train_step, donate_argnums=0)
            self._eval_step = jax.jit(self._eval_with_auc)

    def _eval_with_auc_sharded(self, state: ModelState, batch: Batch):
        loss_sum, count, logits = self._sharded.eval_step(state, batch)
        pos, neg = StreamingAUC.bucket_counts(
            logits, batch.y, batch.sample_w, AUC_BINS
        )
        return loss_sum, count, pos, neg

    def _eval_with_auc(self, state: ModelState, batch: Batch):
        loss_sum, count, logits = self.model.eval_step(state, batch)
        pos, neg = StreamingAUC.bucket_counts(
            logits, batch.y, batch.sample_w, AUC_BINS
        )
        return loss_sum, count, pos, neg

    # ---- batch plumbing ----
    def _device_feed(self, arrays_iter):
        """Background-thread device upload: host->HBM transfers overlap the
        previous step's compute (the device-feed analogue of the reference's
        producer thread staying ahead of its consumers,
        src/concurrent/pc_task.cpp:34-55)."""
        import queue as _queue
        import threading as _threading

        q: _queue.Queue = _queue.Queue(maxsize=2)
        err: list[BaseException] = []

        def upload():
            try:
                for arrays in arrays_iter:
                    q.put(self._device_batch(arrays))
            except BaseException as e:
                err.append(e)
            finally:
                q.put(None)

        t = _threading.Thread(target=upload, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is None:
                break
            yield b
        t.join()
        if err:
            raise err[0]

    def _device_batch(self, arrays) -> Batch:
        if self._sharded is not None:
            return self._sharded.place_batch(arrays)
        fields, feats, vals, y, sample_w = arrays
        return Batch(
            fields=jnp.asarray(fields),
            feats=jnp.asarray(feats),
            vals=jnp.asarray(vals),
            y=jnp.asarray(y),
            sample_w=jnp.asarray(sample_w),
        )

    def _train_batches(self, epoch_rng: np.random.Generator):
        cfg = self.cfg
        if cfg.online:
            src = sys.stdin if cfg.cmd else cfg.train_data
            reader = StreamReader(
                src,
                cfg.file_type,
                cfg.batch_size,
                cfg.max_nnz,
                cfg.n_feats,
                cfg.n_fields,
            )
            yield from reader.batches()
        else:
            if not hasattr(self, "_train_ds"):
                self._train_ds = load_file(
                    cfg.train_data,
                    cfg.file_type,
                    cfg.max_nnz,
                    cfg.n_feats,
                    cfg.n_fields,
                    n_workers=cfg.n_threads,
                )
            yield from batch_iterator(
                self._train_ds,
                cfg.batch_size,
                shuffle=cfg.shuffle,
                rng=epoch_rng,
                sentinel=cfg.n_feats,
            )

    def _eval_batches(self):
        cfg = self.cfg
        if cfg.online:
            reader = StreamReader(
                cfg.eval_data,
                cfg.file_type,
                cfg.batch_size,
                cfg.max_nnz,
                cfg.n_feats,
                cfg.n_fields,
            )
            yield from reader.batches()
        else:
            if not hasattr(self, "_eval_ds"):
                self._eval_ds = load_file(
                    cfg.eval_data,
                    cfg.file_type,
                    cfg.max_nnz,
                    cfg.n_feats,
                    cfg.n_fields,
                    n_workers=cfg.n_threads,
                )
            yield from batch_iterator(
                self._eval_ds, cfg.batch_size, shuffle=False, sentinel=cfg.n_feats
            )

    # ---- epochs ----
    def train_epoch(self, epoch_rng: Optional[np.random.Generator] = None) -> float:
        if epoch_rng is None:
            epoch_rng = np.random.default_rng(self.cfg.seed)
        sums = []
        save_every = self.cfg.save_every
        for batch in self._device_feed(self._train_batches(epoch_rng)):
            out = self._train_step(self.state, batch)
            self.state = out.state
            sums.append((out.loss_sum, out.count))
            if save_every and self.cfg.model_path:
                step = len(sums) + self._steps_done
                if step % save_every == 0:
                    self._save_mid_checkpoint(step)
        self._steps_done += len(sums)
        if not sums:
            return float("nan")
        # One device-side reduction + a single host readback: per-batch
        # float() readbacks serialize against the dispatch queue.
        loss_sum = jnp.sum(jnp.stack([s for s, _ in sums]))
        count = jnp.sum(jnp.stack([c for _, c in sums]))
        acc = LossAccumulator()
        acc.update(*jax.device_get((loss_sum, count)))
        return acc.mean

    def _save_mid_checkpoint(self, step: int) -> None:
        """Periodic full-state checkpoint (new capability vs the reference,
        which has no mid-training checkpointing — SURVEY §5)."""
        from ftrl_ffm_tpu.io.checkpoint import save_checkpoint

        save_checkpoint(
            self.cfg.model_path,
            self.state,
            level=self.cfg.compress_level,
            extra={"mid_training_step": step},
        )

    def evaluate(self) -> tuple[float, float]:
        acc = LossAccumulator()
        auc = StreamingAUC(AUC_BINS)
        results = []
        for batch in self._device_feed(self._eval_batches()):
            results.append(self._eval_step(self.state, batch))
        if not results:
            return float("nan"), float("nan")
        loss_sum = jnp.sum(jnp.stack([r[0] for r in results]))
        count = jnp.sum(jnp.stack([r[1] for r in results]))
        pos = jnp.sum(jnp.stack([r[2] for r in results]), axis=0)
        neg = jnp.sum(jnp.stack([r[3] for r in results]), axis=0)
        loss_sum, count, pos, neg = jax.device_get((loss_sum, count, pos, neg))
        acc.update(loss_sum, count)
        auc.update(pos, neg)
        return acc.mean, auc.result()

    def train(self, profile_dir: Optional[str] = None) -> dict:
        """Full multi-epoch run; prints the reference's per-epoch lines
        (reference: src/task/ftrl_online.cpp:45-67).

        profile_dir: if set, epoch 1 runs under a jax.profiler trace — the
        TPU-native upgrade of the reference's steady-clock timers
        (src/include/utils/utils.h:89-104)."""
        cfg = self.cfg
        history = {"train_loss": [], "eval_loss": [], "eval_auc": []}
        rng = np.random.default_rng(cfg.seed)
        for epoch in range(1, cfg.n_epochs + 1):
            t0 = time.perf_counter()
            if profile_dir and epoch == 1:
                with jax.profiler.trace(profile_dir):
                    train_loss = self.train_epoch(rng)
                    jax.block_until_ready(self.state.lin_z)
            else:
                train_loss = self.train_epoch(rng)
            jax.block_until_ready(self.state.lin_z)
            dt = time.perf_counter() - t0
            print(
                f"epoch {epoch} train time: {dt:.4f}s, train loss: {train_loss:.4f}"
            )
            history["train_loss"].append(train_loss)
            if cfg.eval_data:
                t0 = time.perf_counter()
                eval_loss, eval_auc = self.evaluate()
                dt = time.perf_counter() - t0
                if cfg.eval_auc:
                    print(
                        f"epoch {epoch} eval time: {dt:.4f}s, "
                        f"eval loss: {eval_loss:.4f}, eval auc: {eval_auc:.4f}"
                    )
                else:
                    print(
                        f"epoch {epoch} eval time: {dt:.4f}s, eval loss: {eval_loss:.4f}"
                    )
                history["eval_loss"].append(eval_loss)
                history["eval_auc"].append(eval_auc)
        return history
