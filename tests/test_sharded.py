"""Sharded step ((data, model) mesh) must match the single-device step.

Runs on the virtual 8-device CPU mesh from conftest.py — the TPU-free
equivalent of a multi-chip slice (SURVEY §4's "new" multi-host test tier).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ftrl_ffm_tpu.config import Config
from ftrl_ffm_tpu.models import Batch, make_model
from ftrl_ffm_tpu.parallel import ShardedStep, make_mesh, shard_state, unshard_state


def _random_batch(rng, b, f, n_feats, n_fields, pad_tail=2):
    fields = rng.integers(0, n_fields, (b, f)).astype(np.int32)
    feats = rng.integers(0, n_feats, (b, f)).astype(np.int32)
    vals = rng.random((b, f)).astype(np.float32)
    y = (rng.random(b) > 0.5).astype(np.float32)
    sample_w = np.ones(b, np.float32)
    # inert padding occurrences + padded samples, like real batches
    feats[:, -1] = n_feats
    vals[:, -1] = 0.0
    fields[:, -1] = 0
    if pad_tail:
        sample_w[-pad_tail:] = 0.0
        vals[-pad_tail:] = 0.0
        feats[-pad_tail:] = n_feats
        y[-pad_tail:] = 0.0
    return (fields, feats, vals, y, sample_w)


def _cfg(model_type, **kw):
    return Config(
        model_type=model_type,
        n_feats=50,
        n_fields=4,
        n_factors=4,
        batch_size=16,
        max_nnz=5,
        **kw,
    )


@pytest.mark.parametrize("model_type", ["LR", "FM", "FFM"])
@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
@pytest.mark.parametrize("lookup_mode", ["replicate", "route"])
def test_sharded_matches_single_device(model_type, mesh_shape, lookup_mode):
    if lookup_mode == "route" and mesh_shape[1] == 1:
        pytest.skip("route degenerates to replicate at mesh_model=1")
    cfg = _cfg(model_type, lookup_mode=lookup_mode)
    model = make_model(cfg)
    state0 = model.init()
    rng = np.random.default_rng(0)
    arrays = _random_batch(rng, cfg.batch_size, cfg.max_nnz, cfg.n_feats, cfg.n_fields)
    batch = Batch(*(jnp.asarray(a) for a in arrays))

    # single-device ground truth, two steps
    out1 = model.train_step(state0, batch)
    out2 = model.train_step(out1.state, batch)

    mesh = make_mesh(*mesh_shape)
    sstate = shard_state(model.init(), mesh)
    step = ShardedStep(cfg, mesh, sstate)
    sbatch = step.place_batch(arrays)
    sstate, logits, loss_sum, count = step.train_step(sstate, sbatch)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(out1.logits), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        float(loss_sum), float(out1.loss_sum), rtol=1e-5
    )
    assert float(count) == float(out1.count)
    sstate, logits, loss_sum, count = step.train_step(sstate, sbatch)

    lstate = unshard_state(sstate, mesh.shape["model"], cfg.n_feats)
    np.testing.assert_allclose(
        np.asarray(lstate.lin_z), np.asarray(out2.state.lin_z), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(lstate.lin_n), np.asarray(out2.state.lin_n), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        float(lstate.bias_z), float(out2.state.bias_z), rtol=1e-5
    )
    if model_type != "LR":
        np.testing.assert_allclose(
            np.asarray(lstate.vec_z),
            np.asarray(out2.state.vec_z),
            rtol=1e-4,
            atol=1e-7,
        )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(out2.logits), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("model_type", ["FFM"])
def test_sharded_eval_matches(model_type):
    cfg = _cfg(model_type)
    model = make_model(cfg)
    state0 = model.init()
    rng = np.random.default_rng(1)
    arrays = _random_batch(rng, cfg.batch_size, cfg.max_nnz, cfg.n_feats, cfg.n_fields)
    batch = Batch(*(jnp.asarray(a) for a in arrays))
    loss_sum, count, logits = model.eval_step(state0, batch)

    mesh = make_mesh(4, 2)
    sstate = shard_state(model.init(), mesh)
    step = ShardedStep(cfg, mesh, sstate)
    sloss, scount, slogits = step.eval_step(sstate, step.place_batch(arrays))
    np.testing.assert_allclose(float(sloss), float(loss_sum), rtol=1e-5)
    assert float(scount) == float(count)
    np.testing.assert_allclose(
        np.asarray(slogits), np.asarray(logits), rtol=1e-5, atol=1e-6
    )


def test_trainer_with_mesh_matches_single_device(tmp_path):
    """End-to-end Trainer parity: (4 data x 2 model) mesh vs single device."""
    import copy
    from ftrl_ffm_tpu.train import Trainer

    # small synthetic libffm file
    rng = np.random.default_rng(0)
    lines = []
    for i in range(256):
        toks = [str(int(rng.random() > 0.5))] + [
            f"{c}:{int(rng.integers(0, 50))}:1" for c in range(4)
        ]
        lines.append(" ".join(toks))
    path = str(tmp_path / "train.ffm")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")

    kw = dict(
        train_data=path, eval_data=path, model_type="FFM", n_fields=4,
        n_feats=50, n_factors=4, batch_size=64, n_epochs=1, online=True,
    )
    t1 = Trainer(Config(**kw))
    h1 = t1.train()
    t2 = Trainer(Config(**kw, mesh_data=4, mesh_model=2))
    h2 = t2.train()
    np.testing.assert_allclose(h1["train_loss"], h2["train_loss"], rtol=1e-5)
    np.testing.assert_allclose(h1["eval_loss"], h2["eval_loss"], rtol=1e-5)
    np.testing.assert_allclose(h1["eval_auc"], h2["eval_auc"], rtol=1e-4)


@pytest.mark.parametrize("model_type", ["LR", "FFM"])
def test_sharded_sparse_update_matches_single_device(model_type):
    """update_mode=sparse: all_gather (id, g) stream + touched-rows update
    must equal the single-device sparse step."""
    cfg = _cfg(model_type, update_mode="sparse", lookup_mode="replicate")
    model = make_model(cfg)
    rng = np.random.default_rng(4)
    arrays = _random_batch(rng, cfg.batch_size, cfg.max_nnz, cfg.n_feats, cfg.n_fields)
    batch = Batch(*(jnp.asarray(a) for a in arrays))
    out1 = model.train_step(model.init(), batch)

    mesh = make_mesh(4, 2)
    sstate = shard_state(model.init(), mesh)
    step = ShardedStep(cfg, mesh, sstate)
    sstate, logits, loss_sum, count = step.train_step(sstate, step.place_batch(arrays))
    lstate = unshard_state(sstate, mesh.shape["model"], cfg.n_feats)
    np.testing.assert_allclose(
        np.asarray(lstate.lin_z), np.asarray(out1.state.lin_z), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(out1.logits), rtol=1e-5, atol=1e-6
    )
    if model_type != "LR":
        np.testing.assert_allclose(
            np.asarray(lstate.vec_z), np.asarray(out1.state.vec_z),
            rtol=1e-4, atol=1e-7,
        )


def test_route_capacity_overflow_drops_gracefully():
    """With a tiny route_capacity, overflowing occurrences are dropped (not
    corrupted): the step still runs, and rows that did fit still update."""
    cfg = _cfg("LR", lookup_mode="route", route_capacity=0.01)
    model = make_model(cfg)
    rng = np.random.default_rng(7)
    arrays = _random_batch(rng, cfg.batch_size, cfg.max_nnz, cfg.n_feats, cfg.n_fields,
                           pad_tail=0)
    # every occurrence the same id -> one owner bucket, guaranteed overflow
    arrays = (arrays[0], np.full_like(arrays[1], 3), arrays[2], arrays[3], arrays[4])

    mesh = make_mesh(2, 4)
    sstate = shard_state(model.init(), mesh)
    step = ShardedStep(cfg, mesh, sstate)
    assert step.mode == "route" and step.route_k == 8  # clamped minimum
    sstate, logits, loss_sum, count = step.train_step(sstate, step.place_batch(arrays))
    assert np.isfinite(float(loss_sum))
    lstate = unshard_state(sstate, 4, cfg.n_feats)
    # id 3 received *some* gradient (the routed portion), everything else none
    z = np.asarray(lstate.lin_z)
    assert z[3] != 0.0
    assert np.all(z[:3] == 0.0) and np.all(z[4:] == 0.0)
