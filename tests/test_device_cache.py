"""Device-resident offline mode (Config.device_cache): the dataset lives in
device memory and epochs run as on-device gather + scan — numerics must be
bit-identical to the streamed host-fed offline path (same shuffle rng, same
padding convention), save_every must still fire, and gating must fall back
to streaming where the mode doesn't apply."""

import numpy as np
import pytest

import jax

from ftrl_ffm_tpu.config import Config
from ftrl_ffm_tpu.train import Trainer
from tests.common import FIXTURE_FEATS, FIXTURE_FIELDS, write_fixture


def _cfg(train_path, eval_path="", **kw):
    base = dict(
        train_data=train_path,
        eval_data=eval_path,
        model_type="FFM",
        n_feats=FIXTURE_FEATS,
        n_fields=FIXTURE_FIELDS,
        n_factors=4,
        n_epochs=3,
        online=False,
        batch_size=24,  # 64 fixture lines -> 3 padded-steps per epoch
        w_alpha=0.05,
        w_l1=0.15,
        w_l2=1.0,
    )
    base.update(kw)
    return Config(**base)


def _state_equal(a, b):
    # ulp-level slack only: scan-body vs standalone-step jit boundaries fuse
    # reductions differently (same precedent/tolerance as
    # test_train.py::test_steps_per_call_matches_single_step)
    fa, fb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-6
        )


def _reverse_fields(path):
    """Rewrite a libffm file with per-line token order reversed, so fields
    are NOT the canonical 0..F-1 iota: the cached dataset-level iota marker
    must not engage, exercising the general-fields kernel path on both
    sides.  (The general path's self-slot cancellation leaves fusion-
    dependent O(ulp) dust on mathematically-untouched slots; keep_init is
    dust-proof against it — ftrl.UNTOUCHED_N — which this comparison also
    regression-covers: an exact-zero untouched test would amplify the dust
    to init magnitude in vec_w and fail _state_equal.)"""
    lines = []
    with open(path) as f:
        for ln in f:
            toks = ln.split()
            lines.append(" ".join([toks[0]] + toks[:0:-1]))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.mark.parametrize("model_type", ["LR", "FM", "FFM"])
def test_cached_matches_streamed_exactly(tmp_path, model_type):
    """device_cache=on vs off: identical per-epoch losses and final state
    (the cached path gathers the very same padded batches on device)."""
    ftype = "libsvm" if model_type in ("LR", "FM") else "libffm"
    train = write_fixture(tmp_path / f"t.{ftype}", ftype, seed=0)
    evalp = write_fixture(tmp_path / f"e.{ftype}", ftype, seed=1)
    if model_type == "FFM":
        _reverse_fields(train)
        _reverse_fields(evalp)
    t_on = Trainer(_cfg(train, evalp, model_type=model_type, device_cache="on"))
    t_off = Trainer(_cfg(train, evalp, model_type=model_type, device_cache="off"))
    h_on = t_on.train()
    h_off = t_off.train()
    assert t_on._dev_cache.get("train") is not None
    assert "train" not in t_off._dev_cache
    # same batches, same math; remaining slack is ulp-level jit-boundary
    # fusion differences (see _state_equal)
    np.testing.assert_allclose(
        h_on["train_loss"], h_off["train_loss"], rtol=1e-6
    )
    np.testing.assert_allclose(h_on["eval_loss"], h_off["eval_loss"], rtol=1e-6)
    np.testing.assert_allclose(h_on["eval_auc"], h_off["eval_auc"], rtol=1e-6)
    _state_equal(t_on.state, t_off.state)


def test_cached_engages_automatically_offline(tmp_path):
    """auto engages on the CPU test backend (device memory == host RAM)."""
    train = write_fixture(tmp_path / "t.ffm", "libffm", seed=0)
    tr = Trainer(_cfg(train))
    tr.train_epoch()
    assert tr._dev_cache.get("train") is not None


def test_online_train_cached_matches_streamed(tmp_path):
    """Online TRAIN caches too (file-backed input only): epochs replay the
    HBM-resident dataset in FILE ORDER — identical batches to the streamed
    single-pass-per-epoch semantics (reference ftrl_online.cpp:42-58
    rewinds and re-reads the same file each epoch).  Per-epoch train/eval
    losses and final state must match the streamed online run; the eval
    cache equality rides along."""
    train = write_fixture(tmp_path / "t.ffm", "libffm", seed=0)
    evalp = write_fixture(tmp_path / "e.ffm", "libffm", seed=1)
    t_on = Trainer(_cfg(train, evalp, online=True, device_cache="on"))
    t_off = Trainer(_cfg(train, evalp, online=True, device_cache="off"))
    h_on = t_on.train()
    h_off = t_off.train()
    assert t_on._dev_cache.get("train") is not None
    assert "train" not in t_off._dev_cache or t_off._dev_cache["train"] is None
    np.testing.assert_allclose(
        h_on["train_loss"], h_off["train_loss"], rtol=1e-6
    )
    np.testing.assert_allclose(h_on["eval_loss"], h_off["eval_loss"], rtol=1e-6)
    np.testing.assert_allclose(h_on["eval_auc"], h_off["eval_auc"], rtol=1e-6)
    _state_equal(t_on.state, t_off.state)


def test_online_cached_unrolled_matches_single_step(tmp_path, monkeypatch):
    """FTRL_IOTA_UNROLL=U groups U file-order replay steps into one
    dispatch (straight-line unroll, not scan — see _gather_train_unroll).
    B=8 on the 64-line fixture gives 8 steps/epoch; U=3 exercises 2 full
    unrolled groups + a 2-step single-dispatch tail.  Per-epoch losses and
    final state must match the default single-step replay ulp-exactly."""
    train = write_fixture(tmp_path / "t.ffm", "libffm", seed=0)
    monkeypatch.setenv("FTRL_IOTA_UNROLL", "3")
    t_u = Trainer(_cfg(train, online=True, device_cache="on", batch_size=8))
    h_u = t_u.train()
    monkeypatch.delenv("FTRL_IOTA_UNROLL")
    t_1 = Trainer(_cfg(train, online=True, device_cache="on", batch_size=8))
    h_1 = t_1.train()
    assert t_u._dev_cache.get("train") is not None
    np.testing.assert_allclose(h_u["train_loss"], h_1["train_loss"], rtol=1e-6)
    _state_equal(t_u.state, t_1.state)


def test_online_train_cache_engages_automatically(tmp_path):
    """auto engages for file-backed online train on the CPU test backend;
    multi-epoch train losses keep decreasing (file-order replay, no
    shuffle — a shuffled replay would diverge from the streamed twin,
    covered by the equality test above)."""
    train = write_fixture(tmp_path / "t.ffm", "libffm", seed=0)
    tr = Trainer(_cfg(train, online=True))
    tr.train_epoch()
    assert tr._dev_cache.get("train") is not None


def test_online_cmd_stdin_never_caches_train(tmp_path):
    """--cmd streams from stdin: it cannot be re-read, so the train role
    must decline the cache before touching any file."""
    train = write_fixture(tmp_path / "t.ffm", "libffm", seed=0)
    tr = Trainer(
        _cfg(train, online=True, cmd=True, device_cache="on", max_nnz=8)
    )
    assert tr._ensure_device_cache("train") is None
    assert tr._dev_cache.get("train", None) is None


@pytest.mark.parametrize(
    "mesh_kw",
    [
        dict(mesh_model=2),                      # replicate lookups
        dict(mesh_model=4, mesh_data=2),         # hybrid mesh
        dict(mesh_model=8, lookup_mode="route"),  # production scaling shape
    ],
)
def test_sharded_cached_matches_sharded_streamed(tmp_path, mesh_kw):
    """On a mesh, the cached dataset is replicated per device and each
    device gathers its slice of the batch's index row locally — results
    must match the host-fed sharded path (same rng, same global batches)."""
    train = write_fixture(tmp_path / "t.ffm", "libffm", seed=0)
    evalp = write_fixture(tmp_path / "e.ffm", "libffm", seed=1)
    _reverse_fields(train)
    _reverse_fields(evalp)
    kw = dict(batch_size=16, **mesh_kw)
    t_on = Trainer(_cfg(train, evalp, device_cache="on", **kw))
    t_off = Trainer(_cfg(train, evalp, device_cache="off", **kw))
    h_on, h_off = t_on.train(), t_off.train()
    assert t_on._dev_cache.get("train") is not None
    assert "train" not in t_off._dev_cache
    np.testing.assert_allclose(h_on["train_loss"], h_off["train_loss"], rtol=1e-6)
    np.testing.assert_allclose(h_on["eval_loss"], h_off["eval_loss"], rtol=1e-6)
    np.testing.assert_allclose(h_on["eval_auc"], h_off["eval_auc"], rtol=1e-6)
    assert h_on["route_overflow"] == h_off["route_overflow"]
    _state_equal(t_on.logical_state, t_off.logical_state)
    assert int(t_on.state.step) == int(t_off.state.step)


def test_sharded_cached_matches_unsharded_streamed(tmp_path):
    """Cross-tier: (1,8) route mesh with the cached dataset equals the
    plain unsharded streamed run — same losses and logical state."""
    train = write_fixture(tmp_path / "t.ffm", "libffm", seed=0)
    _reverse_fields(train)
    t_mesh = Trainer(
        _cfg(train, device_cache="on", mesh_model=8, lookup_mode="route",
             batch_size=16)
    )
    t_flat = Trainer(_cfg(train, device_cache="off", batch_size=16))
    h_mesh, h_flat = t_mesh.train(), t_flat.train()
    np.testing.assert_allclose(
        h_mesh["train_loss"], h_flat["train_loss"], rtol=1e-6
    )
    _state_equal(t_mesh.logical_state, t_flat.state)


def test_cached_save_every_fires(tmp_path):
    from ftrl_ffm_tpu.io.checkpoint import load_checkpoint

    train = write_fixture(tmp_path / "t.ffm", "libffm", seed=0)
    ckpt = str(tmp_path / "mid.ckpt")
    cfg = _cfg(
        train, n_epochs=1, batch_size=16, save_every=2, model_path=ckpt,
        device_cache="on",
    )
    tr = Trainer(cfg)
    tr.train_epoch()
    state, extra = load_checkpoint(ckpt)
    assert extra["mid_training_step"] == 4  # 64/16 steps, saved at 2 and 4


def test_cached_steps_per_call_grouping(tmp_path):
    """spc>1 drives the cached chunking; results equal the spc=1 cached run."""
    train = write_fixture(tmp_path / "t.ffm", "libffm", seed=0)
    t1 = Trainer(_cfg(train, device_cache="on"))
    t2 = Trainer(_cfg(train, device_cache="on", steps_per_call=2))
    h1, h2 = t1.train(), t2.train()
    np.testing.assert_allclose(h1["train_loss"], h2["train_loss"], rtol=1e-6)
    _state_equal(t1.state, t2.state)
    assert int(t1.state.step) == int(t2.state.step)


def test_cached_canonical_markers_match_streamed(tmp_path):
    """Canonical CTR content (one feature per field in slot order, all values
    1.0) engages the dataset-level zero-size markers; results must still
    equal the streamed path, including the padded remainder chunk whose
    pad-index rows see reconstructed ones/iota (inert via sample_w=0)."""
    path = str(tmp_path / "canon.ffm")
    rng = np.random.default_rng(5)
    with open(path, "w") as f:
        for _ in range(58):  # not a multiple of 24: remainder batch
            toks = [str(int(rng.random() > 0.5))] + [
                f"{c}:{int(rng.integers(c * 10, (c + 1) * 10))}:1"
                for c in range(FIXTURE_FIELDS)
            ]
            f.write(" ".join(toks) + "\n")
    t_on = Trainer(_cfg(path, device_cache="on"))
    t_off = Trainer(_cfg(path, device_cache="off"))
    h_on, h_off = t_on.train(), t_off.train()
    entry = t_on._dev_cache["train"]
    assert entry.n == 58
    assert entry.ds[0].shape == (0, FIXTURE_FIELDS)  # iota fields marker
    assert entry.ds[2].shape == (0, FIXTURE_FIELDS)  # all-ones vals marker
    np.testing.assert_allclose(h_on["train_loss"], h_off["train_loss"], rtol=1e-6)
    _state_equal(t_on.state, t_off.state)


class _OrderRng:
    """Test stub: .shuffle() writes a fixed permutation, so the streamed /
    replicate-cached global batch composition can be pinned exactly."""

    def __init__(self, order):
        self.order = np.asarray(order)

    def shuffle(self, arr):
        arr[:] = self.order


@pytest.mark.parametrize("mesh_kw", [
    dict(mesh_model=8, lookup_mode="route"),
    dict(mesh_model=2),
])
def test_shard_layout_matches_replicate_with_same_composition(tmp_path, mesh_kw):
    """device_cache_layout=shard: each device holds a contiguous 1/D slice
    and shuffles it locally.  With shuffle off, step s's global batch is
    concat_d(slice_d[s*b_dev:(s+1)*b_dev]); feeding exactly that composition
    to the replicate layout via an injected permutation must give identical
    losses and state (same math, same batch rows, same row order)."""
    train = write_fixture(tmp_path / "t.ffm", "libffm", seed=0)
    _reverse_fields(train)
    kw = dict(batch_size=16, n_epochs=1, **mesh_kw)
    t_sh = Trainer(
        _cfg(train, device_cache="on", device_cache_layout="shard", **kw)
    )
    t_rep = Trainer(
        _cfg(train, device_cache="on", device_cache_layout="replicate", **kw)
    )
    d = t_sh._cache_batch_devs()
    n = 64
    n_loc = n // d
    b_dev = 16 // d
    s_steps = n_loc // b_dev
    # global order equivalent to the shard layout's unshuffled composition
    order = np.empty(n, np.int64)
    for s in range(s_steps):
        for dev in range(d):
            for t in range(b_dev):
                order[s * 16 + dev * b_dev + t] = dev * n_loc + s * b_dev + t
    loss_sh = t_sh.train_epoch(np.random.default_rng(0))  # shuffle ignored
    t_sh2 = Trainer(
        _cfg(train, device_cache="on", device_cache_layout="shard",
             shuffle=False, **kw)
    )
    loss_sh2 = t_sh2.train_epoch(np.random.default_rng(0))
    loss_rep = t_rep.train_epoch(_OrderRng(order))
    assert t_sh2._dev_cache["train"].layout == "shard"
    assert t_rep._dev_cache["train"].layout == "replicate"
    np.testing.assert_allclose(loss_sh2, loss_rep, rtol=1e-6)
    _state_equal(t_sh2.logical_state, t_rep.logical_state)
    assert int(t_sh2.state.step) == s_steps
    assert np.isfinite(loss_sh)  # shuffled variant runs too


def test_shard_layout_eval_and_uneven_slices(tmp_path):
    """58 samples over 8 devices -> uneven slices (6 devices x 8, 2 x 7
    after base/rem split: 58 = 8*7 + 2): padded index rows must stay inert
    (loss count == 58) and eval must equal the unsharded streamed eval."""
    path = str(tmp_path / "t.ffm")
    rng = np.random.default_rng(3)
    with open(path, "w") as f:
        for _ in range(58):
            toks = [str(int(rng.random() > 0.5))] + [
                f"{c}:{int(rng.integers(c * 10, (c + 1) * 10))}"
                f":{rng.random() * 0.9 + 0.1:.4f}"
                for c in range(FIXTURE_FIELDS)
            ][::-1]
            f.write(" ".join(toks) + "\n")
    kw = dict(batch_size=16, n_epochs=1, mesh_model=8, lookup_mode="route")
    t_sh = Trainer(
        _cfg(path, path, device_cache="on", device_cache_layout="shard", **kw)
    )
    t_flat = Trainer(_cfg(path, path, device_cache="off"))
    t_sh.train_epoch()
    loss_sh, auc_sh = t_sh.evaluate()
    entry = t_sh._dev_cache["eval"]
    assert entry.layout == "shard"
    assert sum(entry.n_loc) == 58
    assert np.isfinite(loss_sh) and 0.0 <= auc_sh <= 1.0
    # eval-path equivalence on ONE state: train unsharded/streamed, then
    # evaluate that exact state through the shard-layout cached eval — the
    # eval set is identical, so loss/AUC must match the streamed eval
    t_flat.train_epoch()
    loss_flat, auc_flat = t_flat.evaluate()
    t_cross = Trainer(
        _cfg(path, path, device_cache="on", device_cache_layout="shard", **kw),
        state=t_flat.logical_state,
    )
    loss_cross, auc_cross = t_cross.evaluate()
    assert t_cross._dev_cache["eval"].layout == "shard"
    np.testing.assert_allclose(loss_cross, loss_flat, rtol=1e-6)
    np.testing.assert_allclose(auc_cross, auc_flat, rtol=1e-6)


def test_shard_layout_more_devices_than_samples(tmp_path):
    """3 samples over 8 batch devices: empty slices are all-inert blocks
    (sample_w 0) and the loss counts exactly the real samples."""
    from tests.common import fixture_lines

    path = str(tmp_path / "tiny.ffm")
    with open(path, "w") as f:
        f.write("\n".join(fixture_lines("libffm", seed=0)[:3]) + "\n")
    t = Trainer(
        _cfg(path, device_cache="on", device_cache_layout="shard",
             n_epochs=1, batch_size=16, mesh_model=8, lookup_mode="route")
    )
    loss = t.train_epoch()
    entry = t._dev_cache["train"]
    assert entry.layout == "shard" and sum(entry.n_loc) == 3
    assert np.isfinite(loss)
    assert int(t.state.step) == 1


def test_cached_resume_is_exact(tmp_path):
    """Checkpoint after 2 cached epochs, reload into a fresh trainer, run
    epoch 3 — must equal the uninterrupted 3-epoch cached run bit-exactly
    (same jitted program on both sides; the shared epoch-rng seed keeps the
    permutations aligned)."""
    from ftrl_ffm_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    train = write_fixture(tmp_path / "t.ffm", "libffm", seed=0)
    _reverse_fields(train)
    t_full = Trainer(_cfg(train, device_cache="on"))
    rng_full = np.random.default_rng(7)
    for _ in range(3):
        t_full.train_epoch(rng_full)

    t_a = Trainer(_cfg(train, device_cache="on"))
    rng_a = np.random.default_rng(7)
    t_a.train_epoch(rng_a)
    t_a.train_epoch(rng_a)
    ckpt = str(tmp_path / "mid.zst")
    save_checkpoint(ckpt, t_a.state)
    state, _ = load_checkpoint(ckpt)
    t_b = Trainer(_cfg(train, device_cache="on"), state=state)
    t_b.train_epoch(rng_a)  # rng stream continues where epoch 2 left it
    for x, y in zip(
        jax.tree_util.tree_leaves(t_full.state),
        jax.tree_util.tree_leaves(t_b.state),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_cached_step_count_and_remainder(tmp_path):
    """64 samples at B=24 -> 3 steps/epoch with a padded remainder; padded
    samples must not contribute to the loss count or the state."""
    train = write_fixture(tmp_path / "t.ffm", "libffm", seed=0)
    tr = Trainer(_cfg(train, device_cache="on", n_epochs=1))
    loss = tr.train_epoch()
    assert np.isfinite(loss)
    assert int(tr.state.step) == 3


@pytest.mark.parametrize("mesh_kw", [
    dict(mesh_model=8, lookup_mode="route"),
    dict(mesh_model=2),
])
def test_online_shard_cached_matches_streamed_multistep(tmp_path, mesh_kw):
    """ADVICE r04 (medium): online cached train under the SHARD layout must
    reproduce the streamed global batch composition with d_local > 1 and
    multiple steps per epoch.  The slices are stored stream-interleaved
    (device j holds stream rows t*B + j*b_dev ..), so the file-order replay
    equals the streamed sharded feed exactly — losses AND final state, with
    an uneven tail (58 samples at B=16 -> 4 steps, partial last batch)."""
    path = str(tmp_path / "t.ffm")
    rng = np.random.default_rng(3)
    with open(path, "w") as f:
        for _ in range(58):
            toks = [str(int(rng.random() > 0.5))] + [
                f"{c}:{int(rng.integers(c * 10, (c + 1) * 10))}"
                f":{rng.random() * 0.9 + 0.1:.4f}"
                for c in range(FIXTURE_FIELDS)
            ][::-1]
            f.write(" ".join(toks) + "\n")
    kw = dict(batch_size=16, online=True, n_epochs=2, **mesh_kw)
    t_sh = Trainer(
        _cfg(path, device_cache="on", device_cache_layout="shard", **kw)
    )
    t_st = Trainer(_cfg(path, device_cache="off", **kw))
    h_sh, h_st = t_sh.train(), t_st.train()
    assert t_sh._dev_cache["train"].layout == "shard"
    assert t_sh._cache_batch_devs() > 1
    assert int(t_sh.state.step) > t_sh.cfg.n_epochs  # multi-step epochs
    np.testing.assert_allclose(
        h_sh["train_loss"], h_st["train_loss"], rtol=1e-6
    )
    _state_equal(t_sh.logical_state, t_st.logical_state)
    assert int(t_sh.state.step) == int(t_st.state.step)


def test_online_auto_single_epoch_stays_streamed(tmp_path):
    """ADVICE r04: device_cache=auto must NOT engage for a single-pass
    online train (the blocking build is never amortized by a replay);
    n_epochs > 1 engages, and device_cache=on engages unconditionally."""
    train = write_fixture(tmp_path / "t.ffm", "libffm", seed=0)
    t1 = Trainer(_cfg(train, online=True, n_epochs=1))
    t1.train()
    assert t1._dev_cache.get("train", None) is None
    t2 = Trainer(_cfg(train, online=True, n_epochs=2))
    t2.train()
    assert t2._dev_cache.get("train") is not None
    t3 = Trainer(_cfg(train, online=True, n_epochs=1, device_cache="on"))
    t3.train()
    assert t3._dev_cache.get("train") is not None


def test_online_cache_rebuilds_when_file_changes(tmp_path):
    """ADVICE r04: the cached online replay is a snapshot; a file rewritten
    between epochs must be re-read (the streamed rewind re-reads every
    epoch, reference pc_task.cpp:15-20) — lockstep loss/state equality with
    a streamed twin across the rewrite, and the cache entry is rebuilt."""
    path = str(tmp_path / "t.ffm")
    write_fixture(path, "libffm", seed=0)
    kw = dict(online=True, n_epochs=2, device_cache="on")
    t_on = Trainer(_cfg(path, **kw))
    t_off = Trainer(_cfg(path, online=True, n_epochs=2, device_cache="off"))
    rng_on, rng_off = np.random.default_rng(0), np.random.default_rng(0)
    l_on1 = t_on.train_epoch(rng_on)
    l_off1 = t_off.train_epoch(rng_off)
    first = t_on._dev_cache["train"]
    write_fixture(path, "libffm", seed=5)  # new content, same path
    l_on2 = t_on.train_epoch(rng_on)
    l_off2 = t_off.train_epoch(rng_off)
    assert t_on._dev_cache["train"] is not first  # rebuilt, not replayed
    np.testing.assert_allclose(
        [l_on1, l_on2], [l_off1, l_off2], rtol=1e-6
    )
    _state_equal(t_on.state, t_off.state)


def test_online_eval_cache_rebuilds_when_file_changes(tmp_path):
    """Online eval re-reads its file every epoch too (the reference's
    Evaluator rewinds, ftrl_online.cpp:60-67): a rewritten eval file must
    be re-read by the cached eval, matching a streamed twin's metrics."""
    train = write_fixture(tmp_path / "t.ffm", "libffm", seed=0)
    evalp = str(tmp_path / "e.ffm")
    write_fixture(evalp, "libffm", seed=1)
    t_on = Trainer(_cfg(train, evalp, online=True, device_cache="on"))
    t_off = Trainer(_cfg(train, evalp, online=True, device_cache="off"))
    rng_on, rng_off = np.random.default_rng(0), np.random.default_rng(0)
    t_on.train_epoch(rng_on)
    t_off.train_epoch(rng_off)
    m_on1, m_off1 = t_on.evaluate(), t_off.evaluate()
    write_fixture(evalp, "libffm", seed=9)
    m_on2, m_off2 = t_on.evaluate(), t_off.evaluate()
    np.testing.assert_allclose(m_on1, m_off1, rtol=1e-6)
    np.testing.assert_allclose(m_on2, m_off2, rtol=1e-6)
    assert abs(m_on1[0] - m_on2[0]) > 0  # the new file actually differs


# ---- compact in-HBM cache storage (Config.device_cache_compact) ----


@pytest.mark.parametrize("online", [False, True])
def test_compact_cache_matches_raw(tmp_path, online):
    """device_cache_compact=on stores the cached dataset in the tier
    encodings (split ids, DEC6 vals, packed fields) and decodes after the
    per-step gather — every loss and weight must equal the raw cache's."""
    rng = np.random.default_rng(21)
    path = str(tmp_path / "t.ffm")
    with open(path, "w") as f:
        for i in range(64):
            cs = rng.permutation(FIXTURE_FIELDS)  # non-iota field order
            toks = [str(int(rng.random() > 0.5))] + [
                f"{c}:{int(rng.integers(0, FIXTURE_FEATS))}"
                f":{int(rng.integers(1, 10**6)) / 10**6:.6f}"
                for c in cs
            ]
            f.write(" ".join(toks) + "\n")
    kw = dict(online=online, n_epochs=2, device_cache="on")
    t_raw = Trainer(_cfg(path, path, **kw, device_cache_compact="off"))
    h_raw = t_raw.train()
    t_c = Trainer(_cfg(path, path, **kw, device_cache_compact="on"))
    cache = t_c._ensure_device_cache("train")
    assert cache is not None and cache.compact
    # the resident arrays really are the compact encodings
    assert cache.ds[1].dtype == np.uint8  # feats lo-bytes + hi planes
    assert cache.ds[2].dtype == np.uint8  # DEC6 vals
    assert cache.ds[0].dtype == np.uint8  # packed fields
    h_c = t_c.train()
    np.testing.assert_allclose(
        h_raw["train_loss"], h_c["train_loss"], rtol=1e-6
    )
    np.testing.assert_allclose(
        h_raw["eval_loss"], h_c["eval_loss"], rtol=1e-6
    )
    _state_equal(t_raw.state, t_c.state)


def test_compact_cache_row_bytes_and_auto_gate(tmp_path):
    """The compact-row estimate is conservative (>= what the build stores
    per row) and auto never engages when raw fits (CPU always fits)."""
    train = write_fixture(tmp_path / "t.ffm", "libffm", seed=0)
    tr = Trainer(_cfg(str(train), device_cache="on"))
    est = tr._compact_cache_row_bytes()
    raw = 12 * tr.cfg.max_nnz + 4
    assert est < raw  # compaction must actually save bytes
    cache = tr._ensure_device_cache("train")
    assert cache is not None and not cache.compact  # auto: raw fits
    rows = cache.ds[1].shape[0]
    stored = sum(
        a.nbytes // max(rows, 1) for a in cache.ds if a.shape[0]
    )
    assert stored <= raw


def test_compact_cache_huge_ids_keep_wide_feats(tmp_path):
    """n_feats >= 2^24: feats stay int32 in the compact cache (only
    vals/fields compact), and training still matches."""
    rng = np.random.default_rng(23)
    path = str(tmp_path / "t.ffm")
    with open(path, "w") as f:
        for i in range(48):
            toks = [str(int(rng.random() > 0.5))] + [
                f"{c}:{int(rng.integers(0, 17_000_000))}:1"
                for c in range(4)
            ]
            f.write(" ".join(toks) + "\n")
    kw = dict(
        n_feats=17_000_000, n_fields=4, batch_size=16, n_epochs=1,
        online=False, device_cache="on",
    )
    t_raw = Trainer(_cfg(path, **kw, device_cache_compact="off"))
    h_raw = t_raw.train()
    t_c = Trainer(_cfg(path, **kw, device_cache_compact="on"))
    cache = t_c._ensure_device_cache("train")
    assert cache.compact and cache.ds[1].dtype == np.int32
    h_c = t_c.train()
    np.testing.assert_allclose(
        h_raw["train_loss"], h_c["train_loss"], rtol=1e-6
    )
