"""Determinism and cross-validation tests.

The reference's hogwild training is nondeterministic (thread interleaving +
per-run RNG, src/include/utils/utils.h:30-36).  This framework's batched
functional updates must be bit-identical run to run."""

import numpy as np

from ftrl_ffm_tpu.config import Config
from ftrl_ffm_tpu.metrics import StreamingAUC, exact_auc
from ftrl_ffm_tpu.train import Trainer


def _write(tmp_path, n=96, seed=0):
    rng = np.random.default_rng(seed)
    p = str(tmp_path / "d.ffm")
    with open(p, "w") as f:
        for _ in range(n):
            toks = [str(int(rng.random() > 0.5))] + [
                f"{c}:{int(rng.integers(0, 50))}:1" for c in range(4)
            ]
            f.write(" ".join(toks) + "\n")
    return p


def test_training_is_bit_deterministic(tmp_path):
    path = _write(tmp_path)
    kw = dict(train_data=path, model_type="FFM", n_fields=4, n_feats=50,
              n_factors=3, batch_size=16, n_epochs=2)
    t1 = Trainer(Config(**kw))
    t1.train()
    t2 = Trainer(Config(**kw))
    t2.train()
    for a, b in zip(t1.state, t2.state):
        if a is not None:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_offline_shuffle_changes_order_but_same_seed_reproduces(tmp_path):
    path = _write(tmp_path)
    kw = dict(train_data=path, model_type="LR", n_feats=50, n_fields=4,
              batch_size=16, n_epochs=2, online=False, shuffle=True, seed=7)
    s1 = Trainer(Config(**kw))
    s1.train()
    s2 = Trainer(Config(**kw))
    s2.train()
    np.testing.assert_array_equal(np.asarray(s1.state.lin_z), np.asarray(s2.state.lin_z))


def test_streaming_auc_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(3)
    n = 5000
    labels = (rng.random(n) > 0.6).astype(np.float32)
    # informative but noisy scores
    logits = (labels * 1.5 - 0.75 + rng.normal(0, 1.2, n)).astype(np.float32)
    scores = 1.0 / (1.0 + np.exp(-logits))

    auc = StreamingAUC(8192)
    import jax.numpy as jnp

    pos, neg = StreamingAUC.bucket_counts(
        jnp.asarray(logits), jnp.asarray(labels), jnp.ones(n), 8192
    )
    auc.update(pos, neg)
    sk = roc_auc_score(labels, scores)
    assert abs(auc.result() - sk) < 2e-3  # histogram discretization error
    assert abs(exact_auc(scores, labels) - sk) < 1e-9


def test_native_parser_fuzz_against_numpy():
    """Randomized round-trip: native C++ parser == numpy on arbitrary
    well-formed libffm/libsvm content (values incl. negatives, exponents,
    out-of-range ids, truncation)."""
    from ftrl_ffm_tpu.data.parser import parse_text_native, parse_text_numpy

    rng = np.random.default_rng(11)
    for trial in range(10):
        ft = "libffm" if trial % 2 == 0 else "libsvm"
        n_feats, n_fields, max_nnz = 500, 6, 5
        lines = []
        for _ in range(50):
            nnz = int(rng.integers(1, 9))
            toks = [str(int(rng.integers(-2, 3)))]
            for _ in range(nnz):
                fld = int(rng.integers(0, 8))        # sometimes out of range
                feat = int(rng.integers(0, 600))     # sometimes out of range
                val = float(np.round(rng.normal() * 10.0 ** int(rng.integers(-3, 3)), 5))
                if rng.random() < 0.1:
                    val = 0.0                        # dropped-value case
                if ft == "libffm":
                    toks.append(f"{fld}:{feat}:{val}")
                else:
                    toks.append(f"{feat}:{val}")
            lines.append(" ".join(toks))
        text = "\n".join(lines) + "\n"
        nat = parse_text_native(text, ft, max_nnz, n_feats, n_fields)
        ref = parse_text_numpy(text, ft, max_nnz, n_feats, n_fields)
        assert nat is not None
        np.testing.assert_array_equal(nat.y, ref.y, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(nat.fields, ref.fields)
        np.testing.assert_array_equal(nat.feats, ref.feats)
        np.testing.assert_allclose(nat.vals, ref.vals, rtol=1e-5, atol=1e-7)
        np.testing.assert_array_equal(nat.nnz, ref.nnz)


def test_native_parser_mt_matches_single_thread():
    """The in-library threaded parse (ftrl_parse_chunk_mt) must be
    byte-identical to the single-thread parse on arbitrary content,
    including blank lines at range boundaries and a chunk big enough to
    clear the mt path's small-input early-out (64 KiB)."""
    from ftrl_ffm_tpu.data.parser import parse_text_native

    rng = np.random.default_rng(12)
    lines = []
    for i in range(4000):
        if rng.random() < 0.02:
            lines.append("   ")  # blank (whitespace-only) line, skipped
            continue
        nnz = int(rng.integers(1, 7))
        toks = [str(int(rng.integers(0, 2)))]
        for _ in range(nnz):
            toks.append(
                f"{int(rng.integers(0, 8))}:{int(rng.integers(0, 900))}:"
                f"{float(np.round(rng.random(), 4))}"
            )
        lines.append(" ".join(toks))
    text = ("\n".join(lines) + "\n").encode()
    assert len(text) > (1 << 16)
    single = parse_text_native(text, "libffm", 5, 800, 8, n_threads=1)
    for nt in (2, 3, 8):
        mt = parse_text_native(text, "libffm", 5, 800, 8, n_threads=nt)
        for a, b in zip(single, mt):
            np.testing.assert_array_equal(a, b, err_msg=f"n_threads={nt}")
