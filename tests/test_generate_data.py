"""csv -> libsvm/libffm converter tests (parity with reference
python/generate_data.py semantics)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from generate_data import main as gen_main  # noqa: E402

from ftrl_ffm_tpu.data.parser import parse_text  # noqa: E402


@pytest.fixture
def csv_file(tmp_path):
    p = tmp_path / "data.csv"
    rows = ["label,user,item,score"]
    rng = np.random.default_rng(0)
    for i in range(50):
        rows.append(
            f"{rng.integers(0, 5)},u{rng.integers(0, 8)},i{rng.integers(0, 10)},"
            f"{rng.random() * 10:.3f}"
        )
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_ffm_output_roundtrips_through_parser(csv_file, tmp_path):
    tr, ev = str(tmp_path / "tr.ffm"), str(tmp_path / "ev.ffm")
    gen_main([
        "--data_path", csv_file,
        "--train_output_path", tr, "--eval_output_path", ev,
        "--cat_cols", "1,2", "--num_cols", "3",
        "--normalize", "true", "--ffm", "true", "--threshold", "2",
    ])
    text = open(tr).read()
    assert text.strip()
    chunk = parse_text(text, "libffm", max_nnz=3, n_feats=10_000, n_fields=3)
    assert chunk.y.min() >= 0 and chunk.y.max() <= 1
    # 2 categorical + 1 numeric = 3 tokens per line, fields 0..2
    assert chunk.fields.max() == 2
    assert (chunk.nnz == 3).all()
    # normalized numeric values in [0, 1] (train-fit)
    num_vals = chunk.vals[chunk.fields == 2]
    assert num_vals.min() >= 0.0 and num_vals.max() <= 1.0 + 1e-6


def test_libsvm_output_and_vocab_offsets(csv_file, tmp_path):
    tr, ev = str(tmp_path / "tr.svm"), str(tmp_path / "ev.svm")
    gen_main([
        "--data_path", csv_file,
        "--train_output_path", tr, "--eval_output_path", ev,
        "--cat_cols", "1,2", "--num_cols", "",
        "--ffm", "false",
    ])
    first = open(tr).readline().split()
    assert first[0] in ("0", "1")
    assert all(t.count(":") == 1 for t in first[1:])
    # ids start at 1 (0 reserved for OOV)
    ids = [int(t.split(":")[0]) for ln in open(tr) for t in ln.split()[1:]]
    assert min(ids) >= 1


def test_negative_sampling_counts_and_labels(csv_file, tmp_path):
    tr, ev = str(tmp_path / "tr.ffm"), str(tmp_path / "ev.ffm")
    gen_main([
        "--data_path", csv_file,
        "--train_output_path", tr, "--eval_output_path", ev,
        "--cat_cols", "1,2", "--num_cols", "",
        "--neg_sampling", "true", "--num_neg", "2", "--ffm", "true",
    ])
    lines = open(tr).read().splitlines()
    # 40 train positives (0.8 * 50) + 2 negatives each
    assert len(lines) == 40 * 3
    labels = [ln.split()[0] for ln in lines]
    assert labels.count("1") == 40
    assert labels.count("0") == 80
