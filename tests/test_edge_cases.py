"""Edge-case behavior: malformed/degenerate inputs, truncation, ranges."""

import numpy as np
import pytest

from ftrl_ffm_tpu.config import Config, detect_file_type
from ftrl_ffm_tpu.data.parser import parse_text, parse_text_native, parse_text_numpy
from ftrl_ffm_tpu.train import Trainer


def test_single_line_file(tmp_path):
    p = tmp_path / "one.ffm"
    p.write_text("1 0:3:1 1:7:0.5\n")
    cfg = Config(train_data=str(p), model_type="FFM", n_fields=2, n_feats=10,
                 n_factors=2, batch_size=4)
    t = Trainer(cfg)
    loss = t.train_epoch()
    assert np.isfinite(loss)
    assert int(t.state.step) == 1


def test_nnz_truncation_keeps_first_max_nnz():
    text = "1 0:1:1 1:2:1 2:3:1 0:4:1\n"
    for fn in (parse_text_native, parse_text_numpy):
        c = fn(text, "libffm", 2, 100, 3)
        assert c is not None
        np.testing.assert_array_equal(c.feats[0], [1, 2])
        assert c.nnz[0] == 4  # true nnz preserved


def test_negative_label_binarized_to_zero():
    # reference binarizes y > 0 -> 1 (src/data/parser.cpp:16)
    c = parse_text("-1 0:1:1\n0 0:2:1\n2 0:3:1\n", "libffm", 2, 100, 1)
    np.testing.assert_array_equal(c.y, [0.0, 0.0, 1.0])


def test_detect_file_type_errors(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("1 a:b:c:d\n")
    with pytest.raises(ValueError):
        detect_file_type(str(p))
    p2 = tmp_path / "short.txt"
    p2.write_text("1\n")
    with pytest.raises(ValueError):
        detect_file_type(str(p2))


def test_ffm_rejects_libsvm_data():
    with pytest.raises(ValueError, match="libffm"):
        cfg = Config(model_type="FFM", file_type="libsvm")
        cfg.validate_file_type()


def test_cmd_requires_file_type():
    with pytest.raises(ValueError, match="file_type"):
        Trainer(Config(cmd=True, max_nnz=4))


def test_cmd_requires_max_nnz():
    with pytest.raises(ValueError, match="max_nnz"):
        Trainer(Config(cmd=True, file_type="libffm"))


def test_out_of_range_ids_inert_in_training(tmp_path):
    """ids >= n_feats / fields >= n_fields are disabled like remove_out_range
    (reference: src/model/ftrl_model.cpp:36-42) — training must not crash or
    write out of bounds."""
    p = tmp_path / "oob.ffm"
    p.write_text("1 0:5:1 9:3:1 0:9999:1\n0 1:2:1 0:5:1\n")
    cfg = Config(train_data=str(p), model_type="FFM", n_fields=2, n_feats=8,
                 n_factors=2, batch_size=2)
    t = Trainer(cfg)
    loss = t.train_epoch()
    assert np.isfinite(loss)
    # only ids 2 and 5 are valid -> those rows touched, nothing else
    touched = np.nonzero(np.asarray(t.state.lin_n) > 0)[0].tolist()
    assert touched == [2, 5]


def test_value_zero_features_dropped():
    c = parse_text("1 0:1:0 1:2:1\n", "libffm", 2, 100, 2)
    assert c.feats[0, 0] == 100  # disabled slot (sentinel)
    assert c.feats[0, 1] == 2


# ---------------------------------------------- review-found edge regressions
def test_numpy_parser_empty_and_blank_chunks():
    from ftrl_ffm_tpu.data.parser import parse_text_numpy

    for text in ("", "\n", "\n\n  \n"):
        chunk = parse_text_numpy(text, "libffm", 4, 100, 4)
        assert chunk.y.shape == (0,)
        assert chunk.feats.shape == (0, 4)


def test_native_parser_rejects_empty_int_tokens():
    import pytest

    from ftrl_ffm_tpu.data.parser import parse_text, parse_text_numpy
    from ftrl_ffm_tpu.native import lib

    bad = ["1 :5:0.5\n", "1 3::0.5\n"]
    for text in bad:
        with pytest.raises(ValueError):
            parse_text_numpy(text, "libffm", 4, 100, 4)
        if lib() is not None:  # native path agrees: malformed, not silent
            with pytest.raises(ValueError):
                parse_text(text.encode(), "libffm", 4, 100, 4)


def test_load_file_defaults_keep_huge_ids(tmp_path):
    from ftrl_ffm_tpu.data.loader import load_file

    p = tmp_path / "d.ffm"
    p.write_text("1 0:2000000000:1\n")  # id in [2**30, 2**31)
    ds = load_file(str(p), "libffm", 1)
    assert ds.feats[0, 0] == 2000000000  # not filtered by the defaults


def test_load_file_empty_file(tmp_path):
    from ftrl_ffm_tpu.data.loader import load_file

    p = tmp_path / "empty.ffm"
    p.write_text("")
    ds = load_file(str(p), "libffm", max_nnz=4)
    assert ds.n == 0
