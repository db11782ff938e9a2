#!/usr/bin/env python
"""csv -> libsvm / libffm converter with negative sampling.

Capability parity with the reference's offline data-prep script
(reference: python/generate_data.py:160-333), re-written for this framework:

  * single csv split into train/eval (--data_path + --train_frac) or separate
    files (--train_path/--eval_path)                      (ref :160-173)
  * label binarization y > threshold -> 1, or all-1 labels for implicit data
    under negative sampling                               (ref :175-185)
  * MinMax normalization of numeric columns, fit on train (ref :188-197)
  * categorical vocab built on train with running offset; index 0 reserved
    for OOV; eval unknowns -> 0                           (ref :200-203, :273)
  * negative sampling: per positive, num_neg negatives with each categorical
    field resampled uniformly from its train vocabulary and each numeric
    field from its train [min, max] range; negative label 0 (ref :206-228)
  * output "label feat:val ..." (libsvm) or "label field:feat:val ..."
    (libffm); numeric values rounded to 4 decimals; train shuffled
                                                          (ref :231-259, :322)

Usage example (MovieLens-style implicit data):
    python tools/generate_data.py --data_path ratings.csv \
        --train_output_path train.ffm --eval_output_path eval.ffm \
        --cat_cols 0,1 --num_cols 2 --neg_sampling true --num_neg 2 --ffm true
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np
import pandas as pd


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if str(v).lower() in ("true", "1", "yes"):
        return True
    if str(v).lower() in ("false", "0", "no"):
        return False
    raise argparse.ArgumentTypeError(f"expected true/false, got {v!r}")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="generate libsvm or libffm data")
    p.add_argument("--data_path", default="", help="single csv, split by train_frac")
    p.add_argument("--train_path", default="")
    p.add_argument("--eval_path", default="")
    p.add_argument("--train_output_path", required=True)
    p.add_argument("--eval_output_path", required=True)
    p.add_argument("--train_frac", type=float, default=0.8)
    p.add_argument("--threshold", type=int, default=0,
                   help="label > threshold -> 1 else 0")
    p.add_argument("--neg_sampling", type=str2bool, default=False)
    p.add_argument("--num_neg", type=int, default=1)
    p.add_argument("--sep", default=",")
    p.add_argument("--label_col", type=int, default=0)
    p.add_argument("--cat_cols", default="", help="e.g. 1,2,3")
    p.add_argument("--num_cols", default="", help="e.g. 4,5")
    p.add_argument("--normalize", type=str2bool, default=False)
    p.add_argument("--ffm", type=str2bool, default=False,
                   help="true: libffm output, false: libsvm")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def _cols(spec: str) -> list[int]:
    return [int(c) for c in spec.split(",") if c.strip() != ""]


def load_split(args):
    if args.data_path:
        data = pd.read_csv(args.data_path, sep=args.sep)
        rng = np.random.default_rng(args.seed)
        perm = rng.permutation(len(data))
        cut = int(len(data) * args.train_frac)
        train = data.iloc[perm[:cut]].reset_index(drop=True)
        evald = data.iloc[perm[cut:]].reset_index(drop=True)
    elif args.train_path and args.eval_path:
        train = pd.read_csv(args.train_path, sep=args.sep)
        evald = pd.read_csv(args.eval_path, sep=args.sep)
    else:
        raise SystemExit("Must provide --data_path or --train_path + --eval_path")
    return train, evald


def transform(args):
    rng = np.random.default_rng(args.seed)
    cat_cols, num_cols = _cols(args.cat_cols), _cols(args.num_cols)
    train, evald = load_split(args)

    def labels_of(df):
        y = df.iloc[:, args.label_col].to_numpy()
        if args.neg_sampling:
            return np.ones(len(df), dtype=np.int64)  # implicit data: all 1
        return (y > args.threshold).astype(np.int64)

    out = {}
    for split, df in (("train", train), ("eval", evald)):
        n = len(df)
        n_neg = n * args.num_neg if args.neg_sampling and args.num_neg > 0 else 0
        y = np.concatenate([labels_of(df), np.zeros(n_neg, dtype=np.int64)])
        out[split] = {"y": y, "tokens": []}

    offset = 1  # 0 reserved for OOV
    # fields are numbered by position in cat_cols + num_cols, like the
    # reference's enumerate(total_cols)
    for field, col in enumerate(cat_cols + num_cols):
        if col in cat_cols:
            train_vals = train.iloc[:, col].to_numpy()
            vocab_vals, train_idx = np.unique(train_vals, return_inverse=True)
            train_idx = train_idx + offset
            lookup = pd.Series(
                np.arange(len(vocab_vals)) + offset, index=vocab_vals
            )
            eval_idx = (
                lookup.reindex(evald.iloc[:, col].to_numpy())
                .fillna(0)
                .to_numpy()
                .astype(np.int64)
            )
            for split, idx in (("train", train_idx), ("eval", eval_idx)):
                n_neg = len(idx) * args.num_neg if args.neg_sampling and args.num_neg > 0 else 0
                if n_neg:
                    neg = rng.integers(0, len(vocab_vals), size=n_neg) + offset
                    idx = np.concatenate([idx, neg])
                tok = np.char.add(idx.astype(str), ":1")
                if args.ffm:
                    tok = np.char.add(f"{field}:", tok)
                out[split]["tokens"].append(tok)
            offset += len(vocab_vals)
        else:
            tv = train.iloc[:, col].to_numpy().astype(np.float64)
            ev = evald.iloc[:, col].to_numpy().astype(np.float64)
            if args.normalize:
                lo, hi = tv.min(), tv.max()
                scale = (hi - lo) or 1.0
                tv = (tv - lo) / scale
                ev = (ev - lo) / scale  # train-fit transform, like the ref
            # negatives always drawn from the TRAIN range (train-fit
            # semantics, like the normalize transform above and the
            # reference's data prep)
            t_lo, t_hi = tv.min(), tv.max()
            for split, v in (("train", tv), ("eval", ev)):
                n_neg = len(v) * args.num_neg if args.neg_sampling and args.num_neg > 0 else 0
                if n_neg:
                    neg = rng.random(n_neg) * (t_hi - t_lo) + t_lo
                    v = np.concatenate([v, neg])
                tok = np.char.add(f"{offset}:", np.round(v, 4).astype(str))
                if args.ffm:
                    tok = np.char.add(f"{field}:", tok)
                out[split]["tokens"].append(tok)
            offset += 1

    lines = {}
    for split in ("train", "eval"):
        y = out[split]["y"]
        cols = [y.astype(str)] + out[split]["tokens"]
        stacked = np.stack(cols, axis=1)
        lines[split] = np.array([" ".join(row) for row in stacked])
    # shuffle train output (positives + negatives interleaved), like the ref
    lines["train"] = lines["train"][rng.permutation(len(lines["train"]))]
    return lines["train"], lines["eval"]


def main(argv=None) -> int:
    args = parse_args(argv)
    t0 = time.perf_counter()
    train_lines, eval_lines = transform(args)
    with open(args.train_output_path, "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(args.eval_output_path, "w") as f:
        f.write("\n".join(eval_lines) + "\n")
    print(f"Output train size: {len(train_lines)}")
    print(f"Output eval size: {len(eval_lines)}")
    print(f"Total running time: {time.perf_counter() - t0:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
