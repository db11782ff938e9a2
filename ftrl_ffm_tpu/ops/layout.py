"""FFM factor-table layout helpers.

The reference stores each feature's factor row field-major: slot
(field c, factor k) = c * n_factors + k (reference: src/model/ffm.cpp:63-65).
This framework stores rows **factor-major** internally: slot (k, c) =
k * n_fields + c.  Reason: the Pallas interaction kernel processes one factor
k at a time, and in k-major layout the per-k slice is a contiguous lane range
[k*C, (k+1)*C) — Mosaic supports contiguous lane slices but not the
minor-dim-splitting reshape the field-major layout would require.

Row width and all per-coordinate FTRL math are layout-agnostic; only
import/export and comparisons against reference-layout weights convert.
"""

from __future__ import annotations

import numpy as np  # noqa: F401  (dtype interop for callers)


def kmajor_to_reference(x, n_fields: int, n_factors: int):
    """[R, K*C] factor-major -> [R, C*K] reference field-major."""
    r = x.shape[0]
    return (
        x.reshape(r, n_factors, n_fields)
        .transpose(0, 2, 1)
        .reshape(r, n_fields * n_factors)
    )


def reference_to_kmajor(x, n_fields: int, n_factors: int):
    """[R, C*K] reference field-major -> [R, K*C] factor-major."""
    r = x.shape[0]
    return (
        x.reshape(r, n_fields, n_factors)
        .transpose(0, 2, 1)
        .reshape(r, n_fields * n_factors)
    )
