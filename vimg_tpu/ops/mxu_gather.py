"""Exact per-lane small-table lookup inside Pallas kernels, on the MXU.

Mosaic has no per-lane dynamic gather (probed round 2, tools/probe_r2c)
— in-kernel table lookups have been O(n) select chains (megakernel
materials/lights, render/mega/kernel.py gather_mat), capping scenes at
~48 materials. This module provides the O(1)-in-table-size alternative:

    out[param, lane] = table[param, :] @ onehot[:, lane]

- the one-hot rhs is built by comparing a SUBLANE iota against the
  lanes' ids — natural (n, 128) layout, no transposes;
- the f32 table is split into three bf16 terms (8-bit mantissas x 3
  cover f32's 24): because the rhs is one-hot, every matmul output is a
  SINGLE bf16 x 1.0 product accumulated in f32 — exact — so
  hi + mid + lo reconstructs the f32 entry BIT-EXACTLY. Verified
  bit-exact on v5e (bench_records/r4_probe_j.json) and in interpret
  mode (tests/test_mxu_gather.py).

Intended uses: megakernel material/light tables at glTF scale
(hundreds of rows — reference converts every material to Principled,
gltf_loading.cpp:547-690), and any other in-kernel lookup whose table
fits VMEM comfortably (cost scales with table size through the matmul:
(p, n) @ (n, 128) per lane-row).

Caution: a COLD Mosaic compile of a bf16-dot kernel takes ~9 minutes on
the axon remote-compile helper (cached thereafter); batch kernel-config
changes accordingly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def split3(table):
    """f32 table -> three bf16 tables whose (exact, f32) sum is the
    original: hi = bf16(v), mid = bf16(v - hi), lo = bf16(v - hi - mid).
    24 mantissa bits total, so v - hi - mid - lo == 0 — for values whose
    residual exponents stay representable in bf16: exact for |v| = 0 or
    |v| >= 2^-109 (residuals then sit above bf16's smallest subnormal
    2^-133); f32 values nearer the subnormal floor reconstruct only
    approximately. Material/light/camera tables are far inside the exact
    range; asserted below so a misuse fails loudly."""
    t = np.asarray(table, np.float32)
    a = np.abs(t)
    assert bool(((a == 0) | (a >= 2.0 ** -109)).all()), \
        "split3: values in (0, 2^-109) lose bits in the bf16 residuals"
    hi = t.astype(jnp.bfloat16)
    r1 = t - np.asarray(hi, np.float32)
    mid = r1.astype(jnp.bfloat16)
    r2 = r1 - np.asarray(mid, np.float32)
    lo = r2.astype(jnp.bfloat16)
    return hi, mid, lo


def gather_row(t_hi, t_mid, t_lo, ids_row, n_rows):
    """In-kernel: look up ``ids_row`` (a (1, 128) int32 of table-row
    ids) in the split table refs/arrays ((p, n_rows) bf16 each).
    Returns (p, 128) f32 — column j holds table[:, ids_row[j]] exactly.

    Call once per lane-row; assemble (R, 128) per-param arrays from the
    returned rows. All shapes static; ids must be in [0, n_rows).
    """
    sub = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 0)
    oh = (sub == ids_row).astype(jnp.bfloat16)
    return (jnp.dot(t_hi[:], oh, preferred_element_type=jnp.float32)
            + jnp.dot(t_mid[:], oh, preferred_element_type=jnp.float32)
            + jnp.dot(t_lo[:], oh, preferred_element_type=jnp.float32))
