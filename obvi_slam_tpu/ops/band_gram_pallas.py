"""Pallas TPU kernel: fused banded z-build + split-bf16 group gram.

The banded Schur point gram (solver/schur.py `_slot_gram`, band branch)
spends most of its time outside the MXU: the one-hot z build is a batched
tiny matmul (XLA: ~0.7 ms), and the split gram re-reads z from HBM and
materializes three bf16 operands (~0.9 ms). This kernel fuses the whole
producer chain per (group, K-chunk):

  1. build the z chunk in VMEM with VPU mask-accumulates over the C slots
     (z[(l,b), (c, p_local)] = Σ_s (local_pose[l,s] == p) * w[l,s,c,b] —
     each output element sums at most one nonzero product, so the build is
     exact),
  2. stream the chunk to the z output in HBM (the reduced-RHS and
     back-substitution consumers need it),
  3. split the chunk into exact bf16 parts in VMEM and accumulate the
     6-pass (HIGHEST-grade) group gram on the MXU.

z never round-trips through HBM between build and gram, the one-hot is
never materialized, and the bf16 parts live only in VMEM. Output layouts
match the XLA band path exactly: z (G, 3Lg, 768) rows (landmark, block
column), columns (component, local pose); s (G, 768, 768) c-major.

Dead slots are encoded as local_pose == 128 (out of the window) by the
caller — no separate mask input.

CPU tests run interpret=True; hardware equality is asserted on-device by
the bench workflow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from obvi_slam_tpu.ops.reproj_pallas import pallas_supported  # noqa: F401
from obvi_slam_tpu.ops.syrk_pallas import _split_parts

try:  # pragma: no cover - absent on pure-CPU installs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_WIDTH = 128  # local pose window (2 * schur._BAND_TP)
_WBAND = 6 * _WIDTH


def _kernel(w_ref, lp_ref, z_ref, s_ref, acc_ref, *, c_slots, parts):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    kc = w_ref.shape[1]
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (kc, _WIDTH), 1)
    # One slot's one-hot live at a time; 6 accumulating column blocks.
    cols = [jnp.zeros((kc, _WIDTH), jnp.float32) for _ in range(6)]
    for s in range(c_slots):
        oh = (lp_ref[0, :, s][:, None] == iota_p).astype(jnp.float32)
        for c in range(6):
            cols[c] = cols[c] + w_ref[0, :, s * 6 + c][:, None] * oh
    z = jnp.concatenate(cols, axis=1)  # (kc, 768) columns (c, p_local)
    z_ref[0] = z

    dn = (((0,), (0,)), ((), ()))

    def dot(a, b):
        # precision MUST be pinned to DEFAULT: the solver jits under an
        # ambient HIGHEST matmul-precision context, and Mosaic rejects
        # bf16 operands with an fp32 contract precision ("Bad lhs type").
        # The bf16 split already IS the HIGHEST emulation.
        return jax.lax.dot_general(
            a, b, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    # Accumulate ONE pass product at a time: each (768, 768) f32 dot result
    # is 2.25 MB of kernel stack; summing six before the += made Mosaic
    # keep them all live and blew the 16 MB VMEM budget at tile_k=512.
    if parts == 3:
        h, m, l = _split_parts(z, 3)
        for a, b in ((h, h), (m, m), (h, m), (m, h), (h, l), (l, h)):
            acc_ref[:] += dot(a, b)
    elif parts == 2:
        h, l = _split_parts(z, 2)
        for a, b in ((h, h), (h, l), (l, h)):
            acc_ref[:] += dot(a, b)
    else:
        zb = z.astype(jnp.bfloat16)
        acc_ref[:] += dot(zb, zb)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        s_ref[0] = acc_ref[:]


@functools.partial(
    jax.jit, static_argnames=("parts", "tile_k", "interpret")
)
def band_zbuild_gram(
    w_rows, local_pose, parts: int = 3, tile_k: int = 512,
    interpret: bool = False,
):
    """Fused banded z build + group gram.

    w_rows:     (G, K, C*6) f32 — per (landmark, block-column) row, the C
                slots' 6-component blocks (w_comp[l, s, :, b] flattened).
    local_pose: (G, K, C) int32 — slot local pose in [0, 128); dead = 128.
    Returns (z (G, K, 768) f32, s (G, 768, 768) f32) with s the split-bf16
    group gram zᵀz per group (c-major block order).
    """
    n_group, k_rows, c6 = w_rows.shape
    c_slots = c6 // 6
    assert k_rows % tile_k == 0, (k_rows, tile_k)

    grid = (n_group, k_rows // tile_k)
    z_shape = jax.ShapeDtypeStruct((n_group, k_rows, _WBAND), jnp.float32)
    s_shape = jax.ShapeDtypeStruct((n_group, _WBAND, _WBAND), jnp.float32)
    return pl.pallas_call(
        functools.partial(_kernel, c_slots=c_slots, parts=parts),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_k, c6), lambda g, k: (g, k, 0)),
            pl.BlockSpec((1, tile_k, c_slots), lambda g, k: (g, k, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_k, _WBAND), lambda g, k: (g, k, 0)),
            pl.BlockSpec((1, _WBAND, _WBAND), lambda g, k: (g, 0, 0)),
        ],
        out_shape=[z_shape, s_shape],
        scratch_shapes=[pltpu.VMEM((_WBAND, _WBAND), jnp.float32)],
        interpret=interpret,
    )(w_rows, local_pose)
