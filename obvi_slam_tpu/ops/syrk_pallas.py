"""Pallas TPU kernel: triangular symmetric-rank-k (syrk) gram with fused
bf16-split f32 emulation.

The Schur-subtraction gram S = Cᵀ C (contraction over the leading landmark
dim) is the solver's dominant MXU cost. The XLA path
(`solver/schur.py::_sym_gram_split`) already halves the mixed bf16 passes by
mirroring, but it still:
  - materializes the three bf16 split operands in HBM and re-reads them
    across four separate dot_generals, and
  - computes the full symmetric output (every (i, j) tile twice).

This kernel fuses the split into the matmul pipeline (operand tiles are
split to bf16 in VMEM right after DMA) and walks only the lower-triangle
tile grid, recovering the 2x symmetry saving Ceres gets from SuiteSparse's
syrk without giving up f32-exact operands:

  HIGHEST-grade (parts=3, z = h + m + l):
    off-diagonal tile: hh + mm + (hm + mh) + (hl + lh)      6 MXU passes
    diagonal tile:     hh + mm + (hm + hmᵀ) + (hl + hlᵀ)    4 MXU passes
  HIGH-grade (parts=2, z = h + l):
    off-diagonal tile: hh + (hl + lh)                        3 passes
    diagonal tile:     hh + (hl + hlᵀ)                       2 passes

(dot(m, h) == dot(h, m)ᵀ exactly — same products, so the mirror is free.)

Only the lower triangle (incl. diagonal) of the output is valid; callers
mirror with `mirror_lower` (cheap elementwise epilogue) when a full matrix
is needed. The contraction runs over the LEADING dim of C — i.e. C is
(K, M) and S = CᵀC — which matches how the slot z tensors are produced
(landmark-major) and lets the MXU consume operands without any relayout.

CPU tests run with interpret=True; hardware correctness is asserted by the
bench workflow's on-device check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from obvi_slam_tpu.ops.reproj_pallas import pallas_supported  # noqa: F401

try:  # pragma: no cover - absent on pure-CPU installs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _trunc_bf16_f32(x):
    """f32 -> f32 with the mantissa truncated to bf16's 7 bits (top 16 bits
    of the f32 word). Mosaic has no reduce_precision lowering; the bitwise
    truncation is an equally EXACT split (the kept part is a mantissa
    prefix, so the residual subtraction is exact) — it just rounds toward
    zero instead of to-nearest, which only redistributes low-order bits
    between the parts, never changes their sum."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(
        u & jnp.uint32(0xFFFF0000), jnp.float32
    )


def _split_parts(x, parts):
    """Exact bf16 decomposition x == sum(parts) (see schur._split_bf16)."""
    out = []
    r = x
    for _ in range(parts - 1):
        h = _trunc_bf16_f32(r)
        out.append(h.astype(jnp.bfloat16))
        r = r - h
    out.append(r.astype(jnp.bfloat16))
    return out


def _dotT(a, b):
    """aᵀ b with contraction over the leading (sublane) dim — MXU-native.
    precision pinned to DEFAULT: bf16 operands under an ambient HIGHEST
    context make Mosaic reject the matmul ("Bad lhs type")."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _kernel(i_ref, j_ref, a_ref, b_ref, o_ref, acc_ref, *, parts):
    t = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a = a_ref[:]
    b = b_ref[:]
    is_diag = i_ref[t] == j_ref[t]

    if parts == 3:
        ah, am, al = _split_parts(a, 3)

        def diag_case(_):
            hm = _dotT(ah, am)
            hl = _dotT(ah, al)
            return (
                _dotT(ah, ah)
                + _dotT(am, am)
                + (hm + hm.T)
                + (hl + hl.T)
            )

        def off_case(_):
            bh, bm, bl = _split_parts(b, 3)
            return (
                _dotT(ah, bh)
                + _dotT(am, bm)
                + _dotT(ah, bm)
                + _dotT(am, bh)
                + _dotT(ah, bl)
                + _dotT(al, bh)
            )

    elif parts == 2:
        ah, al = _split_parts(a, 2)

        def diag_case(_):
            hl = _dotT(ah, al)
            return _dotT(ah, ah) + (hl + hl.T)

        def off_case(_):
            bh, bl = _split_parts(b, 2)
            return _dotT(ah, bh) + _dotT(ah, bl) + _dotT(al, bh)

    else:  # single bf16 pass (DEFAULT-grade)

        def diag_case(_):
            ab = a.astype(jnp.bfloat16)
            return _dotT(ab, ab)

        def off_case(_):
            return _dotT(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))

    acc_ref[:] += jax.lax.cond(is_diag, diag_case, off_case, None)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _lower_tiles(mt: int):
    idx = [(i, j) for i in range(mt) for j in range(i + 1)]
    i_of_t = np.array([i for i, _ in idx], np.int32)
    j_of_t = np.array([j for _, j in idx], np.int32)
    return i_of_t, j_of_t


@functools.partial(
    jax.jit, static_argnames=("parts", "tile_m", "tile_k", "interpret")
)
def syrk_lower_split(
    c, parts: int = 3, tile_m: int = 384, tile_k: int = 512,
    interpret: bool = False,
):
    """S = cᵀ c for c (K, M) f32 via split-bf16 passes; lower triangle
    (incl. diagonal) valid, strictly-upper entries GARBAGE. K and M must be
    multiples of tile_k / tile_m (pad with zero rows/cols otherwise — zero
    rows are gram no-ops)."""
    k_dim, m_dim = c.shape
    assert k_dim % tile_k == 0 and m_dim % tile_m == 0, (k_dim, m_dim)
    mt = m_dim // tile_m
    i_of_t, j_of_t = _lower_tiles(mt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(i_of_t), k_dim // tile_k),
        in_specs=[
            pl.BlockSpec(
                (tile_k, tile_m),
                lambda t, k, i_ref, j_ref: (k, i_ref[t]),
            ),
            pl.BlockSpec(
                (tile_k, tile_m),
                lambda t, k, i_ref, j_ref: (k, j_ref[t]),
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_m),
            lambda t, k, i_ref, j_ref: (i_ref[t], j_ref[t]),
        ),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_m), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_kernel, parts=parts),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_dim, m_dim), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(i_of_t), jnp.asarray(j_of_t), c, c)


def mirror_lower(s):
    """Full symmetric matrix from a lower-triangle-valid square matrix."""
    lo = jnp.tril(s)
    return lo + jnp.tril(s, -1).T


def syrk_tile_m(m_dim: int):
    """Largest supported tile evenly dividing m_dim (None -> unsupported)."""
    for tm in (384, 256, 128):
        if m_dim % tm == 0:
            return tm
    return None
