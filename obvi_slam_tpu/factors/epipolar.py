"""Pairwise 2-D feature (epipolar) factor — the reference's legacy factor
type 1 (``pairwise_2d_feature_cost_functor.h``):

    residual = x1^T E x2 / (sigma * sqrt(x1^T E^T E x1)),  1-dim

with E the essential matrix between the camera at two robot poses and
x_i = K_i^-1 [px, py, 1] the normalized image coordinates.

Parity note: the reference declares this factor but its residual creator
REJECTS it for the reprojection-feature pose graph
(residual_creator.h:383-385 "Pairwise error factor type not supported"), so —
exactly like the reference — it is available standalone (e.g. for
pose-pair-only problems and tests) and is not wired into the main BA tables.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from obvi_slam_tpu import geometry as geo


class EpipolarFactors(NamedTuple):
    pose1_idx: jnp.ndarray  # (E,) int32
    pose2_idx: jnp.ndarray  # (E,) int32
    x1: jnp.ndarray  # (E, 3) normalized image coords in camera 1
    x2: jnp.ndarray  # (E, 3) normalized image coords in camera 2
    cam1_r: jnp.ndarray  # (E, 3, 3) extrinsics (camera in robot frame)
    cam1_t: jnp.ndarray  # (E, 3)
    cam2_r: jnp.ndarray  # (E, 3, 3)
    cam2_t: jnp.ndarray  # (E, 3)
    inv_sigma: jnp.ndarray  # (E,)
    mask: jnp.ndarray  # (E,)

    @property
    def capacity(self):
        return self.pose1_idx.shape[0]


def make_epipolar_factors(
    pose1_idx, pose2_idx, pixel1, pixel2, k1, k2, cam1_r, cam1_t, cam2_r, cam2_t,
    sigma, capacity=None, dtype=np.float64,
):
    """pixels -> normalized image coords via K^-1 [px py 1]."""
    n = len(pose1_idx)
    capacity = capacity or max(n, 1)

    def norm_coords(pixels, ks):
        out = np.zeros((n, 3))
        for i in range(n):
            out[i] = np.linalg.inv(ks[i]) @ np.array(
                [pixels[i][0], pixels[i][1], 1.0]
            )
        return out

    def pad(a, shape):
        out = np.zeros((capacity,) + shape, dtype=dtype)
        if n:
            out[:n] = np.reshape(a, (n,) + shape)
        return jnp.asarray(out)

    def padi(a):
        out = np.zeros(capacity, dtype=np.int32)
        out[:n] = a
        return jnp.asarray(out)

    mask = np.zeros(capacity, dtype=bool)
    mask[:n] = True
    return EpipolarFactors(
        pose1_idx=padi(pose1_idx),
        pose2_idx=padi(pose2_idx),
        x1=pad(norm_coords(pixel1, k1), (3,)),
        x2=pad(norm_coords(pixel2, k2), (3,)),
        cam1_r=pad(cam1_r, (3, 3)),
        cam1_t=pad(cam1_t, (3,)),
        cam2_r=pad(cam2_r, (3, 3)),
        cam2_t=pad(cam2_t, (3,)),
        inv_sigma=pad(np.full(n, 1.0 / sigma), ()),
        mask=jnp.asarray(mask),
    )


def _epipolar_single(pose1, pose2, x1, x2, c1r, c1t, c2r, c2t, inv_sigma):
    e = geo.essential_matrix(pose1, pose2, c1r, c1t, c2r, c2t)
    err = x1 @ (e @ x2)
    scale = x1 @ (e.T @ (e @ x1))
    return err * inv_sigma / jnp.sqrt(jnp.maximum(scale, 1e-30))


def epipolar_residuals(state, f: EpipolarFactors):
    single = jax.vmap(_epipolar_single)
    r = single(
        state.poses[f.pose1_idx],
        state.poses[f.pose2_idx],
        f.x1,
        f.x2,
        f.cam1_r,
        f.cam1_t,
        f.cam2_r,
        f.cam2_t,
        f.inv_sigma,
    )
    return jnp.where(f.mask, r, 0.0)


def epipolar_residuals_and_jac(state, f: EpipolarFactors):
    def with_aux(p1, p2, x1, x2, c1r, c1t, c2r, c2t, inv_s):
        r = _epipolar_single(p1, p2, x1, x2, c1r, c1t, c2r, c2t, inv_s)
        return r, r

    jac = jax.vmap(jax.jacfwd(with_aux, argnums=(0, 1), has_aux=True))
    (j1, j2), r = jac(
        state.poses[f.pose1_idx],
        state.poses[f.pose2_idx],
        f.x1,
        f.x2,
        f.cam1_r,
        f.cam1_t,
        f.cam2_r,
        f.cam2_t,
        f.inv_sigma,
    )
    m = f.mask
    return (
        jnp.where(m, r, 0.0),
        jnp.where(m[:, None], j1, 0.0),
        jnp.where(m[:, None], j2, 0.0),
    )
