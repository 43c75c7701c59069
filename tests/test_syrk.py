"""Tests for the Pallas triangular split-syrk kernel (ops/syrk_pallas.py)
and its wiring into the Schur gram (interpret mode; hardware equality is
asserted by the bench workflow's on-device check)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from obvi_slam_tpu.ops import syrk_pallas as sp
from obvi_slam_tpu.solver import schur as sm


@pytest.fixture()
def c_mat():
    rng = np.random.default_rng(0)
    c = rng.normal(size=(1024, 768)) * rng.lognormal(0, 2, (1024, 768))
    return jnp.asarray(c.astype(np.float32))


class TestSyrkKernel:
    def _ref64(self, c):
        c64 = np.asarray(c, np.float64)
        return c64.T @ c64

    def test_highest_grade(self, c_mat):
        s = np.asarray(
            sp.mirror_lower(sp.syrk_lower_split(c_mat, parts=3, interpret=True)),
            np.float64,
        )
        e = self._ref64(c_mat)
        assert np.linalg.norm(s - e) / np.linalg.norm(e) < 2e-6

    def test_high_grade(self, c_mat):
        s = np.asarray(
            sp.mirror_lower(sp.syrk_lower_split(c_mat, parts=2, interpret=True)),
            np.float64,
        )
        e = self._ref64(c_mat)
        assert np.linalg.norm(s - e) / np.linalg.norm(e) < 2e-4

    def test_matches_xla_split_gram(self, c_mat):
        """Same math as _sym_gram_split up to the truncation-vs-rounding
        split (both exact decompositions; products differ only in low-order
        cross terms)."""
        s_pal = np.asarray(
            sp.mirror_lower(sp.syrk_lower_split(c_mat, parts=3, interpret=True)),
            np.float64,
        )
        old = sm._GRAM_PRECISION
        try:
            sm._GRAM_PRECISION = jax.lax.Precision.HIGHEST
            s_xla = np.asarray(
                sm._sym_gram_split(c_mat.reshape(1024, 128, 6), (0,)),
                np.float64,
            ).reshape(768, 768)
        finally:
            sm._GRAM_PRECISION = old
        # Truncation (kernel) vs round-to-nearest (XLA) splits differ only
        # in how low-order bits distribute between parts — both are exact
        # decompositions, so the grams agree to f32 roundoff.
        assert (
            np.linalg.norm(s_pal - s_xla) / np.linalg.norm(s_xla) < 2e-6
        )

    def test_mirror_lower(self):
        s = jnp.asarray(
            np.tril(np.arange(16, dtype=np.float32).reshape(4, 4)) +
            np.triu(np.full((4, 4), np.nan, np.float32), 1)
        )
        full = np.asarray(sp.mirror_lower(s))
        assert np.all(np.isfinite(full))
        np.testing.assert_array_equal(full, full.T)
        np.testing.assert_array_equal(np.tril(full), np.asarray(jnp.tril(s)))

    def test_split_parts_exact_sum(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray((rng.normal(size=(64, 128)) * 1e4).astype(np.float32))
        parts = sp._split_parts(x, 3)
        total = sum(p.astype(jnp.float64) for p in parts)
        np.testing.assert_array_equal(
            np.asarray(total), np.asarray(x, np.float64)
        )

    def test_tile_m_selection(self):
        assert sp.syrk_tile_m(1536) == 384
        assert sp.syrk_tile_m(512) == 256
        assert sp.syrk_tile_m(128) == 128
        assert sp.syrk_tile_m(192) is None


class TestSyrkInComputeStep:
    def test_step_matches_xla_gram_path(self, monkeypatch):
        """compute_step with the syrk gram (interpret mode, forced on) must
        match the plain-dot XLA gram path on an f32 problem."""
        from obvi_slam_tpu.synthetic import synthetic_problem

        state, _, cams, tables, plan, free, weights, huber = synthetic_problem(
            n_poses=64,
            n_points=1024,
            n_objects=8,
            obs_per_point=4,
            obs_per_object=6,
            dtype=np.float32,
        )
        # Force the dense (non-banded) gram so the syrk branch is reachable.
        plan = plan._replace(pt_band_local_pose=None)
        radius = jnp.asarray(1e4, jnp.float32)

        def run():
            return sm.compute_step(
                state, cams, tables, plan, free, weights, radius, huber,
                dense_schur=True,
            )

        d_ref, mcc_ref, g_ref = run()

        monkeypatch.setattr(sm, "_use_syrk", lambda dtype: True)
        monkeypatch.setattr(
            sp,
            "syrk_lower_split",
            functools.partial(sp.syrk_lower_split, interpret=True),
        )
        d_syrk, mcc_syrk, g_syrk = run()

        # f32 summation-order difference amplified by the damped normal
        # equations (same mechanism as the test_f32_precision budget).
        rel = np.linalg.norm(
            np.asarray(d_syrk.poses) - np.asarray(d_ref.poses)
        ) / (np.linalg.norm(np.asarray(d_ref.poses)) + 1e-30)
        assert rel < 2e-3, rel
        assert np.isclose(float(mcc_syrk), float(mcc_ref), rtol=1e-3)
        assert np.isclose(float(g_syrk), float(g_ref), rtol=1e-5)
