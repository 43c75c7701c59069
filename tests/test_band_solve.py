"""Block-tridiagonal + Woodbury reduced solve (solver/band_solve.py) vs
dense references — the O(P b^2) replacement for the dense O(P^3) reduced
Cholesky at reference problem scale (SPARSE_SCHUR answer,
object_pose_graph_optimizer.h:652-666)."""

import numpy as np
import pytest

import jax.numpy as jnp

from obvi_slam_tpu.solver import band_solve as bs


def _random_block_tridiag(nb, m, seed=0):
    rng = np.random.default_rng(seed)
    e = rng.normal(size=(nb - 1, m, m)) * 0.3
    d = []
    for i in range(nb):
        q = rng.normal(size=(m, m))
        d.append(q @ q.T + m * np.eye(m))  # diagonally dominant PD
    d = np.stack(d)
    dense = np.zeros((nb * m, nb * m))
    for i in range(nb):
        dense[i * m:(i + 1) * m, i * m:(i + 1) * m] = d[i]
    for i in range(nb - 1):
        dense[(i + 1) * m:(i + 2) * m, i * m:(i + 1) * m] = e[i]
        dense[i * m:(i + 1) * m, (i + 1) * m:(i + 2) * m] = e[i].T
    return d, e, dense


class TestBlockTridiagCholesky:
    def test_factor_matches_dense(self):
        nb, m = 5, 8
        d, e, dense = _random_block_tridiag(nb, m)
        l_d, l_e = bs.block_tridiag_cholesky(jnp.asarray(d), jnp.asarray(e))
        l_dense = np.linalg.cholesky(dense)
        for i in range(nb):
            np.testing.assert_allclose(
                np.asarray(l_d[i]),
                l_dense[i * m:(i + 1) * m, i * m:(i + 1) * m],
                rtol=1e-9, atol=1e-9,
            )
        for i in range(nb - 1):
            np.testing.assert_allclose(
                np.asarray(l_e[i]),
                l_dense[(i + 1) * m:(i + 2) * m, i * m:(i + 1) * m],
                rtol=1e-9, atol=1e-9,
            )

    def test_solve_matches_dense(self):
        nb, m, k = 6, 8, 3
        d, e, dense = _random_block_tridiag(nb, m, seed=1)
        rng = np.random.default_rng(2)
        rhs = rng.normal(size=(nb, m, k))
        l_d, l_e = bs.block_tridiag_cholesky(jnp.asarray(d), jnp.asarray(e))
        x = np.asarray(bs.block_tridiag_solve(l_d, l_e, jnp.asarray(rhs)))
        x_ref = np.linalg.solve(dense, rhs.transpose(1, 0, 2).reshape(nb * m, k)
                                if False else rhs.reshape(nb * m, k))
        np.testing.assert_allclose(
            x.reshape(nb * m, k), x_ref, rtol=1e-8, atol=1e-8
        )

    def test_matvec_matches_dense(self):
        nb, m = 4, 8
        d, e, dense = _random_block_tridiag(nb, m, seed=3)
        rng = np.random.default_rng(4)
        x = rng.normal(size=(nb, m, 2))
        out = np.asarray(
            bs.block_tridiag_matvec(jnp.asarray(d), jnp.asarray(e), jnp.asarray(x))
        )
        ref = dense @ x.reshape(nb * m, 2)
        np.testing.assert_allclose(out.reshape(nb * m, 2), ref, rtol=1e-10, atol=1e-10)


class TestWoodburyBandSolve:
    @pytest.mark.parametrize("rz", [1, 7, 40])
    def test_matches_dense(self, rz):
        nb, m = 5, 8
        d, e, dense = _random_block_tridiag(nb, m, seed=5)
        rng = np.random.default_rng(6)
        z = rng.normal(size=(rz, nb * m)) * 0.2  # keep S = B - Z^T Z PD
        s = dense - z.T @ z
        assert np.linalg.eigvalsh(s).min() > 0
        rhs = rng.normal(size=nb * m)
        x = np.asarray(
            bs.woodbury_band_solve(
                jnp.asarray(d), jnp.asarray(e), jnp.asarray(z), jnp.asarray(rhs)
            )
        )
        np.testing.assert_allclose(x, np.linalg.solve(s, rhs), rtol=1e-8, atol=1e-8)

    @pytest.mark.parametrize("nb,h", [(8, 2), (8, 4), (12, 3), (16, 8)])
    def test_dd_matches_dense(self, nb, h):
        """Domain-decomposed (substructured) solve == dense reference for
        every domain split, including 2-tile domains (interior of 1 tile)."""
        m = 8
        d, e, dense = _random_block_tridiag(nb, m, seed=11 + nb + h)
        rng = np.random.default_rng(12)
        rz = 9
        z = rng.normal(size=(rz, nb * m)) * 0.2
        s = dense - z.T @ z
        assert np.linalg.eigvalsh(s).min() > 0
        rhs = rng.normal(size=nb * m)
        x = np.asarray(
            bs.dd_woodbury_band_solve(
                jnp.asarray(d), jnp.asarray(e), jnp.asarray(z),
                jnp.asarray(rhs), n_domains=h,
            )
        )
        np.testing.assert_allclose(x, np.linalg.solve(s, rhs), rtol=1e-8, atol=1e-8)

    def test_dd_shard_map_matches_dense(self):
        """The explicit shard_map path (one domain per mesh device,
        hand-written collectives) == dense reference."""
        import jax

        from obvi_slam_tpu import parallel as par

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = par.make_mesh()
        nb, m, rz = 16, 8, 9
        d, e, dense = _random_block_tridiag(nb, m, seed=21)
        rng = np.random.default_rng(22)
        z = rng.normal(size=(rz, nb * m)) * 0.2
        s = dense - z.T @ z
        assert np.linalg.eigvalsh(s).min() > 0
        rhs = rng.normal(size=nb * m)
        x = np.asarray(
            bs.dd_woodbury_band_solve(
                jnp.asarray(d), jnp.asarray(e), jnp.asarray(z),
                jnp.asarray(rhs), n_domains=8,
                shard_mesh=mesh, shard_axis="factors",
            )
        )
        np.testing.assert_allclose(
            x, np.linalg.solve(s, rhs), rtol=1e-8, atol=1e-8
        )

    def test_dd_shard_map_deferred_quads_and_scatter(self):
        """The deferred-assembly shard_map mode (raw gram quadrants +
        relpose scatter updates applied inside the shard bodies) must equal
        assembling the tiles replicated and calling the plain solve."""
        import jax

        from obvi_slam_tpu import parallel as par

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = par.make_mesh()
        nb, tp = 16, 2
        m = 6 * tp
        rng = np.random.default_rng(31)
        # Random quadrants (gram-positive convention: tiles = -(fold) then
        # updates added, mirroring schur's band assembly).
        q00 = rng.normal(size=(nb, 6, tp, 6, tp)) * 0.1
        q10 = rng.normal(size=(nb, 6, tp, 6, tp)) * 0.05
        q11 = rng.normal(size=(nb, 6, tp, 6, tp)) * 0.1
        # Make the folded system SPD: add strong damped diagonals via the
        # scatter updates (diag blocks per pose) + relpose cross blocks.
        n_pose = nb * tp
        diag_idx = np.arange(n_pose)
        bidx = np.arange(n_pose - 1)
        aidx = bidx + 1
        rows = np.concatenate([diag_idx, bidx, aidx])
        cols = np.concatenate([diag_idx, aidx, bidx])
        cross = rng.normal(size=(n_pose - 1, 6, 6)) * 0.05
        diag = np.stack([np.eye(6) * 8.0 for _ in range(n_pose)])
        vals = np.concatenate(
            [diag, cross, np.swapaxes(cross, -1, -2)], axis=0
        )
        t_r, t_c = rows // tp, cols // tp
        pl_r, pl_c = rows % tp, cols % tp
        d_dest = np.where(t_r == t_c, t_r, nb)
        e_dest = np.where(t_r == t_c + 1, t_c, nb)

        # Reference: replicate schur's immediate assembly.
        d5 = -(q00 + np.concatenate([np.zeros((1, 6, tp, 6, tp)), q11[:-1]]))
        e5 = -q10[:-1]
        ci = np.arange(6)
        for k in range(len(rows)):
            if d_dest[k] < nb:
                d5[d_dest[k], :, pl_r[k], :, pl_c[k]] += vals[k]
            if e_dest[k] < nb - 1:
                e5[e_dest[k], :, pl_r[k], :, pl_c[k]] += vals[k]
        d_t = d5.reshape(nb, m, m)
        e_t = e5.reshape(nb - 1, m, m)
        rz = 5
        z = rng.normal(size=(rz, nb * m)) * 0.1
        rhs = rng.normal(size=nb * m)
        ref = np.asarray(
            bs.woodbury_band_solve(
                jnp.asarray(d_t), jnp.asarray(e_t), jnp.asarray(z),
                jnp.asarray(rhs),
            )
        )

        got = np.asarray(
            bs.dd_woodbury_band_solve(
                None, None, jnp.asarray(z), jnp.asarray(rhs), n_domains=8,
                shard_mesh=mesh, shard_axis="factors",
                rel_scatter=tuple(
                    jnp.asarray(a)
                    for a in (d_dest, e_dest, pl_r, pl_c, vals)
                ),
                gram_quads=tuple(
                    jnp.asarray(q) for q in (q00, q10, q11)
                ),
            )
        )
        np.testing.assert_allclose(got, ref, rtol=1e-7, atol=1e-9)

    def test_dd_rejects_bad_split(self):
        m = 8
        d, e, _ = _random_block_tridiag(6, m, seed=13)
        z = np.zeros((1, 6 * m))
        rhs = np.zeros(6 * m)
        with pytest.raises(ValueError):
            bs.dd_woodbury_band_solve(
                jnp.asarray(d), jnp.asarray(e), jnp.asarray(z),
                jnp.asarray(rhs), n_domains=4,
            )

    def test_zero_rank_reduces_to_band(self):
        nb, m = 4, 8
        d, e, dense = _random_block_tridiag(nb, m, seed=7)
        rng = np.random.default_rng(8)
        rhs = rng.normal(size=nb * m)
        z = np.zeros((1, nb * m))
        x = np.asarray(
            bs.woodbury_band_solve(
                jnp.asarray(d), jnp.asarray(e), jnp.asarray(z), jnp.asarray(rhs)
            )
        )
        np.testing.assert_allclose(x, np.linalg.solve(dense, rhs), rtol=1e-8, atol=1e-8)


class TestBandSolveStepEquality:
    """compute_step with the block-tridiag+Woodbury reduced solve vs the
    dense Cholesky path on a banded synthetic problem."""

    @pytest.mark.parametrize("dtype", [np.float64, np.float32])
    def test_step_matches_dense(self, dtype, monkeypatch):
        from obvi_slam_tpu.solver import schur as sm
        from obvi_slam_tpu.synthetic import synthetic_problem

        state, _, cams, tables, plan, free, weights, huber = (
            synthetic_problem(
                n_poses=256, n_points=768, n_objects=8, obs_per_point=6,
                obs_per_object=8, dtype=dtype,
            )
        )
        assert plan.pt_band_local_pose is not None
        assert plan.rel_band_local_pose is not None
        radius = jnp.asarray(1e4, dtype)

        def step():
            return sm.compute_step(
                state, cams, tables, plan, free, weights, radius, huber,
                dense_schur=True,
            )

        monkeypatch.setattr(sm, "_BAND_SOLVE", "on")
        d_band, mcc_band, g_band = step()
        monkeypatch.setattr(sm, "_BAND_SOLVE", "off")
        d_ref, mcc_ref, g_ref = step()

        # Different factorization -> different roundoff; the damped normal
        # equations amplify it in f32 (same mechanism as the band-gram
        # equality tolerance in test_band_gram).
        tol = 1e-8 if dtype == np.float64 else 2e-3
        for a, b in [
            (d_band.poses, d_ref.poses),
            (d_band.points, d_ref.points),
            (d_band.objects, d_ref.objects),
        ]:
            rel = np.linalg.norm(np.asarray(a) - np.asarray(b)) / (
                np.linalg.norm(np.asarray(b)) + 1e-30
            )
            assert rel < tol, rel
        assert np.isclose(float(mcc_band), float(mcc_ref), rtol=tol)
        assert np.isclose(float(g_band), float(g_ref), rtol=1e-6)

    def test_auto_gate_threshold(self, monkeypatch):
        from obvi_slam_tpu.solver import schur as sm

        monkeypatch.setattr(sm, "_BAND_SOLVE", "auto")
        assert not sm._use_band_solve(256)
        assert sm._use_band_solve(512)
        assert sm._use_band_solve(1024)
        monkeypatch.setattr(sm, "_BAND_SOLVE", "off")
        assert not sm._use_band_solve(4096)


class TestCyclicReduction:
    @pytest.mark.parametrize("nb", [2, 3, 5, 8, 16])
    def test_cr_solve_matches_dense(self, nb):
        m, k = 8, 3
        d, e, dense = _random_block_tridiag(nb, m, seed=10 + nb)
        rng = np.random.default_rng(nb)
        rhs = rng.normal(size=(nb, m, k))
        factors = bs.cr_factor(jnp.asarray(d), jnp.asarray(e))
        x = np.asarray(bs.cr_solve(factors, jnp.asarray(rhs)))
        x_ref = np.linalg.solve(dense, rhs.reshape(nb * m, k))
        np.testing.assert_allclose(
            x.reshape(nb * m, k), x_ref, rtol=1e-8, atol=1e-8
        )

    def test_woodbury_uses_cr_and_matches(self, monkeypatch):
        monkeypatch.setattr(bs, "_BAND_CR", "on")
        nb, m, rz = 6, 8, 10
        d, e, dense = _random_block_tridiag(nb, m, seed=42)
        rng = np.random.default_rng(5)
        z = rng.normal(size=(rz, nb * m)) * 0.2
        s = dense - z.T @ z
        assert np.linalg.eigvalsh(s).min() > 0
        rhs = rng.normal(size=nb * m)
        x = np.asarray(
            bs.woodbury_band_solve(
                jnp.asarray(d), jnp.asarray(e), jnp.asarray(z),
                jnp.asarray(rhs),
            )
        )
        np.testing.assert_allclose(
            x, np.linalg.solve(s, rhs), rtol=1e-8, atol=1e-8
        )
