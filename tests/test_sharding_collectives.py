"""Collective structure of the sharded global-BA step (VERDICT r3 #5).

Compiles the factor-sharded banded step on the 8-device CPU mesh and pins
the collective pattern: the H/b accumulation AND the partial landmark grams
must combine with all-reduce — if the gram psum disappears, the factor
sharding is silently dying at the H/b boundary again and every gram runs
replicated on all devices (the r4 audit found exactly that: one 2.1 MB
tuple all-reduce and nothing else, capping multi-chip speedup at the
resjac share)."""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from obvi_slam_tpu import parallel as par
from obvi_slam_tpu.parallel.audit import all_reduce_bytes, collect_collectives
from obvi_slam_tpu.synthetic import synthetic_problem


@pytest.fixture(scope="module")
def sharded_step_hlo():
    mesh = par.make_mesh()
    assert mesh.devices.size == 8
    p = synthetic_problem(
        n_poses=256, n_points=4096, n_objects=16,
        obs_per_point=6, obs_per_object=12, dtype=np.float32,
    )
    state, _, cams, tables, plan, free, weights, huber = p
    assert plan.pt_band_local_pose is not None  # banded production config
    step = par.sharded_compute_step(mesh)
    lowered = step.lower(
        par.replicate(state, mesh),
        par.replicate(cams, mesh),
        par.shard_tables(tables, mesh),
        par.shard_plan(plan, mesh),
        par.replicate(free, mesh),
        par.shard_weights(weights, mesh),
        jnp.asarray(1e4, jnp.float32),
        huber,
    )
    return lowered.compile().as_text()


class TestShardedCollectives:
    def test_gram_psum_present(self, sharded_step_hlo):
        by_op = collect_collectives(sharded_step_hlo)
        assert "all-reduce" in by_op, by_op
        shapes = by_op["all-reduce"]["shapes"]
        # Partial banded point group grams: a (G, 768, 768) operand.
        assert any(
            re.fullmatch(r"f32\[\d+,768,768\]", s) for s in shapes
        ), shapes
        # Partial object gram (c-major (6P, 6P)).
        assert any(
            re.fullmatch(r"f32\[1536,1536\]", s) for s in shapes
        ), shapes

    def test_all_reduce_op_count_pinned(self, sharded_step_hlo):
        """Exact op-count pin: a change here means the partitioning
        structure changed — update deliberately, with a PARITY note."""
        by_op = collect_collectives(sharded_step_hlo)
        counts = {k: v["count"] for k, v in by_op.items()}
        assert counts.get("all-reduce") == 4, counts

    def test_comm_volume_within_model(self, sharded_step_hlo):
        """Per-iteration all-reduce volume stays within the PARITY scaling
        model's envelope (~25 MB at the 256-pose shape; the dominant terms
        are the two gram psums at ~9.4 MB each)."""
        by_op = collect_collectives(sharded_step_hlo)
        ar = all_reduce_bytes(by_op)
        assert 4e6 < ar < 40e6, ar
