"""Per-phase device-time microbench on the bench problem (TPU tunnel).

Each phase is timed as a DEPENDENT chain inside one jitted fori_loop (one
dispatch + one value readback), so per-iteration times are real device times,
unaffected by the tunnel's ~0.5s dispatch latency:

  resjac   — reproj (Pallas) + bbox (Pallas) residual+Jacobian evaluation
  zbuild   — the one-hot slot->z contraction (value-bearing MXU)
  gram     — the symmetric split-bf16 Schur gram of z (the headline matmul)
  chol     — dense Cholesky of S + 2 cho_solves + refinement matvec
  step     — the whole compute_step for reference
  stepsub  — cumulative partial compute_step via the _profile_stop hooks
             (resjac / hb / w / sassembly / rhs / chol / full) — the deltas
             between consecutive stops attribute real device time to each
             section of the step.

Every number is reported with the measured NULL-CHAIN FLOOR subtracted: one
dispatch + one value readback through the axon tunnel costs ~25-30 ms
regardless of the loop, so a REPS=50 chain overstates every phase by
~0.5 ms/iter (r2's phase table had exactly that bias).

Usage: python tools/tpu_phase_bench.py [reps] [phase,phase,...]
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from obvi_slam_tpu.solver import schur as sm
from obvi_slam_tpu.synthetic import synthetic_problem

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
PHASES = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else {
    "resjac", "zbuild", "gram", "chol", "step"}

dev = [d for d in jax.devices() if d.platform != "cpu"][0]
print("device:", dev, flush=True)

import os
_POSES = int(os.environ.get("OBVI_PHASE_POSES", "256"))
problem = synthetic_problem(
    n_poses=_POSES,
    n_points=int(os.environ.get("OBVI_PHASE_POINTS", str(_POSES * 16))),
    n_objects=int(os.environ.get("OBVI_PHASE_OBJECTS", str(max(_POSES // 8, 8)))),
    obs_per_point=6, obs_per_object=12, dtype=np.float32,
)
state, _, cams, tables, plan, free, weights, huber = (
    jax.device_put(problem[0], dev), problem[1],
    jax.device_put(problem[2], dev), jax.device_put(problem[3], dev),
    jax.device_put(problem[4], dev), jax.device_put(problem[5], dev),
    jax.device_put(problem[6], dev), problem[7],
)
n_pose = 256
rng = np.random.default_rng(0)


_FLOOR_S = None  # measured null-chain total (dispatch + readback), seconds


def _measure_floor():
    """One dispatch + one readback with a REPS-iteration null loop — the
    fixed cost every chain() measurement pays once, independent of REPS."""
    global _FLOOR_S
    x0 = jax.device_put(jnp.ones((1536,), jnp.float32), dev)

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, REPS, lambda _, x: x * 1.000001, x)

    _ = float(jnp.sum(loop(x0)))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(loop(x0)))
        best = min(best, time.perf_counter() - t0)
    _FLOOR_S = best
    print(f"null-chain floor: {best * 1e3:.1f} ms per dispatch+readback "
          f"({best / REPS * 1e3:.3f} ms/iter at REPS={REPS})", flush=True)


def chain(fn, x0, label):
    """Run fn REPS times with a data dependency; report per-iter ms with the
    dispatch+readback floor subtracted."""
    if _FLOOR_S is None:
        _measure_floor()

    @jax.jit
    def loop(x):
        def body(_, x):
            return fn(x)

        return jax.lax.fori_loop(0, REPS, body, x)

    t0 = time.perf_counter()
    out = loop(x0)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))  # readback fence
    compile_and_first = time.perf_counter() - t0
    best = 1e9
    for _i in range(2):
        t0 = time.perf_counter()
        out = loop(x0)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    per_iter = (best - _FLOOR_S) / REPS
    print(
        f"{label:10s} {per_iter * 1e3:8.3f} ms/iter   "
        f"(compile+first {compile_and_first:.1f}s)",
        flush=True,
    )
    return per_iter


# --- phase: residual+jacobian (pallas reproj + bbox) -----------------------
from obvi_slam_tpu import ops as ops_mod


def resjac(carry):
    s = carry
    r1, jp, jx = ops_mod.reproj_residuals_and_jac_pallas(s, cams, tables.reproj)
    r2, jo, jb = ops_mod.bbox_residuals_and_jac_pallas(s, cams, tables.bbox)
    bump = jnp.sum(r1) + jnp.sum(jp) + jnp.sum(jx) + jnp.sum(r2) + jnp.sum(jo)
    return s._replace(poses=s.poses + 0.0 * bump)


# --- phase: z build + gram -------------------------------------------------
Lp, Cp = plan.pt_slot_gather.shape
w_scaled0 = jax.device_put(
    jnp.asarray(rng.normal(size=(plan.pt_pair_pose.shape[0], 6, 3)), jnp.float32),
    dev,
)


_BAND = plan.pt_band_local_pose is not None
if _BAND:
    _G, _LG, _ = plan.pt_band_local_pose.shape


def zbuild(w_scaled):
    """Mirror of the current _slot_gram z build: banded (128-wide local
    one-hot, one b-major N=18 dot) when the plan has the band layout, else
    the full P-wide one-hot with 3 per-b dots."""
    L, C = plan.pt_slot_gather.shape
    w_comp = w_scaled.reshape(-1, 18)[plan.pt_slot_gather.reshape(-1)].reshape(
        L, C, 6, 3
    )
    if _BAND:
        onehot = (
            (plan.pt_band_local_pose.reshape(L, C)[:, :, None]
             == jnp.arange(128, dtype=plan.pt_slot_pose.dtype))
            & plan.pt_slot_mask[:, :, None]
        ).astype(jnp.float32)
        w_bt = jnp.swapaxes(w_comp, 2, 3).reshape(L, C, 18)
        z4 = jax.lax.dot_general(
            w_bt, onehot, (((1,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (L, 18, 128)
        return w_scaled + 1e-30 * z4[0, 0, 0]
    onehot = (
        (plan.pt_slot_pose[:, :, None]
         == jnp.arange(n_pose, dtype=plan.pt_slot_pose.dtype))
        & plan.pt_slot_mask[:, :, None]
    ).astype(jnp.float32)
    bump = 0.0
    for b in range(3):
        z = jax.lax.dot_general(
            onehot, w_comp[..., b], (((1,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        bump = bump + 1e-30 * z[0, 0, 0]
    return w_scaled + bump


if _BAND:
    z0 = (
        jax.device_put(
            jnp.asarray(
                rng.normal(size=(_G, 3 * _LG, 768)).astype(np.float32)
            ),
            dev,
        ),
    )

    def gram(zs):
        # c-major group gram, as production runs it (no output permute —
        # the reduced system stays c-major under banding).
        zg = zs[0]
        s = sm._sym_gram_split_batched(zg)
        return (zg + 1e-30 * s[0, 0, 0],)

else:
    z0 = tuple(
        jax.device_put(
            jnp.asarray(
                rng.normal(size=(Lp, n_pose, 6)).astype(np.float32)
            ),
            dev,
        )
        for _ in range(3)
    )

    def gram(zs):
        s = sum(sm._sym_gram_split(z, (0,)) for z in zs)
        return tuple(z + 1e-30 * s[0, 0, 0, 0] for z in zs)


# --- phase: cholesky + solves ----------------------------------------------
a_np = rng.normal(size=(n_pose * 6, n_pose * 6)).astype(np.float32)
s_spd = jax.device_put(
    jnp.asarray(a_np @ a_np.T + 100.0 * np.eye(n_pose * 6, dtype=np.float32)), dev
)
rhs0 = jax.device_put(jnp.asarray(rng.normal(size=(n_pose * 6,)).astype(np.float32)), dev)


def chol(rhs):
    c = jnp.linalg.cholesky(s_spd + 1e-30 * rhs[0])
    d = jax.scipy.linalg.cho_solve((c, True), rhs)
    resid = rhs - jnp.einsum(
        "ij,j->i", s_spd, d, precision=jax.lax.Precision.HIGHEST
    )
    d2 = d + jax.scipy.linalg.cho_solve((c, True), resid)
    return rhs + 1e-30 * d2


# chol sub-phases: factorization vs triangular solves vs matvec.
l_fixed = np.linalg.cholesky(
    a_np @ a_np.T + 100.0 * np.eye(n_pose * 6, dtype=np.float32)
).astype(np.float32)
l_dev = jax.device_put(jnp.asarray(l_fixed), dev)


def chol_fact(rhs):
    c = jnp.linalg.cholesky(s_spd + 1e-30 * rhs[0])
    return rhs + 1e-30 * c[0, 0]


def chol_solve(rhs):
    d = jax.scipy.linalg.cho_solve((l_dev, True), rhs)
    return rhs + 1e-30 * d[0]


def chol_matvec(rhs):
    d = jnp.einsum(
        "ij,j->i", s_spd, rhs, precision=jax.lax.Precision.HIGHEST
    )
    return rhs + 1e-30 * d[0]


def chol_matvec0(rhs):
    """Dim-0 contraction variant (valid because S is symmetric)."""
    d = jax.lax.dot_general(
        s_spd, rhs, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return rhs + 1e-30 * d[0]


# --- phase: full step ------------------------------------------------------
def step(carry):
    s, radius = carry
    delta, mcc, gmax = sm.compute_step(
        s, cams, tables, plan, free, weights, radius, huber
    )
    # The carry must consume EVERY output (delta, mcc, gmax) or XLA dead-code
    # eliminates the Schur solve and this measures only the gradient path
    # (observed: 0.59 ms/iter "step" vs 4.5 ms of live phases).
    bump = 1e-30 * (
        gmax
        + mcc
        + jnp.sum(delta.poses)
        + jnp.sum(delta.points)
        + jnp.sum(delta.objects)
    )
    return (s, radius + bump)


print(f"gram impl: {'split' if sm._use_split_gram(jnp.float32) else 'dot'} "
      f"prec={sm._GRAM_PRECISION}", flush=True)
t = {}
if "resjac" in PHASES:
    t["resjac"] = chain(resjac, state, "resjac")
if "zbuild" in PHASES:
    t["zbuild"] = chain(zbuild, w_scaled0, "zbuild")
if "gram" in PHASES:
    t["gram"] = chain(gram, z0, "gram")
if "chol" in PHASES:
    t["chol"] = chain(chol, rhs0, "chol")
if "cholsub" in PHASES:
    t["chol_fact"] = chain(chol_fact, rhs0, "chol_fact")
    t["chol_solve"] = chain(chol_solve, rhs0, "chol_solve")
    t["chol_matvec"] = chain(chol_matvec, rhs0, "chol_matvec")
    t["chol_matvec0"] = chain(chol_matvec0, rhs0, "chol_matvec0")
if "step" in PHASES:
    t["step"] = chain(step, (state, jnp.asarray(1e4, jnp.float32)), "step")
if "lmbody" in PHASES:
    # LM while-loop body costs beyond compute_step: candidate cost eval,
    # dynamic-cond while overhead, record updates.
    from obvi_slam_tpu.solver import lm_fused as lmf

    def costphase(carry):
        s, bump = carry
        c = lmf._cost_fn(s, cams, tables, weights, huber)
        return (s, 1e-30 * c)

    chain(costphase, (state, jnp.asarray(0.0, jnp.float32)), "costeval")

    def whilenull(x):
        def cond(c):
            return c[1] < REPS

        def body(c):
            return (c[0] * 1.000001, c[1] + 1)

        out = jax.lax.while_loop(cond, body, (x, jnp.asarray(0, jnp.int32)))
        return out[0]

    # NOT via chain(): the while IS the loop. Report per-iteration directly.
    @jax.jit
    def wrap(x):
        return whilenull(x)

    x0 = jax.device_put(jnp.ones((1536,), jnp.float32), dev)
    _ = float(jnp.sum(wrap(x0)))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(wrap(x0)))
        best = min(best, time.perf_counter() - t0)
    if _FLOOR_S is None:
        _measure_floor()
    print(f"{'whilenull':10s} {(best - _FLOOR_S) / REPS * 1e3:8.3f} ms/iter "
          f"(dynamic-cond while_loop, null body)", flush=True)

    def recphase(carry):
        rec, i = carry
        rec = jax.lax.dynamic_update_slice(rec, jnp.ones((1,), jnp.float32), (i % 20,))
        return (rec, i + 1)

    chain(
        lambda c: recphase(c),
        (jax.device_put(jnp.zeros((20,), jnp.float32), dev),
         jnp.asarray(0, jnp.int32)),
        "records",
    )

if "stepsub" in PHASES:
    # Cumulative partial steps via compute_step's _profile_stop hooks; the
    # delta between consecutive stops is that section's real device time.
    radius0 = jnp.asarray(1e4, jnp.float32)

    def partial_step(stop):
        def fn(carry):
            s, bump = carry
            out = sm.compute_step(
                s, cams, tables, plan, free, weights, radius0 + bump, huber,
                _profile_stop=stop,
            )
            return (s, 1e-30 * out)

        return fn

    # Band-solve mode (OBVI_BAND_SOLVE=on at >=512 poses) replaces the
    # dense-S stops with band-specific ones.
    if sm._use_band_solve(_POSES):
        stops = (
            "resjac", "hb", "w", "ptw", "ptz", "ptgram", "bandtiles",
            "rhs", "chol", "backsub",
        )
    else:
        stops = (
            "resjac", "hb", "w", "ptw", "ptz", "ptgram", "ptfold", "obgram",
            "sassembly", "rhs", "chol", "backsub",
        )
    cum = {}
    for stop in stops:
        cum[stop] = chain(
            partial_step(stop),
            (state, jnp.asarray(0.0, jnp.float32)),
            f"->{stop}",
        )
    cum["full"] = chain(
        step, (state, jnp.asarray(1e4, jnp.float32)), "->full")
    prev = 0.0
    print("\nsection deltas:", flush=True)
    for stop in stops + ("full",):
        print(f"  {stop:10s} {(cum[stop] - prev) * 1e3:8.3f} ms", flush=True)
        prev = cum[stop]
if len(t) == 5:
    other = t["step"] - (t["resjac"] + t["zbuild"] + t["gram"] + t["chol"])
    print(f"{'other':8s} {other * 1e3:8.3f} ms/iter (H/b assembly, RHS, "
          "backsub, cost, ob/rel grams)", flush=True)
