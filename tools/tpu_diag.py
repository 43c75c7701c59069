"""On-TPU numerics diagnosis: isolates which stage of the LM step diverges
from the CPU reference.

Stages (select via argv, default "kernels step_dot"):
  kernels   — reproj Pallas kernel vs XLA analytic path, both ON DEVICE, plus
              each factor family's residual+J on device vs host CPU f32.
  step_dot  — full compute_step on TPU with the plain dot_general grams at
              HIGHEST (the round-1 configuration) vs the CPU f64 reference
              (/tmp/precision_ref.npz from tools/precision_f64_ref.py).
  step_split— full compute_step with the symmetric split-bf16 grams.

Usage: python tools/tpu_diag.py [kernels] [step_dot] [step_split]
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from obvi_slam_tpu.synthetic import synthetic_problem
from obvi_slam_tpu.solver import schur as schur_mod

stages = sys.argv[1:] or ["kernels", "step_dot"]

dev = [d for d in jax.devices() if d.platform != "cpu"][0]
cpu = jax.devices("cpu")[0]
print("device:", dev, flush=True)

problem = synthetic_problem(
    n_poses=256, n_points=4096, n_objects=32,
    obs_per_point=6, obs_per_object=12, dtype=np.float32,
)
state_h, _, cams_h, tables_h, plan_h, free_h, weights_h, huber = problem


def rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30))


if "kernels" in stages:
    import obvi_slam_tpu.factors as fac
    from obvi_slam_tpu import ops as ops_mod
    from obvi_slam_tpu.factors.reproj_fast import reproj_residuals_and_jac_fast

    state_d = jax.device_put(state_h, dev)
    cams_d = jax.device_put(cams_h, dev)
    tables_d = jax.device_put(tables_h, dev)

    # Host CPU f32 references (exact f32 math).
    with jax.default_device(cpu):
        r_ref, jp_ref, jx_ref = jax.jit(
            fac.highest_matmul(reproj_residuals_and_jac_fast), backend="cpu"
        )(state_h, cams_h, tables_h.reproj)
        r_ref, jp_ref, jx_ref = map(np.asarray, (r_ref, jp_ref, jx_ref))
        bb_ref = jax.jit(
            fac.highest_matmul(
                lambda s, c, t: fac.bbox_residuals_and_jac(
                    s, c, t, huber.invalid_ellipse_error
                )
            ),
            backend="cpu",
        )(state_h, cams_h, tables_h.bbox)
        bb_ref = [np.asarray(x) for x in bb_ref]

    t0 = time.perf_counter()
    r_p, jp_p, jx_p = jax.jit(
        ops_mod.reproj_residuals_and_jac_pallas, backend=dev.platform
    )(state_d, cams_d, tables_d.reproj)
    print(f"[kernels] pallas reproj compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    print("  pallas r  vs cpu f32:", rel(r_p, r_ref), flush=True)
    print("  pallas Jp vs cpu f32:", rel(jp_p, jp_ref), flush=True)
    print("  pallas Jx vs cpu f32:", rel(jx_p, jx_ref), flush=True)

    t0 = time.perf_counter()
    r_f, jp_f, jx_f = jax.jit(
        fac.highest_matmul(reproj_residuals_and_jac_fast), backend=dev.platform
    )(state_d, cams_d, tables_d.reproj)
    print(f"[kernels] xla reproj compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    print("  xla r  vs cpu f32:", rel(r_f, r_ref), flush=True)
    print("  xla Jp vs cpu f32:", rel(jp_f, jp_ref), flush=True)
    print("  xla Jx vs cpu f32:", rel(jx_f, jx_ref), flush=True)

    t0 = time.perf_counter()
    bb_d = jax.jit(
        fac.highest_matmul(
            lambda s, c, t: fac.bbox_residuals_and_jac(
                s, c, t, huber.invalid_ellipse_error
            )
        ),
        backend=dev.platform,
    )(state_d, cams_d, tables_d.bbox)
    print(f"[kernels] bbox compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    for name, d, r in zip(("r_bb", "j_obj", "j_pose"), bb_d, bb_ref):
        print(f"  bbox {name} vs cpu f32:", rel(d, r), flush=True)


def run_step(impl, prec_name):
    schur_mod._GRAM_IMPL = impl
    schur_mod._GRAM_PRECISION = getattr(jax.lax.Precision, prec_name)
    state0 = jax.device_put(state_h, dev)
    cams = jax.device_put(cams_h, dev)
    tables = jax.device_put(tables_h, dev)
    plan = jax.device_put(plan_h, dev)
    free = jax.device_put(free_h, dev)
    weights = jax.device_put(weights_h, dev)
    step = jax.jit(
        lambda s, c, t, p, f, w, r: schur_mod.compute_step(
            s, c, t, p, f, w, r, huber
        ),
        backend=dev.platform,
    )
    radius = jnp.asarray(1e4, jnp.float32)
    t0 = time.perf_counter()
    delta, mcc, gmax = step(state0, cams, tables, plan, free, weights, radius)
    dp = np.asarray(delta.poses, np.float64)
    print(
        f"[step {impl}/{prec_name}] compile+first {time.perf_counter()-t0:.1f}s",
        flush=True,
    )
    ref = np.load("/tmp/precision_ref.npz")
    print("  rel step err poses :", rel(dp, ref["poses"]), flush=True)
    print("  rel step err points:", rel(delta.points, ref["points"]), flush=True)
    print("  rel step err objs  :", rel(delta.objects, ref["objects"]), flush=True)
    print("  mcc:", float(mcc), "ref:", float(ref["mcc"]), flush=True)


if "step_dot" in stages:
    run_step("dot", "HIGHEST")
if "step_split" in stages:
    run_step("split", "HIGHEST")
if "step_split_high" in stages:
    run_step("split", "HIGH")
