"""TPU f32 LM step at a given gram precision; compares to the f64 reference
step (tools/precision_f64_ref.py writes /tmp/precision_ref.npz) and times a
DEPENDENT chain of steps (each iteration consumes the previous one's output,
like the real LM loop — independent steps would overstate pipelining).

Usage: python tools/precision_tpu_step.py HIGHEST|HIGH|DEFAULT
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

prec_name = sys.argv[1] if len(sys.argv) > 1 else "HIGHEST"
schur_mod._GRAM_PRECISION = getattr(jax.lax.Precision, prec_name)

dev = [d for d in jax.devices() if d.platform != "cpu"][0]
print("device:", dev, flush=True)

problem = synthetic_problem(
    n_poses=256, n_points=4096, n_objects=32,
    obs_per_point=6, obs_per_object=12, dtype=np.float32,
)
_, _, _, tables, plan, free, weights, huber = problem
state0 = jax.device_put(problem[0], dev)
cams = jax.device_put(problem[2], dev)
tables = jax.device_put(tables, dev)
plan = jax.device_put(plan, dev)
free = jax.device_put(free, dev)
weights = jax.device_put(weights, dev)

step = jax.jit(
    lambda s, c, t, p, f, w, r: schur_mod.compute_step(s, c, t, p, f, w, r, huber)
)
radius = jnp.asarray(1e4, jnp.float32)
t_c = time.perf_counter()
delta, mcc, gmax = step(state0, cams, tables, plan, free, weights, radius)
dp = np.asarray(delta.poses, np.float64)  # value readback = fence
print(f"  compile+first-step: {time.perf_counter() - t_c:.1f}s", flush=True)

ref = np.load("/tmp/precision_ref.npz")


def rel(a, b):
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30))


print(f"prec={prec_name}", flush=True)
print("  rel step err poses :", rel(dp, ref["poses"]))
print("  rel step err points:", rel(np.asarray(delta.points, np.float64), ref["points"]))
print("  rel step err objs  :", rel(np.asarray(delta.objects, np.float64), ref["objects"]))
print("  mcc:", float(mcc), "ref:", float(ref["mcc"]))

# Timing: dependent chain — thread the previous step's grad_max into the
# radius so iteration k cannot start before k-1 finishes.
reps = 30
t0 = time.perf_counter()
r = radius
for _ in range(reps):
    delta, mcc, gmax = step(state0, cams, tables, plan, free, weights, r)
    r = radius + 0.0 * gmax
float(mcc)  # value readback = fence
dt = time.perf_counter() - t0
print(f"  {reps/dt:.1f} steps/s (dependent chain)")
