"""TPU f32 LM step at a given gram precision; compares to f64 ref and times it.

Usage: python tpu_step.py HIGHEST|HIGH|DEFAULT
"""
import sys
import time

import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from obvi_slam_tpu.synthetic import synthetic_problem
from obvi_slam_tpu.solver import schur as schur_mod

prec_name = sys.argv[1] if len(sys.argv) > 1 else "HIGHEST"
prec = getattr(jax.lax.Precision, prec_name)
schur_mod._GRAM_PRECISION = prec

dev = [d for d in jax.devices() if d.platform != "cpu"][0]
print("device:", dev)

problem = synthetic_problem(
    n_poses=256, n_points=4096, n_objects=32,
    obs_per_point=6, obs_per_object=12, dtype=np.float32,
)
state0, _, cams, tables, plan, free, weights, huber = [
    jax.device_put(x, dev) if not isinstance(x, type(problem[-1])) else x
    for x in problem
]
state0, cams, tables, plan, free, weights = (
    jax.device_put(problem[0], dev),
    jax.device_put(problem[2], dev),
    jax.device_put(problem[3], dev),
    jax.device_put(problem[4], dev),
    jax.device_put(problem[5], dev),
    jax.device_put(problem[6], dev),
)
huber = problem[7]

step = jax.jit(
    lambda s, c, t, p, f, w, r: schur_mod.compute_step(s, c, t, p, f, w, r, huber)
)
radius = jnp.asarray(1e4, jnp.float32)
delta, mcc, gmax = step(state0, cams, tables, plan, free, weights, radius)
dp = np.asarray(delta.poses, np.float64)  # value readback = fence

ref = np.load("/tmp/precision_ref.npz")
def rel(a, b):
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30))

print(f"prec={prec_name}")
print("  rel step err poses :", rel(dp, ref["poses"]))
print("  rel step err points:", rel(np.asarray(delta.points, np.float64), ref["points"]))
print("  rel step err objs  :", rel(np.asarray(delta.objects, np.float64), ref["objects"]))
print("  mcc:", float(mcc), "ref:", float(ref["mcc"]))

# timing: dependent chain of 20 steps
t0 = time.perf_counter()
reps = 30
out = state0
for _ in range(reps):
    delta, mcc, gmax = step(state0, cams, tables, plan, free, weights, radius)
float(mcc)
dt = time.perf_counter() - t0
print(f"  {reps/dt:.1f} steps/s (pipelined)")
