"""Isolated on-device check of the symmetric split-bf16 gram lowering.

Variants (vs f64 host reference):
  dot      — lax.dot_general f32 HIGHEST (ground truth path)
  split    — _sym_gram_split as written (bf16 operands)
  splitf32 — same passes but parts stored in f32 containers (bf16 values),
             each pass at precision=DEFAULT (single MXU pass, operands
             already bf16-representable so the default rounding is identity)
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from obvi_slam_tpu.solver import schur as sm

dev = [d for d in jax.devices() if d.platform != "cpu"][0]
print("device:", dev, flush=True)

rng = np.random.default_rng(0)
z_h = (rng.normal(size=(512, 64, 6, 3)) * rng.lognormal(0, 2, (512, 64, 6, 3))).astype(
    np.float32
)
z = jax.device_put(jnp.asarray(z_h), dev)
ref = np.einsum(
    "lpib,lqjb->piqj", z_h.astype(np.float64), z_h.astype(np.float64)
)


def rel(a):
    a = np.asarray(a, np.float64)
    return float(np.linalg.norm(a - ref) / np.linalg.norm(ref))


dn = (((0, 3), (0, 3)), ((), ()))


@jax.jit
def v_dot(z):
    return jax.lax.dot_general(
        z, z, dn, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


@jax.jit
def v_split(z):
    return sm._sym_gram_split(z, (0, 3))


@jax.jit
def v_splitf32(z):
    h = z.astype(jnp.bfloat16)
    r = z - h.astype(jnp.float32)
    m = r.astype(jnp.bfloat16)
    l = (r - m.astype(jnp.float32)).astype(jnp.bfloat16)
    h32, m32, l32 = (p.astype(jnp.float32) for p in (h, m, l))

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dn, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    mirror = (2, 3, 0, 1)
    hm = dot(h32, m32)
    hl = dot(h32, l32)
    return (
        dot(h32, h32) + dot(m32, m32)
        + (hm + hm.transpose(mirror)) + (hl + hl.transpose(mirror))
    )


@jax.jit
def v_bf16_single(z):
    b = z.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        b, b, dn, precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )


for name, fn in (
    ("dot/HIGHEST  ", v_dot),
    ("split bf16   ", v_split),
    ("split f32ctr ", v_splitf32),
    ("single bf16  ", v_bf16_single),
):
    t0 = time.perf_counter()
    out = fn(z)
    o = np.asarray(out)
    print(f"{name} rel err {rel(o):.3e}  ({time.perf_counter()-t0:.1f}s)", flush=True)
