"""Analytic FLOP accounting for the LM iteration — speed-of-light reporting.

The reference measures per-phase wall time with RAII cumulative timers
(``include/analysis/cumulative_timer_constants.h:11-107``) but publishes no
FLOP/efficiency numbers. For the TPU build, per-phase *device* arithmetic is
statically known from the problem shapes (capacity-padded factor tables and
the Schur plan), so the bench reports, per phase of the solve:

  - f32 FLOPs (mults+adds, padded shapes — exactly what the device executes),
  - MXU-pass-equivalent bf16 FLOPs (TPU executes an f32-precision matmul as
    several bf16 MXU passes: HIGHEST = 6 / split-sym = 4, HIGH = 3 / split-sym
    = 2 — see solver/schur.py _sym_gram_split),
  - the speed-of-light time at the chip's peak bf16 throughput,

and an overall MFU (model FLOP utilization) = sol_time / measured_time.

Elementwise (VPU) phases are charged at their f32 op counts against the VPU
peak; they are minor next to the grams but reported for completeness.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# Per-chip peaks. TPU v5e (v5 lite): 197 TFLOP/s bf16 on the MXU; VPU f32
# vector throughput ~ 197/4 TFLOP/s class. Used only for speed-of-light
# ratios, not measurements.
PEAK_BF16_FLOPS = {"tpu v5 lite": 197e12, "default": 197e12}
PEAK_VPU_FLOPS = {"default": 12.3e12}


def _gram_passes(precision: str, split: bool) -> int:
    if precision == "HIGHEST":
        return 4 if split else 6
    if precision == "HIGH":
        return 2 if split else 3
    return 1


def lm_iteration_flops(
    tables, plan, n_pose, n_point, n_obj,
    gram_precision: str = "HIGHEST", split_gram: bool = True,
    value_passes: int = 6,
) -> Dict[str, Dict[str, float]]:
    """Per-phase FLOP model of one compute_step + cost evaluation.

    ``value_passes``: MXU passes for value-bearing (Precision.HIGHEST) small
    contractions (the one-hot z build and reduced-RHS contractions).
    Returns {phase: {flops_f32, flops_bf16_equiv, unit}} with phases named
    after the computation stages inside the reference's
    ``*_solve_opt`` timers (the whole table IS the solve phase).
    """
    F_rp = int(tables.reproj.capacity)
    F_bb = int(tables.bbox.capacity)
    F_sh = int(tables.shape.capacity)
    F_rl = int(tables.relpose.capacity)
    F_lt = int(tables.ltm.capacity)
    Lp, Cp = (int(s) for s in plan.pt_slot_gather.shape)
    Lo, Co = (int(s) for s in plan.ob_slot_gather.shape)
    Np = int(plan.pt_pair_pose.shape[0])
    No = int(plan.ob_pair_pose.shape[0])
    d6 = 6 * n_pose

    phases: Dict[str, Dict[str, float]] = {}

    def phase(name, f32, mxu_equiv=None, unit="flop"):
        phases[name] = {
            "flops_f32": float(f32),
            "flops_bf16_equiv": float(mxu_equiv if mxu_equiv is not None else f32),
            "unit": unit,
        }

    # Residual + Jacobian evaluation (VPU lane math / Pallas kernels).
    # Per-factor op counts from the analytic chains (reproj_fast.py /
    # factors/residuals.py); conservative estimates.
    resjac = 560 * F_rp + 2400 * F_bb + 60 * F_sh + 700 * F_rl + 120 * F_lt
    phase("residual_jacobian_eval", resjac)

    # Block H/b accumulation (outer products + segment sums, VPU).
    hb = F_rp * (2 * (36 + 9 + 18) + 18) + F_bb * (2 * (36 + 49 + 42) + 22) \
        + F_sh * 2 * 49 + F_rl * 2 * (2 * 36 + 36) + F_lt * 2 * 49
    phase("hessian_block_accumulation", hb)

    # Batched small-block Cholesky/inverses (VPU, unrolled).
    phase("landmark_block_inverses", n_point * 120 + n_obj * 1000 + n_pose * 600)

    # One-hot z build (MXU, value-bearing: full f32 accuracy passes).
    # Banded layout shrinks the point one-hot to the 128-wide local window.
    banded = getattr(plan, "pt_band_local_pose", None) is not None
    pt_width = 2 * 64 if banded else n_pose
    z_build = 2.0 * Lp * Cp * pt_width * 18 + 2.0 * Lo * Co * n_pose * 42
    phase("schur_z_build", z_build, z_build * value_passes)

    # Schur grams: the dominant matmuls (S assembly). With the band layout
    # the point gram runs as G batched (768, Lg*3, 768) group grams instead
    # of one (6P, 3Lp, 6P).
    g_passes = _gram_passes(gram_precision, split_gram)
    pt_gram_width = 6 * pt_width
    rel_banded = getattr(plan, "rel_band_local_pose", None) is not None
    rel_gram_width = 6 * (2 * 64) if (banded and rel_banded) else d6
    gram = (
        2.0 * pt_gram_width * pt_gram_width * (Lp * 3)  # point gram
        + 2.0 * d6 * d6 * (Lo * 7)      # object gram
        + 2.0 * rel_gram_width * rel_gram_width * (6 * (F_rl + n_pose))
    )
    phase("schur_gram", gram, gram * g_passes)

    # Reduced RHS + back-substitution coupling contractions (MXU, HIGHEST).
    rhs = 2.0 * (Lp * 3 * pt_gram_width + Lo * 7 * d6) * 2  # b_S + W^T delta
    phase("reduced_rhs_backsub", rhs, rhs * value_passes)

    # Dense Cholesky of S + two triangular solves + refinement matvec.
    chol = d6**3 / 3.0 + 4.0 * d6 * d6 + 2.0 * d6 * d6
    phase("reduced_cholesky_solve", chol, chol * value_passes)

    # Cost evaluation of the stepped state (residuals only).
    phase("cost_evaluation", 0.35 * resjac)

    return phases


def speed_of_light_table(
    phases: Dict[str, Dict[str, float]],
    measured_iter_s: float = None,
    chip: str = "default",
) -> Dict:
    """Attach speed-of-light times and (if measured) overall MFU."""
    peak_mxu = PEAK_BF16_FLOPS.get(chip, PEAK_BF16_FLOPS["default"])
    peak_vpu = PEAK_VPU_FLOPS["default"]
    out = {"phases": {}, "peak_bf16_flops": peak_mxu}
    total_sol = 0.0
    total_f32 = 0.0
    for name, ph in phases.items():
        mxu_like = ph["flops_bf16_equiv"] != ph["flops_f32"]
        peak = peak_mxu if mxu_like else peak_vpu
        sol_s = ph["flops_bf16_equiv"] / peak
        total_sol += sol_s
        total_f32 += ph["flops_f32"]
        out["phases"][name] = {
            "flops_f32": ph["flops_f32"],
            "flops_bf16_equiv": ph["flops_bf16_equiv"],
            "sol_us": sol_s * 1e6,
            "unit_peak": "mxu_bf16" if mxu_like else "vpu_f32",
        }
    out["total_flops_f32"] = total_f32
    out["total_sol_us"] = total_sol * 1e6
    if measured_iter_s is not None and measured_iter_s > 0:
        out["measured_iter_us"] = measured_iter_s * 1e6
        # Fraction of the iteration spent at speed of light — the honest
        # "percent of peak" for a mixed MXU/VPU/memory-bound pipeline.
        out["sol_fraction"] = total_sol / measured_iter_s
    return out
