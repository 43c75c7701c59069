"""Collective-op extraction from compiled (SPMD-partitioned) HLO text.

Used by tools/sharding_audit.py (comm-volume/scaling model) and
tests/test_sharding_collectives.py (regression pin on the collective
structure of the sharded global-BA step)."""

from __future__ import annotations

import re

import numpy as np

_DSIZE = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f64": 8}
_SHAPE_RE = re.compile(r"(f32|bf16|s32|pred|u32|f64)\[([0-9,]*)\]")
_OP_RE = re.compile(
    r"= [^=]*?\b(all-reduce|all-gather|reduce-scatter|"
    r"collective-permute|all-to-all)[.\w]*\("
)


def collect_collectives(hlo: str) -> dict:
    """Per-op {count, bytes, shapes} from optimized HLO text. An op's result
    can be a TUPLE of shapes (XLA fuses several reductions into one
    all-reduce): every typed shape on the defining line is counted."""
    by_op: dict = {}
    for line in hlo.splitlines():
        m = _OP_RE.search(line)
        if not m or "get-tuple-element" in line:
            continue
        op = m.group(1)
        lhs = line.split(f" {m.group(1)}")[0]
        rec = by_op.setdefault(op, {"count": 0, "bytes": 0, "shapes": []})
        rec["count"] += 1
        for sm in _SHAPE_RE.finditer(lhs):
            dt, dims = sm.group(1), sm.group(2)
            shape = [int(x) for x in dims.split(",") if x] or [1]
            rec["bytes"] += int(np.prod(shape)) * _DSIZE[dt]
            if len(rec["shapes"]) < 16:
                rec["shapes"].append(f"{dt}[{dims}]")
    return by_op


def all_reduce_bytes(by_op: dict) -> int:
    return sum(
        by_op.get(op, {}).get("bytes", 0)
        for op in ("all-reduce", "reduce-scatter")
    )
