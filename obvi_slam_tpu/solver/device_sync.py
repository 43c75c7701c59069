"""Device-resident session tables via row-level diff-sync.

The reference rebuilds its Ceres problem per frame and the first TPU design
mirrored that with a full host->device upload of every factor table, Schur
plan, and weight vector per window — through a ~4 MB/s tunnel that upload
dominated end-to-end time (r3: global-BA build phase 0.92 s mean on a
40-frame problem whose solve iterates at 3.7 ms).

``DeviceSync`` keeps one device-resident copy of each named array tree for
the whole session. Each solve, the host builder (``build_problem(...,
to_device=False)``) produces numpy arrays; ``sync`` diffs them row-wise
against the last synced host copy and uploads ONLY the changed rows — one
jitted scatter dispatch for the entire tree. Because global-BA factor tables
are append-only per frame (and ``row_registry`` pins features/objects to
first-appearance rows), steady-state uploads are ~the new frame's rows
(~100 KB) instead of the whole problem (MBs).

Correctness is unconditional: device content always equals the host arrays
after sync, whatever changed (capacity growth, merges, weight swaps all
degrade to bigger uploads, never wrong values).

Jit-signature stability: every same-shape leaf goes through the delta path
(changed rows bucketed to a per-leaf monotone power-of-two); a leaf is
fully re-transferred only when its shape/dtype changes (capacity growth),
which changes the jit signature anyway. Signatures therefore change O(log)
times per session, like the capacity pools.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import keystr, tree_flatten_with_path, tree_unflatten


@functools.partial(jax.jit, donate_argnums=(0,))
def _apply_updates(delta_devs: list, idxs: list, vals: list, fulls: list):
    """One dispatch: scatter changed rows into the donated device buffers and
    transfer the full replacements. Padding rows in ``idxs`` point at row 0
    with row 0's (current) value — an idempotent write."""
    updated = [d.at[i].set(v) for d, i, v in zip(delta_devs, idxs, vals)]
    return updated, [jnp.asarray(f) for f in fulls]


class DeviceSync:
    """Per-session device mirror of named array pytrees (one instance per
    caps pool / solve class)."""

    def __init__(self, device=None):
        self.device = device
        self._host: Dict[str, np.ndarray] = {}
        self._dev: Dict[str, jax.Array] = {}
        self._bucket: Dict[str, int] = {}
        self.total_bytes = 0
        self.last_bytes = 0
        self.n_syncs = 0
        # Per-sync detail of the most recent call: leaf -> (mode, bytes).
        self.last_detail: Dict[str, Tuple[str, int]] = {}

    # ------------------------------------------------------------------
    def _bucket_for(self, key: str, n: int, commit: bool = True) -> int:
        # Coarse (x4) monotone buckets: the jitted update's signature is the
        # tuple of every leaf's bucket, so each growth step is a retrace —
        # 16*4^k keeps that to <=8 steps per leaf and in practice a handful
        # of signatures per session (analogous to the solver caps pools).
        # ``commit=False`` probes without growing the stored bucket (a
        # change that ends up on the full path must not inflate future
        # delta paddings).
        b = self._bucket.get(key, 16)
        while b < n:
            b *= 4
        if commit:
            self._bucket[key] = b
        return b

    @staticmethod
    def _changed_rows(new: np.ndarray, old: np.ndarray) -> np.ndarray:
        cmp = new != old
        if cmp.ndim > 1:
            cmp = cmp.any(axis=tuple(range(1, cmp.ndim)))
        return np.flatnonzero(cmp)

    # ------------------------------------------------------------------
    def sync(self, name: str, tree):
        """Return ``tree`` with every array leaf replaced by its
        device-resident copy, after uploading only changed rows."""
        leaves, treedef = tree_flatten_with_path(tree)
        self.last_detail = {}
        bytes_up = 0

        plan: List[Tuple[str, str, np.ndarray]] = []  # (mode, key, host)
        delta_devs, idxs, vals, fulls = [], [], [], []
        delta_keys, full_keys = [], []
        out_slots: List[Tuple[str, object]] = []  # (mode, payload)

        for path, leaf in leaves:
            key = name + keystr(path)
            h = np.asarray(leaf)
            cached = self._host.get(key)
            dev = self._dev.get(key)
            if (
                cached is None
                or dev is None
                or cached.shape != h.shape
                or cached.dtype != h.dtype
                or h.ndim == 0
                or h.shape[0] == 0
            ):
                mode = "full"
            else:
                rows = self._changed_rows(h, cached)
                if len(rows) == 0:
                    mode = "reuse"
                else:
                    # Delta only when it actually saves bytes (bucketed idx +
                    # changed rows vs the whole array) — sliding-window pools
                    # whose every row shifts then take the plain full path.
                    cap = self._bucket_for(key, len(rows), commit=False)
                    row_bytes = h.nbytes // h.shape[0]
                    if cap * (4 + row_bytes) >= h.nbytes:
                        mode = "full"
                    else:
                        mode = "delta"
            if mode == "reuse":
                out_slots.append(("reuse", dev))
                self.last_detail[key] = ("reuse", 0)
            elif mode == "delta":
                cap = self._bucket_for(key, len(rows))
                idx = np.zeros(cap, dtype=np.int32)
                idx[: len(rows)] = rows
                v = np.empty((cap,) + h.shape[1:], dtype=h.dtype)
                v[: len(rows)] = h[rows]
                v[len(rows) :] = h[0]  # idempotent padding writes to row 0
                delta_devs.append(dev)
                idxs.append(idx)
                vals.append(v)
                delta_keys.append(key)
                out_slots.append(("delta", len(delta_devs) - 1))
                nb = idx.nbytes + v.nbytes
                bytes_up += nb
                self.last_detail[key] = ("delta", nb)
            else:
                fulls.append(h)
                full_keys.append(key)
                out_slots.append(("full", len(fulls) - 1))
                bytes_up += h.nbytes
                self.last_detail[key] = ("full", h.nbytes)
            self._host[key] = h

        if delta_devs or fulls:
            updated, full_devs = _apply_updates(delta_devs, idxs, vals, fulls)
            for k, d in zip(delta_keys, updated):
                self._dev[k] = d
            for k, d in zip(full_keys, full_devs):
                self._dev[k] = d
        else:
            updated, full_devs = [], []

        out_leaves = []
        for mode, payload in out_slots:
            if mode == "reuse":
                out_leaves.append(payload)
            elif mode == "delta":
                out_leaves.append(updated[payload])
            else:
                out_leaves.append(full_devs[payload])

        self.last_bytes = bytes_up
        self.total_bytes += bytes_up
        self.n_syncs += 1
        return tree_unflatten(treedef, out_leaves)

    # ------------------------------------------------------------------
    def adopt(self, name: str, dev_tree, host_tree):
        """Update the cache for a subtree whose values are ALREADY on device
        (e.g. the solved state after write_back): the next sync's diff then
        sees only externally changed rows instead of every row the solver
        moved. ``name`` must include the subtree's position in the synced
        tree's key space (e.g. ``"global[0]"`` for element 0 of a synced
        tuple)."""
        dev_leaves, _ = tree_flatten_with_path(dev_tree)
        host_leaves, _ = tree_flatten_with_path(host_tree)
        for (path, d), (_, h) in zip(dev_leaves, host_leaves):
            key = name + keystr(path)
            self._host[key] = np.asarray(h)
            self._dev[key] = d
