"""Broadcast-CSR numpy kernel for the per-edge graphlet counts.

This is the Spark analog of the reference's shared-memory fast path:
the whole (normalized) graph is small enough to broadcast, so every
executor holds the CSR arrays read-only and each Arrow batch of edges
is processed with vectorized numpy "mark" semantics identical to the
reference kernels:

  * triangles/wedges:  mark N(v)\\{u}, scan N(u)  (graphlet_core.cpp:1136-1152)
  * 4-clique:          adjacent pairs inside T_vu (graphlet_core.cpp:1230-1240)
  * 4-cycle:           adjacency between W_u and N(v)\\N(u)\\{u}
                       (graphlet_core.cpp:1167-1176)

The reference selects a dense-adjacency variant for small dense graphs
(cpp:602-611); here the CSR + int8 mark array covers both cases — the
mark array IS the perfect hash (cpp:1069-1088).

Per-edge outputs are exact and identical to the distributed path; the
choice is purely physical (see graphlets.edge_graphlet_counts).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd


def build_csr(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Canonical edges (numpy int64, src<dst) → (uniq_ids, indptr, indices).

    ``uniq_ids`` maps dense id → original id (sorted); ``indices`` holds
    dense neighbor ids, sorted within each vertex slice.
    """
    both = np.concatenate([src, dst])
    uniq, inv = np.unique(both, return_inverse=True)
    m = len(src)
    s, d = inv[:m], inv[m:]
    n = len(uniq)
    heads = np.concatenate([s, d])
    tails = np.concatenate([d, s])
    order = np.lexsort((tails, heads))
    indices = tails[order]
    deg = np.bincount(heads, minlength=n)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    # keep indices at intp width: numpy re-casts narrower index arrays
    # on every fancy-index, which costs more than the bandwidth saved
    return uniq, indptr, indices.astype(np.int64)


def _multi_slice_gather(indptr: np.ndarray, indices: np.ndarray, verts: np.ndarray) -> np.ndarray:
    """Concatenate neighbor slices of ``verts`` without a Python loop."""
    starts = indptr[verts]
    lens = (indptr[verts + 1] - starts).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=indices.dtype)
    # flat positions: for each vert k, starts[k] + 0..lens[k]-1
    rep_starts = np.repeat(starts, lens)
    offsets = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(lens) - lens, lens)
    return indices.take(rep_starts + offsets)


def edge_counts_batch(
    v_arr: np.ndarray,
    u_arr: np.ndarray,
    indptr: np.ndarray,
    indices: np.ndarray,
    n: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-edge (tri, cliq, cyc) for a batch of degree-oriented dense-id edges."""
    k = len(v_arr)
    tri_out = np.zeros(k, dtype=np.int64)
    cliq_out = np.zeros(k, dtype=np.int64)
    cyc_out = np.zeros(k, dtype=np.int64)
    ind = np.zeros(n, dtype=np.int8)
    for i in range(k):
        v = v_arr[i]
        u = u_arr[i]
        nv = indices[indptr[v] : indptr[v + 1]]
        nu = indices[indptr[u] : indptr[u + 1]]
        # mark N(v)\{u} with 1 (cpp:1069-1074)
        ind[nv] = 1
        ind[u] = 0
        # scan N(u)\{v}: marked → triangle node, else wedge node (cpp:1136-1152)
        nu_f = nu[nu != v]
        marks = ind[nu_f]
        T = nu_f[marks == 1]
        W = nu_f[marks != 1]
        tri_out[i] = len(T)
        ind[T] = 3
        ind[W] = 2
        # 4-cycles: adjacency between W_u (marks==2) and Wv = N(v)\N(u)\{u}
        # (marks==1).  Count from the Wv side: degree orientation makes
        # |Wv| = deg_v - tri - 1 <= |W_u|, so its neighbor volume is the
        # cheaper gather in expectation (the reference always scans W_u).
        if len(W):
            nv_f = nv[nv != u]
            Wv = nv_f[ind[nv_f] == 1]
            if len(Wv):
                flat_x = _multi_slice_gather(indptr, indices, Wv)
                cyc_out[i] = int((ind[flat_x] == 2).sum())
        # 4-cliques: ordered adjacent pairs within T → /2 (cpp:1230-1240 unmarks
        # progressively to count unordered; counting ordered and halving is equal)
        if len(T) > 1:
            flat_t = _multi_slice_gather(indptr, indices, T)
            cliq_out[i] = int((ind[flat_t] == 3).sum()) // 2
        # reset marks (cpp:1086-1088 resets N(v); W ⊂ N(u) was marked 2)
        ind[nv] = 0
        ind[W] = 0
    return tri_out, cliq_out, cyc_out


# per-worker CSR cache: python workers are reused across tasks, so the
# CSR is built once per worker (in parallel across the cluster) instead
# of once serially on the driver — the driver only broadcasts the raw
# edge arrays.
_CSR_CACHE: dict[str, tuple] = {}


def _oriented_state(src: np.ndarray, dst: np.ndarray):
    """CSR + degree-oriented dense edge arrays, built once per worker."""
    uniq, indptr, indices = build_csr(src, dst)
    deg = indptr[1:] - indptr[:-1]
    m = len(src)
    inv = np.searchsorted(uniq, np.concatenate([src, dst]))
    sd, dd = inv[:m], inv[m:]
    flip = (deg[dd] < deg[sd]) | ((deg[dd] == deg[sd]) & (dst < src))
    ov = np.where(flip, dd, sd)
    ou = np.where(flip, sd, dd)
    return uniq, indptr, indices, ov, ou, deg


_STATE_NAMES = ["uniq", "indptr", "indices", "ov", "ou", "deg"]


def _shared_state(token: str, bc_edges, wait_secs: float = 60.0):
    """Build-once-per-MACHINE CSR state, mmap'd read-only by every
    worker process.

    Each Python worker holding a private CSR copy multiplies the
    kernel's working set by the worker count and evicts it from the
    shared LLC (measured: census scaling collapsed once
    workers × CSR size outgrew L3).  Writing the arrays to tmpfs once
    and np.load(mmap_mode='r')-ing them gives all workers the same
    physical pages — on a real cluster this is one build per executor
    host instead of per core.
    """
    import glob
    import tempfile
    import time as _time

    tmp = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    base = os.path.join(tmp, f"pgd_csr_{token}")
    done = base + ".done"
    if not os.path.exists(done):
        try:
            os.mkdir(base + ".lock")  # atomic: first worker builds
            # GC stale states from earlier jobs
            now = _time.time()
            for old in glob.glob(os.path.join(tmp, "pgd_csr_*")):
                try:
                    if now - os.path.getmtime(old) > 3600:
                        os.remove(old) if os.path.isfile(old) else os.rmdir(old)
                except OSError:
                    pass
            src, dst = bc_edges.value
            state = _oriented_state(src, dst)
            for name, arr in zip(_STATE_NAMES, state):
                np.save(f"{base}.{name}.npy", arr)
            with open(done, "w") as f:
                f.write("ok")
            return state
        except FileExistsError:
            for _ in range(max(int(wait_secs / 0.1), 1)):
                if os.path.exists(done):
                    break
                _time.sleep(0.1)
            else:
                # builder still running after 60s (huge graph) or died
                # holding the lock: build privately from the broadcast —
                # correct, just loses the shared-pages optimization for
                # this worker.  Never np.load() without the done marker.
                src, dst = bc_edges.value
                return _oriented_state(src, dst)
    return tuple(
        np.load(f"{base}.{name}.npy", mmap_mode="r") for name in _STATE_NAMES
    )


def make_range_kernel(bc_edges, sample: tuple[int, int, int] | None = None):
    """mapInPandas over ``spark.range(m)``: workers slice the broadcast
    edge arrays by row id — no edge data moves through a shuffle at all.

    ``sample`` = (denom, limit, seed): keep edge iff
    mix64(v,u,seed) % denom < limit (the approximate-census filter),
    evaluated in numpy before any kernel work.
    """
    import uuid

    token = uuid.uuid4().hex

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = _CSR_CACHE.get(token)
        if state is None:
            state = _shared_state(token, bc_edges)
            _CSR_CACHE.clear()
            _CSR_CACHE[token] = state
        uniq, indptr, indices, ov, ou, deg = state
        n = len(uniq)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            idx = pdf["id"].to_numpy()
            v = ov[idx]
            u = ou[idx]
            if sample is not None:
                denom, limit, seed = sample
                h = (
                    uniq[v].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                    + uniq[u].astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
                    + np.uint64(seed)
                )
                keep = (h % np.uint64(denom)) < np.uint64(limit)
                v, u = v[keep], u[keep]
                if len(v) == 0:
                    continue
            tri, cliq, cyc = edge_counts_batch(v, u, indptr, indices, n)
            yield pd.DataFrame(
                {
                    "v": uniq[v],
                    "u": uniq[u],
                    "deg_v": deg[v].astype(np.int64),
                    "deg_u": deg[u].astype(np.int64),
                    "tri": tri,
                    "cliq": cliq,
                    "cyc": cyc,
                }
            )

    return fn
