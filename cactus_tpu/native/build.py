"""On-demand compilation + ctypes loading of the native graph kernels.

pybind11 isn't available in this image, so the C++ module is compiled to
a shared object with g++ on first use (cached by source hash under
~/.cache/cactus_tpu_native) and bound with ctypes over raw numpy
buffers.  Everything degrades gracefully: callers fall back to the
scipy/python paths when no compiler is present.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_SRCS = [os.path.join(os.path.dirname(__file__), f)
         for f in ("graphops.cpp", "pinchgraph.cpp", "dp.cpp")]
_LIB = None
_TRIED = False


def _compile() -> str | None:
    h = hashlib.sha256(
        b"".join(open(s, "rb").read() for s in _SRCS)).hexdigest()[:16]
    cache = os.path.join(os.path.expanduser("~/.cache/cactus_tpu_native"))
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"graphops_{h}.so")
    if os.path.exists(so):
        return so
    tmp = so + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           *_SRCS, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)
        return so
    except (subprocess.SubprocessError, OSError, FileNotFoundError):
        return None


def load():
    """The ctypes library, or None when compilation is unavailable."""
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        so = _compile()
        if so:
            lib = ctypes.CDLL(so)
            lib.cc_edges.restype = ctypes.c_int64
            lib.cc_edges.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_void_p]
            lib.spanning_forest.restype = None
            lib.spanning_forest.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                            ctypes.c_void_p, ctypes.c_void_p,
                                            ctypes.c_void_p, ctypes.c_void_p,
                                            ctypes.c_void_p, ctypes.c_void_p]
            lib.pg_create.restype = ctypes.c_void_p
            lib.pg_create.argtypes = [ctypes.c_int64, ctypes.c_void_p,
                                      ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_void_p]
            lib.pg_destroy.restype = None
            lib.pg_destroy.argtypes = [ctypes.c_void_p]
            lib.pg_set_filter_event.restype = None
            lib.pg_set_filter_event.argtypes = [ctypes.c_void_p,
                                                ctypes.c_int32]
            lib.pg_setup_hgvm.restype = None
            lib.pg_setup_hgvm.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
            lib.pg_pinch_batch.restype = None
            lib.pg_pinch_batch.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                           ctypes.c_void_p, ctypes.c_void_p,
                                           ctypes.c_void_p, ctypes.c_void_p,
                                           ctypes.c_void_p, ctypes.c_void_p,
                                           ctypes.c_int32, ctypes.c_int64]
            lib.pg_n_segments.restype = ctypes.c_int64
            lib.pg_n_segments.argtypes = [ctypes.c_void_p]
            lib.pg_n_blocks.restype = ctypes.c_int64
            lib.pg_n_blocks.argtypes = [ctypes.c_void_p]
            lib.pg_n_conflicts.restype = ctypes.c_int64
            lib.pg_n_conflicts.argtypes = [ctypes.c_void_p]
            lib.pg_export.restype = None
            lib.pg_export.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 6
            lib.dp_banded_batch.restype = None
            lib.dp_banded_batch.argtypes = [
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int32]
            lib.dp_hsp_filter.restype = None
            lib.dp_hsp_filter.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_int32]
            lib.dp_chain_extract.restype = ctypes.c_int64
            lib.dp_chain_extract.argtypes = [
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p]
            lib.dp_chain_batch.restype = None
            lib.dp_chain_batch.argtypes = [
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32]
            _LIB = lib
    return _LIB


def dp_banded_batch(pairs, submat: np.ndarray, gap_open: int,
                    gap_extend: int, bands: np.ndarray,
                    n_threads: int = 4):
    """Native banded affine alignment of [(q_codes, t_codes), ...].

    Returns (scores (P,) int32, moves uint8 buffer, moves_off (P+1,),
    n_moves (P,)) or None when the native library is unavailable.
    Bit-identical to ops/banded.py banded_align_batch + traceback_band.
    """
    lib = load()
    if lib is None:
        return None
    P = len(pairs)
    q_off = np.zeros(P + 1, np.int64)
    t_off = np.zeros(P + 1, np.int64)
    for i, (q, t) in enumerate(pairs):
        q_off[i + 1] = q_off[i] + len(q)
        t_off[i + 1] = t_off[i] + len(t)
    qcat = np.concatenate([np.ascontiguousarray(q, np.uint8)
                           for q, _ in pairs]) if P else np.zeros(0, np.uint8)
    tcat = np.concatenate([np.ascontiguousarray(t, np.uint8)
                           for _, t in pairs]) if P else np.zeros(0, np.uint8)
    caps = (q_off[1:] - q_off[:-1]) + (t_off[1:] - t_off[:-1])
    moves_off = np.zeros(P + 1, np.int64)
    np.cumsum(caps, out=moves_off[1:])
    moves = np.empty(int(moves_off[-1]), np.uint8)
    scores = np.empty(P, np.int32)
    n_moves = np.empty(P, np.int64)
    bands = np.ascontiguousarray(bands, np.int32)
    sm = np.ascontiguousarray(submat, np.int32)
    lib.dp_banded_batch(P, _ptr(qcat), _ptr(q_off), _ptr(tcat), _ptr(t_off),
                        _ptr(bands), _ptr(sm), gap_open, gap_extend,
                        _ptr(scores), _ptr(moves), _ptr(moves_off),
                        _ptr(n_moves), n_threads)
    return scores, moves, moves_off, n_moves


def dp_chain_batch(runs_list, gap_open: int, gap_extend: int, max_gap: int,
                   lookback: int, n_threads: int = 4):
    """Native chain scan over pre-sorted (qstart, tstart, len) run sets.

    Returns (scores, preds) per set (int32 arrays) or None when the
    native library is unavailable.  Bit-identical to _chain_scan.
    """
    lib = load()
    if lib is None:
        return None
    S = len(runs_list)
    off = np.zeros(S + 1, np.int64)
    for i, r in enumerate(runs_list):
        off[i + 1] = off[i] + len(r)
    n = int(off[-1])
    if n == 0:
        return [np.zeros(0, np.int32) for _ in runs_list], \
            [np.zeros(0, np.int32) for _ in runs_list]
    cat = np.concatenate([np.ascontiguousarray(r, np.int32).reshape(-1, 3)
                          for r in runs_list if len(r)])
    qs = np.ascontiguousarray(cat[:, 0])
    ts = np.ascontiguousarray(cat[:, 1])
    ln = np.ascontiguousarray(cat[:, 2])
    scores = np.empty(n, np.int32)
    preds = np.empty(n, np.int32)
    lib.dp_chain_batch(S, _ptr(off), _ptr(qs), _ptr(ts), _ptr(ln),
                       gap_open, gap_extend, max_gap, lookback,
                       _ptr(scores), _ptr(preds), n_threads)
    return ([scores[off[i]:off[i + 1]] for i in range(S)],
            [preds[off[i]:off[i + 1]] for i in range(S)])


def dp_hsp_filter(q: np.ndarray, t: np.ndarray, runs: np.ndarray,
                  match: int, mismatch: int, xdrop: int,
                  hsp_thresh: int, n_threads: int = 4):
    """Ungapped x-drop HSP filter over (qstart, tstart, len) runs.

    Returns a bool keep-mask, or None when the native library is
    unavailable (caller keeps all runs — the chain/emit score filters
    still apply, just slower)."""
    lib = load()
    if lib is None:
        return None
    r = np.ascontiguousarray(runs, np.int64)
    qs = np.ascontiguousarray(r[:, 0])
    ts = np.ascontiguousarray(r[:, 1])
    ln = np.ascontiguousarray(r[:, 2])
    q = np.ascontiguousarray(q, np.uint8)
    t = np.ascontiguousarray(t, np.uint8)
    keep = np.empty(len(r), np.uint8)
    lib.dp_hsp_filter(_ptr(q), len(q), _ptr(t), len(t), len(r),
                      _ptr(qs), _ptr(ts), _ptr(ln), match, mismatch,
                      xdrop, hsp_thresh, _ptr(keep), n_threads)
    return keep.astype(bool)


def dp_chain_extract(sorted_runs: np.ndarray, scores: np.ndarray,
                     preds: np.ndarray, min_score: int):
    """Native fused extract_chains + trim_chain_overlaps.

    sorted_runs: (n,3) runs in (qstart,tstart) sort order; scores/preds
    from the chain scan over that order.  Returns (runs_flat (R,3) int64,
    chain_off (C+1,) int64, chain_scores (C,) int32) with chains in
    descending-score order, or None when unavailable."""
    lib = load()
    if lib is None:
        return None
    n = len(sorted_runs)
    if n == 0:
        return (np.zeros((0, 3), np.int64), np.zeros(1, np.int64),
                np.zeros(0, np.int32))
    r = np.ascontiguousarray(sorted_runs, np.int32)
    qs = np.ascontiguousarray(r[:, 0])
    ts = np.ascontiguousarray(r[:, 1])
    ln = np.ascontiguousarray(r[:, 2])
    scores = np.ascontiguousarray(scores, np.int32)
    preds = np.ascontiguousarray(preds, np.int32)
    order_desc = np.ascontiguousarray(np.argsort(-scores, kind="stable"),
                                      np.int64)
    out_runs = np.empty((n, 3), np.int64)
    chain_off = np.empty(n + 1, np.int64)
    chain_score = np.empty(n, np.int32)
    c = lib.dp_chain_extract(n, _ptr(qs), _ptr(ts), _ptr(ln), _ptr(scores),
                             _ptr(preds), _ptr(order_desc), min_score,
                             _ptr(out_runs), _ptr(chain_off),
                             _ptr(chain_score))
    return (out_runs[:int(chain_off[c])], chain_off[:c + 1],
            chain_score[:c])


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def cc_edges(n_nodes: int, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Connected-component label per node (dense, deterministic order).

    Falls back to scipy when the native library is unavailable.
    """
    lib = load()
    u = np.ascontiguousarray(u, dtype=np.int64)
    v = np.ascontiguousarray(v, dtype=np.int64)
    if lib is not None:
        comp = np.empty(n_nodes, dtype=np.int64)
        lib.cc_edges(n_nodes, len(u), _ptr(u), _ptr(v), _ptr(comp))
        return comp
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components
    g = coo_matrix((np.ones(len(u), np.int8), (u, v)),
                   shape=(n_nodes, n_nodes))
    _n, comp = connected_components(g, directed=False)
    return comp.astype(np.int64)


def spanning_forest(n_nodes: int, u: np.ndarray, v: np.ndarray):
    """(is_tree, parent_node, parent_edge, order) arrays, or None if the
    native library is unavailable (caller uses its python fallback)."""
    lib = load()
    if lib is None:
        return None
    u = np.ascontiguousarray(u, dtype=np.int64)
    v = np.ascontiguousarray(v, dtype=np.int64)
    is_tree = np.zeros(len(u), dtype=np.uint8)
    parent_node = np.empty(n_nodes, dtype=np.int64)
    parent_edge = np.empty(n_nodes, dtype=np.int64)
    order = np.empty(n_nodes, dtype=np.int64)
    lib.spanning_forest(n_nodes, len(u), _ptr(u), _ptr(v), _ptr(is_tree),
                        _ptr(parent_node), _ptr(parent_edge), _ptr(order))
    return is_tree.astype(bool), parent_node, parent_edge, order
