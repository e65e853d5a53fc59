"""Collinear anchor chaining (paffy chain equivalent).

Reference semantics: `paffy chain` scores chains of local alignments with an
affine gap cost (chainGapOpen=5000, chainGapExtend=1, chainMaxGapLength=1e6;
cactus_progressive_config.xml:108-113), driven per contig pair from
src/cactus/paf/local_alignment.py:660-727.

TPU-first design: the DP is a `lax.scan` over anchors sorted by query start,
with a fixed-size ring buffer of the last `lookback` candidates — each scan
step is a vectorized max over the buffer, so the whole chain DP is one
compiled program with static shapes.  Chain extraction (backpointer walks)
stays on the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# int32 throughout (JAX x64 is off): positions/scores valid to ~2.1e9,
# i.e. contigs up to 2 Gb — same practical limit as int32-based aligners.
NEG = -(1 << 30)


@partial(jax.jit, static_argnames=("lookback",))
def _chain_scan(qs, ts, ln, gap_open, gap_extend, max_gap, lookback: int):
    n = qs.shape[0]
    L = lookback

    def step(carry, x):
        b_q, b_t, b_qe, b_te, b_score, b_idx, i = carry
        q, t, l = x
        qg = q - b_qe
        tg = t - b_te
        dd = jnp.abs((t - q) - (b_t - b_q))
        ok = ((b_q < q) & (b_t < t) & (b_idx >= 0)
              & (qg <= max_gap) & (tg <= max_gap))
        # gap cost: open+extend*dd charged only on diagonal shifts (indels);
        # plus a mild distance decay so nearby predecessors win ties
        gapdist = jnp.maximum(jnp.maximum(qg, 0), jnp.maximum(tg, 0))
        cost = (jnp.where(dd != 0, gap_open + gap_extend * dd, 0)
                + gapdist // 64)
        cand = jnp.where(ok, b_score - cost, NEG)
        best = jnp.max(cand)
        best_j = jnp.where(best > 0, b_idx[jnp.argmax(cand)], -1)
        score = l + jnp.maximum(best, 0)
        # rotate ring buffer
        slot = i % L
        b_q = b_q.at[slot].set(q)
        b_t = b_t.at[slot].set(t)
        b_qe = b_qe.at[slot].set(q + l)
        b_te = b_te.at[slot].set(t + l)
        b_score = b_score.at[slot].set(score)
        b_idx = b_idx.at[slot].set(i)
        return (b_q, b_t, b_qe, b_te, b_score, b_idx, i + 1), (score, best_j)

    init = (jnp.zeros(L, jnp.int32), jnp.zeros(L, jnp.int32),
            jnp.zeros(L, jnp.int32), jnp.zeros(L, jnp.int32),
            jnp.full(L, NEG, jnp.int32), jnp.full(L, -1, jnp.int32),
            jnp.int32(0))
    _, (scores, preds) = jax.lax.scan(step, init, (qs, ts, ln))
    return scores, preds


_PAD_POS = 1 << 29     # beyond any real coordinate; padded anchors can
                       # never satisfy the max_gap predicate, so they
                       # score 0 with pred -1 and are sliced off


def _pad_sorted_runs(r: np.ndarray, min_len: int = 16) -> np.ndarray:
    n = max(min_len, 1 << (max(1, len(r)) - 1).bit_length())
    if n == len(r):
        return r
    out = np.full((n, 3), _PAD_POS, dtype=np.int32)
    out[:, 2] = 0
    out[:len(r)] = r
    return out


def chain_anchors(runs: np.ndarray, gap_open: int = 20, gap_extend: int = 1,
                  max_gap: int = 8192, lookback: int = 64):
    """Chain (qstart, tstart, length) runs; returns (order, scores, preds).

    `order` sorts runs by (qstart, tstart); scores/preds are in sorted order
    and preds index into the sorted order (-1 = chain start).
    """
    if len(runs) == 0:
        return (np.zeros(0, np.int64),) * 3
    order = np.lexsort((runs[:, 1], runs[:, 0]))
    from ..native import build as native
    nat = native.dp_chain_batch([runs[order].astype(np.int32)],
                                gap_open, gap_extend, max_gap, lookback)
    if nat is not None:
        return order, nat[0][0], nat[1][0]
    r = _pad_sorted_runs(runs[order].astype(np.int32))
    from . import smart_put
    put = smart_put(len(r) * lookback)
    scores, preds = _chain_scan(
        put(r[:, 0]), put(r[:, 1]), put(r[:, 2]),
        gap_open, gap_extend, max_gap, lookback)
    n = len(order)
    return order, np.asarray(scores)[:n], np.asarray(preds)[:n]


@partial(jax.jit, static_argnames=("lookback",))
def _chain_scan_batch(qs, ts, ln, gap_open, gap_extend, max_gap,
                      lookback: int):
    return jax.vmap(
        lambda q, t, l: _chain_scan.__wrapped__(
            q, t, l, gap_open, gap_extend, max_gap, lookback)
    )(qs, ts, ln)


def chain_anchors_batch(runs_list: list[np.ndarray], gap_open: int = 20,
                        gap_extend: int = 1, max_gap: int = 8192,
                        lookback: int = 64) -> list[tuple]:
    """Batched chain_anchors over many anchor sets.

    Tasks are pow2-pad-binned and each bin runs as ONE vmapped scan
    dispatch — amortizing device latency and bounding XLA recompiles to
    O(log max_n) shapes instead of one per distinct anchor count.
    Returns [(order, scores, preds), ...] matching runs_list order.
    """
    out: list = [None] * len(runs_list)
    bins: dict[int, list[int]] = {}
    padded: list = [None] * len(runs_list)
    orders: list = [None] * len(runs_list)
    nonempty: list[int] = []
    for i, runs in enumerate(runs_list):
        if len(runs) == 0:
            out[i] = (np.zeros(0, np.int64),) * 3
            continue
        orders[i] = np.lexsort((runs[:, 1], runs[:, 0]))
        nonempty.append(i)
    # native C++ scan: threaded, zero dispatch latency, bit-identical
    from ..native import build as native
    nat = native.dp_chain_batch(
        [runs_list[i][orders[i]].astype(np.int32) for i in nonempty],
        gap_open, gap_extend, max_gap, lookback)
    if nat is not None:
        for row, i in enumerate(nonempty):
            out[i] = (orders[i], nat[0][row], nat[1][row])
        return out
    for i in nonempty:
        r = _pad_sorted_runs(runs_list[i][orders[i]].astype(np.int32))
        padded[i] = r
        bins.setdefault(len(r), []).append(i)
    from . import smart_put
    for L, idxs in bins.items():
        stack = np.stack([padded[i] for i in idxs])
        put = smart_put(len(idxs) * L * lookback)
        scores, preds = _chain_scan_batch(
            put(stack[:, :, 0]), put(stack[:, :, 1]), put(stack[:, :, 2]),
            gap_open, gap_extend, max_gap, lookback)
        scores = np.asarray(scores)
        preds = np.asarray(preds)
        for row, i in enumerate(idxs):
            n = len(orders[i])
            out[i] = (orders[i], scores[row, :n], preds[row, :n])
    return out


def extract_chains(runs: np.ndarray, order: np.ndarray, scores: np.ndarray,
                   preds: np.ndarray, min_score: int = 0,
                   min_run_score: int | None = None) -> list[dict]:
    """Greedy best-first chain extraction with used-anchor exclusion.

    Returns a list of {"runs": (m,3) array, "score": int} sorted by
    descending score.  Each anchor joins at most one chain (mirrors the
    single-use semantics of paffy chain output records).
    """
    n = len(order)
    used = np.zeros(n, dtype=bool)
    chains = []
    for i in np.argsort(-scores):
        if used[i] or scores[i] < min_score:
            continue
        idxs = []
        j = i
        while j >= 0 and not used[j]:
            idxs.append(j)
            used[j] = True
            j = preds[j]
        idxs = idxs[::-1]
        chain_runs = runs[order[idxs]]
        chains.append({"runs": chain_runs, "score": int(scores[i])})
    chains.sort(key=lambda c: -c["score"])
    return chains


def trim_chain_overlaps(chain_runs: np.ndarray) -> np.ndarray:
    """Trim successive runs so q and t intervals are strictly increasing
    and non-overlapping (overlap shaved off the later run)."""
    out = []
    prev_qe = prev_te = -(1 << 62)
    for qs, ts, ln in chain_runs:
        cut = max(prev_qe - qs, prev_te - ts, 0)
        if cut >= ln:
            continue
        qs, ts, ln = qs + cut, ts + cut, ln - cut
        out.append((qs, ts, ln))
        prev_qe, prev_te = qs + ln, ts + ln
    return np.array(out, dtype=np.int64).reshape(-1, 3)
