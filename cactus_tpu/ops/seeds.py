"""Seed-table construction and k-mer join (lastz seeding equivalent).

Replaces lastz's seed stage (reference: submodule lastz; seeding step tuned
via --step in cactus_progressive_config.xml:130-137).  TPU-first design:
the join is sort + searchsorted + a vectorized "expand by rank" gather —
all static-shape XLA ops, so the same jitted function runs on CPU and TPU
and shards cleanly over a device mesh (one (query-chunk, target-chunk) tile
per device; see parallel/).

Outputs are fixed-capacity anchor tables (qpos, tpos) with a valid count,
the device-friendly analogue of lastz's variable-length seed-hit lists.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Hashes are int32: 2 bits/base, k <= 15 → < 2^30.  Sentinels are distinct
# values outside the real hash range (invalid kmers must never join).
INVALID_Q = np.int32((1 << 31) - 1)  # sorts after all real hashes
INVALID_T = np.int32(-1)             # sorts before all real hashes
MAX_K = 15


def kmer_hashes(codes, valid, k: int, step: int, pattern: str = ""):
    """Hash every (possibly spaced) seed at positions 0, step, 2*step, ...

    codes: (L,) uint8 base codes; valid: (L,) bool (False = N or masked).
    pattern: string of 1/0 — hash only the '1' positions over a window of
    len(pattern) (lastz-style spaced seeds, e.g. the 12-of-19
    '1110100110010101111'; empty = contiguous k-mer).  Returns (hashes
    (n,) int32 with sentinel for invalid, positions (n,) int32).  Static
    shapes for fixed L, k/pattern, step.
    """
    # pattern positions: '1' = full 2-bit care, 'T' = transition-tolerant
    # 1-bit care (purine/pyrimidine class — lastz's T seeds), '0' = skip
    care = ([(i, ch) for i, ch in enumerate(pattern) if ch in "1T"]
            if pattern else [(i, "1") for i in range(k)])
    span = len(pattern) if pattern else k
    bits = sum(2 if ch == "1" else 1 for _i, ch in care)
    if bits > 2 * MAX_K:
        raise ValueError(f"seed hash bits {bits} exceed {2 * MAX_K} "
                         "(int32 hash space)")
    L = codes.shape[0]
    n = max(0, (L - span) // step + 1)
    pos = jnp.arange(n, dtype=jnp.int32) * step
    h = jnp.zeros(n, dtype=jnp.int32)
    ok = jnp.ones(n, dtype=bool)
    for j, kind in care:
        c = jax.lax.dynamic_slice_in_dim(codes, j, L - span + 1, axis=0)
        v = jax.lax.dynamic_slice_in_dim(valid, j, L - span + 1, axis=0)
        cj = c[pos].astype(jnp.int32)
        if kind == "1":
            h = (h << 2) | jnp.where(cj > 3, 0, cj)
        else:
            h = (h << 1) | (jnp.where(cj > 3, 0, cj) & 1)
        ok = ok & v[pos] & (cj <= 3)
    return jnp.where(ok, h, INVALID_Q), pos


@partial(jax.jit, static_argnames=("k", "step", "max_occ", "max_anchors",
                                   "pattern"))
def seed_join(q_codes, q_valid, t_codes, t_valid,
              k: int = 15, step: int = 1, max_occ: int = 64,
              max_anchors: int = 1 << 20, pattern: str = ""):
    """All matching (qpos, tpos) k-mer pairs between query and target.

    Per-query-kmer hits are capped at `max_occ` (repeat guard, mirroring
    lastzRepeatMask's seed-count limiting; config XML :36) and the output is
    a fixed-capacity table.

    Returns (qpos (A,) int32, tpos (A,) int32, n_anchors () int32) where
    entries beyond n_anchors are -1.
    """
    qh, qpos = kmer_hashes(q_codes, q_valid, k, step, pattern)
    th, tpos = kmer_hashes(t_codes, t_valid, k, 1, pattern)
    th = jnp.where(th == INVALID_Q, INVALID_T, th)

    order = jnp.argsort(th)
    th_s = th[order]
    tpos_s = tpos[order]

    left = jnp.searchsorted(th_s, qh, side="left")
    right = jnp.searchsorted(th_s, qh, side="right")
    cnt = jnp.minimum(right - left, max_occ).astype(jnp.int32)
    cnt = jnp.where(qh == INVALID_Q, 0, cnt)

    ends = jnp.cumsum(cnt)                     # inclusive
    total = jnp.minimum(ends[-1] if cnt.shape[0] else 0, max_anchors)

    # expand-by-rank: slot s belongs to query kmer src(s); its rank within
    # that kmer's hit list is s - (ends[src] - cnt[src])
    slots = jnp.arange(max_anchors, dtype=jnp.int32)
    src = jnp.searchsorted(ends, slots, side="right").astype(jnp.int32)
    src_c = jnp.minimum(src, cnt.shape[0] - 1)
    rank = slots - (ends[src_c] - cnt[src_c])
    ok = slots < total
    out_q = jnp.where(ok, qpos[src_c], -1)
    out_t = jnp.where(ok, tpos_s[jnp.minimum(left[src_c] + rank,
                                             tpos_s.shape[0] - 1)], -1)
    out_t = jnp.where(ok, out_t, -1)
    return out_q, out_t, total.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "step", "max_occ", "max_anchors",
                                   "pattern"))
def seed_join_batch(q_codes, q_valid, t_codes, t_valid,
                    k: int = 15, step: int = 1, max_occ: int = 64,
                    max_anchors: int = 1 << 20, pattern: str = ""):
    """vmapped seed_join over a (B, L) task batch — ONE device dispatch
    for a whole shape bin of chunk-pair tasks (the single-chip analog
    of the mesh path's sharded join; amortizes link latency)."""
    fn = partial(seed_join, k=k, step=step, max_occ=max_occ,
                 max_anchors=max_anchors, pattern=pattern)
    return jax.vmap(fn)(q_codes, q_valid, t_codes, t_valid)


def merge_diagonal_runs(qpos: np.ndarray, tpos: np.ndarray, k: int,
                        max_gap: int = 0) -> np.ndarray:
    """Collapse seed hits into maximal runs on each diagonal (host, numpy).

    Hits on the same diagonal within `max_gap` of each other merge into one
    run.  Returns (R, 3) int64 array of (qstart, tstart, length); runs cover
    [qstart, qstart+length) x [tstart, tstart+length).
    """
    if len(qpos) == 0:
        return np.zeros((0, 3), dtype=np.int64)
    qpos = qpos.astype(np.int64)
    tpos = tpos.astype(np.int64)
    diag = tpos - qpos
    order = np.lexsort((qpos, diag))
    d, q = diag[order], qpos[order]
    new_run = np.ones(len(q), dtype=bool)
    new_run[1:] = (d[1:] != d[:-1]) | (q[1:] - q[:-1] > k + max_gap)
    starts = np.flatnonzero(new_run)
    ends = np.append(starts[1:], len(q)) - 1
    qstart = q[starts]
    qend = q[ends] + k
    dstart = d[starts]
    return np.stack([qstart, qstart + dstart, qend - qstart], axis=1)
