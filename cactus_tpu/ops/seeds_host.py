"""Host-side (numpy) seed join with target-hash caching.

Why this exists: the device seed join (ops/seeds.py) is the right shape
for sharded multi-chip runs, but on a single chip behind a high-latency
link every per-task dispatch pays a full round trip (measured ~54 ms on
the loopback relay, ~80 MB/s effective bandwidth), and the XLA-CPU sort
is ~2x slower than numpy's.  For the swarm of sub-megabase chunk-pair
tasks the progressive driver produces, an exact numpy join — with the
target side hashed and sorted ONCE and reused across every query task,
strand, and outgroup-cascade tier that aligns to it — is strictly
faster and transfers zero bytes.

Semantics mirror ops/seeds.py:seed_join exactly (same hash, same
validity rules, same per-query-kmer max_occ cap over the stable-sorted
target list), so host and device paths produce identical anchor sets
(tests/test_blast.py oracle covers both).

Reference role: lastz seeding (submodule lastz; seed schemes at
cactus_progressive_config.xml:130-137).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_CARE_CACHE: dict[tuple[str, int], list[tuple[int, str]]] = {}


def _care_positions(pattern: str, k: int) -> list[tuple[int, str]]:
    key = (pattern, k)
    got = _CARE_CACHE.get(key)
    if got is None:
        got = ([(i, ch) for i, ch in enumerate(pattern) if ch in "1T"]
               if pattern else [(i, "1") for i in range(k)])
        _CARE_CACHE[key] = got
    return got


def hash_kmers(codes: np.ndarray, valid: np.ndarray | None, k: int,
               step: int, pattern: str = "", minimizer_w: int = 0):
    """Hashes + positions of every (spaced) seed; invalid seeds dropped.

    Returns (hashes (n,) int64, positions (n,) int64) — only VALID
    seeds, unlike the device path's fixed-shape sentinel encoding.

    minimizer_w > 0 selects (k, w) window minimizers instead of every
    seed (minimap2's sampling: per window of w consecutive seed starts,
    keep the one with the smallest mixed hash; ~2/(w+1) density).
    Applies after validity filtering, requires step == 1.
    """
    care = _care_positions(pattern, k)
    span = len(pattern) if pattern else k
    L = len(codes)
    n = max(0, (L - span) // step + 1)
    if n == 0:
        z = np.zeros(0, np.int64)
        return z, z
    pos = np.arange(n, dtype=np.int64) * step
    h = np.zeros(n, np.int64)
    ok = np.ones(n, bool)
    c64 = codes.astype(np.int64)
    for j, kind in care:
        cj = c64[j:j + L - span + 1][pos] if step > 1 else c64[j:j + n]
        if kind == "1":
            h = (h << 2) | np.where(cj > 3, 0, cj)
        else:
            h = (h << 1) | (np.where(cj > 3, 0, cj) & 1)
        ok &= cj <= 3
        if valid is not None:
            vj = valid[j:j + L - span + 1][pos] if step > 1 \
                else valid[j:j + n]
            ok &= vj
    h, pos = h[ok], pos[ok]
    if minimizer_w > 1 and len(h):
        assert step == 1, "minimizer sampling requires step == 1"
        keep = _minimizer_select(h, minimizer_w)
        h, pos = h[keep], pos[keep]
    return h, pos


def _mix64(h: np.ndarray) -> np.ndarray:
    """Invertible 64-bit finalizer (splitmix64 tail) so minimizer ranks
    spread uniformly — raw 2-bit-packed kmer values would bias
    minimizers toward poly-A."""
    z = h.astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return (z ^ (z >> np.uint64(31))).astype(np.int64) & ((1 << 62) - 1)


def _minimizer_select(h: np.ndarray, w: int) -> np.ndarray:
    """Indices of window minimizers over consecutive runs of seeds.

    Vectorized sliding-window argmin on the mixed ranks; ties keep the
    leftmost (minimap2 keeps all tied minimizers — leftmost is a
    deterministic subset with the same sampling guarantee)."""
    r = _mix64(h)
    n = len(r)
    if n <= w:
        return np.array([int(np.argmin(r))], np.int64)
    win = np.lib.stride_tricks.sliding_window_view(r, w)
    sel = win.argmin(axis=1) + np.arange(n - w + 1, dtype=np.int64)
    return np.unique(sel)


@dataclass
class HashedTarget:
    """Sorted target seed table, built once per (chunk, pattern)."""
    th_s: np.ndarray     # sorted hashes (int64)
    tpos_s: np.ndarray   # positions in stable-sorted order


def hash_target(codes: np.ndarray, valid: np.ndarray | None, k: int,
                pattern: str = "", minimizer_w: int = 0) -> HashedTarget:
    th, tpos = hash_kmers(codes, valid, k, step=1, pattern=pattern,
                          minimizer_w=minimizer_w)
    order = np.argsort(th, kind="stable")
    return HashedTarget(th[order], tpos[order])


def seed_join_host(q_codes: np.ndarray, q_valid: np.ndarray | None,
                   target: HashedTarget, k: int, step: int,
                   max_occ: int, pattern: str = "", minimizer_w: int = 0):
    """All matching (qpos, tpos) seed pairs; per-query-kmer hits capped
    at max_occ over the stable-sorted target order (identical cap choice
    to the device join)."""
    qh, qpos = hash_kmers(q_codes, q_valid, k, step, pattern,
                          minimizer_w=minimizer_w)
    if len(qh) == 0 or len(target.th_s) == 0:
        z = np.zeros(0, np.int64)
        return z, z
    left = np.searchsorted(target.th_s, qh, "left")
    right = np.searchsorted(target.th_s, qh, "right")
    cnt = np.minimum(right - left, max_occ).astype(np.int64)
    tot = int(cnt.sum())
    if tot == 0:
        z = np.zeros(0, np.int64)
        return z, z
    src = np.repeat(np.arange(len(qh)), cnt)
    rank = np.arange(tot, dtype=np.int64) \
        - np.repeat(np.cumsum(cnt) - cnt, cnt)
    return qpos[src], target.tpos_s[left[src] + rank]


class TargetCache:
    """Per-run cache of HashedTarget tables keyed by array identity.

    The blast phase aligns many queries (strands, cascade tiers,
    sibling children) against the same target chunks; hashing + sorting
    the target dominates join cost, so reuse is the main win."""

    def __init__(self, max_entries: int = 64):
        self._cache: dict[tuple, HashedTarget] = {}
        self.max_entries = max_entries

    def get(self, codes: np.ndarray, valid: np.ndarray | None, k: int,
            pattern: str, minimizer_w: int = 0) -> HashedTarget:
        key = (id(codes), None if valid is None else id(valid), k, pattern,
               minimizer_w)
        got = self._cache.get(key)
        if got is None:
            got = hash_target(codes, valid, k, pattern,
                              minimizer_w=minimizer_w)
            if len(self._cache) >= self.max_entries:
                self._cache.pop(next(iter(self._cache)))
            self._cache[key] = got
        return got
