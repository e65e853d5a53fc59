"""Batched banded pair-HMM forward/backward posteriors (cPecan analog).

Replaces cPecan's pairwise-HMM posterior aligner (reference: submodule
cPecan, pairwiseAligner.h; consumed by the BAR pecan path at
bar/impl/bar.c:65 with banding params cactus_progressive_config.xml:
276-280).  The reference runs a fiveState log-space HMM; here a
three-state (match M / insert X / delete Y) HMM runs in SCALED LINEAR
space — per-row renormalization replaces log-sum-exp, so every cell is
pure float32 multiply-add on the VPU with no transcendentals in the hot
loop.  X consumes query, Y consumes target; Y's in-row chain is a
first-order linear recurrence solved with a Kogge-Stone scan.

Band geometry is shared with ops/banded.py (host-shifted targets,
j = i + lo + b).  Outputs are match-state posteriors per band cell;
aligned pairs come from thresholding (posteriorGamma) with per-row
argmax — a maximum-expected-accuracy approximation.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

TINY = 1e-30
# widest band the fused Pallas posterior kernels compile at (v5e scoped
# vmem is 16 MB; band 4096 needs a 20 MB stack slab) — wider bands run
# through the XLA scan backends
MAX_PALLAS_BAND = 2048


@dataclass(frozen=True)
class HmmParams:
    """Three-state pair-HMM (symmetric gaps).

    delta: gap open; epsilon: gap extend; p_match: same-base emission
    probability under M (rest spread over mismatches); gap states emit
    uniformly.  Emissions are odds ratios vs the null (keeps scaled
    linear-space values near 1).
    """
    delta: float = 0.025
    epsilon: float = 0.79
    p_match: float = 0.94

    def emissions(self) -> np.ndarray:
        e = np.full((6, 6), (1.0 - self.p_match) / 3.0, dtype=np.float32)
        np.fill_diagonal(e[:4, :4], self.p_match)
        e[4:, :] = 1.0 / 16.0
        e[:, 4:] = 1.0 / 16.0
        return e * 16.0


# --------------------------------------------------------------------------
# numpy oracle (full matrix)
# --------------------------------------------------------------------------

def posterior_np(q: np.ndarray, t: np.ndarray, p: HmmParams) -> np.ndarray:
    """Full O(MN) match-state posterior matrix. Test oracle only."""
    M, N = len(q), len(t)
    d, e = p.delta, p.epsilon
    tMM = 1 - 2 * d
    em = p.emissions()
    fM = np.zeros((M + 1, N + 1))
    fX = np.zeros((M + 1, N + 1))
    fY = np.zeros((M + 1, N + 1))
    fM[0, 0] = 1.0
    for i in range(M + 1):
        for j in range(N + 1):
            if i > 0 and j > 0:
                fM[i, j] = em[q[i - 1], t[j - 1]] * (
                    tMM * fM[i - 1, j - 1]
                    + (1 - e) * (fX[i - 1, j - 1] + fY[i - 1, j - 1]))
            if i > 0:
                fX[i, j] += d * fM[i - 1, j] + e * fX[i - 1, j]
            if j > 0:
                fY[i, j] += d * fM[i, j - 1] + e * fY[i, j - 1]
    Z = fM[M, N] + fX[M, N] + fY[M, N]
    bM = np.zeros((M + 1, N + 1))
    bX = np.zeros((M + 1, N + 1))
    bY = np.zeros((M + 1, N + 1))
    bM[M, N] = bX[M, N] = bY[M, N] = 1.0
    for i in range(M, -1, -1):
        for j in range(N, -1, -1):
            if i == M and j == N:
                continue
            mm = (em[q[i], t[j]] * bM[i + 1, j + 1]
                  if (i < M and j < N) else 0.0)
            x = bX[i + 1, j] if i < M else 0.0
            y = bY[i, j + 1] if j < N else 0.0
            bM[i, j] = tMM * mm + d * x + d * y
            bX[i, j] = (1 - e) * mm + e * x
            bY[i, j] = (1 - e) * mm + e * y
    post = np.zeros((M, N))
    for i in range(1, M + 1):
        for j in range(1, N + 1):
            post[i - 1, j - 1] = fM[i, j] * bM[i, j] / max(Z, TINY)
    return post


# --------------------------------------------------------------------------
# batched banded forward/backward (XLA scan)
# --------------------------------------------------------------------------

def _chain_fwd(s, e, P, B):
    """Solve y[b] = s[b] + e*y[b-1] along lanes (Kogge-Stone)."""
    y = s
    f = jnp.full((P, B), e, jnp.float32)
    off = 1
    while off < B:
        y = y + f * jnp.concatenate(
            [jnp.zeros((P, off), jnp.float32), y[:, :-off]], axis=1)
        f = f * jnp.concatenate(
            [jnp.zeros((P, off), jnp.float32), f[:, :-off]], axis=1)
        off *= 2
    return y


def _chain_bwd(s, e, P, B):
    """Solve y[b] = s[b] + e*y[b+1] along lanes (reverse Kogge-Stone)."""
    y = s
    f = jnp.full((P, B), e, jnp.float32)
    off = 1
    while off < B:
        y = y + f * jnp.concatenate(
            [y[:, off:], jnp.zeros((P, off), jnp.float32)], axis=1)
        f = f * jnp.concatenate(
            [f[:, off:], jnp.zeros((P, off), jnp.float32)], axis=1)
        off *= 2
    return y


@partial(jax.jit, static_argnames=("band", "delta", "epsilon"))
def posterior_banded_batch(q, t_shift, m_len, n_len, lo, em,
                           band: int, delta: float, epsilon: float):
    """Match posteriors over the band for a batch of pairs.

    Returns post (P, Mmax, B) float32: posterior that q[i-1] aligns to
    t[j-1] (band cell (i, b), j = i + lo + b), rows beyond each pair's
    m_len are zero.
    """
    P, Mmax = q.shape
    B = band
    d, e = delta, epsilon
    tMM = 1.0 - 2.0 * d
    em = em.astype(jnp.float32)
    b_idx = jnp.arange(B, dtype=jnp.int32)[None, :]
    lo_c = lo[:, None].astype(jnp.int32)
    m_c = m_len[:, None].astype(jnp.int32)
    n_c = n_len[:, None].astype(jnp.int32)

    def sl(x):  # x[b] ← x[b+1]
        return jnp.concatenate([x[:, 1:], jnp.zeros((P, 1), x.dtype)], 1)

    def sr(x):  # x[b] ← x[b-1]
        return jnp.concatenate([jnp.zeros((P, 1), x.dtype), x[:, :-1]], 1)

    # ---- forward ----
    j0 = lo_c + b_idx
    fM0 = jnp.where(j0 == 0, 1.0, 0.0).astype(jnp.float32)
    fY0 = jnp.where((j0 >= 1) & (j0 <= n_c),
                    d * e ** jnp.maximum(j0 - 1, 0), 0.0).astype(jnp.float32)
    fX0 = jnp.zeros((P, B), jnp.float32)

    def fwd_step(carry, i):
        fM, fX, fY, ls = carry
        qc = jax.lax.dynamic_slice_in_dim(q, i - 1, 1, axis=1)
        tc = jax.lax.dynamic_slice_in_dim(t_shift, i - 1, B, axis=1)
        emit = em[qc.astype(jnp.int32), tc.astype(jnp.int32)]
        j = i + lo_c + b_idx
        ok = (j >= 1) & (j <= n_c) & (i <= m_c)
        mM = emit * (tMM * fM + (1 - e) * (fX + fY))
        mM = jnp.where(ok, mM, 0.0)
        mX = d * sl(fM) + e * sl(fX)
        mX = jnp.where((j >= 0) & (j <= n_c) & (i <= m_c), mX, 0.0)
        mY = _chain_fwd(d * sr(mM), e, P, B)
        mY = jnp.where(ok, mY, 0.0)
        scale = jnp.maximum(jnp.max(mM + mX + mY, axis=1, keepdims=True),
                            TINY)
        nM, nX, nY = mM / scale, mX / scale, mY / scale
        ls = ls + jnp.log(scale[:, 0])
        return (nM, nX, nY, ls), (nM, nX + nY, ls)

    init = (fM0, fX0, fY0, jnp.zeros(P, jnp.float32))
    _last, (fM_rows, fXY_rows, lsF_rows) = jax.lax.scan(
        fwd_step, init, jnp.arange(1, Mmax + 1))
    fM_rows = jnp.transpose(fM_rows, (1, 0, 2))      # (P, Mmax, B), row i=1..
    fXY_rows = jnp.transpose(fXY_rows, (1, 0, 2))
    lsF_rows = jnp.transpose(lsF_rows, (1, 0))       # (P, Mmax)

    # logZ from the end cell of each pair
    b_end = (n_len - m_len - lo).astype(jnp.int32)
    rows = jnp.maximum(m_len.astype(jnp.int32) - 1, 0)
    end_tot = (jnp.take_along_axis(
        jnp.take_along_axis(fM_rows + fXY_rows, rows[:, None, None],
                            axis=1)[:, 0], b_end[:, None], axis=1)[:, 0])
    end_ls = jnp.take_along_axis(lsF_rows, rows[:, None], axis=1)[:, 0]
    logZ = jnp.log(jnp.maximum(end_tot, TINY)) + end_ls

    # ---- backward ----
    def terminal_row(i):
        """Backward values for row i == m_len (per pair)."""
        j = i + lo_c + b_idx
        jn = n_c - j
        at_end = jn == 0
        before = (jn > 0)
        y = jnp.where(at_end, 1.0, jnp.where(
            before, e ** jnp.maximum(jn, 0), 0.0)).astype(jnp.float32)
        bm = jnp.where(at_end, 1.0, jnp.where(
            before, d * e ** jnp.maximum(jn - 1, 0), 0.0)).astype(jnp.float32)
        bx = jnp.where(at_end, 1.0, 0.0).astype(jnp.float32)
        return bm, bx, y

    def bwd_step(carry, i):
        bM, bX, bY, ls = carry
        # reset pairs whose terminal row is i
        is_term = (m_c == i)
        tm, tx, ty = terminal_row(i)
        bM = jnp.where(is_term, tm, bM)
        bX = jnp.where(is_term, tx, bX)
        bY = jnp.where(is_term, ty, bY)
        ls = jnp.where(is_term[:, 0], 0.0, ls)
        # carry now holds row i values; emit them, then compute row i-1
        out = (bM, ls)
        qc = jax.lax.dynamic_slice_in_dim(q, i - 1, 1, axis=1)  # q[i-1]=row i
        tc = jax.lax.dynamic_slice_in_dim(t_shift, i - 1, B, axis=1)
        emit = em[qc.astype(jnp.int32), tc.astype(jnp.int32)]
        jprev = (i - 1) + lo_c + b_idx       # j of row i-1 cells
        # M/X/Y at (i-1, j): mm move lands on (i, j+1) = band b of row i
        mm = emit * bM
        mm = jnp.where((jprev + 1 <= n_c) & (i <= m_c), mm, 0.0)
        x = sr(bX)                            # (i, j) = band b-1 of row i
        x = jnp.where((jprev >= 0) & (jprev <= n_c) & (i <= m_c), x, 0.0)
        nX = (1 - e) * mm + e * x
        y = _chain_bwd((1 - e) * mm, e, P, B)
        nM = tMM * mm + d * x + d * sl(y)
        nY = y
        okp = (jprev >= 0) & (jprev <= n_c)
        nM = jnp.where(okp, nM, 0.0)
        nX = jnp.where(okp, nX, 0.0)
        nY = jnp.where(okp, nY, 0.0)
        scale = jnp.maximum(jnp.max(nM + nX + nY, axis=1, keepdims=True),
                            TINY)
        nM, nX, nY = nM / scale, nX / scale, nY / scale
        # pairs at/above their terminal keep the reset (no scale growth
        # before their terminal row); others accumulate
        ls2 = ls + jnp.where(i <= m_c[:, 0], jnp.log(scale[:, 0]), 0.0)
        nM = jnp.where(i <= m_c, nM, bM)
        nX = jnp.where(i <= m_c, nX, bX)
        nY = jnp.where(i <= m_c, nY, bY)
        ls2 = jnp.where(i <= m_c[:, 0], ls2, ls)
        return (nM, nX, nY, ls2), out

    initb = (jnp.zeros((P, B), jnp.float32), jnp.zeros((P, B), jnp.float32),
             jnp.zeros((P, B), jnp.float32), jnp.zeros(P, jnp.float32))
    _lastb, (bM_rows, lsB_rows) = jax.lax.scan(
        bwd_step, initb, jnp.arange(Mmax, 0, -1))
    bM_rows = jnp.transpose(bM_rows, (1, 0, 2))[:, ::-1]   # row i=1..Mmax
    lsB_rows = jnp.transpose(lsB_rows, (1, 0))[:, ::-1]

    post = fM_rows * bM_rows * jnp.exp(
        jnp.clip(lsF_rows + lsB_rows - logZ[:, None], -60.0, 60.0)
    )[:, :, None]
    # zero rows beyond each pair's length
    row_ids = jnp.arange(1, Mmax + 1)[None, :, None]
    post = jnp.where(row_ids <= m_len[:, None, None], post, 0.0)
    return jnp.clip(post, 0.0, 1.5)


def posterior_default_backend():
    """Fused Pallas kernel on TPU (hardware-validated 2026-08-19 on a
    v5e: max posterior diff vs the XLA scan 2.1e-3, 4.69 Gcells/s vs
    0.22; opt-out via CACTUS_PAIRHMM_PALLAS=0), XLA scan elsewhere."""
    import os

    if (jax.devices()[0].platform == "tpu"
            and os.environ.get("CACTUS_PAIRHMM_PALLAS", "1") == "1"):
        from .pairhmm_pallas import posterior_banded_batch_pallas
        dev = jax.devices()[0]

        import os as _os
        pallas_band_cap = int(_os.environ.get(
            "CACTUS_PAIRHMM_PALLAS_BAND_CAP", "1024"))

        def run(q, t_shift, m_len, n_len, lo, em, **kw):
            if kw.get("band", 0) > pallas_band_cap:
                # the fused kernel's Mosaic per-step stack exceeds the
                # 16 MB scoped-vmem limit at wide bands (measured on a
                # v5e terminal: (64, 4096, 2048) fails AOT compile with
                # a 16.5 MB stack — it sank a 5-way scale run mid-
                # round-5 — and band 4096 needs 20 MB) — route wide
                # bands to the XLA scan, which is slower but compiles
                # at any shape
                return posterior_banded_batch(q, t_shift, m_len, n_len,
                                              lo, em, **kw)
            # callers may have committed inputs to host CPU (smart_put);
            # the Pallas kernel only lowers on the TPU device
            put = lambda x: jax.device_put(x, dev)
            return posterior_banded_batch_pallas(
                put(q), put(t_shift), put(m_len), put(n_len), put(lo),
                put(em), **kw)
        return run
    return posterior_banded_batch


@jax.jit
def _row_argmax(post):
    """Device-side per-row band reduction: (P, Mmax, B) → argmax + max.

    The posterior tensor itself can be tens of GB for a genome-scale
    batch; fetching it over a remote-tunnel link was 90% of the 600 kb
    gate wall (round-4 profile).  Only the consumed (P, Mmax) argmax /
    max rows ever leave the device."""
    return (jnp.argmax(post, axis=2).astype(jnp.int32),
            jnp.max(post, axis=2))


def length_bins(pairs, min_rows: int = 256) -> dict[int, list[int]]:
    """Pair indices grouped by pow2 query-length bins.

    pack_band_batch pads every pair in a batch to the longest query's
    pow2 row count, so one flat batch with a wide length spread wastes
    rows quadratically (measured: the nested-refinement seedless batch
    at the 600 kb gate spent ~240 s of device time, most of it padding).
    Binning by pow2 length bounds padding waste at 2x per bin.
    """
    bins: dict[int, list[int]] = {}
    for i, (q, _t) in enumerate(pairs):
        b = max(min_rows, 1 << (max(1, len(q)) - 1).bit_length())
        bins.setdefault(b, []).append(i)
    return bins


def posterior_pairs_banded(pairs, params: HmmParams, band: int = 128,
                           gamma: float = 0.5, min_batch: int = 8,
                           min_rows_bin: int = 256, max_batch: int = 0):
    """Aligned (qpos, tpos, posterior) per pair via the batched kernel.

    Pairs are dispatched in pow2 query-length bins (see length_bins).
    min_batch floors (and max_batch>0 caps, by chunking) the batch-size
    quantization; min_rows_bin floors the length bins — together they
    canonicalize dispatch shapes so a whole workload compiles a handful
    of kernels (each distinct shape is a fresh Mosaic compile, ~35 s on
    the remote-relay backend)."""
    if not pairs:
        return []
    bins = length_bins(pairs, min_rows=min_rows_bin)
    out: list = [None] * len(pairs)
    for _b, idxs in sorted(bins.items()):
        step = max_batch if max_batch > 0 else len(idxs)
        for c in range(0, len(idxs), step):
            chunk = idxs[c:c + step]
            sub = _posterior_pairs_banded_one(
                [pairs[i] for i in chunk], params, band, gamma,
                min_batch=min_batch, min_rows=min_rows_bin)
            for i, r in zip(chunk, sub):
                out[i] = r
    return out


def _posterior_pairs_banded_one(pairs, params: HmmParams, band: int,
                                gamma: float, min_batch: int = 8,
                                min_rows: int = 32):
    from . import smart_put
    from .banded import pack_band_batch
    packed = pack_band_batch(pairs, band, min_batch=min_batch,
                             min_rows=min_rows)
    put = smart_put(packed["q"].shape[0] * packed["q"].shape[1]
                    * band, pallas_env="CACTUS_PAIRHMM_PALLAS")
    post = posterior_default_backend()(
        put(packed["q"]), put(packed["t_shift"]),
        put(packed["m_len"]), put(packed["n_len"]),
        put(packed["lo"]), put(params.emissions()),
        band=band, delta=params.delta, epsilon=params.epsilon)
    best_b_all, pr_all = _row_argmax(post)
    best_b_all = np.asarray(best_b_all)
    pr_all = np.asarray(pr_all)
    out = []
    for p, (qs, ts) in enumerate(pairs):
        m = len(qs)
        lo_p = int(packed["lo"][p])
        best_b = best_b_all[p, :m]
        pr = pr_all[p, :m]
        j = np.arange(1, m + 1) + lo_p + best_b     # 1-based target pos
        keep = (pr >= gamma) & (j >= 1) & (j <= len(ts))
        idx = np.flatnonzero(keep)
        out.append([(int(i), int(j[i] - 1), float(pr[i])) for i in idx])
    return out
