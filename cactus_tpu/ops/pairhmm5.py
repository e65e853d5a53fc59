"""Batched banded FIVE-STATE pair-HMM posteriors (cPecan stateMachine5).

The reference BAR pecan path runs `stateMachine5_construct(fiveState)`
(bar/impl/bar.c:65): a pair-HMM with a match state plus SHORT and LONG
gap states on each side (SX/LX consume query, SY/LY consume target).
Short gaps model small indels (fast open, fast return); long gaps model
structural indels (rare open, near-unit extension), and short<->long
switch transitions let a gap change regime mid-run.  This captures the
empirically heavy-tailed indel length distribution that a single
geometric gap state (ops/pairhmm.py, the 3-state fallback) cannot.

TPU-native design: same banded scaled-LINEAR-space layout as
ops/pairhmm.py (per-row max renormalization instead of log-sum-exp; pure
float32 multiply-add on the VPU).  The new wrinkle is that the in-row
target-consuming chain is now a COUPLED 2-vector linear recurrence

    [SY, LY][b] = A @ [SY, LY][b-1] + c[b],
    A = [[e_s, w_ls], [w_sl, e_l]]

solved with a matrix Kogge-Stone scan: carry the running 2-vector and
the running 2x2 A-product per lane, combine with shifted copies in
log2(B) steps — every step static-shape elementwise work.

Default transition weights follow the published Pecan/cPecan five-state
model (match continue 0.9703834, short open 0.0129868, short extend
0.7126062, long extend 0.9965634); they are exposed as plain dataclass
fields so last-train-style re-estimation (ops/train.py) can override.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

TINY = 1e-30


@dataclass(frozen=True)
class Hmm5Params:
    """Five-state pair-HMM (symmetric in query/target gaps).

    match_continue: M->M;  open_short/open_long: M->{S,L} gap opens;
    extend_short/extend_long: gap self-loops; switch_sl / switch_ls:
    short->long / long->short regime changes inside a gap;
    M-returns are the complements (match_from_short = 1 - extend_short -
    switch_sl, match_from_long = 1 - extend_long - switch_ls).
    """
    match_continue: float = 0.9703833696510062
    open_short: float = 0.0129868352330243
    open_long: float = 0.0018197996414636
    extend_short: float = 0.7126062401851738
    extend_long: float = 0.9965634257906200
    switch_sl: float = 0.0007315179552849
    switch_ls: float = 0.0007315179552849
    p_match: float = 0.94

    @property
    def match_from_short(self) -> float:
        return 1.0 - self.extend_short - self.switch_sl

    @property
    def match_from_long(self) -> float:
        return 1.0 - self.extend_long - self.switch_ls

    def emissions(self) -> np.ndarray:
        """Match-state pair emissions as odds ratios vs the uniform null
        (same convention as HmmParams.emissions)."""
        e = np.full((6, 6), (1.0 - self.p_match) / 3.0, dtype=np.float32)
        np.fill_diagonal(e[:4, :4], self.p_match)
        e[4:, :] = 1.0 / 16.0
        e[:, 4:] = 1.0 / 16.0
        return e * 16.0


# --------------------------------------------------------------------------
# numpy oracle (full matrix)
# --------------------------------------------------------------------------

def posterior5_np(q: np.ndarray, t: np.ndarray, p: Hmm5Params) -> np.ndarray:
    """Full O(MN) match-state posterior matrix for the 5-state model.
    Test oracle only."""
    M, N = len(q), len(t)
    em = p.emissions()
    mc, os_, ol = p.match_continue, p.open_short, p.open_long
    es, el = p.extend_short, p.extend_long
    wsl, wls = p.switch_sl, p.switch_ls
    ms, ml = p.match_from_short, p.match_from_long

    fM = np.zeros((M + 1, N + 1))
    fSX = np.zeros((M + 1, N + 1))
    fLX = np.zeros((M + 1, N + 1))
    fSY = np.zeros((M + 1, N + 1))
    fLY = np.zeros((M + 1, N + 1))
    fM[0, 0] = 1.0
    for i in range(M + 1):
        for j in range(N + 1):
            if i > 0 and j > 0:
                fM[i, j] = em[q[i - 1], t[j - 1]] * (
                    mc * fM[i - 1, j - 1]
                    + ms * (fSX[i - 1, j - 1] + fSY[i - 1, j - 1])
                    + ml * (fLX[i - 1, j - 1] + fLY[i - 1, j - 1]))
            if i > 0:
                fSX[i, j] += (os_ * fM[i - 1, j] + es * fSX[i - 1, j]
                              + wls * fLX[i - 1, j])
                fLX[i, j] += (ol * fM[i - 1, j] + el * fLX[i - 1, j]
                              + wsl * fSX[i - 1, j])
            if j > 0:
                fSY[i, j] += (os_ * fM[i, j - 1] + es * fSY[i, j - 1]
                              + wls * fLY[i, j - 1])
                fLY[i, j] += (ol * fM[i, j - 1] + el * fLY[i, j - 1]
                              + wsl * fSY[i, j - 1])
    Z = (fM[M, N] + fSX[M, N] + fLX[M, N] + fSY[M, N] + fLY[M, N])

    bM = np.zeros((M + 1, N + 1))
    bSX = np.zeros((M + 1, N + 1))
    bLX = np.zeros((M + 1, N + 1))
    bSY = np.zeros((M + 1, N + 1))
    bLY = np.zeros((M + 1, N + 1))
    bM[M, N] = bSX[M, N] = bLX[M, N] = bSY[M, N] = bLY[M, N] = 1.0
    for i in range(M, -1, -1):
        for j in range(N, -1, -1):
            if i == M and j == N:
                continue
            mm = (em[q[i], t[j]] * bM[i + 1, j + 1]
                  if (i < M and j < N) else 0.0)
            sx = bSX[i + 1, j] if i < M else 0.0
            lx = bLX[i + 1, j] if i < M else 0.0
            sy = bSY[i, j + 1] if j < N else 0.0
            ly = bLY[i, j + 1] if j < N else 0.0
            bM[i, j] = mc * mm + os_ * (sx + sy) + ol * (lx + ly)
            bSX[i, j] = ms * mm + es * sx + wsl * lx
            bLX[i, j] = ml * mm + el * lx + wls * sx
            bSY[i, j] = ms * mm + es * sy + wsl * ly
            bLY[i, j] = ml * mm + el * ly + wls * sy
    post = np.zeros((M, N))
    for i in range(1, M + 1):
        for j in range(1, N + 1):
            post[i - 1, j - 1] = fM[i, j] * bM[i, j] / max(Z, TINY)
    return post


# --------------------------------------------------------------------------
# batched banded forward/backward (XLA scan)
# --------------------------------------------------------------------------

def _mat_chain_fwd(c1, c2, A, P, B):
    """Solve v[b] = A v[b-1] + c[b] along lanes (2-vector matrix
    Kogge-Stone).  c1/c2 (P,B): source terms; A: 2x2 tuple of floats.
    Returns (y1, y2)."""
    a11, a12, a21, a22 = A
    y1, y2 = c1, c2
    F11 = jnp.full((P, B), a11, jnp.float32)
    F12 = jnp.full((P, B), a12, jnp.float32)
    F21 = jnp.full((P, B), a21, jnp.float32)
    F22 = jnp.full((P, B), a22, jnp.float32)

    def shift(x, off):
        return jnp.concatenate(
            [jnp.zeros((P, off), jnp.float32), x[:, :-off]], axis=1)

    off = 1
    while off < B:
        s1, s2 = shift(y1, off), shift(y2, off)
        y1 = y1 + F11 * s1 + F12 * s2
        y2 = y2 + F21 * s1 + F22 * s2
        G11, G12 = shift(F11, off), shift(F12, off)
        G21, G22 = shift(F21, off), shift(F22, off)
        F11, F12, F21, F22 = (F11 * G11 + F12 * G21, F11 * G12 + F12 * G22,
                              F21 * G11 + F22 * G21, F21 * G12 + F22 * G22)
        off *= 2
    return y1, y2


def _mat_chain_bwd(c1, c2, A, P, B):
    """Solve v[b] = A v[b+1] + c[b] along lanes (reverse direction)."""
    a11, a12, a21, a22 = A
    y1, y2 = c1, c2
    F11 = jnp.full((P, B), a11, jnp.float32)
    F12 = jnp.full((P, B), a12, jnp.float32)
    F21 = jnp.full((P, B), a21, jnp.float32)
    F22 = jnp.full((P, B), a22, jnp.float32)

    def shift(x, off):
        return jnp.concatenate(
            [x[:, off:], jnp.zeros((P, off), jnp.float32)], axis=1)

    off = 1
    while off < B:
        s1, s2 = shift(y1, off), shift(y2, off)
        y1 = y1 + F11 * s1 + F12 * s2
        y2 = y2 + F21 * s1 + F22 * s2
        G11, G12 = shift(F11, off), shift(F12, off)
        G21, G22 = shift(F21, off), shift(F22, off)
        F11, F12, F21, F22 = (F11 * G11 + F12 * G21, F11 * G12 + F12 * G22,
                              F21 * G11 + F22 * G21, F21 * G12 + F22 * G22)
        off *= 2
    return y1, y2


@partial(jax.jit, static_argnames=("band",), static_argnums=())
def _posterior5_impl(q, t_shift, m_len, n_len, lo, em, trans, band):
    P, Mmax = q.shape
    B = band
    (mc, os_, ol, es, el, wsl, wls, ms, ml) = [trans[k] for k in range(9)]
    em = em.astype(jnp.float32)
    b_idx = jnp.arange(B, dtype=jnp.int32)[None, :]
    lo_c = lo[:, None].astype(jnp.int32)
    m_c = m_len[:, None].astype(jnp.int32)
    n_c = n_len[:, None].astype(jnp.int32)
    A_fwd = (es, wls, wsl, el)        # [SY,LY][b] = A [SY,LY][b-1] + c
    A_bwd = (es, wsl, wls, el)        # transpose for the backward chain

    def sl(x):  # x[b] <- x[b+1]
        return jnp.concatenate([x[:, 1:], jnp.zeros((P, 1), x.dtype)], 1)

    def sr(x):  # x[b] <- x[b-1]
        return jnp.concatenate([jnp.zeros((P, 1), x.dtype), x[:, :-1]], 1)

    # ---- forward row 0: M at j==0; SY/LY chains seeded by the M cell ----
    j0 = lo_c + b_idx
    fM0 = jnp.where(j0 == 0, 1.0, 0.0).astype(jnp.float32)
    okY0 = ((j0 >= 1) & (j0 <= n_c)).astype(jnp.float32)
    cS0 = okY0 * os_ * sr(fM0)
    cL0 = okY0 * ol * sr(fM0)
    fSY0, fLY0 = _mat_chain_fwd(cS0, cL0, A_fwd, P, B)
    fSY0 = fSY0 * okY0
    fLY0 = fLY0 * okY0
    zero = jnp.zeros((P, B), jnp.float32)

    def fwd_step(carry, i):
        fM, fSX, fLX, fSY, fLY, ls = carry
        qc = jax.lax.dynamic_slice_in_dim(q, i - 1, 1, axis=1)
        tc = jax.lax.dynamic_slice_in_dim(t_shift, i - 1, B, axis=1)
        emit = em[qc.astype(jnp.int32), tc.astype(jnp.int32)]
        j = i + lo_c + b_idx
        ok = (j >= 1) & (j <= n_c) & (i <= m_c)
        okx = (j >= 0) & (j <= n_c) & (i <= m_c)
        mM = emit * (mc * fM + ms * (fSX + fSY) + ml * (fLX + fLY))
        mM = jnp.where(ok, mM, 0.0)
        mSX = os_ * sl(fM) + es * sl(fSX) + wls * sl(fLX)
        mLX = ol * sl(fM) + el * sl(fLX) + wsl * sl(fSX)
        mSX = jnp.where(okx, mSX, 0.0)
        mLX = jnp.where(okx, mLX, 0.0)
        okf = ok.astype(jnp.float32)
        mSY, mLY = _mat_chain_fwd(okf * os_ * sr(mM), okf * ol * sr(mM),
                                  A_fwd, P, B)
        mSY = mSY * okf
        mLY = mLY * okf
        tot = mM + mSX + mLX + mSY + mLY
        scale = jnp.maximum(jnp.max(tot, axis=1, keepdims=True), TINY)
        nM, nSX, nLX = mM / scale, mSX / scale, mLX / scale
        nSY, nLY = mSY / scale, mLY / scale
        ls = ls + jnp.log(scale[:, 0])
        return ((nM, nSX, nLX, nSY, nLY, ls),
                (nM, nSX + nLX + nSY + nLY, ls))

    init = (fM0, zero, zero, fSY0, fLY0, jnp.zeros(P, jnp.float32))
    _last, (fM_rows, fG_rows, lsF_rows) = jax.lax.scan(
        fwd_step, init, jnp.arange(1, Mmax + 1))
    fM_rows = jnp.transpose(fM_rows, (1, 0, 2))      # (P, Mmax, B)
    fG_rows = jnp.transpose(fG_rows, (1, 0, 2))
    lsF_rows = jnp.transpose(lsF_rows, (1, 0))       # (P, Mmax)

    # logZ from the end cell of each pair
    b_end = (n_len - m_len - lo).astype(jnp.int32)
    rows = jnp.maximum(m_len.astype(jnp.int32) - 1, 0)
    end_tot = (jnp.take_along_axis(
        jnp.take_along_axis(fM_rows + fG_rows, rows[:, None, None],
                            axis=1)[:, 0], b_end[:, None], axis=1)[:, 0])
    end_ls = jnp.take_along_axis(lsF_rows, rows[:, None], axis=1)[:, 0]
    logZ = jnp.log(jnp.maximum(end_tot, TINY)) + end_ls

    # ---- backward ----
    def terminal_row(i):
        """Backward values for row i == m_len: only Y-gap chains remain.
        v[j] = A^T v[j+1] with v[n] = (1,1); bM[j] = opens . v[j+1]."""
        j = i + lo_c + b_idx
        jn = n_c - j
        at_end = (jn == 0).astype(jnp.float32)
        okc = ((jn >= 0) & (j >= 0)).astype(jnp.float32)
        ty1, ty2 = _mat_chain_bwd(at_end, at_end, A_bwd, P, B)
        ty1 = ty1 * okc
        ty2 = ty2 * okc
        bm = at_end + (os_ * sl(ty1) + ol * sl(ty2)) * okc * (
            1.0 - at_end)
        bx1 = at_end     # SX can only end here
        bx2 = at_end
        return bm, bx1, bx2, ty1, ty2

    def bwd_step(carry, i):
        bM, bSX, bLX, bSY, bLY, ls = carry
        is_term = (m_c == i)
        tm, tsx, tlx, tsy, tly = terminal_row(i)
        bM = jnp.where(is_term, tm, bM)
        bSX = jnp.where(is_term, tsx, bSX)
        bLX = jnp.where(is_term, tlx, bLX)
        bSY = jnp.where(is_term, tsy, bSY)
        bLY = jnp.where(is_term, tly, bLY)
        ls = jnp.where(is_term[:, 0], 0.0, ls)
        out = (bM, ls)
        qc = jax.lax.dynamic_slice_in_dim(q, i - 1, 1, axis=1)  # row i
        tc = jax.lax.dynamic_slice_in_dim(t_shift, i - 1, B, axis=1)
        emit = em[qc.astype(jnp.int32), tc.astype(jnp.int32)]
        jprev = (i - 1) + lo_c + b_idx
        mm = emit * bM
        mm = jnp.where((jprev + 1 <= n_c) & (i <= m_c), mm, 0.0)
        sx = sr(bSX)
        lx = sr(bLX)
        okx = (jprev >= 0) & (jprev <= n_c) & (i <= m_c)
        sx = jnp.where(okx, sx, 0.0)
        lx = jnp.where(okx, lx, 0.0)
        nSX = ms * mm + es * sx + wsl * lx
        nLX = ml * mm + el * lx + wls * sx
        ySY, yLY = _mat_chain_bwd(ms * mm, ml * mm, A_bwd, P, B)
        nM = mc * mm + os_ * (sx + sl(ySY)) + ol * (lx + sl(yLY))
        nSY, nLY = ySY, yLY
        okp = (jprev >= 0) & (jprev <= n_c)
        nM = jnp.where(okp, nM, 0.0)
        nSX = jnp.where(okp, nSX, 0.0)
        nLX = jnp.where(okp, nLX, 0.0)
        nSY = jnp.where(okp, nSY, 0.0)
        nLY = jnp.where(okp, nLY, 0.0)
        tot = nM + nSX + nLX + nSY + nLY
        scale = jnp.maximum(jnp.max(tot, axis=1, keepdims=True), TINY)
        nM, nSX, nLX = nM / scale, nSX / scale, nLX / scale
        nSY, nLY = nSY / scale, nLY / scale
        ls2 = ls + jnp.where(i <= m_c[:, 0], jnp.log(scale[:, 0]), 0.0)
        keep = i <= m_c
        nM = jnp.where(keep, nM, bM)
        nSX = jnp.where(keep, nSX, bSX)
        nLX = jnp.where(keep, nLX, bLX)
        nSY = jnp.where(keep, nSY, bSY)
        nLY = jnp.where(keep, nLY, bLY)
        ls2 = jnp.where(i <= m_c[:, 0], ls2, ls)
        return (nM, nSX, nLX, nSY, nLY, ls2), out

    initb = (zero, zero, zero, zero, zero, jnp.zeros(P, jnp.float32))
    _lastb, (bM_rows, lsB_rows) = jax.lax.scan(
        bwd_step, initb, jnp.arange(Mmax, 0, -1))
    bM_rows = jnp.transpose(bM_rows, (1, 0, 2))[:, ::-1]
    lsB_rows = jnp.transpose(lsB_rows, (1, 0))[:, ::-1]

    post = fM_rows * bM_rows * jnp.exp(
        jnp.clip(lsF_rows + lsB_rows - logZ[:, None], -60.0, 60.0)
    )[:, :, None]
    row_ids = jnp.arange(1, Mmax + 1)[None, :, None]
    post = jnp.where(row_ids <= m_len[:, None, None], post, 0.0)
    return jnp.clip(post, 0.0, 1.5)


def posterior_banded_batch5(q, t_shift, m_len, n_len, lo, em,
                            band: int, params: Hmm5Params):
    """Match posteriors over the band, five-state machine.

    Same contract as pairhmm.posterior_banded_batch: returns
    (P, Mmax, B) float32 match posteriors, band cell (i, b) is target
    position j = i + lo + b (1-based rows)."""
    trans = jnp.asarray([
        params.match_continue, params.open_short, params.open_long,
        params.extend_short, params.extend_long,
        params.switch_sl, params.switch_ls,
        params.match_from_short, params.match_from_long],
        dtype=jnp.float32)
    return _posterior5_impl(q, t_shift, m_len, n_len, lo, em, trans,
                            band=band)


# widest band the fused five-state kernel compiles at (16 MB scoped
# vmem; see posterior5_default_backend)
MAX_PALLAS_BAND5 = 1024


def posterior5_default_backend():
    """Fused Pallas kernel on TPU (hardware-validated 2026-08-19 on a
    v5e: max posterior diff vs the XLA scan 1.7e-3, 4.10 Gcells/s vs
    0.21; opt-out via CACTUS_PAIRHMM_PALLAS=0), XLA scan elsewhere."""
    import os

    if (jax.devices()[0].platform == "tpu"
            and os.environ.get("CACTUS_PAIRHMM_PALLAS", "1") == "1"):
        from .pairhmm5_pallas import posterior_banded_batch5_pallas
        dev = jax.devices()[0]

        def run(q, t_shift, m_len, n_len, lo, em, **kw):
            if kw.get("band", 0) > MAX_PALLAS_BAND5:
                # scoped-vmem limit: the five-state kernel carries more
                # per-step scratch than the 3-state one (measured on a
                # v5e: band 2048 fails AOT compile at 18.6 MB vs the
                # 16 MB cap) — wide bands route to the XLA scan
                return posterior_banded_batch5(q, t_shift, m_len, n_len,
                                               lo, em, **kw)
            # callers may have committed inputs to host CPU (smart_put);
            # the Pallas kernel only lowers on the TPU device
            put = lambda x: jax.device_put(x, dev)
            return posterior_banded_batch5_pallas(
                put(q), put(t_shift), put(m_len), put(n_len), put(lo),
                put(em), **kw)
        return run
    return posterior_banded_batch5


def posterior_pairs_banded5(pairs, params: Hmm5Params, band: int = 128,
                            gamma: float = 0.5):
    """Aligned (qpos, tpos, posterior) per pair via the 5-state kernel.

    Pairs dispatch in pow2 query-length bins (pairhmm.length_bins) so
    one long pair cannot pad the whole batch to its row count."""
    from .pairhmm import length_bins
    if not pairs:
        return []
    bins = length_bins(pairs)
    out: list = [None] * len(pairs)
    for _b, idxs in sorted(bins.items()):
        sub = _posterior_pairs_banded5_one(
            [pairs[i] for i in idxs], params, band, gamma)
        for i, r in zip(idxs, sub):
            out[i] = r
    return out


def _posterior_pairs_banded5_one(pairs, params: Hmm5Params, band: int,
                                 gamma: float):
    from . import smart_put
    from .banded import pack_band_batch
    packed = pack_band_batch(pairs, band, min_rows=256)
    put = smart_put(packed["q"].shape[0] * packed["q"].shape[1]
                    * band, pallas_env="CACTUS_PAIRHMM_PALLAS")
    post = posterior5_default_backend()(
        put(packed["q"]), put(packed["t_shift"]),
        put(packed["m_len"]), put(packed["n_len"]),
        put(packed["lo"]), put(params.emissions()),
        band=band, params=params)
    # device-side band reduction: never fetch the (P, Mmax, B) tensor
    from .pairhmm import _row_argmax
    best_b_all, pr_all = _row_argmax(post)
    best_b_all = np.asarray(best_b_all)
    pr_all = np.asarray(pr_all)
    out = []
    for p, (qs, ts) in enumerate(pairs):
        m = len(qs)
        lo_p = int(packed["lo"][p])
        best_b = best_b_all[p, :m]
        pr = pr_all[p, :m]
        j = np.arange(1, m + 1) + lo_p + best_b
        keep = (pr >= gamma) & (j >= 1) & (j <= len(ts))
        idx = np.flatnonzero(keep)
        out.append([(int(i), int(j[i] - 1), float(pr[i])) for i in idx])
    return out
