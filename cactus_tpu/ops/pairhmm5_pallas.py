"""Pallas TPU kernel for the batched banded FIVE-STATE pair-HMM.

Same contract as ops/pairhmm5.py:posterior_banded_batch5 (cPecan's
stateMachine5, the reference BAR pecan engine's production model), as
two fused on-chip sweeps following the 3-state kernel template
(ops/pairhmm_pallas.py): carry in VMEM scratch, match-band rows
streamed to HBM, per-STEP rescaling with exclusive log-scales, XLA
posterior combine.

The five-state wrinkle is the coupled in-row chain: [SY, LY][b] =
A @ [SY, LY][b-1] + c[b] with A = [[e_s, w_ls], [w_sl, e_l]], solved by
the same matrix Kogge-Stone as the XLA path — running 2-vector plus
running 2x2 A-product per lane, log2(B) elementwise steps.

Transitions are compile-time constants (one Mosaic program per trained
parameter set; last-train re-estimation changes them once per run).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pairhmm_pallas import (ROWS_PER_STEP, TILE_P, TINY, _codes_for_step,
                             _emit_row, _expand_ls, _lane_shift_left,
                             _lane_shift_right, _pad_inputs, _row_codes)


def _mat_chain(c1, c2, A, B, reverse):
    """v[b] = A v[b∓1] + c[b] along lanes (matrix Kogge-Stone)."""
    a11, a12, a21, a22 = A
    shift = _lane_shift_left if reverse else _lane_shift_right
    y1, y2 = c1, c2
    F11 = jnp.full(c1.shape, a11, jnp.float32)
    F12 = jnp.full(c1.shape, a12, jnp.float32)
    F21 = jnp.full(c1.shape, a21, jnp.float32)
    F22 = jnp.full(c1.shape, a22, jnp.float32)
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


def _fwd_kernel(m_len_ref, n_len_ref, lo_ref, em_ref,
                q_ref, t_ref,
                fM_out, ls_out, etot_out, els_out,
                M, SX, LX, SY, LY, LS, ET, EL,
                *, band: int, tr: tuple, m_max: int, rows_per_step: int):
    p = pl.program_id(0)
    step = pl.program_id(1)
    R = rows_per_step
    TP = M.shape[0]
    B = band
    mc, os_, ol, es, el, wsl, wls, ms, ml = tr
    A_fwd = (es, wls, wsl, el)

    b_idx = jax.lax.broadcasted_iota(jnp.int32, (TP, B), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TP, 128), 1)
    lo_c = jnp.stack(
        [lo_ref[p * TP + k] for k in range(TP)]).reshape(TP, 1)
    m_c = jnp.stack(
        [m_len_ref[p * TP + k] for k in range(TP)]).reshape(TP, 1)
    n_c = jnp.stack(
        [n_len_ref[p * TP + k] for k in range(TP)]).reshape(TP, 1)

    @pl.when(step == 0)
    def _init():
        j0 = lo_c + b_idx
        fM0 = jnp.where(j0 == 0, 1.0, 0.0).astype(jnp.float32)
        okY0 = ((j0 >= 1) & (j0 <= n_c)).astype(jnp.float32)
        cS0 = okY0 * os_ * _lane_shift_right(fM0, 1)
        cL0 = okY0 * ol * _lane_shift_right(fM0, 1)
        sy0, ly0 = _mat_chain(cS0, cL0, A_fwd, B, reverse=False)
        M[:] = fM0
        SX[:] = jnp.zeros((TP, B), jnp.float32)
        LX[:] = jnp.zeros((TP, B), jnp.float32)
        SY[:] = sy0 * okY0
        LY[:] = ly0 * okY0
        LS[:] = jnp.zeros((TP, 128), jnp.float32)
        ET[:] = jnp.zeros((TP, B), jnp.float32)
        EL[:] = jnp.zeros((TP, 128), jnp.float32)

    i0 = step * R
    qslab, tslab, base_off = _codes_for_step(q_ref, t_ref, i0, B)

    fM, fSX, fLX, fSY, fLY = M[:], SX[:], LX[:], SY[:], LY[:]
    for r in range(R):
        i = i0 + r + 1
        qc, tc = _row_codes(qslab, tslab, lane, base_off + r, B)
        emit = _emit_row(qc, tc, em_ref)
        j = i + lo_c + b_idx
        ok = (j >= 1) & (j <= n_c) & (i <= m_c)
        okx = (j >= 0) & (j <= n_c) & (i <= m_c)
        mM = emit * (mc * fM + ms * (fSX + fSY) + ml * (fLX + fLY))
        mM = jnp.where(ok, mM, 0.0)
        mSX = (os_ * _lane_shift_left(fM, 1) + es * _lane_shift_left(fSX, 1)
               + wls * _lane_shift_left(fLX, 1))
        mLX = (ol * _lane_shift_left(fM, 1) + el * _lane_shift_left(fLX, 1)
               + wsl * _lane_shift_left(fSX, 1))
        mSX = jnp.where(okx, mSX, 0.0)
        mLX = jnp.where(okx, mLX, 0.0)
        okf = ok.astype(jnp.float32)
        mSY, mLY = _mat_chain(okf * os_ * _lane_shift_right(mM, 1),
                              okf * ol * _lane_shift_right(mM, 1),
                              A_fwd, B, reverse=False)
        mSY = mSY * okf
        mLY = mLY * okf
        fM_out[r, :, :] = mM
        at_end = (i == m_c)
        ET[:] = jnp.where(at_end, mM + mSX + mLX + mSY + mLY, ET[:])
        EL[:] = jnp.where(at_end[:, :1], LS[:], EL[:])
        fM, fSX, fLX, fSY, fLY = mM, mSX, mLX, mSY, mLY

    ls_out[0, :, :] = LS[:]
    tot = fM + fSX + fLX + fSY + fLY
    scale = jnp.maximum(jnp.max(tot, axis=1, keepdims=True), TINY)
    inv = 1.0 / scale
    M[:] = fM * inv
    SX[:] = fSX * inv
    LX[:] = fLX * inv
    SY[:] = fSY * inv
    LY[:] = fLY * inv
    LS[:] = LS[:] + jnp.log(scale)

    @pl.when(step == (m_max // R) - 1)
    def _flush():
        etot_out[:, :] = ET[:]
        els_out[:, :] = EL[:]


def _bwd_kernel(m_len_ref, n_len_ref, lo_ref, em_ref,
                q_ref, t_ref,
                bM_out, ls_out,
                M, SX, LX, SY, LY, LS,
                *, band: int, tr: tuple, m_max: int, rows_per_step: int):
    p = pl.program_id(0)
    step = pl.program_id(1)
    R = rows_per_step
    TP = M.shape[0]
    B = band
    mc, os_, ol, es, el, wsl, wls, ms, ml = tr
    A_bwd = (es, wsl, wls, el)

    b_idx = jax.lax.broadcasted_iota(jnp.int32, (TP, B), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TP, 128), 1)
    lo_c = jnp.stack(
        [lo_ref[p * TP + k] for k in range(TP)]).reshape(TP, 1)
    m_c = jnp.stack(
        [m_len_ref[p * TP + k] for k in range(TP)]).reshape(TP, 1)
    n_c = jnp.stack(
        [n_len_ref[p * TP + k] for k in range(TP)]).reshape(TP, 1)

    @pl.when(step == 0)
    def _init():
        z = jnp.zeros((TP, B), jnp.float32)
        M[:] = z
        SX[:] = z
        LX[:] = z
        SY[:] = z
        LY[:] = z
        LS[:] = jnp.zeros((TP, 128), jnp.float32)

    i_top = m_max - step * R
    i0 = i_top - R
    qslab, tslab, base_off = _codes_for_step(q_ref, t_ref, i0, B)

    bM, bSX, bLX, bSY, bLY = M[:], SX[:], LX[:], SY[:], LY[:]
    LS_now = LS[:]
    zero_ls = jnp.zeros((TP, 128), jnp.float32)
    for r in range(R):
        i = i_top - r
        is_term = (m_c == i)
        # terminal closed form: only Y-gap chains remain past row m
        j = i + lo_c + b_idx
        jn = n_c - j
        at_end = (jn == 0).astype(jnp.float32)
        okc = ((jn >= 0) & (j >= 0)).astype(jnp.float32)
        ty1, ty2 = _mat_chain(at_end, at_end, A_bwd, B, reverse=True)
        ty1 = ty1 * okc
        ty2 = ty2 * okc
        tm = at_end + (os_ * _lane_shift_left(ty1, 1)
                       + ol * _lane_shift_left(ty2, 1)) * okc * (
                           1.0 - at_end)
        bM = jnp.where(is_term, tm, bM)
        bSX = jnp.where(is_term, at_end, bSX)
        bLX = jnp.where(is_term, at_end, bLX)
        bSY = jnp.where(is_term, ty1, bSY)
        bLY = jnp.where(is_term, ty2, bLY)
        LS_now = jnp.where(is_term[:, :1], zero_ls, LS_now)
        bM_out[R - 1 - r, :, :] = bM

        qc, tc = _row_codes(qslab, tslab, lane, base_off + (R - 1 - r), B)
        emit = _emit_row(qc, tc, em_ref)
        jprev = (i - 1) + lo_c + b_idx
        mm = emit * bM
        mm = jnp.where((jprev + 1 <= n_c) & (i <= m_c), mm, 0.0)
        sx = _lane_shift_right(bSX, 1)
        lx = _lane_shift_right(bLX, 1)
        okx = (jprev >= 0) & (jprev <= n_c) & (i <= m_c)
        sx = jnp.where(okx, sx, 0.0)
        lx = jnp.where(okx, lx, 0.0)
        nSX = ms * mm + es * sx + wsl * lx
        nLX = ml * mm + el * lx + wls * sx
        ySY, yLY = _mat_chain(ms * mm, ml * mm, A_bwd, B, reverse=True)
        nM = (mc * mm + os_ * (sx + _lane_shift_left(ySY, 1))
              + ol * (lx + _lane_shift_left(yLY, 1)))
        okp = (jprev >= 0) & (jprev <= n_c)
        nM = jnp.where(okp, nM, 0.0)
        nSX = jnp.where(okp, nSX, 0.0)
        nLX = jnp.where(okp, nLX, 0.0)
        nSY = jnp.where(okp, ySY, 0.0)
        nLY = jnp.where(okp, yLY, 0.0)
        active = i <= m_c
        bM = jnp.where(active, nM, bM)
        bSX = jnp.where(active, nSX, bSX)
        bLX = jnp.where(active, nLX, bLX)
        bSY = jnp.where(active, nSY, bSY)
        bLY = jnp.where(active, nLY, bLY)

    ls_out[0, :, :] = LS_now
    tot = bM + bSX + bLX + bSY + bLY
    scale = jnp.maximum(jnp.max(tot, axis=1, keepdims=True), TINY)
    inv = 1.0 / scale
    started = m_c >= (i_top - R + 1)
    M[:] = jnp.where(started, bM * inv, bM)
    SX[:] = jnp.where(started, bSX * inv, bSX)
    LX[:] = jnp.where(started, bLX * inv, bLX)
    SY[:] = jnp.where(started, bSY * inv, bSY)
    LY[:] = jnp.where(started, bLY * inv, bLY)
    LS[:] = jnp.where(started[:, :1], LS_now + jnp.log(scale), LS_now)


@partial(jax.jit, static_argnames=("band", "tr", "interpret"))
def _posterior5_pallas_impl(q, t_shift, m_len, n_len, lo, em,
                            band: int, tr: tuple, interpret: bool):
    B = band
    TP = TILE_P
    R = ROWS_PER_STEP
    (q, t_shift, m_len, n_len, lo,
     P, Mmax, P_orig, M_orig) = _pad_inputs(q, t_shift, m_len, n_len, lo, B)
    S = Mmax // R
    grid = (P // TP, S)
    m32 = m_len.astype(jnp.int32)
    n32 = n_len.astype(jnp.int32)
    lo32 = lo.astype(jnp.int32)
    em32 = em.astype(jnp.float32)

    fwd_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TP, Mmax), lambda p, i, *_: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, Mmax + B), lambda p, i, *_: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, TP, B), lambda p, i, *_: (i, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TP, 128), lambda p, i, *_: (i, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, B), lambda p, i, *_: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, 128), lambda p, i, *_: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((TP, B), jnp.float32)] * 5
        + [pltpu.VMEM((TP, 128), jnp.float32)]
        + [pltpu.VMEM((TP, B), jnp.float32)]
        + [pltpu.VMEM((TP, 128), jnp.float32)],
    )
    fM_rows, lsF_steps, etot, els = pl.pallas_call(
        partial(_fwd_kernel, band=B, tr=tr, m_max=Mmax, rows_per_step=R),
        grid_spec=fwd_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Mmax, P, B), jnp.float32),
            jax.ShapeDtypeStruct((S, P, 128), jnp.float32),
            jax.ShapeDtypeStruct((P, B), jnp.float32),
            jax.ShapeDtypeStruct((P, 128), jnp.float32),
        ],
        interpret=interpret,
    )(m32, n32, lo32, em32, q, t_shift)

    bwd_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TP, Mmax), lambda p, i, *_: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, Mmax + B), lambda p, i, *_: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, TP, B), lambda p, i, *_, S=S: (S - 1 - i, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TP, 128),
                         lambda p, i, *_, S=S: (S - 1 - i, p, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((TP, B), jnp.float32)] * 5
        + [pltpu.VMEM((TP, 128), jnp.float32)],
    )
    bM_rows, lsB_steps = pl.pallas_call(
        partial(_bwd_kernel, band=B, tr=tr, m_max=Mmax, rows_per_step=R),
        grid_spec=bwd_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Mmax, P, B), jnp.float32),
            jax.ShapeDtypeStruct((S, P, 128), jnp.float32),
        ],
        interpret=interpret,
    )(m32, n32, lo32, em32, q, t_shift)

    fM_rows = jnp.swapaxes(fM_rows, 0, 1)
    bM_rows = jnp.swapaxes(bM_rows, 0, 1)
    lsF = _expand_ls(lsF_steps[:, :, 0], Mmax, R)
    lsB = _expand_ls(lsB_steps[:, :, 0], Mmax, R)

    b_end = (n32 - m32 - lo32)[:, None]
    end_tot = jnp.take_along_axis(etot, b_end, axis=1)[:, 0]
    logZ = jnp.log(jnp.maximum(end_tot, TINY)) + els[:, 0]

    post = fM_rows * bM_rows * jnp.exp(
        jnp.clip(lsF + lsB - logZ[:, None], -60.0, 60.0))[:, :, None]
    row_ids = jnp.arange(1, Mmax + 1)[None, :, None]
    post = jnp.where(row_ids <= m32[:, None, None], post, 0.0)
    post = jnp.clip(post, 0.0, 1.5)
    return post[:P_orig, :M_orig]


def posterior_banded_batch5_pallas(q, t_shift, m_len, n_len, lo, em,
                                   band: int, params,
                                   interpret: bool = False):
    """Drop-in Pallas backend for pairhmm5.posterior_banded_batch5."""
    tr = (params.match_continue, params.open_short, params.open_long,
          params.extend_short, params.extend_long,
          params.switch_sl, params.switch_ls,
          params.match_from_short, params.match_from_long)
    return _posterior5_pallas_impl(q, t_shift, m_len, n_len, lo, em,
                                   band=band, tr=tr, interpret=interpret)
