"""Pallas TPU kernel for the batched banded affine-gap DP.

Same contract as ops/banded.py:banded_align_batch (the lastz/cPecan DP
replacement), but as a single fused on-chip kernel instead of a
`lax.scan` of small XLA ops:

 - grid = (pair_tiles, rows): the row dimension is innermost, so the DP
   carry (H/I/D bands) lives in VMEM scratch across row steps while the
   direction-bit rows stream straight to HBM through the output window —
   the only HBM traffic per cell is its 1-byte direction record;
 - each program handles TILE_P pairs on the sublanes × the band on the
   lanes (band multiple of 128), all int32 VPU ops;
 - the intra-row D-chain uses the same Kogge-Stone max-scan, via
   lane-axis shifts;
 - substitution scores come from a 6-way select against the query code
   (submat rows), avoiding gathers.

Sequence codes are uint8 in {0..5} (5 = pad); see ops/banded.py for the
recurrence and the direction-bit encoding consumed by traceback_band.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded import NEG

TILE_P = 64
# DP rows per grid step (must divide 128): >1 amortizes the fixed
# per-step cost (scalar reads, slab loads, grid latency) across rows.
# Hardware-validated sweep on a v5e (2026-08-19, P=64 M=4096 B=512):
# R=1 15.96, R=2 16.99, R=4 17.98, R=8 18.70 Gcells/s — default 8.
import os as _os
ROWS_PER_STEP = int(_os.environ.get("CACTUS_BANDED_ROWS_PER_STEP", "8"))
assert 128 % ROWS_PER_STEP == 0, ROWS_PER_STEP


def _kernel(m_len_ref, n_len_ref, lo_ref, submat_ref,  # scalar prefetch SMEM
            q_ref, t_ref,                               # VMEM
            dirs_ref, end_ref,                          # outputs
            H, I, D, eH, eI, eD,                        # scratch
            *, band: int, gap_open: int, gap_extend: int, m_max: int,
            rows_per_step: int):
    p = pl.program_id(0)
    step = pl.program_id(1)   # each grid step runs rows_per_step DP rows
    R = rows_per_step
    TP = H.shape[0]
    B = band

    b_idx = jax.lax.broadcasted_iota(jnp.int32, (TP, B), 1)
    lo_c = jnp.stack(
        [lo_ref[p * TP + k] for k in range(TP)]).reshape(TP, 1)
    m_len = jnp.stack(
        [m_len_ref[p * TP + k] for k in range(TP)]).reshape(TP, 1)

    @pl.when(step == 0)
    def _init():
        j0 = lo_c + b_idx
        H[:] = jnp.where(j0 == 0, 0, NEG)
        D[:] = jnp.where(j0 > 0, -(gap_open + j0 * gap_extend), NEG)
        I[:] = jnp.full((TP, B), NEG, jnp.int32)
        zero_len = m_len == 0
        eH[:] = jnp.where(zero_len, H[:], NEG)
        eI[:] = jnp.where(zero_len, I[:], NEG)
        eD[:] = jnp.where(zero_len, D[:], NEG)

    # lane-aligned slab loads + dynamic rotation (Mosaic requires dynamic
    # lane offsets to be 128-aligned; the in-slab offset rotates instead).
    # R divides 128, so all R rows of this step share one 128 slab.
    i0 = step * R
    slab = pl.multiple_of((i0 // 128) * 128, 128)
    base_off = i0 % 128
    qslab = q_ref[:, pl.ds(slab, 128)].astype(jnp.int32)     # (TP,128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TP, 128), 1)
    tslab = t_ref[:, pl.ds(slab, B + 128)].astype(jnp.int32)  # (TP,B+128)
    neg_col = jnp.full((TP, 1), NEG, jnp.int32)

    Hp, Ip, Dp = H[:], I[:], D[:]
    for r in range(R):
        i = i0 + r
        row = i + 1
        in_off = base_off + r
        qc = jnp.sum(jnp.where(lane == in_off, qslab, 0), axis=1,
                     keepdims=True)                           # (TP,1)
        # left-rotate by in_off expressed as a positive right-rotate
        tc = pltpu.roll(tslab, (B + 128) - in_off, axis=1)[:, :B]

        # substitution scores in two select stages: first the submat row
        # for each pair's query code (6 selects on (TP,1)), then the
        # column by target code (6 selects on (TP,B))
        qrow = [jnp.zeros((TP, 1), jnp.int32) for _ in range(6)]
        for tcode in range(6):
            acc = qrow[tcode]
            for code in range(6):
                acc = jnp.where(qc == code, submat_ref[code, tcode], acc)
            qrow[tcode] = acc
        s = jnp.zeros((TP, B), jnp.int32)
        for tcode in range(6):
            s = jnp.where(tc == tcode, qrow[tcode], s)

        prev_best = jnp.maximum(jnp.maximum(Hp, Ip), Dp)
        h_src = jnp.where(Hp >= Ip, 0, 1)
        h_src = jnp.where(Dp > jnp.maximum(Hp, Ip), 2, h_src)
        H_new = prev_best + s

        H_up = jnp.concatenate([Hp[:, 1:], neg_col], axis=1)
        I_up = jnp.concatenate([Ip[:, 1:], neg_col], axis=1)
        i_fresh = (H_up - gap_open) >= I_up
        I_new = jnp.maximum(H_up - gap_open, I_up) - gap_extend

        j = row + lo_c + b_idx
        I_new = jnp.where(j == 0, -(gap_open + row * gap_extend), I_new)
        H_new = jnp.where(j <= 0, NEG, H_new)
        I_new = jnp.where(j < 0, NEG, I_new)

        # D-chain: Kogge-Stone max-scan along the band (lane axis)
        Hl = jnp.concatenate([neg_col, H_new[:, :-1]], axis=1)
        ext_ramp = gap_extend * b_idx
        Y = Hl + ext_ramp
        off = 1
        while off < B:
            shifted = jnp.concatenate(
                [jnp.full((TP, off), NEG, jnp.int32), Y[:, :-off]], axis=1)
            Y = jnp.maximum(Y, shifted)
            off *= 2
        D_new = Y - gap_open - gap_extend * (b_idx + 1)
        d_fresh = D_new == (Hl - gap_open - gap_extend)
        D_new = jnp.where(j <= 0, NEG, D_new)
        D_new = jnp.maximum(D_new, NEG)
        H_new = jnp.maximum(H_new, NEG)
        I_new = jnp.maximum(I_new, NEG)

        # int8 shifts don't legalize on Mosaic: compose bits in int32
        dirs = (h_src + 4 * i_fresh.astype(jnp.int32)
                + 8 * d_fresh.astype(jnp.int32)).astype(jnp.uint8)
        dirs_ref[r, :, :] = dirs

        at_end = (row == m_len)
        eH[:] = jnp.where(at_end, H_new, eH[:])
        eI[:] = jnp.where(at_end, I_new, eI[:])
        eD[:] = jnp.where(at_end, D_new, eD[:])
        Hp, Ip, Dp = H_new, I_new, D_new

    H[:] = Hp
    I[:] = Ip
    D[:] = Dp

    @pl.when(step == (m_max // R) - 1)
    def _flush():
        end_ref[0, :, :] = eH[:]
        end_ref[1, :, :] = eI[:]
        end_ref[2, :, :] = eD[:]


@partial(jax.jit,
         static_argnames=("band", "gap_open", "gap_extend", "interpret"))
def banded_align_batch_pallas(q, t_shift, m_len, n_len, lo, submat,
                              band: int, gap_open: int, gap_extend: int,
                              interpret: bool = False):
    """Drop-in Pallas backend for ops.banded.banded_align_batch."""
    P, Mmax = q.shape
    B = band
    TP = TILE_P
    P_orig = P
    if P % TP:
        pad = TP - P % TP
        q = jnp.pad(q, ((0, pad), (0, 0)), constant_values=5)
        t_shift = jnp.pad(t_shift, ((0, pad), (0, 0)), constant_values=5)
        m_len = jnp.pad(m_len, (0, pad))
        n_len = jnp.pad(n_len, (0, pad))
        lo = jnp.pad(lo, (0, pad))
        P += pad
    # row dim padded to a multiple of 128 for lane-aligned slab loads
    M_orig = Mmax
    Mp = -(-Mmax // 128) * 128
    if Mp != Mmax:
        q = jnp.pad(q, ((0, 0), (0, Mp - Mmax)), constant_values=5)
        t_shift = jnp.pad(t_shift, ((0, 0), (0, Mp - Mmax)),
                          constant_values=5)
        Mmax = Mp
    R = ROWS_PER_STEP
    grid = (P // TP, Mmax // R)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TP, Mmax), lambda p, i, *_: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, Mmax + B), lambda p, i, *_: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # dirs streams row-major: (rows, pairs, band) so the block's
            # trailing dims (TP, B) satisfy the (8,128) tiling rule
            pl.BlockSpec((R, TP, B), lambda p, i, *_: (i, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TP, B), lambda p, i, *_: (0, p, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TP, B), jnp.int32),
            pltpu.VMEM((TP, B), jnp.int32),
            pltpu.VMEM((TP, B), jnp.int32),
            pltpu.VMEM((TP, B), jnp.int32),
            pltpu.VMEM((TP, B), jnp.int32),
            pltpu.VMEM((TP, B), jnp.int32),
        ],
    )
    dirs, endflat = pl.pallas_call(
        partial(_kernel, band=B, gap_open=gap_open, gap_extend=gap_extend,
                m_max=Mmax, rows_per_step=R),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Mmax, P, B), jnp.uint8),
            jax.ShapeDtypeStruct((3, P, B), jnp.int32),
        ],
        interpret=interpret,
    )(m_len.astype(jnp.int32), n_len.astype(jnp.int32),
      lo.astype(jnp.int32), submat.astype(jnp.int32), q, t_shift)

    dirs = jnp.swapaxes(dirs, 0, 1)[:P_orig, :M_orig]  # → (P, Mmax, B)
    endflat = endflat[:, :P_orig]
    n_len, m_len, lo = n_len[:P_orig], m_len[:P_orig], lo[:P_orig]
    b_end = (n_len - m_len - lo).astype(jnp.int32)[:, None]
    take = lambda m: jnp.take_along_axis(m, b_end, axis=1)[:, 0]
    end_scores = jnp.stack([take(endflat[0]), take(endflat[1]),
                            take(endflat[2])], axis=1)
    end_mat = jnp.argmax(end_scores, axis=1).astype(jnp.int32)
    return dirs, end_scores, end_mat
