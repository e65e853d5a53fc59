"""Pallas TPU kernel for the POA sequence-vs-DAG DP (abPOA analog).

Same contract as ops/poa.py:poa_align_scan (linear-gap kernel): score a
query against a partial-order graph, returning the full H matrix, the
direction bytes, and the final-column scores.  The XLA `lax.scan`
version dispatches one tiny op bundle per graph node; here the whole
sweep is one fused program:

 - the H matrix (N x Lp int32) lives in VMEM scratch for the duration —
   predecessor rows are dynamic SUBLANE slices (no HBM round-trips);
 - ROWS_PER_STEP graph nodes run per grid step to amortize fixed
   per-step cost (nodes within a step may chain: the loop is sequential
   in-kernel, so v's read of v-1 sees the freshly written row);
 - the in-row insertion chain uses the linear-gap doubling trick
   y <- max(y, shift(y, off) - gap*off), identical to the XLA path;
 - per-node dirs/H rows stream to HBM through the output windows.

The graph topology (bases, predecessor table) rides in scalar-prefetch
SMEM; one grid axis walks problems, the inner axis walks node blocks
sequentially.  VMEM bounds the problem size: N*(L+1) int32 must fit in
scratch (~3M cells), which covers every BAR bin; bigger graphs fall
back to the XLA scan in the router.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .poa import MAX_PREDS, NEG

NODES_PER_STEP = 8
MAX_VMEM_CELLS = 3_000_000   # N * Lp guard (int32 H scratch ~12 MB)


def _kernel(bases_ref, preds_ref,                 # scalar prefetch SMEM
            q_ref,                                # VMEM (1, Lp)
            H_out, dirs_ref,                      # outputs
            H,                                    # scratch (N, Lp) int32
            *, n_nodes: int, l_pad: int, l_query: int,
            gap: int, match: int, mismatch: int, nodes_per_step: int):
    p = pl.program_id(0)
    step = pl.program_id(1)
    R = nodes_per_step
    Lp = l_pad
    N = n_nodes

    j_idx = jax.lax.broadcasted_iota(jnp.int32, (1, Lp), 1)
    in_query = j_idx <= l_query            # j = 0..L valid columns
    row0 = jnp.where(in_query, -gap * j_idx, NEG)
    qv = q_ref[0, :].reshape(1, Lp).astype(jnp.int32)

    for r in range(R):
        v = step * R + r
        base = bases_ref[p * N + v]
        s = jnp.where(qv == base, match, mismatch)
        # gather predecessor rows (dynamic sublane slices of scratch)
        prows = []
        any_pred = None
        for slot in range(MAX_PREDS):
            pv = preds_ref[(p * N + v) * MAX_PREDS + slot]
            has = pv >= 0
            any_pred = has if any_pred is None else jnp.logical_or(
                any_pred, has)
            row = H[pl.ds(jnp.maximum(pv, 0), 1), :]
            prows.append(jnp.where(has, row, NEG))
        # no predecessors: slot 0 becomes the virtual start row
        prows[0] = jnp.where(any_pred, prows[0], row0)

        neg_col = jnp.full((1, 1), NEG, jnp.int32)
        best_diag = jnp.full((1, Lp), NEG, jnp.int32)
        slot_diag = jnp.zeros((1, Lp), jnp.int32)
        best_dele = jnp.full((1, Lp), NEG, jnp.int32)
        slot_dele = jnp.zeros((1, Lp), jnp.int32)
        for slot in range(MAX_PREDS):
            # diag[j] = prow[j-1] + s[j-1]: emission of the query char
            # consumed at column j (add BEFORE the shift)
            diag = jnp.concatenate([neg_col, (prows[slot] + s)[:, :-1]],
                                   axis=1)
            upd = diag > best_diag
            best_diag = jnp.where(upd, diag, best_diag)
            slot_diag = jnp.where(upd, slot, slot_diag)
            dele = prows[slot] - gap
            updd = dele > best_dele
            best_dele = jnp.where(updd, dele, best_dele)
            slot_dele = jnp.where(updd, slot, slot_dele)

        h0 = jnp.maximum(best_diag, best_dele)
        move = jnp.where(best_diag >= best_dele, 0, 1)
        slot = jnp.where(best_diag >= best_dele, slot_diag, slot_dele)
        # in-row insertion chain (linear gap: doubling max-scan)
        y = h0
        off = 1
        while off < Lp:
            shifted = jnp.concatenate(
                [jnp.full((1, off), NEG, jnp.int32), y[:, :-off]], axis=1)
            y = jnp.maximum(y, shifted - gap * off)
            off *= 2
        y = jnp.where(in_query, y, NEG)
        ins = y != h0
        move = jnp.where(ins, 2, move)
        dirs = (move + 4 * slot).astype(jnp.uint8)

        H[pl.ds(v, 1), :] = y
        H_out[0, pl.ds(r, 1), :] = y
        dirs_ref[0, pl.ds(r, 1), :] = dirs


def _pad_pow2(n: int, minimum: int = 8) -> int:
    return max(minimum, 1 << (n - 1).bit_length())


@partial(jax.jit, static_argnames=("gap", "match", "mismatch", "interpret"))
def poa_align_scan_pallas(bases, preds, q, gap: int, match: int,
                          mismatch: int, interpret: bool = False):
    """Drop-in Pallas backend for ops.poa.poa_align_scan (one problem).

    Returns (H (N, L+1) int32, dirs (N, L+1) uint8, ends (N,) int32)
    exactly like the XLA scan (values at padded columns may differ —
    callers only read j <= L, matching poa_align's slicing).
    """
    N = bases.shape[0]
    L = q.shape[0]
    R = NODES_PER_STEP
    Np = -(-N // R) * R
    Lp = -(-(L + 1) // 128) * 128
    bases_p = jnp.pad(bases.astype(jnp.int32), (0, Np - N),
                      constant_values=255)
    preds_p = jnp.pad(preds.astype(jnp.int32), ((0, Np - N), (0, 0)),
                      constant_values=-1)
    q_p = jnp.pad(q.astype(jnp.uint8), (0, Lp - L), constant_values=5)

    grid = (1, Np // R)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Lp), lambda p, i, *_: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # (1, R, Lp) blocks: trailing dims (R, Lp) = (8, Lp) tile
            # cleanly on the (8, 128) vreg grid
            pl.BlockSpec((1, R, Lp), lambda p, i, *_: (p, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, Lp), lambda p, i, *_: (p, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((Np, Lp), jnp.int32)],
    )
    H_rows, dirs_rows = pl.pallas_call(
        partial(_kernel, n_nodes=Np, l_pad=Lp, l_query=L, gap=gap,
                match=match, mismatch=mismatch, nodes_per_step=R),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, Np, Lp), jnp.int32),
            jax.ShapeDtypeStruct((1, Np, Lp), jnp.uint8),
        ],
        interpret=interpret,
    )(bases_p, preds_p.reshape(-1), q_p.reshape(1, Lp))

    H = H_rows[0, :N, :L + 1]
    dirs = dirs_rows[0, :N, :L + 1]
    return H, dirs, H[:, L]


def poa_default_backend():
    """Fused Pallas kernel on TPU (opt-in via CACTUS_POA_PALLAS=1 until
    hardware-validated, and only when H fits VMEM), XLA scan else."""
    import os

    if (jax.devices()[0].platform == "tpu"
            and os.environ.get("CACTUS_POA_PALLAS", "") == "1"):
        from .poa import poa_align_scan

        def route(bases, preds, q, gap, match, mismatch):
            Lp = -(-(int(q.shape[0]) + 1) // 128) * 128
            if int(bases.shape[0]) * Lp <= MAX_VMEM_CELLS:
                return poa_align_scan_pallas(bases, preds, q, gap=gap,
                                             match=match,
                                             mismatch=mismatch)
            return poa_align_scan(bases, preds, q, gap=gap, match=match,
                                  mismatch=mismatch)
        return route
    from .poa import poa_align_scan
    return poa_align_scan
