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

import os as _os
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

    # nodes may reference not-yet-computed rows (add_alignment appends
    # nodes out of index order); the XLA scan reads those as its NEG
    # init — match it (uninitialized VMEM is garbage otherwise)
    @pl.when(step == 0)
    def _init():
        H[...] = jnp.full(H.shape, NEG, jnp.int32)

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
    """Fused Pallas kernel on TPU (hardware-validated 2026-08-19 on a
    v5e: H/dirs/ends bit-identical to the XLA scan incl. forward-pred
    graphs; opt-out via CACTUS_POA_PALLAS=0; VMEM-guarded), XLA scan
    else."""
    import os

    if (jax.devices()[0].platform == "tpu"
            and os.environ.get("CACTUS_POA_PALLAS", "1") == "1"):
        from .poa import poa_align_scan

        dev = jax.devices()[0]

        def route(bases, preds, q, gap, match, mismatch):
            Lp = -(-(int(q.shape[0]) + 1) // 128) * 128
            if int(bases.shape[0]) * Lp <= MAX_VMEM_CELLS:
                # inputs may be CPU-committed (smart_put); Pallas only
                # lowers on the TPU device
                put = lambda x: jax.device_put(x, dev)
                return poa_align_scan_pallas(put(bases), put(preds),
                                             put(q), gap=gap,
                                             match=match,
                                             mismatch=mismatch)
            return poa_align_scan(bases, preds, q, gap=gap, match=match,
                                  mismatch=mismatch)
        return route
    from .poa import poa_align_scan
    return poa_align_scan


# --------------------------------------------------------------------------
# convex (dual-affine) kernel — poa_align_scan_affine's fused backend
# --------------------------------------------------------------------------

def _node_gather_general(n_slots, v, offs, b_idx, row0_at, j,
                         preds_ref, off_ref, Hs, F1s, F2s, *, B, Bp, G):
    """Predecessor band rows for one node, arbitrary topology.

    Loads the (H, F1, F2) triple per (problem, slot) from the three
    (Np, G, Bp) scratch planes and aligns the pred band to this node's
    offset with one dynamic-amount lane roll."""
    any_flags = [None] * G
    Hp, F1p, F2p, Hd = [], [], [], []
    for slot in range(n_slots):
        hp_g, f1_g, f2_g, hd_g = [], [], [], []
        for g in range(G):
            pv = preds_ref[g, 0, v * MAX_PREDS + slot]
            has = pv >= 0
            any_flags[g] = has if any_flags[g] is None else \
                jnp.logical_or(any_flags[g], has)
            pidx = jnp.maximum(pv, 0)
            d = offs[g] - off_ref[g, 0, pidx]
            gidx = d + b_idx[0:1, :]
            amt = jnp.remainder(-d, Bp)
            rows3 = jnp.concatenate(
                [Hs[pl.ds(pidx, 1), g, :],
                 F1s[pl.ds(pidx, 1), g, :],
                 F2s[pl.ds(pidx, 1), g, :]], axis=0)
            rolled = pltpu.roll(rows3, amt, axis=1)
            hrow = rolled[0:1, :]
            ok_g = has & (gidx >= 0) & (gidx < B)
            hp_g.append(jnp.where(ok_g, hrow, NEG))
            f1_g.append(jnp.where(ok_g, rolled[1:2, :], NEG))
            f2_g.append(jnp.where(ok_g, rolled[2:3, :], NEG))
            hd = jnp.concatenate([hrow[:, -1:], hrow[:, :-1]], axis=1)
            ok_d = has & (gidx >= 1) & (gidx <= B)
            hd_g.append(jnp.where(ok_d, hd, NEG))
        Hp.append(jnp.concatenate(hp_g, axis=0))
        F1p.append(jnp.concatenate(f1_g, axis=0))
        F2p.append(jnp.concatenate(f2_g, axis=0))
        Hd.append(jnp.concatenate(hd_g, axis=0))
    # source nodes read the virtual start row instead (bool scalars
    # can't relayout on Mosaic: stack as int32, compare)
    any_col = jnp.stack([f.astype(jnp.int32)
                         for f in any_flags]).reshape(G, 1) > 0
    Hp[0] = jnp.where(any_col, Hp[0], row0_at(j))
    Hd[0] = jnp.where(any_col, Hd[0], row0_at(j - 1))
    return Hp, F1p, F2p, Hd


def _affine_nodes(n_slots, linear, step, L, b_idx, row0_at, qt_ref,
                  bases_ref, preds_ref, off_ref, H_out, dirs_ref,
                  Hs, F1s, F2s,
                  *, R, B, Bp, G, o1, e1, o2, e2, valtab, w):
    pen1, pen2 = o1 + e1, o2 + e2
    # ramp constants for the convex chains (see the chain comment
    # below); both models ride one PACKED (2G, Bp) prefix-max
    b2 = jnp.concatenate([b_idx, b_idx], axis=0)                # (2G, Bp)
    eRow = jnp.concatenate([jnp.full((G, 1), e1, jnp.int32),
                            jnp.full((G, 1), e2, jnp.int32)], axis=0)
    oRow = jnp.concatenate([jnp.full((G, 1), o1, jnp.int32),
                            jnp.full((G, 1), o2, jnp.int32)], axis=0)
    rampZ = eRow * b2                                           # (2G, Bp)
    rampE = rampZ + oRow
    neg1 = jnp.full((G, 1), NEG, jnp.int32)
    neg2 = jnp.full((2 * G, 1), NEG, jnp.int32)
    prevH = prevF1 = prevF2 = None
    off_prev = None
    for r in range(R):
        v = step * R + r
        offs = [off_ref[g, 0, v] for g in range(G)]
        off_col = jnp.stack(offs).reshape(G, 1)
        j = off_col + b_idx
        # substitution row from the CLASS-PACKED strided window table:
        # qt[g, j0, b] holds, for query position j0+b, the 6 per-base
        # class indices at w bits each; one dynamic-sublane load aligns
        # the node's band window, then shift/mask + a static select
        # chain over the (compile-time) distinct submat values
        qp = jnp.concatenate(
            [qt_ref[g, pl.ds(offs[g], 1), :] for g in range(G)], axis=0)
        base_col = jnp.stack(
            [bases_ref[g, 0, v] for g in range(G)]).reshape(G, 1)
        cls = (qp >> (base_col * w)) & ((1 << w) - 1)
        s = jnp.full((G, Bp), valtab[0], jnp.int32)
        for k in range(1, len(valtab)):
            s = jnp.where(cls == k, valtab[k], s)

        if linear:
            # whole step certified: single pred = v-1, delta d in
            # {0, 1}; the pred triple is CARRIED IN REGISTERS across
            # the step as three (G, Bp) planes and the roll collapses
            # to a static rotate-by-one select — no dynamic loads, no
            # dynamic rolls, no per-problem loops
            if prevH is None:
                prevH = Hs[pl.ds(v - 1, 1), :, :][0]
                prevF1 = F1s[pl.ds(v - 1, 1), :, :][0]
                prevF2 = F2s[pl.ds(v - 1, 1), :, :][0]
                off_prev = jnp.stack(
                    [off_ref[g, 0, v - 1] for g in range(G)]).reshape(G, 1)
            d_col = off_col - off_prev                          # (G, 1)
            shift1 = d_col > 0
            def rot(x):
                return jnp.concatenate([x[:, 1:], x[:, :1]], axis=1)
            hrow = jnp.where(shift1, rot(prevH), prevH)
            f1r = jnp.where(shift1, rot(prevF1), prevF1)
            f2r = jnp.where(shift1, rot(prevF2), prevF2)
            gidx = d_col + b_idx
            ok_g = gidx < B                                     # gidx >= 0
            Hp = [jnp.where(ok_g, hrow, NEG)]
            F1p = [jnp.where(ok_g, f1r, NEG)]
            F2p = [jnp.where(ok_g, f2r, NEG)]
            hd = jnp.concatenate([hrow[:, -1:], hrow[:, :-1]], axis=1)
            Hd = [jnp.where(gidx >= 1, hd, NEG)]                # gidx <= B
        else:
            Hp, F1p, F2p, Hd = _node_gather_general(
                n_slots, v, offs, b_idx, row0_at, j,
                preds_ref, off_ref, Hs, F1s, F2s, B=B, Bp=Bp, G=G)

        # F_k over open/extend candidates (argmax decode, first-max-wins
        # with candidate order [opens slots 0..n-1, extends slots 0..n-1])
        def maxdec(cands):
            best = cands[0]
            arg = jnp.zeros((G, Bp), jnp.int32)
            for ci in range(1, len(cands)):
                upd = cands[ci] > best
                best = jnp.where(upd, cands[ci], best)
                arg = jnp.where(upd, ci, arg)
            return best, arg

        ns = len(Hp)
        F1n, a1 = maxdec([h - pen1 for h in Hp] + [f - e1 for f in F1p])
        F2n, a2 = maxdec([h - pen2 for h in Hp] + [f - e2 for f in F2p])
        f1_slot, f1_ext = a1 % ns, a1 // ns
        f2_slot, f2_ext = a2 % ns, a2 // ns
        diag, dslot = maxdec([h + s for h in Hd])
        h0 = jnp.maximum(diag, jnp.maximum(F1n, F2n))

        # in-row convex insertion chains: E_k[b] = max_{k'>=1}
        # (h0[b-k'] - o_k - e_k k').  With Z = h0 + e_k*b this is a
        # shifted PREFIX-MAX of Z minus (o_k + e_k*b) — the banded
        # kernel's ramp trick: the Kogge-Stone rounds are one shift +
        # one max each (no per-round subtract/clamp), both gap models
        # packed on the sublane axis.  The final NEG floor reproduces
        # the traced chain's per-round clamps exactly (max is monotone:
        # intermediate clamps only ever raise sub-NEG values to NEG,
        # which the final floor does too).
        def sr1(x, nc=neg1):
            return jnp.concatenate([nc, x[:, :-1]], axis=1)
        z2 = jnp.concatenate([h0, h0], axis=0) + rampZ
        y = sr1(z2, neg2)
        offk = 1
        while offk < Bp:
            y = jnp.maximum(
                y, jnp.concatenate(
                    [jnp.full((2 * G, offk), NEG, jnp.int32),
                     y[:, :-offk]], axis=1))
            offk *= 2
        y = jnp.maximum(y - rampE, NEG)
        E1, E2 = y[:G], y[G:]
        Hn = jnp.maximum(h0, jnp.maximum(E1, E2))
        valid = (j <= L) & (b_idx < B)
        Hn = jnp.where(valid, Hn, NEG)
        E1 = jnp.where(valid, E1, NEG)
        E2 = jnp.where(valid, E2, NEG)
        F1n = jnp.where(valid, F1n, NEG)
        F2n = jnp.where(valid, F2n, NEG)

        move = jnp.where(Hn == diag, 0,
                jnp.where(Hn == F1n, 1,
                 jnp.where(Hn == F2n, 2,
                  jnp.where(Hn == E1, 3, 4))))
        e1_ext = (E1 == sr1(E1) - e1).astype(jnp.int32)
        e2_ext = (E2 == sr1(E2) - e2).astype(jnp.int32)
        dirs = (move + 8 * dslot + 32 * f1_slot + 128 * f1_ext
                + 256 * f2_slot + 1024 * f2_ext + 2048 * e1_ext
                + 4096 * e2_ext)

        Hs[pl.ds(v, 1), :, :] = Hn[None]
        F1s[pl.ds(v, 1), :, :] = F1n[None]
        F2s[pl.ds(v, 1), :, :] = F2n[None]
        if linear:
            prevH, prevF1, prevF2 = Hn, F1n, F2n
            off_prev = off_col
        H_out[:, r, :] = Hn
        dirs_ref[:, r, :] = dirs


def _affine_kernel(llen_ref,                          # scalar prefetch
                   qt_ref,                            # (G, Lqs, Bp) VMEM
                   bases_ref,                         # (G, 1, Np) SMEM
                   nslots_ref,                        # (G, 1, S) SMEM
                   lin_ref,                           # (G, 1, S) SMEM
                   preds_ref,                         # (G,1,Np*MP) SMEM
                   off_ref,                           # (G, 1, Np) SMEM
                   H_out, dirs_ref,                   # outputs
                   Hs, F1s, F2s,                      # (Np, G, Bp) scratch
                   *, n_nodes: int, band: int, b_pad: int,
                   o1: int, e1: int, o2: int, e2: int,
                   nodes_per_step: int, n_group: int,
                   valtab: tuple, w: int):
    """G problems per program, packed on the SUBLANE axis: the node
    body is vector-instruction-bound on (1, Bp) rows, so G problems
    share the same instruction stream with G× the data.  The (H, F1,
    F2) carries live in three (Np, G, Bp) scratch planes whose (G, Bp)
    trailing dims tile exactly onto (8, 128) vregs — a node store is
    three full-plane row writes, no per-problem slicing.  Substitution
    rows decode from a class-packed strided window table (see
    _batch_impl) with one dynamic-sublane load per problem plus a
    static select chain.  Node topology rides per-problem SMEM block
    windows (whole-table scalar prefetch exceeded the 1 MB SMEM above
    P=8).  Three body variants per step: a certified linear-chain fast
    path (register carries, static shifts), a single-pred path, and
    the full MAX_PREDS path."""
    step = pl.program_id(1)
    pg = pl.program_id(0)
    R = nodes_per_step
    B = band
    Bp = b_pad
    G = n_group
    # per-problem true query length as a (G, 1) column
    L = jnp.stack([llen_ref[pg * G + g] for g in range(G)]).reshape(G, 1)
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (G, Bp), 1)

    # match the XLA scan's NEG init: preds may point at rows the scan
    # has not reached yet (see the linear kernel's note)
    @pl.when(step == 0)
    def _init():
        for buf in (Hs, F1s, F2s):
            buf[...] = jnp.full(buf.shape, NEG, jnp.int32)

    def row0_at(j):
        c = jnp.minimum(o1 + j * e1, o2 + j * e2)
        return jnp.where(j == 0, 0,
                         jnp.where(j > 0, -c, NEG)).astype(jnp.int32)

    # the step's nodes run with exactly as many pred slots as any of
    # them needs (~95% of POA nodes are single-pred).  Outputs are
    # bit-identical: trailing invalid slots contribute NEG rows that
    # can never win a first-max tie, and the a % n // n decode yields
    # the same (slot, ext) pair either way.
    ns = nslots_ref[0, 0, step]
    lin = lin_ref[0, 0, step]
    for g in range(1, G):
        ns = jnp.maximum(ns, nslots_ref[g, 0, step])
        lin = jnp.minimum(lin, lin_ref[g, 0, step])

    args = (step, L, b_idx, row0_at, qt_ref, bases_ref, preds_ref,
            off_ref, H_out, dirs_ref, Hs, F1s, F2s)
    kw = dict(R=R, B=B, Bp=Bp, G=G, o1=o1, e1=e1, o2=o2, e2=e2,
              valtab=valtab, w=w)

    @pl.when(lin > 0)
    def _linear():
        _affine_nodes(1, True, *args, **kw)

    @pl.when((lin == 0) & (ns <= 1))
    def _fast():
        _affine_nodes(1, False, *args, **kw)

    @pl.when((lin == 0) & (ns > 1))
    def _full():
        _affine_nodes(MAX_PREDS, False, *args, **kw)


from functools import lru_cache


def _group_size(Np: int, Bp: int, budget: int = 10 << 20) -> int:
    """Problems per program: bounded by the VMEM scratch budget
    (3 int32 carries of (Np, G*Bp)) and capped at 8 sublanes."""
    g = int(budget // (3 * Np * Bp * 4))
    for cand in (8, 4, 2, 1):
        if g >= cand:
            return cand
    return 1


@lru_cache(maxsize=None)
def _affine_call(P: int, Np: int, B: int, Bp: int, Lqs: int,
                 o1: int, e1: int, o2: int, e2: int, R: int,
                 G: int, valtab: tuple, w: int, interpret: bool):
    """Construct (once per static signature) the raw pallas_call.

    The call is jit-wrapped at the _batch_jit layer together with its
    input prep (padding, window-table build, step flags)."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P // G, Np // R),
        in_specs=[
            # class-packed strided window table, one (G, Lqs, Bp) VMEM
            # block per program (constant across steps): row j0 lane b
            # packs the 6 per-base-code substitution CLASSES of query
            # position j0+b at w bits each
            pl.BlockSpec((G, Lqs, Bp), lambda p, i, *_: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            # per-PROBLEM topology rows in SMEM (NOT scalar prefetch:
            # whole-table prefetch exceeded the 1 MB SMEM at real batch
            # sizes and dominated per-call dispatch; blocks must keep
            # their trailing dims equal to the array dims — the (8,128)
            # tiling rule applies to SMEM blocks too)
            pl.BlockSpec((G, 1, Np), lambda p, i, *_: (p, 0, 0),
                         memory_space=pltpu.SMEM),            # bases
            pl.BlockSpec((G, 1, Np // R), lambda p, i, *_: (p, 0, 0),
                         memory_space=pltpu.SMEM),            # nslots
            pl.BlockSpec((G, 1, Np // R), lambda p, i, *_: (p, 0, 0),
                         memory_space=pltpu.SMEM),            # lin flag
            # preds flattened to (P, 1, Np*MP): a trailing dim of
            # MAX_PREDS would pad to 128 lanes in the SMEM window
            pl.BlockSpec((G, 1, Np * MAX_PREDS),
                         lambda p, i, *_: (p, 0, 0),
                         memory_space=pltpu.SMEM),            # preds
            pl.BlockSpec((G, 1, Np), lambda p, i, *_: (p, 0, 0),
                         memory_space=pltpu.SMEM),            # off row
        ],
        out_specs=[
            pl.BlockSpec((G, R, Bp), lambda p, i, *_: (p, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R, Bp), lambda p, i, *_: (p, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((Np, G, Bp), jnp.int32)] * 3,
    )
    return pl.pallas_call(
        partial(_affine_kernel, n_nodes=Np, band=B, b_pad=Bp,
                o1=o1, e1=e1, o2=o2, e2=e2, nodes_per_step=R,
                n_group=G, valtab=valtab, w=w),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((P, Np, Bp), jnp.int32),
            jax.ShapeDtypeStruct((P, Np, Bp), jnp.int32),
        ],
        interpret=interpret,
    )


@lru_cache(maxsize=None)
def _batch_jit(band: int, o1: int, e1: int, o2: int, e2: int,
               smt: tuple, interpret: bool):
    """jit closure per static signature, called with POSITIONAL args
    only: calling a static_argnames-decorated pjit with keyword statics
    measured ~20 ms of per-call HOST dispatch on the relay backend
    (shape-invariant; the kernel itself is ~0.5 ms) — the positional
    fast path dispatches in microseconds.

    The 6x6 substitution matrix rides in the KEY (smt, 36 ints): its
    distinct values become compile-time constants of the kernel's
    class-decode select chain, and the class-word constants of the
    window-table build."""
    def impl(bases, preds, off, q_ext, l_len):
        return _batch_impl(bases, preds, off, q_ext, l_len, smt,
                           band, o1, e1, o2, e2, interpret)
    return jax.jit(impl)


# biggest single-launch problem count: production BAR bins reach
# P ~ 4000 (150 kb evolver run, dominant (Nb=64, B=64) bin).  The
# GENERAL kernel's Mosaic lowering runs out of HBM well before the
# chain kernel does (measured on a v5e: general OOMs at 32M padded
# cells — P=3975 N=64 B=128 and P=512 N=512 B=128 both fail; the chain
# kernel compiled and ran at 268M cells), so launches are chunked with
# per-path budgets.  Chunking measured no throughput cost.
MAX_BATCH_P = int(_os.environ.get("CACTUS_POA_MAX_BATCH", "2048"))
GENERAL_MAX_CELLS = int(_os.environ.get(
    "CACTUS_POA_GENERAL_MAX_CELLS", "12000000"))


def poa_align_scan_affine_pallas_batch(bases, preds, off, q_ext, l_len,
                                       submat, band: int, o1: int,
                                       e1: int, o2: int, e2: int,
                                       interpret: bool = False,
                                       chain: bool | None = None):
    """Batched fused convex POA: P independent problems on grid axis 0.

    bases (P, N) uint8; preds (P, N, MAX_PREDS); off (P, N); q_ext
    (P, Lq) with q_ext[:, 0] = pad; l_len (P,) true query lengths.
    Returns (H (P, N, B) int32, dirs (P, N, B) int32 with the
    poa_align_scan_affine bit layout, ends (P, N)).

    chain=True certifies every problem is a pure chain (node 0 has no
    pred; node v>0's single pred is v-1; band offsets advance by 0 or
    1) and routes to the register-carry chain kernel — the caller owns
    the certificate when passing device arrays (poa_msa_batch keys its
    shape bins on it); numpy inputs are auto-checked when chain=None.
    Wrong certificates produce wrong alignments, not crashes."""
    smt = tuple(int(x) for x in np.asarray(submat).reshape(-1))
    assert len(smt) == 36, len(smt)
    if chain is None:
        chain = _chain_check_np(preds, off)
    P = int(bases.shape[0])
    if chain:
        max_p = MAX_BATCH_P
    else:
        R = NODES_PER_STEP
        npp = -(-int(bases.shape[1]) // R) * R
        bpp = -(-band // 128) * 128
        max_p = max(8, GENERAL_MAX_CELLS // max(1, npp * bpp))
    if P > max_p:
        outs = []
        for s in range(0, P, max_p):
            e = min(s + max_p, P)
            outs.append(poa_align_scan_affine_pallas_batch(
                bases[s:e], preds[s:e], off[s:e], q_ext[s:e], l_len[s:e],
                submat, band=band, o1=o1, e1=e1, o2=o2, e2=e2,
                interpret=interpret, chain=chain))
        return tuple(jnp.concatenate(parts, axis=0)
                     for parts in zip(*outs))
    if chain and len(set(smt)) <= 32:
        return _chain_batch_jit(band, o1, e1, o2, e2, smt, interpret)(
            bases, off, q_ext, l_len)
    if len(set(smt)) > 32:
        # >32 distinct submat values cannot class-pack into 6 fields of
        # one int32 — fall back to the vmapped XLA scan (bit-identical
        # reference path; unseen in practice: production matrices have
        # a handful of distinct scores)
        from .poa import poa_align_scan_affine
        H, dirs, ends = jax.jit(jax.vmap(
            lambda b, pr, of, qe, ll: poa_align_scan_affine(
                b, pr, of, qe, jnp.asarray(np.asarray(submat), jnp.int32),
                band=band, o1=o1, e1=e1, o2=o2, e2=e2, l_len=ll)))(
            bases, preds, off, q_ext, l_len)
        return H, dirs.astype(jnp.int32), ends
    return _batch_jit(band, o1, e1, o2, e2, smt, interpret)(
        bases, preds, off, q_ext, l_len)


def _batch_impl(bases, preds, off, q_ext, l_len, smt,
                band: int, o1: int,
                e1: int, o2: int, e2: int,
                interpret: bool = False):
    P, N = bases.shape
    B = band
    Lp1 = q_ext.shape[1]
    R = NODES_PER_STEP
    Np = -(-N // R) * R
    Bp = -(-B // 128) * 128
    Lqs = -(-Lp1 // 8) * 8
    preds_p = jnp.pad(preds.astype(jnp.int32),
                      ((0, 0), (0, Np - N), (0, 0)), constant_values=-1)
    off_p = jnp.pad(off.astype(jnp.int32), ((0, 0), (0, Np - N)))
    l_len_i = l_len.astype(jnp.int32)
    bases_p = jnp.pad(bases.astype(jnp.int32), ((0, 0), (0, Np - N)))

    # class-packed strided window table.  The submat's distinct values
    # (compile-time constants) index a per-(base, query-code) class
    # map; the six w-bit class fields of every query position pack into
    # one int32, and 128 STATIC slices build the (P, Lqs, Bp) sliding
    # windows — no gather anywhere (a take_along_axis window gather
    # measured 36 ms/call on a v5e; this whole build is ~0.2 ms)
    sm = np.asarray(smt, np.int64).reshape(6, 6)
    valtab = tuple(sorted(set(int(x) for x in sm.reshape(-1))))
    vidx = {val: k for k, val in enumerate(valtab)}
    w = max(1, (len(valtab) - 1).bit_length())
    clsword = [sum(vidx[int(sm[c, t])] << (c * w) for c in range(6))
               for t in range(6)]
    qc = q_ext.astype(jnp.int32)
    qc = jnp.pad(qc, ((0, 0), (0, Lqs + Bp - Lp1)), constant_values=5)
    cw = jnp.full(qc.shape, clsword[5], jnp.int32)
    for t in range(5):
        cw = jnp.where(qc == t, clsword[t], cw)
    qt = jnp.stack([cw[:, b:b + Lqs] for b in range(Bp)], axis=2)

    # per-(problem, step) pred-slot requirement for the kernel's
    # fast-path dispatch (slots are packed from 0, so the count is the
    # highest valid slot index + 1, floored at 1)
    slot_idx = jnp.where(preds_p >= 0,
                         jnp.arange(1, MAX_PREDS + 1, dtype=jnp.int32),
                         0).max(axis=2)                      # (P, Np)
    nslots = jnp.maximum(
        slot_idx.reshape(P, Np // R, R).max(axis=2), 1
    ).astype(jnp.int32)                                      # (P, steps)
    # certified-chain steps: every node's single pred is v-1 and the
    # band offset advances by 0 or 1 — the kernel's register fast path
    iot = jnp.arange(Np, dtype=jnp.int32)
    prev_off = jnp.concatenate([off_p[:, :1], off_p[:, :-1]], axis=1)
    dd = off_p - prev_off
    islin = ((preds_p[:, :, 0] == iot[None, :] - 1)
             & (slot_idx == 1) & (dd >= 0) & (dd <= 1))
    lin = islin.reshape(P, Np // R, R).all(axis=2).astype(jnp.int32)
    # step 0 always runs the general body: node 0 is the source row
    # (pred -1 matches the v-1 = -1 idiom), and the linear fast path
    # would issue Hs[pl.ds(-1, 1)] for it — correct only through
    # Mosaic's implicit negative-index clamping, which is not a
    # contract (round-5 advisor finding; also covers all-padding
    # groups whose every flag is 1)
    lin = lin.at[:, 0].set(0)

    # group problems on the sublane axis; pad P to a multiple of G
    G = _group_size(Np, Bp)
    Pp = -(-P // G) * G
    if Pp != P:
        zpad = ((0, Pp - P), (0, 0))
        off_p = jnp.pad(off_p, zpad)
        bases_p = jnp.pad(bases_p, zpad)
        preds_p = jnp.pad(preds_p, ((0, Pp - P), (0, 0), (0, 0)),
                          constant_values=-1)
        qt = jnp.pad(qt, ((0, Pp - P), (0, 0), (0, 0)))
        nslots = jnp.pad(nslots, zpad, constant_values=1)
        # pad problems never touch preds on the linear path: flag 1 so
        # they cannot demote a real group to the general path
        lin = jnp.pad(lin, zpad, constant_values=1)
        l_len_p = jnp.pad(l_len_i, (0, Pp - P))
    else:
        l_len_p = l_len_i

    call = _affine_call(Pp, Np, B, Bp, Lqs, o1, e1, o2, e2, R, G,
                        valtab, w, interpret)
    H_rows, dirs_rows = call(
        l_len_p, qt, bases_p[:, None, :],
        nslots[:, None, :], lin[:, None, :],
        preds_p.reshape(Pp, 1, Np * MAX_PREDS), off_p[:, None, :])

    H_all = H_rows[:P, :N, :B]
    dirs = dirs_rows[:P, :N, :B]
    bL = l_len.astype(jnp.int32)[:, None] - off.astype(jnp.int32)[:, :N]
    ends = jnp.where((bL >= 0) & (bL < B),
                     jnp.take_along_axis(
                         H_all, jnp.clip(bL, 0, B - 1)[:, :, None],
                         2)[:, :, 0],
                     NEG)
    return H_all, dirs, ends


def poa_align_scan_affine_pallas(bases, preds, off, q_ext, submat,
                                 band: int, o1: int, e1: int, o2: int,
                                 e2: int, interpret: bool = False):
    """Drop-in Pallas backend for ops.poa.poa_align_scan_affine (single
    problem; see poa_align_scan_affine_pallas_batch)."""
    L = q_ext.shape[0] - 1
    H, dirs, ends = poa_align_scan_affine_pallas_batch(
        bases[None], preds[None], off[None], q_ext[None],
        jnp.asarray([L], jnp.int32), submat, band=band,
        o1=o1, e1=e1, o2=o2, e2=e2, interpret=interpret)
    return H[0], dirs[0].astype(jnp.uint16), ends[0]


def poa_affine_default_backend():
    """Fused Pallas convex kernel on TPU (hardware-validated 2026-08-19
    on a v5e, bit-identical; opt-out via CACTUS_POA_PALLAS=0,
    VMEM-guarded), XLA scan else."""
    import os

    from .poa import poa_align_scan_affine

    if (jax.devices()[0].platform == "tpu"
            and os.environ.get("CACTUS_POA_PALLAS", "1") == "1"):
        dev = jax.devices()[0]

        def route(bases, preds, off, q_ext, submat, band, o1, e1, o2, e2):
            Bp = -(-band // 128) * 128
            if 3 * int(bases.shape[0]) * Bp <= MAX_VMEM_CELLS:
                put = lambda x: jax.device_put(x, dev)
                return poa_align_scan_affine_pallas(
                    put(bases), put(preds), put(off), put(q_ext),
                    put(submat), band=band, o1=o1, e1=e1, o2=o2, e2=e2)
            return poa_align_scan_affine(bases, preds, off, q_ext, submat,
                                         band=band, o1=o1, e1=e1, o2=o2,
                                         e2=e2)
        return route
    return poa_align_scan_affine


# --------------------------------------------------------------------------
# chain-topology fast path — the dominant production bin
# --------------------------------------------------------------------------

# chain-kernel tile knobs (hardware-sweep values; see _chain_tp)
CHAIN_R = int(_os.environ.get("CACTUS_POA_CHAIN_R", "8"))
CHAIN_TP_CAP = int(_os.environ.get("CACTUS_POA_CHAIN_TP", "256"))
assert 128 % CHAIN_R == 0, CHAIN_R


def _chain_tp(P: int, Bp: int) -> int:
    """Problems per program on the SUBLANE axis.  The chain kernel has
    no per-problem scalar work at all (topology rides packed int32
    words, one lane-rotate per step serves every problem), so the only
    cap is VMEM: target ~32 vregs per vector op (TP*Bp = 32k lanes)
    and never fewer than 8 sublanes."""
    cap = max(8, CHAIN_TP_CAP * 128 // Bp)
    tp = 8
    while tp < min(P, cap):
        tp *= 2
    return tp


def _chain_nodes(first, step, b_idx, row0v_ref, row0d_ref,
                 wa_ref, wq_ref, H_out, dirs_ref, cH, cF1, cF2, cQ,
                 *, R, B, Bp, TP, o1, e1, o2, e2, valtab, w):
    pen1, pen2 = o1 + e1, o2 + e2
    b2 = jnp.concatenate([b_idx, b_idx], axis=0)
    eRow = jnp.concatenate([jnp.full((TP, 1), e1, jnp.int32),
                            jnp.full((TP, 1), e2, jnp.int32)], axis=0)
    oRow = jnp.concatenate([jnp.full((TP, 1), o1, jnp.int32),
                            jnp.full((TP, 1), o2, jnp.int32)], axis=0)
    rampZ = eRow * b2
    rampE = rampZ + oRow
    neg1 = jnp.full((TP, 1), NEG, jnp.int32)
    neg2 = jnp.full((2 * TP, 1), NEG, jnp.int32)
    cmask = (1 << w) - 1
    in_off = (step * R) % 128

    def sr1(x, nc=neg1):
        return jnp.concatenate([nc, x[:, :-1]], axis=1)

    if first:
        prevH = prevF1 = prevF2 = None
        qcls = cQ[...]          # initial class-word window (prep-built)
    else:
        prevH, prevF1, prevF2 = cH[...], cF1[...], cF2[...]
        qcls = cQ[...]
    # ONE dynamic lane-rotate per step aligns this step's R node words
    # to lanes 0..R-1; per-row extraction is then a free static slice
    amt = (128 - in_off) % 128
    wa_rot = pltpu.roll(wa_ref[...], amt, axis=1)
    wq_rot = pltpu.roll(wq_ref[...], amt, axis=1)

    for r in range(R):
        # per-node scalars (band delta, node base, valid-lane count,
        # incoming query class word) were bit-packed host-side
        wa = wa_rot[:, r:r + 1]
        wq = wq_rot[:, r:r + 1]
        d_col = wa & 1                                       # (TP, 1)
        base_col = (wa >> 1) & 7
        nv_col = wa >> 4
        shift1 = d_col > 0

        if first and r == 0:
            # the chain's source node: virtual start row only
            Hp = row0v_ref[...]
            Hd = row0d_ref[...]
            F1p = jnp.full((TP, Bp), NEG, jnp.int32)
            F2p = F1p
        else:
            # band window advanced by d: shift the query-class carry
            # and the register-carried DP triple together
            qcls = jnp.where(
                shift1, jnp.concatenate([qcls[:, 1:], wq], axis=1), qcls)

            def rot(x):
                return jnp.concatenate([x[:, 1:], x[:, :1]], axis=1)
            hrow = jnp.where(shift1, rot(prevH), prevH)
            gidx = d_col + b_idx
            ok_g = gidx < B                                  # gidx >= 0
            Hp = jnp.where(ok_g, hrow, NEG)
            F1p = jnp.where(ok_g, jnp.where(shift1, rot(prevF1), prevF1),
                            NEG)
            F2p = jnp.where(ok_g, jnp.where(shift1, rot(prevF2), prevF2),
                            NEG)
            hd = jnp.concatenate([hrow[:, -1:], hrow[:, :-1]], axis=1)
            Hd = jnp.where(gidx >= 1, hd, NEG)

        # substitution row from the class-word carry: unpack this
        # node's class field, then a static select over the (few)
        # distinct submat values
        cls = (qcls >> (base_col * w)) & cmask
        s = jnp.full((TP, Bp), valtab[0], jnp.int32)
        for k in range(1, len(valtab)):
            s = jnp.where(cls == k, valtab[k], s)

        # single-slot F decode: candidate order [open, extend]
        F1n = jnp.maximum(Hp - pen1, F1p - e1)
        a1 = (F1p - e1 > Hp - pen1).astype(jnp.int32)
        F2n = jnp.maximum(Hp - pen2, F2p - e2)
        a2 = (F2p - e2 > Hp - pen2).astype(jnp.int32)
        diag = Hd + s
        h0 = jnp.maximum(diag, jnp.maximum(F1n, F2n))

        # packed ramp prefix-max convex chains (see _affine_nodes)
        z2 = jnp.concatenate([h0, h0], axis=0) + rampZ
        y = sr1(z2, neg2)
        offk = 1
        while offk < Bp:
            y = jnp.maximum(
                y, jnp.concatenate(
                    [jnp.full((2 * TP, offk), NEG, jnp.int32),
                     y[:, :-offk]], axis=1))
            offk *= 2
        y = jnp.maximum(y - rampE, NEG)
        E1, E2 = y[:TP], y[TP:]
        Hn = jnp.maximum(h0, jnp.maximum(E1, E2))
        valid = b_idx < nv_col            # nvalid pre-capped at B
        Hn = jnp.where(valid, Hn, NEG)
        E1 = jnp.where(valid, E1, NEG)
        E2 = jnp.where(valid, E2, NEG)
        F1n = jnp.where(valid, F1n, NEG)
        F2n = jnp.where(valid, F2n, NEG)

        move = jnp.where(Hn == diag, 0,
                jnp.where(Hn == F1n, 1,
                 jnp.where(Hn == F2n, 2,
                  jnp.where(Hn == E1, 3, 4))))
        e1_ext = (E1 == sr1(E1) - e1).astype(jnp.int32)
        e2_ext = (E2 == sr1(E2) - e2).astype(jnp.int32)
        dirs = (move + 128 * a1 + 1024 * a2
                + 2048 * e1_ext + 4096 * e2_ext)

        prevH, prevF1, prevF2 = Hn, F1n, F2n
        H_out[:, r, :] = Hn
        dirs_ref[:, r, :] = dirs

    cH[...] = prevH
    cF1[...] = prevF1
    cF2[...] = prevF2
    cQ[...] = qcls


def _chain_kernel(row0v_ref, row0d_ref, qcls0_ref,   # (TP, Bp) VMEM
                  wa_ref, wq_ref,                    # (TP, 128) word slabs
                  H_out, dirs_ref,                   # outputs
                  cH, cF1, cF2, cQ,                  # (TP, Bp) carry
                  *, band: int, b_pad: int,
                  o1: int, e1: int, o2: int, e2: int,
                  nodes_per_step: int, tile_p: int,
                  valtab: tuple, w: int):
    """Fully-linear (chain-topology) POA problems: node v's only pred
    is v-1 with band delta in {0, 1}, so the DP carry is ONE row triple
    held in registers within a step and in (TP, Bp) buffers across
    steps — no (Np, ...) history scratch at all.

    Structured like banded_pallas: TP problems packed on the SUBLANE
    axis with zero per-problem scalar traffic.  Per-node topology
    scalars are bit-packed into one int32 word per (problem, node),
    streamed as (TP, 128) lane slabs and extracted with a single
    lane-select per row; the query codes under the band ride a
    class-word carry that shifts with the band window, so there is no
    window table, no dynamic rolls, and no SMEM loops — the failure
    modes that held the round-4 kernel to ~0.4 Gcells/s.  Bit-identical
    to the XLA scan on chain graphs (single-slot dirs decode: dslot =
    f_slot = 0, ext bits from the 2-candidate argmax)."""
    step = pl.program_id(1)
    R = nodes_per_step
    TP = tile_p
    B = band
    Bp = b_pad
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (TP, Bp), 1)

    kw = dict(R=R, B=B, Bp=Bp, TP=TP, o1=o1, e1=e1, o2=o2, e2=e2,
              valtab=valtab, w=w)

    @pl.when(step == 0)
    def _first():
        cQ[...] = qcls0_ref[...]
        _chain_nodes(True, step, b_idx, row0v_ref,
                     row0d_ref, wa_ref, wq_ref, H_out, dirs_ref,
                     cH, cF1, cF2, cQ, **kw)

    @pl.when(step > 0)
    def _rest():
        _chain_nodes(False, step, b_idx, row0v_ref,
                     row0d_ref, wa_ref, wq_ref, H_out, dirs_ref,
                     cH, cF1, cF2, cQ, **kw)


@lru_cache(maxsize=None)
def _chain_call(P: int, Np: int, B: int, Bp: int,
                o1: int, e1: int, o2: int, e2: int, R: int,
                TP: int, valtab: tuple, w: int, interpret: bool):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(P // TP, Np // R),
        in_specs=[
            pl.BlockSpec((TP, Bp), lambda p, i: (p, 0),
                         memory_space=pltpu.VMEM),            # row0v
            pl.BlockSpec((TP, Bp), lambda p, i: (p, 0),
                         memory_space=pltpu.VMEM),            # row0d
            pl.BlockSpec((TP, Bp), lambda p, i: (p, 0),
                         memory_space=pltpu.VMEM),            # qcls0
            # packed word slabs stream 128 nodes at a time (R | 128)
            pl.BlockSpec((TP, 128), lambda p, i: (p, (i * R) // 128),
                         memory_space=pltpu.VMEM),            # wA
            pl.BlockSpec((TP, 128), lambda p, i: (p, (i * R) // 128),
                         memory_space=pltpu.VMEM),            # wQ
        ],
        out_specs=[
            pl.BlockSpec((TP, R, Bp), lambda p, i: (p, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, R, Bp), lambda p, i: (p, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((TP, Bp), jnp.int32)] * 4,
    )
    return pl.pallas_call(
        partial(_chain_kernel, band=B, b_pad=Bp,
                o1=o1, e1=e1, o2=o2, e2=e2,
                nodes_per_step=R, tile_p=TP, valtab=valtab, w=w),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((P, Np, Bp), jnp.int32),
            jax.ShapeDtypeStruct((P, Np, Bp), jnp.int32),
        ],
        interpret=interpret,
    )


def _pack_submat(smt: tuple):
    """Distinct-value table + class map of a 6x6 int submat (static)."""
    sm = np.asarray(smt, np.int64).reshape(6, 6)
    valtab = tuple(sorted(set(int(x) for x in sm.reshape(-1))))
    vidx = {val: k for k, val in enumerate(valtab)}
    w = max(1, (len(valtab) - 1).bit_length())
    clsword = tuple(sum(vidx[int(sm[c, t])] << (c * w) for c in range(6))
                    for t in range(6))
    return valtab, w, clsword


def _build_qt(q_ext, Lp1: int, Lqs: int, Bp: int, clsword):
    """Class-packed strided window table (P, Lqs, Bp) — see _batch_impl."""
    qc = q_ext.astype(jnp.int32)
    qc = jnp.pad(qc, ((0, 0), (0, Lqs + Bp - Lp1)), constant_values=5)
    cw = jnp.full(qc.shape, clsword[5], jnp.int32)
    for t in range(5):
        cw = jnp.where(qc == t, clsword[t], cw)
    return jnp.stack([cw[:, b:b + Lqs] for b in range(Bp)], axis=2)


@lru_cache(maxsize=None)
def _chain_batch_jit(band: int, o1: int, e1: int, o2: int, e2: int,
                     smt: tuple, interpret: bool):
    def impl(bases, off, q_ext, l_len):
        return _chain_batch_impl(bases, off, q_ext, l_len, smt,
                                 band, o1, e1, o2, e2, interpret)
    return jax.jit(impl)


def _chain_batch_impl(bases, off, q_ext, l_len, smt, band: int,
                      o1: int, e1: int, o2: int, e2: int,
                      interpret: bool = False):
    P, N = bases.shape
    B = band
    R = CHAIN_R
    Np = -(-N // R) * R
    Npc = -(-Np // 128) * 128     # word arrays pad to whole lane slabs
    Bp = -(-B // 128) * 128
    valtab, w, clsword = _pack_submat(smt)

    off_i = off.astype(jnp.int32)
    l_col = l_len.astype(jnp.int32)[:, None]
    qc = q_ext.astype(jnp.int32)
    # class word per query code (tiny select chain over 6 codes)
    cw = jnp.full(qc.shape, clsword[5], jnp.int32)
    for t in range(5):
        cw = jnp.where(qc == t, clsword[t], cw)

    # packed per-node words: wA = d | base<<1 | nvalid<<4,
    # wQ = class word of the column entering the band at lane Bp-1
    d = jnp.concatenate(
        [jnp.zeros((P, 1), jnp.int32), off_i[:, 1:] - off_i[:, :-1]],
        axis=1)
    nvalid = jnp.clip(l_col - off_i + 1, 0, B)
    wA = d | (bases.astype(jnp.int32) << 1) | (nvalid << 4)
    inc_j = jnp.clip(off_i + (Bp - 1), 0, l_col)
    # fused broadcast-compare reduces instead of gathers: XLA TPU
    # take_along_axis lowers to an element gather that measured 3.4 ms
    # at the (1024, 640) production scale; the virtual (P, N, Lq)
    # compare+reduce fuses to 0.8 ms and never materializes
    jt = jnp.arange(cw.shape[1], dtype=jnp.int32)
    wQ = jnp.max(jnp.where(jt[None, None, :] == inc_j[:, :, None],
                           cw[:, None, :], 0), axis=2)
    wA = jnp.pad(wA, ((0, 0), (0, Npc - N)))
    wQ = jnp.pad(wQ, ((0, 0), (0, Npc - N)))

    # initial band window (class words) + virtual start rows
    bb = jnp.arange(Bp, dtype=jnp.int32)[None, :]
    j0 = off_i[:, :1] + bb
    j0c = jnp.clip(j0, 0, l_col)
    qcls0 = jnp.max(jnp.where(jt[None, None, :] == j0c[:, :, None],
                              cw[:, None, :], 0), axis=2)
    conv = jnp.minimum(o1 + j0 * e1, o2 + j0 * e2)
    row0v = jnp.where(j0 == 0, 0,
                      jnp.where(j0 > 0, -conv, NEG)).astype(jnp.int32)
    jm = j0 - 1
    convm = jnp.minimum(o1 + jm * e1, o2 + jm * e2)
    row0d = jnp.where(jm == 0, 0,
                      jnp.where(jm > 0, -convm, NEG)).astype(jnp.int32)

    TP = _chain_tp(P, Bp)
    Pp = -(-P // TP) * TP
    if Pp != P:
        zpad = ((0, Pp - P), (0, 0))
        wA = jnp.pad(wA, zpad)
        wQ = jnp.pad(wQ, zpad)
        qcls0 = jnp.pad(qcls0, zpad)
        row0v = jnp.pad(row0v, zpad, constant_values=NEG)
        row0d = jnp.pad(row0d, zpad, constant_values=NEG)

    call = _chain_call(Pp, Np, B, Bp, o1, e1, o2, e2, R, TP,
                       valtab, w, interpret)
    H_rows, dirs_rows = call(row0v, row0d, qcls0, wA, wQ)

    H_all = H_rows[:P, :N, :B]
    dirs = dirs_rows[:P, :N, :B]
    # masked reduce, not take_along_axis: the gather over the
    # (P, N, B) tensor measured 7.6 ms vs 0.17 ms for the fused
    # compare+max (out-of-band bL rows reduce to all-NEG = oracle)
    bL = l_len.astype(jnp.int32)[:, None] - off_i[:, :N]
    bidx = jnp.arange(B, dtype=jnp.int32)
    ends = jnp.max(jnp.where(bidx[None, None, :] == bL[:, :, None],
                             H_all, NEG), axis=2)
    return H_all, dirs, ends


def _chain_check_np(preds, off) -> bool:
    """Host-side chain-topology certificate (numpy inputs only — a
    device fetch per call would defeat the point; callers with device
    arrays pass chain= explicitly)."""
    if not (isinstance(preds, np.ndarray) and isinstance(off, np.ndarray)):
        return False
    N = preds.shape[1]
    if N < 2:
        return False
    if (preds[:, :, 1:] >= 0).any():
        return False
    if (preds[:, 0, 0] != -1).any():
        return False
    if (preds[:, 1:, 0] != np.arange(N - 1)).any():
        return False
    dd = np.diff(off.astype(np.int64), axis=1)
    return bool(((dd >= 0) & (dd <= 1)).all())
