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

_CHAIN_CONSTS: dict[tuple, list] = {}


def _chain_consts(Bp: int, o1: int, e1: int, o2: int, e2: int):
    """Precomputed tropical-matrix powers for the in-row convex chain.

    The A-matrix evolution in _maxplus_chain (ops/poa.py:328) is
    data-independent — only (Bp, gap params) shape it — so the per-node
    kernel can skip 8 shifts + 12 max/adds per doubling step and use
    these (1, Bp) int32 constants instead.  Same int32 arithmetic and
    NEG clamps as the traced version (values are <= 0; sums stay above
    int32 min)."""
    key = (Bp, o1, e1, o2, e2)
    got = _CHAIN_CONSTS.get(key)
    if got is not None:
        return got
    A11 = np.full((1, Bp), -e1, np.int32)
    A12 = np.full((1, Bp), -(o1 + e1), np.int32)
    A21 = np.full((1, Bp), -(o2 + e2), np.int32)
    A22 = np.full((1, Bp), -e2, np.int32)
    consts = []
    off = 1
    while off < Bp:
        consts.append((A11, A12, A21, A22))

        def sh(x, off=off):
            return np.concatenate(
                [np.full((1, off), NEG, np.int32), x[:, :-off]], axis=1)
        G11, G12 = sh(A11), sh(A12)
        G21, G22 = sh(A21), sh(A22)
        nA11 = np.maximum(np.maximum(A11 + G11, A12 + G21), NEG)
        nA12 = np.maximum(np.maximum(A11 + G12, A12 + G22), NEG)
        nA21 = np.maximum(np.maximum(A21 + G11, A22 + G21), NEG)
        nA22 = np.maximum(np.maximum(A21 + G12, A22 + G22), NEG)
        A11, A12, A21, A22 = nA11, nA12, nA21, nA22
        off *= 2
    _CHAIN_CONSTS[key] = consts
    return consts

def _affine_kernel(llen_ref, submat_ref,                # scalar prefetch
                   q_ref,                               # (G, 1, Lq) VMEM
                   chain_ref,                           # (4K, Bp) VMEM
                   nslots_ref,                          # (G, 1, S) SMEM
                   bases_ref,                           # (G, 1, Np) SMEM
                   preds_ref,                           # (G,1,Np*MP) SMEM
                   off_ref,                             # (G, 1, Np) SMEM
                   H_out, dirs_ref,                     # outputs
                   *scratch,                            # 3G x (Np, Bp)
                   n_nodes: int, band: int, b_pad: int, l_pad: int,
                   o1: int, e1: int, o2: int, e2: int,
                   nodes_per_step: int, n_group: int):
    """G problems per program, packed on the SUBLANE axis: the node
    body is vector-instruction-bound on (1, Bp) rows (measured: static
    vs dynamic addressing makes no difference), so G problems share the
    same instruction stream with G× the data.  Scratch is (Np, G*Bp)
    2D — a 3D (Np, G, Bp) layout would pad the G sublane dim to 8 and
    4x the VMEM.  Node topology rides per-problem SMEM block windows
    (whole-table scalar prefetch exceeded the 1 MB SMEM above P=8)."""
    step = pl.program_id(1)
    pg = pl.program_id(0)
    R = nodes_per_step
    N = n_nodes
    B = band
    Bp = b_pad
    Lq = l_pad
    G = n_group
    Hs, F1s, F2s = (scratch[:G], scratch[G:2 * G], scratch[2 * G:3 * G])
    # per-problem true query length as a (G, 1) column
    L = jnp.stack([llen_ref[pg * G + g] for g in range(G)]).reshape(G, 1)

    b_idx = jax.lax.broadcasted_iota(jnp.int32, (G, Bp), 1)

    # match the XLA scan's NEG init: preds may point at rows the scan
    # has not reached yet (see the linear kernel's note)
    @pl.when(step == 0)
    def _init():
        for buf in scratch:
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
    for g in range(1, G):
        ns = jnp.maximum(ns, nslots_ref[g, 0, step])

    @pl.when(ns <= 1)
    def _fast():
        _affine_nodes(1, step, L, b_idx, row0_at, q_ref,
                      bases_ref, preds_ref, off_ref, submat_ref,
                      chain_ref, H_out, dirs_ref, Hs, F1s, F2s,
                      R=R, N=N, B=B, Bp=Bp, Lq=Lq, G=G,
                      o1=o1, e1=e1, o2=o2, e2=e2)

    @pl.when(ns > 1)
    def _full():
        _affine_nodes(MAX_PREDS, step, L, b_idx, row0_at, q_ref,
                      bases_ref, preds_ref, off_ref, submat_ref,
                      chain_ref, H_out, dirs_ref, Hs, F1s, F2s,
                      R=R, N=N, B=B, Bp=Bp, Lq=Lq, G=G,
                      o1=o1, e1=e1, o2=o2, e2=e2)


def _affine_nodes(n_slots, step, L, b_idx, row0_at, q_ref,
                  bases_ref, preds_ref, off_ref, submat_ref,
                  chain_ref, H_out, dirs_ref, Hs, F1s, F2s,
                  *, R, N, B, Bp, Lq, G, o1, e1, o2, e2):
    for r in range(R):
        v = step * R + r
        offs = [off_ref[g, 0, v] for g in range(G)]
        off_col = jnp.stack(offs).reshape(G, 1)
        j = off_col + b_idx
        # query codes at columns j (per problem): cyclic left-roll by
        # off; wrap lanes are masked by `valid` downstream
        qv = jnp.concatenate(
            [pltpu.roll(q_ref[g, 0:1, :].astype(jnp.int32),
                        jnp.remainder(-offs[g], Lq), axis=1)[:, :Bp]
             for g in range(G)], axis=0)                     # (G, Bp)
        base_col = jnp.stack(
            [bases_ref[g, 0, v] for g in range(G)]).reshape(G, 1)
        s = jnp.zeros((G, Bp), jnp.int32)
        for bcode in range(6):
            row_s = jnp.zeros((G, Bp), jnp.int32)
            for t in range(6):
                row_s = jnp.where(qv == t, submat_ref[bcode, t], row_s)
            s = jnp.where(base_col == bcode, row_s, s)

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
                # ONE dynamic-amount roll per (g, slot): H/F1/F2 rows
                # share the band shift; the diagonal row is a static
                # rotate-by-1 of the rolled H row.  Each problem owns
                # its own (Np, Bp) scratch triple — dynamic sublane
                # loads/stores must start at lane 0 on Mosaic.
                rows3 = jnp.concatenate(
                    [Hs[g][pl.ds(pidx, 1), :],
                     F1s[g][pl.ds(pidx, 1), :],
                     F2s[g][pl.ds(pidx, 1), :]], axis=0)
                rolled = pltpu.roll(rows3, amt, axis=1)
                hrow = rolled[0:1, :]
                ok_g = has & (gidx >= 0) & (gidx < B)
                hp_g.append(jnp.where(ok_g, hrow, NEG))
                f1_g.append(jnp.where(ok_g, rolled[1:2, :], NEG))
                f2_g.append(jnp.where(ok_g, rolled[2:3, :], NEG))
                hd = jnp.concatenate([hrow[:, -1:], hrow[:, :-1]],
                                     axis=1)
                ok_d = has & (gidx >= 1) & (gidx <= B)
                hd_g.append(jnp.where(ok_d, hd, NEG))
            Hp.append(jnp.concatenate(hp_g, axis=0))
            F1p.append(jnp.concatenate(f1_g, axis=0))
            F2p.append(jnp.concatenate(f2_g, axis=0))
            Hd.append(jnp.concatenate(hd_g, axis=0))
        # bool scalars can't relayout on Mosaic ("insertion of minor
        # dim ... only for 32-bit types"): stack as int32, compare
        any_col = jnp.stack([f.astype(jnp.int32)
                             for f in any_flags]).reshape(G, 1) > 0
        vHp = row0_at(j)
        vHd = row0_at(j - 1)
        Hp[0] = jnp.where(any_col, Hp[0], vHp)
        Hd[0] = jnp.where(any_col, Hd[0], vHd)

        # F_k over open/extend candidates (argmax decode, first-max-wins
        # with candidate order [opens slots 0..3, extends slots 0..3])
        def maxdec(cands):
            best = cands[0]
            arg = jnp.zeros((G, Bp), jnp.int32)
            for ci in range(1, len(cands)):
                upd = cands[ci] > best
                best = jnp.where(upd, cands[ci], best)
                arg = jnp.where(upd, ci, arg)
            return best, arg

        F1n, a1 = maxdec([h - (o1 + e1) for h in Hp]
                         + [f - e1 for f in F1p])
        F2n, a2 = maxdec([h - (o2 + e2) for h in Hp]
                         + [f - e2 for f in F2p])
        f1_slot, f1_ext = a1 % n_slots, a1 // n_slots
        f2_slot, f2_ext = a2 % n_slots, a2 // n_slots
        diag, dslot = maxdec([h + s for h in Hd])
        h0 = jnp.maximum(diag, jnp.maximum(F1n, F2n))

        # in-row convex insertion chains: two INDEPENDENT doubling
        # max-scans (cross-model mixing terms are strictly dominated
        # for o1,o2 > 0 — see ops/poa.py:_maxplus_chain; halves the
        # chain op count, the kernel's hottest loop)
        neg1 = jnp.full((G, 1), NEG, jnp.int32)
        def sr1(x):
            return jnp.concatenate([neg1, x[:, :-1]], axis=1)
        y1 = sr1(h0) - (o1 + e1)
        y2 = sr1(h0) - (o2 + e2)
        offk = 1
        while offk < Bp:
            def sh(x, o=offk):
                return jnp.concatenate(
                    [jnp.full((G, o), NEG, jnp.int32), x[:, :-o]], axis=1)
            y1 = jnp.maximum(jnp.maximum(y1, sh(y1) - e1 * offk), NEG)
            y2 = jnp.maximum(jnp.maximum(y2, sh(y2) - e2 * offk), NEG)
            offk *= 2
        E1, E2 = y1, y2
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

        for g in range(G):
            Hs[g][pl.ds(v, 1), :] = Hn[g:g + 1, :]
            F1s[g][pl.ds(v, 1), :] = F1n[g:g + 1, :]
            F2s[g][pl.ds(v, 1), :] = F2n[g:g + 1, :]
            H_out[g, pl.ds(r, 1), :] = Hn[g:g + 1, :]
            dirs_ref[g, pl.ds(r, 1), :] = dirs[g:g + 1, :]


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
def _affine_call(P: int, Np: int, B: int, Bp: int, Lq: int,
                 o1: int, e1: int, o2: int, e2: int, R: int,
                 chain_rows: int, G: int, interpret: bool):
    """Construct (once per static signature) the raw pallas_call.

    The call is invoked DIRECTLY (one eager XLA dispatch), not through
    a jax.jit wrapper: on the remote-relay backend a pjit-decorated
    wrapper measured ~20 ms of per-call dispatch overhead around a
    0.5 ms kernel — 40x of pure launch tax.  Host-side prep/epilogue
    moved to numpy for the same reason."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P // G, Np // R),
        in_specs=[
            # (P, 1, Lq): a (G, 1, Lq) block satisfies the (8, 128)
            # tiling rule (last two dims equal the array dims)
            pl.BlockSpec((G, 1, Lq), lambda p, i, *_: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            # precomputed tropical chain matrix powers (4K, Bp)
            pl.BlockSpec((chain_rows, Bp), lambda p, i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            # per-PROBLEM topology rows in SMEM (NOT scalar prefetch:
            # whole-table prefetch exceeded the 1 MB SMEM at real batch
            # sizes and dominated per-call dispatch; blocks must keep
            # their trailing dims equal to the array dims — the (8,128)
            # tiling rule applies to SMEM blocks too)
            pl.BlockSpec((G, 1, Np // R), lambda p, i, *_: (p, 0, 0),
                         memory_space=pltpu.SMEM),            # nslots
            pl.BlockSpec((G, 1, Np), lambda p, i, *_: (p, 0, 0),
                         memory_space=pltpu.SMEM),            # bases
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
        scratch_shapes=[pltpu.VMEM((Np, Bp), jnp.int32)] * (3 * G),
    )
    return pl.pallas_call(
        partial(_affine_kernel, n_nodes=Np, band=B, b_pad=Bp, l_pad=Lq,
                o1=o1, e1=e1, o2=o2, e2=e2, nodes_per_step=R,
                n_group=G),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((P, Np, Bp), jnp.int32),
            jax.ShapeDtypeStruct((P, Np, Bp), jnp.int32),
        ],
        interpret=interpret,
    )


@lru_cache(maxsize=None)
def _batch_jit(band: int, o1: int, e1: int, o2: int, e2: int,
               interpret: bool):
    """jit closure per static signature, called with POSITIONAL args
    only: calling a static_argnames-decorated pjit with keyword statics
    measured ~20 ms of per-call HOST dispatch on the relay backend
    (shape-invariant; the kernel itself is ~0.5 ms) — the positional
    fast path dispatches in microseconds."""
    def impl(bases, preds, off, q_ext, l_len, submat):
        return _batch_impl(bases, preds, off, q_ext, l_len, submat,
                           band, o1, e1, o2, e2, interpret)
    return jax.jit(impl)


def poa_align_scan_affine_pallas_batch(bases, preds, off, q_ext, l_len,
                                       submat, band: int, o1: int,
                                       e1: int, o2: int, e2: int,
                                       interpret: bool = False):
    """Batched fused convex POA: P independent problems on grid axis 0.

    bases (P, N) uint8; preds (P, N, MAX_PREDS); off (P, N); q_ext
    (P, Lq) with q_ext[:, 0] = pad; l_len (P,) true query lengths.
    Returns (H (P, N, B) int32, dirs (P, N, B) int32 with the
    poa_align_scan_affine bit layout, ends (P, N))."""
    return _batch_jit(band, o1, e1, o2, e2, interpret)(
        bases, preds, off, q_ext, l_len, submat)


def _batch_impl(bases, preds, off, q_ext, l_len,
                submat, band: int, o1: int,
                e1: int, o2: int, e2: int,
                interpret: bool = False):
    P, N = bases.shape
    B = band
    Lp1 = q_ext.shape[1]
    R = NODES_PER_STEP
    Np = -(-N // R) * R
    Bp = -(-B // 128) * 128
    Lq = max(-(-Lp1 // 128) * 128, Bp)
    bases_p = jnp.pad(bases.astype(jnp.int32), ((0, 0), (0, Np - N)),
                      constant_values=255)
    preds_p = jnp.pad(preds.astype(jnp.int32),
                      ((0, 0), (0, Np - N), (0, 0)), constant_values=-1)
    off_p = jnp.pad(off.astype(jnp.int32), ((0, 0), (0, Np - N)))
    q_p = jnp.pad(q_ext.astype(jnp.uint8), ((0, 0), (0, Lq - Lp1)),
                  constant_values=5)
    chain_arr = np.concatenate(
        [np.concatenate(step4, axis=0)
         for step4 in _chain_consts(Bp, o1, e1, o2, e2)], axis=0)
    # per-(problem, step) pred-slot requirement for the kernel's
    # fast-path dispatch (slots are packed from 0, so the count is the
    # highest valid slot index + 1, floored at 1)
    slot_idx = jnp.where(preds_p >= 0,
                         jnp.arange(1, MAX_PREDS + 1, dtype=jnp.int32),
                         0).max(axis=2)                      # (P, Np)
    nslots = jnp.maximum(
        slot_idx.reshape(P, Np // R, R).max(axis=2), 1
    ).astype(jnp.int32)                                      # (P, steps)

    # group problems on the sublane axis; pad P to a multiple of G
    G = _group_size(Np, Bp)
    Pp = -(-P // G) * G
    if Pp != P:
        zpad = ((0, Pp - P), (0, 0))
        bases_p = jnp.pad(bases_p, zpad, constant_values=255)
        off_p = jnp.pad(off_p, zpad)
        preds_p = jnp.pad(preds_p, ((0, Pp - P), (0, 0), (0, 0)),
                          constant_values=-1)
        q_p = jnp.pad(q_p, zpad, constant_values=5)
        nslots = jnp.pad(nslots, zpad, constant_values=1)
        l_len_p = jnp.pad(l_len.astype(jnp.int32), (0, Pp - P))
    else:
        l_len_p = l_len.astype(jnp.int32)

    call = _affine_call(Pp, Np, B, Bp, Lq, o1, e1, o2, e2, R,
                        chain_arr.shape[0], G, interpret)
    H_rows, dirs_rows = call(
        l_len_p, submat.astype(jnp.int32),
        q_p.reshape(Pp, 1, Lq), jnp.asarray(chain_arr),
        nslots[:, None, :], bases_p[:, None, :],
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
