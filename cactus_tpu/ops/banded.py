"""Batched banded affine-gap pairwise alignment (TPU-first design).

This is the DP workhorse replacing the inner loops of lastz gapped extension
and cPecan's banded aligner (reference: submodules lastz, cPecan
pairwiseAligner.h; banding params at cactus_progressive_config.xml:276-280).

Design
------
Row-wise banded DP in diagonal-band coordinates, batched over pairs:

 - Each pair p aligns q_p (len M_p) vs t_p (len N_p) globally inside a band
   of B diagonals [lo_p, lo_p + B).  The HOST pre-shifts each target into a
   buffer ``t_shift[p, y] = t_p[y + lo_p]`` so the kernel geometry is
   uniform across the batch: row i reads the contiguous slice
   ``t_shift[:, i-1 : i-1+B]`` — a static-width dynamic slice, ideal for
   the VPU (8x128 tiles: batch on sublanes, band on 128 lanes).
 - Affine gaps via the 3-matrix recurrence; the intra-row D-chain
   (gap consuming target) is computed with an O(log B) Kogge-Stone
   max-scan instead of a sequential sweep, so every row is pure vector ops.
 - Direction bits are emitted per cell for host-side traceback
   (bit0-1: H predecessor in {H,I,D}; bit2: I opened fresh; bit3: D opened
   fresh).  Scores/end-state are captured at each pair's true endpoint
   (M_p, N_p) with a masked select, so ragged batches pad to a bin shape
   without affecting results.

Cell updates/s on this kernel is the headline perf metric (BASELINE.md).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG = -(1 << 28)  # -inf substitute, safe against int32 accumulation
PAD_Q = 5         # query pad code
PAD_T = 5         # target pad code


def score_matrix_6(sub_matrix_5x5, pad_score: int = -1000) -> np.ndarray:
    """Extend the 5x5 ACGTN matrix (config XML :312-318) with a pad code."""
    m = np.full((6, 6), pad_score, dtype=np.int32)
    m[:5, :5] = np.asarray(sub_matrix_5x5, dtype=np.int32).reshape(5, 5)
    return m


@dataclass(frozen=True)
class GapParams:
    gap_open: int = 400    # first gap base costs open+extend
    gap_extend: int = 30


# --------------------------------------------------------------------------
# numpy oracle: plain full-matrix affine DP with traceback (small inputs)
# --------------------------------------------------------------------------

def align_affine_np(q: np.ndarray, t: np.ndarray, submat: np.ndarray,
                    gap: GapParams) -> tuple[int, list[tuple[str, int]]]:
    """Global affine alignment, full O(MN) DP.  Test oracle only."""
    M, N = len(q), len(t)
    H = np.full((M + 1, N + 1), NEG, dtype=np.int64)
    I = np.full_like(H, NEG)
    D = np.full_like(H, NEG)
    H[0, 0] = 0
    for j in range(1, N + 1):
        D[0, j] = -(gap.gap_open + j * gap.gap_extend)
    for i in range(1, M + 1):
        I[i, 0] = -(gap.gap_open + i * gap.gap_extend)
    for i in range(1, M + 1):
        si = submat[q[i - 1]]
        for j in range(1, N + 1):
            best_prev = max(H[i - 1, j - 1], I[i - 1, j - 1], D[i - 1, j - 1])
            H[i, j] = best_prev + si[t[j - 1]]
            I[i, j] = max(H[i - 1, j] - gap.gap_open, I[i - 1, j]) - gap.gap_extend
            D[i, j] = max(H[i, j - 1] - gap.gap_open, D[i, j - 1]) - gap.gap_extend
    # traceback
    i, j = M, N
    mats = {0: H, 1: I, 2: D}
    cur = int(np.argmax([H[i, j], I[i, j], D[i, j]]))
    score = int(mats[cur][i, j])
    ops: list[tuple[str, int]] = []

    def push(op):
        if ops and ops[-1][0] == op:
            ops[-1] = (op, ops[-1][1] + 1)
        else:
            ops.append((op, 1))

    while i > 0 or j > 0:
        if cur == 0:
            prev = max(H[i - 1, j - 1], I[i - 1, j - 1], D[i - 1, j - 1])
            nxt = int(np.argmax([H[i - 1, j - 1], I[i - 1, j - 1], D[i - 1, j - 1]]))
            push("M")
            i, j, cur = i - 1, j - 1, nxt
        elif cur == 1:
            fresh = H[i - 1, j] - gap.gap_open >= I[i - 1, j]
            push("I")
            i, cur = i - 1, (0 if fresh else 1)
        else:
            fresh = H[i, j - 1] - gap.gap_open >= D[i, j - 1]
            push("D")
            j, cur = j - 1, (0 if fresh else 2)
    return score, ops[::-1]


# --------------------------------------------------------------------------
# batched banded JAX kernel (XLA path; Pallas variant in banded_pallas.py)
# --------------------------------------------------------------------------

def pack_band_batch(pairs, band: int, submat: np.ndarray | None = None,
                    min_batch: int = 8, min_rows: int = 32):
    """Pack a list of (q_codes, t_codes) into uniform banded-batch arrays.

    Returns dict of arrays: q (P, Mmax) uint8, t_shift (P, Mmax+band) uint8,
    m_len, n_len, lo (P,) int32.  Band offset lo_p is chosen to center the
    [0, N-M] diagonal range; caller must bin pairs so that
    |N_p - M_p| + slack <= band.

    min_batch/min_rows floor the pow2 quantization — callers on a
    cold-compile-expensive backend canonicalize shapes with them (every
    distinct (P, Mmax, band) costs a fresh Mosaic compile).
    """
    # quantize batch and row count to limit distinct jit shapes
    P = max(min_batch, 1 << (len(pairs) - 1).bit_length())
    Mmax = max(len(q) for q, _ in pairs)
    Mmax = max(min_rows, 32, 1 << (Mmax - 1).bit_length())
    q_arr = np.full((P, Mmax), PAD_Q, dtype=np.uint8)
    t_arr = np.full((P, Mmax + band), PAD_T, dtype=np.uint8)
    m_len = np.zeros(P, dtype=np.int32)
    n_len = np.zeros(P, dtype=np.int32)
    lo = np.zeros(P, dtype=np.int32)
    for p, (q, t) in enumerate(pairs):
        M, N = len(q), len(t)
        if abs(N - M) >= band:
            raise ValueError(f"pair {p}: diag span {N - M} exceeds band {band}")
        # center band on the [min(0,N-M), max(0,N-M)] diagonal range
        dmin, dmax = min(0, N - M), max(0, N - M)
        lo_p = dmin - (band - (dmax - dmin)) // 2
        # j = i + lo_p + b must reach j=0 at i=0 (lo_p <= 0) and j=N at i=M
        lo_p = min(lo_p, 0)
        lo_p = max(lo_p, (N - M) - band + 1)
        q_arr[p, :M] = q
        m_len[p] = M
        n_len[p] = N
        lo[p] = lo_p
        # t_shift[y] = t[y + lo_p]
        y0 = max(0, -lo_p)           # first y with valid t index
        src0 = y0 + lo_p             # = max(lo_p, 0)
        n_copy = min(N - src0, Mmax + band - y0)
        if n_copy > 0:
            t_arr[p, y0:y0 + n_copy] = t[src0:src0 + n_copy]
    return dict(q=q_arr, t_shift=t_arr, m_len=m_len, n_len=n_len, lo=lo)


@partial(jax.jit, static_argnames=("band", "gap_open", "gap_extend"))
def banded_align_batch(q, t_shift, m_len, n_len, lo, submat,
                       band: int, gap_open: int, gap_extend: int):
    """Batched banded global affine alignment.

    Returns (dirs (P, Mmax, band) uint8, end_scores (P, 3) int32 [H,I,D at
    endpoint], end_mat (P,) int32 argmax).  Traceback on host.
    """
    P, Mmax = q.shape
    B = band
    submat = submat.astype(jnp.int32)
    b_idx = jnp.arange(B, dtype=jnp.int32)[None, :]          # (1, B)
    lo_c = lo[:, None].astype(jnp.int32)                     # (P, 1)

    # row 0 carry: j = lo + b at i=0
    j0 = lo_c + b_idx
    H0 = jnp.where(j0 == 0, 0, NEG).astype(jnp.int32)
    D0 = jnp.where(j0 > 0, -(gap_open + j0 * gap_extend), NEG).astype(jnp.int32)
    # derive the all-NEG init from H0 so its sharding/varying-axis type
    # matches the scan outputs under shard_map
    negs = 0 * H0 + jnp.int32(NEG)
    I0 = negs

    ext_ramp = (gap_extend * jnp.arange(B, dtype=jnp.int32))[None, :]

    def shift_left(x, fill=NEG):   # x[b] <- x[b+1]
        return jnp.concatenate([x[:, 1:], jnp.full((P, 1), fill, x.dtype)], axis=1)

    def shift_right(x, fill=NEG):  # x[b] <- x[b-1]
        return jnp.concatenate([jnp.full((P, 1), fill, x.dtype), x[:, :-1]], axis=1)

    def row_step(carry, i):
        H, I, D, endH, endI, endD = carry
        qc = jax.lax.dynamic_slice_in_dim(q, i - 1, 1, axis=1)        # (P,1)
        tc = jax.lax.dynamic_slice_in_dim(t_shift, i - 1, B, axis=1)  # (P,B)
        s = submat[qc.astype(jnp.int32), tc.astype(jnp.int32)]        # (P,B)

        # H: diagonal predecessor is the SAME band index in the previous row
        prev_best = jnp.maximum(jnp.maximum(H, I), D)
        h_src = jnp.where(H >= I, 0, 1)
        h_src = jnp.where(D > jnp.maximum(H, I), 2, h_src).astype(jnp.uint8)
        H_new = prev_best + s

        # I (gap consuming query): predecessor band index b+1 in prev row
        H_up = shift_left(H)
        I_up = shift_left(I)
        i_fresh = (H_up - gap_open) >= I_up
        I_new = jnp.maximum(H_up - gap_open, I_up) - gap_extend

        # boundary: j = i + lo + b; j == 0 cells are the left DP boundary
        j = i + lo_c + b_idx
        I_new = jnp.where(j == 0, -(gap_open + i * gap_extend), I_new)
        H_new = jnp.where(j <= 0, NEG, H_new)
        I_new = jnp.where(j < 0, NEG, I_new)

        # D (gap consuming target): intra-row chain via max-scan.
        # D[b] = max_{c<=b} (H_new[c-1] + e*c) - open - e*(b+1)
        Hl = shift_right(H_new)
        Y = Hl + ext_ramp
        # Kogge-Stone inclusive max-scan along the band
        off = 1
        while off < B:
            shifted = jnp.concatenate(
                [jnp.full((P, off), NEG, Y.dtype), Y[:, :-off]], axis=1)
            Y = jnp.maximum(Y, shifted)
            off *= 2
        D_new = Y - gap_open - gap_extend * (b_idx + 1)
        d_fresh = D_new == (Hl - gap_open - gap_extend)
        D_new = jnp.where(j <= 0, NEG, D_new)
        D_new = jnp.maximum(D_new, NEG)
        H_new = jnp.maximum(H_new, NEG)
        I_new = jnp.maximum(I_new, NEG)

        dirs = (h_src
                | (i_fresh.astype(jnp.uint8) << 2)
                | (d_fresh.astype(jnp.uint8) << 3))

        at_end = (i == m_len)[:, None]
        endH = jnp.where(at_end, H_new, endH)
        endI = jnp.where(at_end, I_new, endI)
        endD = jnp.where(at_end, D_new, endD)
        return (H_new, I_new, D_new, endH, endI, endD), dirs

    init = (H0, I0, D0,
            jnp.where((m_len == 0)[:, None], H0, negs),
            negs,
            jnp.where((m_len == 0)[:, None], D0, negs))
    (H, I, D, endH, endI, endD), dirs = jax.lax.scan(
        row_step, init, jnp.arange(1, Mmax + 1))
    dirs = jnp.transpose(dirs, (1, 0, 2))  # (P, Mmax, B)

    b_end = (n_len - m_len - lo).astype(jnp.int32)
    take = lambda mat: jnp.take_along_axis(mat, b_end[:, None], axis=1)[:, 0]
    eh, ei, ed = take(endH), take(endI), take(endD)
    end_scores = jnp.stack([eh, ei, ed], axis=1)
    end_mat = jnp.argmax(end_scores, axis=1).astype(jnp.int32)
    return dirs, end_scores, end_mat


def traceback_band(dirs: np.ndarray, m: int, n: int, lo: int,
                   end_mat: int) -> list[tuple[str, int]]:
    """Host traceback from banded direction bits for one pair.

    dirs is (Mmax, B) uint8 from banded_align_batch; walk from (m, n) back
    to (0, 0).  Returns cigar ops in forward order (M/I/D; I consumes query).
    """
    B = dirs.shape[1]
    i, j, cur = m, n, int(end_mat)
    ops: list[tuple[str, int]] = []

    def push(op):
        if ops and ops[-1][0] == op:
            ops[-1] = (op, ops[-1][1] + 1)
        else:
            ops.append((op, 1))

    while i > 0 or j > 0:
        if i == 0:
            push("D")
            j -= 1
            continue
        if j == 0:
            push("I")
            i -= 1
            continue
        b = j - i - lo
        if not (0 <= b < B):
            raise RuntimeError(f"traceback left the band at ({i},{j}) b={b}")
        byte = int(dirs[i - 1, b])
        if cur == 0:      # in H: M op, predecessor from bits 0-1
            push("M")
            cur = byte & 3
            i -= 1
            j -= 1
        elif cur == 1:    # in I
            push("I")
            cur = 0 if (byte >> 2) & 1 else 1
            i -= 1
        else:             # in D
            push("D")
            cur = 0 if (byte >> 3) & 1 else 2
            j -= 1
    return ops[::-1]


@partial(jax.jit, static_argnames=("S",))
def traceback_band_batch_device(dirs, m_len, n_len, lo, end_mat, S: int):
    """On-device banded traceback, vmapped over the pair batch.

    The direction tensor is (P, Mmax, B) — pulling it to the host costs
    P·Mmax·B bytes over PCIe (or a network tunnel), ~100× the useful
    information.  Walking it on device returns only (P, S) uint8 move
    codes (1=M, 2=I, 3=D, reverse order) + counts: O(m+n) per pair.
    Exactly mirrors traceback_band's transitions.
    """
    B = dirs.shape[2]

    def one(dirs_p, m, n, lo_p, cur0):
        moves0 = jnp.zeros(S, jnp.uint8)

        def cond(st):
            i, j, _cur, _k, _mv = st
            return (i > 0) | (j > 0)

        def body(st):
            i, j, cur, k, mv = st
            b = jnp.clip(j - i - lo_p, 0, B - 1)
            byte = dirs_p[jnp.maximum(i - 1, 0), b]
            at_i0 = i == 0
            at_j0 = (j == 0) & ~at_i0
            normal = ~at_i0 & ~at_j0
            is_h = normal & (cur == 0)
            is_i = normal & (cur == 1)
            is_d = normal & (cur == 2)
            op = jnp.where(at_i0 | is_d, jnp.uint8(3),
                           jnp.where(at_j0 | is_i, jnp.uint8(2),
                                     jnp.uint8(1)))
            di = jnp.where(at_j0 | is_h | is_i, 1, 0)
            dj = jnp.where(at_i0 | is_h | is_d, 1, 0)
            cur = jnp.where(
                is_h, (byte & 3).astype(cur.dtype),
                jnp.where(is_i,
                          jnp.where((byte >> 2) & 1, 0, 1),
                          jnp.where(is_d,
                                    jnp.where((byte >> 3) & 1, 0, 2),
                                    cur)))
            mv = mv.at[k].set(op)
            return (i - di, j - dj, cur, k + 1, mv)

        i0 = m.astype(jnp.int32)
        j0 = n.astype(jnp.int32)
        st = jax.lax.while_loop(
            cond, body, (i0, j0, cur0.astype(jnp.int32),
                         jnp.int32(0), moves0))
        return st[4], st[3]

    return jax.vmap(one)(dirs, m_len, n_len, lo, end_mat)


_OP_CHARS = np.array(["?", "M", "I", "D"])


def moves_to_ops(moves: np.ndarray, count: int) -> list[tuple[str, int]]:
    """Reverse-order move codes → forward cigar ops (host run-length)."""
    mv = moves[:count][::-1]
    if not len(mv):
        return []
    brk = np.flatnonzero(np.diff(mv)) + 1
    starts = np.concatenate([[0], brk])
    ends = np.concatenate([brk, [len(mv)]])
    return [(str(_OP_CHARS[mv[s]]), int(e - s))
            for s, e in zip(starts, ends)]


# Below this many DP cells the dispatch latency to a (possibly remote)
# accelerator outweighs the compute: route the batch to host CPU.
SMALL_BATCH_CELLS = 32_000_000

# Below this many cells the native C++ kernel (threaded, zero dispatch
# latency, no XLA-CPU compile diversity) beats the TPU round trip; the
# Pallas kernel owns everything larger.  Measured on the loopback-relay
# link: ~54 ms/dispatch, ~80 MB/s — native does ~50M cells in that time.
NATIVE_MAX_CELLS = 256_000_000


def moves_to_ops_fwd(moves: np.ndarray) -> list[tuple[str, int]]:
    """Forward-order move codes → cigar ops (host run-length encode)."""
    if not len(moves):
        return []
    brk = np.flatnonzero(np.diff(moves)) + 1
    starts = np.concatenate([[0], brk])
    ends = np.concatenate([brk, [len(moves)]])
    return [(str(_OP_CHARS[moves[s]]), int(e - s))
            for s, e in zip(starts, ends)]


def gap_fallback(qlen: int, tlen: int) -> tuple[int, list]:
    """Unalignable-gap fallback: when the optimal path leaves the band
    (a large balanced insertion+deletion hiding inside one chain gap),
    emit the pure indel pair with a floor score — the caller's
    min_gap_score check then splits the record there, which is the
    lastz ydrop-termination behavior for a non-homologous interval."""
    ops = []
    if qlen:
        ops.append(("I", int(qlen)))
    if tlen:
        ops.append(("D", int(tlen)))
    return NEG, ops


def align_pairs_native(pairs, submat, gap: GapParams, band: int):
    """Native C++ banded batch (bit-identical to the JAX kernels).

    Returns list of (score, cigar_ops) or None if unavailable."""
    from ..native import build as native
    res = native.dp_banded_batch(
        pairs, submat, gap.gap_open, gap.gap_extend,
        np.full(len(pairs), band, np.int32))
    if res is None:
        return None
    scores, moves, moves_off, n_moves = res
    out = []
    for p in range(len(pairs)):
        n = int(n_moves[p])
        if n < 0:
            out.append(gap_fallback(len(pairs[p][0]), len(pairs[p][1])))
            continue
        o = int(moves_off[p])
        out.append((int(scores[p]), moves_to_ops_fwd(moves[o:o + n])))
    return out


def default_backend(cells: int | None = None):
    """Pallas kernel on TPU for large batches; XLA scan on CPU for small
    ones and everywhere TPUs are absent.  Returns (fn, device)."""
    import jax
    if jax.devices()[0].platform == "tpu":
        if cells is None or cells >= SMALL_BATCH_CELLS:
            from .banded_pallas import banded_align_batch_pallas
            return banded_align_batch_pallas, None
        return banded_align_batch, jax.devices("cpu")[0]
    return banded_align_batch, None


def align_pairs_banded(pairs, submat, gap: GapParams, band: int = 128,
                       backend=None,
                       max_batch_bytes: int = 512 << 20):
    """Convenience: pack, run the batched kernel, trace back on host.

    Returns list of (score, cigar_ops) matching `pairs` order.
    """
    if not pairs:
        return []
    if backend is None:
        # native C++ first for modest batches: zero dispatch latency,
        # no XLA-CPU compile diversity, threads over pairs; Pallas/TPU
        # owns large batches (see NATIVE_MAX_CELLS)
        true_cells = sum(len(q) for q, _t in pairs) * band
        if true_cells < NATIVE_MAX_CELLS:
            out = align_pairs_native(pairs, submat, gap, band)
            if out is not None:
                return out
    # split oversized batches: the dirs tensor is P×Mmax×band bytes and a
    # single bin of long, wide-band pairs can otherwise demand >100 GB
    max_m = max(len(q) for q, _t in pairs)
    est_m = max(32, 1 << (max_m - 1).bit_length())
    per_pair_bytes = est_m * band
    max_pairs = max(1, int(max_batch_bytes // per_pair_bytes))
    if len(pairs) > max_pairs:
        out = []
        for i in range(0, len(pairs), max_pairs):
            out.extend(align_pairs_banded(pairs[i:i + max_pairs], submat,
                                          gap, band=band, backend=backend,
                                          max_batch_bytes=max_batch_bytes))
        return out
    packed = pack_band_batch(pairs, band)
    device = None
    if backend is None:
        cells = packed["q"].shape[0] * packed["q"].shape[1] * band
        backend, device = default_backend(cells)
    put = (lambda x: jnp.asarray(x)) if device is None else (
        lambda x: jax.device_put(np.asarray(x), device))
    dirs, end_scores, end_mat = backend(
        put(packed["q"]), put(packed["t_shift"]),
        put(packed["m_len"]), put(packed["n_len"]),
        put(packed["lo"]), put(submat),
        band=band, gap_open=gap.gap_open, gap_extend=gap.gap_extend)
    on_tpu = device is None and jax.devices()[0].platform == "tpu"
    if on_tpu:
        # traceback on device: ship O(m+n) move codes, not the (P, M, B)
        # direction tensor (which can be hundreds of MB per batch)
        smax = int(max(len(q) + len(t) for q, t in pairs))
        S = max(32, 1 << (smax - 1).bit_length())
        moves, counts = traceback_band_batch_device(
            dirs, put(packed["m_len"]), put(packed["n_len"]),
            put(packed["lo"]), end_mat, S)
        moves = np.asarray(moves)
        counts = np.asarray(counts)
        end_scores = np.asarray(end_scores)
        end_mat = np.asarray(end_mat)
        out = []
        for p in range(len(pairs)):
            ops = moves_to_ops(moves[p], int(counts[p]))
            # the device traceback clamps out-of-band reads instead of
            # trapping: verify the cigar consumes exactly (m, n)
            qc = sum(l for o, l in ops if o in ("M", "I"))
            tc = sum(l for o, l in ops if o in ("M", "D"))
            if qc != len(pairs[p][0]) or tc != len(pairs[p][1]):
                out.append(gap_fallback(len(pairs[p][0]),
                                        len(pairs[p][1])))
            else:
                out.append((int(end_scores[p, end_mat[p]]), ops))
        return out
    dirs = np.asarray(dirs)
    end_scores = np.asarray(end_scores)
    end_mat = np.asarray(end_mat)
    out = []
    for p in range(len(pairs)):
        m, n = int(packed["m_len"][p]), int(packed["n_len"][p])
        score = int(end_scores[p, end_mat[p]])
        try:
            ops = traceback_band(dirs[p], m, n, int(packed["lo"][p]),
                                 int(end_mat[p]))
        except RuntimeError:
            out.append(gap_fallback(m, n))
            continue
        out.append((score, ops))
    return out


def align_pairs_windowed(pairs, submat, gap: GapParams,
                         window: int = 10_000, band: int = 512,
                         overlap_frac: float = 0.5,
                         backend=None) -> list[list[tuple[int, int, int]]]:
    """Long pairwise alignment as banded windows with carry-over cursors.

    The reference BAR slides 10 kb POA windows with 50% overlap over
    sequences up to bandingLimit=1 Mb and stitches them at per-window cut
    points (poaBarAligner.c:463-560).  Here each window is a banded
    affine DP; only matches in the committed prefix (the first
    (1-overlap) of the window) are kept, the cursors resume at the last
    committed match, and the overlap is re-aligned by the next window —
    so indel drift never accumulates past one window.  All active pairs
    advance in lockstep, one batched kernel launch per generation (the
    vmap analog of the reference's per-flower OpenMP loop).

    Returns, per pair, a list of (q_pos, t_pos, length) match runs.
    """
    runs: list[list[tuple[int, int, int]]] = [[] for _ in pairs]
    cursors: dict[int, tuple[int, int]] = {
        k: (0, 0) for k, (q, t) in enumerate(pairs) if len(q) and len(t)}
    while cursors:
        active = sorted(cursors)
        batch = []
        for k in active:
            qi, ti = cursors[k]
            q, t = pairs[k]
            batch.append((q[qi:qi + window], t[ti:ti + window]))
        out = align_pairs_banded(batch, submat, gap, band=band,
                                 backend=backend)
        for k, (_score, ops) in zip(active, out):
            qi, ti = cursors[k]
            q, t = pairs[k]
            qw = min(window, len(q) - qi)
            tw = min(window, len(t) - ti)
            last_window = (qi + qw >= len(q)) and (ti + tw >= len(t))
            cut = qw if last_window else max(1, int(qw * (1 - overlap_frac)))
            i = j = 0
            resume = None          # (i, j) just past the last kept match
            for op, ln in ops:
                if op == "M":
                    take = min(ln, cut - i)
                    if take > 0:
                        runs[k].append((qi + i, ti + j, take))
                        resume = (i + take, j + take)
                    i += ln
                    j += ln
                elif op == "I":
                    i += ln
                else:
                    j += ln
            if last_window:
                del cursors[k]
                continue
            if resume is None:
                # nothing committed: hop forward, re-syncing the axes
                step = cut
                nqi, nti = qi + step, ti + step
            else:
                nqi, nti = qi + resume[0], ti + resume[1]
            if nqi >= len(q) or nti >= len(t):
                del cursors[k]
            else:
                cursors[k] = (nqi, nti)
    return runs
