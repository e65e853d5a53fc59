import numpy as np
import pytest

from cactus_tpu.config import PoaParams
from cactus_tpu.ops import banded
from cactus_tpu.ops.banded import (GapParams, align_affine_np,
                                   align_pairs_banded, score_matrix_6)

SUBMAT = score_matrix_6(PoaParams().sub_matrix)
GAP = GapParams(gap_open=400, gap_extend=30)


def cigar_consumes(ops, m, n):
    qc = sum(l for op, l in ops if op in "MI")
    tc = sum(l for op, l in ops if op in "MD")
    return qc == m and tc == n


def score_of_cigar(q, t, ops, submat, gap):
    """Recompute alignment score from a cigar (independent check)."""
    i = j = 0
    s = 0
    for op, ln in ops:
        if op == "M":
            for k in range(ln):
                s += submat[q[i + k], t[j + k]]
            i += ln
            j += ln
        elif op == "I":
            s -= gap.gap_open + ln * gap.gap_extend
            i += ln
        else:
            s -= gap.gap_open + ln * gap.gap_extend
            j += ln
    assert i == len(q) and j == len(t)
    return s


def random_pair(rng, m_range=(20, 120), mut=0.1, indel=0.05):
    m = int(rng.integers(*m_range))
    q = rng.integers(0, 4, m).astype(np.uint8)
    # derive t from q with mutations and indels so alignment is meaningful
    t = []
    for c in q:
        r = rng.random()
        if r < indel / 2:
            continue  # deletion
        if r < indel:
            t.append(int(rng.integers(0, 4)))  # insertion
        if rng.random() < mut:
            t.append(int((c + rng.integers(1, 4)) % 4))
        else:
            t.append(int(c))
    return q, np.array(t, dtype=np.uint8)


def test_oracle_simple():
    q = np.array([0, 1, 2, 3], dtype=np.uint8)
    t = np.array([0, 1, 2, 3], dtype=np.uint8)
    score, ops = align_affine_np(q, t, SUBMAT, GAP)
    assert ops == [("M", 4)]
    assert score == SUBMAT[0, 0] + SUBMAT[1, 1] + SUBMAT[2, 2] + SUBMAT[3, 3]


def test_oracle_gap():
    q = np.array([0, 1, 2, 3], dtype=np.uint8)
    t = np.array([0, 1, 1, 1, 2, 3], dtype=np.uint8)
    score, ops = align_affine_np(q, t, SUBMAT, GAP)
    assert cigar_consumes(ops, 4, 6)
    assert any(op == "D" and ln == 2 for op, ln in ops)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_banded_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    pairs = [random_pair(rng) for _ in range(8)]
    results = align_pairs_banded(pairs, SUBMAT, GAP, band=128)
    for (q, t), (score, ops) in zip(pairs, results):
        ref_score, _ = align_affine_np(q, t, SUBMAT, GAP)
        assert cigar_consumes(ops, len(q), len(t))
        assert score == ref_score, f"banded {score} != oracle {ref_score}"
        # cigar must actually realize the claimed score
        assert score_of_cigar(q, t, ops, SUBMAT, GAP) == score


def test_banded_ragged_batch():
    rng = np.random.default_rng(42)
    pairs = [random_pair(rng, m_range=(5, 200)) for _ in range(16)]
    results = align_pairs_banded(pairs, SUBMAT, GAP, band=128)
    for (q, t), (score, ops) in zip(pairs, results):
        ref_score, _ = align_affine_np(q, t, SUBMAT, GAP)
        assert score == ref_score
        assert cigar_consumes(ops, len(q), len(t))


def test_banded_empty_query():
    # degenerate: empty query vs short target -> all D
    results = align_pairs_banded(
        [(np.zeros(0, dtype=np.uint8), np.array([0, 1, 2], dtype=np.uint8)),
         (np.array([0, 1], dtype=np.uint8), np.array([0, 1], dtype=np.uint8))],
        SUBMAT, GAP, band=128)
    score0, ops0 = results[0]
    assert ops0 == [("D", 3)]
    assert score0 == -(GAP.gap_open + 3 * GAP.gap_extend)
    assert results[1][1] == [("M", 2)]


def test_banded_diag_offset():
    # strongly asymmetric lengths exercise nonzero band offsets
    rng = np.random.default_rng(7)
    q = rng.integers(0, 4, 50).astype(np.uint8)
    t = np.concatenate([rng.integers(0, 4, 60).astype(np.uint8), q])
    (score, ops), = align_pairs_banded([(q, t)], SUBMAT, GAP, band=128)
    ref_score, _ = align_affine_np(q, t, SUBMAT, GAP)
    assert score == ref_score
    assert cigar_consumes(ops, 50, 110)


def test_windowed_long_pair():
    """align_pairs_windowed recovers homology on a pair far longer than
    one window, re-syncing cursors across indel drift (reference BAR
    slides 10 kb windows with 50% overlap, poaBarAligner.c:463-560)."""
    from cactus_tpu.ops.banded import align_pairs_windowed
    rng = np.random.default_rng(3)
    n = 12_000
    q = rng.integers(0, 4, n).astype(np.uint8)
    # 4% substitutions + scattered indels
    sub = rng.random(n) < 0.04
    t = np.where(sub, (q + rng.integers(1, 4, n)) % 4, q).astype(np.uint8)
    out, qpos = [], []
    i = 0
    while i < n:
        r = rng.random()
        if r < 0.002:
            i += int(rng.integers(1, 12))
            continue
        if r < 0.004:
            ins = rng.integers(0, 4, int(rng.integers(1, 12))).astype(np.uint8)
            out.append(ins)
            qpos.extend([-1] * len(ins))
        out.append(t[i:i + 1])
        qpos.append(i)
        i += 1
    t2 = np.concatenate(out)
    qpos = np.array(qpos)
    from cactus_tpu.config import PoaParams
    p = PoaParams()
    runs = align_pairs_windowed(
        [(q, t2)], score_matrix_6(p.sub_matrix),
        GapParams(p.gap_open1, p.gap_extend1), window=2_000, band=256)[0]
    correct = total = 0
    for i0, j0, ln in runs:
        ks = np.arange(ln)
        total += ln
        correct += int((qpos[j0 + ks] == i0 + ks).sum())
    truth = int((qpos >= 0).sum())
    assert correct / truth > 0.97, correct / truth
    assert correct / total > 0.97, correct / total
    # runs stay in-bounds and sorted per pair construction
    for i0, j0, ln in runs:
        assert 0 <= i0 and i0 + ln <= len(q)
        assert 0 <= j0 and j0 + ln <= len(t2)


def test_device_traceback_matches_host():
    """traceback_band_batch_device (on-device walk, O(m+n) transfer)
    reproduces the host traceback exactly."""
    import jax.numpy as jnp
    from cactus_tpu.config import PoaParams
    from cactus_tpu.ops.banded import (banded_align_batch, moves_to_ops,
                                       pack_band_batch, score_matrix_6,
                                       traceback_band,
                                       traceback_band_batch_device)
    rng = np.random.default_rng(5)
    band = 64
    pairs = []
    for _ in range(12):
        m = int(rng.integers(10, 200))
        q = rng.integers(0, 4, m).astype(np.uint8)
        # mutate to create indels/substitutions
        t = q.copy()
        for _k in range(int(rng.integers(0, 6))):
            p = int(rng.integers(0, len(t)))
            t = np.delete(t, p) if rng.random() < 0.5 else \
                np.insert(t, p, rng.integers(0, 4))
        pairs.append((q, t.astype(np.uint8)))
    packed = pack_band_batch(pairs, band)
    submat = score_matrix_6(PoaParams().sub_matrix)
    dirs, end_scores, end_mat = banded_align_batch(
        jnp.asarray(packed["q"]), jnp.asarray(packed["t_shift"]),
        jnp.asarray(packed["m_len"]), jnp.asarray(packed["n_len"]),
        jnp.asarray(packed["lo"]), jnp.asarray(submat),
        band=band, gap_open=400, gap_extend=30)
    smax = int(max(len(q) + len(t) for q, t in pairs))
    S = max(32, 1 << (smax - 1).bit_length())
    moves, counts = traceback_band_batch_device(
        dirs, jnp.asarray(packed["m_len"]), jnp.asarray(packed["n_len"]),
        jnp.asarray(packed["lo"]), end_mat, S)
    moves, counts = np.asarray(moves), np.asarray(counts)
    dirs_np = np.asarray(dirs)
    em = np.asarray(end_mat)
    for p in range(len(pairs)):
        host = traceback_band(dirs_np[p], int(packed["m_len"][p]),
                              int(packed["n_len"][p]),
                              int(packed["lo"][p]), int(em[p]))
        dev = moves_to_ops(moves[p], int(counts[p]))
        assert dev == host, (p, dev, host)
