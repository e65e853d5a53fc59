"""Native C++ DP kernels must be bit-identical to the JAX kernels.

The blast phase routes batches to whichever backend is cheapest
(native for dispatch-latency-dominated swarms, Pallas/XLA for large
batches), so the two implementations must agree exactly — scores,
cigars, chain scores, predecessors, and every tie-break.
"""

import numpy as np
import pytest

from cactus_tpu.native import build as native
from cactus_tpu.ops import chain as chain_ops
from cactus_tpu.ops.banded import (GapParams, align_pairs_native,
                                   banded_align_batch, moves_to_ops_fwd,
                                   pack_band_batch, score_matrix_6,
                                   traceback_band)
from cactus_tpu.config import PoaParams

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="no native toolchain")


def _mutate(rng, codes, sub=0.1, indel=0.02):
    out = []
    for c in codes:
        r = rng.random()
        if r < indel / 2:
            continue
        if r < indel:
            out.append(rng.integers(0, 4))
        out.append(rng.integers(0, 4) if rng.random() < sub else c)
    return np.array(out, np.uint8)


@pytest.mark.parametrize("band", [128, 256])
def test_native_banded_matches_jax(band):
    rng = np.random.default_rng(7)
    submat = score_matrix_6(PoaParams().sub_matrix)
    gap = GapParams()
    pairs = []
    for _ in range(17):
        n = int(rng.integers(5, 700))
        q = rng.integers(0, 4, n).astype(np.uint8)
        pairs.append((q, _mutate(rng, q)))
    # extremes: tiny pairs and pure-indel-ish shapes
    pairs.append((np.array([1], np.uint8), np.array([2, 3], np.uint8)))
    pairs.append((rng.integers(0, 4, 90).astype(np.uint8),
                  rng.integers(0, 4, 90 + band - 10).astype(np.uint8)))

    got = align_pairs_native(pairs, submat, gap, band)
    assert got is not None

    packed = pack_band_batch(pairs, band)
    dirs, end_scores, end_mat = banded_align_batch(
        packed["q"], packed["t_shift"], packed["m_len"], packed["n_len"],
        packed["lo"], submat, band=band, gap_open=gap.gap_open,
        gap_extend=gap.gap_extend)
    dirs = np.asarray(dirs)
    end_scores = np.asarray(end_scores)
    end_mat = np.asarray(end_mat)
    for p, (q, t) in enumerate(pairs):
        score_j = int(end_scores[p, end_mat[p]])
        ops_j = traceback_band(dirs[p], len(q), len(t),
                               int(packed["lo"][p]), int(end_mat[p]))
        assert got[p][0] == score_j, p
        assert got[p][1] == ops_j, p


def test_native_chain_matches_jax():
    rng = np.random.default_rng(11)
    sets = []
    for _ in range(9):
        n = int(rng.integers(1, 400))
        qs = np.sort(rng.integers(0, 20000, n)).astype(np.int64)
        ts = (qs + rng.integers(-500, 500, n)).clip(0).astype(np.int64)
        ln = rng.integers(10, 60, n).astype(np.int64)
        sets.append(np.stack([qs, ts, ln], axis=1))
    sets.append(np.zeros((0, 3), np.int64))

    got = chain_ops.chain_anchors_batch(sets, max_gap=8192)

    for runs, (order, scores, preds) in zip(sets, got):
        if len(runs) == 0:
            assert len(order) == 0
            continue
        o2 = np.lexsort((runs[:, 1], runs[:, 0]))
        r = chain_ops._pad_sorted_runs(runs[o2].astype(np.int32))
        s_j, p_j = chain_ops._chain_scan(
            r[:, 0], r[:, 1], r[:, 2], 20, 1, 8192, 64)
        n = len(o2)
        np.testing.assert_array_equal(order, o2)
        np.testing.assert_array_equal(scores, np.asarray(s_j)[:n])
        np.testing.assert_array_equal(preds, np.asarray(p_j)[:n])
