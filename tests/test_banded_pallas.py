"""Pallas banded DP kernel vs the XLA scan backend (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cactus_tpu.config import PoaParams
from cactus_tpu.ops.banded import (GapParams, align_pairs_banded,
                                   banded_align_batch, pack_band_batch,
                                   score_matrix_6)
from cactus_tpu.ops.banded_pallas import banded_align_batch_pallas


def _pallas_cpu(*args, **kw):
    return banded_align_batch_pallas(*args, **kw, interpret=True)


@pytest.mark.parametrize("seed,n_pairs,qlen,tlen", [
    (0, 8, 60, 64), (1, 8, 200, 180), (2, 16, 33, 150)])
def test_pallas_matches_xla(seed, n_pairs, qlen, tlen):
    rng = np.random.default_rng(seed)
    band = 256
    pairs = []
    for _ in range(n_pairs):
        m = rng.integers(qlen // 2, qlen + 1)
        n = rng.integers(max(1, tlen // 2), tlen + 1)
        pairs.append((rng.integers(0, 4, m).astype(np.uint8),
                      rng.integers(0, 4, n).astype(np.uint8)))
    packed = pack_band_batch(pairs, band)
    submat = score_matrix_6(PoaParams().sub_matrix)
    args = (jnp.asarray(packed["q"]), jnp.asarray(packed["t_shift"]),
            jnp.asarray(packed["m_len"]), jnp.asarray(packed["n_len"]),
            jnp.asarray(packed["lo"]), jnp.asarray(submat))
    d1, s1, m1 = banded_align_batch(*args, band=band, gap_open=400,
                                    gap_extend=30)
    d2, s2, m2 = _pallas_cpu(*args, band=band, gap_open=400, gap_extend=30)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    # direction bits must agree wherever they matter (inside the band with
    # valid j); compare fully — both backends mask identically
    np.testing.assert_array_equal(np.asarray(d1)[:len(pairs)],
                                  np.asarray(d2)[:len(pairs)])


def test_pallas_end_to_end_cigars():
    """Full align_pairs_banded with the pallas backend reproduces scores
    and valid cigars vs the numpy oracle."""
    from cactus_tpu.ops.banded import align_affine_np
    rng = np.random.default_rng(7)
    gap = GapParams(400, 30)
    submat = score_matrix_6(PoaParams().sub_matrix)
    pairs = []
    for _ in range(8):
        m = int(rng.integers(20, 90))
        q = rng.integers(0, 4, m).astype(np.uint8)
        t = q.copy()
        # mutate
        idx = rng.random(m) < 0.1
        t[idx] = (t[idx] + 1) % 4
        pairs.append((q, t))
    out = align_pairs_banded(pairs, submat, gap, band=128,
                             backend=_pallas_cpu)
    for (q, t), (score, ops) in zip(pairs, out):
        ref_score, _ref_ops = align_affine_np(q, t, submat, gap)
        assert score == ref_score
        qlen = sum(l for op, l in ops if op in "MI")
        tlen = sum(l for op, l in ops if op in "MD")
        assert qlen == len(q) and tlen == len(t)
