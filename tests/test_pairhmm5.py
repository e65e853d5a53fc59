"""Five-state pair-HMM (cPecan stateMachine5 parity, ops/pairhmm5.py)."""

import numpy as np
import pytest

from cactus_tpu.ops.pairhmm import HmmParams, posterior_np
from cactus_tpu.ops.pairhmm5 import (Hmm5Params, posterior5_np,
                                     posterior_banded_batch5,
                                     posterior_pairs_banded5)


def _mutate(rng, seq, sub=0.08, indel=0.02):
    out = []
    for b in seq:
        r = rng.random()
        if r < indel / 2:
            continue
        if r < indel:
            out.append(int(rng.integers(0, 4)))
        if rng.random() < sub:
            out.append(int((b + 1 + rng.integers(0, 3)) % 4))
        else:
            out.append(int(b))
    return np.asarray(out, dtype=np.uint8)


def test_oracle_rows_sum_sane():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, 40).astype(np.uint8)
    t = _mutate(rng, q)
    post = posterior5_np(q, t, Hmm5Params())
    # every posterior in [0,1]; most rows should have a confident match
    assert post.min() >= -1e-6 and post.max() <= 1.0 + 1e-6
    assert (post.max(axis=1) > 0.5).mean() > 0.6


def test_banded_matches_oracle():
    rng = np.random.default_rng(1)
    p = Hmm5Params()
    for trial in range(3):
        m = int(rng.integers(20, 60))
        q = rng.integers(0, 4, m).astype(np.uint8)
        t = _mutate(rng, q)
        full = posterior5_np(q, t, p)
        band = 64
        from cactus_tpu.ops.banded import pack_band_batch
        packed = pack_band_batch([(q, t)], band)
        post = np.asarray(posterior_banded_batch5(
            packed["q"], packed["t_shift"], packed["m_len"],
            packed["n_len"], packed["lo"], p.emissions(),
            band=band, params=p))[0]
        lo = int(packed["lo"][0])
        for i in range(1, m + 1):
            for b in range(band):
                j = i + lo + b
                if 1 <= j <= len(t):
                    assert post[i - 1, b] == pytest.approx(
                        full[i - 1, j - 1], abs=2e-3), (trial, i, j)


def test_degenerate_equals_three_state():
    """With long-gap opens and switches at ~0, the 5-state machine
    collapses to the 3-state machine of ops/pairhmm.py."""
    rng = np.random.default_rng(2)
    p3 = HmmParams()
    p5 = Hmm5Params(match_continue=1.0 - 2.0 * p3.delta,
                    open_short=p3.delta, open_long=1e-12,
                    extend_short=p3.epsilon, extend_long=1e-12,
                    switch_sl=0.0, switch_ls=0.0, p_match=p3.p_match)
    q = rng.integers(0, 4, 30).astype(np.uint8)
    t = _mutate(rng, q)
    f3 = posterior_np(q, t, p3)
    f5 = posterior5_np(q, t, p5)
    assert np.allclose(f3, f5, atol=1e-6)


def test_long_gap_bridges_big_deletion():
    """A 60 bp deletion: the 5-state machine keeps aligning the flanks
    with high posterior (long-gap state bridges it); the 3-state machine
    pays geometric extension and loses confidence on the far flank."""
    rng = np.random.default_rng(3)
    left = rng.integers(0, 4, 50).astype(np.uint8)
    right = rng.integers(0, 4, 50).astype(np.uint8)
    mid = rng.integers(0, 4, 60).astype(np.uint8)
    q = np.concatenate([left, right])          # deletion of mid
    t = np.concatenate([left, mid, right])
    p5 = posterior5_np(q, t, Hmm5Params())
    # far-flank diagonal cells (q pos 50+i ~ t pos 110+i)
    diag5 = np.array([p5[50 + i, 110 + i] for i in range(40)])
    assert diag5.mean() > 0.8
    p3 = posterior_np(q, t, HmmParams())
    diag3 = np.array([p3[50 + i, 110 + i] for i in range(40)])
    assert diag5.mean() >= diag3.mean() - 1e-9


def test_pairs_wrapper_recovers_identity():
    rng = np.random.default_rng(4)
    q = rng.integers(0, 4, 100).astype(np.uint8)
    hits = posterior_pairs_banded5([(q, q.copy())], Hmm5Params(),
                                   band=32, gamma=0.5)[0]
    ident = sum(1 for i, j, _p in hits if i == j)
    assert ident > 90
