"""Pallas five-state pair-HMM kernel vs the XLA backend (interpret)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cactus_tpu.ops.banded import pack_band_batch
from cactus_tpu.ops.pairhmm5 import Hmm5Params, posterior_banded_batch5
from cactus_tpu.ops.pairhmm5_pallas import posterior_banded_batch5_pallas


def _run_both(pairs, band=128, params=None):
    params = params or Hmm5Params()
    packed = pack_band_batch(pairs, band)
    args = (jnp.asarray(packed["q"]), jnp.asarray(packed["t_shift"]),
            jnp.asarray(packed["m_len"]), jnp.asarray(packed["n_len"]),
            jnp.asarray(packed["lo"]), jnp.asarray(params.emissions()))
    ref = posterior_banded_batch5(*args, band=band, params=params)
    got = posterior_banded_batch5_pallas(*args, band=band, params=params,
                                         interpret=True)
    return np.asarray(ref), np.asarray(got)


@pytest.mark.parametrize("seed,n_pairs,qlen,tlen", [
    (0, 4, 60, 64), (1, 4, 150, 140)])
def test_pallas5_matches_xla(seed, n_pairs, qlen, tlen):
    rng = np.random.default_rng(seed)
    pairs = []
    for _ in range(n_pairs):
        m = int(rng.integers(qlen // 2, qlen + 1))
        n = int(rng.integers(max(4, tlen // 2), tlen + 1))
        q = rng.integers(0, 4, m).astype(np.uint8)
        t = q[:min(m, n)].copy()
        idx = rng.random(len(t)) < 0.1
        t[idx] = (t[idx] + 1) % 4
        t = np.concatenate(
            [t, rng.integers(0, 4, max(0, n - len(t))).astype(np.uint8)])
        pairs.append((q, t))
    ref, got = _run_both(pairs, band=128)
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_pallas5_mixed_lengths():
    rng = np.random.default_rng(5)
    pairs = []
    for m, n in [(13, 17), (90, 85), (41, 70), (9, 9)]:
        pairs.append((rng.integers(0, 4, m).astype(np.uint8),
                      rng.integers(0, 4, n).astype(np.uint8)))
    ref, got = _run_both(pairs, band=128)
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_pallas5_long_gap_posterior():
    """A 30 bp deletion: the five-state model keeps confident match
    posteriors on both sides of the gap (the Pallas path too)."""
    rng = np.random.default_rng(9)
    q = rng.integers(0, 4, 160).astype(np.uint8)
    t = np.concatenate([q[:70], q[100:]])
    _ref, got = _run_both([(q, t)], band=128)
    row_best = got[0, :160].max(axis=1)
    assert np.median(row_best[:60]) > 0.7
    assert np.median(row_best[110:]) > 0.7
