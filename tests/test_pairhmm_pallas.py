"""Pallas pair-HMM kernel vs the XLA scan backend (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cactus_tpu.ops.banded import pack_band_batch
from cactus_tpu.ops.pairhmm import HmmParams, posterior_banded_batch
from cactus_tpu.ops.pairhmm_pallas import posterior_banded_batch_pallas


def _run_both(pairs, band=128, params=None):
    params = params or HmmParams()
    packed = pack_band_batch(pairs, band)
    args = (jnp.asarray(packed["q"]), jnp.asarray(packed["t_shift"]),
            jnp.asarray(packed["m_len"]), jnp.asarray(packed["n_len"]),
            jnp.asarray(packed["lo"]), jnp.asarray(params.emissions()))
    ref = posterior_banded_batch(*args, band=band, delta=params.delta,
                                 epsilon=params.epsilon)
    got = posterior_banded_batch_pallas(*args, band=band,
                                        delta=params.delta,
                                        epsilon=params.epsilon,
                                        interpret=True)
    return np.asarray(ref), np.asarray(got)


@pytest.mark.parametrize("seed,n_pairs,qlen,tlen", [
    (0, 4, 60, 64), (1, 4, 200, 180), (2, 8, 33, 150)])
def test_pallas_pairhmm_matches_xla(seed, n_pairs, qlen, tlen):
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


def test_pallas_pairhmm_mixed_lengths():
    """Terminal rows landing mid-step (m_len not multiple of 8) and
    pairs much shorter than the batch max."""
    rng = np.random.default_rng(7)
    pairs = []
    for m, n in [(13, 17), (100, 95), (57, 70), (9, 9)]:
        q = rng.integers(0, 4, m).astype(np.uint8)
        t = rng.integers(0, 4, n).astype(np.uint8)
        pairs.append((q, t))
    ref, got = _run_both(pairs, band=128)
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_pallas_pairhmm_posterior_mass():
    """On a mutated copy the Pallas posterior recovers the diagonal."""
    rng = np.random.default_rng(3)
    q = rng.integers(0, 4, 200).astype(np.uint8)
    t = q.copy()
    idx = rng.random(200) < 0.08
    t[idx] = (t[idx] + 1) % 4
    _ref, got = _run_both([(q, t)], band=128)
    packed = pack_band_batch([(q, t)], 128)
    lo = int(packed["lo"][0])
    b = -lo  # j == i ⇒ band index b = j - i - lo = -lo
    assert 0 <= b < 128
    diag = got[0, :200, b]
    assert np.median(diag) > 0.8
