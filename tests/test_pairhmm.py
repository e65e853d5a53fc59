"""Pair-HMM posterior kernel vs full-matrix oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from cactus_tpu.ops.banded import pack_band_batch
from cactus_tpu.ops.pairhmm import (HmmParams, posterior_banded_batch,
                                    posterior_np, posterior_pairs_banded)


def _banded_posterior_full(q, t, params, band=128):
    packed = pack_band_batch([(q, t)], band)
    post = posterior_banded_batch(
        jnp.asarray(packed["q"]), jnp.asarray(packed["t_shift"]),
        jnp.asarray(packed["m_len"]), jnp.asarray(packed["n_len"]),
        jnp.asarray(packed["lo"]), jnp.asarray(params.emissions()),
        band=band, delta=params.delta, epsilon=params.epsilon)
    post = np.asarray(post)[0]
    lo = int(packed["lo"][0])
    M, N = len(q), len(t)
    full = np.zeros((M, N))
    for i in range(1, M + 1):
        for b in range(band):
            j = i + lo + b
            if 1 <= j <= N:
                full[i - 1, j - 1] = post[i - 1, b]
    return full


def test_oracle_identical_sequences():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, 30).astype(np.uint8)
    post = posterior_np(q, q.copy(), HmmParams())
    diag = np.diag(post)
    assert diag.min() > 0.9
    off = post - np.diag(diag)
    assert off.max() < 0.2


@pytest.mark.parametrize("seed,m,n", [(1, 20, 20), (2, 35, 28), (3, 15, 40)])
def test_banded_matches_oracle(seed, m, n):
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 4, m).astype(np.uint8)
    # target: mutated copy padded/truncated
    t = q.copy()
    idx = rng.random(m) < 0.15
    t[idx] = (t[idx] + 1) % 4
    t = np.concatenate([t, rng.integers(0, 4, max(0, n - m))
                        .astype(np.uint8)])[:n]
    params = HmmParams()
    want = posterior_np(q, t, params)
    got = _banded_posterior_full(q, t, params, band=128)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_posterior_pairs_recover_homology():
    """Posterior pairs on a mutated copy recover the true diagonal."""
    rng = np.random.default_rng(4)
    q = rng.integers(0, 4, 300).astype(np.uint8)
    t = q.copy()
    idx = rng.random(300) < 0.1
    t[idx] = (t[idx] + 1) % 4
    # small indel
    t = np.concatenate([t[:150], t[155:]])
    out = posterior_pairs_banded([(q, t)], HmmParams(), band=128,
                                 gamma=0.5)[0]
    assert len(out) > 250
    good = sum(1 for i, j, _p in out
               if (i < 150 and j == i) or (i >= 155 and j == i - 5))
    assert good / len(out) > 0.95


def test_batched_pairs_independent():
    """Batch results equal single-pair results (padding isolation)."""
    rng = np.random.default_rng(5)
    pairs = []
    for L in (20, 37, 64):
        q = rng.integers(0, 4, L).astype(np.uint8)
        t = q.copy()
        t[::7] = (t[::7] + 1) % 4
        pairs.append((q, t))
    batch = posterior_pairs_banded(pairs, HmmParams(), band=128)
    for k, pr in enumerate(pairs):
        solo = posterior_pairs_banded([pr], HmmParams(), band=128)[0]
        assert [(i, j) for i, j, _ in batch[k]] == \
               [(i, j) for i, j, _ in solo]
