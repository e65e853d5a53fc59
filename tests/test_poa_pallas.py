"""Pallas POA kernel vs the XLA scan backend (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cactus_tpu.ops.poa import MAX_PREDS, poa_align_scan
from cactus_tpu.ops.poa_pallas import poa_align_scan_pallas


def _random_dag(rng, n, branchy=0.3):
    """Topologically ordered random DAG: mostly a chain with bubbles."""
    bases = rng.integers(0, 4, n).astype(np.uint8)
    preds = np.full((n, MAX_PREDS), -1, np.int32)
    for v in range(1, n):
        preds[v, 0] = v - 1
        k = 1
        while k < MAX_PREDS and v > 2 and rng.random() < branchy:
            preds[v, k] = int(rng.integers(0, v - 1))
            k += 1
    return bases, preds


def _run_both(bases, preds, q, gap=30, match=10, mismatch=-15):
    a = (jnp.asarray(bases), jnp.asarray(preds), jnp.asarray(q))
    H1, d1, e1 = poa_align_scan(*a, gap=gap, match=match, mismatch=mismatch)
    H2, d2, e2 = poa_align_scan_pallas(*a, gap=gap, match=match,
                                       mismatch=mismatch,
                                       interpret=True)
    return (np.asarray(H1), np.asarray(d1), np.asarray(e1),
            np.asarray(H2), np.asarray(d2), np.asarray(e2))


@pytest.mark.parametrize("seed,n,l", [(0, 40, 33), (1, 96, 70),
                                      (2, 64, 128)])
def test_poa_pallas_matches_xla(seed, n, l):
    rng = np.random.default_rng(seed)
    bases, preds = _random_dag(rng, n)
    q = rng.integers(0, 4, l).astype(np.uint8)
    H1, d1, e1, H2, d2, e2 = _run_both(bases, preds, q)
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_array_equal(H1, H2)
    np.testing.assert_array_equal(d1, d2)


def test_poa_pallas_chain_identity():
    """Linear chain graph == plain pairwise; diagonal must win."""
    rng = np.random.default_rng(5)
    n = 48
    bases = rng.integers(0, 4, n).astype(np.uint8)
    preds = np.full((n, MAX_PREDS), -1, np.int32)
    preds[1:, 0] = np.arange(n - 1)
    q = bases.copy()
    H1, d1, e1, H2, d2, e2 = _run_both(bases, preds, q)
    np.testing.assert_array_equal(H1, H2)
    assert e2[-1] == n * 10   # full-match score


def _affine_inputs(rng, n, l, band):
    from cactus_tpu.config import PoaParams
    from cactus_tpu.ops.banded import score_matrix_6
    bases, preds = _random_dag(rng, n)
    q = rng.integers(0, 4, l).astype(np.uint8)
    q_ext = np.full(l + 1, 5, np.uint8)
    q_ext[1:] = q
    # monotone band offsets like poa_align_affine builds them
    if band >= l + 1:
        off = np.zeros(n, np.int32)
    else:
        center = np.arange(n) * (l / max(n - 1, 1))
        off = np.clip(center.astype(np.int32) - band // 2, 0,
                      l + 1 - band)
        off = np.maximum.accumulate(off).astype(np.int32)
    submat = score_matrix_6(PoaParams().sub_matrix).astype(np.int32)
    return bases, preds, off, q_ext, submat


@pytest.mark.parametrize("seed,n,l,band", [
    (0, 40, 33, 64), (1, 80, 200, 64), (2, 64, 100, 128)])
def test_poa_affine_pallas_matches_xla(seed, n, l, band):
    from cactus_tpu.ops.poa import poa_align_scan_affine
    from cactus_tpu.ops.poa_pallas import poa_align_scan_affine_pallas
    rng = np.random.default_rng(seed)
    bases, preds, off, q_ext, submat = _affine_inputs(rng, n, l, band)
    a = tuple(jnp.asarray(x) for x in (bases, preds, off, q_ext, submat))
    kw = dict(band=band, o1=400, e1=30, o2=1200, e2=1)
    H1, d1, e1_ = poa_align_scan_affine(*a, **kw)
    H2, d2, e2_ = poa_align_scan_affine_pallas(*a, **kw, interpret=True)
    np.testing.assert_array_equal(np.asarray(e1_), np.asarray(e2_))
    np.testing.assert_array_equal(np.asarray(H1), np.asarray(H2))
    np.testing.assert_array_equal(np.asarray(d1),
                                  np.asarray(d2).astype(np.uint16))


def test_linear_kernel_forward_pred_rows():
    """Graphs from add_alignment can have preds pointing at HIGHER node
    indices; the XLA scan reads those rows as its NEG init, so the
    Pallas kernel must NEG-initialize its scratch (hardware bug found
    2026-08-19: uninitialized VMEM garbage leaked into row scores)."""
    import numpy as np
    from cactus_tpu.ops.poa import MAX_PREDS, poa_align_scan
    from cactus_tpu.ops.poa_pallas import poa_align_scan_pallas

    rng = np.random.default_rng(9)
    N, L = 24, 40
    bases = rng.integers(0, 4, N).astype(np.uint8)
    preds = np.full((N, MAX_PREDS), -1, dtype=np.int32)
    preds[1:, 0] = np.arange(N - 1)
    preds[1, 1] = 20          # forward reference (unreached row)
    preds[5, 1] = 23
    q = rng.integers(0, 4, L).astype(np.uint8)
    H1, d1, e1 = poa_align_scan(bases, preds, q, gap=30, match=10,
                                mismatch=-5)
    H2, d2, e2 = poa_align_scan_pallas(bases, preds, q, gap=30, match=10,
                                       mismatch=-5, interpret=True)
    np.testing.assert_array_equal(np.asarray(H1), np.asarray(H2))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


@pytest.mark.parametrize("seed,p,n,b,l", [
    (3, 3, 40, 64, 48), (4, 2, 17, 128, 40), (5, 4, 24, 64, 150)])
def test_poa_chain_kernel_matches_xla(seed, p, n, b, l):
    """The register-carry chain kernel (round-5 rewrite: packed word
    slabs + class-word band carry) must be bit-identical to the XLA
    scan on certified chain graphs, incl. B < Bp and N % R != 0."""
    from cactus_tpu.ops.poa import MAX_PREDS, poa_align_scan_affine
    from cactus_tpu.ops.poa_pallas import (_chain_batch_impl,
                                           _chain_check_np)
    rng = np.random.default_rng(seed)
    bases = rng.integers(0, 4, (p, n)).astype(np.uint8)
    preds = np.full((p, n, MAX_PREDS), -1, np.int32)
    preds[:, 1:, 0] = np.arange(n - 1)
    hi = max(0, l + 1 - b)
    steps = rng.integers(0, 2, (p, n))
    steps[:, 0] = 0
    off = np.minimum(np.cumsum(steps, axis=1), hi).astype(np.int32)
    q_ext = np.full((p, l + 1), 5, np.uint8)
    q_ext[:, 1:] = rng.integers(0, 4, (p, l))
    l_len = np.full(p, l, np.int32)
    assert _chain_check_np(preds, off)
    from cactus_tpu.config import PoaParams
    from cactus_tpu.ops.banded import score_matrix_6
    sm = score_matrix_6(PoaParams().sub_matrix).astype(np.int32)
    smt = tuple(int(x) for x in sm.reshape(-1))
    kw = dict(o1=400, e1=30, o2=1200, e2=1)
    H, dirs, ends = _chain_batch_impl(
        jnp.asarray(bases), jnp.asarray(off), jnp.asarray(q_ext),
        jnp.asarray(l_len), smt, b, kw["o1"], kw["e1"], kw["o2"],
        kw["e2"], interpret=True)
    for i in range(p):
        Ho, do, eo = poa_align_scan_affine(
            jnp.asarray(bases[i]), jnp.asarray(preds[i]),
            jnp.asarray(off[i]), jnp.asarray(q_ext[i]),
            jnp.asarray(sm), band=b, **kw)
        np.testing.assert_array_equal(np.asarray(H[i]), np.asarray(Ho))
        np.testing.assert_array_equal(
            np.asarray(dirs[i]), np.asarray(do).astype(np.int32))
        np.testing.assert_array_equal(np.asarray(ends[i]),
                                      np.asarray(eo))


def test_poa_batch_chunking_matches_single_launch():
    """P > MAX_BATCH_P chunked launches must equal one launch (the
    Mosaic lowering OOMed at P=3975 on a v5e; chunking is the guard)."""
    from cactus_tpu.ops import poa_pallas as M
    from cactus_tpu.ops.poa import MAX_PREDS
    rng = np.random.default_rng(9)
    p, n, b, l = 5, 16, 64, 20
    bases = rng.integers(0, 4, (p, n)).astype(np.uint8)
    preds = np.full((p, n, MAX_PREDS), -1, np.int32)
    preds[:, 1:, 0] = np.arange(n - 1)
    off = np.zeros((p, n), np.int32)
    q_ext = np.full((p, l + 1), 5, np.uint8)
    q_ext[:, 1:] = rng.integers(0, 4, (p, l))
    l_len = jnp.asarray(np.full(p, l, np.int32))
    from cactus_tpu.config import PoaParams
    from cactus_tpu.ops.banded import score_matrix_6
    sm = jnp.asarray(score_matrix_6(PoaParams().sub_matrix)
                     .astype(np.int32))
    kw = dict(band=b, o1=400, e1=30, o2=1200, e2=1, interpret=True)
    args = (jnp.asarray(bases), jnp.asarray(preds), jnp.asarray(off),
            jnp.asarray(q_ext), l_len, sm)
    one = M.poa_align_scan_affine_pallas_batch(*args, **kw, chain=True)
    old = M.MAX_BATCH_P
    try:
        M.MAX_BATCH_P = 2
        chunked = M.poa_align_scan_affine_pallas_batch(*args, **kw,
                                                       chain=True)
    finally:
        M.MAX_BATCH_P = old
    for a, c in zip(one, chunked):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
