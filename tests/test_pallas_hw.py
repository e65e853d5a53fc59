"""Opt-in REAL-TPU parity validation of every Pallas kernel.

Interpret-mode tests catch semantic drift, but three real bugs this
round only surfaced on hardware (uninitialized-VMEM reads for
forward-pred rows, a (1, Lq) block that only lowers at P == 1, SMEM
window padding blowing the 1 MB budget).  Run on a chip:

    RUN_SLOW=1 CACTUS_TEST_TPU=1 python -m pytest tests/test_pallas_hw.py -q
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not (os.environ.get("RUN_SLOW") and os.environ.get("CACTUS_TEST_TPU")),
    reason="hardware parity: set RUN_SLOW=1 CACTUS_TEST_TPU=1 on a chip")


def _require_tpu():
    import jax
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU attached")


def _mutate(rng, q, sub=0.12, indel=0.03):
    out = []
    for c in q:
        r = rng.random()
        if r < indel / 2:
            continue
        if r < indel:
            out.append(rng.integers(0, 4))
        out.append(rng.integers(0, 4) if rng.random() < sub else c)
    return np.array(out, np.uint8)


def test_banded_hw_parity():
    _require_tpu()
    import jax
    from cactus_tpu.config import PoaParams
    from cactus_tpu.ops.banded import (GapParams, banded_align_batch,
                                       pack_band_batch, score_matrix_6,
                                       traceback_band)
    from cactus_tpu.ops.banded_pallas import banded_align_batch_pallas

    rng = np.random.default_rng(5)
    submat = score_matrix_6(PoaParams().sub_matrix)
    gap = GapParams()
    for band in (128, 256):
        pairs = []
        for _ in range(13):
            n = int(rng.integers(5, 900))
            q = rng.integers(0, 4, n).astype(np.uint8)
            pairs.append((q, _mutate(rng, q)))
        packed = pack_band_batch(pairs, band)
        cpu = jax.devices("cpu")[0]
        args_c = [jax.device_put(packed[k], cpu)
                  for k in ("q", "t_shift", "m_len", "n_len", "lo")]
        d_x, s_x, m_x = banded_align_batch(
            *args_c, jax.device_put(submat, cpu), band=band,
            gap_open=gap.gap_open, gap_extend=gap.gap_extend)
        import jax.numpy as jnp
        d_p, s_p, m_p = banded_align_batch_pallas(
            jnp.asarray(packed["q"]), jnp.asarray(packed["t_shift"]),
            jnp.asarray(packed["m_len"]), jnp.asarray(packed["n_len"]),
            jnp.asarray(packed["lo"]), jnp.asarray(submat), band=band,
            gap_open=gap.gap_open, gap_extend=gap.gap_extend)
        np.testing.assert_array_equal(np.asarray(s_x), np.asarray(s_p))
        d_xn, d_pn = np.asarray(d_x), np.asarray(d_p)
        for p, (q, t) in enumerate(pairs):
            ox = traceback_band(d_xn[p], len(q), len(t),
                                int(packed["lo"][p]),
                                int(np.asarray(m_x)[p]))
            op = traceback_band(d_pn[p], len(q), len(t),
                                int(packed["lo"][p]),
                                int(np.asarray(m_p)[p]))
            assert ox == op, (band, p)


def test_pairhmm_hw_parity():
    _require_tpu()
    import jax.numpy as jnp
    from cactus_tpu.ops.banded import pack_band_batch
    from cactus_tpu.ops.pairhmm import HmmParams, posterior_banded_batch
    from cactus_tpu.ops.pairhmm_pallas import posterior_banded_batch_pallas

    rng = np.random.default_rng(3)
    pairs = []
    for _ in range(9):
        n = int(rng.integers(40, 900))
        q = rng.integers(0, 4, n).astype(np.uint8)
        pairs.append((q, _mutate(rng, q, sub=0.15)))
    band = 128
    packed = pack_band_batch(pairs, band)
    p2 = HmmParams()
    args = (jnp.asarray(packed["q"]), jnp.asarray(packed["t_shift"]),
            jnp.asarray(packed["m_len"]), jnp.asarray(packed["n_len"]),
            jnp.asarray(packed["lo"]))
    post_x = np.asarray(posterior_banded_batch(
        *args, jnp.asarray(p2.emissions()), band=band, delta=p2.delta,
        epsilon=p2.epsilon))
    post_p = np.asarray(posterior_banded_batch_pallas(
        *args, jnp.asarray(p2.emissions()), band=band, delta=p2.delta,
        epsilon=p2.epsilon))
    assert np.abs(post_x - post_p).max() < 5e-3


def test_poa_affine_hw_parity_grouped():
    """The G-grouped kernel must match the XLA scan on branchy banded
    graphs at a shape that engages G=8."""
    _require_tpu()
    import jax.numpy as jnp
    from cactus_tpu.config import PoaParams
    from cactus_tpu.ops.banded import score_matrix_6
    from cactus_tpu.ops.poa import MAX_PREDS, poa_align_scan_affine
    from cactus_tpu.ops.poa_pallas import (
        _group_size, poa_align_scan_affine_pallas_batch)

    params = PoaParams()
    kw = dict(band=128, o1=params.gap_open1, e1=params.gap_extend1,
              o2=params.gap_open2, e2=params.gap_extend2)
    sm = jnp.asarray(np.asarray(score_matrix_6(params.sub_matrix),
                                np.int32))
    rng = np.random.default_rng(4)
    P, N, L = 32, 512, 512
    assert _group_size(N, 128) == 8
    preds = np.full((P, N, MAX_PREDS), -1, np.int32)
    preds[:, 1:, 0] = np.arange(N - 1)
    for k in range(10, N - 3, 37):
        preds[:, k + 2, 1] = k
    off = np.maximum.accumulate(
        np.clip((np.arange(N) * (L / N)).astype(np.int32) - 64,
                0, L + 1 - 128))[None, :].repeat(P, 0).astype(np.int32)
    q_ext = np.full((P, L + 1), 5, np.uint8)
    q_ext[:, 1:] = rng.integers(0, 4, (P, L))
    bases = rng.integers(0, 4, (P, N)).astype(np.uint8)
    llen = np.full(P, L, np.int32)
    H_p, d_p, _e = poa_align_scan_affine_pallas_batch(
        jnp.asarray(bases), jnp.asarray(preds), jnp.asarray(off),
        jnp.asarray(q_ext), jnp.asarray(llen), sm, **kw)
    for i in (0, 7, 31):
        H_x, d_x, _ = poa_align_scan_affine(
            jnp.asarray(bases[i]), jnp.asarray(preds[i]),
            jnp.asarray(off[i]), jnp.asarray(q_ext[i]), sm, **kw)
        np.testing.assert_array_equal(np.asarray(H_x)[:N, :128],
                                      np.asarray(H_p)[i, :N, :128])
        np.testing.assert_array_equal(
            np.asarray(d_x)[:N, :128].astype(np.int32),
            np.asarray(d_p)[i, :N, :128].astype(np.int32))


def test_poa_chain_hw_parity():
    """The round-5 chain kernel (banded-style sublane packing, packed
    word slabs, class-word band carry) must match the XLA scan on the
    chip, including B < Bp, N % R != 0, and a TP-padded big batch."""
    _require_tpu()
    import jax.numpy as jnp
    from cactus_tpu.config import PoaParams
    from cactus_tpu.ops.banded import score_matrix_6
    from cactus_tpu.ops.poa import MAX_PREDS, poa_align_scan_affine
    from cactus_tpu.ops.poa_pallas import (
        _chain_check_np, poa_align_scan_affine_pallas_batch)

    params = PoaParams()
    kw = dict(o1=params.gap_open1, e1=params.gap_extend1,
              o2=params.gap_open2, e2=params.gap_extend2)
    sm = np.asarray(score_matrix_6(params.sub_matrix), np.int32)
    rng = np.random.default_rng(11)
    for (P, N, B, L) in [(5, 24, 64, 150), (2, 17, 128, 40),
                         (300, 64, 64, 80)]:
        bases = rng.integers(0, 4, (P, N)).astype(np.uint8)
        preds = np.full((P, N, MAX_PREDS), -1, np.int32)
        preds[:, 1:, 0] = np.arange(N - 1)
        hi = max(0, L + 1 - B)
        steps = rng.integers(0, 2, (P, N))
        steps[:, 0] = 0
        off = np.minimum(np.cumsum(steps, axis=1), hi).astype(np.int32)
        q_ext = np.full((P, L + 1), 5, np.uint8)
        q_ext[:, 1:] = rng.integers(0, 4, (P, L))
        l_len = np.full(P, L, np.int32)
        assert _chain_check_np(preds, off)
        H, dirs, ends = poa_align_scan_affine_pallas_batch(
            bases, preds, off, q_ext, jnp.asarray(l_len),
            jnp.asarray(sm), band=B, **kw)
        H = np.asarray(H)
        dirs = np.asarray(dirs)
        ends = np.asarray(ends)
        for p in range(0, P, max(1, P // 7)):
            Ho, do, eo = poa_align_scan_affine(
                jnp.asarray(bases[p]), jnp.asarray(preds[p]),
                jnp.asarray(off[p]), jnp.asarray(q_ext[p]),
                jnp.asarray(sm), band=B, **kw)
            np.testing.assert_array_equal(H[p], np.asarray(Ho))
            np.testing.assert_array_equal(
                dirs[p], np.asarray(do).astype(np.int32))
            np.testing.assert_array_equal(ends[p], np.asarray(eo))
