"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cactus_tpu.config import PoaParams
from cactus_tpu.ops.banded import (GapParams, align_affine_np,
                                   banded_align_batch, pack_band_batch,
                                   score_matrix_6, traceback_band)
from cactus_tpu.parallel.mesh import (full_pipeline_step, make_mesh,
                                      sharded_banded_align,
                                      sharded_seed_join)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    return make_mesh(8)


def test_sharded_banded_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    pairs = [(rng.integers(0, 4, 60).astype(np.uint8),
              rng.integers(0, 4, 64).astype(np.uint8)) for _ in range(16)]
    band = 128
    packed = pack_band_batch(pairs, band)
    submat = score_matrix_6(PoaParams().sub_matrix)
    args = (jnp.asarray(packed["q"]), jnp.asarray(packed["t_shift"]),
            jnp.asarray(packed["m_len"]), jnp.asarray(packed["n_len"]),
            jnp.asarray(packed["lo"]), jnp.asarray(submat))
    d1, s1, m1 = banded_align_batch(*args, band=band, gap_open=400,
                                    gap_extend=30)
    d8, s8, m8 = sharded_banded_align(mesh, *args, band=band, gap_open=400,
                                      gap_extend=30)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s8))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d8))
    # and the scores are correct vs the numpy oracle
    gap = GapParams(400, 30)
    for p in (0, 7, 15):
        score_np, _ = align_affine_np(pairs[p][0], pairs[p][1],
                                      np.asarray(submat), gap)
        assert int(np.asarray(s8)[p, int(np.asarray(m8)[p])]) == score_np


def test_sharded_seed_join_counts(mesh):
    rng = np.random.default_rng(1)
    t = rng.integers(0, 4, 256).astype(np.uint8)
    # every device's chunk is a copy of the target → many anchors
    q = np.stack([t] * 8)
    qv = np.ones_like(q, dtype=bool)
    tv = np.ones(256, dtype=bool)
    qpos, tpos, counts, total = sharded_seed_join(
        mesh, jnp.asarray(q), jnp.asarray(qv), jnp.asarray(t),
        jnp.asarray(tv), k=11, step=1, max_occ=16, max_anchors=1 << 12)
    counts = np.asarray(counts)
    assert counts.shape == (8,)
    assert int(total) == counts.sum()
    assert int(total) >= 8 * (256 - 11 + 1)  # at least the true diagonal


def test_full_pipeline_step_runs(mesh):
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_entry_compiles():
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.jit(fn, static_argnames=())(*args)
    jax.block_until_ready(out)


def test_distributed_noop_single_process(monkeypatch):
    from cactus_tpu.parallel import distributed as dist
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert dist.initialize() is False
    assert dist.is_primary()
    assert dist.process_count() == 1


def test_host_device_mesh_cpu():
    import jax
    from cactus_tpu.parallel import distributed as dist
    mesh = dist.host_device_mesh(backend="cpu")
    n = len(jax.devices("cpu"))
    assert mesh.shape["h"] * mesh.shape["d"] == n
    gm = dist.global_mesh(backend="cpu")
    assert gm.shape["d"] == n


def test_scaling_report():
    from cactus_tpu.parallel import distributed as dist
    mesh = dist.global_mesh(backend="cpu")
    n = mesh.shape["d"]
    rep = dist.scaling_report(mesh, t_one=10.0, t_mesh=10.0 / n)
    assert rep["efficiency"] == 1.0
    rep = dist.scaling_report(mesh, t_one=10.0, t_mesh=12.5 / n)
    assert abs(rep["efficiency"] - 0.8) < 1e-6
