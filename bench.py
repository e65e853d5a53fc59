"""Headline benchmark: banded-DP cell updates per second per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} whose
headline metric is the fused banded-affine-DP kernel; the "extras" field
carries the rest of the BASELINE.json metric set: pair-HMM posterior and
POA kernel throughput, a MEASURED CPU banded-DP anchor (same kernel on
the XLA CPU backend), and end-to-end alignment wall-clock +
alignment-columns/s on a pinned two-genome 100 kb simulated input.

The reference publishes no cell-updates/s figure (BASELINE.md); the
comparison anchor for vs_baseline is the lastz/cPecan-class CPU inner
loop at ~1e9 DP cell updates/s/core (lastz gapped extension on modern
x86) — the north-star target is >= 5x (BASELINE.json).  The measured
CPU figure of THIS kernel is reported alongside so the asserted anchor
can be sanity-checked.
"""

from __future__ import annotations

import json
import time

import numpy as np

CPU_BASELINE_CELLS_PER_S = 1.0e9


def _bench(fn, n_iter: int, fetch=None) -> float:
    """Slope timing with an end-of-chain FETCH sync.

    jax.block_until_ready does NOT reliably wait on the remote-relay
    backend (measured: 10 multi-ms kernels "completed" in 0.4 ms);
    only materializing a value forces completion.  Timing two chain
    lengths and taking the slope cancels the fetch round trip, so the
    number is pure marginal kernel cost."""
    import jax
    import numpy as np

    if fetch is None:
        fetch = lambda o: np.asarray(jax.tree_util.tree_leaves(o)[0])
    fetch(fn(0))                               # compile + warm
    t0 = time.perf_counter()
    out = None
    for i in range(3):
        out = fn(i + 1)
    fetch(out)
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(n_iter + 3):
        out = fn(i + 1)
    fetch(out)
    t_big = time.perf_counter() - t0
    return max((t_big - t_small) / n_iter, 1e-9)


def bench_banded(jax, jnp, device=None) -> float:
    """Fused banded affine DP (the lastz/cPecan gapped-extension analog)."""
    from cactus_tpu.config import PoaParams
    from cactus_tpu.ops.banded import banded_align_batch, score_matrix_6

    platform = (device or jax.devices()[0]).platform
    P, M, band = (64, 4096, 512) if platform == "tpu" else (16, 1024, 256)
    rng = np.random.default_rng(0)
    put = (lambda x: jax.device_put(np.asarray(x), device))
    q = put(rng.integers(0, 4, (P, M)).astype(np.uint8))
    rest = (put(rng.integers(0, 4, (P, M + band)).astype(np.uint8)),
            put(np.full(P, M, dtype=np.int32)),
            put(np.full(P, M, dtype=np.int32)),
            put(np.zeros(P, dtype=np.int32)),
            put(score_matrix_6(PoaParams().sub_matrix)))
    if platform == "tpu":
        from cactus_tpu.ops.banded_pallas import banded_align_batch_pallas
        kernel = banded_align_batch_pallas
    else:
        kernel = banded_align_batch

    # vary inputs per call HOST-side (defeats remote-relay result
    # caching) and call the jitted kernel directly: wrapping a jitted
    # kernel in another jit costs ~21 ms/call of nested-pjit dispatch
    # on the relay backend and understates throughput
    qs = [put(np.roll(np.asarray(q), i + 1, axis=0))
          for i in range(10)]

    def run(i):
        dirs, scores, mat = kernel(qs[i % len(qs)] if i else q, *rest,
                                   band=band, gap_open=400,
                                   gap_extend=30)
        return scores

    dt = _bench(run, 10 if platform == "tpu" else 3,
                fetch=lambda o: float(o[0, 0]))
    return P * M * band / dt


def bench_pairhmm(jax, jnp) -> float:
    """Pair-HMM forward/backward posterior kernel (cPecan analog).
    Uses the production router (Pallas on TPU once validated)."""
    from cactus_tpu.ops.pairhmm import HmmParams, posterior_default_backend

    platform = jax.devices()[0].platform
    P, M, band = (32, 2048, 256) if platform == "tpu" else (8, 512, 128)
    p = HmmParams()
    kernel = posterior_default_backend()
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.integers(0, 4, (P, M)).astype(np.uint8))
    t_shift = jnp.asarray(rng.integers(0, 4, (P, M + band)).astype(np.uint8))
    m_len = jnp.asarray(np.full(P, M, dtype=np.int32))
    lo = jnp.asarray(np.zeros(P, dtype=np.int32))
    em = jnp.asarray(p.emissions())

    qs = [jnp.asarray(np.roll(np.asarray(q), i + 1, axis=0))
          for i in range(5)]

    def run(i):
        return kernel(qs[i % len(qs)] if i else q, t_shift,
                      m_len, m_len, lo, em, band=band,
                      delta=p.delta, epsilon=p.epsilon)

    dt = _bench(run, 5 if platform == "tpu" else 2,
                fetch=lambda o: float(o[0, 0, 0]))
    # forward + backward + posterior ≈ 3 passes over the band
    return 3 * P * M * band / dt


def bench_pairhmm5(jax, jnp) -> float:
    """Five-state pair-HMM kernel (the BAR pecan production model)."""
    from cactus_tpu.ops.pairhmm5 import Hmm5Params, posterior5_default_backend

    platform = jax.devices()[0].platform
    P, M, band = (32, 2048, 256) if platform == "tpu" else (8, 512, 128)
    p = Hmm5Params()
    kernel = posterior5_default_backend()
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.integers(0, 4, (P, M)).astype(np.uint8))
    t_shift = jnp.asarray(rng.integers(0, 4, (P, M + band)).astype(np.uint8))
    m_len = jnp.asarray(np.full(P, M, dtype=np.int32))
    lo = jnp.asarray(np.zeros(P, dtype=np.int32))
    em = jnp.asarray(p.emissions())

    qs = [jnp.asarray(np.roll(np.asarray(q), i + 1, axis=0))
          for i in range(5)]

    def run(i):
        return kernel(qs[i % len(qs)] if i else q, t_shift,
                      m_len, m_len, lo, em, band=band, params=p)

    dt = _bench(run, 5 if platform == "tpu" else 2,
                fetch=lambda o: float(o[0, 0, 0]))
    return 3 * P * M * band / dt


def _poa_shape_bench(jax, jnp, P, N, B, L, branchy: bool,
                     n_iter: int = 8) -> float:
    """One POA bin through the PRODUCTION entry
    (poa_align_scan_affine_pallas_batch with host chain certification,
    exactly as poa_msa_batch calls it)."""
    from cactus_tpu.config import PoaParams
    from cactus_tpu.ops.banded import score_matrix_6
    from cactus_tpu.ops.poa import MAX_PREDS, _affine_pallas_batch_or_none
    from cactus_tpu.ops.poa import poa_align_scan_affine

    params = PoaParams()
    o1, e1 = params.gap_open1, params.gap_extend1
    o2, e2 = params.gap_open2, params.gap_extend2
    sm = jnp.asarray(np.asarray(score_matrix_6(params.sub_matrix),
                                np.int32))
    rng = np.random.default_rng(2)
    bases = jnp.asarray(rng.integers(0, 4, (P, N)).astype(np.uint8))
    preds = np.full((P, N, MAX_PREDS), -1, dtype=np.int32)
    preds[:, 1:, 0] = np.arange(N - 1)
    if branchy:
        # bubbled graphs as progressive rounds >= 2 produce them
        for k in range(10, N - 3, 37):
            preds[:, k + 2, 1] = k
    off = np.maximum.accumulate(
        np.clip((np.arange(N) * (L / N)).astype(np.int32) - B // 2,
                0, max(0, L + 1 - B)))[None, :].repeat(P, 0).astype(np.int32)
    q_ext = np.full((P, L + 1), 5, np.uint8)
    q_ext[:, 1:] = rng.integers(0, 4, (P, L))
    q_ext = jnp.asarray(q_ext)
    l_len = jnp.asarray(np.full(P, L, np.int32))

    batch = _affine_pallas_batch_or_none(N, B)
    # every timed call must see a DISTINCT input (the remote relay
    # caches results for identical inputs; a too-small variant pool
    # measured degenerate slopes AND bogus 150 G readings in round 5 —
    # the pool must exceed the total call count of both chains)
    pool = n_iter + 8
    rolled = [jnp.asarray(np.roll(np.asarray(bases), i + 1, axis=0))
              for i in range(pool)]
    import itertools
    cnt = itertools.count()
    if batch is None:
        vbatch = jax.jit(jax.vmap(
            lambda b, pr, of, qe, ll: poa_align_scan_affine(
                b, pr, of, qe, sm, band=B, o1=o1, e1=e1, o2=o2, e2=e2,
                l_len=ll)))
        pj, oj = jnp.asarray(preds), jnp.asarray(off)
        run = lambda i: vbatch(rolled[next(cnt) % pool], pj,
                               oj, q_ext, l_len)[2]
    else:
        # device-resident topology + an explicit chain certificate,
        # exactly like poa_msa_batch (which certifies once per launch
        # on its host stacks); numpy inputs here would re-upload the
        # same preds/off through the relay tunnel every call and
        # measure tunnel bandwidth, not the kernel
        cert = None if branchy else True
        pj, oj = jnp.asarray(preds), jnp.asarray(off)
        run = lambda i: batch(rolled[next(cnt) % pool], pj,
                              oj, q_ext, l_len, sm, band=B,
                              o1=o1, e1=e1, o2=o2, e2=e2,
                              chain=cert)[2]
    dt = _bench(run, n_iter, fetch=lambda o: float(o[0, 0]))
    return P * N * B / dt


def bench_poa(jax, jnp) -> float:
    """Batched convex-affine POA (the abPOA analog BAR launches via
    poa_msa_batch), measured at the DOMINANT production bin: a 150 kb
    evolverMammals run logs (Nb=64, B=64) bins with P = 1000-4000 jobs
    per progressive round (CACTUS_POA_LOG_BINS evidence, round 5).
    Round-1 bins are certified chains and route to the register-carry
    chain kernel; the entry's chunking caps one launch at 2048."""
    platform = jax.devices()[0].platform
    if platform != "tpu":
        return _poa_shape_bench(jax, jnp, 2, 256, 128, 256, False,
                                n_iter=2)
    return _poa_shape_bench(jax, jnp, 2048, 64, 64, 64, False)


def bench_poa_extras(jax, jnp) -> dict:
    """Secondary POA bins: the big 512-node chain bin and the
    general-topology (bubbled-graph) kernel that progressive rounds
    >= 2 use."""
    return {
        "poa_bin512_cell_updates_per_s": round(
            _poa_shape_bench(jax, jnp, 1024, 512, 128, 512, False), 1),
        "poa_general_cell_updates_per_s": round(
            _poa_shape_bench(jax, jnp, 2048, 64, 64, 64, True), 1),
    }


def bench_end_to_end() -> dict:
    """Pinned two-genome 100 kb progressive alignment: wall-clock and
    aligned columns/s (the BASELINE.json alignment-columns metric)."""
    from cactus_tpu.io.fasta import Sequence
    from cactus_tpu import progressive
    from cactus_tpu.testutil import evolver
    from cactus_tpu.utils.trees import parse_newick

    tree = parse_newick("(a:0.07,b:0.07)root;")
    sim = evolver.simulate(tree, root_len=100_000, seed=17)
    genomes = {ev: {f"{ev}.c": Sequence(f"{ev}.c", sim.genomes[ev].codes)}
               for ev in ("a", "b")}
    t0 = time.perf_counter()
    res = progressive.ProgressiveAligner(tree, genomes).run()
    wall = time.perf_counter() - t0
    step = res.steps["root"]
    cols = int(step.caf.blocks.block_length()[
        np.flatnonzero(step.caf.alive)].sum())
    return {"e2e_100kb_wall_s": round(wall, 2),
            "e2e_alignment_columns_per_s": round(cols / wall, 1)}


def main() -> None:
    import jax
    import jax.numpy as jnp

    # the remote relay admits ONE client session: if another long job
    # (e.g. a scale proof) holds it, backend init raises — retry
    # briefly, then fall back to the CPU backend so the bench always
    # emits its one JSON line (the metric name carries the platform)
    for attempt in range(3):
        try:
            jax.devices()
            break
        except RuntimeError:
            if attempt == 2:
                jax.config.update("jax_platforms", "cpu")
                jax.devices()
            else:
                time.sleep(20)

    platform = jax.devices()[0].platform
    cells_per_s = bench_banded(jax, jnp)

    extras = {
        "pairhmm_cell_updates_per_s": round(bench_pairhmm(jax, jnp), 1),
        "pairhmm5_cell_updates_per_s": round(bench_pairhmm5(jax, jnp), 1),
        "poa_cell_updates_per_s": round(bench_poa(jax, jnp), 1),
    }
    if platform == "tpu":
        try:
            extras.update(bench_poa_extras(jax, jnp))
        except Exception as e:
            extras["poa_extras_error"] = repr(e)[:200]
    # measured CPU anchor: the same banded kernel on the XLA CPU backend
    try:
        cpu = jax.devices("cpu")[0]
        extras["measured_cpu_banded_cells_per_s"] = round(
            bench_banded(jax, jnp, device=cpu), 1)
    except Exception:
        pass
    try:
        extras.update(bench_end_to_end())
    except Exception as e:  # end-to-end must never sink the headline
        extras["e2e_error"] = repr(e)[:200]

    print(json.dumps({
        "metric": f"banded_dp_cell_updates_per_s_{platform}",
        "value": cells_per_s,
        "unit": "cells/s/chip",
        "vs_baseline": cells_per_s / CPU_BASELINE_CELLS_PER_S,
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
