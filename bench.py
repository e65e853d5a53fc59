"""Headline benchmark: banded-DP cell updates per second per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no cell-updates/s figure (BASELINE.md); the
comparison anchor is the lastz/cPecan-class CPU inner loop, which sustains
on the order of 1e9 DP cell updates/s/core (lastz gapped extension on
modern x86).  vs_baseline = our cells/s per chip divided by that 1e9
CPU-core figure — the north-star target is >= 5x (BASELINE.json).
"""

from __future__ import annotations

import json
import time

import numpy as np

CPU_BASELINE_CELLS_PER_S = 1.0e9


def main() -> None:
    import jax
    import jax.numpy as jnp
    from cactus_tpu.config import PoaParams
    from cactus_tpu.ops.banded import banded_align_batch, score_matrix_6

    from cactus_tpu.ops.banded_pallas import banded_align_batch_pallas

    platform = jax.devices()[0].platform
    # workload: batch of long pairs at a wide band to saturate the VPU
    P, M, band = (64, 4096, 512) if platform == "tpu" else (16, 1024, 256)
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, (P, M)).astype(np.uint8)
    t_shift = rng.integers(0, 4, (P, M + band)).astype(np.uint8)
    m_len = np.full(P, M, dtype=np.int32)
    n_len = np.full(P, M, dtype=np.int32)
    lo = np.zeros(P, dtype=np.int32)
    submat = score_matrix_6(PoaParams().sub_matrix)

    qd = jnp.asarray(q)
    rest = (jnp.asarray(t_shift), jnp.asarray(m_len), jnp.asarray(n_len),
            jnp.asarray(lo), jnp.asarray(submat))

    kernel = (banded_align_batch_pallas if platform == "tpu"
              else banded_align_batch)

    @jax.jit
    def run(qx, i):
        # roll by the iteration index so every call is distinct work
        # (defeats any result caching in remote-execution relays)
        dirs, scores, mat = kernel(
            jnp.roll(qx, i, axis=0), *rest,
            band=band, gap_open=400, gap_extend=30)
        return scores

    run(qd, 0).block_until_ready()  # compile
    n_iter = 10 if platform == "tpu" else 3
    t0 = time.perf_counter()
    outs = [run(qd, i + 1) for i in range(n_iter)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n_iter

    cells = P * M * band
    cells_per_s = cells / dt
    print(json.dumps({
        "metric": f"banded_dp_cell_updates_per_s_{platform}",
        "value": cells_per_s,
        "unit": "cells/s/chip",
        "vs_baseline": cells_per_s / CPU_BASELINE_CELLS_PER_S,
    }))


if __name__ == "__main__":
    main()
