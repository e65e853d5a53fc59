"""cactus_tpu — a TPU-native whole-genome aligner / pangenome builder.

A from-scratch reimplementation of the capabilities of Cactus
(ComparativeGenomicsToolkit/cactus) designed TPU-first:

- pairwise anchoring (lastz equivalent)  -> JAX seed join + Pallas banded DP
  (reference: paf/local_alignment.py, submodule lastz)
- base-level refinement (BAR / abPOA / cPecan) -> batched banded DP + pair-HMM
  kernels over shape-binned flower batches (reference: bar/impl/*)
- CAF pinch/cactus graph                 -> host-side graph library driven by
  device-produced anchor tensors (reference: caf/impl/*, pinchesAndCacti)
- reference phase                        -> host matching/ordering + batched
  Felsenstein ancestral inference (reference: reference/impl/*)
- orchestration                          -> single multi-controller JAX program
  + thin host pipeline (reference: Toil workflow in src/cactus/progressive)
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache for every entry point (CLI, driver,
# bench) — the DP kernels jit once per shape bin and a cold cache costs
# minutes per bin; tests/conftest.py sets the same values for pytest.
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       "/tmp/cactus_tpu_jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import sys as _sys
if "jax" in _sys.modules:
    # jax already imported (its env snapshot is taken) — set directly
    import jax as _jax
    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ["JAX_COMPILATION_CACHE_DIR"])
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
