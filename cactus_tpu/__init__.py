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
