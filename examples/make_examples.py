"""Generate local example inputs mirroring the reference's examples/.

The reference ships seqfiles whose FASTA paths are remote URLs
(examples/evolverMammals.txt etc. point at the cactusTestData repo).
This environment has no egress, so the examples here are produced by
the built-in evolver simulator on the SAME guide trees and at the same
scale, written as ordinary seqfile + FASTA inputs that every CLI entry
point consumes:

    python examples/make_examples.py [--out examples/data] [--small]

    # progressive alignment (reference: `cactus js ex.txt out.hal`)
    python -m cactus_tpu align examples/data/evolverMammals.txt out \
        --maf out.maf --hal out.hal

    # pangenome (reference: `cactus-pangenome ... yeastPangenome.txt`)
    python -m cactus_tpu pangenome examples/data/yeastPangenome.txt panout \
        --reference S288C

--small scales every root length down 20x for a laptop/CI-speed pass.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cactus_tpu.testutil import evolver                     # noqa: E402
from cactus_tpu.utils.trees import parse_newick             # noqa: E402

# the reference fixtures' guide trees (examples/evolverMammals.txt,
# examples/evolverPrimates.txt), event names kept
EVOLVER_MAMMALS = (
    "((simHuman_chr6:0.144018,(simMouse_chr6:0.084509,"
    "simRat_chr6:0.091589)mr:0.271974)anc1:0.020593,"
    "(simCow_chr6:0.18908,simDog_chr6:0.16303)anc2:0.032898)root;")
EVOLVER_PRIMATES = (
    "((simGorilla:0.008964,(simHuman:0.0067,simChimp:0.006667)"
    "anc1:0.00225)anc2:0.009693,simOrang:0.01831)root;")
# yeast pangenome haplotypes (examples/yeastPangenome.txt is a star of
# assemblies around S288C); modeled as a shallow star
YEAST = "(S288C:0.01,DBVPG6044:0.01,UWOPS034614:0.01,Y12:0.01)root;"


def _emit(name: str, newick: str, root_len: int, seed: int,
          outdir: str) -> str:
    d = os.path.join(outdir, name)
    os.makedirs(d, exist_ok=True)
    sim = evolver.simulate(parse_newick(newick), root_len=root_len,
                           seed=seed)
    sf = evolver.write_seqfile(sim, d,
                               path=os.path.join(outdir, f"{name}.txt"))
    print(f"{name}: {len(sim.tree.leaf_names())} genomes x ~{root_len} bp "
          f"-> {sf}")
    return sf


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data"))
    ap.add_argument("--small", action="store_true",
                    help="20x smaller genomes (CI-speed)")
    args = ap.parse_args()
    scale = 20 if args.small else 1
    os.makedirs(args.out, exist_ok=True)
    _emit("evolverMammals", EVOLVER_MAMMALS, 600_000 // scale, 41, args.out)
    _emit("evolverPrimates", EVOLVER_PRIMATES, 600_000 // scale, 42, args.out)
    _emit("yeastPangenome", YEAST, 200_000 // scale, 43, args.out)


if __name__ == "__main__":
    main()
