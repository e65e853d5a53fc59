"""Driver-integrated multi-chip SPMD: the blast chunk-pair grid shards
over the mesh and the FULL ancestor step's output is bit-identical on
1 vs 8 devices (VERDICT r1 item 3; reference merge semantics:
local_alignment.py:336-367 deterministic file-order concatenation)."""

import io

import numpy as np
import pytest

import jax

from cactus_tpu import progressive
from cactus_tpu.config import Config
from cactus_tpu.io.fasta import Sequence
from cactus_tpu.phases.hal import write_hal2maf
from cactus_tpu.testutil import evolver
from cactus_tpu.utils.trees import parse_newick


def _run(n_devices, tmp_path, tag):
    tree = parse_newick("((a:0.03,b:0.03)ab:0.02,c:0.05)root;")
    sim = evolver.simulate(tree, root_len=6000, seed=11)
    genomes = {ev: {f"{ev}.c": Sequence(f"{ev}.c", sim.genomes[ev].codes)}
               for ev in ["a", "b", "c"]}
    cfg = Config.default()
    # force the chunk grid on test-sized contigs (30 Mb default would
    # leave every contig in one chunk)
    cfg.blast.chunk_size = 2048
    cfg.blast.overlap_size = 256
    result = progressive.ProgressiveAligner(
        tree, genomes, config=cfg, min_chain_override=64,
        n_devices=n_devices).run()
    p = str(tmp_path / f"{tag}.maf")
    write_hal2maf(p, result)
    return result, open(p, "rb").read()


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the 8-device virtual CPU mesh")
def test_full_step_identical_1_vs_8_devices(tmp_path):
    r1, maf1 = _run(None, tmp_path, "d1")
    r8, maf8 = _run(8, tmp_path, "d8")
    assert maf1 == maf8
    # block-structure identity of the root step, not just the MAF view
    s1 = r1.steps["root"]
    s8 = r8.steps["root"]
    np.testing.assert_array_equal(s1.caf.alive, s8.caf.alive)
    for f in ("seg_block", "seg_seq", "seg_start", "seg_len", "seg_strand"):
        np.testing.assert_array_equal(getattr(s1.caf.blocks, f),
                                      getattr(s8.caf.blocks, f))
    # sanity: the chunked grid actually aligned things
    assert int(s1.caf.alive.sum()) > 0
    assert maf1.count(b"\ns ") > 0
