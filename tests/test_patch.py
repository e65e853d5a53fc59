"""panpatch analog: scaffold + gap-fill a fragmented assembly."""

import numpy as np
import pytest

from cactus_tpu.io.fasta import Sequence
from cactus_tpu.pangenome.graph import build_graph
from cactus_tpu.pangenome.patch import patch_assembly
from cactus_tpu.phases.blast import align_genomes
from cactus_tpu.phases.caf import run_caf
from cactus_tpu.config import Config


@pytest.fixture(scope="module")
def patch_graph():
    """Donor = full 9kb chromosome; target = two fragments with the
    middle 1kb missing (the assembly gap)."""
    rng = np.random.default_rng(77)
    donor = rng.integers(0, 4, 9_000).astype(np.uint8)

    def mutate(codes, seed):
        r = np.random.default_rng(seed)
        out = codes.copy()
        hit = r.random(len(out)) < 0.005
        out[hit] = (out[hit] + r.integers(1, 4, int(hit.sum()))) % 4
        return out

    frag1 = mutate(donor[:4_000], 1)
    frag2 = mutate(donor[5_000:], 2)
    seqs = {
        "donor.chr1": Sequence("donor.chr1", donor),
        "tgt.f1": Sequence("tgt.f1", frag1),
        "tgt.f2": Sequence("tgt.f2", frag2),
    }
    cfg = Config.default()
    records = []
    for n in ["tgt.f1", "tgt.f2"]:
        records.extend(align_genomes({n.split(".", 1)[1]: seqs[n]},
                                     {"chr1": seqs["donor.chr1"]},
                                     n.split(".", 1)[0], "donor",
                                     cfg.blast))
    caf = run_caf(records, {n: len(s) for n, s in seqs.items()},
                  cfg.caf, ingroup_events={"donor", "tgt"},
                  min_chain_override=64)
    g = build_graph(caf, seqs, chop=True)
    g.validate(seqs)
    return g, seqs, donor, frag1, frag2


def test_patch_scaffolds_and_fills(patch_graph):
    g, seqs, donor, frag1, frag2 = patch_graph
    patched, report = patch_assembly(g, "tgt", ["donor"])
    assert report["placed"] == ["tgt.f1", "tgt.f2"]
    assert not report["unplaced"]
    assert report["donor_bp"] >= 900       # the missing ~1kb came back
    (name, seq), = patched.items()
    s = seq.codes
    # both fragments embedded verbatim, in order
    def find(hay, needle):
        n = len(needle)
        for i in range(len(hay) - n + 1):
            if np.array_equal(hay[i:i + n], needle):
                return i
        return -1
    i1 = find(s, frag1[:500])
    i2 = find(s, frag2[-500:])
    assert i1 >= 0 and i2 > i1
    # total length ≈ donor length
    assert 0.95 * len(donor) < len(s) < 1.1 * len(donor)


def test_patch_telomere_extension(patch_graph):
    g, seqs, donor, frag1, frag2 = patch_graph
    # drop f1: only f2 (interior-to-end fragment); telomere mode pulls
    # the donor lead-in
    g2 = type(g)(node_seq=list(g.node_seq),
                 walks={n: w for n, w in g.walks.items()
                        if n != "tgt.f1"},
                 node_block=list(g.node_block))
    patched, report = patch_assembly(g2, "tgt", ["donor"],
                                     require_telomeres=True)
    assert report["placed"] == ["tgt.f2"]
    (name, seq), = patched.items()
    assert len(seq) > 0.9 * len(donor)


def test_patch_unplaced_passthrough(patch_graph):
    g, *_ = patch_graph
    patched, report = patch_assembly(g, "tgt", ["nosuchdonor"])
    assert set(report["unplaced"]) == {"tgt.f1", "tgt.f2"}
    assert set(patched) == {"tgt.f1", "tgt.f2"}
