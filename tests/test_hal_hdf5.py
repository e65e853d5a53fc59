"""HDF5 HAL container: exact round trip + structural layout.

The reference stores alignments as HDF5 through the hal library; this
maps the native archive to/from an HDF5 container with HAL's
structural model (see io/hal_hdf5.py for the compatibility caveat)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from cactus_tpu.hal_archive import HalArchive
from cactus_tpu.io.fasta import Sequence
from cactus_tpu.io.hal_hdf5 import export_hdf5, import_hdf5
from cactus_tpu import progressive
from cactus_tpu.testutil import evolver
from cactus_tpu.utils.trees import parse_newick


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    d = tmp_path_factory.mktemp("h5hal")
    tree = parse_newick("((a:0.03,b:0.03)ab:0.02,c:0.05)root;")
    sim = evolver.simulate(tree, root_len=4000, seed=13)
    genomes = {ev: {f"{ev}.c": Sequence(f"{ev}.c", sim.genomes[ev].codes)}
               for ev in ["a", "b", "c"]}
    res = progressive.ProgressiveAligner(
        tree, genomes, min_chain_override=64).run()
    path = str(d / "aln.hal")
    return HalArchive.from_result(path, res), d


def test_roundtrip_exact(archive):
    arc, d = archive
    h5path = str(d / "aln.h5")
    export_hdf5(arc, h5path)
    back = import_hdf5(h5path, str(d / "back.hal"))
    assert sorted(back.genomes()) == sorted(arc.genomes())
    for ev in arc.genomes():
        assert back.parent(ev) == arc.parent(ev)
        assert back.sequences(ev) == arc.sequences(ev)
        a = arc.dna(ev)
        b = back.dna(ev)
        for n in a:
            np.testing.assert_array_equal(a[n].codes, b[n].codes)
    # halStats table identical
    key = lambda rows: sorted((r["genome"], r["length"],
                               r["n_top_segments"],
                               r["n_bottom_segments"]) for r in rows)
    assert key(back.stats()) == key(arc.stats())
    assert back.validate() == []


def test_hdf5_layout(archive):
    """HAL structural model: one group per genome with parent links,
    sequence tables, DNA and segment arrays."""
    arc, d = archive
    h5path = str(d / "layout.h5")
    export_hdf5(arc, h5path)
    with h5py.File(h5path, "r") as h5:
        assert set(h5) == set(arc.genomes())
        root = [ev for ev in h5 if h5[ev].attrs["parent"] == ""]
        assert len(root) == 1
        for ev in h5:
            g = h5[ev]
            assert "SEQUENCE_NAMES" in g and "DNA" in g
            assert g["DNA"].shape[0] == sum(
                l for _n, l in arc.sequences(ev))
        # ancestors carry bottoms; leaves carry tops
        anc = root[0]
        assert "BOTTOM_SEQ" in h5[anc]


def test_cli_roundtrip(archive):
    from cactus_tpu import cli
    arc, d = archive
    h5path = str(d / "cli.h5")
    back = str(d / "cli_back.hal")
    assert cli.main(["hal", "export-hdf5", arc.path, "--out", h5path]) == 0
    assert cli.main(["hal", "import-hdf5", back, "--hdf5", h5path]) == 0
    b = HalArchive.open(back)
    assert sorted(b.genomes()) == sorted(arc.genomes())
    assert cli.main(["hal", "validate", back]) == 0
