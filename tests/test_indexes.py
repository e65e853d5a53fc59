"""Pangenome indexes: GBZ-lite, haplotype/pos indexes, snarls, stats."""

import numpy as np
import pytest

from cactus_tpu.pangenome.graph import PanGraph
from cactus_tpu.pangenome import indexes as ix


def _codes(s):
    m = {"A": 0, "C": 1, "G": 2, "T": 3, "N": 4}
    return np.array([m[c] for c in s], np.uint8)


@pytest.fixture()
def bubble_graph():
    """ref:  0 → 1 → 3 → 4 ;  alt: 0 → 2 → 3 → 4  (SNP bubble 1/2),
    plus alt2 skipping 3 (deletion bubble)."""
    node_seq = [_codes("ACGT"), _codes("G"), _codes("T"),
                _codes("CCAT"), _codes("GGTA")]
    walks = {
        "ref.c": [(0, 1), (1, 1), (3, 1), (4, 1)],
        "h1.c": [(0, 1), (2, 1), (3, 1), (4, 1)],
        "h2.c": [(0, 1), (1, 1), (4, 1)],
    }
    return PanGraph(node_seq=node_seq, walks=walks,
                    node_block=[0, 1, 1, 2, 3])


def test_gbz_roundtrip(bubble_graph, tmp_path):
    p = str(tmp_path / "g.gbz")
    ix.save_gbz(p, bubble_graph)
    g = ix.load_gbz(p)
    assert g.n_nodes == bubble_graph.n_nodes
    for v in range(g.n_nodes):
        assert np.array_equal(g.node_seq[v], bubble_graph.node_seq[v])
    assert g.walks == bubble_graph.walks
    assert g.node_block == bubble_graph.node_block
    assert g.edges() == bubble_graph.edges()


def test_gbz_roundtrip_with_n(tmp_path):
    g = PanGraph(node_seq=[_codes("ANNT")], walks={"r": [(0, 1)]},
                 node_block=[0])
    p = str(tmp_path / "n.gbz")
    ix.save_gbz(p, g)
    g2 = ix.load_gbz(p)
    assert np.array_equal(g2.node_seq[0], _codes("ANNT"))


def test_haplotype_index(bubble_graph):
    hidx = ix.HaplotypeIndex(bubble_graph)
    exts = hidx.extensions(0, 1)
    # node 0 extends to 1 (ref + h2) and 2 (h1)
    assert exts[0][:2] == (1, 1) and exts[0][2] == 2
    assert (2, 1, 1) in exts
    assert hidx.haplotypes(0, 1, 1, 1) == ["h2.c", "ref.c"]
    assert hidx.count(0, 1, 2, 1) == 1
    # reverse traversal symmetry
    assert hidx.count(1, -1, 0, -1) == 2


def test_path_position_index(bubble_graph):
    pidx = ix.PathPositionIndex(bubble_graph)
    assert pidx.path_length("ref.c") == 4 + 1 + 4 + 4
    v, o, off = pidx.node_at("ref.c", 0)
    assert (v, o, off) == (0, 1, 0)
    v, o, off = pidx.node_at("ref.c", 4)
    assert (v, o) == (1, 1)
    v, o, off = pidx.node_at("ref.c", 7)
    assert (v, off) == (3, 2)
    with pytest.raises(IndexError):
        pidx.node_at("ref.c", 13)


def test_snarls(bubble_graph):
    sn = ix.snarls(bubble_graph, "ref.c")
    assert sn, "no snarls found"
    # the SNP bubble between node 0 and node 3 exists at top level
    tops = [s for s in sn if s.level == 0]
    assert any(s.start[0] == 0 for s in tops)
    for s in sn:
        assert s.span[0] <= s.span[1]


def test_degree_and_depth_stats(bubble_graph):
    d = ix.node_depths(bubble_graph)
    assert d[0] == 3 and d[1] == 2 and d[2] == 1
    st = ix.degree_stats(bubble_graph)
    assert st["n_nodes"] == 5
    assert st["max_depth"] == 3
    assert st["mean_degree"] > 0
