"""Giraffe index pair: minimizer (.min) and distance (.dist) analogs."""

import numpy as np
import pytest

from cactus_tpu.pangenome.giraffe import (DistanceIndex, MinimizerIndex,
                                          kmer_hashes,
                                          minimizer_positions,
                                          oriented_min_distance)


def _brute_minimizers(codes, k, w):
    h = kmer_hashes(codes, k)
    n = len(h)
    if n == 0:
        return np.zeros(0, np.int64)
    if n <= w:
        return np.array([int(np.argmin(h))], np.int64)
    out = set()
    for i in range(n - w + 1):
        out.add(i + int(np.argmin(h[i:i + w])))
    return np.array(sorted(out), np.int64)


@pytest.mark.parametrize("L,k,w,seed", [(200, 15, 10, 0), (64, 5, 7, 1),
                                        (1000, 29, 11, 2), (40, 7, 50, 3)])
def test_minimizer_positions_match_bruteforce(L, k, w, seed):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, L).astype(np.uint8)
    codes[rng.integers(0, L, L // 20)] = 4      # sprinkle Ns
    got = minimizer_positions(codes, k, w)
    want = _brute_minimizers(codes, k, w)
    np.testing.assert_array_equal(got, want)


@pytest.fixture(scope="module")
def pan():
    from cactus_tpu.io.fasta import Sequence
    from cactus_tpu.pangenome import graph as pgraph
    from cactus_tpu.testutil import evolver
    from cactus_tpu.utils.trees import parse_newick
    from tests.test_pangenome import _star_caf
    tree = parse_newick("(a:0.03,b:0.03,c:0.03)root;")
    sim = evolver.simulate(tree, root_len=4000, seed=23)
    seqs = {f"{g}.c": Sequence(f"{g}.c", sim.genomes[g].codes)
            for g in ["a", "b", "c"]}
    caf = _star_caf(seqs)
    g = pgraph.build_graph(caf, seqs, chop=True)
    return seqs, g


def test_minimizer_index_covers_paths(pan, tmp_path):
    """Every (k,w) minimizer of every haplotype path is queryable."""
    from cactus_tpu.io.fasta import revcomp
    seqs, g = pan
    k, w = 15, 8
    idx = MinimizerIndex.build(g, k=k, w=w)
    assert len(idx.hashes) > 0
    for name, walk in g.walks.items():
        parts = [g.node_seq[v] if o == 1 else revcomp(g.node_seq[v])
                 for v, o in walk]
        seq = np.concatenate(parts)
        pos = minimizer_positions(seq, k, w)
        h = kmer_hashes(seq, k)[pos]
        for hv in h[:50]:
            assert idx.lookup(int(hv)), "minimizer missing from index"

    p = str(tmp_path / "g.min")
    idx.save(p)
    idx2 = MinimizerIndex.load(p)
    np.testing.assert_array_equal(idx.hashes, idx2.hashes)
    np.testing.assert_array_equal(idx.nodes, idx2.nodes)
    np.testing.assert_array_equal(idx.offsets, idx2.offsets)


def test_distance_index_matches_oracle(pan, tmp_path):
    """Indexed min_distance == exact Dijkstra oracle on sampled pairs."""
    seqs, g = pan
    ref = sorted(g.walks)[0]
    di = DistanceIndex.build(g, ref)
    rng = np.random.default_rng(11)
    nodes = rng.integers(0, g.n_nodes, 40)
    pairs = list(zip(nodes[::2], nodes[1::2]))
    for u, v in pairs:
        src = (int(u), 1)
        dst = (int(v), 1)
        want = oriented_min_distance(g, src, dst)
        got = di.min_distance(src, dst)
        assert got == want, (src, dst, got, want)

    p = str(tmp_path / "g.dist")
    di.save(p)
    di2 = DistanceIndex.load(p, g)
    for u, v in pairs[:5]:
        assert (di2.min_distance((int(u), 1), (int(v), 1))
                == di.min_distance((int(u), 1), (int(v), 1)))
