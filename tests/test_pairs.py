"""Packed homology-pair key arrays (cactus_tpu/utils/pairs.py)."""

import numpy as np
import pytest

from cactus_tpu.utils import pairs as pk


def test_pack_unpack_roundtrip():
    pa = np.array([0, 5, 123456, 2**30])
    pb = np.array([7, 0, 654321, 2**30 + 1])
    s = np.array([1, -1, 1, -1])
    keys = pk.pack_pairs(pa, pb, s)
    assert pk.unpack_pairs(keys) == {
        (0, 7, 1), (5, 0, -1), (123456, 654321, 1),
        (2**30, 2**30 + 1, -1)}


def test_pack_overflow_raises():
    with pytest.raises(OverflowError):
        pk.pack_pairs(np.array([1 << 31]), np.array([0]), np.array([1]))


def test_strandless_merges_orientations():
    keys = pk.pack_pairs(np.array([3, 3]), np.array([9, 9]),
                         np.array([1, -1]))
    assert len(pk.unique_keys(keys)) == 2
    assert len(pk.strandless(pk.unique_keys(keys))) == 1


def test_join_expand_all_matches():
    ka = np.array([10, 20, 30, 20])
    kb = np.array([20, 99, 20, 10])
    ia, ib = pk.join_expand(ka, kb)
    got = sorted(zip(ia.tolist(), ib.tolist()))
    # 10 matches kb[3]; each 20 in ka matches kb[0] and kb[2]
    assert got == [(0, 3), (1, 0), (1, 2), (3, 0), (3, 2)]


def test_truth_pairs_arr_matches_bruteforce():
    """Vectorized join == the old dict/set algorithm, incl. duplications."""
    from cactus_tpu.testutil.evolver import SimGenome, SimResult
    from cactus_tpu.utils.trees import parse_newick

    rng = np.random.default_rng(0)
    def mk(name, n, dup):
        idx = rng.integers(-1, 50, size=n)
        if dup:  # repeat some root indices -> duplication fan-out
            idx[:10] = idx[10:20]
        return SimGenome(name, rng.integers(0, 4, n).astype(np.uint8),
                         idx.astype(np.int64),
                         rng.choice([-1, 1], n).astype(np.int8))

    sim = SimResult(tree=parse_newick("(a:1,b:1)r;"),
                    genomes={"a": mk("a", 80, True), "b": mk("b", 70, True)},
                    root_len=50)
    ga, gb = sim.genomes["a"], sim.genomes["b"]
    brute = set()
    for p, r in enumerate(ga.anc_idx):
        for q, r2 in enumerate(gb.anc_idx):
            if r >= 0 and r == r2:
                brute.add((p, q, int(ga.anc_strand[p]) * int(gb.anc_strand[q])))
    assert pk.unpack_pairs(sim.truth_pairs_arr("a", "b")) == brute
