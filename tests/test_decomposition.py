"""Progressive decomposition: spanning subtree, scaling, sanity checks."""

import pytest

from cactus_tpu.utils.decomposition import (check_branch_lengths,
                                            check_degree2_ancestors,
                                            check_multifurcations,
                                            get_ancestor_scaled_tree,
                                            get_node_heights,
                                            get_spanning_subtree)
from cactus_tpu.utils.trees import parse_newick


TREE = "((a:0.1,b:0.2)ab:0.1,((c:0.1,d:0.1)cd:0.3,e:0.5)cde:0.1)root;"


def test_spanning_subtree_children_plus_outgroup():
    t = parse_newick(TREE)
    sp = get_spanning_subtree(t, "cd", ["a"])
    names = {n.name for n in sp.preorder()}
    assert {"c", "d", "a"} <= names
    assert "b" not in names and "e" not in names
    # path compression: 'cde' (single-child after pruning e) contracted
    assert "cde" not in names or any(
        len(n.children) > 1 for n in sp.preorder() if n.name == "cde")
    # distances preserved through contraction: a..c path length
    assert abs(sp.distance("a", "c") - t.distance("a", "c")) < 1e-9


def test_spanning_subtree_no_outgroups():
    t = parse_newick(TREE)
    sp = get_spanning_subtree(t, "ab", [])
    names = {n.name for n in sp.preorder()}
    assert names == {"ab", "a", "b"}


def test_node_heights_and_scaling():
    t = parse_newick(TREE)
    h = get_node_heights(t)
    assert h["a"] == 0.0
    assert abs(h["ab"] - 0.2) < 1e-9
    assert abs(h["root"] - 0.6) < 1e-9
    scaled = get_ancestor_scaled_tree(t, max_div=2.0, branch_scale=2.0)
    assert abs(scaled.find("a").length - 0.2) < 1e-9
    up = get_ancestor_scaled_tree(t, max_div=2.0,
                                  upweight_ancestors=True)
    # internal 'cd' branch gains its height (0.1)
    assert abs(up.find("cd").length - 0.4) < 1e-9
    # leaves unchanged
    assert abs(up.find("c").length - 0.1) < 1e-9


def test_check_branch_lengths():
    ok = parse_newick(TREE)
    check_branch_lengths(ok)                      # no raise
    warns = []
    warn_tree = parse_newick("(a:3.0,b:0.1)r;")
    check_branch_lengths(warn_tree, log=warns.append)
    assert warns
    bad = parse_newick("(a:30.0,b:0.1)r;")
    with pytest.raises(ValueError):
        check_branch_lengths(bad)


def test_check_degree2_and_multifurcation():
    with pytest.raises(ValueError):
        check_degree2_ancestors(parse_newick("((a:1)x:1,b:1)r;"))
    warns = []
    n = check_multifurcations(parse_newick("(a:1,b:1,c:1)r;"),
                              log=warns.append)
    assert n == 1 and warns
    with pytest.raises(ValueError):
        check_multifurcations(parse_newick("(a:1,b:1,c:1)r;"),
                              allow=False)


def test_driver_rejects_bad_tree():
    import numpy as np
    from cactus_tpu.io.fasta import Sequence
    from cactus_tpu import progressive
    tree = parse_newick("(a:30.0,b:0.1)r;")
    g = {ev: {f"{ev}.c": Sequence(f"{ev}.c",
                                  np.zeros(100, np.uint8))}
         for ev in ["a", "b"]}
    with pytest.raises(ValueError):
        progressive.ProgressiveAligner(tree, g)
