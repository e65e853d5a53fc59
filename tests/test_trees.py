import pytest

from cactus_tpu.utils.trees import Tree, parse_newick, get_subtree
from cactus_tpu.config import Config, divergence_preset


MAMMALS = ("((simHuman_chr6:0.144018,(simMouse_chr6:0.084509,"
           "simRat_chr6:0.091589)mr:0.271974):0.020593,"
           "(simCow_chr6:0.18908,simDog_chr6:0.16303):0.032898);")


def test_parse_newick_mammals():
    t = parse_newick(MAMMALS)
    assert sorted(t.leaf_names()) == sorted([
        "simHuman_chr6", "simMouse_chr6", "simRat_chr6",
        "simCow_chr6", "simDog_chr6"])
    mr = t.find("mr")
    assert mr is not None and abs(mr.length - 0.271974) < 1e-9
    assert abs(t.depth_of("simMouse_chr6") - (0.020593 + 0.271974 + 0.084509)) < 1e-9


def test_newick_roundtrip():
    t = parse_newick(MAMMALS)
    t2 = parse_newick(t.to_newick())
    assert sorted(t2.leaf_names()) == sorted(t.leaf_names())
    assert abs(t2.find("mr").length - 0.271974) < 1e-9


def test_distance():
    t = parse_newick("((a:1,b:2)ab:3,c:4);")
    assert abs(t.distance("a", "b") - 3.0) < 1e-9
    assert abs(t.distance("a", "c") - 8.0) < 1e-9
    assert abs(t.distance("ab", "c") - 7.0) < 1e-9


def test_name_internal_nodes():
    t = parse_newick("((a:1,b:2):3,c:4);")
    t.name_internal_nodes()
    names = [n.name for n in t.internal_nodes()]
    assert names[0].startswith("Anc") and names[1].startswith("Anc")
    assert len(set(names)) == 2


def test_get_subtree():
    t = parse_newick("(((a:1,b:1)ab:1,c:1)abc:1,d:1)root;")
    sub = get_subtree(t, "abc", leaf_stop={"ab"})
    assert sub.name == "abc"
    assert sorted(sub.leaf_names()) == ["ab", "c"]


def test_quoted_labels():
    t = parse_newick("('a b':1,c:2);")
    assert t.children[0].name == "a b"


def test_divergence_preset():
    assert divergence_preset(0.01) == "one"
    assert divergence_preset(0.07) == "two"
    assert divergence_preset(0.12) == "three"
    assert divergence_preset(0.3) == "default"


def test_config_defaults():
    cfg = Config.default()
    assert cfg.blast.chunk_size == 4_000_000   # TPU-first default
    assert cfg.blast.chain_gap_open == 5000
    assert cfg.caf.annealing_for("one") == (2048,)
    assert cfg.caf.deannealing_rounds == (2, 32, 256)
    assert cfg.bar.banding_limit == 1_000_000
    assert cfg.bar.poa.window == 10_000
    assert len(cfg.bar.poa.sub_matrix) == 25
    assert cfg.reference.theta == 1e-6
