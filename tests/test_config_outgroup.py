"""Config XML ingestion + greedy outgroup selection."""

import numpy as np
import pytest

from cactus_tpu.config import Config
from cactus_tpu.config_xml import load_config_xml
from cactus_tpu.utils.outgroups import greedy_outgroups
from cactus_tpu.utils.trees import parse_newick

REFERENCE_XML = "/root/reference/src/cactus/cactus_progressive_config.xml"


def test_load_reference_config_xml():
    """The actual cactus config file parses into matching values."""
    cfg = load_config_xml(REFERENCE_XML)
    assert cfg.blast.chunk_size == 30_000_000
    assert cfg.blast.overlap_size == 10_000
    assert cfg.blast.chain_gap_open == 5000
    assert cfg.blast.min_primary_chain_score == 10_000
    assert cfg.caf.deannealing_rounds == (2, 32, 256)
    assert cfg.caf.annealing_rounds["one"] == (2048,)
    assert cfg.caf.annealing_rounds["default"] == (256,)
    assert cfg.caf.alignment_filter == "filterSecondariesByMultipleSequences"
    assert cfg.bar.banding_limit == 1_000_000
    assert cfg.bar.partial_order_alignment is True
    assert cfg.bar.poa.window == 10_000
    assert cfg.bar.poa.sub_matrix[0] == 91
    assert cfg.bar.poa.gap_open1 == 400
    assert cfg.bar.pecan.diagonal_expansion == 20
    assert cfg.reference.matching_algorithm == "blossom5"
    assert cfg.reference.number_of_ns == 10
    assert cfg.outgroup.max_num_outgroups == 3
    assert cfg.outgroup.clade_discount == pytest.approx(0.3)
    assert cfg.outgroup.overlap_penalty == pytest.approx(2.0)


def test_xml_override_on_custom_file(tmp_path):
    p = tmp_path / "c.xml"
    p.write_text("""<cactusWorkflowConfig>
      <caf minimumBlockDegree="3" deannealingRounds="4 64"/>
      <bar runBar="0"/>
    </cactusWorkflowConfig>""")
    cfg = load_config_xml(str(p))
    assert cfg.caf.minimum_block_degree == 3
    assert cfg.caf.deannealing_rounds == (4, 64)
    assert cfg.bar.run_bar is False
    # untouched values keep defaults
    assert cfg.blast.chunk_size == 4_000_000   # TPU-first default


def test_greedy_outgroups_diversity():
    """Overlap penalty spreads picks across clades."""
    nwk = ("((a:0.1,b:0.1)ab:0.1,((c:0.1,d:0.1)cd:0.05,"
           "(e:0.1,f:0.1)ef:0.05)cdef:0.1)root;")
    tree = parse_newick(nwk)
    ab = tree.find("ab")
    ogs = greedy_outgroups(tree, ab, 2, clade_discount=0.0)
    # after picking one of cd, the penalty pushes the second pick to ef
    # (or vice versa) rather than the sibling in the same clade
    assert len(ogs) == 2
    clades = {o: ("cd" if o in "cd" else "ef") for o in ogs}
    assert len(set(clades.values())) == 2, ogs


def test_clade_discount_prefers_in_clade():
    """A slightly farther in-clade candidate beats an out-of-clade one
    under the discount."""
    nwk = ("(((a:0.1,b:0.1)ab:0.1,c:0.25)abc:0.02,z:0.15)root;")
    tree = parse_newick(nwk)
    ab = tree.find("ab")
    # pure distance: z (0.1+0.02+0.15=0.27) < c (0.1+0.25=0.35) → z wins
    assert greedy_outgroups(tree, ab, 1, clade_discount=0.0) == ["z"]
    # with discount, tier-1 c beats tier-2 z
    assert greedy_outgroups(tree, ab, 1, clade_discount=0.3) == ["c"]


def test_root_has_no_outgroups():
    tree = parse_newick("(a:0.1,b:0.1)root;")
    assert greedy_outgroups(tree, tree, 3) == []


def test_chrom_constrained_outgroups(tmp_path):
    from cactus_tpu.utils.outgroups import (chrom_constrained_outgroups,
                                            load_chrom_info)
    from cactus_tpu.utils.trees import parse_newick
    ci = tmp_path / "chrom.info"
    ci.write_text("a X,Y\nb X\nc X\nd X,Y\ne\n")
    cm = load_chrom_info(str(ci))
    assert cm["a"] == {"X", "Y"} and cm["e"] == set()
    tree = parse_newick(
        "((a:0.1,b:0.1)ab:0.1,(c:0.05,(d:0.4,e:0.05)de:0.05)cde:0.1)r;")
    ab = tree.find("ab")
    # plain greedy picks nearest (c or e); ab needs X+Y coverage —
    # d (X,Y) must be added even though it is distant
    ogs = chrom_constrained_outgroups(tree, ab, 1, cm)
    have = set()
    for og in ogs:
        have |= cm.get(og, set())
    assert {"X", "Y"} <= have, ogs
    # no constraint → unchanged behavior
    assert chrom_constrained_outgroups(tree, ab, 1, {}) == \
        chrom_constrained_outgroups(tree, ab, 1, {"a": set()})


def test_chrom_info_rejects_bad_lines(tmp_path):
    from cactus_tpu.utils.outgroups import load_chrom_info
    bad = tmp_path / "bad.info"
    bad.write_text("a X Y Z\n")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        load_chrom_info(str(bad))
    dup = tmp_path / "dup.info"
    dup.write_text("a X\na Y\n")
    with _pytest.raises(ValueError):
        load_chrom_info(str(dup))
