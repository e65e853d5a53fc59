"""Reference-format config XML loader.

Parses the cactus_progressive_config.xml schema (reference:
src/cactus/cactus_progressive_config.xml, consumed by shared/
configWrapper.py in Python and api/impl/cactus_params_parser.c in C)
into this package's typed Config tree, so an existing cactus deployment
can bring its tuned config file unchanged.  Unknown attributes are
ignored; missing ones keep our defaults.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from .config import Config


def _set(obj, field: str, value: str, cast):
    try:
        setattr(obj, field, cast(value))
    except (TypeError, ValueError):
        pass


def _ints(s: str) -> tuple[int, ...]:
    return tuple(int(x) for x in s.split())


_BOOL = lambda s: s not in ("0", "false", "False", "")

# (xml attribute, config field, cast) per section
_BLAST = [
    ("chunkSize", "chunk_size", int),
    ("bigChunkSize", "big_chunk_size", int),
    ("overlapSize", "overlap_size", int),
    ("minimumSequenceLengthForBlast", "minimum_sequence_length", int),
    ("chainGapOpen", "chain_gap_open", int),
    ("chainGapExtend", "chain_gap_extend", int),
    ("chainMaxGapLength", "chain_max_gap_length", int),
    ("chainTrimFraction", "chain_trim_fraction", float),
    ("pafTrimIdentity", "paf_trim_identity", float),
    ("minPrimaryChainScore", "min_primary_chain_score", int),
    ("trimIngroups", "trim_ingroups", _BOOL),
    ("trimOutgroups", "trim_outgroups", _BOOL),
    ("trimMinSize", "trim_min_size", int),
    ("trimFlanking", "trim_flanking", int),
    ("trimOutgroupFlanking", "trim_outgroup_flanking", int),
    ("outputSecondaryAlignments", "output_secondary_alignments", _BOOL),
]

_CAF = [
    ("deannealingRounds", "deannealing_rounds", _ints),
    ("trim", "trim", int),
    ("blockTrim", "block_trim", int),
    ("minimumBlockDegree", "minimum_block_degree", int),
    ("minimumNumberOfSpecies", "minimum_number_of_species", int),
    ("minimumIngroupDegree", "minimum_ingroup_degree", int),
    ("minimumOutgroupDegree", "minimum_outgroup_degree", int),
    ("minimumTreeCoverage", "minimum_tree_coverage", float),
    ("alignmentFilter", "alignment_filter", str),
    ("maxAdjacencyComponentSizeRatio",
     "max_adjacency_component_size_ratio", float),
    ("minLengthForChromosome", "min_length_for_chromosome", int),
    ("proportionOfUnalignedBasesForNewChromosome",
     "proportion_unaligned_bases_for_new_chromosome", float),
    ("maximumMedianSequenceLengthBetweenLinkedEnds",
     "max_median_sequence_length_between_linked_ends", int),
    ("removeRecoverableChains", "remove_recoverable_chains", str),
    ("maxRecoverableChainsIterations",
     "max_recoverable_chains_iterations", int),
    ("maxRecoverableChainLength", "max_recoverable_chain_length", int),
    ("minimumBlockHomologySupport", "minimum_block_homology_support",
     float),
]

_BAR = [
    ("runBar", "run_bar", _BOOL),
    ("bandingLimit", "banding_limit", lambda s: int(float(s))),
    ("partialOrderAlignment", "partial_order_alignment", _BOOL),
    ("minimumBlockDegree", "minimum_block_degree", int),
    ("minimumIngroupDegree", "minimum_ingroup_degree", int),
    ("minimumOutgroupDegree", "minimum_outgroup_degree", int),
    ("minimumNumberOfSpecies", "minimum_number_of_species", int),
]

_POA = [
    ("partialOrderAlignmentWindow", "window", int),
    ("partialOrderAlignmentBandConstant", "band_constant", int),
    ("partialOrderAlignmentBandFraction", "band_fraction", float),
    ("partialOrderAlignmentSubMatrix", "sub_matrix",
     lambda s: tuple(int(x) for x in s.split())),
    ("partialOrderAlignmentGapOpenPenalty1", "gap_open1", int),
    ("partialOrderAlignmentGapExtensionPenalty1", "gap_extend1", int),
    ("partialOrderAlignmentGapOpenPenalty2", "gap_open2", int),
    ("partialOrderAlignmentGapExtensionPenalty2", "gap_extend2", int),
]

_PECAN = [
    ("numberOfSpanningTrees", "spanning_trees", int),
    ("gapGamma", "gap_gamma", float),
    ("matchGamma", "match_gamma", float),
    ("splitMatrixBiggerThanThis", "split_matrix_bigger_than_this", int),
    ("diagonalExpansion", "diagonal_expansion", int),
    ("constraintDiagonalTrim", "constraint_diagonal_trim", int),
    ("useMumAnchors", "use_mum_anchors", _BOOL),
    ("recursiveMums", "recursive_mums", _BOOL),
]

_REFERENCE = [
    ("matchingAlgorithm", "matching_algorithm", str),
    ("reference", "reference_event", str),
    ("useSimulatedAnnealing", "use_simulated_annealing", _BOOL),
    ("theta", "theta", float),
    ("phi", "phi", float),
    ("maxWalkForCalculatingZ", "max_walk_for_calculating_z", int),
    ("permutations", "permutations", int),
    ("wiggle", "wiggle", float),
    ("numberOfNs", "number_of_ns", int),
    ("minNumberOfSequencesToSupportAdjacency",
     "min_sequences_to_support_adjacency", int),
    ("makeScaffolds", "make_scaffolds", _BOOL),
]

_OUTGROUP = [
    ("max_num_outgroups", "max_num_outgroups", int),
    ("strategy", "strategy", str),
    ("clade_discount", "clade_discount", float),
    ("overlap_penalty", "overlap_penalty", float),
]


def _apply(elem, obj, mapping):
    if elem is None:
        return
    for attr, field, cast in mapping:
        if attr in elem.attrib:
            _set(obj, field, elem.attrib[attr], cast)


def load_config_xml(path_or_file, base: Config | None = None) -> Config:
    """Parse a cactus-format config XML into a Config."""
    cfg = base or Config.default()
    tree = ET.parse(path_or_file)
    root = tree.getroot()

    _apply(root.find(".//blast"), cfg.blast, _BLAST)
    caf_elem = root.find(".//caf")
    _apply(caf_elem, cfg.caf, _CAF)
    if caf_elem is not None:
        ann = caf_elem.find("annealingRounds")
        if ann is not None:
            rounds = {}
            for key in ("one", "two", "three", "four", "five", "default"):
                if key in ann.attrib:
                    rounds[key] = _ints(ann.attrib[key])
            if rounds:
                cfg.caf.annealing_rounds.update(rounds)
    bar_elem = root.find(".//bar")
    _apply(bar_elem, cfg.bar, _BAR)
    if bar_elem is not None:
        _apply(bar_elem.find("pecan"), cfg.bar.pecan, _PECAN)
        _apply(bar_elem.find("poa"), cfg.bar.poa, _POA)
    _apply(root.find(".//reference"), cfg.reference, _REFERENCE)
    _apply(root.find(".//multi_cactus/outgroup"), cfg.outgroup, _OUTGROUP)
    return cfg
