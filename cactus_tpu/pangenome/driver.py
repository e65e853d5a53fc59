"""cactus-pangenome equivalent: star alignment → graph → GFA/VCF.

Reference pipeline (refmap/cactus_pangenome.py:3-13): minigraph SV graph
→ graphmap → split → per-chromosome star cactus-align → graphmap-join
(normalize, GFA/GBZ/VCF/indexes).  Round-1 native version: one star
alignment of all haplotypes (the cactus-align --pangenome mode), then
the allele graph + artifacts; chromosome splitting and multi-batch
scaling ride the same sharded blast path in later rounds.
"""

from __future__ import annotations

import json
import os

from ..config import Config
from ..io.fasta import Sequence
from ..progressive import ProgressiveAligner
from ..utils.trees import Tree
from . import graph as graph_mod
from . import vcf as vcf_mod


def run_pangenome(genomes: dict[str, dict[str, Sequence]],
                  ref_event: str, outdir: str,
                  config: Config | None = None,
                  min_chain_override: int | None = 64,
                  log=lambda m: None) -> dict:
    """Align all haplotypes star-wise against each other and emit the
    graph artifacts.  Returns the stats dict."""
    os.makedirs(outdir, exist_ok=True)
    root = Tree("_pan_root_")
    for ev in genomes:
        root.add_child(Tree(ev, 0.05))
    aligner = ProgressiveAligner(root, genomes, config=config,
                                 min_chain_override=min_chain_override,
                                 log=log)
    result = aligner.run()
    step = result.steps["_pan_root_"]

    seqs: dict[str, Sequence] = {}
    for ev in genomes:
        seqs.update(genomes[ev])
    pg = graph_mod.build_graph(step.caf, seqs)
    pg.validate(seqs)

    ref_paths = [n for n in pg.walks if n.split(".", 1)[0] == ref_event]
    if not ref_paths:
        raise ValueError(f"reference event {ref_event} has no paths")

    gfa = os.path.join(outdir, "pangenome.gfa")
    graph_mod.write_gfa(gfa, pg, ref_name=ref_paths[0])
    vcf = os.path.join(outdir, "pangenome.vcf")
    vcf_mod.write_vcf(vcf, pg, ref_paths[0])

    stats = graph_mod.graph_stats(pg)
    stats["reference"] = ref_paths[0]
    with open(os.path.join(outdir, "graph_stats.json"), "w") as fh:
        json.dump(stats, fh, indent=1)
    log(f"graph: {stats['n_nodes']} nodes, {stats['n_edges']} edges, "
        f"{stats['n_paths']} paths → {gfa}")
    return stats
