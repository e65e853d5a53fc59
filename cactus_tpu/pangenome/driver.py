"""cactus-pangenome equivalent: star alignment → graph → normalize →
tiers → GFA/VCF.

Reference pipeline (refmap/cactus_pangenome.py:3-13): minigraph SV graph
→ graphmap → split → per-chromosome star cactus-align → graphmap-join
(GFAffix normalize, clip tiers, GFA/GBZ/VCF/indexes).  Native version:
chromosome splitting by reference-coverage binning (split.py), one star
alignment per chromosome (the cactus-align --pangenome mode), shared-
affix normalization (normalize.py), full + clip graph tiers, and the
nested-snarl VCF (vcf.py).
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
from .normalize import collapse_shared_affixes
from .split import AMBIGUOUS, split_by_chromosome


def run_pangenome(genomes: dict[str, dict[str, Sequence]],
                  ref_event: str, outdir: str,
                  config: Config | None = None,
                  min_chain_override: int | None = 64,
                  normalize: bool = True,
                  clip: int | None = 10_000,
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

    if normalize:
        rounds = collapse_shared_affixes(pg)
        pg.validate(seqs)
        log(f"normalize: shared-affix collapse converged in {rounds} "
            f"rounds ({pg.n_nodes} nodes)")

    ref_paths = [n for n in pg.walks if n.split(".", 1)[0] == ref_event]
    if not ref_paths:
        raise ValueError(f"reference event {ref_event} has no paths")

    gfa = os.path.join(outdir, "pangenome.gfa")
    graph_mod.write_gfa(gfa, pg, ref_name=ref_paths[0])
    vcf = os.path.join(outdir, "pangenome.vcf")
    vcf_mod.write_vcf(vcf, pg, ref_paths[0])

    stats = graph_mod.graph_stats(pg)
    if clip is not None:
        clipped, bed = graph_mod.clip_graph(pg, max_unaligned=clip)
        graph_mod.write_gfa(os.path.join(outdir, "pangenome.clip.gfa"),
                            clipped)
        with open(os.path.join(outdir, "clipped.bed"), "w") as fh:
            for name, ivs in bed.items():
                for a, b in ivs:
                    fh.write(f"{name}\t{a}\t{b}\n")
        stats["clip"] = graph_mod.graph_stats(clipped)
        stats["clipped_bp"] = int(sum(b - a for ivs in bed.values()
                                      for a, b in ivs))

    stats["reference"] = ref_paths[0]
    with open(os.path.join(outdir, "graph_stats.json"), "w") as fh:
        json.dump(stats, fh, indent=1)
    log(f"graph: {stats['n_nodes']} nodes, {stats['n_edges']} edges, "
        f"{stats['n_paths']} paths → {gfa}")
    return stats


def run_pangenome_split(genomes: dict[str, dict[str, Sequence]],
                        ref_event: str, outdir: str,
                        config: Config | None = None,
                        min_chain_override: int | None = 64,
                        log=lambda m: None) -> dict:
    """Multi-chromosome pangenome: split contigs by reference
    chromosome, build one graph per chromosome (the cactus-align
    --batch per-chromosome fan-out), and write per-chromosome artifact
    directories plus the contig assignment table."""
    os.makedirs(outdir, exist_ok=True)
    per_chrom, assignment = split_by_chromosome(genomes, ref_event,
                                                config=config, log=log)
    with open(os.path.join(outdir, "contig_assignment.tsv"), "w") as fh:
        for contig, chrom in sorted(assignment.items()):
            fh.write(f"{contig}\t{chrom}\n")
    all_stats: dict = {"chromosomes": {}, "ambiguous_contigs": sorted(
        c for c, ch in assignment.items() if ch == AMBIGUOUS)}
    for chrom, sub in sorted(per_chrom.items()):
        if chrom == AMBIGUOUS:
            continue
        if sum(len(g) for g in sub.values()) < 2:
            log(f"{chrom}: only the reference contig, skipping")
            continue
        cdir = os.path.join(outdir, chrom.replace("/", "_"))
        log(f"chromosome {chrom}: {sum(len(g) for g in sub.values())} "
            "contigs")
        all_stats["chromosomes"][chrom] = run_pangenome(
            sub, ref_event, cdir, config=config,
            min_chain_override=min_chain_override, log=log)
    with open(os.path.join(outdir, "pangenome_stats.json"), "w") as fh:
        json.dump(all_stats, fh, indent=1)
    return all_stats
