"""VCF export from the pangenome graph (vg deconstruct analog).

Reference flow: graphmap-join deconstructs the graph against the
reference path into VCF (+vcfbub/vcfwave cleanup; cactus_graphmap_join.py
:652+, config XML :493).  Round-1 scope here: simple bubbles —
 - block-allele sites (SNP/MNV): a block with >=2 allele nodes on the
   reference path;
 - insertions: a haplotype-private node between two blocks that are
   adjacent on the reference path;
 - deletions: a haplotype adjacency that skips reference-path nodes.
Nested/overlapping snarls are a later-round item (full snarl tree).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..io.fasta import revcomp, _BASE_OF
from .graph import PanGraph


def _s(codes: np.ndarray) -> str:
    return _BASE_OF[codes].tobytes().decode("ascii")


@dataclass
class VcfRecord:
    chrom: str
    pos: int          # 1-based
    ref: str
    alts: list[str]
    genotypes: dict[str, int]   # path name → allele index (0 = ref)

    def to_line(self, sample_order: list[str]) -> str:
        gts = []
        for s in sample_order:
            g = self.genotypes.get(s)
            gts.append("." if g is None else str(g))
        return "\t".join([
            self.chrom, str(self.pos), ".", self.ref,
            ",".join(self.alts), "60", "PASS", ".", "GT", *gts])


def merge_micro_anchors(records: list[VcfRecord], ref_seq: str,
                        min_anchor: int = 8) -> list[VcfRecord]:
    """Fuse same-sample records separated by < min_anchor ref bases.

    A chance k-mer match inside a long indel splits one event into
    fragments anchored on a tiny block; the reference pipeline repairs
    these by realignment in vcfwave (cactus_graphmap_join.py:652+,
    config XML :493).  Here adjacent single-alt records with identical
    genotype calls are spliced across the short intervening reference
    run: REF1+spacer+REF2 / ALT1+spacer+ALT2.
    """
    out: list[VcfRecord] = []
    for rec in sorted(records, key=lambda r: r.pos):
        if (out and len(rec.alts) == 1 and len(out[-1].alts) == 1
                and rec.genotypes == out[-1].genotypes):
            prev = out[-1]
            gap0 = prev.pos + len(prev.ref) - 1   # 0-based spacer start
            gap1 = rec.pos - 1                    # 0-based spacer end
            if 0 <= gap1 - gap0 < min_anchor:
                spacer = ref_seq[gap0:gap1]
                out[-1] = VcfRecord(
                    chrom=prev.chrom, pos=prev.pos,
                    ref=prev.ref + spacer + rec.ref,
                    alts=[prev.alts[0] + spacer + rec.alts[0]],
                    genotypes=prev.genotypes)
                continue
        out.append(rec)
    return out


def vcf_records(graph: PanGraph, ref_name: str,
                min_anchor: int = 8) -> list[VcfRecord]:
    ref_walk = graph.walks[ref_name]
    # reference coordinates per step
    ref_pos = []
    pos = 0
    for v, o in ref_walk:
        ref_pos.append(pos)
        pos += graph.node_len(v)
    ref_step_of_node = {v: k for k, (v, _o) in enumerate(ref_walk)}
    ref_block_step = {}
    for k, (v, _o) in enumerate(ref_walk):
        b = graph.node_block[v]
        if b >= 0:
            ref_block_step[b] = k

    # allele nodes per block
    alleles: dict[int, list[int]] = {}
    for v in range(graph.n_nodes):
        b = graph.node_block[v]
        if b >= 0:
            alleles.setdefault(b, []).append(v)

    other = [n for n in graph.walks if n != ref_name]
    records: list[VcfRecord] = []

    # ---- SNP / MNV sites ----
    for b, nodes in alleles.items():
        if len(nodes) < 2 or b not in ref_block_step:
            continue
        k = ref_block_step[b]
        v_ref, o_ref = ref_walk[k]

        def render(v):
            c = graph.node_seq[v]
            return _s(c if o_ref == 1 else revcomp(c))

        alts = [v for v in nodes if v != v_ref]
        allele_idx = {v_ref: 0}
        for j, v in enumerate(alts):
            allele_idx[v] = j + 1
        gts = {}
        for name in other:
            gt = None
            for v, _o in graph.walks[name]:
                if graph.node_block[v] == b:
                    gt = allele_idx[v]
                    break
            gts[name] = gt
        records.append(VcfRecord(
            chrom=ref_name, pos=ref_pos[k] + 1, ref=render(v_ref),
            alts=[render(v) for v in alts], genotypes=gts))

    # ---- simple insertions / deletions ----
    for name in other:
        walk = graph.walks[name]
        for idx in range(len(walk)):
            v, o = walk[idx]
            if graph.node_block[v] >= 0:
                continue
            # haplotype-private node: check flanks map to ref-adjacent steps
            if idx == 0 or idx == len(walk) - 1:
                continue
            u = walk[idx - 1][0]
            w = walk[idx + 1][0]
            ku = ref_step_of_node.get(u)
            kw = ref_step_of_node.get(w)
            if ku is None or kw is None:
                continue
            lo, hi = min(ku, kw), max(ku, kw)
            if hi - lo != 1:
                continue
            # anchor: last ref base before the insertion point
            anchor_pos = ref_pos[hi]  # 0-based start of the later ref node
            if anchor_pos == 0:
                continue
            anchor_step = hi - 1
            av, ao = ref_walk[anchor_step]
            anchor = _s(graph.node_seq[av][-1:] if ao == 1
                        else revcomp(graph.node_seq[av])[-1:])
            ins = _s(graph.node_seq[v] if o == 1
                     else revcomp(graph.node_seq[v]))
            records.append(VcfRecord(
                chrom=ref_name, pos=anchor_pos, ref=anchor,
                alts=[anchor + ins], genotypes={name: 1}))
        # deletions: consecutive walk steps whose ref steps skip nodes
        for (u, _ou), (w, _ow) in zip(walk, walk[1:]):
            ku = ref_step_of_node.get(u)
            kw = ref_step_of_node.get(w)
            if ku is None or kw is None:
                continue
            lo, hi = min(ku, kw), max(ku, kw)
            if hi - lo <= 1:
                continue
            start = ref_pos[lo + 1]
            end = ref_pos[hi]
            if start == 0:
                continue
            av, ao = ref_walk[lo]
            anchor = _s(graph.node_seq[av][-1:] if ao == 1
                        else revcomp(graph.node_seq[av])[-1:])
            deleted = "".join(
                _s(graph.node_seq[ref_walk[k][0]] if ref_walk[k][1] == 1
                   else revcomp(graph.node_seq[ref_walk[k][0]]))
                for k in range(lo + 1, hi))
            records.append(VcfRecord(
                chrom=ref_name, pos=start, ref=anchor + deleted,
                alts=[anchor], genotypes={name: 1}))
    records.sort(key=lambda r: r.pos)
    ref_seq = "".join(
        _s(graph.node_seq[v] if o == 1 else revcomp(graph.node_seq[v]))
        for v, o in ref_walk)
    return merge_micro_anchors(records, ref_seq, min_anchor=min_anchor)


def write_vcf(path_or_file, graph: PanGraph, ref_name: str) -> None:
    own = not hasattr(path_or_file, "write")
    fh = open(path_or_file, "w") if own else path_or_file
    try:
        samples = [n for n in graph.walks if n != ref_name]
        ref_len = sum(graph.node_len(v) for v, _o in graph.walks[ref_name])
        fh.write("##fileformat=VCFv4.2\n")
        fh.write(f"##contig=<ID={ref_name},length={ref_len}>\n")
        fh.write('##FORMAT=<ID=GT,Number=1,Type=String,'
                 'Description="Genotype">\n')
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                 + "\t".join(samples) + "\n")
        for rec in vcf_records(graph, ref_name):
            fh.write(rec.to_line(samples) + "\n")
    finally:
        if own:
            fh.close()
