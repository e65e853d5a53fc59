"""On-disk alignment store: checkpoint/resume + artifact archive.

Plays the role of the Toil jobstore + HAL archive between pipeline stages
(reference: --restart resumes from the jobstore, cactus_progressive.py:
433-434; each pangenome stage exports artifacts between Toil workflows,
cactus_pangenome.py:10-12).  Layout under <dir>/:

    tree.nwk                  guide tree (internal nodes named)
    genomes/<event>.npz       sequence codes per genome (leaves + ancestors)
    steps/<event>.npz         block arrays + reference coords of one step
    steps/<event>.json        step metadata (events, seq names)

Every completed ancestor step is written immediately, so a re-run skips
finished ancestors (the --restart behavior).
"""

from __future__ import annotations

import json
import os

import numpy as np

from .io.fasta import Sequence
from .graph.columns import Blocks, SeqTable
from .phases.caf import CafResult
from .phases.reference import ReferenceResult
from .progressive import AncestorStep, ProgressiveResult, seq_maps_from_step
from .utils.trees import Tree, parse_newick


def _genome_to_npz(genome: dict[str, Sequence]) -> dict[str, np.ndarray]:
    out = {}
    for name, s in genome.items():
        out[f"codes::{name}"] = s.codes
        out[f"mask::{name}"] = s.mask
    return out


def _genome_from_npz(data) -> dict[str, Sequence]:
    genome = {}
    for key in data.files:
        kind, name = key.split("::", 1)
        if kind == "codes":
            genome[name] = Sequence(name=name, codes=data[key],
                                    mask=data.get(f"mask::{name}"))
    return genome


class AlignmentStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "genomes"), exist_ok=True)
        os.makedirs(os.path.join(root, "steps"), exist_ok=True)

    # ---- tree ----
    def save_tree(self, tree: Tree) -> None:
        with open(os.path.join(self.root, "tree.nwk"), "w") as fh:
            fh.write(tree.to_newick() + "\n")

    def load_tree(self) -> Tree:
        with open(os.path.join(self.root, "tree.nwk")) as fh:
            return parse_newick(fh.read().strip())

    # ---- genomes ----
    def save_genome(self, event: str, genome: dict[str, Sequence]) -> None:
        np.savez_compressed(os.path.join(self.root, "genomes", f"{event}.npz"),
                            **_genome_to_npz(genome))

    def has_genome(self, event: str) -> bool:
        return os.path.exists(os.path.join(self.root, "genomes",
                                           f"{event}.npz"))

    def load_genome(self, event: str) -> dict[str, Sequence]:
        with np.load(os.path.join(self.root, "genomes",
                                  f"{event}.npz")) as data:
            return _genome_from_npz(data)

    # ---- steps ----
    def save_step(self, step: AncestorStep) -> None:
        caf, ref = step.caf, step.ref
        blocks = caf.blocks
        coord_items = sorted(ref.block_coord.items())
        meta = dict(event=step.event,
                    seq_names=caf.table.names,
                    anc_seq_names=step.anc_seq_names,
                    ingroups=sorted(step.ingroup_events),
                    outgroups=sorted(step.outgroup_events),
                    coord_names=[v[0] for _b, v in coord_items],
                    threads=[[(int(b), int(o)) for b, o in t]
                             for t in ref.threads])
        np.savez_compressed(
            os.path.join(self.root, "steps", f"{step.event}.npz"),
            seq_lengths=caf.table.lengths,
            seg_block=blocks.seg_block, seg_seq=blocks.seg_seq,
            seg_start=blocks.seg_start, seg_len=blocks.seg_len,
            seg_strand=blocks.seg_strand,
            alive=caf.alive,
            coord_block=np.array([b for b, _v in coord_items], np.int64),
            coord_start=np.array([v[1] for _b, v in coord_items], np.int64),
            coord_orient=np.array([v[2] for _b, v in coord_items], np.int8))
        with open(os.path.join(self.root, "steps",
                               f"{step.event}.json"), "w") as fh:
            json.dump(meta, fh)

    def has_step(self, event: str) -> bool:
        return os.path.exists(os.path.join(self.root, "steps",
                                           f"{event}.npz"))

    def load_step(self, event: str) -> AncestorStep:
        with open(os.path.join(self.root, "steps", f"{event}.json")) as fh:
            meta = json.load(fh)
        data = np.load(os.path.join(self.root, "steps", f"{event}.npz"))
        names = meta["seq_names"]
        table = SeqTable.build(dict(zip(names, data["seq_lengths"].tolist())))
        blocks = Blocks(table=table,
                        seg_block=data["seg_block"], seg_seq=data["seg_seq"],
                        seg_start=data["seg_start"], seg_len=data["seg_len"],
                        seg_strand=data["seg_strand"],
                        n_blocks=len(data["alive"]))
        caf = CafResult(table=table, blocks=blocks, alive=data["alive"],
                        events_of_seq=[n.split(".", 1)[0] for n in names],
                        outgroup_events=frozenset(meta["outgroups"]))
        anc_genome = self.load_genome(event)
        block_coord = {int(b): (n, int(s), int(o)) for b, n, s, o in zip(
            data["coord_block"], meta["coord_names"], data["coord_start"],
            data["coord_orient"])}
        lens = blocks.block_length()
        block_codes = {}
        for b, (n, s, o) in block_coord.items():
            L = int(lens[b])
            codes = anc_genome[n].codes[s:s + L]
            if o == -1:
                from .io.fasta import complement
                codes = complement(codes)[::-1]
            block_codes[b] = codes
        ref = ReferenceResult(
            event=event,
            threads=[[(b, o) for b, o in t] for t in meta["threads"]],
            block_codes=block_codes, block_coord=block_coord,
            sequences=anc_genome)
        step = AncestorStep(event=event, caf=caf, ref=ref,
                            anc_seq_names=meta["anc_seq_names"],
                            maps=seq_maps_from_step(caf, ref),
                            ingroup_events=set(meta["ingroups"]),
                            outgroup_events=set(meta["outgroups"]))
        return step

    # ---- whole result ----
    def save_result(self, result: ProgressiveResult) -> None:
        self.save_tree(result.tree)
        for ev, genome in result.genomes.items():
            self.save_genome(ev, genome)
        for step in result.steps.values():
            self.save_step(step)

    def load_result(self) -> ProgressiveResult:
        tree = self.load_tree()
        genomes = {}
        steps = {}
        for node in tree.preorder():
            if self.has_genome(node.name):
                genomes[node.name] = self.load_genome(node.name)
            if self.has_step(node.name):
                steps[node.name] = self.load_step(node.name)
        return ProgressiveResult(tree=tree, steps=steps, genomes=genomes)
