"""Synthetic genome evolution with known homology truth.

Plays the role of the evolver-simulated test genomes in the reference test
suite (reference: test/evolverTest.py fixtures from cactusTestData — not
fetchable here), providing an exact truth alignment oracle: every leaf base
carries the index of the root base it descends from (or -1 for inserted
bases), so true homology pairs between any two leaves are known exactly.

Model: Jukes-Cantor substitutions at the branch length rate, geometric
indels, optional inversions.  This gives evolver-like inputs at arbitrary
scale for accuracy gates (see testutil/comparator.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..io.fasta import Sequence, revcomp
from ..utils.trees import Tree


@dataclass
class SimGenome:
    name: str
    codes: np.ndarray           # uint8 base codes
    anc_idx: np.ndarray         # int64: index into ROOT sequence, -1 = inserted
    anc_strand: np.ndarray      # int8: +1/-1 orientation vs root

    def to_sequence(self, seqname: str | None = None) -> Sequence:
        return Sequence(name=seqname or self.name, codes=self.codes)


@dataclass
class SimResult:
    tree: Tree
    genomes: dict[str, SimGenome]
    root_len: int

    def truth_pairs_arr(self, a: str, b: str) -> np.ndarray:
        """All truly-homologous base pairs as a sorted-unique packed key
        array (utils/pairs.py).  Join on shared root-base index; root
        positions repeat under duplications, handled by the all-matches
        join."""
        from ..utils import pairs as pk
        ga, gb = self.genomes[a], self.genomes[b]
        sel_a = np.flatnonzero(ga.anc_idx >= 0)
        sel_b = np.flatnonzero(gb.anc_idx >= 0)
        ia, ib = pk.join_expand(ga.anc_idx[sel_a], gb.anc_idx[sel_b])
        rel = (ga.anc_strand[sel_a][ia].astype(np.int16)
               * gb.anc_strand[sel_b][ib])
        return pk.unique_keys(pk.pack_pairs(sel_a[ia], sel_b[ib], rel))

    def truth_pairs(self, a: str, b: str) -> set[tuple[int, int, int]]:
        """Legacy tuple-set view of truth_pairs_arr."""
        from ..utils import pairs as pk
        return pk.unpack_pairs(self.truth_pairs_arr(a, b))


def _evolve_branch(codes, anc_idx, anc_strand, dist, rng,
                   indel_rate=0.02, indel_mean=3.0,
                   inversion_rate=0.0, inversion_mean=500.0,
                   duplication_rate=0.0, duplication_mean=300.0):
    """Evolve one branch of length `dist` (expected substitutions/site)."""
    n = len(codes)
    codes = codes.copy()
    # Jukes-Cantor substitutions: P(observe change) = 3/4 (1 - exp(-4/3 d))
    p_sub = 0.75 * (1.0 - np.exp(-4.0 / 3.0 * dist))
    sub_mask = rng.random(n) < p_sub
    shifts = rng.integers(1, 4, size=n, dtype=np.uint8)
    codes = np.where(sub_mask & (codes < 4), (codes + shifts) % 4, codes)

    # indels: expected indel events per site = indel_rate * dist.
    # All events are sampled against the post-substitution coordinates
    # and applied in ONE assembly pass (deletion union mask + a single
    # multi-position np.insert) — the per-event np.delete/np.insert
    # loop copied the whole genome per event, which at 20 Mb+ scale
    # meant terabytes of memcpy and made the 100 Mb gate unreachable.
    n_events = int(rng.poisson(indel_rate * dist * n))
    m = len(codes)
    if n_events and m >= 10:
        pos = rng.integers(0, m, size=n_events)
        length = 1 + rng.geometric(1.0 / indel_mean, size=n_events)
        is_del = rng.random(n_events) < 0.5
        d_pos = pos[is_del]
        d_end = np.minimum(d_pos + length[is_del], m)
        delta = np.zeros(m + 1, np.int64)
        np.add.at(delta, d_pos, 1)
        np.add.at(delta, d_end, -1)
        keep = np.cumsum(delta[:-1]) == 0
        ins_pos = pos[~is_del]
        ins_len = length[~is_del]
        codes = codes[keep]
        anc_idx = anc_idx[keep]
        anc_strand = anc_strand[keep]
        if len(ins_pos):
            # original position -> position in the deletion-filtered
            # array; inserted bases carry no ancestor
            ks = np.concatenate([[0], np.cumsum(keep)])
            fpos = np.repeat(ks[ins_pos], ins_len)
            total_ins = int(ins_len.sum())
            ins = rng.integers(0, 4, size=total_ins).astype(np.uint8)
            codes = np.insert(codes, fpos, ins)
            anc_idx = np.insert(anc_idx, fpos,
                                np.full(total_ins, -1, dtype=np.int64))
            anc_strand = np.insert(anc_strand, fpos,
                                   np.ones(total_ins, dtype=np.int8))

    # inversions
    n_inv = rng.poisson(inversion_rate * dist * len(codes))
    for _ in range(n_inv):
        m = len(codes)
        length = min(m, 10 + int(rng.geometric(1.0 / inversion_mean)))
        if m <= length:
            continue
        pos = int(rng.integers(0, m - length))
        sl = slice(pos, pos + length)
        codes[sl] = revcomp(codes[sl])
        anc_idx[sl] = anc_idx[sl][::-1]
        anc_strand[sl] = -anc_strand[sl][::-1]

    # tandem duplications
    n_dup = rng.poisson(duplication_rate * dist * len(codes))
    for _ in range(n_dup):
        m = len(codes)
        length = min(m, 10 + int(rng.geometric(1.0 / duplication_mean)))
        if m <= length:
            continue
        pos = int(rng.integers(0, m - length))
        sl = slice(pos, pos + length)
        codes = np.insert(codes, pos + length, codes[sl])
        anc_idx = np.insert(anc_idx, pos + length, anc_idx[sl])
        anc_strand = np.insert(anc_strand, pos + length, anc_strand[sl])

    return codes, anc_idx, anc_strand


def simulate(tree: Tree, root_len: int = 50_000, seed: int = 0,
             **branch_kwargs) -> SimResult:
    """Simulate genomes for every node of `tree` from a random root."""
    rng = np.random.default_rng(seed)
    root_codes = rng.integers(0, 4, size=root_len).astype(np.uint8)
    root = SimGenome(tree.name or "root", root_codes,
                     np.arange(root_len, dtype=np.int64),
                     np.ones(root_len, dtype=np.int8))
    genomes: dict[str, SimGenome] = {}

    def walk(node: Tree, g: SimGenome):
        genomes[g.name] = g
        for child in node.children:
            c, i, s = _evolve_branch(g.codes, g.anc_idx, g.anc_strand,
                                     child.length or 0.0, rng, **branch_kwargs)
            walk(child, SimGenome(child.name, c, i, s))

    walk(tree, root)
    return SimResult(tree=tree, genomes=genomes, root_len=root_len)


def write_sim_fastas(sim: SimResult, outdir, leaves_only: bool = True) -> dict[str, str]:
    """Write one FASTA per genome; returns {genome: path}."""
    import os
    from ..io.fasta import write_fasta
    os.makedirs(outdir, exist_ok=True)
    names = (sim.tree.leaf_names() if leaves_only else list(sim.genomes))
    paths = {}
    for name in names:
        p = os.path.join(outdir, f"{name}.fa")
        write_fasta(p, [sim.genomes[name].to_sequence(f"{name}_chr0")])
        paths[name] = p
    return paths


def write_seqfile(sim: SimResult, outdir, path: str | None = None) -> str:
    import os
    paths = write_sim_fastas(sim, outdir)
    sf = path or os.path.join(outdir, "seqfile.txt")
    with open(sf, "w") as fh:
        fh.write(sim.tree.to_newick() + "\n")
        for name, p in paths.items():
            fh.write(f"{name} {p}\n")
    return sf
