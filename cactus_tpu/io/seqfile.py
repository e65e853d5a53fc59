"""Seqfile parsing: guide tree + genome→FASTA path map.

Format (reference: src/cactus/progressive/seqFile.py:43-60):
  line 1: newick guide tree (optional for pangenome star mode)
  lines:  [*]name path     (* marks a high-quality assembly usable as outgroup)
Comments (#...) and blank lines ignored.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..utils.trees import Tree, parse_newick


@dataclass
class SeqFile:
    tree: Tree | None
    paths: dict[str, str]
    quality_ok: dict[str, bool]  # '*' prefixed → True (outgroup-eligible)
    order: list[str] = field(default_factory=list)

    @classmethod
    def parse(cls, path: str, default_branch_len: float = 1.0) -> "SeqFile":
        tree = None
        paths: dict[str, str] = {}
        quality: dict[str, bool] = {}
        order: list[str] = []
        with open(path) as fh:
            for raw in fh:
                line = raw.strip()
                if not line or line.startswith("#"):
                    continue
                if tree is None and not paths and _looks_like_newick(line):
                    tree = parse_newick(line)
                    continue
                tokens = line.split()
                if len(tokens) < 2:
                    raise ValueError(f"bad seqfile line: {line!r}")
                name, p = tokens[0], tokens[1]
                starred = name.startswith("*")
                if starred:
                    name = name[1:]
                if name in paths:
                    raise ValueError(f"duplicate genome {name!r} in seqfile")
                paths[name] = p
                quality[name] = starred
                order.append(name)
        if tree is not None:
            for leaf in tree.leaves():
                if leaf.length is None:
                    leaf.length = default_branch_len
            missing = [l for l in tree.leaf_names() if l not in paths]
            if missing:
                raise ValueError(f"tree leaves missing sequence paths: {missing}")
        return cls(tree=tree, paths=paths, quality_ok=quality, order=order)

    def star_tree(self, root_name: str = "Anc0", branch_len: float = 1.0) -> Tree:
        """Build a star tree over the listed genomes (pangenome mode default;
        reference: setup/cactus_align.py star-tree path)."""
        root = Tree(root_name)
        for name in self.order:
            root.add_child(Tree(name, branch_len))
        return root


def _looks_like_newick(line: str) -> bool:
    return line.startswith("(") or line.rstrip().endswith(";")
