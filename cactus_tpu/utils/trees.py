"""Phylogenetic tree utilities: newick parsing, traversal, distances.

Replaces sonLib's newick parser + cactus's MultiCactusTree naming scheme
(reference: src/cactus/progressive/multiCactusTree.py — internal nodes are
named ``Anc%d`` in pre-order; src/cactus/progressive/seqFile.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Tree:
    name: str = ""
    length: float | None = None  # branch length to parent
    children: list["Tree"] = field(default_factory=list)
    parent: "Tree | None" = field(default=None, repr=False, compare=False)

    # ---- construction ----
    def add_child(self, child: "Tree") -> "Tree":
        child.parent = self
        self.children.append(child)
        return child

    # ---- traversal ----
    def is_leaf(self) -> bool:
        return not self.children

    def preorder(self):
        yield self
        for c in self.children:
            yield from c.preorder()

    def postorder(self):
        for c in self.children:
            yield from c.postorder()
        yield self

    def leaves(self):
        return [n for n in self.preorder() if n.is_leaf()]

    def internal_nodes(self):
        return [n for n in self.preorder() if not n.is_leaf()]

    def find(self, name: str) -> "Tree | None":
        for n in self.preorder():
            if n.name == name:
                return n
        return None

    def leaf_names(self) -> list[str]:
        return [n.name for n in self.leaves()]

    # ---- distances ----
    def depth_of(self, name: str) -> float:
        """Path length (sum of branch lengths) from this node down to `name`."""
        d = self._depth_of(name)
        if d is None:
            raise KeyError(name)
        return d

    def _depth_of(self, name: str) -> float | None:
        if self.name == name:
            return 0.0
        for c in self.children:
            d = c._depth_of(name)
            if d is not None:
                return d + (c.length or 0.0)
        return None

    def distance(self, a: str, b: str) -> float:
        """Patristic distance between two named nodes."""
        pa = self._path_to_root(a)
        pb = self._path_to_root(b)
        if pa is None or pb is None:
            raise KeyError(a if pa is None else b)
        da = dict(pa)
        for nid, d in pb:
            if nid in da:
                return da[nid] + d
        raise KeyError(f"no common ancestor of {a},{b}")

    def _path_to_root(self, name: str):
        target = self.find(name)
        if target is None:
            return None
        path, d, n = [], 0.0, target
        while n is not None:
            path.append((id(n), d))
            d += n.length or 0.0
            n = n.parent
        return path

    def max_leaf_depth(self) -> float:
        if self.is_leaf():
            return 0.0
        return max((c.length or 0.0) + c.max_leaf_depth() for c in self.children)

    # ---- editing ----
    def copy(self) -> "Tree":
        t = Tree(self.name, self.length)
        for c in self.children:
            t.add_child(c.copy())
        return t

    def name_internal_nodes(self, prefix: str = "Anc") -> None:
        """Name unnamed internal nodes Anc0, Anc1, ... in pre-order
        (matching MultiCactusTree semantics; multiCactusTree.py:nameUnlabeledInternalNodes)."""
        used = {n.name for n in self.preorder() if n.name}
        i = 0
        for n in self.preorder():
            if not n.is_leaf() and not n.name:
                while f"{prefix}{i}" in used:
                    i += 1
                n.name = f"{prefix}{i}"
                used.add(n.name)

    # ---- serialization ----
    def to_newick(self, with_lengths: bool = True, root_semicolon: bool = True) -> str:
        s = self._nwk(with_lengths)
        return s + ";" if root_semicolon else s

    def _nwk(self, wl: bool) -> str:
        s = ""
        if self.children:
            s = "(" + ",".join(c._nwk(wl) for c in self.children) + ")"
        s += _quote(self.name)
        if wl and self.length is not None:
            s += f":{self.length:g}"
        return s


def _quote(name: str) -> str:
    if any(ch in name for ch in "(),:;' \t"):
        return "'" + name.replace("'", "''") + "'"
    return name


def parse_newick(s: str) -> Tree:
    """Parse a newick string (supports quoted labels and branch lengths)."""
    pos = 0
    n = len(s)

    def skip_ws():
        nonlocal pos
        while pos < n and s[pos] in " \t\r\n":
            pos += 1

    def parse_label() -> str:
        nonlocal pos
        skip_ws()
        if pos < n and s[pos] == "'":
            pos += 1
            out = []
            while pos < n:
                if s[pos] == "'":
                    if pos + 1 < n and s[pos + 1] == "'":
                        out.append("'")
                        pos += 2
                    else:
                        pos += 1
                        break
                else:
                    out.append(s[pos])
                    pos += 1
            return "".join(out)
        start = pos
        while pos < n and s[pos] not in "(),:;":
            pos += 1
        return s[start:pos].strip()

    def parse_length() -> float | None:
        nonlocal pos
        skip_ws()
        if pos < n and s[pos] == ":":
            pos += 1
            start = pos
            while pos < n and (s[pos].isdigit() or s[pos] in ".eE+-"):
                pos += 1
            return float(s[start:pos])
        return None

    def parse_node() -> Tree:
        nonlocal pos
        skip_ws()
        node = Tree()
        if pos < n and s[pos] == "(":
            pos += 1
            while True:
                node.add_child(parse_node())
                skip_ws()
                if pos < n and s[pos] == ",":
                    pos += 1
                    continue
                break
            skip_ws()
            if pos >= n or s[pos] != ")":
                raise ValueError(f"unbalanced newick at pos {pos}: {s!r}")
            pos += 1
        node.name = parse_label()
        node.length = parse_length()
        return node

    root = parse_node()
    skip_ws()
    if pos < n and s[pos] == ";":
        pos += 1
    return root


def get_subtree(tree: Tree, root_name: str, leaf_stop: set[str] | None = None) -> Tree:
    """Copy of the subtree rooted at `root_name`, truncating descent at any
    node whose name is in `leaf_stop` (reference:
    progressive_decomposition.py:get_subtree — subtree roots become leaves)."""
    src = tree.find(root_name)
    if src is None:
        raise KeyError(root_name)
    leaf_stop = leaf_stop or set()

    def rec(n: Tree, is_root: bool) -> Tree:
        t = Tree(n.name, None if is_root else n.length)
        if not is_root and n.name in leaf_stop:
            return t
        for c in n.children:
            t.add_child(rec(c, False))
        return t

    return rec(src, True)
