"""Progressive decomposition helpers — spanning subtrees, branch
scaling, and input-tree sanity checks.

Reference: src/cactus/progressive/progressive_decomposition.py —
`get_spanning_subtree` (:182), `get_ancestor_scaled_tree` (:208),
`get_node_heights` (:245), `check_branch_lengths` (:303, error at 25.0
substitutions/site where the Jukes-Cantor matrix flattens),
`check_degree2_ancestors` / `check_multifurcations` (:334-343).
"""

from __future__ import annotations

from .trees import Tree


def get_spanning_subtree(tree: Tree, root_name: str,
                         outgroups: list[str]) -> Tree:
    """Minimal subtree of `tree` spanning root_name's children plus its
    outgroups (the event set one ancestor step actually touches)."""
    root = tree.find(root_name)
    if root is None:
        raise KeyError(root_name)
    targets = {c.name for c in root.children} | set(outgroups)

    # collect every node on a path from a target up to the common root
    anc = tree if outgroups else root
    keep: set[int] = set()
    for name in targets:
        n = tree.find(name)
        while n is not None:
            keep.add(id(n))
            if n is anc:
                break
            n = n.parent

    def build(node: Tree) -> Tree | None:
        kids = [build(c) for c in node.children]
        kids = [k for k in kids if k is not None]
        if id(node) not in keep and not kids:
            return None
        out = Tree(node.name, node.length)
        for k in kids:
            out.add_child(k)
        return out

    spanning = build(anc)
    # contract single-child internal nodes not in the target/root set
    def contract(node: Tree) -> Tree:
        while (len(node.children) == 1 and node.name != root_name
               and node.name not in targets):
            child = node.children[0]
            child.length = (child.length or 0.0) + (node.length or 0.0)
            child.parent = node.parent
            node = child
        node.children = [contract(c) for c in node.children]
        for c in node.children:
            c.parent = node
        return node

    return contract(spanning)


def get_node_heights(tree: Tree) -> dict[str, float]:
    """Height of each node = longest path to a leaf below it."""
    heights: dict[str, float] = {}

    def walk(n: Tree) -> float:
        if n.is_leaf():
            heights[n.name] = 0.0
            return 0.0
        h = max((c.length or 0.0) + walk(c) for c in n.children)
        heights[n.name] = h
        return h

    walk(tree)
    return heights


def get_ancestor_scaled_tree(tree: Tree, max_div: float,
                             branch_scale: float = 1.0,
                             upweight_ancestors: bool = False) -> Tree:
    """Branch scaling for divergence-threshold computation: multiply
    all branches by branch_scale, then (optionally) add each internal
    node's height to its branch, capped at max_div — reflecting
    uncertainty in reconstructed ancestors (reference :208-241)."""
    out = tree.copy()
    if branch_scale != 1.0:
        for n in out.preorder():
            if n.parent is not None and n.length is not None:
                n.length = n.length * branch_scale
    if upweight_ancestors:
        heights = get_node_heights(out)
        for n in out.preorder():
            if n.parent is None or n.is_leaf():
                continue
            ln = n.length or 0.0
            if ln < max_div:
                n.length = min(max_div, ln + heights.get(n.name, 0.0))
    return out


def check_branch_lengths(tree: Tree, warning_cap: float = 2.0,
                         error_cap: float = 25.0,
                         log=lambda m: None) -> None:
    """Branch lengths must be substitutions/site: error above 25 (the
    JC matrix flattens ~28.4 and reference phase degenerates,
    reference :303-331), warn above 2."""
    for n in tree.preorder():
        if n.parent is None or len(n.parent.children) < 2:
            continue
        ln = n.length or 0.0
        if ln > error_cap:
            raise ValueError(
                f"branch length {ln} above {n.name} is too long: input "
                f"branches must be expected substitutions per neutral "
                f"site (≤ {error_cap})")
        if ln > warning_cap:
            log(f"WARNING: long branch {ln:.3f} above {n.name}: are "
                "branches really substitutions/site?")


def check_degree2_ancestors(tree: Tree) -> None:
    for n in tree.preorder():
        if len(n.children) == 1:
            raise ValueError(
                f"node {n.name} has a single descendant "
                f"({n.children[0].name}): remove degree-2 nodes")


def check_multifurcations(tree: Tree, log=lambda m: None,
                          allow: bool = True) -> int:
    """Count multifurcations; reference errors by default (coverage
    drops on polytomies, :340-343) — here the star BAR engine handles
    them, so the default is a warning."""
    count = 0
    for n in tree.preorder():
        if len(n.children) > 2:
            count += 1
            msg = (f"node {n.name} has {len(n.children)} children "
                   "(multifurcation)")
            if not allow:
                raise ValueError(msg + ": binarize the input tree")
            log("WARNING: " + msg)
    return count
