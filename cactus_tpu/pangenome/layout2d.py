"""odgi layout / odgi draw analog: path-guided 2D SGD layout.

Reference: graphmap-join runs `odgi layout` + `odgi draw` when asked
for 2D visualizations (refmap/cactus_graphmap_join.py --odgi surface;
odgi's layout is the path-guided SGD of Heumos et al., itself the
stress-majorization SGD of Zheng/Pawar/Goodman).  The algorithm is a
natural TPU fit and is implemented here the JAX way rather than as a
port: one jitted update step processes a BATCH of sampled step pairs
at once (odgi updates one pair per thread iteration), and the epoch
loop is a `lax.fori_loop` so the whole schedule compiles to a single
XLA program.

Model: every node contributes TWO layout points (its start and end
endpoint), so a node is drawn as a segment.  Training pairs are
(step-terminus, step-terminus) samples from the SAME walk; the target
distance is their nucleotide distance along the walk.  The classic
SGD-stress update moves both points along their difference vector
with step size mu = min(1, eta / d^2), eta decaying exponentially
from d_max^2 (every move fully satisfied) to 0.01.
"""

from __future__ import annotations

import numpy as np

from .graph import PanGraph
from .viz import layout_1d, write_png


def _step_termini(graph: PanGraph, ref_name: str | None):
    """Flatten walks into parallel arrays of (endpoint id, path pos).

    Every step contributes its two node endpoints at the step's start
    and end offsets along the walk (orientation decides which endpoint
    lands where).  Returns (ep, pos, path_start, path_len) where
    `path_start[i]:path_start[i]+path_len[i]` spans walk i's termini.
    """
    eps: list[int] = []
    poss: list[int] = []
    starts: list[int] = []
    lens: list[int] = []
    names = sorted(graph.walks)
    if ref_name in graph.walks:
        names.remove(ref_name)
        names.insert(0, ref_name)
    for name in names:
        starts.append(len(eps))
        off = 0
        for v, o in graph.walks[name]:
            L = graph.node_len(v)
            s_ep, e_ep = (2 * v, 2 * v + 1) if o == 1 else (2 * v + 1, 2 * v)
            eps.append(s_ep)
            poss.append(off)
            eps.append(e_ep)
            poss.append(off + L)
            off += L
        lens.append(len(eps) - starts[-1])
    return (np.asarray(eps, np.int32), np.asarray(poss, np.float32),
            np.asarray(starts, np.int32), np.asarray(lens, np.int32))


def layout_2d(graph: PanGraph, ref_name: str | None = None,
              iters: int = 200, batch: int = 1024, seed: int = 0,
              eta_min: float = 0.01) -> np.ndarray:
    """Path-guided SGD layout.  Returns (2*n_nodes, 2) float32 coords."""
    import jax
    import jax.numpy as jnp

    n = graph.n_nodes
    if n == 0:
        return np.zeros((0, 2), np.float32)
    ep, pos, pstart, plen = _step_termini(graph, ref_name)
    if len(ep) < 2:
        return np.zeros((2 * n, 2), np.float32)

    # init on the 1D layout with a small vertical jitter (odgi layout
    # also seeds from the 1D sort) so SGD starts near a good basin
    off1d = layout_1d(graph, ref_name).astype(np.float32)
    lens = np.asarray([graph.node_len(v) for v in range(n)], np.float32)
    rng = np.random.default_rng(seed)
    X0 = np.empty((2 * n, 2), np.float32)
    X0[0::2, 0] = off1d
    X0[1::2, 0] = off1d + lens
    X0[:, 1] = rng.standard_normal(2 * n).astype(np.float32)

    d_max = float(pos.max()) if len(pos) else 1.0
    eta_max = max(d_max * d_max, 1.0)
    lam = np.log(eta_max / eta_min) / max(iters - 1, 1)
    n_paths = len(pstart)
    # steps-per-path weighting: sample a terminus uniformly, then a
    # partner from the same walk at a log-uniform rank distance (the
    # zipfian band odgi uses, cheap to sample on device)
    ep_j = jnp.asarray(ep)
    pos_j = jnp.asarray(pos)
    pstart_j = jnp.asarray(pstart)
    plen_j = jnp.asarray(plen)
    # map terminus index -> path id (for partner sampling bounds)
    path_of = np.repeat(np.arange(n_paths, dtype=np.int32), plen)
    path_of_j = jnp.asarray(path_of)

    def body(t, carry):
        X, key = carry
        key, k1, k2, k3 = jax.random.split(key, 4)
        a = jax.random.randint(k1, (batch,), 0, len(ep))
        pid = path_of_j[a]
        lo, ln = pstart_j[pid], plen_j[pid]
        # log-uniform rank offset in [1, ln), random sign
        u = jax.random.uniform(k2, (batch,))
        mag = jnp.exp(u * jnp.log(jnp.maximum(ln.astype(jnp.float32), 2.0)))
        sgn = jnp.where(jax.random.uniform(k3, (batch,)) < 0.5, -1.0, 1.0)
        b = a + (sgn * mag).astype(jnp.int32)
        b = jnp.clip(b, lo, lo + ln - 1)
        d = jnp.abs(pos_j[a] - pos_j[b])
        d = jnp.maximum(d, 1.0)          # same-point pairs: unit floor
        ia, ib = ep_j[a], ep_j[b]
        eta = eta_max * jnp.exp(-lam * t)
        mu = jnp.minimum(eta / (d * d), 1.0)
        mu = jnp.where(ia == ib, 0.0, mu)  # degenerate pair: no move
        diff = X[ia] - X[ib]
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=1) + 1e-9)
        r = ((dist - d) / (2.0 * dist) * mu)[:, None] * diff
        # scatter-MEAN, not add: odgi applies pair moves sequentially;
        # a batched add of full-strength corrections to one endpoint
        # overshoots by the collision count and diverges
        acc = jnp.zeros_like(X).at[ia].add(-r).at[ib].add(r)
        cnt = (jnp.zeros((X.shape[0],), jnp.float32)
               .at[ia].add(1.0).at[ib].add(1.0))
        X = X + acc / jnp.maximum(cnt, 1.0)[:, None]
        return X, key

    @jax.jit
    def run(X0):
        key = jax.random.PRNGKey(seed)
        X, _ = jax.lax.fori_loop(0, iters, body, (X0, key))
        return X

    return np.asarray(run(jnp.asarray(X0)))


def write_lay(path: str, graph: PanGraph, X: np.ndarray) -> None:
    """odgi layout's .lay analog as TSV: node, x0, y0, x1, y1."""
    with open(path, "w") as fh:
        fh.write("#node\tx0\ty0\tx1\ty1\n")
        for v in range(graph.n_nodes):
            x0, y0 = X[2 * v]
            x1, y1 = X[2 * v + 1]
            fh.write(f"{v + 1}\t{x0:.3f}\t{y0:.3f}\t{x1:.3f}\t{y1:.3f}\n")


def read_lay(path: str) -> np.ndarray:
    rows = []
    with open(path) as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            _, x0, y0, x1, y1 = line.split("\t")
            rows.append(((float(x0), float(y0)), (float(x1), float(y1))))
    out = np.empty((2 * len(rows), 2), np.float32)
    for i, (p0, p1) in enumerate(rows):
        out[2 * i], out[2 * i + 1] = p0, p1
    return out


def draw(graph: PanGraph, X: np.ndarray, path: str,
         width: int = 800, pad: int = 8) -> None:
    """`odgi draw` analog: rasterize node segments to a PNG.

    Vectorized: all nodes' segments are sampled at once (K points per
    segment, K set by the longest segment in pixels) and splatted into
    the canvas with one fancy-index store.
    """
    n = graph.n_nodes
    if n == 0 or len(X) == 0:
        write_png(path, np.full((16, 16, 3), 255, np.uint8))
        return
    lo = X.min(axis=0)
    hi = X.max(axis=0)
    span = np.maximum(hi - lo, 1e-6)
    scale = (width - 2 * pad) / span.max()
    height = int(np.ceil(span[1] * scale)) + 2 * pad
    height = max(height, 16)
    img = np.full((height, width, 3), 255, np.uint8)

    P = ((X - lo) * scale + pad).astype(np.float32)   # (2n, 2) pixel
    A, B = P[0::2], P[1::2]                           # (n, 2)
    seg_px = np.abs(B - A).max(axis=1)
    K = int(min(max(seg_px.max(), 1) + 1, 4 * width))
    t = np.linspace(0.0, 1.0, K, dtype=np.float32)[None, :, None]
    pts = A[:, None, :] + (B - A)[:, None, :] * t      # (n, K, 2)
    xs = np.clip(pts[..., 0].astype(np.int32), 0, width - 1)
    ys = np.clip(pts[..., 1].astype(np.int32), 0, height - 1)
    # color by node depth (number of walk steps through the node)
    depth = np.zeros(n, np.int64)
    for walk in graph.walks.values():
        for v, _o in walk:
            depth[v] += 1
    dmax = max(int(depth.max()), 1)
    # deep nodes red-shifted, shallow ones slate blue
    frac = (depth / dmax).astype(np.float32)
    col = np.stack([40 + 200 * frac, np.full(n, 60, np.float32),
                    220 - 180 * frac], axis=1).astype(np.uint8)
    colK = np.broadcast_to(col[:, None, :], (n, K, 3))
    img[ys.ravel(), xs.ravel()] = colK.reshape(-1, 3)
    write_png(path, img)


def layout_stress(graph: PanGraph, X: np.ndarray,
                  ref_name: str | None = None,
                  sample: int = 4096, seed: int = 1) -> float:
    """Normalized stress over sampled same-walk pairs (diagnostic)."""
    ep, pos, pstart, plen = _step_termini(graph, ref_name)
    if len(ep) < 2:
        return 0.0
    rng = np.random.default_rng(seed)
    a = rng.integers(0, len(ep), sample)
    path_of = np.repeat(np.arange(len(pstart)), plen)
    lo, ln = pstart[path_of[a]], plen[path_of[a]]
    b = np.clip(a + rng.integers(-np.maximum(ln - 1, 1),
                                 np.maximum(ln, 2)), lo, lo + ln - 1)
    d = np.abs(pos[a] - pos[b])
    keep = d >= 1.0
    if not keep.any():
        return 0.0
    a, b, d = a[keep], b[keep], d[keep]
    dist = np.linalg.norm(X[ep[a]] - X[ep[b]], axis=1)
    return float(np.mean(((dist - d) / d) ** 2))


def sgd_sort(graph: PanGraph, ref_name: str | None = None,
             iters: int | None = None, batch: int = 1024,
             seed: int = 0) -> np.ndarray:
    """`odgi sort -Y` analog: path-guided 1D SGD node order.

    Same sampled-pair SGD as layout_2d but in one dimension with one
    point per node (odgi's 1D sort), starting from the first-visit
    order.  Returns the node permutation (new order, old ids).

    iters defaults to a graph-size-scaled schedule: convergence needs
    the sampled pairs to cover each node several times (odgi scales
    its SGD epochs with path steps the same way).
    """
    import jax
    import jax.numpy as jnp

    n = graph.n_nodes
    if n == 0:
        return np.zeros(0, np.int64)
    if iters is None:
        iters = min(2000, max(600, 4 * n))
    ep, pos, pstart, plen = _step_termini(graph, ref_name)
    if len(ep) < 2:
        return np.arange(n, dtype=np.int64)
    node_of = np.asarray(ep) // 2          # terminus → node id
    x0 = layout_1d(graph, ref_name).astype(np.float32)

    eta_max = max(float(pos.max()) ** 2, 1.0)
    eta_min = 0.01
    lam = np.log(eta_max / eta_min) / max(iters - 1, 1)
    node_j = jnp.asarray(node_of)
    pos_j = jnp.asarray(pos)
    pstart_j = jnp.asarray(pstart)
    plen_j = jnp.asarray(plen)
    path_of_j = jnp.asarray(
        np.repeat(np.arange(len(pstart), dtype=np.int32), plen))

    def body(t, carry):
        x, key = carry
        key, k1, k2, k3 = jax.random.split(key, 4)
        a = jax.random.randint(k1, (batch,), 0, len(ep))
        pid = path_of_j[a]
        lo, ln = pstart_j[pid], plen_j[pid]
        u = jax.random.uniform(k2, (batch,))
        mag = jnp.exp(u * jnp.log(jnp.maximum(ln.astype(jnp.float32), 2.0)))
        sgn = jnp.where(jax.random.uniform(k3, (batch,)) < 0.5, -1.0, 1.0)
        b = jnp.clip(a + (sgn * mag).astype(jnp.int32), lo, lo + ln - 1)
        d = jnp.maximum(jnp.abs(pos_j[a] - pos_j[b]), 1.0)
        ia, ib = node_j[a], node_j[b]
        eta = eta_max * jnp.exp(-lam * t)
        mu = jnp.where(ia == ib, 0.0, jnp.minimum(eta / (d * d), 1.0))
        diff = x[ia] - x[ib]
        dist = jnp.abs(diff) + 1e-9
        r = (dist - d) / (2.0 * dist) * mu * diff
        acc = jnp.zeros_like(x).at[ia].add(-r).at[ib].add(r)
        cnt = jnp.zeros_like(x).at[ia].add(1.0).at[ib].add(1.0)
        return x + acc / jnp.maximum(cnt, 1.0), key

    @jax.jit
    def run(x0):
        key = jax.random.PRNGKey(seed)
        x, _ = jax.lax.fori_loop(0, iters, body, (x0, key))
        return x

    x = np.asarray(run(jnp.asarray(x0)))
    return np.argsort(x, kind="stable").astype(np.int64)
