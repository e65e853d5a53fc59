"""Device-mesh sharding of the alignment pipeline (Toil-distribution analog).

The reference distributes work as independent Toil jobs over a cluster and
"merges" by concatenating files (reference: src/cactus/paf/local_alignment.py
:336-367 combine_chunks, :370-408 chunk-grid fan-out).  The TPU-native
equivalent here is SPMD over a `jax.sharding.Mesh`:

 - the (query-chunk x target-chunk) anchoring grid is data-parallel over the
   `d` (device) axis — each device seed-joins its query chunk against the
   replicated target chunk;
 - banded-DP pair batches are sharded over `d` on the batch axis;
 - "file concatenation" merges become fixed-shape `all_gather`s of
   count-prefixed anchor tables, and global statistics are `psum`s — the
   collectives ride ICI instead of a shared filestore.

Deterministic N-device == 1-device outputs: every merged table is gathered
in mesh order (axis order is the sort key, mirroring the reference's
file-order concatenation determinism; SURVEY.md §5 note).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.banded import banded_align_batch
from ..ops.seeds import seed_join


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        # fall back to the virtual CPU device set (tests / dry runs force
        # --xla_force_host_platform_device_count)
        try:
            cpus = jax.devices("cpu")
        except RuntimeError:
            cpus = []
        if len(cpus) >= n:
            devs = cpus
        else:
            raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis,))


def pad_batch_to(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


def sharded_banded_align(mesh: Mesh, q, t_shift, m_len, n_len, lo, submat,
                         *, band: int, gap_open: int, gap_extend: int):
    """banded_align_batch with the pair batch sharded over the mesh.

    The caller pads the batch dim to a multiple of the mesh size
    (pad pairs have m_len == 0 and are ignored downstream).
    """
    fn = partial(banded_align_batch, band=band, gap_open=gap_open,
                 gap_extend=gap_extend)

    @partial(shard_map, mesh=mesh,
             in_specs=(P("d", None), P("d", None), P("d"), P("d"), P("d"),
                       P(None, None)),
             out_specs=(P("d", None, None), P("d", None), P("d")))
    def run(q, t_shift, m_len, n_len, lo, submat):
        return fn(q, t_shift, m_len, n_len, lo, submat)

    return jax.jit(run)(q, t_shift, m_len, n_len, lo, submat)


def sharded_seed_join(mesh: Mesh, q_chunks, q_valid, t_codes, t_valid,
                      *, k: int, step: int, max_occ: int, max_anchors: int):
    """Each device seed-joins its query chunk against the replicated target.

    q_chunks: (D, L) uint8 — one chunk per device row.
    Returns (qpos (D, A), tpos (D, A), counts (D,), total ()) with the total
    psum-reduced over the mesh — the collective replacing the reference's
    anchor-file concatenation count.
    """
    fn = partial(seed_join, k=k, step=step, max_occ=max_occ,
                 max_anchors=max_anchors)

    @partial(shard_map, mesh=mesh,
             in_specs=(P("d", None), P("d", None), P(None), P(None)),
             out_specs=(P("d", None), P("d", None), P("d"), P()))
    def run(qc, qv, tc, tv):
        qpos, tpos, n = fn(qc[0], qv[0], tc, tv)
        total = jax.lax.psum(n, "d")
        return qpos[None], tpos[None], n[None], total

    return jax.jit(run)(q_chunks, q_valid, t_codes, t_valid)


def put_global(mesh: Mesh, arr: np.ndarray, spec: P):
    """Host array → global device array under a (possibly multi-host)
    mesh.  Every process holds the same full host array (the driver's
    task grid is deterministic and replicated), so each just feeds its
    addressable shards.  Single-process: plain asarray."""
    if jax.process_count() == 1:
        return jnp.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, NamedSharding(mesh, spec), lambda idx: arr[idx])


def sharded_pair_seed_join(mesh: Mesh, q_codes, q_valid, t_codes, t_valid,
                           *, k: int, step: int, max_occ: int,
                           max_anchors: int, pattern: str = ""):
    """Seed-join D independent (query, target) chunk pairs, one per device.

    Unlike sharded_seed_join (one target replicated), BOTH sides are
    sharded: row d of q_codes (D, Lq) joins row d of t_codes (D, Lt).
    This is the driver's chunk-pair grid unit (the reference fans the
    same grid out as Toil jobs, local_alignment.py:370-408).  Results
    are independent of device placement, so N-device == 1-device output
    is bit-identical by construction.

    Multi-process safe: inputs may be host numpy (each process holds the
    same full array) and outputs come back REPLICATED via an in-program
    all_gather — the collective replacing the reference's anchor-file
    concatenation — so every host can read the full anchor table.

    Returns (qpos (D, A), tpos (D, A), counts (D,)).
    """
    fn = partial(seed_join, k=k, step=step, max_occ=max_occ,
                 max_anchors=max_anchors, pattern=pattern)

    @partial(shard_map, mesh=mesh,
             in_specs=(P("d", None), P("d", None), P("d", None),
                       P("d", None)),
             out_specs=(P(), P(), P()), check_vma=False)
    def run(qc, qv, tc, tv):
        qpos, tpos, n = fn(qc[0], qv[0], tc[0], tv[0])
        # gather in mesh order: deterministic merge, every host sees all
        qpos_all = jax.lax.all_gather(qpos, "d", axis=0)
        tpos_all = jax.lax.all_gather(tpos, "d", axis=0)
        n_all = jax.lax.all_gather(n, "d", axis=0)
        return qpos_all, tpos_all, n_all

    sp = lambda a: put_global(mesh, np.asarray(a), P("d", None))
    return jax.jit(run)(sp(q_codes), sp(q_valid), sp(t_codes), sp(t_valid))


def full_pipeline_step(mesh: Mesh, q_chunks, q_valid, t_codes, t_valid,
                       q_dp, t_dp, m_len, n_len, lo, submat,
                       *, k: int, step: int, max_occ: int, max_anchors: int,
                       band: int, gap_open: int, gap_extend: int):
    """One jitted SPMD step of the production alignment pipeline:

      seed-join (dp over query chunks) → anchor-count psum →
      banded DP (dp over pair batch) → end-score all_gather.

    This is the multi-chip path the driver dry-runs; the real progressive
    driver calls the two stages separately with host-side chaining between
    them (anchors → chains → DP gap-fill).
    """
    seed_fn = partial(seed_join, k=k, step=step, max_occ=max_occ,
                      max_anchors=max_anchors)
    dp_fn = partial(banded_align_batch, band=band, gap_open=gap_open,
                    gap_extend=gap_extend)

    @partial(shard_map, mesh=mesh,
             in_specs=(P("d", None), P("d", None), P(None), P(None),
                       P("d", None), P("d", None), P("d"), P("d"), P("d"),
                       P(None, None)),
             out_specs=(P(), P(None, None), P("d", None, None)),
             check_vma=False)
    def run(qc, qv, tc, tv, q_dp, t_dp, m_len, n_len, lo, submat):
        _qpos, _tpos, n = seed_fn(qc[0], qv[0], tc, tv)
        total_anchors = jax.lax.psum(n, "d")
        dirs, end_scores, _end_mat = dp_fn(q_dp, t_dp, m_len, n_len, lo,
                                           submat)
        # gather every device's endpoint scores in mesh order (deterministic
        # merge, replacing file concatenation)
        all_scores = jax.lax.all_gather(end_scores, "d", axis=0, tiled=True)
        return total_anchors, all_scores, dirs

    return jax.jit(run)(q_chunks, q_valid, t_codes, t_valid,
                        q_dp, t_dp, m_len, n_len, lo, submat)
