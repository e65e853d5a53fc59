"""Gb-scale two-genome proof, staged so the ALIGN stage's peak RSS is
the framework's own (the reference's 128 GB @ 1 Gb envelope,
cactus_progressive_config.xml:571-581, measures cactus_consolidated —
not the test harness that made the input).

  python scratch/bigproof.py sim   <bp> <dir>    # simulate + save
  python scratch/bigproof.py align <dir>         # the measured stage
  python scratch/bigproof.py score <dir>         # sampled accuracy

sim saves the two leaf genomes as plain code arrays plus the root-index
truth (int32) per genome; align runs ProgressiveAligner on codes alone
and persists through AlignmentStore; score loads the store, rebuilds
leaf maps, and computes recall/precision over sampled 8 Mb windows of
genome a (the mafComparator --samples analog).
"""
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def log(msg):
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"[{time.strftime('%H:%M:%S')} rss={rss:.1f}GB] {msg}",
          flush=True)


def cmd_sim(bp: int, outdir: str):
    from cactus_tpu.testutil import evolver
    from cactus_tpu.utils.trees import parse_newick
    os.makedirs(outdir, exist_ok=True)
    tree = parse_newick("(a:0.07,b:0.07)root;")
    log(f"simulating {bp} bp pair")
    sim = evolver.simulate(tree, root_len=bp, seed=13)
    for g in ("a", "b"):
        gen = sim.genomes[g]
        np.savez(os.path.join(outdir, f"{g}.npz"),
                 codes=gen.codes.astype(np.uint8),
                 anc_idx=gen.anc_idx.astype(np.int32),
                 anc_strand=gen.anc_strand.astype(np.int8))
        log(f"saved {g}: {len(gen.codes)} bp")


def cmd_align(outdir: str):
    import jax
    from cactus_tpu import progressive
    from cactus_tpu.io.fasta import Sequence
    from cactus_tpu.store import AlignmentStore
    from cactus_tpu.utils.trees import parse_newick
    tree = parse_newick("(a:0.07,b:0.07)root;")
    genomes = {}
    for g in ("a", "b"):
        with np.load(os.path.join(outdir, f"{g}.npz")) as d:
            genomes[g] = {f"{g}.c": Sequence(f"{g}.c",
                                             d["codes"].copy())}
        log(f"loaded {g}")
    store = AlignmentStore(os.path.join(outdir, "store"))
    from cactus_tpu.config import Config
    cfg = Config.default()
    mode = os.environ.get("CACTUS_BIGPROOF_ALIGNER", "")
    if mode:
        cfg.blast.aligner = mode
        log(f"aligner mode: {mode} (big-chunk grid)")
    t0 = time.perf_counter()
    progressive.ProgressiveAligner(
        tree, genomes, store=store, config=cfg,
        log=lambda m: log(m)).run()
    wall = time.perf_counter() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    rec = {"stage": "align", "wall_s": round(wall, 1),
           "peak_rss_gb": round(rss, 2)}
    with open(os.path.join(outdir, "align.json"), "w") as fh:
        json.dump(rec, fh)
    log(f"ALIGN DONE {rec}")


def cmd_score(outdir: str, window: int = 8_000_000,
              n_windows: int = 12):
    from cactus_tpu import progressive
    from cactus_tpu.store import AlignmentStore
    from cactus_tpu.utils import pairs as pk
    store = AlignmentStore(os.path.join(outdir, "store"))
    res = store.load_result()
    ma = progressive.leaf_map_to_ancestor(res, "a", "root")["a.c"]
    mb = progressive.leaf_map_to_ancestor(res, "b", "root")["b.c"]
    with np.load(os.path.join(outdir, "a.npz")) as d:
        a_idx = d["anc_idx"].astype(np.int64)
        a_str = d["anc_strand"].astype(np.int16)
    with np.load(os.path.join(outdir, "b.npz")) as d:
        b_idx = d["anc_idx"].astype(np.int64)
        b_str = d["anc_strand"].astype(np.int16)
    log("building b-side indexes")
    # truth: sorted b root-index for joins
    sel_b = np.flatnonzero(b_idx >= 0)
    b_keys = b_idx[sel_b]
    ob = np.argsort(b_keys, kind="stable")
    b_keys_s, sel_b_s = b_keys[ob], sel_b[ob]
    # predicted: sorted b ancestor-key
    pb = np.flatnonzero(mb.tgt_idx >= 0)
    kb = (np.asarray(mb.tgt_idx[pb]).astype(np.int64) << 40
          | np.asarray(mb.tgt_pos[pb]))
    okb = np.argsort(kb, kind="stable")
    kb_s, pb_s = kb[okb], pb[okb]
    sb_s = np.asarray(mb.strand[pb])[okb].astype(np.int16)
    del b_keys, ob, kb, okb, pb

    rng = np.random.default_rng(7)
    n = len(a_idx)
    starts = rng.choice(max(1, n - window), size=n_windows,
                        replace=False) if n > window else [0]
    tot_t = tot_p = tot_ir = tot_ip = 0
    for w0 in sorted(int(s) for s in starts):
        w1 = min(n, w0 + window)
        # truth pairs with a-position in the window
        sel_a = np.flatnonzero(a_idx[w0:w1] >= 0) + w0
        ia, ib = pk.join_expand(a_idx[sel_a], b_keys_s)
        rel = a_str[sel_a][ia] * b_str[sel_b_s[ib]]
        truth = pk.unique_keys(pk.pack_pairs(sel_a[ia],
                                             sel_b_s[ib], rel))
        # predicted pairs with a-position in the window
        pa = np.flatnonzero(np.asarray(ma.tgt_idx[w0:w1]) >= 0) + w0
        ka = (np.asarray(ma.tgt_idx[pa]).astype(np.int64) << 40
              | np.asarray(ma.tgt_pos[pa]))
        ja, jb = pk.join_expand(ka, kb_s)
        prel = (np.asarray(ma.strand[pa])[ja].astype(np.int16)
                * sb_s[jb])
        pred = pk.unique_keys(pk.pack_pairs(pa[ja], pb_s[jb], prel))
        t, p = pk.strandless(truth), pk.strandless(pred)
        inter = pk.intersect_count(t, p)
        tot_t += len(t)
        tot_p += len(p)
        tot_ir += inter
        tot_ip += inter
        log(f"window {w0}: truth={len(t)} pred={len(p)} inter={inter}")
    rec = {"stage": "score", "windows": len(starts),
           "recall": round(tot_ir / max(1, tot_t), 4),
           "precision": round(tot_ip / max(1, tot_p), 4)}
    with open(os.path.join(outdir, "score.json"), "w") as fh:
        json.dump(rec, fh)
    log(f"SCORE DONE {rec}")


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "sim":
        cmd_sim(int(sys.argv[2]), sys.argv[3])
    elif cmd == "align":
        cmd_align(sys.argv[2])
    elif cmd == "score":
        cmd_score(sys.argv[2])
    else:
        raise SystemExit(f"unknown stage {cmd}")
