#!/usr/bin/env python
"""Multi-host scaling-efficiency benchmark (BASELINE north-star:
>=0.8 scaling efficiency at 2 hosts).

Measures the sharded banded-DP throughput of the SAME global 8-device
mesh in two configurations:

  A. one process owning all 8 devices (the single-host baseline), and
  B. two jax.distributed processes with 4 devices each, joined through
     a localhost coordinator — every cross-process collective crosses a
     real OS process boundary, the single-machine stand-in for the
     DCN/ICI hop between two pod hosts.

Scaling efficiency = throughput(B) / throughput(A): the fraction of
single-host throughput that survives process-boundary collectives.  The
reference's equivalent axis is Toil jobs over a cluster (SURVEY §2.4).

Usage:  python bench_multihost.py            # orchestrates A then B on
        localhost CPU devices; prints ONE JSON line like bench.py.

On real pod hardware, run the worker entry directly on each host with
JAX_PLATFORMS set for the accelerator (the orchestrator here pins CPU
because it forces xla_force_host_platform_device_count):

    host0$ python bench_multihost.py --worker 2 0 host0:port /tmp/out.json
    host1$ python bench_multihost.py --worker 2 1 host0:port /dev/null
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

REPS = 6
N_PAIRS = 64          # global batch (8 per device on the 8-device mesh)
SEQ_LEN = 4096        # genome-realistic per-pair work: the fixed
BAND = 512            # process-boundary costs amortize as they would
                      # on a real two-host batch


def _workload():
    import numpy as np
    rng = np.random.default_rng(11)
    return [(rng.integers(0, 4, SEQ_LEN).astype(np.uint8),
             rng.integers(0, 4, SEQ_LEN + 16).astype(np.uint8))
            for _ in range(N_PAIRS)]


def _run_and_time(mesh, packed, submat):
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental import multihost_utils
    from cactus_tpu.parallel.mesh import sharded_banded_align

    def glob(a):
        return multihost_utils.host_local_array_to_global_array(
            a, mesh, P())

    args = [glob(packed[k]) for k in ("q", "t_shift", "m_len", "n_len",
                                      "lo")] + [glob(submat)]

    def step(i):
        # vary inputs per rep so remote-relay result caching can't fake
        # the timing (bench.py's jnp.roll trick)
        a = [jnp.roll(args[0], i, axis=1)] + args[1:]
        return sharded_banded_align(mesh, *a, band=BAND, gap_open=400,
                                    gap_extend=30)

    jax.block_until_ready(step(0))          # compile
    t0 = time.perf_counter()
    for i in range(REPS):
        out = step(i + 1)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    cells = N_PAIRS * SEQ_LEN * BAND
    return cells / dt


def worker(num_processes: int, process_id: int, coordinator: str,
           out_path: str):
    import jax
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from cactus_tpu.config import PoaParams
    from cactus_tpu.ops.banded import pack_band_batch, score_matrix_6
    from cactus_tpu.parallel import distributed as dist

    if num_processes > 1:
        ok = dist.initialize(coordinator_address=coordinator,
                             num_processes=num_processes,
                             process_id=process_id)
        assert ok and jax.process_count() == num_processes
    mesh = dist.global_mesh()
    packed = pack_band_batch(_workload(), BAND)
    submat = np.asarray(score_matrix_6(PoaParams().sub_matrix))
    cells_per_s = _run_and_time(mesh, packed, submat)
    if process_id == 0:
        with open(out_path, "w") as fh:
            json.dump({"cells_per_s": cells_per_s,
                       "n_devices": mesh.devices.size}, fh)


PIPE_LEN = 1_000_000   # full-pipeline workload: 1 Mb two-genome pair


def pipeline_worker(num_processes: int, process_id: int,
                    coordinator: str, out_path: str):
    """FULL ancestor pipeline (blast->CAF->BAR->reference) timed under
    1 or 2 processes on the same 8-device mesh — the pipeline-level
    scaling number the kernel-only bench cannot give (VERDICT r3 weak
    #5).  Wall-clock covers ProgressiveAligner.run() only (the sim is
    identical per config and excluded)."""
    import jax
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from cactus_tpu.parallel import distributed as dist

    if num_processes > 1:
        ok = dist.initialize(coordinator_address=coordinator,
                             num_processes=num_processes,
                             process_id=process_id)
        assert ok and jax.process_count() == num_processes
    assert len(jax.devices()) == 8

    from cactus_tpu import progressive
    from cactus_tpu.config import Config
    from cactus_tpu.io.fasta import Sequence
    from cactus_tpu.testutil import evolver
    from cactus_tpu.utils.trees import parse_newick

    tree = parse_newick("(a:0.07,b:0.07)root;")
    sim = evolver.simulate(tree, root_len=PIPE_LEN, seed=21)
    genomes = {ev: {f"{ev}.c": Sequence(f"{ev}.c", sim.genomes[ev].codes)}
               for ev in ("a", "b")}
    cfg = Config.default()
    cfg.blast.chunk_size = 131_072
    cfg.blast.overlap_size = 4_096
    t0 = time.perf_counter()
    progressive.ProgressiveAligner(tree, genomes, config=cfg,
                                   n_devices=8).run()
    wall = time.perf_counter() - t0
    if process_id == 0:
        with open(out_path, "w") as fh:
            json.dump({"wall_s": wall}, fh)


def _spawn_pipeline(num_processes: int, devices_per_proc: int,
                    tmp: str) -> float:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}")
    # FORCE cpu: the orchestrator's virtual mesh needs the host
    # platform (a surrounding JAX_PLATFORMS=axon/tpu would silently
    # survive a setdefault); real-pod runs use the --worker entries
    # directly with their own platform env
    env["JAX_PLATFORMS"] = env.get("CACTUS_MH_PLATFORM", "cpu")
    env["PYTHONPATH"] = (os.path.dirname(os.path.abspath(__file__))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    out = os.path.join(tmp, f"mhp_{num_processes}.json")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--pipeline-worker",
         str(num_processes), str(pid), f"127.0.0.1:{port}", out],
        env=env) for pid in range(num_processes)]
    for p in procs:
        rc = p.wait(timeout=1800)
        assert rc == 0, f"pipeline worker exited {rc}"
    with open(out) as fh:
        return json.load(fh)["wall_s"]


def _spawn(num_processes: int, devices_per_proc: int, tmp: str) -> float:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}")
    env["JAX_PLATFORMS"] = env.get("CACTUS_MH_PLATFORM", "cpu")
    env["PYTHONPATH"] = (os.path.dirname(os.path.abspath(__file__))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    out = os.path.join(tmp, f"mh_{num_processes}.json")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker",
         str(num_processes), str(pid), f"127.0.0.1:{port}", out],
        env=env) for pid in range(num_processes)]
    for p in procs:
        rc = p.wait(timeout=900)
        assert rc == 0, f"worker exited {rc}"
    with open(out) as fh:
        return json.load(fh)["cells_per_s"]


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--pipeline-worker":
        pipeline_worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
                        sys.argv[5])
        return
    pipeline = "--pipeline" in sys.argv
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        single = _spawn(1, 8, tmp)     # one process, 8 devices
        double = _spawn(2, 4, tmp)     # two processes, 4 devices each
        extras = {"single_proc_cells_per_s": round(single, 1),
                  "two_proc_cells_per_s": round(double, 1)}
        if pipeline:
            p1 = _spawn_pipeline(1, 8, tmp)
            p2 = _spawn_pipeline(2, 4, tmp)
            extras.update({
                "pipeline_wall_1proc_s": round(p1, 1),
                "pipeline_wall_2proc_s": round(p2, 1),
                "pipeline_efficiency_2proc": round(p1 / p2, 4)})
    eff = double / single
    print(json.dumps({
        "metric": "multihost_scaling_efficiency_2proc",
        "value": round(eff, 4), "unit": "fraction",
        "vs_baseline": round(eff / 0.8, 4),
        "extras": extras}))


if __name__ == "__main__":
    main()
