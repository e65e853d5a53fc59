"""REAL multi-process jax.distributed run on localhost.

The reference scales by distributing Toil jobs over a cluster
(SURVEY §2.4); the TPU-native design is one SPMD program whose process
group is joined via jax.distributed.  This test launches TWO separate
Python processes (4 virtual CPU devices each), joins them through a
localhost coordinator, builds the global 8-device mesh with the SAME
helpers the driver uses (parallel/distributed.py), runs a sharded
banded-DP batch over the global mesh, and checks the collective result
on every process against a single-process oracle — the closest
single-machine stand-in for a 2-host pod slice.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
from cactus_tpu.parallel import distributed as dist
ok = dist.initialize(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=2, process_id=pid)
assert ok and jax.process_count() == 2
mesh = dist.global_mesh()
assert mesh.devices.size == 8, mesh.devices

from cactus_tpu.config import PoaParams
from cactus_tpu.ops.banded import (pack_band_batch, score_matrix_6)
from cactus_tpu.parallel.mesh import sharded_banded_align
rng = np.random.default_rng(7)
pairs = [(rng.integers(0, 4, 60).astype(np.uint8),
          rng.integers(0, 4, 64).astype(np.uint8)) for _ in range(16)]
packed = pack_band_batch(pairs, 128)
submat = score_matrix_6(PoaParams().sub_matrix)

from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils
args = []
for name, spec in (("q", P("d")), ("t_shift", P("d")), ("m_len", P("d")),
                   ("n_len", P("d")), ("lo", P("d"))):
    host = jnp.asarray(packed[name])
    args.append(multihost_utils.host_local_array_to_global_array(
        np.asarray(host), mesh, P()))  # replicate inputs globally
args.append(multihost_utils.host_local_array_to_global_array(
    np.asarray(submat), mesh, P()))
dirs, scores, mat = sharded_banded_align(mesh, *args, band=128,
                                         gap_open=400, gap_extend=30)
scores_local = multihost_utils.global_array_to_host_local_array(
    scores, mesh, P())
res = dict(process=pid, n_global_devices=len(jax.devices()),
           scores=np.asarray(scores_local).tolist())
with open(out, "w") as fh:
    json.dump(res, fh)
"""


def test_two_process_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    wpath = tmp_path / "worker.py"
    wpath.write_text(_WORKER)
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"out{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(wpath), str(pid), str(port), str(out)],
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for p, lg in zip(procs, logs):
        assert p.returncode == 0, lg[-4000:]

    # single-process oracle on this (8-device) process
    import jax.numpy as jnp
    from cactus_tpu.config import PoaParams
    from cactus_tpu.ops.banded import (banded_align_batch, pack_band_batch,
                                       score_matrix_6)
    rng = np.random.default_rng(7)
    pairs = [(rng.integers(0, 4, 60).astype(np.uint8),
              rng.integers(0, 4, 64).astype(np.uint8)) for _ in range(16)]
    packed = pack_band_batch(pairs, 128)
    submat = score_matrix_6(PoaParams().sub_matrix)
    _, scores, _ = banded_align_batch(
        jnp.asarray(packed["q"]), jnp.asarray(packed["t_shift"]),
        jnp.asarray(packed["m_len"]), jnp.asarray(packed["n_len"]),
        jnp.asarray(packed["lo"]), jnp.asarray(submat),
        band=128, gap_open=400, gap_extend=30)
    want = np.asarray(scores)

    for out in outs:
        res = json.loads(out.read_text())
        assert res["n_global_devices"] == 8
        np.testing.assert_array_equal(np.asarray(res["scores"]), want)


_PIPELINE_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
from cactus_tpu.parallel import distributed as dist
ok = dist.initialize(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=2, process_id=pid)
assert ok and jax.process_count() == 2 and len(jax.devices()) == 8

from cactus_tpu import progressive
from cactus_tpu.config import Config
from cactus_tpu.io.fasta import Sequence
from cactus_tpu.phases.hal import write_hal2maf
from cactus_tpu.testutil import evolver
from cactus_tpu.utils.trees import parse_newick

tree = parse_newick("((a:0.03,b:0.03)ab:0.02,c:0.05)root;")
sim = evolver.simulate(tree, root_len=6000, seed=11)
genomes = {ev: {f"{ev}.c": Sequence(f"{ev}.c", sim.genomes[ev].codes)}
           for ev in ["a", "b", "c"]}
cfg = Config.default()
cfg.blast.chunk_size = 2048
cfg.blast.overlap_size = 256
result = progressive.ProgressiveAligner(
    tree, genomes, config=cfg, min_chain_override=64,
    n_devices=8).run()
write_hal2maf(out, result)
"""


def test_two_process_full_pipeline(tmp_path):
    """A COMPLETE ancestor pipeline (blast->CAF->BAR->reference->MAF,
    the test_multichip_driver workload) under 2 coordinator-joined
    processes: every process's MAF must equal the single-process one
    (VERDICT r2 missing #4)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    wpath = tmp_path / "pipeline_worker.py"
    wpath.write_text(_PIPELINE_WORKER)
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"pipe{pid}.maf"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(wpath), str(pid), str(port), str(out)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for p, lg in zip(procs, logs):
        assert p.returncode == 0, lg[-4000:]

    # single-process oracle (8 local virtual devices, same workload)
    from cactus_tpu import progressive
    from cactus_tpu.config import Config
    from cactus_tpu.io.fasta import Sequence
    from cactus_tpu.phases.hal import write_hal2maf
    from cactus_tpu.testutil import evolver
    from cactus_tpu.utils.trees import parse_newick
    tree = parse_newick("((a:0.03,b:0.03)ab:0.02,c:0.05)root;")
    sim = evolver.simulate(tree, root_len=6000, seed=11)
    genomes = {ev: {f"{ev}.c": Sequence(f"{ev}.c", sim.genomes[ev].codes)}
               for ev in ["a", "b", "c"]}
    cfg = Config.default()
    cfg.blast.chunk_size = 2048
    cfg.blast.overlap_size = 256
    result = progressive.ProgressiveAligner(
        tree, genomes, config=cfg, min_chain_override=64,
        n_devices=8).run()
    want_path = tmp_path / "oracle.maf"
    write_hal2maf(str(want_path), result)
    want = want_path.read_bytes()
    assert want.count(b"\ns ") > 0
    for out in outs:
        assert out.read_bytes() == want


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="scaling bench: set RUN_SLOW=1")
def test_scaling_efficiency_bench():
    """bench_multihost.py emits the 2-process scaling-efficiency metric
    (BASELINE north-star harness; the localhost number is a lower bound
    — both configurations share this host's cores)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench_multihost.py")],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "multihost_scaling_efficiency_2proc"
    assert 0.2 < rec["value"] <= 1.5
