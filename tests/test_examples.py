"""examples/ stays runnable: generator + the README's core commands."""

import os
import subprocess
import sys

from cactus_tpu import cli


def test_examples_quickstart(tmp_path):
    data = str(tmp_path / "data")
    r = subprocess.run(
        [sys.executable, "examples/make_examples.py", "--small",
         "--out", data],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    for name in ("evolverMammals", "evolverPrimates", "yeastPangenome"):
        assert os.path.getsize(os.path.join(data, f"{name}.txt")) > 0

    out = str(tmp_path / "aln")
    maf = str(tmp_path / "aln.maf")
    hal = str(tmp_path / "aln.hal")
    assert cli.main(["align", os.path.join(data, "evolverPrimates.txt"),
                     out, "--maf", maf, "--hal", hal,
                     "--min-chain", "64"]) == 0
    assert os.path.getsize(maf) > 0
    assert cli.main(["hal", "validate", hal]) == 0
