"""last-train-equivalent scoring estimation and .train file parity."""

import io

import numpy as np
import pytest

from cactus_tpu.config import Config
from cactus_tpu.io.fasta import Sequence
from cactus_tpu.ops.train import (TrainedScores, apply_scores,
                                  parse_train_file, train_scores,
                                  write_train_file)
from cactus_tpu.phases import blast
from cactus_tpu.testutil import evolver
from cactus_tpu.utils.trees import parse_newick


@pytest.fixture(scope="module")
def trained():
    tree = parse_newick("(a:0.05,b:0.05)r;")
    sim = evolver.simulate(tree, root_len=30_000, seed=9)
    qa = Sequence("a.c", sim.genomes["a"].codes)
    tb = Sequence("b.c", sim.genomes["b"].codes)
    cfg = Config.default().blast
    recs = blast.align_contig_pair(qa, tb, "a.c", "b.c", cfg)
    seqs = {"a.c": qa.codes, "b.c": tb.codes}
    return train_scores(recs, seqs)


def test_train_scores_shape(trained):
    ts = trained
    m = ts.matrix
    # diagonal (match) beats off-diagonal (mismatch)
    assert (np.diag(m) > m[~np.eye(4, dtype=bool)].max()).all()
    assert int(np.diag(m).max()) == 91
    # symmetric + revcomp-symmetric by construction
    assert np.array_equal(m, m.T)
    rc = {0: 3, 1: 2, 2: 1, 3: 0}
    for i in range(4):
        for j in range(4):
            assert m[i, j] == m[rc[i], rc[j]]
    assert ts.gap_open > ts.gap_extend > 0


def test_train_file_roundtrip(trained):
    buf = io.StringIO()
    write_train_file(buf, trained)
    buf.seek(0)
    ts = parse_train_file(buf)
    assert np.array_equal(ts.matrix, trained.matrix)
    assert ts.gap_open == trained.gap_open
    assert ts.gap_extend == trained.gap_extend


def test_parse_rejects_asymmetric():
    ts = TrainedScores(matrix=np.array(
        [[91, -50, -60, -70],
         [-51, 91, -70, -60],      # asymmetric
         [-60, -70, 91, -50],
         [-70, -60, -50, 91]], np.int64), gap_open=400, gap_extend=30)
    buf = io.StringIO()
    write_train_file(buf, ts)
    buf.seek(0)
    with pytest.raises(ValueError):
        parse_train_file(buf)


def test_apply_scores(trained):
    cfg = Config.default()
    out = apply_scores(cfg, trained)
    assert out.blast.extend.gap_open == trained.gap_open
    assert out.blast.extend.match == int(trained.matrix.diagonal().max())
    sub = np.array(out.bar.poa.sub_matrix).reshape(5, 5)
    assert np.array_equal(sub[:4, :4], trained.matrix)
    # original untouched
    assert cfg.blast.extend.gap_open == 400
