"""HAL export: c2h round-trip, stats, hierarchy MAF accuracy."""

import io

import numpy as np
import pytest

from cactus_tpu.io.fasta import Sequence
from cactus_tpu.phases import hal
from cactus_tpu import progressive
from cactus_tpu.testutil import evolver
from cactus_tpu.testutil.comparator import maf_pairs, score_pairs
from cactus_tpu.utils.trees import parse_newick


@pytest.fixture(scope="module")
def mammal_result():
    tree = parse_newick(
        "((a:0.05,b:0.05)ab:0.05,(c:0.05,d:0.05)cd:0.05)root;")
    sim = evolver.simulate(tree, root_len=8_000, seed=31)
    leaves = ["a", "b", "c", "d"]
    genomes = {ev: {f"{ev}.c": Sequence(f"{ev}.c", sim.genomes[ev].codes)}
               for ev in leaves}
    result = progressive.ProgressiveAligner(
        tree, genomes, min_chain_override=64).run()
    return sim, result


def test_c2h_roundtrip(mammal_result):
    _sim, result = mammal_result
    step = result.steps["ab"]
    buf = io.StringIO()
    hal.write_c2h(step, buf)
    buf.seek(0)
    seqs = hal.read_c2h(buf)
    bottoms = [s for s in seqs if s.is_bottom]
    tops = [s for s in seqs if not s.is_bottom]
    assert bottoms and tops
    # bottom segments tile each ancestor sequence exactly
    for bs in bottoms:
        total = len(result.genomes["ab"][bs.header])
        pos = 0
        for _name, start, ln in bs.segments:
            assert start == pos
            pos += ln
        assert pos == total
    # top segments tile each child sequence; aligned ones name live blocks
    block_names = {name for bs in bottoms
                   for name, _s, _l in bs.segments}
    for ts in tops:
        total = None
        pos = 0
        for seg in ts.segments:
            assert seg[0] == pos
            pos += seg[1]
            if len(seg) == 4:
                assert seg[2] in block_names
                assert seg[3] in (0, 1)
        caf_names = step.caf.table.names
        total = int(step.caf.table.lengths[caf_names.index(ts.header)])
        assert pos == total


def test_write_result_c2h(tmp_path, mammal_result):
    _sim, result = mammal_result
    paths = hal.write_result_c2h(result, str(tmp_path))
    assert set(paths) == {"ab", "cd", "root"}
    for p in paths.values():
        assert len(hal.read_c2h(p)) > 0


def test_hal_stats(mammal_result):
    _sim, result = mammal_result
    rows = hal_rows = hal.hal_stats(result)
    by = {r["genome"]: r for r in rows}
    assert set(by) == {"a", "b", "c", "d", "ab", "cd", "root"}
    assert by["root"]["n_bottom_segments"] > 0
    assert by["a"]["n_top_segments"] > 0
    assert by["a"]["length"] > 6000
    # ancestors have both top (except root) and bottom segments
    assert by["ab"]["n_top_segments"] > 0
    assert by["ab"]["n_bottom_segments"] > 0


def test_hal2maf_accuracy(mammal_result):
    sim, result = mammal_result
    blocks = hal.hal2maf(result, "root")
    assert blocks
    # ancestor row leads each block
    assert blocks[0].rows[0].src.startswith("root.")
    # score leaf pairs straight from the MAF (cross-subtree a vs c)
    for x, y in [("a", "c"), ("a", "b")]:
        truth = {(p, q, s) for p, q, s in sim.truth_pairs(x, y)}
        pred = maf_pairs(blocks, x, y)
        s = score_pairs(truth, pred)
        assert s.recall > 0.75, (x, y, s)
        assert s.precision > 0.85, (x, y, s)


def test_hal2maf_subtree_reference(mammal_result):
    """Referencing a lower ancestor restricts rows to its subtree."""
    _sim, result = mammal_result
    blocks = hal.hal2maf(result, "ab")
    srcs = {r.src.split(".", 1)[0] for b in blocks for r in b.rows}
    assert srcs <= {"ab", "a", "b"}


def test_hal_validate_clean(mammal_result):
    """A pipeline result passes the halValidate-equivalent checks."""
    _sim, result = mammal_result
    errs = hal.hal_validate(result)
    assert errs == [], errs


def test_hal_validate_catches_corruption(mammal_result):
    """Deliberate corruption is reported (bounds, overlap, maps)."""
    import copy
    _sim, result = mammal_result
    bad = copy.deepcopy(result)
    step = bad.steps["ab"]
    # push one segment past its sequence end
    step.caf.blocks.seg_start[0] = int(
        step.caf.table.lengths[step.caf.blocks.seg_seq[0]])
    errs = hal.hal_validate(bad)
    assert any("out of bounds" in e for e in errs), errs

    bad2 = copy.deepcopy(result)
    step2 = bad2.steps["ab"]
    m = next(iter(step2.maps.values()))
    sel = np.flatnonzero(m.tgt_idx >= 0)
    if len(sel):
        # any position past the ancestor length is out of bounds
        # (int32-safe: maps narrowed to int32 positions)
        m.tgt_pos[sel[0]] = (1 << 31) - 1
        errs2 = hal.hal_validate(bad2)
        assert any("out of bounds" in e for e in errs2), errs2


def test_hal2maf_subrange_equivalence(mammal_result):
    """Subrange extraction == trimming the whole-genome MAF to the range
    (the reference's hal2maf subrange oracle,
    test/evolverTest.py:1271-1310)."""
    _sim, result = mammal_result
    full = hal.hal2maf(result)
    # pick a reference thread with several blocks
    from collections import Counter
    counts = Counter(b.rows[0].src for b in full)
    seq, _n = counts.most_common(1)[0]
    seq_blocks = [b for b in full if b.rows[0].src == seq]
    lo = min(b.rows[0].start for b in seq_blocks)
    hi = max(b.rows[0].start + b.rows[0].size for b in seq_blocks)
    start = lo + (hi - lo) // 4
    end = hi - (hi - lo) // 4
    sub = hal.hal2maf(result, ref_seq=seq, ref_start=start, ref_end=end)
    assert sub, "subrange produced no blocks"
    # expected: trim the full blocks to the subrange
    expect = []
    for b in seq_blocks:
        r0 = b.rows[0]
        if r0.start >= end or r0.start + r0.size <= start:
            continue
        t = hal.maf_block_trim(b, max(0, start - r0.start),
                               min(len(r0.text), end - r0.start))
        if t is not None:
            expect.append(t)
    assert len(sub) == len(expect)
    for x, y in zip(sub, expect):
        assert [r.to_line() for r in x.rows] == [r.to_line() for r in y.rows]
    # every reference row inside the range
    for b in sub:
        r0 = b.rows[0]
        assert r0.start >= start and r0.start + r0.size <= end


def test_hal2maf_chunked_equivalent(mammal_result):
    """Chunk-parallel export == single-pass export (pair sets)."""
    import numpy as np
    from cactus_tpu.phases.hal import hal2maf
    from cactus_tpu.phases.maf_export import hal2maf_chunked
    from cactus_tpu.testutil.comparator import maf_pairs_arr
    _sim, result = mammal_result
    whole = hal2maf(result, "root")
    chunked = hal2maf_chunked(result, "root", chunk_size=1500, workers=3)
    for x, y in [("a", "b"), ("root", "a")]:
        pw = np.sort(maf_pairs_arr(whole, x, y))
        pc = np.sort(maf_pairs_arr(chunked, x, y))
        assert np.array_equal(pw, pc), (x, y)
