"""Preprocessor variants: sampled masking, tandem masking, satellites."""

import numpy as np
import pytest

from cactus_tpu.config import Config
from cactus_tpu.io.fasta import Sequence
from cactus_tpu.preprocessor import variants as pv


def _rand(n, seed=0):
    return np.random.default_rng(seed).integers(0, 4, n).astype(np.uint8)


def test_prev_kmer_distance_tandem():
    unit = _rand(50, seed=1)
    codes = np.concatenate([_rand(200, seed=2), np.tile(unit, 6),
                            _rand(200, seed=3)])
    dist = pv.prev_kmer_distance(codes, k=12)
    inside = dist[250:490]
    assert np.median(inside[inside < 1 << 61]) == 50


def test_prev_kmer_distance_handles_n():
    codes = np.full(100, 4, np.uint8)    # all N
    dist = pv.prev_kmer_distance(codes, k=12)
    assert (dist > 1 << 61).all()


def test_tandem_mask_hits_array_only():
    unit = _rand(40, seed=5)
    left, right = _rand(500, seed=6), _rand(500, seed=7)
    codes = np.concatenate([left, np.tile(unit, 5), right])
    m = pv.tandem_mask(codes, k=12, max_period=500)
    # array interior masked (all copies incl. the first)
    assert m[500:700].mean() > 0.9
    # flanks mostly untouched
    assert m[:450].mean() < 0.05 and m[-450:].mean() < 0.05


def test_satellite_bed_alpha_and_hsat():
    alpha_unit = _rand(171, seed=11)
    hsat = np.tile(_rand(5, seed=12), 150)        # 750bp period-5
    codes = np.concatenate([_rand(800, seed=13), np.tile(alpha_unit, 8),
                            _rand(700, seed=14), hsat,
                            _rand(600, seed=15)])
    genome = {"g.c": Sequence("g.c", codes)}
    bed = pv.satellite_bed(genome)
    labels = {row[3] for row in bed}
    assert "alphoid" in labels, bed
    assert "hsat" in labels, bed
    for name, a, b, label in bed:
        if label == "alphoid":
            assert 700 <= a <= 900 and 2100 <= b <= 2300, (a, b)


def test_apply_bed_actions():
    codes = _rand(1000, seed=21)
    genome = {"g.c": Sequence("g.c", codes)}
    bed = [("g.c", 200, 400, "alphoid")]
    soft = pv.apply_bed(genome, bed, "softmask")
    assert soft["g.c"].mask[200:400].all()
    assert not soft["g.c"].mask[:200].any()
    hard = pv.apply_bed(genome, bed, "hardmask")
    assert (hard["g.c"].codes[200:400] == 4).all()
    clip = pv.apply_bed(genome, bed, "clip")
    assert set(clip) == {"g.c:0-200", "g.c:400-1000"}
    assert len(clip["g.c:0-200"]) == 200
    assert np.array_equal(clip["g.c:400-1000"].codes, codes[400:])
    with pytest.raises(ValueError):
        pv.apply_bed(genome, bed, "bogus")


def test_lastz_repeat_mask_marks_repeats():
    rep = _rand(300, seed=31)
    parts = [_rand(400, seed=32)]
    for i in range(6):                     # 6 copies scattered
        parts += [rep, _rand(300, seed=40 + i)]
    codes = np.concatenate(parts)
    genome = {"g.c": Sequence("g.c", codes)}
    cfg = Config.default().blast
    out = pv.lastz_repeat_mask(genome, cfg, proportion=1.0, period=3,
                               sample_chunk=2_000)
    m = out["g.c"].mask
    # repeat copies get masked, unique flanks mostly don't
    rep_cov = [m[s:s + 300].mean()
               for s in range(400, len(codes) - 300, 600)][:6]
    assert np.mean(rep_cov) > 0.5, rep_cov
    assert m[:350].mean() < 0.5


def test_preprocess_chunked_equivalent():
    unit = _rand(30, seed=51)
    codes = np.concatenate([_rand(4000, seed=52), np.tile(unit, 10),
                            _rand(4000, seed=53)])
    genome = {"g.c": Sequence("g.c", codes)}

    def masker(g):
        return pv.tandem_mask_genome(g, k=12, max_period=100)

    whole = masker(genome)["g.c"].mask
    chunked = pv.preprocess_chunked(genome, masker, chunk_size=3_000,
                                    overlap=500)["g.c"].mask
    # chunked never misses what the whole-contig pass finds
    assert (chunked[whole].mean() if whole.any() else 1.0) > 0.95
    assert whole[4000:4300].mean() > 0.9
