"""End-to-end smoke across every supported preset: each one must
build an index and map an error-free read back to its origin (deeper
accuracy properties are covered per-preset in test_accuracy/test_hpc;
this catches preset-table regressions that only break at runtime)."""
import numpy as np
import pytest

import mappy_rs_tpu

PRESETS = [
    "map-ont", "map-pb", "ava-pb", "ava-ont", "map-hifi", "lr:hq",
    "sr", "asm5", "asm10", "asm20",
]


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    rng = np.random.default_rng(21)
    genome = "".join(rng.choice(list("ACGT"), size=60_000))
    fa = tmp_path_factory.mktemp("presets") / "g.fa"
    fa.write_text(f">chr\n{genome}\n")
    return str(fa), genome


@pytest.mark.parametrize("preset", PRESETS)
def test_preset_end_to_end(ref, preset):
    fa, genome = ref
    al = mappy_rs_tpu.Aligner(fa, preset=preset)
    length = 150 if preset == "sr" else 1200
    start = 30_000
    hits = al.map(genome[start : start + length])
    assert hits, f"{preset}: exact read failed to map"
    m = hits[0]
    assert m.target_name == "chr"
    assert abs(m.target_start - start) < 25
    assert m.strand == 1 and m.NM == 0


def test_splice_preset_constructs(ref):
    # splice presets are supported since round 2 (tests/test_splice.py
    # covers spliced mapping end-to-end); unknown presets still refuse
    al = mappy_rs_tpu.Aligner(ref[0], preset="splice")
    assert al.k == 15 and al.w == 5
    with pytest.raises(ValueError):
        mappy_rs_tpu.Aligner(ref[0], preset="no-such-preset")
