"""Packed IPC block parity: pack_regions_block -> unpack_mappings_block
must reproduce api.regions_to_mappings field-for-field (the multi-
process runtime's results must stay bit-identical to in-process)."""
import numpy as np

from mappy_rs_tpu.api import regions_to_mappings
from mappy_rs_tpu.ops.cigar import pack_ops
from mappy_rs_tpu.ops.regions import Region
from mappy_rs_tpu.runtime.pack import (
    pack_regions_block,
    unpack_mappings_block,
)

NAMES = ["chr1", "chr2"]
LENS = np.array([1_000_000, 2_000_000], np.int64)


def _mk_region(i, *, rev=0, rid=0, primary=True, cig_list=False,
               cs=None, md=None, trans_strand=0):
    r = Region(
        rev=rev, rid=rid, qs=10 * i, qe=10 * i + 500,
        rs=1000 * i, re=1000 * i + 480, score=100 + i, cnt=20,
        anchors_qpos=np.empty(0, np.int32),
        anchors_rpos=np.empty(0, np.int32),
    )
    r.id = i
    r.parent = i if primary else 0
    r.mlen, r.blen, r.nm, r.mapq = 450 + i, 500, 17, 60 - i
    ops = [(100 + i, 0), (3, 1), (397, 0)]
    r.cigar = ops if cig_list else pack_ops(ops)
    r.cs = cs
    r.md = md
    r.trans_strand = trans_strand
    return r


def _assert_same(a, b):
    assert len(a) == len(b)
    for ma, mb in zip(a, b):
        for attr in (
            "query_start", "query_end", "strand", "target_name",
            "target_len", "target_start", "target_end", "match_len",
            "block_len", "mapq", "is_primary", "NM", "MD", "cs",
            "trans_strand", "cigar", "cigar_str",
        ):
            assert getattr(ma, attr) == getattr(mb, attr), attr


def test_roundtrip_matches_regions_to_mappings():
    regs_lists = [
        [
            _mk_region(0, cs=":450*ac:49", md="450A49"),
            _mk_region(1, rev=1, rid=1, primary=False, cig_list=True),
        ],
        [],
        [_mk_region(2, cs=None, md=None, trans_strand=-1)],
        [_mk_region(3, cs="", md="")],  # empty-string tags != None
    ]
    for no_2nd in (False, True):
        want = [
            regions_to_mappings(regs, NAMES, LENS, no_2nd)
            for regs in regs_lists
        ]
        block = pack_regions_block(regs_lists, no_2nd)
        got = unpack_mappings_block(block, NAMES, LENS)
        for w, g in zip(want, got):
            _assert_same(w, g)


def test_packed_sink_parity():
    """map_batch_packed (direct-to-wire PackedSink: no Region objects
    on the fast path) must produce the EXACT block pack_regions_block
    builds from the Region path — including zdrop-split fallback reads
    (python path merge) and anchor-overflow retries (rowset
    overwrite)."""
    import pytest

    from mappy_rs_tpu import Aligner, native

    if not native.available():
        pytest.skip("native lib required")
    rng = np.random.default_rng(11)
    seg = "".join(rng.choice(list("ACGT"), size=600))
    genome = (
        "".join(rng.choice(list("ACGT"), size=150_000))
        + seg * 40  # high-occurrence repeat: anchor-overflow retry
        + "".join(rng.choice(list("ACGT"), size=150_000))
    )
    from bench import simulate

    reads, _ = simulate(rng, genome, 60, 1000, 0.05)
    garbage = "".join(rng.choice(list("ACGT"), size=500))
    # zdrop-split chimera -> fused-path fallback -> python merge
    reads.append(genome[2000:2600] + garbage + genome[3100:3700])
    comp = str.maketrans("ACGT", "TGCA")
    reads.append(genome[5000:6000].translate(comp)[::-1])
    reads.append(seg + seg)  # overflow read
    for fe in ("cpu", "device"):
        al = Aligner(seq=genome, preset="map-ont")
        al._engine.cfg.front_end_backend = fe
        eng = al._engine
        for no_2nd in (False, True):
            regs = eng.map_batch(reads, cs=True, md=True)
            want = pack_regions_block(regs, no_2nd)
            got = eng.map_batch_packed(
                reads, cs=True, md=True, no_2nd=no_2nd
            )
            for a, b, nm in zip(want, got,
                                ("counts", "F", "cig", "cs", "md")):
                if isinstance(a, bytes):
                    assert a == bytes(b), (fe, no_2nd, nm)
                else:
                    assert np.array_equal(a, b), (fe, no_2nd, nm)
            # and the unpacked Mappings match the Region-path oracle
    assert eng.metrics.snapshot().get("anchor_overflow_retries", 0) > 0


def test_block_pickles_flat():
    """The block must pickle as a handful of buffers (the design
    point: no per-Mapping object trees on the pipe)."""
    import pickle

    regs_lists = [[_mk_region(i, cs=":500")] for i in range(64)]
    block = pack_regions_block(regs_lists, False)
    got = unpack_mappings_block(
        pickle.loads(pickle.dumps(block)), NAMES, LENS
    )
    want = [regions_to_mappings(r, NAMES, LENS, False)
            for r in regs_lists]
    for w, g in zip(want, got):
        _assert_same(w, g)
