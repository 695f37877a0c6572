"""mappy_rs_tpu — a TPU-native minimap2-class aligner.

A from-scratch re-design of the capabilities of mappy-rs (a
multi-threaded minimap2 binding for Python) with the entire alignment
engine — minimizer sketching, index lookup, seed chaining, banded
affine-gap extension — implemented as JAX/XLA/Pallas compute on TPU
instead of FFI calls into the minimap2 C core.

Public surface (drop-in for `mappy_rs`, which is itself a drop-in for
`mappy` plus batch streaming):

    from mappy_rs_tpu import Aligner
    al = Aligner("ref.mmi")                # or FASTA, or preset=...
    hits = al.map("ACGT...")               # blocking single read
    al.enable_threading(4)
    for mappings, data in al.map_batch(iterable_of_dicts):
        ...

The reference module exports only ``Aligner`` (src/lib.rs:994-999);
``Mapping``/``Strand``/``AlignmentBatchResultIter`` are reachable as
return values.  All four are importable here.
"""
from .api import Aligner, Mapping, Strand
from .runtime.batch import AlignmentBatchResultIter

__version__ = "0.1.0"
__all__ = ["Aligner", "Mapping", "Strand", "AlignmentBatchResultIter"]
