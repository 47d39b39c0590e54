"""Array-backed Annotations sequence (compiler/haplotype.py) semantics."""
import numpy as np
import pytest

from vcf2prot_tpu.compiler.haplotype import Annotations


def make(names=("A", "B", "C")):
    return Annotations(
        list(names),
        np.array([2, 0, 1], np.int32),
        np.array([0, 10, 25], np.int64),
        np.array([10, 25, 40], np.int64),
    )


def test_sequence_protocol():
    ann = make()
    assert len(ann) == 3
    assert list(ann) == [("C", 0, 10), ("A", 10, 25), ("B", 25, 40)]
    assert ann[0] == ("C", 0, 10)
    assert ann[-1] == ("B", 25, 40)
    assert ann[1:] == [("A", 10, 25), ("B", 25, 40)]
    # tuple unpacking in a loop (the writer/downstream idiom)
    for name, start, end in ann:
        assert isinstance(name, str) and start < end


def test_equality_with_tuple_list_and_self():
    ann = make()
    tuples = [("C", 0, 10), ("A", 10, 25), ("B", 25, 40)]
    assert ann == tuples
    assert tuples == ann          # reflected through list.__eq__ fallback
    assert ann == make()
    assert ann != tuples[:-1]
    assert ann != [("C", 0, 10), ("A", 10, 25), ("B", 25, 41)]


def test_native_bridge_produces_array_annotations(tmp_path):
    import sys

    sys.path.insert(0, "tests")
    from genvcf import random_cohort, write_fasta, write_synthetic_vcf
    from vcf2prot_tpu.compiler.haplotype import RefBlob
    from vcf2prot_tpu.compiler.qc import default_qc
    from vcf2prot_tpu.native_bridge import compile_cohort_native

    ref, samples = random_cohort(seed=31, n_samples=2, n_transcripts=6)
    vcf = tmp_path / "c.vcf"
    write_synthetic_vcf(str(vcf), ref, samples)
    out = compile_cohort_native(
        str(vcf), ref, RefBlob.from_ref_seqs(ref), default_qc()
    )
    if out is None:
        pytest.skip("native module unavailable")
    _probands, programs, _warnings = out
    blobs = {id(p.annotations.names_blob) for p in programs}
    assert len(blobs) == 1, "name blob must be shared across the cohort"
    for p in programs:
        ann = p.annotations
        assert isinstance(ann, Annotations)
        assert ann.idx.dtype == np.int32
        assert ann.starts.dtype == np.int64
        # spans tile [0, res_len) contiguously in transcript order
        if len(ann):
            assert ann.starts[0] == 0
            np.testing.assert_array_equal(ann.starts[1:], ann.ends[:-1])
            assert int(ann.ends[-1]) == p.res_len
        # names resolve through the shared blob identically to .names
        off = ann.name_offsets
        for (name, _s, _e), i in zip(ann, ann.idx.tolist()):
            assert ann.names_blob[off[i]:off[i + 1]].decode() == name
