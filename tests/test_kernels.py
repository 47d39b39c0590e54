"""Pallas device-side task-program validator (interpreter mode on CPU)."""
import numpy as np
import pytest

from genvcf import random_cohort
from vcf2prot_tpu.compiler.haplotype import RefBlob, compile_haplotype
from vcf2prot_tpu.compiler.qc import QcConfig
from vcf2prot_tpu.frontend.maps import group_muts_per_transcript
from vcf2prot_tpu.runtime.kernels import validate_on_device
from vcf2prot_tpu.runtime.pack import pack_cohort


def packed_cohort(seed=2):
    ref, samples = random_cohort(seed, 4, 8)
    blob = RefBlob.from_ref_seqs(ref)
    programs = []
    for _n, (h1, h2) in samples.items():
        for csqs in (h1, h2):
            programs.append(
                compile_haplotype(
                    group_muts_per_transcript(csqs), ref, blob, qc=QcConfig()
                )
            )
    return blob, pack_cohort(programs, blob)


def test_valid_program_passes():
    blob, packed = packed_cohort()
    lengths = np.diff(np.append(packed.dst, packed.total_res))
    errors = validate_on_device(
        packed.dst, lengths.astype(np.int32), packed.src_biased,
        combined_len=len(blob.data) + len(packed.alt),
        res_len=packed.total_res,
        interpret=True,
    )
    assert errors == 0


def test_corrupted_dst_detected():
    blob, packed = packed_cohort()
    lengths = np.diff(np.append(packed.dst, packed.total_res)).astype(np.int32)
    dst = packed.dst.copy()
    dst[len(dst) // 2] += 3  # break contiguity
    errors = validate_on_device(
        dst, lengths, packed.src_biased,
        combined_len=len(blob.data) + len(packed.alt),
        res_len=packed.total_res,
        interpret=True,
    )
    assert errors > 0


def test_out_of_bounds_source_detected():
    blob, packed = packed_cohort()
    lengths = np.diff(np.append(packed.dst, packed.total_res)).astype(np.int32)
    srcb = packed.src_biased.copy()
    srcb[0] = len(blob.data) + len(packed.alt) + 100
    errors = validate_on_device(
        packed.dst, lengths, srcb,
        combined_len=len(blob.data) + len(packed.alt),
        res_len=packed.total_res,
        interpret=True,
    )
    assert errors > 0
