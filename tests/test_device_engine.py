"""Device-engine parity: the XLA gather executor must agree byte-for-byte with
the serial host oracle on randomized cohorts (run on the CPU backend here; the
same code path runs on TPU)."""
import numpy as np
import pytest

from genvcf import random_cohort
from vcf2prot_tpu.compiler.haplotype import RefBlob, compile_haplotype
from vcf2prot_tpu.compiler.qc import QcConfig
from vcf2prot_tpu.frontend.maps import group_muts_per_transcript
from vcf2prot_tpu.runtime.cpu_engine import execute_tasks
from vcf2prot_tpu.runtime.tpu_engine import TpuEngine

QC = QcConfig()


def build_programs(seed, n_samples=6, n_transcripts=10):
    ref, samples = random_cohort(seed, n_samples, n_transcripts)
    blob = RefBlob.from_ref_seqs(ref)
    programs = []
    for _name, (h1, h2) in samples.items():
        for csqs in (h1, h2):
            alt_transcripts = group_muts_per_transcript(csqs)
            programs.append(compile_haplotype(alt_transcripts, ref, blob, qc=QC))
    return ref, blob, programs


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_device_matches_oracle(seed):
    ref, blob, programs = build_programs(seed)
    engine = TpuEngine(blob)
    device_out = engine.execute(programs)
    assert len(device_out) == len(programs)
    for prog, dev in zip(programs, device_out):
        oracle = execute_tasks(prog, blob)
        np.testing.assert_array_equal(oracle, dev)


def test_empty_programs():
    ref, blob, programs = build_programs(7, n_samples=1)
    engine = TpuEngine(blob)
    from vcf2prot_tpu.compiler.haplotype import HaplotypeProgram

    outs = engine.execute([HaplotypeProgram()])
    assert len(outs) == 1 and outs[0].size == 0


def test_bucket_reuse_across_chunks():
    ref, blob, programs = build_programs(11)
    engine = TpuEngine(blob)
    engine.execute(programs[:3])
    n_compiled = len(engine._run_cache)
    engine.execute(programs[:3])
    assert len(engine._run_cache) == n_compiled
