"""Thread-count invariance: outputs must be byte-identical regardless of
host thread counts (native decode/compile are chunked + merged in order)."""
import os

from genvcf import random_cohort, write_fasta, write_synthetic_vcf
from vcf2prot_tpu.pipeline import PipelineConfig, run_pipeline
from vcf2prot_tpu.runtime.engine import Engine


def test_thread_count_invariance(tmp_path):
    ref, samples = random_cohort(seed=55, n_samples=6, n_transcripts=12)
    vcf = tmp_path / "c.vcf"
    fa = tmp_path / "r.fasta"
    write_synthetic_vcf(str(vcf), ref, samples)
    write_fasta(str(fa), ref)
    outputs = {}
    for threads in (1, 2, 4):
        out = tmp_path / f"t{threads}"
        out.mkdir()
        run_pipeline(
            PipelineConfig(
                vcf_path=str(vcf), fasta_path=str(fa), outdir=str(out),
                engine=Engine.MT, num_threads=threads,
            )
        )
        outputs[threads] = {
            f: (out / f).read_bytes() for f in sorted(os.listdir(out))
        }
    assert outputs[1] == outputs[2] == outputs[4]


def test_repeated_runs_identical(tmp_path):
    ref, samples = random_cohort(seed=56, n_samples=3, n_transcripts=8)
    vcf = tmp_path / "c.vcf"
    fa = tmp_path / "r.fasta"
    write_synthetic_vcf(str(vcf), ref, samples)
    write_fasta(str(fa), ref)
    runs = []
    for i in range(2):
        out = tmp_path / f"r{i}"
        out.mkdir()
        run_pipeline(
            PipelineConfig(
                vcf_path=str(vcf), fasta_path=str(fa), outdir=str(out),
                engine=Engine.MT,
            )
        )
        runs.append({f: (out / f).read_bytes() for f in sorted(os.listdir(out))})
    assert runs[0] == runs[1]
