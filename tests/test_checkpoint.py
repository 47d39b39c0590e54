"""Checkpoint/resume: dump int_maps, resume from them, identical FASTAs."""
import os

from genvcf import random_cohort, write_fasta, write_synthetic_vcf
from vcf2prot_tpu.pipeline import PipelineConfig, run_pipeline
from vcf2prot_tpu.runtime.engine import Engine


def test_resume_from_int_maps(tmp_path):
    ref, samples = random_cohort(seed=3, n_samples=4, n_transcripts=8)
    vcf = tmp_path / "c.vcf"
    fasta = tmp_path / "r.fasta"
    write_synthetic_vcf(str(vcf), ref, samples)
    write_fasta(str(fasta), ref)

    full_out = tmp_path / "full"
    full_out.mkdir()
    run_pipeline(
        PipelineConfig(
            vcf_path=str(vcf),
            fasta_path=str(fasta),
            outdir=str(full_out),
            engine=Engine.ST,
            write_int_map=True,
        )
    )
    assert (full_out / "int_maps").is_dir()

    resumed_out = tmp_path / "resumed"
    resumed_out.mkdir()
    run_pipeline(
        PipelineConfig(
            vcf_path="",
            fasta_path=str(fasta),
            outdir=str(resumed_out),
            engine=Engine.ST,
            resume_int_maps=str(full_out / "int_maps"),
        )
    )
    fastas = sorted(f for f in os.listdir(full_out) if f.endswith(".fasta"))
    assert fastas == sorted(os.listdir(resumed_out))
    for f in fastas:
        assert (full_out / f).read_bytes() == (resumed_out / f).read_bytes()


def test_cli_resume(tmp_path):
    from vcf2prot_tpu.cli import main

    ref, samples = random_cohort(seed=9, n_samples=2, n_transcripts=6)
    vcf = tmp_path / "c.vcf"
    fasta = tmp_path / "r.fasta"
    write_synthetic_vcf(str(vcf), ref, samples)
    write_fasta(str(fasta), ref)
    out1 = tmp_path / "o1"
    out1.mkdir()
    assert main(["-f", str(vcf), "-r", str(fasta), "-o", str(out1), "-g", "st", "-i"]) == 0
    out2 = tmp_path / "o2"
    out2.mkdir()
    rc = main(
        [
            "-r", str(fasta), "-o", str(out2), "-g", "st",
            "--resume_int_maps", str(out1 / "int_maps"),
        ]
    )
    assert rc == 0
    assert sorted(f for f in os.listdir(out1) if f.endswith(".fasta")) == sorted(
        os.listdir(out2)
    )
