"""Three-way fuzz parity: Python tier vs C++ tier vs the reference binary on
adversarial cohorts (tight gaps, compound terminals, phi-dropped downstream
mutations, erased transcripts, skipped transcripts)."""
import os
import subprocess

import numpy as np
import pytest

from genvcf import read_fasta_records, adversarial_cohort, write_fasta, write_synthetic_vcf
from vcf2prot_tpu.compiler.qc import QC_OFF
from vcf2prot_tpu.pipeline import PipelineConfig, run_pipeline
from vcf2prot_tpu.runtime.engine import Engine

REF_BIN = "/root/reference/bins/Linux/vcf2prot"
HAS_REF = os.access(REF_BIN, os.X_OK)




@pytest.mark.parametrize("seed", list(range(8)))
def test_fuzz_three_way(seed, tmp_path):
    ref, samples = adversarial_cohort(seed, n_samples=5, n_transcripts=10)
    vcf = tmp_path / "c.vcf"
    fasta = tmp_path / "r.fasta"
    write_synthetic_vcf(str(vcf), ref, samples)
    write_fasta(str(fasta), ref)

    outs = {}
    for tier, native in (("py", False), ("cpp", True)):
        out = tmp_path / tier
        out.mkdir()
        run_pipeline(
            PipelineConfig(
                vcf_path=str(vcf), fasta_path=str(fasta), outdir=str(out),
                engine=Engine.ST, use_native=native, qc=QC_OFF,
            )
        )
        outs[tier] = {
            f: read_fasta_records(out / f) for f in sorted(os.listdir(out))
        }
    assert outs["py"] == outs["cpp"], "python and native tiers disagree"

    if HAS_REF:
        ref_out = tmp_path / "refbin"
        ref_out.mkdir()
        proc = subprocess.run(
            [REF_BIN, "-f", str(vcf), "-r", str(fasta), "-o", str(ref_out),
             "-g", "mt"],
            env=dict(os.environ, NO_TEST="1"),
            capture_output=True,
        )
        if proc.returncode != 0:
            pytest.skip(f"reference binary aborted on this cohort: "
                        f"{proc.stderr[-200:]}")
        ref_recs = {
            f: read_fasta_records(ref_out / f)
            for f in sorted(os.listdir(ref_out))
        }
        assert set(ref_recs) == set(outs["py"])
        for f in ref_recs:
            assert set(ref_recs[f]) == set(outs["py"][f]), (
                f"{f}: record sets differ"
            )
            for k in ref_recs[f]:
                assert ref_recs[f][k] == outs["py"][f][k], (
                    f"{f}:{k}: sequence mismatch"
                )
