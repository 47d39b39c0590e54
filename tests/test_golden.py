"""Golden-file regression: committed reference-binary outputs for a fixed
cohort; runs without the reference binary present."""
import gzip
import json
import os

from genvcf import read_fasta_records
from vcf2prot_tpu.pipeline import PipelineConfig, run_pipeline
from vcf2prot_tpu.runtime.engine import Engine

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")




def test_golden_outputs(tmp_path):
    with gzip.open(os.path.join(GOLDEN_DIR, "golden_outputs.json.gz"), "rt") as fh:
        golden = json.load(fh)
    out = tmp_path / "out"
    out.mkdir()
    run_pipeline(
        PipelineConfig(
            vcf_path=os.path.join(GOLDEN_DIR, "cohort.vcf"),
            fasta_path=os.path.join(GOLDEN_DIR, "proteome.fasta"),
            outdir=str(out),
            engine=Engine.MT,
        )
    )
    assert sorted(os.listdir(out)) == sorted(golden)
    for f, want in golden.items():
        got = read_fasta_records(out / f)
        assert set(got) == set(want), f"{f}: header sets differ"
        for k in want:
            assert got[k] == want[k], f"{f}:{k}: sequence differs from golden"
