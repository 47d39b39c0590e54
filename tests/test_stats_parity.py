"""Stats-engine parity against the reference binary's -s output (semantic
comparison: the reference's row order is HashMap-nondeterministic)."""
import os
import subprocess

import pytest

from genvcf import random_cohort, write_fasta, write_synthetic_vcf
from vcf2prot_tpu.pipeline import PipelineConfig, run_pipeline
from vcf2prot_tpu.runtime.engine import Engine

REF_BIN = "/root/reference/bins/Linux/vcf2prot"

pytestmark = pytest.mark.skipif(
    not os.access(REF_BIN, os.X_OK), reason="reference binary not available"
)


def parse_kv_tsv(path):
    out = {}
    with open(path) as fh:
        next(fh)  # header
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            key, value = line.split("\t")
            out[key.rstrip(",")] = int(value)
    return out


def parse_type_tsv(path):
    text = open(path).read()
    # format: "Proband Name\t<22 types>\t" then rows "<name>\t<22 counts>\t"
    cells = text.split("\t")
    # first cell is the header label; next 22 are type names; then repeating
    # [name, c1..c22]
    types = cells[1:23]
    rest = [c for c in cells[23:] if c != ""]
    out = {}
    i = 0
    while i + 22 < len(rest) + 1 and i < len(rest):
        name = rest[i].lstrip("\n")
        counts = [int(x) for x in rest[i + 1: i + 23]]
        out[name] = counts
        i += 23
    return types, out


def test_stats_match_reference(tmp_path):
    ref, samples = random_cohort(seed=77, n_samples=5, n_transcripts=10)
    vcf = tmp_path / "c.vcf"
    fasta = tmp_path / "r.fasta"
    write_synthetic_vcf(str(vcf), ref, samples)
    write_fasta(str(fasta), ref)
    ref_out = tmp_path / "ref_out"
    our_out = tmp_path / "our_out"
    ref_out.mkdir()
    our_out.mkdir()
    subprocess.run(
        [REF_BIN, "-f", str(vcf), "-r", str(fasta), "-o", str(ref_out),
         "-g", "mt", "-s"],
        check=True,
        env=dict(os.environ, NO_TEST="1"),
        capture_output=True,
    )
    run_pipeline(
        PipelineConfig(
            vcf_path=str(vcf),
            fasta_path=str(fasta),
            outdir=str(our_out),
            engine=Engine.ST,
            compute_stats=True,
        )
    )
    a = parse_kv_tsv(ref_out / "number_of_mutations_per_proband.tsv")
    b = parse_kv_tsv(our_out / "number_of_mutations_per_proband.tsv")
    assert a == b
    a = parse_kv_tsv(ref_out / "number_of_mutations_per_transcript.tsv")
    b = parse_kv_tsv(our_out / "number_of_mutations_per_transcript.tsv")
    assert a == b
    ta, ra = parse_type_tsv(ref_out / "type_of_mutations_per_patient.tsv")
    tb, rb = parse_type_tsv(our_out / "type_of_mutations_per_patient.tsv")
    assert ta == tb
    assert ra == rb
