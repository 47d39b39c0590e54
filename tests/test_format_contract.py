"""Writer format contract vs the reference's bundled real-1000G outputs.

The reference checkout ships two genuine outputs of its binary on 1000G
samples: output_format/HG00096.fasta (2,411 records) and
benchmarking_results/HG00129.fasta. Their *inputs* are git-lfs blobs that are
not present, so full byte parity cannot be regenerated here (synthetic-input
byte parity is covered by test_reference_parity.py against the live binary);
what these files pin down is the output grammar on real data:

  * records are strictly ``>NAME_H`` header lines alternating with exactly
    one sequence line each (reference writer:
    src/data_structures/InternalRep/personalized_genome.rs:92-113);
  * ``H`` is the haplotype suffix 1 or 2, both occur;
  * a record's sequence line may be EMPTY (a whole-protein deletion still
    emits its header + empty line) -- 3 such records exist in HG00096;
  * sequences use only amino-acid letters (incl. U/X selenocysteine/unknown)
    with no wrapping and no trailing whitespace.

This build's writer (both the native formatter and the Python fallback) must
satisfy the same grammar, guarding against drift in the writer contract.
"""
import os
import re

import pytest

from genvcf import random_cohort, write_fasta, write_synthetic_vcf
from vcf2prot_tpu.cli import main

REF_GOLDEN = [
    "/root/reference/output_format/HG00096.fasta",
    "/root/reference/benchmarking_results/HG00129.fasta",
]

HDR = re.compile(r">(\S+)_([12])$")
SEQ = re.compile(r"[A-Z]*$")  # one line, possibly empty, uppercase letters


def check_grammar(text, min_records=1):
    lines = text.split("\n")
    assert lines[-1] == ""  # file ends with exactly one newline
    lines = lines[:-1]
    assert len(lines) % 2 == 0
    suffixes = set()
    empty_seqs = 0
    for i in range(0, len(lines), 2):
        m = HDR.fullmatch(lines[i])
        assert m, f"bad header line {i}: {lines[i]!r}"
        suffixes.add(m.group(2))
        assert SEQ.fullmatch(lines[i + 1]), f"bad seq line {i + 1}"
        if lines[i + 1] == "":
            empty_seqs += 1
    return len(lines) // 2, suffixes, empty_seqs


@pytest.mark.parametrize(
    "path", [p for p in REF_GOLDEN if os.path.exists(p)]
)
def test_reference_golden_outputs_obey_the_grammar(path):
    """Sanity-check the contract itself against the reference's real
    outputs before holding our writer to it."""
    n, suffixes, empty = check_grammar(open(path).read(), min_records=100)
    assert n > 100
    assert suffixes == {"1", "2"}
    if path.endswith("HG00096.fasta"):
        assert n == 2411
        assert empty == 3  # whole-protein deletions keep header + empty line


def _run(tmp_path, extra, sub):
    ref, samples = random_cohort(seed=31, n_samples=2, n_transcripts=8)
    vcf = tmp_path / f"c_{sub}.vcf"
    fa = tmp_path / f"r_{sub}.fasta"
    write_synthetic_vcf(str(vcf), ref, samples)
    write_fasta(str(fa), ref)
    out = tmp_path / sub
    out.mkdir()
    assert main(
        ["-f", str(vcf), "-r", str(fa), "-o", str(out), "-g", "st"] + extra
    ) == 0
    return [out / f"{name}.fasta" for name in samples]


def test_our_writer_obeys_the_golden_grammar(tmp_path):
    for path in _run(tmp_path, [], "native"):
        n, suffixes, _ = check_grammar(path.read_text())
        assert n > 0 and suffixes == {"1", "2"}


def test_python_fallback_writer_obeys_the_golden_grammar(tmp_path):
    for path in _run(tmp_path, ["--no-native"], "py"):
        n, suffixes, _ = check_grammar(path.read_text())
        assert n > 0 and suffixes == {"1", "2"}


def test_write_all_also_obeys_the_grammar(tmp_path):
    for path in _run(tmp_path, ["-a"], "all"):
        n, suffixes, _ = check_grammar(path.read_text())
        # -a emits every reference transcript for both haplotypes
        assert n == 16 and suffixes == {"1", "2"}


def test_empty_sequence_record_keeps_header_and_empty_line(tmp_path):
    """The HG00096 convention: a record whose personalized sequence is empty
    still writes its header followed by an empty line."""
    import numpy as np

    from vcf2prot_tpu.io.writers import PersonalizedProteome

    tape = np.frombuffer(b"MKV", np.uint8)
    empty = np.frombuffer(b"", np.uint8)
    p = PersonalizedProteome(
        "S", tape, [("ENST00000000001", 0, 3)], empty,
        [("ENST00000000001", 0, 0)],
    )
    path = p.write(str(tmp_path))
    text = open(path).read()
    assert text == ">ENST00000000001_1\nMKV\n>ENST00000000001_2\n\n"
    n, suffixes, empty_count = check_grammar(text)
    assert n == 2 and empty_count == 1
