"""End-to-end QC env-var semantics (the reference's runtime self-validation)."""
import subprocess
import sys

import pytest

from genvcf import write_fasta
from vcf2prot_tpu.compiler.qc import QC_OFF, QcConfig, default_qc


REPO_ROOT = __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))
)


def run_cli_subprocess(args, env_extra, cwd):
    import os

    env = dict(os.environ)
    env.pop("NO_TEST", None)
    env.pop("RUN_SELECTED_TEST", None)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, "-m", "vcf2prot_tpu", *args],
        capture_output=True, text=True, env=env, cwd=cwd,
    )


@pytest.fixture
def overlap_cohort(tmp_path):
    # two overlapping insertions in one transcript: instruction-generation QC
    # flags them (result positions collide)
    ref = {"ENST00000000001": "M" + "A" * 80}
    muts = ",".join(
        [
            "inframe_insertion|G|ENST00000000001|protein_coding|+|10A>10ATTTTTTTT|1A>1T",
            "inframe_insertion|G|ENST00000000001|protein_coding|+|12A>12AGG|1A>1T",
        ]
    )
    vcf = tmp_path / "c.vcf"
    vcf.write_text(
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
        f"1\t1\tv\tA\tT\t9\tPASS\tBCSQ={muts}\tGT:BCSQ\t0|1:5\n"
    )
    fa = tmp_path / "r.fasta"
    write_fasta(str(fa), ref)
    out = tmp_path / "out"
    out.mkdir()
    return str(vcf), str(fa), str(out), tmp_path


def test_default_qc_panics_on_overlap(overlap_cohort):
    vcf, fa, out, cwd = overlap_cohort
    proc = run_cli_subprocess(["-f", vcf, "-r", fa, "-o", out, "-g", "st"], {}, cwd)
    assert proc.returncode != 0
    assert "overlap" in (proc.stderr + proc.stdout).lower()


def test_no_test_disables_qc(overlap_cohort):
    vcf, fa, out, cwd = overlap_cohort
    proc = run_cli_subprocess(
        ["-f", vcf, "-r", fa, "-o", out, "-g", "st"], {"NO_TEST": "1"}, cwd
    )
    assert proc.returncode == 0, proc.stderr


def test_selected_tests_without_panic_skips_transcript(overlap_cohort):
    vcf, fa, out, cwd = overlap_cohort
    proc = run_cli_subprocess(
        ["-f", vcf, "-r", fa, "-o", out, "-g", "st"],
        {"RUN_SELECTED_TEST": "1", "INSPECT_INS_GEN": "1"},
        cwd,
    )
    # QC on but PANIC off: the transcript is skipped, run completes
    assert proc.returncode == 0, proc.stderr


def test_debug_txp_traces(overlap_cohort):
    vcf, fa, out, cwd = overlap_cohort
    proc = run_cli_subprocess(
        ["-f", vcf, "-r", fa, "-o", out, "-g", "st"],
        {"NO_TEST": "1", "DEBUG_TXP": "ENST00000000001"},
        cwd,
    )
    # NO_TEST clears QC but DEBUG_TXP tracing survives it, like the
    # reference (cli.rs:272-334 never clears DEBUG_TXP)
    assert proc.returncode == 0
    assert "[DEBUG_TXP] ENST00000000001" in proc.stdout


def test_default_qc_resolution(monkeypatch):
    monkeypatch.delenv("NO_TEST", raising=False)
    monkeypatch.delenv("RUN_SELECTED_TEST", raising=False)
    qc = default_qc()
    assert qc.inspect_ins_gen and qc.inspect_txp and qc.panic_inspect_err
    monkeypatch.setenv("NO_TEST", "1")
    assert default_qc() == QC_OFF
    monkeypatch.delenv("NO_TEST")
    monkeypatch.setenv("RUN_SELECTED_TEST", "1")
    monkeypatch.setenv("INSPECT_TXP", "1")
    qc = default_qc()
    assert qc.inspect_txp and not qc.inspect_ins_gen and not qc.panic_inspect_err
