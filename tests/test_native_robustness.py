"""Native-module robustness: malformed, truncated, and hostile inputs must
raise clean errors (or be skipped) -- never crash the interpreter."""
import random

import pytest

from vcf2prot_tpu.compiler.haplotype import RefBlob
from vcf2prot_tpu.compiler.qc import QC_OFF, QcConfig
from vcf2prot_tpu.native_bridge import compile_cohort_native, load_native

pytestmark = pytest.mark.skipif(
    load_native() is None, reason="native module unavailable"
)

REF = {"ENST00000000001": "M" + "ACDEFGHIKLMNPQRSTVWY" * 4}
BLOB = RefBlob.from_ref_seqs(REF)

HEADER = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1"


def run_native(tmp_path, body_lines, qc=QC_OFF):
    vcf = tmp_path / "x.vcf"
    vcf.write_text("\n".join([HEADER, *body_lines]) + "\n")
    return compile_cohort_native(str(vcf), REF, BLOB, qc)


def test_bitmask_index_out_of_range(tmp_path):
    # mask selects entry 3 but only one consequence is present
    line = (
        "1\t1\tv\tA\tT\t9\tPASS\t"
        "BCSQ=missense|G|ENST00000000001|protein_coding|+|5C>5K|1A>1T"
        "\tGT:BCSQ\t0|1:64"
    )
    with pytest.raises(RuntimeError, match="out of range"):
        run_native(tmp_path, [line])


def test_negative_mask_aborts(tmp_path):
    line = (
        "1\t1\tv\tA\tT\t9\tPASS\t"
        "BCSQ=missense|G|ENST00000000001|protein_coding|+|5C>5K|1A>1T"
        "\tGT:BCSQ\t0|1:-5"
    )
    with pytest.raises(RuntimeError, match="invalid bit mask"):
        run_native(tmp_path, [line])


def test_truncated_record_lines(tmp_path):
    lines = [
        "1\t1",                       # too few fields
        "1\t1\tv\tA\tT\t9\tPASS",    # no INFO column
        "",                           # blank
        (
            "1\t2\tv\tA\tT\t9\tPASS\t"
            "BCSQ=missense|G|ENST00000000001|protein_coding|+|5C>5K|1A>1T"
            "\tGT:BCSQ\t0|1:1"
        ),
    ]
    probands, programs, _w = run_native(tmp_path, lines)
    assert probands == ["S1"]
    assert programs[0].res_len > 0


def test_random_garbage_lines(tmp_path):
    rng = random.Random(0)
    printable = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "0123456789|,;:>*&\t."
    )
    good = (
        "1\t2\tv\tA\tT\t9\tPASS\t"
        "BCSQ=missense|G|ENST00000000001|protein_coding|+|5C>5K|1A>1T"
        "\tGT:BCSQ\t0|1:1"
    )
    for trial in range(30):
        garbage = [
            "".join(rng.choice(printable) for _ in range(rng.randint(1, 200)))
            for _ in range(5)
        ]
        try:
            probands, programs, _w = run_native(
                tmp_path, garbage + [good], qc=QC_OFF
            )
            assert probands == ["S1"]
        except RuntimeError:
            pass  # clean error is acceptable; a crash is not


def test_huge_positions_dropped(tmp_path):
    # position overflows u16: mutation silently dropped, transcript skipped
    line = (
        "1\t1\tv\tA\tT\t9\tPASS\t"
        "BCSQ=missense|G|ENST00000000001|protein_coding|+|99999999C>99999999K|1A>1T"
        "\tGT:BCSQ\t0|1:1"
    )
    # the record is supported (6 pipes, known type) but the mutation is
    # dropped at parse time (u16 overflow), so the haplotype compiles empty
    probands, programs, _w = run_native(tmp_path, [line])
    assert probands == ["S1"]
    assert programs[0].res_len == 0
    assert programs[1].res_len == 0


def test_empty_vcf(tmp_path):
    vcf = tmp_path / "empty.vcf"
    vcf.write_text("")
    with pytest.raises(RuntimeError):
        compile_cohort_native(str(vcf), REF, BLOB, QcConfig())


def test_missing_file(tmp_path):
    with pytest.raises(RuntimeError, match="could not open"):
        compile_cohort_native(str(tmp_path / "nope.vcf"), REF, BLOB, QC_OFF)


def test_sanitizer_harness(tmp_path):
    """Build the pure-C++ core under ASan+UBSan and run a cohort + fuzz sweep
    through it natively (no Python interceptor artifacts)."""
    import shutil
    import subprocess

    if shutil.which("g++") is None:
        pytest.skip("g++ unavailable")
    import hashlib
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src_hash = hashlib.sha256(
        open(f"{root}/native/test_harness.cpp", "rb").read()
        + open(f"{root}/native/vcf2prot_native.cpp", "rb").read()
    ).hexdigest()[:16]
    harness = f"/tmp/vcf2prot_harness_{src_hash}"
    if not os.path.exists(harness):
        build = subprocess.run(
            [
                "g++", "-O1", "-g", "-fsanitize=address,undefined",
                "-DVCF2PROT_NO_PYTHON", "-std=c++17",
                f"-I{root}/native", f"{root}/native/test_harness.cpp",
                "-o", harness, "-lz",
            ],
            capture_output=True, text=True, timeout=300,
        )
        assert build.returncode == 0, build.stderr[-1500:]

    from genvcf import random_cohort, write_fasta, write_synthetic_vcf

    ref, samples = random_cohort(3, 4, 8)
    write_synthetic_vcf(str(tmp_path / "c.vcf"), ref, samples)
    write_fasta(str(tmp_path / "r.fasta"), ref)
    run = subprocess.run(
        [str(harness), str(tmp_path / "c.vcf"), str(tmp_path / "r.fasta")],
        capture_output=True, text=True, timeout=120,
    )
    assert run.returncode == 0, run.stderr[-1500:]
    assert "cohort ok" in run.stdout
    fuzz = subprocess.run(
        [str(harness), "--fuzz", "11", "100"],
        capture_output=True, text=True, timeout=120,
    )
    assert fuzz.returncode == 0, fuzz.stderr[-1500:]
    assert "0 crashes" in fuzz.stdout


def test_truncated_sample_columns_abort_both_tiers(tmp_path):
    """A supported record with missing sample columns aborts identically in
    the native and Python tiers (silent misalignment is never acceptable)."""
    from genvcf import write_fasta
    from vcf2prot_tpu.pipeline import PipelineConfig, run_pipeline
    from vcf2prot_tpu.runtime.engine import Engine

    ref = {"ENST00000000001": "M" + "A" * 40}
    hdr2 = HEADER + "\tS2"
    good = (
        "1\t2\tv\tA\tT\t9\tPASS\t"
        "BCSQ=missense|G|ENST00000000001|protein_coding|+|5A>5K|1A>1T"
        "\tGT:BCSQ\t0|1:1"  # S2 column missing
    )
    vcf = tmp_path / "t.vcf"
    vcf.write_text("\n".join([hdr2, good]) + "\n")
    fa = tmp_path / "t.fasta"
    write_fasta(str(fa), ref)
    for native in (True, False):
        out = tmp_path / f"o{native}"
        out.mkdir()
        with pytest.raises(Exception) as err:
            run_pipeline(
                PipelineConfig(
                    str(vcf), str(fa), str(out), Engine.ST, use_native=native
                )
            )
        assert "truncated" in str(err.value)


def test_collect_candidates_rejects_bad_inputs():
    """The native candidate collector must raise clean IndexError on
    negative sizes, mismatched buffer lengths, and overflowing task
    bounds -- never crash (round-4 review findings)."""
    import numpy as np

    from vcf2prot_tpu.native_bridge import load_native

    native = load_native()
    if native is None or not hasattr(native, "collect_candidates"):
        pytest.skip("native module unavailable")
    i64 = lambda *v: np.asarray(v, np.int64)  # noqa: E731
    u8 = lambda *v: np.asarray(v, np.uint8)  # noqa: E731
    tape = b"ABCDEFGH"
    good = dict(exe=u8(1), src=i64(0), ln=i64(2), dst=i64(0), alt=b"xy",
                ann_s=i64(0), ann_e=i64(8), res=8)

    def call(**over):
        a = dict(good, **over)
        return native.collect_candidates(
            a["exe"], a["src"], a["ln"], a["dst"], a["alt"], a["ann_s"],
            a["ann_e"], tape, a["res"], 3,
        )

    wins, starts = call()  # sanity: the good program collects
    assert len(np.frombuffer(starts, np.int64)) > 0
    for bad in (
        dict(res=-1),
        dict(ann_e=i64(8, 9)),                      # mismatched ann pair
        dict(src=i64(0, 1)),                        # wrong task width
        dict(dst=i64(2**63 - 2), ln=i64(4)),        # overflow bounds
        dict(src=i64(2**63 - 2), ln=i64(4), dst=i64(0)),
    ):
        with pytest.raises(IndexError):
            call(**bad)
