"""Compressed input (gzip / BGZF) and gzip output through the native tier."""
import gzip
import zlib

import numpy as np
import pytest

from genvcf import random_cohort, write_fasta, write_synthetic_vcf
from vcf2prot_tpu.compiler.haplotype import RefBlob
from vcf2prot_tpu.compiler.qc import QC_OFF
from vcf2prot_tpu.io.bgzf import EOF_MARKER, bgzf_compress
from vcf2prot_tpu.native_bridge import compile_cohort_native, load_native

pytestmark = pytest.mark.skipif(
    load_native() is None, reason="native module unavailable"
)


def _programs_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.res_len == y.res_len
        assert x.annotations == y.annotations
        np.testing.assert_array_equal(x.exe, y.exe)
        np.testing.assert_array_equal(x.src, y.src)
        np.testing.assert_array_equal(x.length, y.length)
        np.testing.assert_array_equal(x.dst, y.dst)
        assert x.alt == y.alt


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("czip")
    ref, samples = random_cohort(seed=17, n_samples=6, n_transcripts=10)
    plain = tmp / "cohort.vcf"
    write_synthetic_vcf(str(plain), ref, samples)
    write_fasta(str(tmp / "ref.fasta"), ref)
    blob = RefBlob.from_ref_seqs(ref)
    base = compile_cohort_native(str(plain), ref, blob, QC_OFF)
    return tmp, ref, blob, plain.read_bytes(), base


def test_single_member_gzip_input(cohort):
    tmp, ref, blob, raw, (probands, programs, _w) = cohort
    gz = tmp / "cohort_plain.vcf.gz"
    gz.write_bytes(gzip.compress(raw, 6))
    p2, programs2, _w2 = compile_cohort_native(str(gz), ref, blob, QC_OFF)
    assert p2 == probands
    _programs_equal(programs, programs2)


@pytest.mark.parametrize("block_size", [512, 0xFF00])
def test_bgzf_input_parallel_blocks(cohort, block_size):
    tmp, ref, blob, raw, (probands, programs, _w) = cohort
    gz = tmp / f"cohort_bgzf_{block_size}.vcf.gz"
    data = bgzf_compress(raw, level=4, block_size=block_size)
    gz.write_bytes(data)
    # small blocks force a many-block layout (the parallel path)
    if block_size == 512:
        assert data.count(b"\x42\x43\x02\x00") > 8
    p2, programs2, _w2 = compile_cohort_native(str(gz), ref, blob, QC_OFF)
    assert p2 == probands
    _programs_equal(programs, programs2)


def test_bgzf_roundtrip_is_valid_gzip():
    payload = b"hello bgzf\n" * 5000
    data = bgzf_compress(payload, block_size=1024)
    assert data.endswith(EOF_MARKER)
    assert gzip.decompress(data) == payload


def test_corrupt_gzip_raises(cohort, tmp_path):
    tmp, ref, blob, raw, _base = cohort
    bad = tmp_path / "bad.vcf.gz"
    g = bytearray(gzip.compress(raw))
    g[len(g) // 2] ^= 0xFF  # flip a bit mid-stream
    bad.write_bytes(bytes(g))
    with pytest.raises(RuntimeError, match="gzip"):
        compile_cohort_native(str(bad), ref, blob, QC_OFF)


def test_truncated_gzip_raises(cohort, tmp_path):
    tmp, ref, blob, raw, _base = cohort
    bad = tmp_path / "trunc.vcf.gz"
    g = gzip.compress(raw)
    bad.write_bytes(g[: len(g) // 2])
    with pytest.raises(RuntimeError, match="gzip"):
        compile_cohort_native(str(bad), ref, blob, QC_OFF)


def test_native_gzip_output_matches_plain(tmp_path):
    """-c output written by the native gzip writer must decompress to exactly
    the plain-mode FASTA bytes."""
    from vcf2prot_tpu.pipeline import PipelineConfig, run_pipeline
    from vcf2prot_tpu.runtime.engine import Engine

    ref, samples = random_cohort(seed=23, n_samples=4, n_transcripts=8)
    vcf = tmp_path / "c.vcf"
    fa = tmp_path / "r.fasta"
    write_synthetic_vcf(str(vcf), ref, samples)
    write_fasta(str(fa), ref)
    outs = {}
    for compressed in (False, True):
        out = tmp_path / ("gz" if compressed else "plain")
        out.mkdir()
        run_pipeline(
            PipelineConfig(
                str(vcf), str(fa), str(out), Engine.MT, qc=None,
                write_compressed=compressed,
            )
        )
        outs[compressed] = out
    plain_files = sorted(p.name for p in outs[False].glob("*.fasta"))
    gz_files = sorted(p.name for p in outs[True].glob("*.fasta.gz"))
    assert [f + ".gz" for f in plain_files] == gz_files
    for name in plain_files:
        plain = (outs[False] / name).read_bytes()
        gz = gzip.decompress((outs[True] / (name + ".gz")).read_bytes())
        assert gz == plain


# ----------------------------------------------------------------- BCF ----

@pytest.mark.parametrize("explicit_idx", [False, True])
def test_bcf_input_matches_vcf(cohort, tmp_path, explicit_idx):
    """A BCF encoding of the same cohort compiles to identical programs."""
    from genbcf import write_synthetic_bcf
    from genvcf import random_cohort

    ref, samples = random_cohort(seed=17, n_samples=6, n_transcripts=10)
    _tmp, ref2, blob, _raw, (probands, programs, _w) = cohort
    assert ref == ref2  # same seed as the module fixture
    bcf = tmp_path / f"cohort_{explicit_idx}.bcf"
    write_synthetic_bcf(str(bcf), ref, samples, explicit_idx=explicit_idx,
                        block_size=4096)
    p2, programs2, _w2 = compile_cohort_native(str(bcf), ref, blob, QC_OFF)
    assert p2 == probands
    _programs_equal(programs, programs2)


def test_bcf_cli_end_to_end(tmp_path):
    """-f cohort.bcf runs the full pipeline; output equals the VCF run."""
    from genbcf import write_synthetic_bcf
    from genvcf import random_cohort, write_fasta, write_synthetic_vcf
    from vcf2prot_tpu.pipeline import PipelineConfig, run_pipeline
    from vcf2prot_tpu.runtime.engine import Engine

    ref, samples = random_cohort(seed=31, n_samples=4, n_transcripts=8)
    vcf = tmp_path / "c.vcf"
    bcf = tmp_path / "c.bcf"
    fa = tmp_path / "r.fasta"
    write_synthetic_vcf(str(vcf), ref, samples)
    write_synthetic_bcf(str(bcf), ref, samples)
    write_fasta(str(fa), ref)
    outs = {}
    for tag, path in (("vcf", vcf), ("bcf", bcf)):
        out = tmp_path / tag
        out.mkdir()
        run_pipeline(
            PipelineConfig(str(path), str(fa), str(out), Engine.MT, qc=None)
        )
        outs[tag] = {
            p.name: p.read_bytes() for p in out.glob("*.fasta")
        }
    assert outs["vcf"] == outs["bcf"]


def test_bcf_python_tier_raises_cleanly(tmp_path, monkeypatch):
    from genbcf import write_synthetic_bcf
    from genvcf import random_cohort
    from vcf2prot_tpu.frontend.vcf_reader import read_vcf

    ref, samples = random_cohort(seed=31, n_samples=2, n_transcripts=4)
    bcf = tmp_path / "c.bcf"
    write_synthetic_bcf(str(bcf), ref, samples)
    with pytest.raises(ValueError, match="native tier"):
        read_vcf(str(bcf))


def test_truncated_bcf_raises(cohort, tmp_path):
    from genbcf import write_synthetic_bcf
    from genvcf import random_cohort

    _tmp, ref, blob, _raw, _base = cohort
    _ref, samples = random_cohort(seed=17, n_samples=6, n_transcripts=10)
    bcf = tmp_path / "t.bcf"
    write_synthetic_bcf(str(bcf), ref, samples)
    import gzip as _gz
    payload = _gz.decompress(bcf.read_bytes())
    cut = tmp_path / "cut.bcf"
    cut.write_bytes(bgzf_compress(payload[: len(payload) - 37]))
    with pytest.raises(RuntimeError, match="BCF|truncated"):
        compile_cohort_native(str(cut), ref, blob, QC_OFF)


def test_gz_input_neoantigen_params_combo(cohort, tmp_path):
    """Cross-feature integration: BGZF-compressed VCF input + trained
    scoring-head weights + gzip FASTA output through the CLI must produce
    exactly the plain-VCF run's records and TSV rows."""
    import gzip as _gzip

    import numpy as np

    from vcf2prot_tpu.cli import main
    from vcf2prot_tpu.downstream.scoring import init_params
    from vcf2prot_tpu.downstream.train import save_params
    from vcf2prot_tpu.io.bgzf import bgzf_compress

    tmp, ref, _blob, raw, _base = cohort
    gz = tmp_path / "c.vcf.gz"
    gz.write_bytes(bgzf_compress(raw))
    fasta = tmp / "ref.fasta"
    weights = tmp_path / "w.npz"
    save_params(str(weights), init_params(9, hidden=48, depth=2, seed=5))
    out_a, out_b = tmp_path / "plain", tmp_path / "gz"
    out_a.mkdir()
    out_b.mkdir()
    plain_vcf = tmp / "cohort.vcf"
    base = ["-r", str(fasta), "-g", "mt", "-c", "--neoantigen_k", "9",
            "--neoantigen_params", str(weights)]
    assert main(["-f", str(plain_vcf), "-o", str(out_a)] + base) == 0
    assert main(["-f", str(gz), "-o", str(out_b)] + base) == 0
    import os

    names = sorted(f for f in os.listdir(out_a) if f.endswith(".fasta.gz"))
    assert names and names == sorted(
        f for f in os.listdir(out_b) if f.endswith(".fasta.gz")
    )
    for f in names:
        assert (
            _gzip.decompress((out_a / f).read_bytes())
            == _gzip.decompress((out_b / f).read_bytes())
        )
    tsvs = sorted(f for f in os.listdir(out_a) if f.endswith(".tsv"))
    assert tsvs
    for f in tsvs:
        assert (out_a / f).read_text() == (out_b / f).read_text()
