"""Engine fallback paths: malformed programs defer to the host oracle;
AUTO resolves to MT on CPU platforms and without device preference."""
import numpy as np

from vcf2prot_tpu.compiler.haplotype import HaplotypeProgram, RefBlob
from vcf2prot_tpu.runtime.engine import Engine, resolve_auto
from vcf2prot_tpu.runtime.tpu_engine import TpuEngine


def test_auto_resolves_to_host_by_default(monkeypatch):
    monkeypatch.delenv("VCF2PROT_PREFER_DEVICE", raising=False)
    assert resolve_auto() is Engine.MT


def test_auto_with_device_preference_on_cpu(monkeypatch):
    # prefer-device set, but the backend is CPU -> still MT
    monkeypatch.setenv("VCF2PROT_PREFER_DEVICE", "1")
    assert resolve_auto(timeout_s=30) is Engine.MT


def test_non_contiguous_program_falls_back_to_oracle():
    blob = RefBlob.from_ref_seqs({"T": "ABCDEFGH"})
    # dst jumps (0 then 5): violates contiguity -> device path must defer to
    # the serial oracle, whose semantics fill the gap with '.'
    prog = HaplotypeProgram(
        exe=np.array([0, 0], np.uint8),
        src=np.array([0, 4], np.int64),
        length=np.array([2, 2], np.int64),
        dst=np.array([0, 5], np.int64),
        alt=b"",
        res_len=7,
        annotations=[("T", 0, 7)],
    )
    out = TpuEngine(blob).execute([prog])[0]
    assert out.tobytes() == b"AB...EF"
