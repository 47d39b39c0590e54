"""Engine fallback paths: malformed programs defer to the host oracle;
AUTO resolves to MT on CPU platforms and without device preference."""
import numpy as np

from vcf2prot_tpu.compiler.haplotype import HaplotypeProgram, RefBlob
from vcf2prot_tpu.runtime.engine import Engine, resolve_auto
from vcf2prot_tpu.runtime.tpu_engine import TpuEngine


def _clear_cache(monkeypatch):
    from vcf2prot_tpu.runtime import engine as engine_mod

    monkeypatch.setattr(engine_mod, "_PROBE_CACHE", {})
    return engine_mod


def test_auto_resolves_to_host_on_cpu_platform(monkeypatch):
    # the probe runs BY DEFAULT now; on a CPU backend it finds no device
    _clear_cache(monkeypatch)
    monkeypatch.delenv("VCF2PROT_PREFER_DEVICE", raising=False)
    assert resolve_auto() is Engine.MT


def test_auto_with_device_preference_on_cpu(monkeypatch):
    # prefer-device set, but the backend is CPU -> still MT
    _clear_cache(monkeypatch)
    monkeypatch.setenv("VCF2PROT_PREFER_DEVICE", "1")
    assert resolve_auto(timeout_s=30) is Engine.MT


def test_auto_selects_device_when_link_is_fast(monkeypatch):
    # a probed-fast link (monkeypatched rate) selects the TPU engine with NO
    # environment opt-in -- the probe is the default policy
    mod = _clear_cache(monkeypatch)
    monkeypatch.delenv("VCF2PROT_PREFER_DEVICE", raising=False)
    monkeypatch.setattr(mod, "_probe_d2h_rate", lambda n: 1e9)
    assert resolve_auto() is Engine.TPU


def test_auto_slow_link_lands_on_host(monkeypatch):
    mod = _clear_cache(monkeypatch)
    monkeypatch.delenv("VCF2PROT_PREFER_DEVICE", raising=False)
    monkeypatch.setattr(mod, "_probe_d2h_rate", lambda n: 5e6)  # ~forwarded
    assert resolve_auto() is Engine.MT


def test_auto_neoantigen_workload_prefers_device(monkeypatch):
    # top-k-only D2H traffic: any device that completes a scalar round trip
    # wins, regardless of bulk link bandwidth
    mod = _clear_cache(monkeypatch)
    monkeypatch.delenv("VCF2PROT_PREFER_DEVICE", raising=False)
    monkeypatch.setattr(mod, "_probe_device_roundtrip", lambda: True)
    monkeypatch.setattr(mod, "_probe_d2h_rate", lambda n: 5e6)
    assert resolve_auto(workload="neoantigen_device") is Engine.TPU
    # ... while the fasta workload on the same slow link stays on host
    assert resolve_auto(workload="fasta") is Engine.MT


def test_auto_probe_result_is_cached_per_process(monkeypatch):
    mod = _clear_cache(monkeypatch)
    monkeypatch.delenv("VCF2PROT_PREFER_DEVICE", raising=False)
    calls = []

    def fake_rate(n):
        calls.append(n)
        return 1e9

    monkeypatch.setattr(mod, "_probe_d2h_rate", fake_rate)
    assert resolve_auto() is Engine.TPU
    assert resolve_auto() is Engine.TPU
    assert len(calls) == 1


def test_auto_force_host_env(monkeypatch):
    mod = _clear_cache(monkeypatch)
    monkeypatch.setenv("VCF2PROT_PREFER_DEVICE", "0")
    monkeypatch.setattr(mod, "_probe_d2h_rate", lambda n: 1e9)
    assert resolve_auto() is Engine.MT


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


def _mk_good(blob_text, start, length):
    return HaplotypeProgram(
        exe=np.array([0], np.uint8),
        src=np.array([start], np.int64),
        length=np.array([length], np.int64),
        dst=np.array([0], np.int64),
        alt=b"",
        res_len=length,
        annotations=[("T", 0, length)],
    )


def _mk_corrupt():
    return HaplotypeProgram(
        exe=np.array([0, 0], np.uint8),
        src=np.array([0, 4], np.int64),
        length=np.array([2, 2], np.int64),
        dst=np.array([0, 5], np.int64),  # gap -> non-contiguous
        alt=b"",
        res_len=7,
        annotations=[("T", 0, 7)],
    )


def test_one_corrupt_program_is_isolated_not_the_whole_chunk(monkeypatch):
    """10-program chunk, 1 corrupted: the oracle runs for exactly that one;
    the other 9 execute on the device path."""
    from vcf2prot_tpu.runtime import cpu_engine, tpu_engine

    blob = RefBlob.from_ref_seqs({"T": "ABCDEFGH"})
    progs = [_mk_good("T", i % 4, 4) for i in range(9)]
    progs.insert(3, _mk_corrupt())
    calls = []
    real = cpu_engine.execute_tasks

    def counting(p, b):
        calls.append(p)
        return real(p, b)

    monkeypatch.setattr(tpu_engine.cpu_engine, "execute_tasks", counting)
    outs = TpuEngine(blob).execute(progs)
    assert len(calls) == 1 and calls[0] is progs[3]
    assert outs[3].tobytes() == b"AB...EF"
    for i, p in enumerate(progs):
        if i != 3:
            s = int(p.src[0])
            assert outs[i].tobytes() == b"ABCDEFGH"[s:s + 4]


def test_all_corrupt_chunk_still_full_oracle():
    blob = RefBlob.from_ref_seqs({"T": "ABCDEFGH"})
    outs = TpuEngine(blob).execute([_mk_corrupt(), _mk_corrupt()])
    assert all(o.tobytes() == b"AB...EF" for o in outs)


def test_sharded_engine_isolates_corrupt_program(monkeypatch):
    from vcf2prot_tpu.parallel.mesh import make_mesh
    from vcf2prot_tpu.parallel.sharded import ShardedEngine
    from vcf2prot_tpu.runtime import cpu_engine

    blob = RefBlob.from_ref_seqs({"T": "ABCDEFGH"})
    progs = [_mk_good("T", i % 4, 4) for i in range(9)]
    progs.insert(5, _mk_corrupt())
    calls = []
    real = cpu_engine.execute_tasks

    def counting(p, b):
        calls.append(p)
        return real(p, b)

    monkeypatch.setattr(cpu_engine, "execute_tasks", counting)
    outs = ShardedEngine(blob, make_mesh()).execute(progs)
    assert len(calls) == 1 and calls[0] is progs[5]
    assert outs[5].tobytes() == b"AB...EF"
    for i, p in enumerate(progs):
        if i != 5:
            s = int(p.src[0])
            assert outs[i].tobytes() == b"ABCDEFGH"[s:s + 4]


def test_zero_task_nonempty_program_is_not_contiguous():
    from vcf2prot_tpu.runtime.pack import program_is_contiguous

    empty_ok = HaplotypeProgram(res_len=0, annotations=[])
    gap = HaplotypeProgram(res_len=3, annotations=[("T", 0, 3)])
    assert program_is_contiguous(empty_ok)
    assert not program_is_contiguous(gap)
    blob = RefBlob.from_ref_seqs({"T": "ABCDEFGH"})
    outs = TpuEngine(blob).execute([gap, _mk_good("T", 0, 4)])
    assert outs[0].tobytes() == b"..."
    assert outs[1].tobytes() == b"ABCD"
