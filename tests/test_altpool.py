"""Shared cohort-level alt pool (compiler/haplotype.py AltPool).

Pool-compiled haplotype programs carry pool-absolute exe==1 sources and share
ONE alt bytes object; execution must stay byte-identical to the per-haplotype
alt tapes of the legacy path, the pool must deduplicate shared variant
bundles, and the packed/gather formulations must keep working on top.
"""
import numpy as np
import pytest

from genvcf import random_cohort, shared_cohort, write_synthetic_vcf
from vcf2prot_tpu.compiler.haplotype import AltPool, RefBlob, attach_pool
from vcf2prot_tpu.compiler.proband import compile_proband
from vcf2prot_tpu.compiler.qc import QcConfig
from vcf2prot_tpu.pipeline import parse_vcf_to_int_maps
from vcf2prot_tpu.runtime.cpu_engine import execute_gather, execute_tasks
from vcf2prot_tpu.runtime.pack import pack_cohort

QC = QcConfig()


def _compile_both(tmp_path, ref, samples):
    vcf = tmp_path / "c.vcf"
    write_synthetic_vcf(str(vcf), ref, samples)
    blob = RefBlob.from_ref_seqs(ref)
    int_maps = parse_vcf_to_int_maps(str(vcf))

    legacy = []
    cache = {}
    for m in int_maps:
        pp = compile_proband(m, ref, blob, QC, cache)
        legacy.extend([pp.hap1, pp.hap2])

    pooled = []
    pool = AltPool()
    cache2 = {}
    for m in int_maps:
        pp = compile_proband(m, ref, blob, QC, cache2, pool)
        pooled.extend([pp.hap1, pp.hap2])
    pool_bytes = attach_pool(pooled, pool)
    return blob, legacy, pooled, pool_bytes


@pytest.mark.parametrize("seed", [3, 17])
def test_pooled_execution_matches_legacy(seed, tmp_path):
    ref, samples = random_cohort(seed, n_samples=5, n_transcripts=10)
    blob, legacy, pooled, _pool = _compile_both(tmp_path, ref, samples)
    assert len(legacy) == len(pooled)
    for i, (a, b) in enumerate(zip(legacy, pooled)):
        assert b.pooled and not a.pooled
        assert a.res_len == b.res_len
        assert a.annotations == b.annotations
        np.testing.assert_array_equal(a.exe, b.exe, err_msg=f"hap {i} exe")
        np.testing.assert_array_equal(a.length, b.length)
        np.testing.assert_array_equal(a.dst, b.dst)
        # exe==0 sources are identical; exe==1 sources are re-based only
        ref_rows = a.exe == 0
        np.testing.assert_array_equal(a.src[ref_rows], b.src[ref_rows])
        np.testing.assert_array_equal(
            execute_tasks(a, blob), execute_tasks(b, blob),
            err_msg=f"hap {i} executed output",
        )
        np.testing.assert_array_equal(
            execute_tasks(b, blob), execute_gather(b, blob),
            err_msg=f"hap {i} gather formulation",
        )


def test_pool_deduplicates_shared_bundles(tmp_path):
    ref, samples = shared_cohort(seed=7, n_samples=16, n_transcripts=8)
    _blob, legacy, pooled, pool_bytes = _compile_both(tmp_path, ref, samples)
    total_legacy_alt = sum(len(p.alt) for p in legacy)
    assert len(pool_bytes) < total_legacy_alt
    # every pooled program shares the same alt object
    assert all(p.alt is pooled[0].alt for p in pooled)
    # pool-absolute sources stay in bounds
    for p in pooled:
        rows = p.exe == 1
        if rows.any():
            assert int((p.src[rows] + p.length[rows]).max()) <= len(pool_bytes)


def test_pack_cohort_shared_pool(tmp_path):
    ref, samples = shared_cohort(seed=21, n_samples=10, n_transcripts=6)
    blob, _legacy, pooled, pool_bytes = _compile_both(tmp_path, ref, samples)
    packed = pack_cohort(pooled, blob)
    assert packed.alt_key is not None
    assert packed.contiguous
    assert len(packed.alt) == len(pool_bytes)
    combined = np.concatenate([blob.data, packed.alt])
    j = np.arange(packed.total_res, dtype=np.int64)
    t = np.searchsorted(packed.dst.astype(np.int64), j, side="right") - 1
    out = combined[packed.src_biased.astype(np.int64)[t] + j
                   - packed.dst.astype(np.int64)[t]]
    for (p_idx, start, end) in packed.spans:
        np.testing.assert_array_equal(
            out[start:end], execute_tasks(pooled[p_idx], blob),
            err_msg=f"program {p_idx}",
        )


def test_pack_cohort_rejects_mixed_programs(tmp_path):
    ref, samples = random_cohort(2, n_samples=3, n_transcripts=5)
    blob, legacy, pooled, _pool = _compile_both(tmp_path, ref, samples)
    with pytest.raises(ValueError):
        pack_cohort([legacy[0], pooled[1]], blob)


@pytest.mark.parametrize(
    "gen, expect_pool",
    [(shared_cohort, True), (random_cohort, False)],
    ids=["shared", "random"],
)
def test_auto_pool_probe_tiers_agree(gen, expect_pool, tmp_path):
    """The deterministic sharing probe must make the same pooling decision
    in both tiers: pool on shared-variant cohorts, skip on cohorts whose
    (transcript, csq-bundle) groups are (near-)unique."""
    from vcf2prot_tpu.compiler.haplotype import cohort_should_pool
    from vcf2prot_tpu.native_bridge import compile_cohort_native, load_native

    ref, samples = gen(seed=11, n_samples=12, n_transcripts=10)
    vcf = tmp_path / "c.vcf"
    write_synthetic_vcf(str(vcf), ref, samples)
    int_maps = parse_vcf_to_int_maps(str(vcf))
    assert cohort_should_pool(int_maps) is expect_pool
    if load_native() is None:
        pytest.skip("native module unavailable")
    blob = RefBlob.from_ref_seqs(ref)
    _p, programs, _w = compile_cohort_native(
        str(vcf), ref, blob, QC, alt_pool="auto"
    )
    assert all(p.pooled is expect_pool for p in programs)
    # either way the executed bytes match the Python oracle
    cache = {}
    pool = AltPool() if expect_pool else None
    py_flat = []
    for m in int_maps:
        pp = compile_proband(m, ref, blob, QC, cache, pool)
        py_flat.extend([pp.hap1, pp.hap2])
    if pool is not None:
        attach_pool(py_flat, pool)
    for i, (a, b) in enumerate(zip(py_flat, programs)):
        np.testing.assert_array_equal(a.src, b.src, err_msg=f"hap {i} src")
        np.testing.assert_array_equal(
            execute_tasks(a, blob), execute_tasks(b, blob),
            err_msg=f"hap {i} executed output",
        )


def test_auto_pool_probe_window_boundary(tmp_path):
    """The probe inspects exactly the first POOL_PROBE_HAPLOTYPES haplotypes
    in cohort scan order; a cohort whose head is unique but whose tail shares
    bundles must get the same (no-pool) decision from both tiers, and the
    tiers must still agree array-for-array."""
    from vcf2prot_tpu.compiler.haplotype import (
        POOL_PROBE_HAPLOTYPES, cohort_should_pool,
    )
    from vcf2prot_tpu.native_bridge import compile_cohort_native, load_native

    ref, head = random_cohort(seed=5, n_samples=POOL_PROBE_HAPLOTYPES // 2,
                              n_transcripts=10)
    # tail: every later sample repeats sample 0's bundles exactly
    first = next(iter(head.values()))
    samples = dict(head)
    for s in range(8):
        samples[f"TAIL{s:04d}"] = first
    vcf = tmp_path / "c.vcf"
    write_synthetic_vcf(str(vcf), ref, samples)
    int_maps = parse_vcf_to_int_maps(str(vcf))
    assert cohort_should_pool(int_maps) is False
    if load_native() is None:
        pytest.skip("native module unavailable")
    blob = RefBlob.from_ref_seqs(ref)
    _p, programs, _w = compile_cohort_native(
        str(vcf), ref, blob, QC, alt_pool="auto"
    )
    assert all(not p.pooled for p in programs)
    cache = {}
    py_flat = []
    for m in int_maps:
        pp = compile_proband(m, ref, blob, QC, cache)
        py_flat.extend([pp.hap1, pp.hap2])
    for i, (a, b) in enumerate(zip(py_flat, programs)):
        np.testing.assert_array_equal(a.src, b.src, err_msg=f"hap {i} src")
        assert a.alt == b.alt, f"hap {i} alt"


@pytest.mark.parametrize("seed", [3, 17, 29])
def test_native_pool_matches_python_pool(seed, tmp_path):
    """The threaded native tier must reproduce the serial Python AltPool
    layout bit-for-bit: same pool bytes, same pool-absolute exe==1 sources
    (native remaps registry segments to first-use cohort-scan order)."""
    from vcf2prot_tpu.native_bridge import compile_cohort_native, load_native

    if load_native() is None:
        pytest.skip("native module unavailable")
    # shared_cohort repeats variant bundles across samples -> real dedup
    ref, samples = shared_cohort(seed, n_samples=8, n_transcripts=12)
    blob, _legacy, pooled, pool_bytes = _compile_both(tmp_path, ref, samples)
    nat = compile_cohort_native(
        str(tmp_path / "c.vcf"), ref, blob, QC, alt_pool=True
    )
    assert nat is not None
    _probands, nat_programs, _warnings = nat
    assert len(nat_programs) == len(pooled)
    assert nat_programs[0].alt == pool_bytes
    # one shared bytes object across every native program
    assert all(p.alt is nat_programs[0].alt for p in nat_programs)
    for i, (a, b) in enumerate(zip(pooled, nat_programs)):
        assert b.pooled
        assert a.res_len == b.res_len
        np.testing.assert_array_equal(a.exe, b.exe, err_msg=f"hap {i} exe")
        np.testing.assert_array_equal(a.src, b.src, err_msg=f"hap {i} src")
        np.testing.assert_array_equal(a.length, b.length)
        np.testing.assert_array_equal(a.dst, b.dst)
        np.testing.assert_array_equal(
            execute_tasks(a, blob), execute_tasks(b, blob),
            err_msg=f"hap {i} executed output",
        )
