"""Compacted scoring path (device_resident._compact_core) vs the dense
chain and the host oracle.

The compact path scores only a static candidate bucket (host-side upper
bound cand_bound) after a 1-key position sort, extracting windows through a
4-word-aligned gather + offset select; rows must equal the dense path's
exactly on window/position and to float tolerance on score."""
import numpy as np
import pytest

from test_device_resident import _assert_rows_match, build_cohort
from vcf2prot_tpu.downstream.device_resident import (
    DeviceNeoantigenEngine,
    _host_chunk_rows,
    cand_bound,
    use_compact,
)
from vcf2prot_tpu.downstream.scoring import init_params


def test_cand_bound_is_an_upper_bound():
    """cand_bound must dominate the true candidate count on real cohorts."""
    from vcf2prot_tpu.downstream.cohort import collect_candidates
    from vcf2prot_tpu.runtime.cpu_engine import execute_tasks

    for seed in (3, 7, 21):
        _names, progs, blob = build_cohort(seed=seed, n_samples=3)
        k = 9
        tapes = [execute_tasks(p, blob) for p in progs]
        windows, _sids, _haps, _starts = collect_candidates(progs, tapes, k)
        assert cand_bound(progs, k) >= windows.shape[0]


def test_gate_defaults():
    scaffold = init_params(9)
    wide = init_params(9, hidden=512, depth=3)
    assert not use_compact(scaffold, 9, 1 << 25, 1 << 22)
    assert use_compact(wide, 9, 1 << 25, 1 << 22)
    # candidate bucket too close to the tape: compaction buys nothing
    assert not use_compact(wide, 9, 1 << 25, 1 << 24)
    # k too long for the 4-word window extraction
    assert not use_compact(wide, 14, 1 << 25, 1 << 22)


@pytest.mark.parametrize("k", [8, 9, 11, 13])
def test_compact_rows_match_dense_and_host(k, monkeypatch):
    monkeypatch.setenv("VCF2PROT_COMPACT", "1")
    _names, progs, blob = build_cohort(seed=21, n_samples=4)
    params = init_params(k, embed_dim=16, hidden=64, depth=2, seed=5)
    compact_rows = DeviceNeoantigenEngine(
        blob, k, params=params, top=40
    ).run_chunk(progs)
    monkeypatch.setenv("VCF2PROT_COMPACT", "0")
    dense_rows = DeviceNeoantigenEngine(
        blob, k, params=params, top=40
    ).run_chunk(progs)
    host_rows = _host_chunk_rows(progs, blob, k, params, 40)
    assert any(len(r) > 0 for r in compact_rows.values())
    _assert_rows_match(compact_rows, dense_rows)
    _assert_rows_match(compact_rows, host_rows)


def test_compact_reports_match_dense(tmp_path, monkeypatch):
    """End-to-end writer parity: forced-compact == forced-dense TSVs,
    multi-chunk (exercises the Buckets cand/m folds)."""
    from vcf2prot_tpu.downstream.device_resident import (
        write_device_neoantigen_reports,
    )

    names, progs, blob = build_cohort(seed=11, n_samples=4)
    params = init_params(9, hidden=96, depth=2, seed=2)
    a, b = tmp_path / "compact", tmp_path / "dense"
    a.mkdir()
    b.mkdir()
    monkeypatch.setenv("VCF2PROT_COMPACT", "1")
    write_device_neoantigen_reports(
        str(a), names, progs, blob, 9, params=params, chunk_res_bytes=1
    )
    monkeypatch.setenv("VCF2PROT_COMPACT", "0")
    write_device_neoantigen_reports(
        str(b), names, progs, blob, 9, params=params, chunk_res_bytes=1
    )
    for name in names:
        fa = (a / f"{name}.neoantigens.tsv").read_text().splitlines()
        fb = (b / f"{name}.neoantigens.tsv").read_text().splitlines()
        assert [l.split("\t")[:4] for l in fa] == [
            l.split("\t")[:4] for l in fb
        ]
        for la, lb in zip(fa[1:], fb[1:]):
            np.testing.assert_allclose(
                float(la.rsplit("\t", 1)[1]), float(lb.rsplit("\t", 1)[1]),
                rtol=1e-5, atol=1e-6,
            )


@pytest.mark.parametrize("k", [8, 9, 13])
def test_aligned_dense_matches_byte_dense(k, monkeypatch):
    """The word-aligned execute inside the tiled dense pass must produce
    byte-identical tapes, hence identical rows, vs the per-byte gather."""
    _names, progs, blob = build_cohort(seed=21, n_samples=4)
    params = init_params(k)
    monkeypatch.setenv("VCF2PROT_ALIGNED_DENSE", "1")
    rows_a = DeviceNeoantigenEngine(
        blob, k, params=params, top=60
    ).run_chunk(progs)
    monkeypatch.setenv("VCF2PROT_ALIGNED_DENSE", "0")
    rows_b = DeviceNeoantigenEngine(
        blob, k, params=params, top=60
    ).run_chunk(progs)
    host_rows = _host_chunk_rows(progs, blob, k, params, 60)
    assert any(len(r) > 0 for r in rows_a.values())
    _assert_rows_match(rows_a, rows_b)
    _assert_rows_match(rows_a, host_rows)


def test_compact_sharded_matches_host(monkeypatch):
    """The dp-sharded chain's compact branch must equal the host oracle."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs a multi-device mesh")
    from vcf2prot_tpu.parallel.mesh import make_mesh
    from vcf2prot_tpu.parallel.sharded_neoantigen import (
        ShardedNeoantigenEngine,
    )

    monkeypatch.setenv("VCF2PROT_COMPACT", "1")
    _names, progs, blob = build_cohort(seed=17, n_samples=6)
    k = 9
    params = init_params(k, hidden=64, depth=2, seed=3)
    eng = ShardedNeoantigenEngine(blob, make_mesh(), k, params=params, top=20)
    rows = eng.run_chunk(progs)
    assert rows is not None and any(len(r) > 0 for r in rows.values())
    _assert_rows_match(rows, _host_chunk_rows(progs, blob, k, params, 20))
