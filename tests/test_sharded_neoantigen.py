"""dp-sharded device-resident neoantigen chain (parallel/sharded_neoantigen)
vs the host oracle chain and the single-device engine, on the virtual
8-device CPU mesh."""
import numpy as np
import pytest

from test_device_resident import _assert_rows_match, build_cohort
from vcf2prot_tpu.downstream.device_resident import (
    DeviceNeoantigenEngine,
    _host_chunk_rows,
)
from vcf2prot_tpu.downstream.scoring import init_params
from vcf2prot_tpu.parallel.mesh import make_mesh
from vcf2prot_tpu.parallel.sharded_neoantigen import (
    ShardedNeoantigenEngine,
    partition_pairs,
    shard_buckets,
)

K = 9


@pytest.mark.parametrize("seed,n_samples", [(21, 5), (5, 8)])
def test_sharded_matches_host_rows(seed, n_samples):
    _names, progs, blob = build_cohort(seed=seed, n_samples=n_samples)
    params = init_params(K)
    eng = ShardedNeoantigenEngine(blob, make_mesh(), K, params=params,
                                  top=200)
    rows = eng.run_chunk(progs)
    assert rows is not None
    host = _host_chunk_rows(progs, blob, K, params, 200)
    assert any(len(r) > 0 for r in rows.values())
    _assert_rows_match(rows, host)


def test_sharded_matches_single_device_rows():
    _names, progs, blob = build_cohort(seed=13, n_samples=6)
    params = init_params(K)
    sharded = ShardedNeoantigenEngine(
        blob, make_mesh(4), K, params=params, top=50
    ).run_chunk(progs)
    single = DeviceNeoantigenEngine(
        blob, K, params=params, top=50
    ).run_chunk(progs)
    _assert_rows_match(sharded, single)


def test_more_shards_than_samples():
    _names, progs, blob = build_cohort(seed=7, n_samples=2)
    params = init_params(K)
    rows = ShardedNeoantigenEngine(
        blob, make_mesh(), K, params=params
    ).run_chunk(progs)
    host = _host_chunk_rows(progs, blob, K, params, 200)
    _assert_rows_match(rows, host)


def test_partition_pairs_balance_and_order():
    _names, progs, blob = build_cohort(seed=3, n_samples=8)
    shards = partition_pairs(progs, 3)
    got = sorted(i for s in shards for i in s)
    assert got == list(range(8))
    for s in shards:
        assert s == sorted(s)  # original sample order kept inside a shard
    loads = [
        sum(progs[2 * i].res_len + progs[2 * i + 1].res_len for i in s)
        for s in shards
    ]
    assert max(loads) < 2 * (sum(loads) / len(loads)) + max(
        progs[2 * i].res_len + progs[2 * i + 1].res_len for i in range(8)
    )


def test_shard_buckets_cover_all_shards():
    _names, progs, blob = build_cohort(seed=11, n_samples=6)
    chunks = [list(range(0, 8)), list(range(8, 12))]
    b = shard_buckets(progs, chunks, 4)
    for chunk in chunks:
        cprogs = [progs[i] for i in chunk]
        for idxs in partition_pairs(cprogs, 4):
            sp = [
                q for i in idxs for q in (cprogs[2 * i], cprogs[2 * i + 1])
            ]
            assert sum(p.res_len for p in sp) <= b.out
            assert sum(p.n_tasks for p in sp) <= b.tasks
            assert len(idxs) <= b.samples


def test_pooled_cohort_shared_alt_path(tmp_path):
    """Pool-compiled cohorts take the shared_alt branch (one replicated alt
    pool, like the blob); rows must still match the host chain."""
    from genvcf import shared_cohort, write_fasta, write_synthetic_vcf
    from vcf2prot_tpu.compiler.haplotype import AltPool, RefBlob, attach_pool
    from vcf2prot_tpu.compiler.proband import compile_proband
    from vcf2prot_tpu.compiler.qc import QcConfig
    from vcf2prot_tpu.pipeline import parse_vcf_to_int_maps

    ref, samples = shared_cohort(seed=5, n_samples=4, n_transcripts=8)
    vcf = tmp_path / "c.vcf"
    write_synthetic_vcf(str(vcf), ref, samples)
    blob = RefBlob.from_ref_seqs(ref)
    int_maps = parse_vcf_to_int_maps(str(vcf))
    progs = []
    pool = AltPool()
    cache = {}
    for m in int_maps:
        pp = compile_proband(m, ref, blob, QcConfig(), cache, pool)
        progs.extend([pp.hap1, pp.hap2])
    attach_pool(progs, pool)
    assert all(p.pooled for p in progs)
    params = init_params(K)
    rows = ShardedNeoantigenEngine(
        blob, make_mesh(4), K, params=params
    ).run_chunk(progs)
    assert rows is not None
    host = _host_chunk_rows(progs, blob, K, params, 200)
    _assert_rows_match(rows, host)
    # the single-device engine's pooled branch (cached combined-tape upload
    # keyed on the pool identity) must agree too
    single = DeviceNeoantigenEngine(blob, K, params=params).run_chunk(progs)
    _assert_rows_match(single, host)


def test_malformed_program_returns_none():
    from vcf2prot_tpu.compiler.haplotype import HaplotypeProgram, RefBlob

    blob = RefBlob.from_ref_seqs({"T": "ABCDEFGH"})
    bad = HaplotypeProgram(
        exe=np.array([0, 0], np.uint8),
        src=np.array([0, 4], np.int64),
        length=np.array([2, 2], np.int64),
        dst=np.array([0, 5], np.int64),  # gap -> non-contiguous
        alt=b"",
        res_len=7,
        annotations=[("T", 0, 7)],
    )
    assert ShardedNeoantigenEngine(
        blob, make_mesh(2), 3
    ).run_chunk([bad, bad]) is None
