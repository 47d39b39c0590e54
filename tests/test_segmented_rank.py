"""Segmented per-sample top-k (device_resident._rank_segmented) vs the
global stable-sort path and the numpy oracle.

The segmented path prunes each rank block to its per-(block, sample)
top-``top`` rows before a small global sort; these tests force tiny block
sizes so small cohorts exercise it, and pin exact row equality -- including
tie order (equal scores must keep ascending tape position, the host path's
stable-argsort contract)."""
import numpy as np
import pytest

from test_device_resident import _assert_rows_match, build_cohort
from vcf2prot_tpu.downstream.device_resident import (
    DeviceNeoantigenEngine,
    _host_chunk_rows,
    count_spb,
    rank_blk,
    use_segmented_rank,
)
from vcf2prot_tpu.downstream.scoring import init_params


def test_count_spb():
    # starts 0, 10, 300, 310, 320 with blk 256: block 0 holds 2 starts,
    # block 1 holds 3 -> bound 3 + 1 spanning
    assert count_spb([0, 10, 300, 310, 320], 256) == 4
    assert count_spb([], 256) == 1
    assert count_spb([0], 1 << 15) == 2


def test_rank_blk_env(monkeypatch):
    monkeypatch.setenv("VCF2PROT_RANK_BLK", "1000")
    assert rank_blk(1 << 20) == 512  # floored to a power of two
    assert rank_blk(256) == 256  # clipped to the bucket
    monkeypatch.delenv("VCF2PROT_RANK_BLK")
    assert rank_blk(1 << 20) == 1 << 16


def test_gate():
    assert use_segmented_rank(1 << 20, top=200, blk=1 << 15, spb=3)
    assert not use_segmented_rank(1 << 15, top=200, blk=1 << 15, spb=3)
    assert not use_segmented_rank(1 << 20, top=200, blk=1 << 15, spb=50)
    assert not use_segmented_rank(1 << 20, top=200, blk=1 << 15, spb=0)


def _rank_rows(out_bucket, s_bucket, top, sid, scores, spb):
    """Run _rank_core on synthetic arrays; returns (vals, gpos) [S, top]."""
    import jax.numpy as jnp

    from vcf2prot_tpu.downstream.device_resident import _rank_core

    cand = sid < s_bucket
    # sample_starts consistent with the sid array (first index of each sid;
    # empty samples scatter out of range and are dropped)
    starts = np.full(s_bucket, np.iinfo(np.int32).max, np.int32)
    for s in range(s_bucket - 1, -1, -1):
        w = np.nonzero(sid == s)[0]
        if w.size:
            starts[s] = w[0]
    tape = jnp.zeros(out_bucket, jnp.uint8)
    vals, gpos, _wins = _rank_core(
        tape, jnp.asarray(cand), jnp.asarray(scores, jnp.float32),
        jnp.asarray(starts), out_bucket=out_bucket, k=1,
        s_bucket=s_bucket, top=top, spb=spb,
    )
    return np.asarray(vals), np.asarray(gpos)


def _oracle_rows(out_bucket, s_bucket, top, sid, scores):
    vals = np.full((s_bucket, top), -np.inf, np.float32)
    gpos = np.zeros((s_bucket, top), np.int32)
    for s in range(s_bucket):
        sel = np.nonzero(sid == s)[0]
        order = sel[np.argsort(-scores[sel], kind="stable")][:top]
        vals[s, : len(order)] = scores[order]
        gpos[s, : len(order)] = order
    return vals, gpos


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_segmented_rank_matches_oracle_with_ties(seed, monkeypatch):
    """Quantized scores force heavy ties; segment layouts include samples
    spanning many blocks and several samples inside one block."""
    monkeypatch.setenv("VCF2PROT_RANK_BLK", "256")
    rng = np.random.default_rng(seed)
    out_bucket, s_bucket, top = 4096, 8, 5
    # contiguous segments with uneven sizes (some empty)
    cuts = np.sort(rng.integers(0, out_bucket, size=s_bucket - 1))
    bounds = np.concatenate([[0], cuts, [out_bucket]])
    sid = np.full(out_bucket, s_bucket, np.int32)
    for s in range(s_bucket):
        sid[bounds[s]: bounds[s + 1]] = s
    # knock ~30% of lanes out (non-candidates)
    sid[rng.random(out_bucket) < 0.3] = s_bucket
    scores = rng.integers(0, 7, size=out_bucket).astype(np.float32)
    spb = count_spb(bounds[:-1][np.diff(bounds) > 0], 256)
    assert use_segmented_rank(out_bucket, top, 256, spb)
    vals, gpos = _rank_rows(out_bucket, s_bucket, top, sid, scores, spb)
    ovals, ogpos = _oracle_rows(out_bucket, s_bucket, top, sid, scores)
    np.testing.assert_array_equal(vals, ovals)
    # positions must match exactly wherever the score is real (tie order!)
    real = ovals > -np.inf
    np.testing.assert_array_equal(gpos[real], ogpos[real])


def test_segmented_equals_global_rows(monkeypatch):
    """End-to-end run_chunk rows: forced-segmented == forced-global ==
    host oracle on the same cohort."""
    _names, progs, blob = build_cohort(seed=13, n_samples=6)
    k = 9
    params = init_params(k)
    top = 7

    monkeypatch.setenv("VCF2PROT_RANK_BLK", "1024")
    monkeypatch.setenv("VCF2PROT_SEG_RANK", "1")
    seg_rows = DeviceNeoantigenEngine(
        blob, k, params=params, top=top
    ).run_chunk(progs)
    monkeypatch.setenv("VCF2PROT_SEG_RANK", "0")
    glob_rows = DeviceNeoantigenEngine(
        blob, k, params=params, top=top
    ).run_chunk(progs)
    host_rows = _host_chunk_rows(progs, blob, k, params, top)
    assert any(len(r) > 0 for r in seg_rows.values())
    _assert_rows_match(seg_rows, glob_rows)
    _assert_rows_match(seg_rows, host_rows)


def test_segmented_sharded_matches_host(monkeypatch):
    """The dp-sharded chain shares _rank_core; forced-segmented shard rows
    must still equal the host oracle."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs a multi-device mesh")
    from vcf2prot_tpu.parallel.mesh import make_mesh
    from vcf2prot_tpu.parallel.sharded_neoantigen import (
        ShardedNeoantigenEngine,
    )

    monkeypatch.setenv("VCF2PROT_RANK_BLK", "1024")
    _names, progs, blob = build_cohort(seed=17, n_samples=8)
    k = 9
    params = init_params(k)
    eng = ShardedNeoantigenEngine(blob, make_mesh(), k, params=params, top=9)
    rows = eng.run_chunk(progs)
    assert rows is not None and any(len(r) > 0 for r in rows.values())
    _assert_rows_match(rows, _host_chunk_rows(progs, blob, k, params, 9))
