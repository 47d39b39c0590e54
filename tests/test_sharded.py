"""Multi-chip (virtual 8-device CPU mesh) execution parity and balance."""
import numpy as np
import pytest

from genvcf import random_cohort
from vcf2prot_tpu.compiler.haplotype import RefBlob, compile_haplotype
from vcf2prot_tpu.compiler.qc import QcConfig
from vcf2prot_tpu.frontend.maps import group_muts_per_transcript
from vcf2prot_tpu.parallel.mesh import make_mesh
from vcf2prot_tpu.parallel.sharded import ShardedEngine, partition_programs
from vcf2prot_tpu.runtime.cpu_engine import execute_tasks


def build_programs(seed, n_samples=8, n_transcripts=12):
    ref, samples = random_cohort(seed, n_samples, n_transcripts)
    blob = RefBlob.from_ref_seqs(ref)
    programs = []
    for _name, (h1, h2) in samples.items():
        for csqs in (h1, h2):
            programs.append(
                compile_haplotype(
                    group_muts_per_transcript(csqs), ref, blob, qc=QcConfig()
                )
            )
    return blob, programs


def test_mesh_has_8_virtual_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.parametrize("seed", [0, 3])
def test_sharded_matches_oracle(seed):
    blob, programs = build_programs(seed)
    engine = ShardedEngine(blob, make_mesh())
    outs = engine.execute(programs)
    assert len(outs) == len(programs)
    for prog, out in zip(programs, outs):
        np.testing.assert_array_equal(execute_tasks(prog, blob), out)


def test_sharded_on_subset_mesh():
    blob, programs = build_programs(1)
    engine = ShardedEngine(blob, make_mesh(2))
    outs = engine.execute(programs)
    for prog, out in zip(programs, outs):
        np.testing.assert_array_equal(execute_tasks(prog, blob), out)


def test_partition_balance():
    blob, programs = build_programs(2)
    shards = partition_programs(programs, 4)
    assert sorted(i for s in shards for i in s) == list(range(len(programs)))
    loads = [sum(programs[i].res_len for i in s) for s in shards]
    assert max(loads) <= 2 * (sum(loads) / len(loads)) + max(
        p.res_len for p in programs
    )


def test_sharded_pooled_cohort_shared_alt(tmp_path):
    """Pool-compiled cohorts take the shared_alt branch of the sharded
    executor (alt pool replicated like the blob, P() instead of P('dp'));
    outputs must still match the oracle."""
    from genvcf import shared_cohort, write_synthetic_vcf
    from vcf2prot_tpu.compiler.haplotype import AltPool, attach_pool
    from vcf2prot_tpu.compiler.proband import compile_proband
    from vcf2prot_tpu.pipeline import parse_vcf_to_int_maps

    ref, samples = shared_cohort(seed=9, n_samples=4, n_transcripts=8)
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
    outs = ShardedEngine(blob, make_mesh(4)).execute(progs)
    for prog, out in zip(progs, outs):
        np.testing.assert_array_equal(execute_tasks(prog, blob), out)


def test_sharded_aligned_and_delta_paths_agree(monkeypatch):
    """The sharded executor's word-aligned production kernel and the
    per-byte delta fallback must both equal the oracle (the default-path
    tests above already run aligned; this pins the fallback too)."""
    blob, programs = build_programs(5)
    aligned = ShardedEngine(blob, make_mesh(4)).execute(programs)
    monkeypatch.setenv("VCF2PROT_ALIGNED_EXEC", "0")
    delta = ShardedEngine(blob, make_mesh(4)).execute(programs)
    for prog, a, d in zip(programs, aligned, delta):
        oracle = execute_tasks(prog, blob)
        np.testing.assert_array_equal(oracle, a)
        np.testing.assert_array_equal(oracle, d)
