"""Multi-host sharding logic (simulated: shard assignment + disjoint outputs)."""
import os

from genvcf import random_cohort, write_fasta, write_synthetic_vcf
from vcf2prot_tpu.parallel.multihost import host_sample_shard
from vcf2prot_tpu.pipeline import PipelineConfig, run_pipeline
from vcf2prot_tpu.runtime.engine import Engine


def test_round_robin_shards_partition():
    n = 23
    shards = [host_sample_shard(n, pi, 4) for pi in range(4)]
    flat = sorted(i for s in shards for i in s)
    assert flat == list(range(n))
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1


def test_simulated_two_host_run(tmp_path):
    """Two 'hosts' each run their shard; the union equals the full run."""
    ref, samples = random_cohort(seed=13, n_samples=6, n_transcripts=8)
    vcf = tmp_path / "c.vcf"
    fasta = tmp_path / "r.fasta"
    write_synthetic_vcf(str(vcf), ref, samples)
    write_fasta(str(fasta), ref)

    full = tmp_path / "full"
    full.mkdir()
    run_pipeline(
        PipelineConfig(
            vcf_path=str(vcf), fasta_path=str(fasta), outdir=str(full),
            engine=Engine.ST,
        )
    )

    union = {}
    for pi in range(2):
        shard_out = tmp_path / f"shard{pi}"
        shard_out.mkdir()
        run_pipeline(
            PipelineConfig(
                vcf_path=str(vcf), fasta_path=str(fasta),
                outdir=str(shard_out), engine=Engine.ST,
                sample_indices=host_sample_shard(6, pi, 2),
            )
        )
        for f in os.listdir(shard_out):
            assert f not in union, "sample written by two shards"
            union[f] = (shard_out / f).read_bytes()

    full_files = {f: (full / f).read_bytes() for f in os.listdir(full)}
    assert union == full_files
