#!/usr/bin/env python
"""Out-of-process cohort sharding across sample batches.

Counterpart of the reference's process-pool wrapper (reference:
automation_scripts/parallization_python.py:196-207): split a cohort
BCF/VCF into per-batch sample subsets with ``bcftools view -S`` and run one
pipeline process per batch. Within one host the in-process engines already
use every core, so this wrapper is mainly for spreading one cohort across
*machines* (submit one batch per node) or for memory-capping very large
cohorts; the TPU-native equivalent for multi-chip scale-out is
``vcf2prot_tpu.parallel.sharded`` (one mesh, dp-sharded cohort).
"""
import argparse
import os
import subprocess
import sys
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_samples(vcf):
    out = subprocess.run(
        ["bcftools", "query", "-l", vcf], check=True, capture_output=True,
        text=True,
    )
    return [s for s in out.stdout.splitlines() if s]


def run_batch(args):
    vcf, fasta, outdir, samples, engine = args
    os.makedirs(outdir, exist_ok=True)
    sample_file = os.path.join(outdir, "samples.txt")
    with open(sample_file, "w") as fh:
        fh.write("\n".join(samples) + "\n")
    batch_vcf = os.path.join(outdir, "batch.vcf")
    subprocess.run(
        ["bcftools", "view", vcf, "-S", sample_file, "-O", "v", "-o", batch_vcf],
        check=True,
    )
    cmd = [
        sys.executable, "-m", "vcf2prot_tpu",
        "-f", batch_vcf, "-r", fasta, "-o", outdir, "-g", engine,
    ]
    env = dict(os.environ)
    env.setdefault("NO_TEST", "1")
    proc = subprocess.run(cmd, env=env)
    return proc.returncode


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-f", "--vcf_file", required=True)
    ap.add_argument("-r", "--fasta_ref", required=True)
    ap.add_argument("-o", "--output_dir", required=True)
    ap.add_argument("-b", "--batch_size", type=int, default=64)
    ap.add_argument("-j", "--jobs", type=int, default=os.cpu_count())
    ap.add_argument("-g", "--engine", default="mt")
    args = ap.parse_args(argv)

    samples = get_samples(args.vcf_file)
    batches = [
        samples[i:i + args.batch_size]
        for i in range(0, len(samples), args.batch_size)
    ]
    jobs = [
        (
            args.vcf_file,
            args.fasta_ref,
            os.path.join(args.output_dir, f"batch_{i:04d}"),
            batch,
            args.engine,
        )
        for i, batch in enumerate(batches)
    ]
    failures = 0
    with ProcessPoolExecutor(max_workers=args.jobs) as pool:
        for rc in pool.map(run_batch, jobs):
            if rc != 0:
                failures += 1
    print(f"{len(batches) - failures}/{len(batches)} batches succeeded")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
