#!/usr/bin/env python
"""North-star scale run: 2,504-sample chromosome-scale cohort (BASELINE.json).

Mirrors the 1000-Genomes phase-3 shape the reference was benchmarked against
(reference: automation_scripts/performance_benchmark.py:25-33 sweeps patient
counts on a chromosome-1 VCF; README.md:48 notes the CPU node held the whole
file in memory): 2,504 samples over a chromosome's worth of protein-coding
transcripts, with population-shared variant bundles (tests/genvcf.py
shared_cohort) -- the variant-sharing regime the compile memo exploits.

Usage:  python automation_scripts/northstar_scale.py [--samples N]
        [--transcripts N] [--skip-reference]

Writes one JSON line to stdout; stage diagnostics to stderr.
"""
import argparse
import json
import os
import shutil
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

REF_BIN = "/root/reference/bins/Linux/vcf2prot"
WORKDIR = "/tmp/vcf2prot_northstar"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def prepare(n_samples, n_transcripts, seed=20260818):
    from genvcf import shared_cohort, write_fasta, write_synthetic_vcf

    os.makedirs(WORKDIR, exist_ok=True)
    vcf = os.path.join(WORKDIR, f"cohort_{n_samples}x{n_transcripts}.vcf")
    fasta = os.path.join(WORKDIR, f"ref_{n_transcripts}.fasta")
    if not (os.path.exists(vcf) and os.path.exists(fasta)):
        t0 = time.perf_counter()
        log(f"generating shared cohort: {n_samples} samples x "
            f"{n_transcripts} transcripts")
        ref, samples = shared_cohort(
            seed=seed, n_samples=n_samples, n_transcripts=n_transcripts,
            bundles_per_txp=4, carrier_p=0.35,
        )
        write_synthetic_vcf(vcf, ref, samples)
        write_fasta(fasta, ref)
        log(f"generated in {time.perf_counter() - t0:.1f}s: "
            f"{os.path.getsize(vcf) / 1e6:.1f} MB VCF, "
            f"{os.path.getsize(fasta) / 1e6:.1f} MB FASTA")
    return vcf, fasta


def run_ours(vcf, fasta, n_samples):
    from vcf2prot_tpu.pipeline import PipelineConfig, run_pipeline
    from vcf2prot_tpu.runtime.engine import Engine

    outdir = os.path.join(WORKDIR, "our_out")
    best = None
    for rep in range(2):  # warmup (page cache) + timed
        shutil.rmtree(outdir, ignore_errors=True)
        os.makedirs(outdir)
        cfg = PipelineConfig(
            vcf_path=vcf, fasta_path=fasta, outdir=outdir,
            engine=Engine.MT, num_threads=os.cpu_count(), qc=None,
        )
        t0 = time.perf_counter()
        res = run_pipeline(cfg)
        dt = time.perf_counter() - t0
        if rep > 0:
            best = (dt, res)
    dt, res = best
    log(f"ours (mt): {dt:.3f}s ({n_samples / dt:.2f} samples/s)")
    for k, v in sorted(res.durations.items()):
        log(f"  {k}: {v:.3f}s")
    log(f"  {res.n_haplotype_seqs} haplotype seqs, "
        f"{res.total_output_bytes / 1e6:.1f} MB output")
    return dt


def run_reference(vcf, fasta, n_samples):
    outdir = os.path.join(WORKDIR, "ref_out")
    env = dict(os.environ, NO_TEST="1")
    cmd = [REF_BIN, "-f", vcf, "-r", fasta, "-o", outdir, "-g", "mt"]
    best = None
    for rep in range(2):
        shutil.rmtree(outdir, ignore_errors=True)
        os.makedirs(outdir)
        t0 = time.perf_counter()
        subprocess.run(cmd, env=env, capture_output=True, check=True)
        dt = time.perf_counter() - t0
        if rep > 0:
            best = dt
    log(f"reference mt: {best:.3f}s ({n_samples / best:.2f} samples/s)")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=2504)
    ap.add_argument("--transcripts", type=int, default=2000)
    ap.add_argument("--skip-reference", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("NO_TEST", "1")
    vcf, fasta = prepare(args.samples, args.transcripts)
    ours_dt = run_ours(vcf, fasta, args.samples)
    if not args.skip_reference and os.access(REF_BIN, os.X_OK):
        ref_dt = run_reference(vcf, fasta, args.samples)
        vs = ref_dt / ours_dt
    else:
        vs = float("nan")
    print(json.dumps({
        "metric": "northstar_samples_per_sec",
        "value": round(args.samples / ours_dt, 3),
        "unit": "samples/s",
        "vs_baseline": round(vs, 3),
        "samples": args.samples,
        "transcripts": args.transcripts,
    }))


if __name__ == "__main__":
    main()
