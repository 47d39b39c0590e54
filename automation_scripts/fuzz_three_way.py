#!/usr/bin/env python
"""Extended three-way differential campaign: Python tier vs C++ tier vs the
reference binary over many adversarial cohorts (the committed version of
round 3's 150-cohort sweep; re-run after any compiler/decoder change).

Per cohort: both our tiers must agree record-for-record; where the
reference binary survives (it crashes on some adversarial inputs --
ARCHITECTURE 4), its records must match ours too.

    python automation_scripts/fuzz_three_way.py [--n 150] [--start 100]
"""
import argparse
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

REF_BIN = "/root/reference/bins/Linux/vcf2prot"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=150)
    ap.add_argument("--start", type=int, default=100,
                    help="first seed (the test suite owns 0-7)")
    args = ap.parse_args()

    from genvcf import (
        adversarial_cohort,
        read_fasta_records,
        write_fasta,
        write_synthetic_vcf,
    )
    from vcf2prot_tpu.compiler.qc import QC_OFF
    from vcf2prot_tpu.pipeline import PipelineConfig, run_pipeline
    from vcf2prot_tpu.runtime.engine import Engine

    has_ref = os.access(REF_BIN, os.X_OK)
    tier_mismatch = ref_mismatch = ref_crash = 0
    for i in range(args.n):
        seed = args.start + i
        with tempfile.TemporaryDirectory() as d:
            ref, samples = adversarial_cohort(
                seed, n_samples=5, n_transcripts=10
            )
            vcf = os.path.join(d, "c.vcf")
            fasta = os.path.join(d, "r.fasta")
            write_synthetic_vcf(vcf, ref, samples)
            write_fasta(fasta, ref)
            outs = {}
            for tier, native in (("py", False), ("cpp", True)):
                out = os.path.join(d, tier)
                os.makedirs(out)
                run_pipeline(PipelineConfig(
                    vcf_path=vcf, fasta_path=fasta, outdir=out,
                    engine=Engine.ST, use_native=native, qc=QC_OFF,
                ))
                outs[tier] = {
                    f: read_fasta_records(os.path.join(out, f))
                    for f in sorted(os.listdir(out))
                }
            if outs["py"] != outs["cpp"]:
                tier_mismatch += 1
                log(f"seed {seed}: PY/CPP TIER MISMATCH")
                continue
            if not has_ref:
                continue
            ref_out = os.path.join(d, "refbin")
            os.makedirs(ref_out)
            proc = subprocess.run(
                [REF_BIN, "-f", vcf, "-r", fasta, "-o", ref_out, "-g",
                 "mt"],
                env=dict(os.environ, NO_TEST="1"), capture_output=True,
            )
            if proc.returncode != 0:
                ref_crash += 1  # we complete cohorts the reference crashes on
                continue
            ref_recs = {
                f: read_fasta_records(os.path.join(ref_out, f))
                for f in sorted(os.listdir(ref_out))
            }
            ok = set(ref_recs) == set(outs["py"]) and all(
                ref_recs[f] == outs["py"][f] for f in ref_recs
            )
            if not ok:
                ref_mismatch += 1
                log(f"seed {seed}: REFERENCE MISMATCH")
        if (i + 1) % 25 == 0:
            log(f"{i + 1}/{args.n} cohorts...")
    log(f"{args.n} adversarial cohorts: {tier_mismatch} tier mismatches, "
        f"{ref_mismatch} reference mismatches, {ref_crash} reference "
        f"crashes (we completed those)")
    sys.exit(1 if (tier_mismatch or ref_mismatch) else 0)


if __name__ == "__main__":
    main()
