#!/usr/bin/env python
"""Batch automation: run the pipeline over a directory of BCF/VCF files.

Counterpart of the reference's file automation wrapper (reference:
automation_scripts/file_automation.py). BCF inputs are read natively by the
pipeline (no bcftools needed); ``bcftools view`` is used only as a fallback
when the native tier is unavailable. Failures are counted and reported, not
fatal (the reference's batch-resilience policy; parallization_python.py:
209-220).
"""
import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vcf2prot_tpu.pipeline import PipelineConfig, run_pipeline
from vcf2prot_tpu.runtime.engine import Engine


def convert_bcf(path, workdir):
    out = os.path.join(workdir, os.path.basename(path) + ".vcf")
    subprocess.run(
        ["bcftools", "view", path, "-o", out, "-O", "v"], check=True
    )
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-d", "--input_dir", required=True)
    ap.add_argument("-r", "--fasta_ref", required=True)
    ap.add_argument("-o", "--output_dir", required=True)
    ap.add_argument("-g", "--engine", default="auto")
    ap.add_argument("-s", "--stats", action="store_true")
    args = ap.parse_args(argv)

    files = sorted(
        f
        for f in os.listdir(args.input_dir)
        if f.endswith((".bcf", ".bcf.gz", ".vcf", ".vcf.gz"))
    )
    failures = 0
    for f in files:
        src = os.path.join(args.input_dir, f)
        outdir = os.path.join(args.output_dir, f.split(".")[0])
        os.makedirs(outdir, exist_ok=True)
        try:
            from vcf2prot_tpu.native_bridge import load_native

            needs_convert = (
                f.endswith((".bcf", ".bcf.gz")) and load_native() is None
            )
            vcf = convert_bcf(src, outdir) if needs_convert else src
            run_pipeline(
                PipelineConfig(
                    vcf_path=vcf,
                    fasta_path=args.fasta_ref,
                    outdir=outdir,
                    engine=Engine.from_str(args.engine),
                    compute_stats=args.stats,
                    verbose=True,
                )
            )
        except Exception as err:
            print(f"FAILED {f}: {err}", file=sys.stderr)
            failures += 1
    print(f"processed {len(files) - failures}/{len(files)} files")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
