#!/usr/bin/env python
"""Corruption fuzz of the native ingest: mutated VCF/BCF/FASTA files must
produce clean Python exceptions (or clean results), never a process crash.

Round 3 ran a 6,600-file campaign ad hoc; this is the committed,
reproducible harness (re-run after any native/ decode change). Each batch
runs in a SUBPROCESS so a segfault/abort in the C++ tier is detected as a
non-zero exit instead of killing the driver.

    python automation_scripts/fuzz_native_ingest.py [--n 600] [--seed 0]
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

_BATCH = r"""
import io, json, random, sys, os
repo = sys.argv[1]
seed = int(sys.argv[2])
kind = sys.argv[3]
n = int(sys.argv[4])
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "tests"))
os.environ.setdefault("NO_TEST", "1")
import numpy as np
from genvcf import random_cohort, write_synthetic_vcf, write_fasta
from vcf2prot_tpu.compiler.haplotype import RefBlob
from vcf2prot_tpu.compiler.qc import QC_OFF
from vcf2prot_tpu.native_bridge import compile_cohort_native
import tempfile, gzip

work = tempfile.mkdtemp()
ref, samples = random_cohort(seed=7, n_samples=4, n_transcripts=8)
vcf_p = os.path.join(work, "c.vcf")
fa_p = os.path.join(work, "r.fasta")
write_synthetic_vcf(vcf_p, ref, samples)
write_fasta(fa_p, ref)
base_vcf = open(vcf_p, "rb").read()
base_fa = open(fa_p, "rb").read()
if kind == "bcf":
    from genbcf import write_synthetic_bcf
    bcf_p = os.path.join(work, "c.bcf")
    write_synthetic_bcf(bcf_p, ref, samples)
    base_vcf = open(bcf_p, "rb").read()
elif kind == "gz":
    base_vcf = gzip.compress(base_vcf)

rng = random.Random(seed)
blob = RefBlob.from_ref_seqs(ref)

def mutate(data):
    data = bytearray(data)
    op = rng.randrange(5)
    if not data:
        return bytes(data)
    if op == 0:  # byte flips
        for _ in range(rng.randrange(1, 8)):
            i = rng.randrange(len(data))
            data[i] = rng.randrange(256)
    elif op == 1:  # truncation
        del data[rng.randrange(len(data)):]
    elif op == 2:  # span delete
        i = rng.randrange(len(data))
        del data[i:i + rng.randrange(1, 256)]
    elif op == 3:  # span duplicate
        i = rng.randrange(len(data))
        span = bytes(data[i:i + rng.randrange(1, 128)])
        data[i:i] = span
    else:  # garbage insert
        i = rng.randrange(len(data))
        data[i:i] = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 64)))
    return bytes(data)

clean_errors = 0
clean_ok = 0
for trial in range(n):
    if kind == "fasta":
        fa_m = os.path.join(work, "m.fasta")
        open(fa_m, "wb").write(mutate(base_fa))
        try:
            from vcf2prot_tpu.frontend.fasta import read_fasta
            ref_m = read_fasta(fa_m)
            blob_m = RefBlob.from_ref_seqs(ref_m)
            compile_cohort_native(vcf_p, ref_m, blob_m, QC_OFF)
            clean_ok += 1
        except Exception:
            clean_errors += 1
    else:
        vcf_m = os.path.join(work, "m.vcf" if kind == "vcf" else
                             ("m.bcf" if kind == "bcf" else "m.vcf.gz"))
        open(vcf_m, "wb").write(mutate(base_vcf))
        try:
            compile_cohort_native(vcf_m, ref, blob, QC_OFF)
            clean_ok += 1
        except Exception:
            clean_errors += 1
print(json.dumps({"kind": kind, "n": n, "ok": clean_ok,
                  "error": clean_errors}))
sys.stdout.flush()
os._exit(0)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=600,
                    help="mutated files per input kind")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    total = {"ok": 0, "error": 0}
    failed = False
    for kind in ("vcf", "bcf", "gz", "fasta"):
        proc = subprocess.run(
            [sys.executable, "-c", _BATCH, REPO, str(args.seed), kind,
             str(args.n)],
            capture_output=True, text=True, timeout=1800,
        )
        if proc.returncode != 0:
            print(f"{kind}: PROCESS CRASH (rc={proc.returncode})\n"
                  f"{proc.stderr[-1500:]}", file=sys.stderr, flush=True)
            failed = True
            continue
        r = json.loads(proc.stdout.strip().splitlines()[-1])
        total["ok"] += r["ok"]
        total["error"] += r["error"]
        print(f"{kind}: {r['n']} mutated files -> {r['ok']} clean results, "
              f"{r['error']} clean errors, 0 crashes", flush=True)
    print(("FAIL" if failed else "PASS") +
          f": {total['ok'] + total['error']} files, zero process crashes"
          if not failed else "FAIL: crash detected")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
