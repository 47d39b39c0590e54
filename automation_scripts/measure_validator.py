#!/usr/bin/env python
"""Measure the Pallas device-side task-stream validator on the real TPU.

Records the hardware cost of the ``DEBUG_GPU`` validation pass
(runtime/kernels.py) -- the check the reference documents but stubs
(reference: cli.rs:96, gir.rs:283-299). Run under ``timeout`` (slow
forwarded D2H link; see CLAUDE.md).

Usage:  timeout 600 python automation_scripts/measure_validator.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)

N_SAMPLES = int(os.environ.get("VAL_SAMPLES", "64"))
N_TXP = int(os.environ.get("VAL_TRANSCRIPTS", "600"))


def main():
    import numpy as np

    from genvcf import random_cohort, write_fasta, write_synthetic_vcf
    from vcf2prot_tpu.compiler.haplotype import RefBlob
    from vcf2prot_tpu.compiler.qc import QC_OFF
    from vcf2prot_tpu.frontend import fasta as fasta_mod
    from vcf2prot_tpu.native_bridge import compile_cohort_native
    from vcf2prot_tpu.runtime.pack import pack_cohort
    from vcf2prot_tpu.runtime.kernels import validate_on_device

    workdir = "/tmp/vcf2prot_validator"
    os.makedirs(workdir, exist_ok=True)
    vcf = os.path.join(workdir, f"c_{N_SAMPLES}x{N_TXP}.vcf")
    fasta = os.path.join(workdir, f"r_{N_TXP}.fasta")
    if not (os.path.exists(vcf) and os.path.exists(fasta)):
        ref, samples = random_cohort(
            seed=20260820, n_samples=N_SAMPLES, n_transcripts=N_TXP
        )
        write_synthetic_vcf(vcf, ref, samples)
        write_fasta(fasta, ref)

    ref_seqs = fasta_mod.read_fasta(fasta)
    blob = RefBlob.from_ref_seqs(ref_seqs)
    # QC off: the random cohort deliberately contains transcripts the
    # inspect pass would skip; we want the full task stream
    _, programs, _ = compile_cohort_native(vcf, ref_seqs, blob, QC_OFF)
    packed = pack_cohort(programs, blob)
    lengths = np.diff(np.append(packed.dst, packed.total_res)).astype(np.int32)
    combined_len = len(blob.data) + len(packed.alt)
    n_tasks = len(packed.dst)
    print(
        f"cohort {N_SAMPLES}x{N_TXP}: {n_tasks} tasks, "
        f"{packed.total_res / 1e6:.1f} MB result tape",
        flush=True,
    )

    import jax

    print(f"backend: {jax.devices()[0].platform}", flush=True)

    # warm compile + first run
    t0 = time.perf_counter()
    errs = validate_on_device(
        packed.dst, lengths, packed.src_biased,
        combined_len=combined_len, res_len=packed.total_res,
    )
    print(
        f"cold (compile+run): {time.perf_counter() - t0:.3f}s, errors={errs}",
        flush=True,
    )
    assert errs == 0

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        errs = validate_on_device(
            packed.dst, lengths, packed.src_biased,
            combined_len=combined_len, res_len=packed.total_res,
        )
        times.append(time.perf_counter() - t0)
        assert errs == 0
    # validate_on_device fetches the scalar error count host-side, which is a
    # real D2H sync on this link (CLAUDE.md: block_until_ready is a no-op)
    best = min(times)
    print(
        f"warm validator: {best * 1e3:.2f} ms best of 5 "
        f"({n_tasks / best / 1e6:.1f} M tasks/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
