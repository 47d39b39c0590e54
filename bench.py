#!/usr/bin/env python
"""Benchmark harness.

Protocol mirrors the reference's published comparison methodology
(reference: automation_scripts/performance_benchmark.py:62-100): wall-clock a
single end-to-end invocation over a chromosome-scale synthetic cohort, after a
page-cache warmup pass. The baseline is the reference's own multi-threaded
engine (its prebuilt Linux binary) on this machine; ``vs_baseline`` is the
throughput ratio (ours / reference), so > 1.0 means faster than the reference.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

REF_BIN = "/root/reference/bins/Linux/vcf2prot"
WORKDIR = "/tmp/vcf2prot_bench"
N_SAMPLES = int(os.environ.get("BENCH_SAMPLES", "128"))
N_TRANSCRIPTS = int(os.environ.get("BENCH_TRANSCRIPTS", "1200"))
SEED = 20260817


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def prepare_workload():
    from genvcf import random_cohort, write_fasta, write_synthetic_vcf

    os.makedirs(WORKDIR, exist_ok=True)
    vcf = os.path.join(WORKDIR, f"cohort_{N_SAMPLES}x{N_TRANSCRIPTS}.vcf")
    fasta = os.path.join(WORKDIR, f"ref_{N_TRANSCRIPTS}.fasta")
    if not (os.path.exists(vcf) and os.path.exists(fasta)):
        log(f"generating workload: {N_SAMPLES} samples x {N_TRANSCRIPTS} transcripts")
        ref, samples = random_cohort(
            seed=SEED, n_samples=N_SAMPLES, n_transcripts=N_TRANSCRIPTS
        )
        write_synthetic_vcf(vcf, ref, samples)
        write_fasta(fasta, ref)
    return vcf, fasta


def run_reference(vcf, fasta):
    outdir = os.path.join(WORKDIR, "ref_out")
    env = dict(os.environ, NO_TEST="1")
    cmd = [REF_BIN, "-f", vcf, "-r", fasta, "-o", outdir, "-g", "mt"]
    times = []
    # warmup (page cache) + 2 timed runs, best taken -- the reference's own
    # protocol, hardened against co-tenant noise
    for rep in range(3):
        shutil.rmtree(outdir, ignore_errors=True)
        os.makedirs(outdir)
        t0 = time.perf_counter()
        subprocess.run(cmd, env=env, capture_output=True, check=True)
        if rep > 0:
            times.append(time.perf_counter() - t0)
    dt = min(times)
    log(f"reference mt: {dt:.3f}s best of {len(times)} "
        f"({N_SAMPLES / dt:.2f} samples/s)")
    return dt


def run_ours(vcf, fasta):
    from vcf2prot_tpu.pipeline import PipelineConfig, run_pipeline
    from vcf2prot_tpu.runtime.engine import Engine

    outdir = os.path.join(WORKDIR, "our_out")

    def one_run():
        shutil.rmtree(outdir, ignore_errors=True)
        os.makedirs(outdir)
        cfg = PipelineConfig(
            vcf_path=vcf,
            fasta_path=fasta,
            outdir=outdir,
            engine=Engine.from_str(os.environ.get("BENCH_ENGINE", "auto")),
            num_threads=os.cpu_count(),
            qc=None,
        )
        t0 = time.perf_counter()
        res = run_pipeline(cfg)
        return time.perf_counter() - t0, res

    one_run()  # warmup: page cache + jit compilation
    results = [one_run() for _ in range(3)]
    dt, res = min(results, key=lambda r: r[0])
    engine_name = os.environ.get("BENCH_ENGINE", "auto")
    log(f"ours ({engine_name}): {dt:.3f}s best of 3 "
        f"({N_SAMPLES / dt:.2f} samples/s)")
    for k, v in sorted(res.durations.items()):
        log(f"  {k}: {v:.3f}s")
    log(
        f"  {res.n_haplotype_seqs} haplotype seqs, "
        f"{res.total_output_bytes / 1e6:.1f} MB output"
    )
    return dt, res


def measure_device_throughput(vcf, fasta):
    """Warm device-execute throughput (the kernel itself, excluding the
    host link), reported to stderr for diagnostics."""
    import numpy as np

    from vcf2prot_tpu.compiler.haplotype import RefBlob
    from vcf2prot_tpu.compiler.qc import default_qc
    from vcf2prot_tpu.frontend.fasta import read_fasta
    from vcf2prot_tpu.native_bridge import compile_cohort_native
    from vcf2prot_tpu.runtime.pack import pack_cohort, pad_to_bucket

    try:
        import jax
        import jax.numpy as jnp

        if jax.devices()[0].platform == "cpu":
            return
        ref = read_fasta(fasta)
        blob = RefBlob.from_ref_seqs(ref)
        _p, programs, _w = compile_cohort_native(vcf, ref, blob, default_qc())
        packed = pack_cohort(programs, blob)
        n = len(packed.dst)
        tb = pad_to_bucket(n)
        ob = pad_to_bucket(packed.total_res)
        dst = np.full(tb, np.iinfo(np.int32).max, np.int32)
        dst[:n] = packed.dst
        srcb = np.zeros(tb, np.int32)
        srcb[:n] = packed.src_biased
        dev = jax.devices()[0]
        combined = jnp.concatenate(
            [jax.device_put(blob.data, dev), jax.device_put(packed.alt, dev)]
        )
        dst_d = jax.device_put(dst, dev)
        srcb_d = jax.device_put(srcb, dev)

        @jax.jit
        def run(c, d, sb):
            j = jnp.arange(ob, dtype=jnp.int32)
            t = jnp.searchsorted(d, j, side="right") - 1
            g = jnp.clip(sb[t] + j - d[t], 0, c.shape[0] - 1)
            return jnp.take(c, g)

        run(combined, dst_d, srcb_d).block_until_ready()  # compile
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(combined, dst_d, srcb_d)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        log(
            f"device execute (kernel only, {packed.total_res / 1e6:.1f} MB "
            f"result): {dt * 1e3:.3f} ms/iter = "
            f"{packed.total_res / dt / 1e9:.1f} GB/s output"
        )
    except Exception as err:
        log(f"device throughput probe skipped: {err}")


def main():
    os.environ.setdefault("NO_TEST", "1")
    vcf, fasta = prepare_workload()
    if os.environ.get("BENCH_DEVICE_METRIC", "1") == "1":
        measure_device_throughput(vcf, fasta)
    ours_dt, res = run_ours(vcf, fasta)
    if os.access(REF_BIN, os.X_OK):
        ref_dt = run_reference(vcf, fasta)
        vs_baseline = ref_dt / ours_dt
    else:
        vs_baseline = float("nan")
    print(
        json.dumps(
            {
                "metric": "end_to_end_samples_per_sec",
                "value": round(N_SAMPLES / ours_dt, 3),
                "unit": "samples/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
    # skip interpreter teardown: abandoned device-probe threads inside a hung
    # forwarded link must not turn a completed bench into a crash
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
