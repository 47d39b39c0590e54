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


def run_with_watchdog(fn, seconds, label):
    """Run a diagnostic under a watchdog thread: a stalled forwarded device
    link (multi-minute hangs, CLAUDE.md) must cost one abandoned daemon
    thread, never the bench's JSON line. The interpreter exits via
    ``os._exit`` so leaked threads cannot hang teardown. Returns fn's
    result, or None if the watchdog expired."""
    import threading

    box = {}

    def run():
        box["result"] = fn()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(seconds)
    if t.is_alive():
        log(f"{label} watchdog expired after {seconds}s (device link "
            "stalled); continuing")
    return box.get("result")


def measure_device_throughput(vcf, fasta):
    """Warm device-execute throughput (the kernel itself, excluding the
    host link), reported to stderr for diagnostics; returns output GB/s
    (or None off-device / on failure) for the structured JSON line."""
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
        dev = jax.devices()[0]
        combined = jnp.concatenate(
            [jax.device_put(blob.data, dev), jax.device_put(packed.alt, dev)]
        )
        # the PRODUCTION kernel: the word-aligned executor
        # (runtime/tpu_engine.py, 1.34x the per-byte delta kernel on the
        # real chip -- ARCHITECTURE 2.3), pre-uploaded so this times the
        # kernel alone
        from vcf2prot_tpu.runtime.tpu_engine import (
            _get_aligned_jitted,
            build_aligned_program,
        )

        wstart, wbase, bpos, bsrc = build_aligned_program(
            packed.dst, packed.src_biased, packed.total_res,
            int(combined.shape[0]),
        )
        ws = np.full(tb, np.iinfo(np.int32).max, np.int32)
        ws[:n] = wstart
        wb = np.zeros(tb, np.int32)
        wb[:n] = wbase
        bb = pad_to_bucket(max(len(bpos), 1))
        bp = np.full(bb, ob + 8, np.int32)
        bp[: len(bpos)] = bpos
        bs = np.zeros(bb, np.int32)
        bs[: len(bsrc)] = bsrc
        args = tuple(
            jax.device_put(a, dev) for a in (ws, wb, bp, bs)
        )
        run = _get_aligned_jitted()(ob)

        def sync(x):
            # on the forwarded dev link block_until_ready returns before the
            # computation finishes; a 1-byte D2H fetch is the only true sync
            np.asarray(x[:1])

        sync(run(combined, *args))  # compile
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(combined, *args)
        sync(out)
        dt = (time.perf_counter() - t0) / reps
        gbps = packed.total_res / dt / 1e9
        log(
            f"device execute (kernel only, {packed.total_res / 1e6:.1f} MB "
            f"result): {dt * 1e3:.3f} ms/iter = "
            f"{gbps:.3f} GB/s output"
        )
        return gbps
    except Exception as err:
        log(f"device throughput probe skipped: {err}")
        return None


def measure_shared_regime():
    """Shared-variant (1000G-like) cohort regime: the adaptive alt pool and
    compile memo must stay ON here. Reported to stderr every round so both
    regimes (near-unique main bench + shared bundles) are continuously
    measured. Disable with BENCH_SHARED=0."""
    from genvcf import shared_cohort, write_fasta, write_synthetic_vcf

    n_samples = int(os.environ.get("BENCH_SHARED_SAMPLES", "128"))
    n_txp = int(os.environ.get("BENCH_SHARED_TRANSCRIPTS", "400"))
    vcf = os.path.join(WORKDIR, f"shared_{n_samples}x{n_txp}.vcf")
    fasta = os.path.join(WORKDIR, f"shared_ref_{n_txp}.fasta")
    if not (os.path.exists(vcf) and os.path.exists(fasta)):
        log(f"generating shared-variant cohort: {n_samples} x {n_txp}")
        ref, samples = shared_cohort(
            seed=SEED, n_samples=n_samples, n_transcripts=n_txp
        )
        write_synthetic_vcf(vcf, ref, samples)
        write_fasta(fasta, ref)

    from vcf2prot_tpu.pipeline import PipelineConfig, run_pipeline
    from vcf2prot_tpu.runtime.engine import Engine

    outdir = os.path.join(WORKDIR, "shared_out")

    def one_run():
        shutil.rmtree(outdir, ignore_errors=True)
        os.makedirs(outdir)
        cfg = PipelineConfig(
            vcf_path=vcf, fasta_path=fasta, outdir=outdir,
            engine=Engine.MT, num_threads=os.cpu_count(), qc=None,
        )
        t0 = time.perf_counter()
        run_pipeline(cfg)
        return time.perf_counter() - t0

    one_run()
    ours = min(one_run() for _ in range(2))
    line = (f"shared-variant regime (mt): {ours:.3f}s "
            f"({n_samples / ours:.2f} samples/s)")
    if os.access(REF_BIN, os.X_OK):
        ref_out = os.path.join(WORKDIR, "shared_ref_out")
        env = dict(os.environ, NO_TEST="1")
        cmd = [REF_BIN, "-f", vcf, "-r", fasta, "-o", ref_out, "-g", "mt"]
        best = None
        for rep in range(2):
            shutil.rmtree(ref_out, ignore_errors=True)
            os.makedirs(ref_out)
            t0 = time.perf_counter()
            subprocess.run(cmd, env=env, capture_output=True, check=True)
            if rep > 0:
                best = time.perf_counter() - t0
        line += (f"; reference: {best:.3f}s "
                 f"({n_samples / best:.2f} samples/s) -> "
                 f"{best / ours:.1f}x")
    log(line)


_NEO_SNIPPET = r"""
import json, sys, time, shutil, os, threading
os.environ.setdefault("NO_TEST", "1")  # synthetic cohorts trip the QC system
repo, vcf, fasta, outbase = sys.argv[1:5]
sys.path.insert(0, repo)

# First-touch probe: a fresh process's first device interaction stalls for
# multiple minutes on this forwarded link roughly half the time (and a
# stalled session usually never recovers). Detect it with a tiny roundtrip
# under a deadline and exit 3 EARLY so the harness can retry in a fresh
# process instead of burning the full leg timeout. A session that passes
# the probe tends to stay responsive.
def _probe():
    import numpy as np
    import jax, jax.numpy as jnp
    x = jax.device_put(np.ones(1024, np.float32), jax.devices()[0])
    float(np.asarray(jnp.sum(x).reshape(1))[0])
    _probe.ok = True
_probe.ok = False
t = threading.Thread(target=_probe, daemon=True)
t.start(); t.join(float(os.environ.get("BENCH_NEO_PROBE_S", "240")))
if not _probe.ok:
    print(json.dumps({"stalled": True})); sys.stdout.flush(); os._exit(3)

from vcf2prot_tpu.pipeline import PipelineConfig, run_pipeline
from vcf2prot_tpu.runtime.engine import Engine
def one(mode):
    outdir = outbase + "_" + mode
    shutil.rmtree(outdir, ignore_errors=True); os.makedirs(outdir)
    cfg = PipelineConfig(
        vcf_path=vcf, fasta_path=fasta, outdir=outdir,
        engine=Engine.TPU if mode == "tpu" else Engine.MT,
        num_threads=os.cpu_count(), qc=None,
        neoantigen_k=9, neoantigen_only=True,
        neoantigen_device=(mode != "tpu"),
    )
    t0 = time.perf_counter(); run_pipeline(cfg)
    return time.perf_counter() - t0
# both legs in ONE process: one first-touch risk, one warm backend. cold =
# page cache + jit compiles (served by the persistent XLA compile cache
# when warm, utils/jaxcache.py), reported separately.
out = {}
for mode in ("tpu", "mt"):
    cold = one(mode)
    out[mode] = {"cold": cold, "dt": min(one(mode) for _ in range(2))}
print(json.dumps(out)); sys.stdout.flush()
os._exit(0)  # skip teardown: device threads may hang
"""


def measure_neoantigen_e2e():
    """End-to-end device-resident neoantigen run on the real chip vs the
    host-execute path on the same cohort: the workload where only [S, top]
    rows cross the device->host link, so the TPU is load-bearing end-to-end
    (not just a kernel diagnostic). Subprocess + timeout: a stalled link
    must not hang the bench. Disable with BENCH_NEOANTIGEN=0.

    Defaults to the STANDARD headline cohort (128x1200; BENCH_NEO_SAMPLES /
    BENCH_NEO_TRANSCRIPTS to resize). A fully cold persistent cache costs
    one ~7-minute remote-compile attempt, which fits the per-attempt
    timeout; with a warm cache both legs complete in seconds."""
    from genvcf import random_cohort, write_fasta, write_synthetic_vcf

    n_samples = int(os.environ.get("BENCH_NEO_SAMPLES", str(N_SAMPLES)))
    n_txp = int(os.environ.get("BENCH_NEO_TRANSCRIPTS", str(N_TRANSCRIPTS)))
    # stalled attempts self-terminate at ~BENCH_NEO_PROBE_S via the probe,
    # so the leg timeout only binds while real work (compile + runs) is
    # happening -- generous beats truncating a cold-compile attempt
    timeout = int(os.environ.get("BENCH_NEO_TIMEOUT", "900"))
    vcf = os.path.join(WORKDIR, f"cohort_{n_samples}x{n_txp}.vcf")
    fasta = os.path.join(WORKDIR, f"ref_{n_txp}.fasta")
    if not (os.path.exists(vcf) and os.path.exists(fasta)):
        log(f"generating neoantigen cohort: {n_samples} x {n_txp}")
        ref, samples = random_cohort(
            seed=SEED, n_samples=n_samples, n_transcripts=n_txp
        )
        write_synthetic_vcf(vcf, ref, samples)
        write_fasta(fasta, ref)
    repo = os.path.dirname(os.path.abspath(__file__))
    results = {}
    outbase = os.path.join(WORKDIR, "neo")
    # retries in FRESH subprocesses: the forwarded link's first device touch
    # stalls for minutes about half the time and a stalled session rarely
    # recovers. The snippet detects the stall with a deadline probe and
    # exits early (rc 3), so a failed attempt costs ~BENCH_NEO_PROBE_S, and
    # the persistent compile cache lets the succeeding attempt skip
    # straight to execution.
    for attempt in range(int(os.environ.get("BENCH_NEO_ATTEMPTS", "3"))):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _NEO_SNIPPET, repo, vcf, fasta,
                 outbase],
                capture_output=True, timeout=timeout, text=True,
            )
            payload = json.loads(proc.stdout.strip().splitlines()[-1])
            if payload.get("stalled"):
                log(f"neoantigen e2e attempt {attempt + 1}: device "
                    "first-touch stalled; retrying in a fresh process")
                continue
            results = payload
            break
        except Exception as err:
            log(f"neoantigen e2e attempt {attempt + 1} failed: {err}")
    for mode, label in (("tpu", "device-resident"), ("mt", "host-execute")):
        if mode in results:
            r = results[mode]
            log(f"neoantigen e2e ({label}, {n_samples}x{n_txp}, k=9 "
                f"top-200): {r['dt']:.3f}s warm "
                f"({n_samples / r['dt']:.2f} samples/s), "
                f"cold {r['cold']:.3f}s")
    if "tpu" in results and "mt" in results:
        log(f"neoantigen device/host speed ratio: "
            f"{results['mt']['dt'] / results['tpu']['dt']:.2f}x warm")
    return results


def main():
    os.environ.setdefault("NO_TEST", "1")
    vcf, fasta = prepare_workload()
    # headline measurement FIRST: the device probe and the neoantigen
    # subprocesses can occupy both vCPUs for minutes, and CLAUDE.md's
    # co-tenancy rule is that nothing else may run while the headline
    # number is taken
    ours_dt, res = run_ours(vcf, fasta)
    if os.access(REF_BIN, os.X_OK):
        ref_dt = run_reference(vcf, fasta)
        vs_baseline = ref_dt / ours_dt
    else:
        vs_baseline = float("nan")
    # structured fields for the flagship device story: carried in the
    # parsed stdout JSON so cross-round regression tracking is mechanical
    # (stderr stays the human-readable diagnostic log)
    extra = {}
    if os.environ.get("BENCH_DEVICE_METRIC", "1") == "1":
        gbps = run_with_watchdog(
            lambda: measure_device_throughput(vcf, fasta), 600,
            "device throughput probe",
        )
        if gbps is not None:  # 0.0 is a legitimate (terrible) measurement
            extra["kernel_gbps"] = round(gbps, 4)
    if os.environ.get("BENCH_NEOANTIGEN", "1") == "1":
        neo = measure_neoantigen_e2e()  # subprocesses w/ their own timeouts
        if "tpu" in neo:
            extra["neo_device_warm_s"] = round(neo["tpu"]["dt"], 3)
            extra["neo_cold_s"] = round(neo["tpu"]["cold"], 3)
        if "mt" in neo:
            extra["neo_host_warm_s"] = round(neo["mt"]["dt"], 3)
            extra["neo_host_cold_s"] = round(neo["mt"]["cold"], 3)
        if "tpu" in neo and "mt" in neo:
            extra["neo_ratio"] = round(
                neo["mt"]["dt"] / neo["tpu"]["dt"], 3
            )
            extra["neo_cold_ratio"] = round(
                neo["mt"]["cold"] / neo["tpu"]["cold"], 3
            )
    # flagship north-star fields: BENCH_NORTHSTAR=1 re-measures on the real
    # chip (automation_scripts/northstar_neoantigen.py, ~30-60 min); the
    # default cites the committed artifact so the driver-visible number
    # exists every round without blowing the bench budget
    ns_art = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "automation_scripts",
        "artifacts", "northstar_neoantigen.tsv",
    )
    if os.environ.get("BENCH_NORTHSTAR", "0") == "1":
        try:
            proc = subprocess.run(
                [sys.executable, "-u",
                 os.path.join(os.path.dirname(ns_art), "..",
                              "northstar_neoantigen.py")],
                capture_output=True, timeout=7200, text=True,
            )
            log(proc.stderr[-2000:])
        except Exception as err:
            log(f"north-star re-measure failed: {err}")
    try:
        best = None
        with open(ns_art) as fh:
            header = fh.readline().rstrip("\n").split("\t")
            for line in fh:
                row = dict(zip(header, line.rstrip("\n").split("\t")))
                if row.get("tier") != "resident":
                    continue
                if best is None or float(row["warm_s"]) < float(
                    best["warm_s"]
                ):
                    best = row
        if best is not None:
            extra["neo_northstar_s"] = float(best["warm_s"])
            if best.get("ratio_vs_hybrid"):
                extra["neo_northstar_ratio"] = float(
                    best["ratio_vs_hybrid"]
                )
            extra["neo_northstar_samples"] = int(best["samples"])
    except FileNotFoundError:
        pass
    except Exception as err:
        log(f"north-star artifact unreadable: {err}")
    if os.environ.get("BENCH_SHARED", "1") == "1":
        try:
            measure_shared_regime()
        except Exception as err:
            log(f"shared-regime diagnostic skipped: {err}")
    print(
        json.dumps(
            {
                "metric": "end_to_end_samples_per_sec",
                "value": round(N_SAMPLES / ours_dt, 3),
                "unit": "samples/s",
                "vs_baseline": round(vs_baseline, 3),
                **extra,
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
