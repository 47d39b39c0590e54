#!/usr/bin/env python
"""Executor-kernel roofline experiments on the real chip.

Times the covering-task expansion + gather formulations of the executor
(runtime/tpu_engine.py) against each other with a TRUE device sync: on the
forwarded dev link ``block_until_ready()`` returns before execution, so every
measurement here syncs with a 1-byte D2H fetch (see CLAUDE.md).

Variants:

* ``scan``     -- per-byte binary search: t = searchsorted(dst, j) - 1, then
                  gather (the round-1 formulation; XLA lowers searchsorted to
                  log2(n) serialized gather rounds -> ~160 ns/query).
* ``sortm``    -- searchsorted(method='sort'): one big sort of keys+queries.
* ``delta``    -- delta-scatter at task starts + cumsum (the production
                  kernel since round 2): task-granularity scatter (~500k
                  updates) + one 32M cumsum.
* ``word``     -- delta expansion at WORD granularity + 2x uint32 loads +
                  shift-combine per 4 output bytes, per-byte fallback lane
                  (jnp.where) at task-boundary words.
* ``word_nofix`` -- word fast lane only (WRONG at boundary words): isolates
                  the cost of the fix-up select.
* ``aligned32`` / ``aligned64`` -- the COMPILE-TIME alignment answer to the
                  round-3 verdict: the pack layer (which owns task
                  boundaries) pre-splits every task into word-uniform
                  middle words plus an explicit boundary-byte list, so the
                  device kernel is fix-up-free: word-granularity delta
                  expansion (4-8x fewer cumsum lanes), 2 aligned u32/u64
                  loads + shift-combine per word (2-4x fewer gather lanes
                  than the per-byte delta kernel), and one small boundary
                  byte gather+scatter (~4-8 bytes per task boundary,
                  host-precomputed indices). Correct output, no per-byte
                  expansion anywhere.

Run under ``timeout`` (the device link can stall):

    timeout 900 python automation_scripts/kernel_roofline.py --mb 32

Results are recorded in ARCHITECTURE.md 2.3.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_workload(out_mb: int, seed=20260820):
    """Synthetic packed chunk shaped like the production pack: mean task
    length ~60 B, sources random across the combined tape."""
    rng = np.random.default_rng(seed)
    total = out_mb << 20
    lens = rng.integers(40, 80, size=total // 59 + 64)
    dst = np.concatenate([[0], np.cumsum(lens)[:-1]])
    n = int(np.searchsorted(dst, total, side="right"))
    dst = dst[:n].astype(np.int64)
    combined_len = total + (1 << 20)
    src = rng.integers(0, combined_len - 128, size=n)
    return dst.astype(np.int32), src.astype(np.int32), total, combined_len


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=32, help="output size in MiB")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--variants", default="scan,sortm,delta,word,word_nofix"
    )
    args = ap.parse_args()

    from vcf2prot_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    # the aligned64 variant bitcasts to uint64; all other variants pin
    # their dtypes explicitly, so enabling x64 changes nothing for them
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    dst_np, src_np, total, combined_len = build_workload(args.mb)
    n_tasks = len(dst_np)
    out_bucket = 1 << (total - 1).bit_length()
    task_bucket = 1 << (n_tasks - 1).bit_length()
    log(f"workload: {total / 1e6:.1f} MB out, {n_tasks} tasks, "
        f"buckets {out_bucket}/{task_bucket}")

    dst = np.full(task_bucket, np.iinfo(np.int32).max, np.int32)
    dst[:n_tasks] = dst_np
    srcb = np.zeros(task_bucket, np.int32)
    srcb[:n_tasks] = src_np
    pad32 = (-combined_len) % 4 + 8
    combined_np = np.random.default_rng(7).integers(
        65, 91, size=combined_len + pad32, dtype=np.uint8
    )
    combined = jax.device_put(combined_np, dev)
    dst_d = jax.device_put(dst, dev)
    srcb_d = jax.device_put(srcb, dev)

    def expand(v, d, out_len):
        delta = v - jnp.concatenate([jnp.zeros(1, v.dtype), v[:-1]])
        acc = jnp.zeros(out_len, v.dtype).at[d].add(delta, mode="drop")
        return jnp.cumsum(acc)

    @jax.jit
    def scan(c, d, sb):
        j = jnp.arange(out_bucket, dtype=jnp.int32)
        t = jnp.searchsorted(d, j, side="right") - 1
        g = jnp.clip(sb[t] + j - d[t], 0, c.shape[0] - 1)
        return jnp.take(c, g)

    @jax.jit
    def sortm(c, d, sb):
        j = jnp.arange(out_bucket, dtype=jnp.int32)
        t = jnp.searchsorted(d, j, side="right", method="sort") - 1
        g = jnp.clip(sb[t] + j - d[t], 0, c.shape[0] - 1)
        return jnp.take(c, g)

    @jax.jit
    def delta(c, d, sb):
        base = expand(sb - d, d, out_bucket)
        j = jnp.arange(out_bucket, dtype=jnp.int32)
        g = jnp.clip(base + j, 0, c.shape[0] - 1)
        return jnp.take(c, g)

    def word_impl(c, d, sb, fix):
        c32 = jax.lax.bitcast_convert_type(
            c[: (c.shape[0] // 4) * 4].reshape(-1, 4), jnp.uint32
        ).reshape(-1)
        base = expand(sb - d, d, out_bucket)
        n_words = out_bucket // 4
        jw = jnp.arange(n_words, dtype=jnp.int32) * 4
        b0 = base[0::4]
        g = jnp.clip(b0 + jw, 0, c.shape[0] - 8)
        w0 = c32[g >> 2]
        w1 = c32[(g >> 2) + 1]
        sh = (g & 3).astype(jnp.uint32) * 8
        fast = jnp.where(sh == 0, w0, (w0 >> sh) | (w1 << (32 - sh)))
        if not fix:
            return jax.lax.bitcast_convert_type(
                fast[:, None], jnp.uint8
            ).reshape(-1)
        # boundary words: any of the 4 bytes has a different task base
        base4 = base.reshape(-1, 4)
        uniform = jnp.all(base4 == base4[:, :1], axis=1)
        jb = jnp.arange(out_bucket, dtype=jnp.int32)
        gb = jnp.clip(base + jb, 0, c.shape[0] - 1)
        slow_b = jnp.take(c, gb).reshape(-1, 4)
        slow = jax.lax.bitcast_convert_type(slow_b, jnp.uint32).reshape(-1)
        out32 = jnp.where(uniform, fast, slow)
        return jax.lax.bitcast_convert_type(
            out32[:, None], jnp.uint8
        ).reshape(-1)

    word = jax.jit(lambda c, d, sb: word_impl(c, d, sb, True))
    word_nofix = jax.jit(lambda c, d, sb: word_impl(c, d, sb, False))

    def build_aligned(wbytes: int):
        """Host-side 'compiler pass': the PRODUCTION
        runtime/tpu_engine.build_aligned_program (word-uniform middles +
        boundary byte list incl. the near-tape-end demotion guard), padded
        to the shoot-out's buckets -- the script measures exactly what
        ships (reference analogue: the per-task copy_from_slice at
        task.rs:38-50 is word-copy via memcpy)."""
        from vcf2prot_tpu.runtime.tpu_engine import (
            build_aligned_program,
            pad_aligned_program,
        )

        wstart, wbase, bpos, bsrc = build_aligned_program(
            dst_np, src_np, total, len(combined_np), wbytes=wbytes
        )
        n_words = out_bucket // wbytes
        bb = 1 << max(int(len(bpos) - 1).bit_length(), 4)
        wstart_p, wbase_p, bpos_p, bsrc_p = pad_aligned_program(
            wstart, wbase, bpos, bsrc, task_bucket, out_bucket, bb
        )
        log(f"aligned{wbytes * 8}: {len(bpos)} boundary bytes "
            f"({len(bpos) / total * 100:.1f}% of output), "
            f"{n_words} middle-word lanes")
        return (jax.device_put(wstart_p, dev), jax.device_put(wbase_p, dev),
                jax.device_put(bpos_p, dev), jax.device_put(bsrc_p, dev),
                n_words)

    def make_aligned(wbytes: int):
        wstart_d, wbase_d, bpos_d, bsrc_d, n_words = build_aligned(wbytes)
        wtype = jnp.uint32 if wbytes == 4 else jnp.uint64
        shift_mask = wbytes - 1
        bits = wbytes * 8

        @jax.jit
        def aligned_impl(c, wstart, wbase, bpos, bsrc):
            cw = jax.lax.bitcast_convert_type(
                c[: (c.shape[0] // wbytes) * wbytes].reshape(-1, wbytes),
                wtype,
            ).reshape(-1)
            base_w = expand(wbase, wstart, n_words)
            jw = jnp.arange(n_words, dtype=jnp.int32) * wbytes
            g = jnp.clip(base_w + jw, 0, c.shape[0] - 2 * wbytes)
            gi = g // wbytes
            w0 = cw[gi]
            w1 = cw[gi + 1]
            sh = ((g & shift_mask) * 8).astype(wtype)
            words = jnp.where(sh == 0, w0, (w0 >> sh) | (w1 << (bits - sh)))
            out = jax.lax.bitcast_convert_type(
                words[:, None], jnp.uint8
            ).reshape(-1)
            bvals = jnp.take(c, bsrc)
            return out.at[bpos].set(bvals, mode="drop")

        # the word program + boundary list are real ARGUMENTS (closing over
        # device arrays would bake them in as giant compile-time constants)
        return lambda c, d, sb: aligned_impl(
            c, wstart_d, wbase_d, bpos_d, bsrc_d
        )

    variants = {
        "scan": scan, "sortm": sortm, "delta": delta,
        "word": word, "word_nofix": word_nofix,
        "aligned32": lambda: make_aligned(4),
        "aligned64": lambda: make_aligned(8),
    }

    def sync(x):
        np.asarray(x.ravel()[:1])  # true device sync (see module docstring)

    # correctness reference = FIRST variant in the list, so any subset can
    # run in its own (fresh, wedge-resistant) process: e.g.
    # "delta,word,word_nofix" checks word against delta
    ref_name = None
    ref_out = None
    results = {}
    for name in args.variants.split(","):
        fn = variants[name]
        if name.startswith("aligned"):
            fn = fn()  # lazy: host precompute only when selected
        t0 = time.perf_counter()
        out = fn(combined, dst_d, srcb_d)
        sync(out)
        log(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")
        if ref_out is None:
            ref_name, ref_out = name, np.asarray(out[:total])
        elif name != "word_nofix":
            same = bool(np.array_equal(np.asarray(out[:total]), ref_out))
            log(f"{name}: correctness vs {ref_name} = {same}")
            if not same:
                continue
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(combined, dst_d, srcb_d)
        sync(out)
        dt = (time.perf_counter() - t0) / args.reps
        results[name] = dt
        from vcf2prot_tpu.utils.roofline import hbm_fraction, peak_hbm_bps

        # roofline denominator: minimal HBM traffic is 1 source read + 1
        # output write per byte (2x total); indices/cumsum add more, so
        # the true fraction is even lower than printed
        log(f"{name:10s}: {dt * 1e3:8.1f} ms/iter  "
            f"{total / dt / 1e9:6.3f} GB/s output  = "
            f"{hbm_fraction(2 * total, dt) * 100:.3f}% of HBM peak "
            f"({peak_hbm_bps() / 1e9:.0f} GB/s)")
    if ref_name in results:
        for name, dt in results.items():
            if name != ref_name:
                log(f"{name}: {results[ref_name] / dt:.1f}x vs {ref_name}")


if __name__ == "__main__":
    main()
    sys.stderr.flush()
    os._exit(0)
