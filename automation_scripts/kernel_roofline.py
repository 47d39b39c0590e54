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

    variants = {
        "scan": scan, "sortm": sortm, "delta": delta,
        "word": word, "word_nofix": word_nofix,
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
        log(f"{name:10s}: {dt * 1e3:8.1f} ms/iter  "
            f"{total / dt / 1e9:6.2f} GB/s output")
    if ref_name in results:
        for name, dt in results.items():
            if name != ref_name:
                log(f"{name}: {results[ref_name] / dt:.1f}x vs {ref_name}")


if __name__ == "__main__":
    main()
    sys.stderr.flush()
    os._exit(0)
