"""TPU execution engine.

The reference's (stubbed) accelerator runs one GPU thread per Task row
(reference: gir.rs:283-299 SoA export, README.md:72). The TPU-native
formulation is different and stronger: the contiguity invariant means the
result tape is a *partition* of output positions by task, so the whole cohort
executes as

    t     = searchsorted(task_dst_starts, j) - 1      # task covering byte j
    out[j] = combined[src_biased[t] + j - dst[t]]     # one gather

-- vectorized ops over static-shaped arrays, jitted once per shape bucket.
``combined`` is the device-resident reference-proteome blob with the cohort
alt tape appended; the blob is uploaded once per run and shared by every
chunk, sample and haplotype.

The covering-task expansion is NOT a per-byte binary search: on real TPU
hardware the per-byte ``searchsorted`` formulation costs 7.6 s per 33.6 MB
chunk (~225 ns/query; XLA lowers it to log2(n) serialized gather rounds)
while the delta-scatter + cumsum + gather kernel completes the same chunk
in 295 ms -- 25.6x faster (measured, ARCHITECTURE 2.3). So the
per-byte source index is produced by scattering first-difference deltas of
``src_biased - dst`` at task starts and cumsum-ing -- identical to
``vals[searchsorted(dst, j, 'right') - 1]`` for sorted starts (coincident
zero-length-task starts telescope to the last task, same tie rule).

No data-dependent control flow, no raggedness on device: chunk totals are
padded to power-of-two buckets and sliced exactly on the host.
"""
from __future__ import annotations

import numpy as np

from ..compiler.haplotype import RefBlob
from . import cpu_engine
from .pack import (
    PackedCohort,
    pack_cohort,
    pad_to_bucket,
    program_is_contiguous,
)

_EXECUTE_CACHE = {}


def _get_jitted():
    """Build the jitted-executor factory lazily so importing this module does
    not initialize a JAX backend."""
    import jax
    import jax.numpy as jnp

    if "fn" in _EXECUTE_CACHE:
        return _EXECUTE_CACHE["fn"]

    def build(out_size: int):
        @jax.jit
        def run(combined, dst, src_biased):
            v = src_biased - dst
            delta = v - jnp.concatenate([jnp.zeros(1, v.dtype), v[:-1]])
            # bucket-padding tasks carry dst = iinfo.max and are dropped
            acc = jnp.zeros(out_size, v.dtype).at[dst].add(delta, mode="drop")
            base = jnp.cumsum(acc)
            j = jnp.arange(out_size, dtype=v.dtype)
            gidx = jnp.clip(base + j, 0, combined.shape[0] - 1)
            return jnp.take(combined, gidx)

        return run

    _EXECUTE_CACHE["fn"] = build
    return build



class TpuEngine:
    """Device executor for cohorts of haplotype programs.

    Upload the proteome blob once; then ``execute`` arbitrary cohort chunks.
    Falls back to the serial host engine for (malformed) non-contiguous
    programs so behavior degrades to the oracle rather than mis-executing.
    """

    def __init__(self, blob: RefBlob, device=None, validate_on_device=False):
        import jax
        import jax.numpy as jnp

        from ..utils.jaxcache import enable_persistent_cache

        enable_persistent_cache()

        self._jnp = jnp
        self._jax = jax
        self.blob = blob
        self.device = device or jax.devices()[0]
        self._blob_dev = jax.device_put(blob.data, self.device)
        self._run_cache = {}
        # shared-alt-pool runs upload combined = blob || pool once and reuse
        # it for every chunk (keyed on the pool object identity)
        self._combined_key = None
        self._combined_dev = None
        self.validate = validate_on_device

    def _runner(self, out_size: int):
        if out_size not in self._run_cache:
            self._run_cache[out_size] = _get_jitted()(out_size)
        return self._run_cache[out_size]

    def execute(self, programs) -> list:
        """Execute haplotype programs; returns one uint8 array per program."""
        return self.collect(self.dispatch(programs))

    def dispatch(self, programs):
        """Pack + launch a chunk without blocking; pair with :meth:`collect`.

        Returns an opaque handle. Device work proceeds asynchronously, so a
        caller can keep one chunk in flight while fetching the previous one
        (the fetch is the expensive leg on slow host links).
        """
        packed = pack_cohort(programs, self.blob)
        good_mask = None
        if not packed.contiguous:
            # isolate the offending program(s): repack only the contiguous
            # ones for the device and leave the rest to the host oracle,
            # instead of de-accelerating the whole chunk
            good_mask = [program_is_contiguous(p) for p in programs]
            good = [p for p, g in zip(programs, good_mask) if g]
            if not good:
                return (packed, None, programs, None)
            packed = pack_cohort(good, self.blob)
            if not packed.contiguous:  # cross-program corruption: full oracle
                return (packed, None, programs, None)
        if packed.total_res == 0:
            return (packed, None, programs, good_mask)
        return (packed, self._launch(packed), programs, good_mask)

    def collect(self, handle) -> list:
        packed, out_dev, programs, good_mask = handle
        if good_mask is None and out_dev is None and packed.total_res > 0:
            # malformed beyond isolation: defer to the host oracle per program
            return [cpu_engine.execute_tasks(p, self.blob) for p in programs]
        if out_dev is None:
            dev_outs = iter(
                np.empty(0, dtype=np.uint8) for _ in packed.spans
            )
        else:
            out = np.asarray(out_dev[: packed.total_res])
            dev_outs = iter(
                out[start:end] for (_, start, end) in packed.spans
            )
        if good_mask is None:
            return list(dev_outs)
        return [
            next(dev_outs) if g else cpu_engine.execute_tasks(p, self.blob)
            for p, g in zip(programs, good_mask)
        ]

    def _launch(self, packed: PackedCohort):
        """Upload + dispatch one packed chunk; returns the device array."""
        jax, jnp = self._jax, self._jnp
        if self.validate:
            from .kernels import validate_on_device as _validate

            lengths = np.diff(
                np.append(packed.dst, packed.total_res)
            ).astype(np.int32)
            errors = _validate(
                packed.dst, lengths, packed.src_biased,
                combined_len=len(self.blob.data) + len(packed.alt),
                res_len=packed.total_res,
            )
            if errors:
                raise AssertionError(
                    f"device-side task-stream validation failed: {errors} "
                    "invariant violations"
                )
        n_tasks = len(packed.dst)
        idx_dtype = packed.dst.dtype
        task_bucket = pad_to_bucket(n_tasks)
        out_bucket = pad_to_bucket(packed.total_res)
        # pad task arrays: pad tasks start past the real tape end so
        # searchsorted never selects them for real output positions
        dst = np.full(task_bucket, np.iinfo(idx_dtype).max, dtype=idx_dtype)
        dst[:n_tasks] = packed.dst
        srcb = np.zeros(task_bucket, dtype=idx_dtype)
        srcb[:n_tasks] = packed.src_biased
        if packed.alt_key is not None and packed.alt_key == self._combined_key:
            combined = self._combined_dev
        else:
            alt_bucket = pad_to_bucket(max(len(packed.alt), 1))
            alt = np.zeros(alt_bucket, dtype=np.uint8)
            alt[: len(packed.alt)] = packed.alt
            combined = jnp.concatenate(
                [self._blob_dev, jax.device_put(alt, self.device)]
            )
            if packed.alt_key is not None:
                self._combined_key = packed.alt_key
                self._combined_dev = combined
                # keep the pool buffer alive so the id() key cannot be reused
                # by a different object while this cache entry exists
                self._combined_ref = packed.alt
        run = self._runner(out_bucket)
        # the device-side slice means the later fetch only pays host-link
        # bandwidth for live bytes, not bucket padding
        return run(
            combined,
            jax.device_put(dst, self.device),
            jax.device_put(srcb, self.device),
        )
