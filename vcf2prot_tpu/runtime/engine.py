"""Execution-engine selection.

The reference threads an ``Engine{ST,MT,GPU}`` enum through every stage, with
the GPU arm stubbed to a panic (reference:
src/data_structures/InternalRep/engines.rs:15, cli.rs:65-66, gir.rs:236-239).
This build supplies the accelerator the reference only stubs: ``tpu`` is the
real device engine. ``gpu`` is accepted as an alias for the accelerator slot
so existing reference invocations keep working.
"""
from __future__ import annotations

from enum import Enum


class Engine(Enum):
    ST = "st"     # single-threaded host execution
    MT = "mt"     # multi-threaded host execution
    TPU = "tpu"   # device (JAX/XLA) execution
    AUTO = "auto" # probe the device:host link, pick TPU or host

    @staticmethod
    def from_str(s: str) -> "Engine":
        s = s.lower()
        if s == "st":
            return Engine.ST
        if s == "mt":
            return Engine.MT
        if s in ("tpu", "gpu"):
            return Engine.TPU
        if s == "auto":
            return Engine.AUTO
        raise ValueError(
            f"unsupported engine: {s} (expected st, mt, tpu or auto)"
        )


# Device->host bandwidth below which device execution cannot beat host
# memcpy-speed assembly for an output that must land on host disk. On real
# TPU hosts (PCIe, GB/s) the probe always selects the device; behind a slow
# forwarded link it degrades gracefully to the host engine.
MIN_D2H_BYTES_PER_SEC = 100e6


def resolve_auto(sample_bytes: int = 1 << 23, timeout_s: float = 8.0) -> "Engine":
    """Pick the execution placement for the end-to-end tool.

    For FASTA generation the host engine is the categorical default: every
    output byte originates host-side (proteome blob + alt tape), the execute
    stage is a small fraction of the pipeline, and the C++ memcpy engine
    saturates host memory bandwidth -- so device execution can only add
    host-link transfer cost. Set ``VCF2PROT_PREFER_DEVICE=1`` to probe the
    link and use the TPU engine when it is consistently fast (the right
    choice when downstream consumers are device-resident).

    The probe runs under a watchdog: a flaky forwarded link can stall a fetch
    for minutes, and a hung probe must itself count as a failed probe.
    """
    import os

    if os.environ.get("VCF2PROT_PREFER_DEVICE") != "1":
        return Engine.MT
    import threading
    import time

    import numpy as np

    result = {"engine": Engine.MT}

    def probe():
        try:
            import jax

            dev = jax.devices()[0]
            if dev.platform == "cpu":
                return
            rates = []
            for _ in range(2):
                x = np.random.randint(0, 255, sample_bytes, dtype=np.uint8)
                xd = jax.device_put(x, dev)
                xd.block_until_ready()
                t0 = time.perf_counter()
                np.asarray(xd + 1)  # fresh buffer each probe, defeats caching
                rates.append(
                    sample_bytes / max(time.perf_counter() - t0, 1e-9)
                )
            # the link must be *consistently* fast, not just bursting
            if min(rates) >= MIN_D2H_BYTES_PER_SEC:
                result["engine"] = Engine.TPU
        except Exception:
            pass

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return result["engine"]
