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

    @staticmethod
    def from_str(s: str) -> "Engine":
        s = s.lower()
        if s == "st":
            return Engine.ST
        if s == "mt":
            return Engine.MT
        if s in ("tpu", "gpu"):
            return Engine.TPU
        raise ValueError(f"unsupported engine: {s} (expected st, mt or tpu)")
