"""Chip-peak accounting: turn wall-clock into %-of-peak (MFU / HBM fraction).

Every device wall-clock number in ARCHITECTURE.md carries a denominator from
here so "is it actually fast?" has a hardware answer, not just a
faster-than-host one. Peaks default to TPU v5e (v5 lite -- the chip this
environment forwards): 197 TFLOP/s bf16 on the MXU, 819 GB/s HBM. Override
with TPU_PEAK_BF16_FLOPS / TPU_PEAK_HBM_BPS for other chips.

The reference publishes no utilization numbers at all (SURVEY 6); its
stubbed accelerator (gir.rs:283-299) is the role these denominators grade.
"""
from __future__ import annotations

import os


def peak_bf16_flops() -> float:
    return float(os.environ.get("TPU_PEAK_BF16_FLOPS", 197e12))


def peak_hbm_bps() -> float:
    return float(os.environ.get("TPU_PEAK_HBM_BPS", 819e9))


def scoring_flops_per_window(params: dict) -> float:
    """Dense-matmul FLOPs to score ONE window with the configurable head.

    Counts the serving forward as executed (scoring.score_windows): the
    folded one-hot matmul [1, k*V] @ [k*V, H1] plus the hidden stack and
    the [H, 1] output head, 2 FLOPs per MAC. The per-call embedding fold
    is amortized over the whole batch and excluded (it is O(k*V*E*H) once
    per dispatch vs O(windows * k*V*H)).
    """
    from ..downstream.scoring import layer_names

    names = layer_names(params)
    flops = 0.0
    for name in names:
        n_in, n_out = params[name].shape
        flops += 2.0 * n_in * n_out
    # the first layer runs against the k*V one-hot, not k*E activations
    n_in, n_out = params[names[0]].shape
    from ..downstream.scoring import VOCAB

    k = n_in // params["embed"].shape[1]
    flops += 2.0 * (k * VOCAB - n_in) * n_out
    return flops


def dense_pass_flops(n_windows: int, params: dict) -> float:
    """Total matmul FLOPs of the dense scoring pass over ``n_windows`` tape
    positions (the device chain scores EVERY position; padding included --
    the MXU runs them all)."""
    return n_windows * scoring_flops_per_window(params)


def executor_bytes(out_len: int, index_bytes: int = 4) -> float:
    """Minimal HBM traffic of the delta executor for ``out_len`` output
    bytes: read one index lane + one source byte, write one output byte,
    plus the cumsum's read+write of the index lane."""
    return float(out_len) * (3 * index_bytes + 2)


def mfu(flops: float, seconds: float) -> float:
    """Fraction of bf16 MXU peak achieved."""
    return flops / seconds / peak_bf16_flops()


def hbm_fraction(nbytes: float, seconds: float) -> float:
    """Fraction of HBM-bandwidth peak achieved."""
    return nbytes / seconds / peak_hbm_bps()
