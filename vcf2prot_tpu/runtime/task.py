"""Task: the segmented-copy execution primitive, and its SoA container.

A task copies ``length`` bytes from stream ``exe`` (0 = reference tape,
1 = alternative tape, 2 = null/no-op) starting at ``src`` into the result tape
at ``dst`` (reference: src/data_structures/InternalRep/task.rs:2-50).

``TaskProgram`` is the flat structure-of-arrays form -- the exact shape the
reference exports for its (stubbed) GPU engine
(reference: gir.rs:283-299) -- and is what crosses the host->HBM boundary on
TPU: four int32 vectors plus byte tapes.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import numpy as np


class Task(NamedTuple):
    exe: int      # 0 = ref stream, 1 = alt stream, 2 = null
    src: int
    length: int
    dst: int


NULL_TASK = Task(2, 0, 0, 0)


@dataclass
class TaskProgram:
    """Flat SoA task program over shared byte tapes."""

    exe: np.ndarray       # uint8[n]
    src: np.ndarray       # int32[n]
    length: np.ndarray    # int32[n]
    dst: np.ndarray       # int32[n]
    ref: np.ndarray       # uint8[ref_len] reference tape bytes
    alt: np.ndarray       # uint8[alt_len] alternative tape bytes
    res_len: int          # total result-tape length

    @staticmethod
    def from_tasks(tasks, ref_bytes: bytes, alt_bytes: bytes, res_len: int):
        n = len(tasks)
        exe = np.empty(n, dtype=np.uint8)
        src = np.empty(n, dtype=np.int32)
        length = np.empty(n, dtype=np.int32)
        dst = np.empty(n, dtype=np.int32)
        for i, t in enumerate(tasks):
            exe[i] = t.exe
            src[i] = t.src
            length[i] = t.length
            dst[i] = t.dst
        return TaskProgram(
            exe,
            src,
            length,
            dst,
            np.frombuffer(ref_bytes, dtype=np.uint8),
            np.frombuffer(alt_bytes, dtype=np.uint8),
            res_len,
        )

    def validate_contiguity(self) -> None:
        """Debug-mode invariant: each task writes immediately after its
        predecessor, and the tasks tile the result tape exactly (the property
        the reference asserts under DEBUG_CPU_EXEC / INSPECT_TXP; gir.rs:203-229,
        transcript_instructions.rs:386-421). This is also precisely the
        precondition the TPU executor's searchsorted formulation relies on."""
        if len(self.dst) == 0:
            return
        ends = self.dst + self.length
        if not np.all(self.dst[1:] == ends[:-1]):
            bad = int(np.nonzero(self.dst[1:] != ends[:-1])[0][0]) + 1
            raise AssertionError(
                f"result tape not contiguous at task {bad}: dst={self.dst[bad]}"
                f" expected {ends[bad - 1]}"
            )
        if int(self.dst[0]) != 0 or int(ends[-1]) != self.res_len:
            raise AssertionError(
                f"task program covers [{self.dst[0]}, {ends[-1]}) but result "
                f"tape is [0, {self.res_len})"
            )
