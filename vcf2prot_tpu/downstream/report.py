"""Per-sample neoantigen-candidate reports.

Opt-in pipeline stage (CLI ``--neoantigen_k K``): after execution, every
haplotype tape is scanned for mutation-overlapping k-mers, scored with the
bf16 MXU head (untrained scaffold weights unless the caller supplies real
ones), and written as ``<proband>.neoantigens.tsv`` with columns
``peptide  haplotype  transcript  protein_start  score``.
"""
from __future__ import annotations

import os

import numpy as np

from .peptides import neoantigen_candidates
from .scoring import init_params, score_windows


def _transcript_of(annotations, start: int) -> str:
    for name, s, e in annotations:
        if s <= start < e:
            return name
    return "?"


def write_neoantigen_report(outdir, proband, haps, tapes, k: int,
                            params=None, top: int = 200) -> str:
    """``haps``/``tapes``: the two HaplotypePrograms and executed tapes."""
    if params is None:
        params = init_params(k)
    rows = []
    for hap_idx, (prog, tape) in enumerate(zip(haps, tapes), start=1):
        windows, starts = neoantigen_candidates(prog, tape, k)
        if windows.shape[0] == 0:
            continue
        scores = np.asarray(score_windows(windows, params))
        win_np = np.asarray(windows)
        starts_np = np.asarray(starts)
        for w, s, sc in zip(win_np, starts_np, scores):
            name = _transcript_of(prog.annotations, int(s))
            # position within the personalized protein
            rel = int(s) - next(
                st for n, st, _e in prog.annotations if n == name
            )
            rows.append(
                (bytes(w).decode("ascii"), hap_idx, name, rel, float(sc))
            )
    rows.sort(key=lambda r: -r[4])
    path = os.path.join(outdir, f"{proband}.neoantigens.tsv")
    with open(path, "w") as fh:
        fh.write("peptide\thaplotype\ttranscript\tprotein_start\tscore\n")
        for pep, hap, name, rel, sc in rows[:top]:
            fh.write(f"{pep}\t{hap}\t{name}\t{rel}\t{sc:.6f}\n")
    return path
