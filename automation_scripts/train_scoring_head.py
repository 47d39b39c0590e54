#!/usr/bin/env python
"""Train the neoantigen scoring head and emit a --neoantigen_params .npz.

Input: a TSV of ``peptide<TAB>label`` rows (no header), all peptides the
same length k; binary labels train with sigmoid cross-entropy, continuous
with MSE. The forward used for training is the exact serving forward
(downstream/scoring.score_windows), so the saved weights reproduce training
scores bit-for-bit at ranking time.

    python automation_scripts/train_scoring_head.py data.tsv out.npz \
        [--epochs 30] [--lr 1e-3] [--batch 4096] [--seed 0] [--holdout 0.2] \
        [--embed_dim 32] [--hidden 128] [--depth 1]

Then:  vcf2prot-tpu ... --neoantigen_k K --neoantigen_params out.npz
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def read_tsv(path):
    peptides, labels = [], []
    with open(path) as fh:
        for ln, line in enumerate(fh, 1):
            line = line.rstrip("\n")
            if not line:
                continue
            try:
                pep, lab = line.split("\t")
            except ValueError:
                raise SystemExit(
                    f"{path}:{ln}: expected 'peptide<TAB>label'"
                )
            peptides.append(pep.encode("ascii"))
            labels.append(float(lab))
    if not peptides:
        raise SystemExit(f"{path}: no rows")
    k = len(peptides[0])
    if any(len(p) != k for p in peptides):
        raise SystemExit(f"{path}: peptides must all be the same length")
    windows = np.frombuffer(b"".join(peptides), np.uint8).reshape(-1, k)
    return windows, np.asarray(labels, np.float32), k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tsv")
    ap.add_argument("out_npz")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--l2", type=float, default=0.0)
    ap.add_argument("--holdout", type=float, default=0.2,
                    help="fraction held out for the final AUC report")
    ap.add_argument("--embed_dim", type=int, default=32,
                    help="per-position embedding width")
    ap.add_argument("--hidden", type=int, default=128,
                    help="hidden-layer width")
    ap.add_argument("--depth", type=int, default=1,
                    help="number of hidden layers")
    args = ap.parse_args()

    from vcf2prot_tpu.downstream.scoring import init_params, score_windows
    from vcf2prot_tpu.downstream.train import auc, fit, save_params

    windows, labels, k = read_tsv(args.tsv)
    log(f"{len(windows)} peptides, k={k}; head "
        f"E={args.embed_dim} H={args.hidden} depth={args.depth}")
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(windows))
    n_hold = int(len(windows) * args.holdout)
    hold, tr = order[:n_hold], order[n_hold:]
    params = fit(
        windows[tr], labels[tr], k=k, epochs=args.epochs,
        batch_size=args.batch, learning_rate=args.lr, seed=args.seed,
        l2=args.l2, verbose=True,
        params=init_params(k, embed_dim=args.embed_dim, hidden=args.hidden,
                           depth=args.depth, seed=args.seed),
    )
    save_params(args.out_npz, params)
    log(f"saved {args.out_npz}")
    if n_hold:
        scores = np.asarray(score_windows(windows[hold], params))
        binary = bool(np.isin(labels, (0.0, 1.0)).all())
        if binary:
            log(f"holdout AUC: {auc(scores, labels[hold]):.4f} "
                f"({n_hold} rows)")
        else:
            mse = float(np.mean((scores - labels[hold]) ** 2))
            log(f"holdout MSE: {mse:.5f} ({n_hold} rows)")


if __name__ == "__main__":
    main()
