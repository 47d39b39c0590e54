#!/usr/bin/env python
"""Train the scoring head on the synthetic MHC-presentation benchmark.

Real binding data is unreachable here (zero egress); the synthetic task
(downstream/synth_mhc.py) reproduces the STRUCTURE of the real problem --
anchor-position preferences plus anchor-anchor epistasis -- so the
head-size question ("does a production-shaped deeper/wider head buy
ranking quality, and what does training cost on the chip?") has a
measurable answer. Sweeps head configs; writes
automation_scripts/artifacts/synth_mhc_training.tsv with holdout AUC,
the oracle ceiling, and the one-dispatch fit wall on the active backend.

    timeout 3600 python -u automation_scripts/train_synth_mhc.py
Env: MHC_N (100000), MHC_EPOCHS (20), MHC_CONFIGS
     ("8x1,128x1,512x1,512x3" as HIDDENxDEPTH), MHC_CPU=1 to force CPU.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

N = int(os.environ.get("MHC_N", "100000"))
EPOCHS = int(os.environ.get("MHC_EPOCHS", "20"))
ART = os.path.join(REPO, "automation_scripts", "artifacts",
                   "synth_mhc_training.tsv")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    if os.environ.get("MHC_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
    from vcf2prot_tpu.downstream.scoring import init_params, score_windows
    from vcf2prot_tpu.downstream.synth_mhc import make_task, oracle_auc
    from vcf2prot_tpu.downstream.train import auc, fit

    import jax

    log(f"backend: {jax.devices()[0].platform}")
    win, labels, truth = make_task(n=N, seed=3)
    n_hold = N // 5
    tr, hold = slice(0, N - n_hold), slice(N - n_hold, None)
    ceiling = oracle_auc(truth[hold], labels[hold])
    log(f"{N} peptides, oracle (noise-free) AUC ceiling: {ceiling:.4f}")

    configs = []
    for tok in os.environ.get("MHC_CONFIGS",
                              "8x1,128x1,512x1,512x3").split(","):
        h, d = tok.split("x")
        configs.append((int(h), int(d)))

    rows = []
    for hidden, depth in configs:
        label = f"H{hidden}x{depth}"
        params = init_params(9, hidden=hidden, depth=depth, seed=0)
        t0 = time.perf_counter()
        trained = fit(win[tr], labels[tr], epochs=EPOCHS, batch_size=4096,
                      seed=0, params=params)
        wall = time.perf_counter() - t0
        scores = np.asarray(score_windows(win[hold], trained))
        a = auc(scores, labels[hold])
        rows.append((label, hidden, depth, a, ceiling, wall))
        log(f"{label}: holdout AUC {a:.4f} (ceiling {ceiling:.4f}), "
            f"fit wall {wall:.1f}s ({EPOCHS} epochs x "
            f"{(N - n_hold + 4095) // 4096} batches, one dispatch)")

    os.makedirs(os.path.dirname(ART), exist_ok=True)
    with open(ART, "w") as fh:
        fh.write(
            f"# synthetic MHC benchmark (downstream/synth_mhc.py): {N} "
            f"9-mers, anchor PWM + anchor-anchor epistasis, 5% label "
            f"noise; fit = {EPOCHS} epochs adam in ONE jitted dispatch\n"
        )
        fh.write("label\thidden\tdepth\tholdout_auc\toracle_auc\t"
                 "fit_wall_s\n")
        for r in rows:
            fh.write(f"{r[0]}\t{r[1]}\t{r[2]}\t{r[3]:.4f}\t{r[4]:.4f}\t"
                     f"{r[5]:.2f}\n")
    log(f"wrote {ART}")


if __name__ == "__main__":
    main()
    sys.stderr.flush()
    os._exit(0)
