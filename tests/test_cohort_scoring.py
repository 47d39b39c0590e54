"""Cohort-batched device scoring (downstream/cohort.py) vs the per-sample
paths it must agree with."""
import os

import numpy as np

from genvcf import random_cohort, write_fasta, write_synthetic_vcf
from vcf2prot_tpu.compiler.haplotype import RefBlob, compile_haplotype
from vcf2prot_tpu.compiler.qc import QcConfig
from vcf2prot_tpu.downstream import cohort, scoring
from vcf2prot_tpu.frontend.maps import group_muts_per_transcript
from vcf2prot_tpu.runtime.cpu_engine import execute_tasks


def build_cohort(seed=21, n_samples=3, n_transcripts=8):
    ref, samples = random_cohort(seed, n_samples, n_transcripts)
    blob = RefBlob.from_ref_seqs(ref)
    progs, tapes = [], []
    for h1, h2 in samples.values():
        for hap in (h1, h2):
            prog = compile_haplotype(
                group_muts_per_transcript(hap), ref, blob, qc=QcConfig()
            )
            progs.append(prog)
            tapes.append(execute_tasks(prog, blob))
    return list(samples), progs, tapes


def test_collect_matches_per_sample_candidates():
    from vcf2prot_tpu.downstream.report import _host_candidates

    _names, progs, tapes = build_cohort()
    k = 9
    windows, sample_ids, haps, starts = cohort.collect_candidates(
        progs, tapes, k
    )
    total = 0
    for idx, (prog, tape) in enumerate(zip(progs, tapes)):
        w, s = _host_candidates(prog, tape, k)
        sel = (sample_ids == idx // 2) & (haps == idx % 2 + 1)
        np.testing.assert_array_equal(windows[sel], w)
        np.testing.assert_array_equal(starts[sel], s)
        total += w.shape[0]
    assert total == windows.shape[0] > 0


def test_bucketed_batch_scores_exactly_match_unpadded():
    """Bucket padding must not perturb live rows (row independence)."""
    _names, progs, tapes = build_cohort(seed=5)
    k = 9
    windows, *_ = cohort.collect_candidates(progs, tapes, k)
    assert windows.shape[0] > 0
    params = scoring.init_params(k)
    batched = cohort.score_cohort(windows, params)
    direct = np.asarray(scoring.score_windows(windows, params))
    np.testing.assert_array_equal(batched, direct)


def test_bucket_sizing():
    assert cohort._bucket(1) == 1024
    assert cohort._bucket(1024) == 1024
    assert cohort._bucket(1025) == 2048
    assert cohort._bucket(100_000) == 131072


def test_accumulator_threaded_consistency():
    """Concurrent add() calls must keep the four arrays index-aligned."""
    from concurrent.futures import ThreadPoolExecutor

    _names, progs, tapes = build_cohort(seed=13, n_samples=6)
    k = 9
    acc = cohort.CohortCandidates(k)
    with ThreadPoolExecutor(max_workers=4) as pool:
        list(
            pool.map(
                lambda i: acc.add(i // 2, i % 2 + 1, progs[i], tapes[i]),
                range(len(progs)),
            )
        )
    windows, sample_ids, haps, starts = acc.arrays()
    ref_w, ref_s, ref_h, ref_st = cohort.collect_candidates(progs, tapes, k)
    # same multiset of rows per (sample, hap), regardless of insertion order
    for sid in np.unique(ref_s):
        for hap in (1, 2):
            got = windows[(sample_ids == sid) & (haps == hap)]
            want = ref_w[(ref_s == sid) & (ref_h == hap)]
            got_sorted = got[np.lexsort(got.T[::-1])]
            want_sorted = want[np.lexsort(want.T[::-1])]
            np.testing.assert_array_equal(got_sorted, want_sorted)


def test_cohort_reports_match_per_sample_reports(tmp_path):
    """Same candidates and same ranking as report.write_neoantigen_report
    (scores differ only by bf16-batch vs fp32-host rounding)."""
    from vcf2prot_tpu.downstream.report import write_neoantigen_report

    names, progs, tapes = build_cohort(seed=9)
    k = 9
    a = tmp_path / "per_sample"
    b = tmp_path / "batched"
    a.mkdir()
    b.mkdir()
    for i, name in enumerate(names):
        write_neoantigen_report(
            str(a), name, (progs[2 * i], progs[2 * i + 1]),
            (tapes[2 * i], tapes[2 * i + 1]), k,
        )
    cohort.write_cohort_neoantigen_reports(str(b), names, progs, tapes, k)
    for name in names:
        fa = (a / f"{name}.neoantigens.tsv").read_text().splitlines()
        fb = (b / f"{name}.neoantigens.tsv").read_text().splitlines()
        assert fa[0] == fb[0]
        rows_a = {tuple(l.split("\t")[:4]) for l in fa[1:]}
        rows_b = {tuple(l.split("\t")[:4]) for l in fb[1:]}
        assert rows_a == rows_b


def test_load_params_roundtrip_and_validation(tmp_path):
    k = 9
    params = scoring.init_params(k)
    good = tmp_path / "w.npz"
    np.savez(good, **params)
    loaded = scoring.load_params(str(good), k)
    for key in params:
        np.testing.assert_array_equal(loaded[key], params[key])
    # loaded weights score identically to in-memory ones
    _names, progs, tapes = build_cohort(seed=5)
    windows, *_ = cohort.collect_candidates(progs, tapes, k)
    np.testing.assert_array_equal(
        cohort.score_cohort(windows, loaded),
        cohort.score_cohort(windows, params),
    )
    # wrong k fails loudly
    import pytest

    with pytest.raises(ValueError, match="w1 expects"):
        scoring.load_params(str(good), k + 1)
    bad = tmp_path / "bad.npz"
    np.savez(bad, embed=params["embed"], w1=params["w1"])
    with pytest.raises(ValueError, match="missing arrays"):
        scoring.load_params(str(bad), k)
    wrong_vocab = dict(params, embed=params["embed"][:-1])
    bad2 = tmp_path / "bad2.npz"
    np.savez(bad2, **wrong_vocab)
    with pytest.raises(ValueError, match="vocab"):
        scoring.load_params(str(bad2), k)


def test_load_params_multilayer_roundtrip_and_validation(tmp_path):
    """load_params accepts any contiguous w1..wN stack and validates the
    shape chain; save/load round-trips deeper heads."""
    import pytest

    from vcf2prot_tpu.downstream.train import save_params

    k = 9
    params = scoring.init_params(k, embed_dim=16, hidden=(64, 32), seed=2)
    assert scoring.layer_names(params) == ["w1", "w2", "w3"]
    path = tmp_path / "deep.npz"
    save_params(str(path), params)
    loaded = scoring.load_params(str(path), k)
    for key in params:
        np.testing.assert_array_equal(loaded[key], params[key])
    win = np.frombuffer(b"ACDEFGHIK" * 4, np.uint8).reshape(4, k)
    np.testing.assert_array_equal(
        np.asarray(scoring.score_windows(win, loaded)),
        np.asarray(scoring.score_windows(win, params)),
    )
    # broken chain: w2 input width disagrees with w1 output
    bad = dict(params)
    bad["w2"] = params["w2"][:-1]
    badp = tmp_path / "bad.npz"
    np.savez(badp, **bad)
    with pytest.raises(ValueError, match="w2 expects"):
        scoring.load_params(str(badp), k)
    # gap in the stack (w1, w3 but no w2)
    gap = {key: v for key, v in params.items() if key not in ("w2", "b2")}
    gapp = tmp_path / "gap.npz"
    np.savez(gapp, **gap)
    with pytest.raises(ValueError, match="contiguous dense stack"):
        scoring.load_params(str(gapp), k)
    # non-[H,1] output head
    flat = {
        "embed": params["embed"], "w1": params["w1"], "b1": params["b1"],
        "w2": params["w2"], "b2": params["b2"],
    }
    flatp = tmp_path / "flat.npz"
    np.savez(flatp, **flat)
    with pytest.raises(ValueError, match="output head"):
        scoring.load_params(str(flatp), k)


def test_cli_neoantigen_params(tmp_path):
    from vcf2prot_tpu.cli import main

    k = 9
    weights = tmp_path / "w.npz"
    np.savez(weights, **scoring.init_params(k, seed=7))
    ref, samples = random_cohort(seed=9, n_samples=1, n_transcripts=6)
    vcf = tmp_path / "c.vcf"
    fa = tmp_path / "r.fasta"
    write_synthetic_vcf(str(vcf), ref, samples)
    write_fasta(str(fa), ref)
    out_a, out_b = tmp_path / "a", tmp_path / "b"
    out_a.mkdir()
    out_b.mkdir()
    base = ["-f", str(vcf), "-r", str(fa), "-g", "st", "--neoantigen_k", "9"]
    assert main(base + ["-o", str(out_a)]) == 0
    assert main(
        base + ["-o", str(out_b), "--neoantigen_params", str(weights)]
    ) == 0
    name = next(iter(samples))
    rows_a = (out_a / f"{name}.neoantigens.tsv").read_text()
    rows_b = (out_b / f"{name}.neoantigens.tsv").read_text()
    assert rows_a != rows_b  # different weights -> different ranking/scores


def test_cli_neoantigen_device_end_to_end(tmp_path):
    from vcf2prot_tpu.cli import main

    ref, samples = random_cohort(seed=9, n_samples=2, n_transcripts=6)
    vcf = tmp_path / "c.vcf"
    fa = tmp_path / "r.fasta"
    write_synthetic_vcf(str(vcf), ref, samples)
    write_fasta(str(fa), ref)
    out = tmp_path / "o"
    out.mkdir()
    rc = main(
        ["-f", str(vcf), "-r", str(fa), "-o", str(out), "-g", "mt",
         "--neoantigen_k", "9", "--neoantigen_device"]
    )
    assert rc == 0
    reports = sorted(
        f for f in os.listdir(out) if f.endswith(".neoantigens.tsv")
    )
    assert len(reports) == 2
    lines = (out / reports[0]).read_text().splitlines()
    assert lines[0] == "peptide\thaplotype\ttranscript\tprotein_start\tscore"
    assert len(lines) > 1
    pep, hap, name, rel, score = lines[1].split("\t")
    assert len(pep) == 9 and hap in ("1", "2") and name in ref
    assert int(rel) >= 0
    float(score)


def test_native_candidate_collection_matches_numpy_oracle():
    """The C++ single-pass candidate collector must equal the numpy oracle
    array-for-array on native-compiled cohorts (windows AND start order)."""
    import pytest

    from genvcf import random_cohort as _rc
    from vcf2prot_tpu.compiler.qc import QC_OFF
    from vcf2prot_tpu.downstream.report import _host_candidates
    from vcf2prot_tpu.frontend.fasta import read_fasta
    from vcf2prot_tpu.native_bridge import compile_cohort_native, load_native

    native = load_native()
    if native is None or not hasattr(native, "collect_candidates"):
        pytest.skip("native module unavailable")
    import tempfile

    from genvcf import write_fasta, write_synthetic_vcf
    from vcf2prot_tpu.compiler.haplotype import RefBlob

    for seed in (3, 17):
        ref, samples = _rc(seed, 5, 10)
        with tempfile.TemporaryDirectory() as d:
            vcf = f"{d}/c.vcf"
            fa = f"{d}/r.fasta"
            write_synthetic_vcf(vcf, ref, samples)
            write_fasta(fa, ref)
            ref_seqs = read_fasta(fa)
            blob = RefBlob.from_ref_seqs(ref_seqs)
            _p, progs, _w = compile_cohort_native(vcf, ref_seqs, blob,
                                                  QC_OFF)
        total = 0
        for prog in progs:
            tape = execute_tasks(prog, blob)
            w_np, s_np = _host_candidates(prog, np.asarray(tape), 9)
            w_c, s_c = cohort._collect_candidates_fast(
                prog, np.asarray(tape), 9
            )
            np.testing.assert_array_equal(w_np, w_c)
            np.testing.assert_array_equal(s_np, s_c)
            total += w_np.shape[0]
        assert total > 0
