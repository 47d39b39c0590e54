"""Downstream peptide-window consumer: device results vs naive enumeration."""
import numpy as np

from genvcf import random_cohort
from vcf2prot_tpu.compiler.haplotype import RefBlob, compile_haplotype
from vcf2prot_tpu.compiler.qc import QcConfig
from vcf2prot_tpu.downstream import peptides
from vcf2prot_tpu.frontend.maps import group_muts_per_transcript
from vcf2prot_tpu.runtime.cpu_engine import execute_tasks


def build_case(seed=6):
    ref, samples = random_cohort(seed, 2, 8)
    blob = RefBlob.from_ref_seqs(ref)
    h1, _h2 = next(iter(samples.values()))
    prog = compile_haplotype(
        group_muts_per_transcript(h1), ref, blob, qc=QcConfig()
    )
    tape = execute_tasks(prog, blob)
    return prog, tape


def naive_windows(prog, tape, k):
    """Reference enumeration in plain Python."""
    text = tape.tobytes().decode("ascii")
    alt = peptides.alt_byte_mask(prog, prog.res_len)
    wins = []
    for _name, start, end in prog.annotations:
        for j in range(start, end - k + 1):
            wins.append((j, text[j:j + k], bool(alt[j:j + k].any())))
    return wins


def test_windows_match_naive():
    prog, tape = build_case()
    k = 9
    naive = naive_windows(prog, tape, k)
    starts_mask = peptides.valid_window_starts(prog.annotations, prog.res_len, k)
    windows, starts = peptides.peptide_windows(tape, starts_mask, k)
    got = {
        int(s): bytes(np.asarray(w)).decode("ascii")
        for s, w in zip(np.asarray(starts), np.asarray(windows))
    }
    want = {j: pep for j, pep, _m in naive}
    assert got == want


def test_neoantigen_candidates_match_naive():
    prog, tape = build_case(seed=9)
    k = 9
    naive = {
        j: pep for j, pep, mutated in naive_windows(prog, tape, k) if mutated
    }
    windows, starts = peptides.neoantigen_candidates(prog, tape, k)
    got = {
        int(s): bytes(np.asarray(w)).decode("ascii")
        for s, w in zip(np.asarray(starts), np.asarray(windows))
    }
    assert got == naive
    assert naive, "fixture should contain at least one mutated window"
    # every candidate contains a mutated byte; sanity: candidates are a
    # strict subset of all windows
    assert len(naive) < len(naive_windows(prog, tape, k))


def test_encode_windows_shapes():
    prog, tape = build_case(seed=12)
    windows, _starts = peptides.neoantigen_candidates(prog, tape, 9)
    onehot = peptides.encode_windows(windows)
    assert onehot.shape == (windows.shape[0], 9, 21)
    assert str(onehot.dtype) == "bfloat16"
    s = np.asarray(onehot.sum(-1), dtype=np.float32)
    assert np.all(s == 1.0)


def test_score_and_rank():
    from vcf2prot_tpu.downstream import scoring

    prog, tape = build_case(seed=9)
    windows, starts, scores = scoring.rank_neoantigen_candidates(
        prog, tape, k=9, top=10
    )
    assert windows.shape[0] == starts.shape[0] == scores.shape[0] <= 10
    s = np.asarray(scores)
    assert np.all(np.diff(s) <= 1e-6)  # descending
    # deterministic across calls
    _w2, _s2, scores2 = scoring.rank_neoantigen_candidates(
        prog, tape, k=9, top=10
    )
    np.testing.assert_allclose(s, np.asarray(scores2), rtol=0, atol=0)


def test_scoring_is_jittable():
    import jax

    from vcf2prot_tpu.downstream import scoring

    prog, tape = build_case(seed=12)
    windows, _ = peptides.neoantigen_candidates(prog, tape, 9)
    params = scoring.init_params(9)
    jitted = jax.jit(scoring.score_windows)
    a = np.asarray(jitted(windows, params))
    b = np.asarray(scoring.score_windows(windows, params))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_neoantigen_cli_report(tmp_path):
    from genvcf import random_cohort, write_fasta, write_synthetic_vcf
    from vcf2prot_tpu.cli import main

    ref, samples = random_cohort(seed=9, n_samples=2, n_transcripts=6)
    vcf = tmp_path / "c.vcf"
    fa = tmp_path / "r.fasta"
    write_synthetic_vcf(str(vcf), ref, samples)
    write_fasta(str(fa), ref)
    out = tmp_path / "o"
    out.mkdir()
    rc = main(
        ["-f", str(vcf), "-r", str(fa), "-o", str(out), "-g", "st",
         "--neoantigen_k", "9"]
    )
    assert rc == 0
    import os

    reports = [f for f in os.listdir(out) if f.endswith(".neoantigens.tsv")]
    assert len(reports) == 2
    lines = (out / reports[0]).read_text().splitlines()
    assert lines[0] == "peptide\thaplotype\ttranscript\tprotein_start\tscore"
    assert len(lines) > 1
    pep, hap, name, rel, score = lines[1].split("\t")
    assert len(pep) == 9 and hap in ("1", "2") and name in ref
    assert int(rel) >= 0
    float(score)


def test_host_report_math_matches_device_math():
    """The report's numpy twins must agree with the jax device versions."""
    from vcf2prot_tpu.downstream import report, scoring

    prog, tape = build_case(seed=9)
    k = 9
    win_h, starts_h = report._host_candidates(prog, tape, k)
    win_d, starts_d = peptides.neoantigen_candidates(prog, tape, k)
    np.testing.assert_array_equal(win_h, np.asarray(win_d))
    np.testing.assert_array_equal(starts_h, np.asarray(starts_d))
    params = scoring.init_params(k)
    s_h = report._host_scores(win_h, params)
    s_d = np.asarray(scoring.score_windows(win_d, params))
    # device path computes in bf16; host in fp32
    np.testing.assert_allclose(s_h, s_d, rtol=0.05, atol=0.05)


def test_host_scores_match_device_at_nondefault_head_sizes():
    """The configurable head (width AND depth) must keep the numpy twin and
    the jax forward in agreement -- the host/device contract is size-generic."""
    from vcf2prot_tpu.downstream import report, scoring

    prog, tape = build_case(seed=9)
    k = 9
    win, _ = report._host_candidates(prog, tape, k)
    for kwargs in (
        {"embed_dim": 16, "hidden": 64},
        {"embed_dim": 8, "hidden": 48, "depth": 3},
        {"hidden": (96, 24)},
    ):
        params = scoring.init_params(k, seed=3, **kwargs)
        s_h = report._host_scores(win, params)
        s_d = np.asarray(scoring.score_windows(win, params))
        np.testing.assert_allclose(s_h, s_d, rtol=0.05, atol=0.05)
