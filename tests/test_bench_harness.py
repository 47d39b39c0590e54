"""The bench harness's neoantigen snippet is a code STRING (bench.py) -- it
gets no import-time syntax checking and runs only on the driver's machine,
so pin it here: run it as a real subprocess on a tiny cohort (CPU backend)
and check the JSON contract the harness parses."""
import json
import os
import subprocess
import sys

import pytest

from genvcf import random_cohort, write_fasta, write_synthetic_vcf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_cohort(tmp_path_factory):
    d = tmp_path_factory.mktemp("benchsnip")
    ref, samples = random_cohort(seed=42, n_samples=2, n_transcripts=6)
    vcf = str(d / "c.vcf")
    fasta = str(d / "r.fasta")
    write_synthetic_vcf(vcf, ref, samples)
    write_fasta(fasta, ref)
    return d, vcf, fasta


def _load_snippet():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._NEO_SNIPPET


def test_neo_snippet_contract(tiny_cohort):
    d, vcf, fasta = tiny_cohort
    snippet = _load_snippet()
    # the container sitecustomize force-registers the TPU backend in every
    # process and env vars do NOT override it (CLAUDE.md); pin the test
    # subprocess to CPU via the config API before exec'ing the snippet
    snip_path = str(d / "snippet.py")
    with open(snip_path, "w") as fh:
        fh.write(snippet)
    wrapper = (
        "import jax, sys; jax.config.update('jax_platforms', 'cpu'); "
        f"exec(compile(open({snip_path!r}).read(), {snip_path!r}, 'exec'))"
    )
    env = dict(os.environ, NO_TEST="1", BENCH_NEO_PROBE_S="60")
    proc = subprocess.run(
        [sys.executable, "-c", wrapper, REPO, vcf, fasta,
         str(d / "out")],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    # the harness contract: both legs with cold/dt, or {"stalled": true}
    assert set(payload) == {"tpu", "mt"}, payload
    for leg in payload.values():
        assert leg["cold"] > 0 and leg["dt"] > 0
    # both legs produced per-sample TSVs
    for mode in ("tpu", "mt"):
        outdir = str(d / f"out_{mode}")
        tsvs = [f for f in os.listdir(outdir) if f.endswith(".tsv")]
        assert len(tsvs) == 2, (mode, tsvs)
