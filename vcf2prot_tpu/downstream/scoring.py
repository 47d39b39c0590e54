"""Peptide scoring head: an MXU-shaped model scaffold over peptide windows.

A deliberately small, production-shaped architecture for ranking neoantigen
candidate peptides: one-hot residues -> per-position embedding -> flatten ->
dense(relu) -> dense(1). Everything is bf16 on the MXU with fp32 accumulation
(``preferred_element_type``), jit-compiled, and batched over windows -- the
shape a real MHC-presentation predictor takes on TPU.

The default parameters are deterministic random initialization: this is an
architecture scaffold to load trained weights into (``params`` is a plain
pytree), not a trained predictor -- scoring biology requires real weights.
"""
from __future__ import annotations

import numpy as np

from .peptides import ALPHABET, _alphabet_lut

VOCAB = len(ALPHABET) + 1  # + 'other'


def init_params(k: int = 9, embed_dim: int = 32, hidden: int = 128,
                seed: int = 0) -> dict:
    """Deterministic He-style initialization of the scoring head."""
    rng = np.random.default_rng(seed)

    def dense(n_in, n_out):
        w = rng.standard_normal((n_in, n_out)) * np.sqrt(2.0 / n_in)
        return w.astype(np.float32), np.zeros(n_out, dtype=np.float32)

    embed = (rng.standard_normal((VOCAB, embed_dim)) * 0.1).astype(np.float32)
    w1, b1 = dense(k * embed_dim, hidden)
    w2, b2 = dense(hidden, 1)
    return {"embed": embed, "w1": w1, "b1": b1, "w2": w2, "b2": b2}


def load_params(path: str, k: int) -> dict:
    """Load trained scoring-head weights from an ``.npz`` file.

    Expected arrays: ``embed [VOCAB, E]``, ``w1 [k*E, H]``, ``b1 [H]``,
    ``w2 [H, 1]``, ``b2 [1]``. Shapes are validated against ``k`` so a
    mismatched peptide length fails loudly at load time, not as a silent
    device-shape error mid-cohort.
    """
    data = np.load(path)
    missing = {"embed", "w1", "b1", "w2", "b2"} - set(data.files)
    if missing:
        raise ValueError(
            f"scoring params {path} missing arrays: {sorted(missing)}"
        )
    params = {name: np.asarray(data[name], np.float32) for name in
              ("embed", "w1", "b1", "w2", "b2")}
    vocab, embed_dim = params["embed"].shape
    if vocab != VOCAB:
        raise ValueError(
            f"embed vocab {vocab} != expected {VOCAB} "
            f"(alphabet {ALPHABET!r} + other)"
        )
    n_in, hidden = params["w1"].shape
    if n_in != k * embed_dim:
        raise ValueError(
            f"w1 expects {n_in} inputs but k={k} x embed={embed_dim} "
            f"gives {k * embed_dim}"
        )
    if params["b1"].shape != (hidden,) or params["w2"].shape[0] != hidden:
        raise ValueError("hidden-layer shapes disagree between w1/b1/w2")
    if params["w2"].shape[1] != 1 or params["b2"].shape != (1,):
        raise ValueError("output head must be [H, 1] weights + [1] bias")
    return params


def score_windows(windows, params: dict):
    """Score uint8 residue windows [m, k]; returns fp32 scores [m].

    jit-compatible; all matmuls run bf16 on the MXU with fp32 accumulation.
    The per-position embedding is FOLDED into the first dense layer: since
    both are linear, ``concat_i(onehot_i @ embed) @ w1`` equals
    ``onehot2 @ W`` with ``W[i*V:(i+1)*V] = embed @ w1[i*E:(i+1)*E]``. That
    turns the batch-dominant work into one [m, k*V] @ [k*V, H] matmul with a
    contraction axis the MXU can tile (k*V = 225 for 9-mers), instead of a
    k*V=25-deep einsum the systolic array underutilizes; the fold itself is
    a tiny [V, E] x [k, E, H] contraction computed once per call in fp32.
    """
    import jax
    import jax.numpy as jnp

    from .peptides import encode_windows

    m, k = windows.shape
    # gather-free one-hot (see encode_windows: a LUT take costs ~8 ns/lane
    # on TPU and dominated the whole chain)
    onehot = encode_windows(windows).reshape(m, k * VOCAB)
    embed = jnp.asarray(params["embed"], jnp.float32)
    w1 = jnp.asarray(params["w1"], jnp.float32)
    hidden = w1.shape[1]
    folded = jnp.einsum(
        "ve,keh->kvh", embed, w1.reshape(k, embed.shape[1], hidden)
    ).reshape(k * VOCAB, hidden).astype(jnp.bfloat16)
    h = jnp.dot(onehot, folded, preferred_element_type=jnp.float32)
    h = jax.nn.relu(h + jnp.asarray(params["b1"]))
    w2 = jnp.asarray(params["w2"], jnp.bfloat16)
    out = jnp.dot(
        h.astype(jnp.bfloat16), w2, preferred_element_type=jnp.float32
    )
    return (out[:, 0] + jnp.asarray(params["b2"])[0]).astype(jnp.float32)


def rank_neoantigen_candidates(prog, tape, k: int = 9, params: dict = None,
                               top: int = 50):
    """End-to-end device query: mutated k-mers of a haplotype tape, scored
    and ranked. Returns ``(windows u8[top, k], starts i32[top],
    scores f32[top])`` sorted by descending score."""
    import jax.numpy as jnp
    import numpy as np

    from .peptides import neoantigen_candidates

    windows, starts = neoantigen_candidates(prog, tape, k)
    if windows.shape[0] == 0:
        return windows, starts, jnp.zeros(0, jnp.float32)
    if params is None:
        params = init_params(k)
    scores = score_windows(windows, params)
    order = np.argsort(-np.asarray(scores))[:top]
    return windows[order], starts[order], scores[order]
