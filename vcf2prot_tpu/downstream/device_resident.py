"""Fully device-resident neoantigen pipeline: tapes never leave HBM.

The FASTA path must move every output byte to host disk, so on a slow
device->host link the host tier wins end-to-end (ARCHITECTURE 2.6). The
neoantigen workload is different: its *output* is per-sample top-k peptide
rows, a few hundred KB per cohort. This module keeps the whole compute chain
on device --

    execute (gather)  ->  alt/validity masks  ->  candidate compaction
    ->  bf16 MXU scoring  ->  per-sample top-k

-- and fetches only ``[S, top]`` scores/positions plus ``[S, top, k]`` peptide
bytes, so the slow link stops being the bottleneck and the TPU becomes
load-bearing end-to-end (the accelerator role the reference stubs at
src/data_structures/InternalRep/gir.rs:283-299).

Device-side reformulations (all static-shaped, jitted per power-of-two
bucket):

* alt-byte mask without re-reading the program: a result byte is alt-sourced
  iff its task's biased source points past the proteome blob
  (``src_biased[t] >= blob_len`` -- pack_cohort biases exactly the exe==1
  tasks), and it is a *mutation* iff the byte itself is not the compiler's
  '.' filler. Identical to peptides.alt_byte_mask by construction.
* window validity via span tiling: annotations tile each haplotype tape, so a
  k-window starting at j is in-span iff ``span_id(j) == span_id(j+k-1)``
  (span_id = searchsorted over the chunk's annotation starts).
* candidate compaction: ``cumsum(mask)`` ranks + one scatter into a bucketed
  index buffer; only candidates reach the MXU scoring head.
* per-sample top-k: samples own contiguous tape segments (pair-aligned
  chunks), so a [S, L] gather + ``lax.top_k`` ranks every sample at once.
"""
from __future__ import annotations

import functools

import numpy as np

from ..compiler.haplotype import RefBlob
from ..runtime.pack import pack_cohort, pad_to_bucket
from .report import _transcript_of
from .scoring import init_params, score_windows

NEG = np.float32(-np.inf)


@functools.lru_cache(maxsize=32)
def _exec_mask_fn(out_bucket: int, k: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(combined, dst, srcb, ann_starts, blob_len, total_res):
        j = jnp.arange(out_bucket, dtype=dst.dtype)
        t = jnp.searchsorted(dst, j, side="right") - 1
        gidx = jnp.clip(srcb[t] + j - dst[t], 0, combined.shape[0] - 1)
        tape = jnp.take(combined, gidx)
        alt = (srcb[t] >= blob_len) & (tape != ord(".")) & (j < total_res)
        # window start validity: inside one annotation span, fully real bytes
        sid_lo = jnp.searchsorted(ann_starts, j, side="right")
        sid_hi = jnp.searchsorted(
            ann_starts, j + (k - 1), side="right"
        )
        cum = jnp.cumsum(alt.astype(jnp.int32))
        # mutated-window range query: alt bytes in [j, j+k) > 0
        hi = jnp.minimum(j + (k - 1), out_bucket - 1)
        in_win = cum[hi] - jnp.where(j > 0, cum[j - 1], 0)
        cand = (
            (sid_lo == sid_hi)
            & (j + k <= total_res)
            & (in_win > 0)
        )
        return tape, cand, jnp.sum(cand.astype(jnp.int32))

    return run


@functools.lru_cache(maxsize=32)
def _score_topk_fn(out_bucket: int, cap: int, k: int, s_bucket: int,
                   l_bucket: int, top: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(tape, cand, params, sample_starts, sample_lens):
        j = jnp.arange(out_bucket, dtype=jnp.int32)
        rank = jnp.cumsum(cand.astype(jnp.int32)) - 1
        # scatter candidate positions into the cap buffer (drop-out-of-range)
        slot = jnp.where(cand, rank, cap)
        pos = jnp.full(cap, out_bucket, jnp.int32).at[slot].set(
            j, mode="drop"
        )
        live = pos < out_bucket
        safe = jnp.where(live, pos, 0)
        windows = tape[safe[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]]
        scores = jnp.where(live, score_windows(windows, params), NEG)
        # scatter scores back to tape coordinates; dead rows carry
        # pos == out_bucket and land in the sentinel slot, never colliding
        # with a live position
        full = jnp.full(out_bucket + 1, NEG, jnp.float32).at[pos].set(scores)
        # per-sample padded view + top-k (samples tile the tape contiguously)
        col = jnp.arange(l_bucket, dtype=jnp.int32)[None, :]
        idx = sample_starts[:, None] + col
        inside = col < sample_lens[:, None]
        mat = jnp.where(
            inside, full[jnp.clip(idx, 0, out_bucket - 1)], NEG
        )
        vals, local = jax.lax.top_k(mat, top)
        gpos = jnp.clip(sample_starts[:, None] + local, 0, out_bucket - 1)
        wins = tape[gpos[:, :, None] + jnp.arange(k, dtype=jnp.int32)[None, None, :]]
        return vals, gpos, wins

    return run


def _chunk_annotation_starts(programs, spans):
    """Chunk-coordinate annotation start offsets, asserting span tiling (the
    device validity rule depends on it); returns None if tiling is violated
    (caller falls back to the host path)."""
    starts = []
    for (p_idx, seg_start, seg_end), prog in zip(spans, programs):
        ann = prog.annotations
        if hasattr(ann, "starts"):
            a_st = np.asarray(ann.starts)
            a_en = np.asarray(ann.ends)
        else:
            a_st = np.fromiter((s for _n, s, _e in ann), np.int64, len(ann))
            a_en = np.fromiter((e for _n, _s, e in ann), np.int64, len(ann))
        if len(a_st):
            if (
                int(a_st[0]) != 0
                or int(a_en[-1]) != seg_end - seg_start
                or not np.all(a_st[1:] == a_en[:-1])
            ):
                return None
        elif seg_end != seg_start:
            return None
        starts.append(a_st + seg_start)
    return (
        np.concatenate(starts).astype(np.int32)
        if starts else np.zeros(0, np.int32)
    )


class DeviceNeoantigenEngine:
    """Chunked device-resident executor+scorer.

    ``run(programs)`` returns per-sample candidate rows
    ``[(score, hap_no, hap_local_pos, peptide_bytes), ...]`` sorted by
    descending score, top ``top`` per sample -- the same rows the host-batched
    path (downstream/cohort.py) produces, with ~1000x less device->host
    traffic.
    """

    def __init__(self, blob: RefBlob, k: int, params=None, top: int = 200,
                 device=None):
        import jax

        self.blob = blob
        self.k = k
        self.top = top
        self.params = params if params is not None else init_params(k)
        self.device = device or jax.devices()[0]
        self._blob_dev = jax.device_put(blob.data, self.device)
        self._combined_key = None
        self._combined_dev = None
        self._combined_ref = None

    def _combined(self, packed):
        import jax
        import jax.numpy as jnp

        if packed.alt_key is not None and packed.alt_key == self._combined_key:
            return self._combined_dev
        alt_bucket = pad_to_bucket(max(len(packed.alt), 1))
        alt = np.zeros(alt_bucket, dtype=np.uint8)
        alt[: len(packed.alt)] = packed.alt
        combined = jnp.concatenate(
            [self._blob_dev, jax.device_put(alt, self.device)]
        )
        if packed.alt_key is not None:
            self._combined_key = packed.alt_key
            self._combined_dev = combined
            self._combined_ref = packed.alt  # pin the id() key's object
        return combined

    def run_chunk(self, programs):
        """Device-resident results for one pair-aligned chunk; returns
        ``{local_sample_idx: [(score, hap, hap_pos, peptide), ...]}`` or
        None when the chunk must fall back to the host path (malformed pack
        or non-tiling annotations)."""
        import jax

        packed = pack_cohort(programs, self.blob)
        if not packed.contiguous or packed.total_res == 0:
            return None
        ann_starts = _chunk_annotation_starts(programs, packed.spans)
        if ann_starts is None:
            return None
        n_samples = len(programs) // 2
        sample_starts = np.asarray(
            [packed.spans[2 * i][1] for i in range(n_samples)], np.int32
        )
        sample_lens = np.asarray(
            [
                packed.spans[2 * i + 1][2] - packed.spans[2 * i][1]
                for i in range(n_samples)
            ],
            np.int32,
        )
        out_bucket = pad_to_bucket(packed.total_res)
        combined = self._combined(packed)
        idx_dtype = packed.dst.dtype
        task_bucket = pad_to_bucket(len(packed.dst))
        dst = np.full(task_bucket, np.iinfo(idx_dtype).max, dtype=idx_dtype)
        dst[: len(packed.dst)] = packed.dst
        srcb = np.zeros(task_bucket, dtype=idx_dtype)
        srcb[: len(packed.src_biased)] = packed.src_biased
        ann_bucket = pad_to_bucket(max(len(ann_starts), 1))
        ann = np.full(ann_bucket, np.iinfo(np.int32).max, np.int32)
        ann[: len(ann_starts)] = ann_starts
        dst_d = jax.device_put(dst, self.device)
        srcb_d = jax.device_put(srcb, self.device)
        ann_d = jax.device_put(ann, self.device)
        tape, cand, count = _exec_mask_fn(out_bucket, self.k)(
            combined, dst_d, srcb_d, ann_d,
            np.int32(len(self.blob.data)), np.int32(packed.total_res),
        )
        n_cand = int(count)  # the chunk's ONLY data-dependent host sync
        if n_cand == 0:
            return {i: [] for i in range(n_samples)}
        cap = pad_to_bucket(n_cand)
        s_bucket = pad_to_bucket(n_samples)
        # lax.top_k needs the ranked axis >= top
        l_bucket = pad_to_bucket(max(int(sample_lens.max()), self.top))
        st = np.zeros(s_bucket, np.int32)
        st[:n_samples] = sample_starts
        ln = np.zeros(s_bucket, np.int32)
        ln[:n_samples] = sample_lens
        vals, gpos, wins = _score_topk_fn(
            out_bucket, cap, self.k, s_bucket, l_bucket, self.top
        )(
            tape, cand, self.params,
            jax.device_put(st, self.device), jax.device_put(ln, self.device),
        )
        # the ONLY bulk fetch: [S, top] scores+positions, [S, top, k] bytes
        vals = np.asarray(vals)[:n_samples]
        gpos = np.asarray(gpos)[:n_samples]
        wins = np.asarray(wins)[:n_samples]
        out = {}
        for i in range(n_samples):
            hap1_len = packed.spans[2 * i][2] - packed.spans[2 * i][1]
            rows = []
            for r in range(self.top):
                sc = float(vals[i, r])
                if sc == -np.inf:
                    break
                local = int(gpos[i, r]) - int(sample_starts[i])
                if local < hap1_len:
                    hap, hpos = 1, local
                else:
                    hap, hpos = 2, local - hap1_len
                rows.append((sc, hap, hpos, bytes(wins[i, r])))
            out[i] = rows
        return out


def write_device_neoantigen_reports(outdir, proband_names, programs, blob,
                                    k: int, params=None, top: int = 200,
                                    chunk_res_bytes: int = 256 * 1024 * 1024,
                                    device=None):
    """End-to-end device-resident neoantigen reports for a cohort.

    Same TSV schema and ranking as the host-batched path
    (cohort.write_reports_from_candidates); chunks that cannot run on device
    (malformed pack, non-tiling annotations) fall back to host collection +
    the batched scorer so output coverage is never lost.
    """
    import os

    from ..pipeline import _chunk_indices

    if params is None:
        params = init_params(k)
    eng = DeviceNeoantigenEngine(blob, k, params=params, top=top,
                                 device=device)
    paths = []
    for chunk in _chunk_indices(programs, chunk_res_bytes, pair_aligned=True):
        progs = [programs[i] for i in chunk]
        rows = eng.run_chunk(progs)
        if rows is None:
            rows = _host_chunk_rows(progs, blob, k, params, top)
        for local_i, sample_rows in rows.items():
            sample_idx = chunk[2 * local_i] // 2
            proband = proband_names[sample_idx]
            hap_pair = (programs[2 * sample_idx],
                        programs[2 * sample_idx + 1])
            path = os.path.join(outdir, f"{proband}.neoantigens.tsv")
            with open(path, "w") as fh:
                fh.write(
                    "peptide\thaplotype\ttranscript\tprotein_start\tscore\n"
                )
                for sc, hap, hpos, pep in sample_rows:
                    prog = hap_pair[hap - 1]
                    name = _transcript_of(prog.annotations, hpos)
                    rel = hpos - next(
                        s for n, s, _e in prog.annotations if n == name
                    )
                    fh.write(
                        f"{pep.decode('ascii')}\t{hap}\t{name}\t{rel}\t"
                        f"{sc:.6f}\n"
                    )
            paths.append(path)
    return paths


def _host_chunk_rows(progs, blob, k, params, top):
    """Host-path fallback for one chunk: oracle execution + host candidate
    collection + the batched scorer; same row tuples as run_chunk."""
    from ..runtime import cpu_engine
    from .cohort import collect_candidates, score_cohort

    tapes = [cpu_engine.execute_tasks(p, blob) for p in progs]
    windows, sample_ids, haps, starts = collect_candidates(progs, tapes, k)
    scores = score_cohort(windows, params)
    out = {i: [] for i in range(len(progs) // 2)}
    for i in range(len(progs) // 2):
        sel = np.nonzero(sample_ids == i)[0]
        order = sel[np.argsort(-scores[sel], kind="stable")][:top]
        out[i] = [
            (
                float(scores[j]),
                int(haps[j]),
                int(starts[j]),
                bytes(windows[j]),
            )
            for j in order
        ]
    return out
