"""Synthetic cohort generator for parity and scale tests.

Generates random reference proteomes and per-haplotype consequence strings
that are internally consistent (mutated positions account for upstream indel
shifts, as bcftools/csq reports them).
"""
import random
import string

AA = "ACDEFGHIKLMNPQRSTVWY"


def random_proteome(rng: random.Random, n_transcripts=20, min_len=60, max_len=800):
    ref = {}
    for i in range(n_transcripts):
        name = f"ENST{i:011d}"
        length = rng.randint(min_len, max_len)
        ref[name] = "".join(rng.choice(AA) for _ in range(length))
    return ref


def _mk_csq(mut_type, name, change):
    return f"{mut_type}|GENE|{name}|protein_coding|+|{change}|1A>1T"


def random_transcript_mutations(rng: random.Random, name: str, seq: str):
    """A sorted, non-overlapping mutation list for one transcript/haplotype."""
    n = len(seq)
    csqs = []
    pos = rng.randint(1, max(1, n // 4))   # 1-based
    shift = 0
    had_del = False
    n_muts = rng.randint(1, 6)
    for k in range(n_muts):
        if pos >= n - 6:
            break
        last = k == n_muts - 1
        ref_res = seq[pos - 1]
        mpos = pos + shift
        star = "*" if (k > 0 and rng.random() < 0.3) else ""
        kind = rng.random()
        if last and kind < 0.35:
            # terminal mutation families
            term = rng.random()
            if term < 0.3:
                csqs.append(_mk_csq(star + "stop_gained", name, f"{pos}{ref_res}>{mpos}*"))
            elif term < 0.6:
                payload = "".join(rng.choice(AA) for _ in range(rng.randint(1, 12)))
                csqs.append(
                    _mk_csq(star + "frameshift", name, f"{pos}{ref_res}>{mpos}{ref_res}{payload}*")
                )
            elif term < 0.8 and not had_del:
                # stop_lost after a non-adjacent deletion is rejected by the
                # reference compiler's QC (its gap copy drops the stop slot),
                # so only emit it on deletion-free haplotypes
                stop = n  # 1-based stop position
                payload = "".join(rng.choice(AA) for _ in range(rng.randint(1, 8)))
                csqs.append(_mk_csq("stop_lost", name, f"{stop}*>{stop + shift}{payload}"))
            else:
                payload = "".join(rng.choice(AA) for _ in range(rng.randint(2, 8)))
                csqs.append(
                    _mk_csq(
                        star + "frameshift&stop_retained" if not star else "*frameshift&stop_retained",
                        name,
                        f"{pos}{ref_res}>{mpos}{payload}*",
                    )
                )
            break
        r = kind
        if r < 0.5:
            new = rng.choice(AA.replace(ref_res, ""))
            csqs.append(_mk_csq(star + "missense", name, f"{pos}{ref_res}>{mpos}{new}"))
        elif r < 0.75:
            ins = "".join(rng.choice(AA) for _ in range(rng.randint(1, 4)))
            csqs.append(
                _mk_csq(star + "inframe_insertion", name, f"{pos}{ref_res}>{mpos}{ref_res}{ins}")
            )
            shift += len(ins)
        else:
            span = rng.randint(2, min(4, n - pos))
            del_seq = seq[pos - 1: pos - 1 + span]
            csqs.append(
                _mk_csq(star + "inframe_deletion", name, f"{pos}{del_seq}>{mpos}{del_seq[0]}")
            )
            shift -= span - 1
            had_del = True
            pos += span  # skip past the deleted span
        pos += rng.randint(6, 40)
    return csqs


def random_cohort(seed=0, n_samples=8, n_transcripts=12):
    """Returns (ref_seqs, {sample: (hap1_csqs, hap2_csqs)})."""
    rng = random.Random(seed)
    ref = random_proteome(rng, n_transcripts)
    names = list(ref)
    samples = {}
    for s in range(n_samples):
        haps = []
        for _h in range(2):
            csqs = []
            for name in rng.sample(names, rng.randint(1, max(1, len(names) // 2))):
                csqs.extend(random_transcript_mutations(rng, name, ref[name]))
            haps.append(csqs)
        samples[f"SAMPLE{s:04d}"] = (haps[0], haps[1])
    return ref, samples


def shared_cohort(seed=0, n_samples=32, n_transcripts=12, bundles_per_txp=3,
                  carrier_p=0.35):
    """1000G-like cohort: each transcript has a small pool of population
    haplotype bundles and every sample haplotype either carries one pool
    bundle or none. Bundle reuse across samples is what the native compile
    memo exploits (real cohorts share variants; `random_cohort` is the
    adversarial no-sharing case)."""
    rng = random.Random(seed)
    ref = random_proteome(rng, n_transcripts)
    pools = {}
    for name, seq in ref.items():
        pool = []
        for _ in range(bundles_per_txp):
            bundle = random_transcript_mutations(rng, name, seq)
            if bundle:
                pool.append(bundle)
        pools[name] = pool
    samples = {}
    for s in range(n_samples):
        haps = []
        for _h in range(2):
            csqs = []
            for name in ref:
                pool = pools[name]
                if pool and rng.random() < carrier_p:
                    csqs.extend(rng.choice(pool))
            haps.append(csqs)
        samples[f"SAMPLE{s:04d}"] = (haps[0], haps[1])
    return ref, samples


def write_synthetic_vcf(path, ref, samples, rng=None):
    """Emit a VCF whose records carry per-transcript consequence bundles.

    For each transcript, one record holds all of a haplotype-bundle's
    consequences comma-joined in INFO/BCSQ; per-sample FORMAT bitmasks select
    which haplotype carries the bundle. Returns {sample: (hap1_csqs,
    hap2_csqs)} describing what each sample should decode to.
    """
    rng = rng or random.Random(1234)
    sample_names = list(samples)
    # collect one bundle per (transcript) from the union of per-sample lists:
    # here each sample's per-haplotype csq list IS its bundle, so records are
    # emitted per (sample, hap, transcript) with masks set only for carriers.
    # To exercise shared records, group identical bundles.
    bundles = {}
    for sname, (h1, h2) in samples.items():
        for hap_idx, csqs in ((0, h1), (1, h2)):
            by_txp = {}
            for c in csqs:
                by_txp.setdefault(c.split("|")[2], []).append(c)
            for txp, group in by_txp.items():
                key = tuple(group)
                bundles.setdefault(key, []).append((sname, hap_idx))
    lines = []
    lines.append("##fileformat=VCFv4.2")
    lines.append('##INFO=<ID=BCSQ,Number=.,Type=String,Description="csq">')
    header = ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO", "FORMAT"]
    header.extend(sample_names)
    lines.append("\t".join(header))
    pos = 1000
    for key, carriers in bundles.items():
        csq_payload = ",".join(key)
        k = len(key)
        # per-word bitmask values for hap1/hap2 carriage of all k entries
        def mask_words(hap_bit):
            words = []
            remaining = k
            while remaining > 0:
                take = min(15, remaining)
                w = 0
                for i in range(take):
                    w |= 1 << (2 * i + hap_bit)
                words.append(w)
                remaining -= take
            return words

        n_words = (k + 14) // 15
        per_sample = {}
        for sname, hap_idx in carriers:
            cur = per_sample.get(sname, [0] * n_words)
            for i, w in enumerate(mask_words(hap_idx)):
                cur[i] = cur[i] | w
            per_sample[sname] = cur
        cols = []
        for sname in sample_names:
            words = per_sample.get(sname)
            if words is None:
                gt = "0|0:."
            else:
                gt = "0|1:" + ",".join(str(w) for w in words)
            cols.append(gt)
        rec = [
            "1", str(pos), f"v{pos}", "A", "T", "100", "PASS",
            f"AF=0.1;BCSQ={csq_payload}", "GT:BCSQ",
        ] + cols
        lines.append("\t".join(rec))
        pos += 10
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def write_fasta(path, ref):
    with open(path, "w") as fh:
        for name, seq in ref.items():
            fh.write(f">{name}\n")
            for i in range(0, len(seq), 70):
                fh.write(seq[i:i + 70] + "\n")


def adversarial_transcript_mutations(rng: random.Random, name: str, seq: str):
    """Denser, nastier mutation lists: tight gaps, compound terminals,
    start_lost erasure, downstream-'*' types after indels (phi paths).
    Stays within the space the reference handles without aborting."""
    n = len(seq)
    if n < 30:
        return []
    r = rng.random()
    if r < 0.06:
        # erased transcript
        kind = "start_lost" if rng.random() < 0.5 else "start_lost&splice_region"
        return [_mk_csq(kind, name, "1M>1K")]
    csqs = []
    pos = rng.randint(1, 8)
    shift = 0
    had_del = False
    blocked = False   # a terminating event occurred upstream
    for k in range(rng.randint(2, 10)):
        if pos >= n - 8:
            break
        ref_res = seq[pos - 1]
        mpos = pos + shift
        last = k >= 1 and rng.random() < 0.25
        star = "*" if (k > 0 and rng.random() < 0.5) else ""
        if last:
            t = rng.random()
            if t < 0.2:
                csqs.append(_mk_csq(star + "stop_gained", name, f"{pos}{ref_res}>{mpos}*"))
            elif t < 0.35:
                payload = "".join(rng.choice(AA) for _ in range(rng.randint(1, 30)))
                csqs.append(_mk_csq(star + "frameshift", name, f"{pos}{ref_res}>{mpos}{ref_res}{payload}*"))
            elif t < 0.5:
                tail = seq[pos - 1:]
                payload = "".join(rng.choice(AA) for _ in range(rng.randint(1, 10)))
                csqs.append(_mk_csq("*missense&inframe_altering" if star else "missense&inframe_altering",
                                    name, f"{pos}{tail[:4]}>{mpos}{payload}"))
            elif t < 0.65:
                payload = "".join(rng.choice(AA) for _ in range(rng.randint(2, 8)))
                csqs.append(_mk_csq(star + "frameshift&stop_retained" if not star else "*frameshift&stop_retained",
                                    name, f"{pos}{ref_res}>{mpos}{payload}*"))
            elif t < 0.8:
                csqs.append(_mk_csq("stop_gained&inframe_altering", name,
                                    f"{pos}{ref_res}{rng.choice(AA)}>{mpos}*"))
            elif not had_del:
                stop = n
                payload = "".join(rng.choice(AA) for _ in range(rng.randint(1, 6)))
                csqs.append(_mk_csq("stop_lost", name, f"{stop}*>{stop + shift}{payload}"))
            else:
                csqs.append(_mk_csq(star + "stop_gained", name, f"{pos}{ref_res}>{mpos}*"))
            break
        t = rng.random()
        if t < 0.45:
            new = rng.choice(AA.replace(ref_res, ""))
            csqs.append(_mk_csq(star + "missense", name, f"{pos}{ref_res}>{mpos}{new}"))
        elif t < 0.7:
            ins = "".join(rng.choice(AA) for _ in range(rng.randint(1, 6)))
            if rng.random() < 0.15:
                # insertion whose mut side is '*'-terminated: frameshift
                # escalation + blocks later '*' types
                csqs.append(_mk_csq(star + "inframe_insertion", name,
                                    f"{pos}{ref_res}>{mpos}{ref_res}{ins}*"))
                blocked = True
                csqs_extra_pos = pos + rng.randint(4, 10)
                # one downstream '*' mutation that must phi out
                if csqs_extra_pos < n - 4:
                    res2 = seq[csqs_extra_pos - 1]
                    csqs.append(_mk_csq("*missense", name,
                                        f"{csqs_extra_pos}{res2}>{csqs_extra_pos + shift}K"))
                break
            csqs.append(_mk_csq(star + "inframe_insertion", name, f"{pos}{ref_res}>{mpos}{ref_res}{ins}"))
            shift += len(ins)
        else:
            span = rng.randint(2, min(5, n - pos - 2))
            del_seq = seq[pos - 1: pos - 1 + span]
            csqs.append(_mk_csq(star + "inframe_deletion", name, f"{pos}{del_seq}>{mpos}{del_seq[0]}"))
            shift -= span - 1
            had_del = True
            pos += span
        pos += rng.randint(4, 15)
    return csqs


def adversarial_cohort(seed=0, n_samples=8, n_transcripts=12):
    rng = random.Random(seed)
    ref = random_proteome(rng, n_transcripts)
    names = list(ref)
    samples = {}
    for s in range(n_samples):
        haps = []
        for _h in range(2):
            csqs = []
            for name in rng.sample(names, rng.randint(1, len(names))):
                csqs.extend(adversarial_transcript_mutations(rng, name, ref[name]))
            haps.append(csqs)
        samples[f"SAMPLE{s:04d}"] = (haps[0], haps[1])
    return ref, samples


def read_fasta_records(path):
    """{header: sequence} from a (possibly gzipped) FASTA file."""
    import gzip as _gzip

    opener = _gzip.open if str(path).endswith(".gz") else open
    recs = {}
    header = None
    with opener(path, "rt") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith(">"):
                header = line[1:]
                recs[header] = ""
            elif header is not None:
                recs[header] += line
    return recs
