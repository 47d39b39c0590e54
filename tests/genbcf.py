"""Minimal BCF2.2 encoder for testing the native BCF reader.

Implements the record layout from the samtools VCFv4.3 spec section 6
(magic, header text block, l_shared/l_indiv record framing, typed values,
integer vector sentinels), wrapped in BGZF. Written from the spec text —
deliberately independent of the C++ decoder so the two cross-check each
other.
"""
import struct

from vcf2prot_tpu.io.bgzf import bgzf_compress

INT8_MISSING, INT8_END = -128, -127
INT32_MISSING, INT32_END = -2147483648, -2147483647


def _typed_int(v: int) -> bytes:
    """Scalar typed integer (descriptor + payload), narrowest width."""
    if -120 <= v <= 127:
        return bytes([0x11]) + struct.pack("<b", v)
    if -32760 <= v <= 32767:
        return bytes([0x12]) + struct.pack("<h", v)
    return bytes([0x13]) + struct.pack("<i", v)


def _typed_descriptor(type_code: int, n: int) -> bytes:
    if n < 15:
        return bytes([(n << 4) | type_code])
    return bytes([(15 << 4) | type_code]) + _typed_int(n)


def _typed_str(s: bytes) -> bytes:
    return _typed_descriptor(7, len(s)) + s


def _header_text(sample_names, explicit_idx: bool) -> str:
    def idx(n):
        return f",IDX={n}" if explicit_idx else ""

    # with explicit IDX the dictionary indices are deliberately scrambled
    lines = [
        "##fileformat=VCFv4.2",
        f'##FILTER=<ID=PASS,Description="pass"{idx(0)}>',
        "##contig=<ID=1>",
        f'##INFO=<ID=AF,Number=A,Type=Float,Description="af"{idx(5)}>',
        f'##INFO=<ID=BCSQ,Number=.,Type=String,Description="csq"{idx(3)}>',
        f'##FORMAT=<ID=GT,Number=1,Type=String,Description="gt"{idx(1)}>',
        # one shared dictionary across FILTER/INFO/FORMAT: BCSQ keeps the
        # same IDX on both its INFO and FORMAT lines (as bcftools emits)
        '##FORMAT=<ID=BCSQ,Number=.,Type=Integer,Description="mask"'
        + idx(3) + ">",
    ]
    lines.append(
        "\t".join(
            ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO",
             "FORMAT"] + list(sample_names)
        )
    )
    return "\n".join(lines) + "\n"


def _bundles(samples):
    """Same record bundling as genvcf.write_synthetic_vcf: one record per
    distinct per-transcript consequence bundle, carriers share it."""
    bundles = {}
    for sname, (h1, h2) in samples.items():
        for hap_idx, csqs in ((0, h1), (1, h2)):
            by_txp = {}
            for c in csqs:
                by_txp.setdefault(c.split("|")[2], []).append(c)
            for _txp, group in by_txp.items():
                bundles.setdefault(tuple(group), []).append((sname, hap_idx))
    return bundles


def _mask_words(k: int, hap_bit: int):
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


def write_synthetic_bcf(path, ref, samples, explicit_idx=False,
                        block_size=0xFF00):
    """Emit the same cohort `genvcf.write_synthetic_vcf` would, as BCF."""
    sample_names = list(samples)
    n_samples = len(sample_names)
    header = _header_text(sample_names, explicit_idx)
    if explicit_idx:
        af_idx, bcsq_idx, gt_idx = 5, 3, 1
    else:
        # implicit: PASS=0, then order of appearance (AF, BCSQ, GT)
        af_idx, bcsq_idx, gt_idx = 1, 2, 3

    body = bytearray()
    pos = 1000
    for key, carriers in _bundles(samples).items():
        csq_payload = ",".join(key).encode()
        k = len(key)
        n_words = (k + 14) // 15
        per_sample = {}
        for sname, hap_idx in carriers:
            cur = per_sample.get(sname, [0] * n_words)
            for i, w in enumerate(_mask_words(k, hap_idx)):
                cur[i] |= w
            per_sample[sname] = cur

        shared = bytearray()
        shared += struct.pack("<iii", 0, pos - 1, 1)      # CHROM, 0-based POS, rlen
        shared += struct.pack("<f", 100.0)                # QUAL
        n_info, n_allele = 2, 2
        shared += struct.pack("<i", (n_allele << 16) | n_info)
        n_fmt = 2
        shared += struct.pack("<i", (n_fmt << 24) | n_samples)
        shared += _typed_str(f"v{pos}".encode())          # ID
        shared += _typed_str(b"A") + _typed_str(b"T")     # alleles
        shared += _typed_descriptor(1, 1) + struct.pack("<b", 0)  # FILTER=PASS
        shared += _typed_int(af_idx)                      # INFO AF
        shared += _typed_descriptor(5, 1) + struct.pack("<f", 0.1)
        shared += _typed_int(bcsq_idx)                    # INFO BCSQ
        shared += _typed_str(csq_payload)

        indiv = bytearray()
        indiv += _typed_int(gt_idx)                       # FORMAT GT
        indiv += _typed_descriptor(1, 2)                  # int8 x2 per sample
        for sname in sample_names:
            carried = sname in per_sample
            indiv += struct.pack("<bb", 2, 5 if carried else 4)  # 0|1 / 0|0
        indiv += _typed_int(bcsq_idx)                     # FORMAT BCSQ
        indiv += _typed_descriptor(3, n_words)            # int32 x n per sample
        for sname in sample_names:
            words = per_sample.get(sname)
            if words is None:
                vals = [INT32_MISSING] + [INT32_END] * (n_words - 1)
            else:
                vals = list(words)
            indiv += struct.pack(f"<{n_words}i", *vals)

        body += struct.pack("<II", len(shared), len(indiv))
        body += shared
        body += indiv
        pos += 10

    text = header.encode() + b"\x00"
    payload = b"BCF\x02\x02" + struct.pack("<I", len(text)) + text + bytes(body)
    with open(path, "wb") as fh:
        fh.write(bgzf_compress(payload, level=4, block_size=block_size))
