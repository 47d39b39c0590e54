"""VCF frontend: streaming reader, sample extraction, BCSQ record filter and
per-sample haplotype decode.

Capability parity with the reference frontend (reference: src/readers.rs:22-283
and src/data_structures/vcf_ds.rs:67-329) with a TPU-host-friendly design:

* the file is streamed line-by-line (the reference loads the whole file into a
  single String; readers.rs:119-139),
* the record-major -> sample-major transpose operates on column slices of each
  line instead of materializing a full string matrix,
* decode is embarrassingly parallel over samples (thread pool).
"""
from __future__ import annotations

import gzip
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from ..constants import SUP_TYPE_SET
from . import text_parser
from .bitmask import decode_bitmask
from .maps import EarlyMap


class VcfFormatError(ValueError):
    pass


def _open_text(path):
    if str(path).endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "r")


def is_supported_csq(csq: str) -> bool:
    """True if the consequence string has six pipes and a supported type
    (reference: readers.rs:269-283)."""
    if csq.count("|") != 6:
        return False
    return csq.split("|", 1)[0] in SUP_TYPE_SET


def record_is_supported(line: str) -> bool:
    """True if a VCF body line carries at least one supported BCSQ consequence
    (reference: readers.rs:225-255)."""
    fields = line.split("\t")
    if len(fields) < 8:
        return False
    info = fields[7]
    bcsq = None
    for sub in info.split(";"):
        if sub.startswith("BCSQ="):
            bcsq = sub.split("=")[1]
            break
    if bcsq is None:
        return False
    if "," in bcsq:
        return any(is_supported_csq(e) for e in bcsq.split(","))
    return is_supported_csq(bcsq)


@dataclass
class VcfFile:
    probands: list          # sample names, in header order
    records: list           # supported body lines (raw strings)


def read_vcf(path) -> VcfFile:
    """Stream a VCF file, returning sample names and the supported records."""
    probands = None
    records = []
    with _open_text(path) as fh:
        for raw in fh:
            line = raw.rstrip("\n")
            if not line:
                continue
            if line.startswith("#"):
                if line.startswith("#CHROM"):
                    cols = line.rstrip("\t").split("\t")
                    if len(cols) < 8:
                        raise VcfFormatError(
                            "The provided file does not contain the minimum "
                            f"number of columns, expected >= 8, found {len(cols)}"
                        )
                    # drop the 9 fixed columns (CHROM..FORMAT); the rest are
                    # samples (reference: readers.rs:180)
                    probands = cols[9:]
                continue
            if record_is_supported(line):
                records.append(line)
    if probands is None:
        raise VcfFormatError("Could not find a header line")
    if not probands:
        raise VcfFormatError("The file does not contain any patients")
    if not records:
        raise VcfFormatError("Could not extract any records from the provided file")
    return VcfFile(probands, records)


def get_consequence(line: str) -> str:
    """INFO -> the BCSQ= payload of one record (reference: vcf_ds.rs:67-86)."""
    info = line.split("\t")[7]
    return info.split("BCSQ=")[1]


def _decode_sample(consequences, sample_fields):
    """Decode one sample's column across all records into per-haplotype
    consequence-string lists (reference: vcf_ds.rs:215-295)."""
    hap1: list = []
    hap2: list = []
    for csq, sample_field in zip(consequences, sample_fields):
        mask = text_parser.get_bit_mask(sample_field)
        decoded = decode_bitmask(mask)
        if decoded is None:
            continue
        idx1, idx2 = decoded
        if not idx1 and not idx2:
            continue
        entries = csq.split(",")
        for i in idx1:
            entry = entries[i]
            if entry.split("|", 1)[0] in SUP_TYPE_SET:
                hap1.append(entry)
        for i in idx2:
            entry = entries[i]
            if entry.split("|", 1)[0] in SUP_TYPE_SET:
                hap2.append(entry)
    return hap1, hap2


def build_early_maps(vcf: VcfFile, num_threads: int = 0) -> list:
    """Per-sample EarlyMaps: transpose + bitmask decode + SUP_TYPE filter.

    The transpose and decode are fused: each record line is split once and its
    sample columns dispatched, instead of building a records x samples string
    matrix as the reference does (vcf_ds.rs:126-191).
    """
    consequences = [get_consequence(line) for line in vcf.records]
    split_records = [line.split("\t")[9:] for line in vcf.records]
    n = len(vcf.probands)

    def decode_one(s_idx: int) -> EarlyMap:
        col = [rec[s_idx] for rec in split_records]
        hap1, hap2 = _decode_sample(consequences, col)
        return EarlyMap(vcf.probands[s_idx], hap1, hap2)

    if num_threads and num_threads > 1 and n > 1:
        with ThreadPoolExecutor(max_workers=num_threads) as pool:
            return list(pool.map(decode_one, range(n)))
    return [decode_one(i) for i in range(n)]
