"""Per-sample intermediate representations.

* ``EarlyMap``  -- proband + two lists of raw consequence strings, one per
  haplotype (reference: src/data_structures/Map.rs:51-150).
* ``AltTranscript`` -- all mutations of one transcript on one haplotype,
  with duplicate/conflict QC (reference: src/data_structures/vcf_ds.rs:357-479).
* ``IntMap``    -- proband + two lists of AltTranscript
  (reference: Map.rs:9-45).
* grouping helpers (reference: src/functions/vcf_tools.rs:41-133).
"""
from __future__ import annotations

from dataclasses import dataclass, field

from . import text_parser
from .mutation import Mutation


class ConflictingMutationsError(RuntimeError):
    """Two *different* mutations at the same reference position in one
    transcript (the reference panics here; vcf_ds.rs:468-471)."""


@dataclass
class EarlyMap:
    proband: str
    mutations1: list = field(default_factory=list)
    mutations2: list = field(default_factory=list)


@dataclass
class AltTranscript:
    name: str
    alts: list = field(default_factory=list)   # list[Mutation]

    @staticmethod
    def from_csq_strings(name: str, csq_strings) -> "AltTranscript":
        """Parse each consequence string; unparseable entries are silently
        dropped (the reference's filter_map; vcf_ds.rs:379-386)."""
        alts = []
        for csq in csq_strings:
            try:
                alts.append(Mutation.from_csq(csq))
            except text_parser.CsqParseError:
                continue
        return AltTranscript(name, alts)

    def sort_alterations(self) -> None:
        self.alts.sort(key=lambda m: m.sort_key())

    def drop_replicate(self) -> "AltTranscript":
        """Dedup identical mutations; abort on distinct mutations sharing a
        reference position (first QC gate; vcf_ds.rs:447-479)."""
        self.sort_alterations()
        unique_ref_positions = {m.info.ref_pos for m in self.alts}
        if len(unique_ref_positions) < len(self.alts):
            # drop consecutive fully-identical duplicates
            deduped = []
            for m in self.alts:
                if deduped and (
                    deduped[-1].mut_type == m.mut_type
                    and deduped[-1].info == m.info
                ):
                    continue
                deduped.append(m)
            self.alts = deduped
            if len(unique_ref_positions) != len(self.alts):
                raise ConflictingMutationsError(
                    f"Conflicting mutations in transcript {self.name}: "
                    f"{self.alts}"
                )
        return self


@dataclass
class IntMap:
    proband: str
    mutations1: list = field(default_factory=list)  # list[AltTranscript]
    mutations2: list = field(default_factory=list)

    def to_json_dict(self) -> dict:
        def _alts(vec):
            return [
                {
                    "name": t.name,
                    "alts": [
                        {
                            "transcript_name": m.transcript,
                            "mut_type": m.mut_type,
                            "mut_info": {
                                "ref_aa_position": m.info.ref_pos,
                                "mut_aa_position": m.info.mut_pos,
                                "ref_aa": m.info.ref_aa.seq or "*",
                                "mut_aa": m.info.mut_aa.seq or "*",
                            },
                        }
                        for m in t.alts
                    ],
                }
                for t in vec
            ]

        return {
            "proband_name": self.proband,
            "mutations1": _alts(self.mutations1),
            "mutations2": _alts(self.mutations2),
        }


def get_unique_transcripts(csq_strings) -> list:
    """Sorted unique transcript ids among parseable consequence strings
    (reference: vcf_tools.rs:116-133)."""
    names = []
    for csq in csq_strings:
        try:
            names.append(text_parser.split_csq_string(csq)[1])
        except text_parser.CsqParseError:
            continue
    names.sort()
    out = []
    for n in names:
        if not out or out[-1] != n:
            out.append(n)
    return out


def group_muts_per_transcript(csq_strings) -> list:
    """Group one haplotype's consequence strings by transcript.

    Keeps the reference's substring-membership grouping semantics
    (``csq.contains(transcript)``; vcf_tools.rs:89-92) so border cases group
    identically, but indexes strings by transcript id first to avoid the
    reference's O(n_transcripts * n_mutations) scan.
    """
    unique = get_unique_transcripts(csq_strings)
    if not unique:
        return []
    exact: dict = {}
    for csq in csq_strings:
        try:
            tname = text_parser.split_csq_string(csq)[1]
        except text_parser.CsqParseError:
            tname = None
        if tname is not None:
            exact.setdefault(tname, []).append(csq)
    # transcripts whose id is a substring of another id need the full scan to
    # reproduce the reference's `contains` behavior; this is rare (ids are
    # fixed-width ENST accessions), so detect and handle only those.
    sorted_ids = unique
    needs_scan = set()
    for i, tid in enumerate(sorted_ids):
        for other in sorted_ids[i + 1:]:
            if not other.startswith(tid) and tid not in other:
                continue
            if tid != other and tid in other:
                needs_scan.add(tid)
    out = []
    for tname in unique:
        if tname in needs_scan:
            group = [c for c in csq_strings if tname in c]
        else:
            group = exact.get(tname, [])
        out.append(AltTranscript.from_csq_strings(tname, group).drop_replicate())
    return out


def build_int_map_from_early(early: EarlyMap) -> IntMap:
    return IntMap(
        early.proband,
        group_muts_per_transcript(early.mutations1),
        group_muts_per_transcript(early.mutations2),
    )
