"""Property-based lexer/decoder robustness (hypothesis)."""
import string

import pytest
from hypothesis import given, settings, strategies as st

from vcf2prot_tpu.frontend import text_parser as tp
from vcf2prot_tpu.frontend.bitmask import decode_bitmask

ASCII = st.text(
    alphabet=string.ascii_letters + string.digits + "|,;:>*&._-+$ ",
    max_size=60,
)


@given(ASCII)
@settings(max_examples=300, deadline=None)
def test_split_csq_never_crashes(s):
    try:
        out = tp.split_csq_string(s)
        assert len(out) == 3
    except tp.CsqParseError:
        pass


@given(ASCII)
@settings(max_examples=300, deadline=None)
def test_parse_aa_field_never_crashes(s):
    try:
        ref_pos, ref_seq, mut_pos, mut_seq = tp.parse_amino_acid_field(s)
        assert 0 <= ref_pos <= 0xFFFF and 0 <= mut_pos <= 0xFFFF
        assert ref_seq and mut_seq
    except tp.CsqParseError:
        pass


@given(ASCII)
@settings(max_examples=300, deadline=None)
def test_get_bit_mask_then_decode_never_crashes(s):
    try:
        mask = tp.get_bit_mask(s)
        decoded = decode_bitmask(mask)
    except tp.InvalidBitMaskError:
        return
    if decoded is not None:
        h1, h2 = decoded
        # indices are non-negative, strictly increasing within a haplotype
        for hap in (h1, h2):
            assert all(a >= 0 for a in hap)
            assert hap == sorted(hap)


@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=200, deadline=None)
def test_scalar_mask_roundtrip(v):
    """Scalar decode agrees with direct bit inspection."""
    mask = tp.get_bit_mask(f"0|1:{v}")
    decoded = decode_bitmask(mask)
    expect1 = [i for i in range(16) if (v >> (2 * i)) & 1]
    expect2 = [i for i in range(16) if (v >> (2 * i + 1)) & 1]
    if v == 0:
        assert decoded is None
        return
    h1, h2 = decoded
    assert h1 == expect1
    assert h2 == expect2


@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), min_size=2, max_size=5))
@settings(max_examples=200, deadline=None)
def test_multiword_mask_stride(words):
    """Each word owns a 15-entry field regardless of its own bit count."""
    field = ",".join(str(w) for w in words)
    try:
        mask = tp.get_bit_mask(f"0|1:{field}")
        decoded = decode_bitmask(mask)
    except tp.InvalidBitMaskError:
        # words > i32 range in a post-trim single-word mask, etc.
        return
    # trim trailing zero words like the decoder does
    trimmed = list(words)
    while trimmed and trimmed[-1] == 0:
        trimmed.pop()
    expect1, expect2 = [], []
    base = 0
    for w in trimmed:
        for i in range(16):
            if (w >> (2 * i)) & 1:
                expect1.append(base + i)
            if (w >> (2 * i + 1)) & 1:
                expect2.append(base + i)
        base += 15
    if decoded is None:
        assert not expect1 and not expect2 or (
            len(trimmed) == 1 and trimmed[0] >= 2**31
        ) or len(trimmed) == 1 and trimmed[0] == 0
        return
    h1, h2 = decoded
    if len(trimmed) == 1 and trimmed[0] >= 2**31:
        return  # i32-parse failure path decodes as reference
    assert h1 == expect1
    assert h2 == expect2
