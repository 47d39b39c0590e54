"""Bitmask-decoder conformance (reference: src/data_structures/MaskDecoder.rs
test module + doctests)."""
import pytest

from vcf2prot_tpu.frontend.bitmask import decode_bitmask
from vcf2prot_tpu.frontend import text_parser as tp


def test_reference_only():
    assert decode_bitmask("") is None
    assert decode_bitmask("0$") is None


def test_single_word():
    # 10922 = 0b10101010101010 -> odd bits -> hap2 entries 0..6
    hap1, hap2 = decode_bitmask("10922$")
    assert hap1 == []
    assert hap2 == [0, 1, 2, 3, 4, 5, 6]


def test_word_3():
    # 3 = 0b11 -> entry 0 on both haplotypes
    hap1, hap2 = decode_bitmask("3$")
    assert hap1 == [0]
    assert hap2 == [0]


def test_multi_word():
    # "3,3,3,3": each word sets entry 0 on both haps, stride 15 per word
    hap1, hap2 = decode_bitmask("3,3,3,3")
    assert hap1 == [0, 15, 30, 45]
    assert hap2 == [0, 15, 30, 45]


def test_word_1_and_2():
    hap1, hap2 = decode_bitmask("1$")
    assert (hap1, hap2) == ([0], [])
    hap1, hap2 = decode_bitmask("2$")
    assert (hap1, hap2) == ([], [0])


def test_negative_mask_panics_upstream():
    with pytest.raises(tp.InvalidBitMaskError):
        tp.get_bit_mask("0|1:-3")


def test_pipeline_from_sample_field():
    mask = tp.get_bit_mask(
        "0|1:0.432432:16,21:37:PASS:99:634,0,417:..:0.1989:10922"
    )
    assert mask == "10922$"
    hap1, hap2 = decode_bitmask(mask)
    assert hap1 == []
    assert hap2 == [0, 1, 2, 3, 4, 5, 6]


def test_dollar_mask_with_junk_aborts_cleanly():
    """Fuzz-found: a malformed sample field whose last ':' chunk contains
    commas AND ends with '$' reached the scalar decode branch with junk;
    the reference's parse unwrap panics there and the native tier raises
    FatalError, so the Python tier must raise the clean abort error, never
    a raw ValueError."""
    import pytest

    from vcf2prot_tpu.frontend import text_parser as tp

    field = "UcR$|J:kE|*gSW|+,xK| utL|46K|F7z|cR$"
    mask = tp.get_bit_mask(field)
    with pytest.raises(tp.InvalidBitMaskError):
        decode_bitmask(mask)


def test_negative_dollar_mask_aborts_not_loops():
    """-N$ given directly to the decoder must abort (arithmetic shift never
    zeroes a negative word -- this used to loop forever)."""
    import pytest

    from vcf2prot_tpu.frontend import text_parser as tp

    with pytest.raises(tp.InvalidBitMaskError):
        decode_bitmask("-5$")
