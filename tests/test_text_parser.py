"""Conformance tests for the CSQ/FORMAT lexer.

Ported from the reference's literal fixtures
(reference: src/functions/text_parser.rs:265-629 test module and doctests).
"""
import pytest

from vcf2prot_tpu.frontend import text_parser as tp
from vcf2prot_tpu.frontend.mutation import MutatedString, NOT, SEQ, END


def test_split_csq_string_ok():
    s = "stop_gained|RABGEF1|ENST00000484547|NMD|+|32Q>32*|66771993C>T"
    assert tp.split_csq_string(s) == ["stop_gained", "ENST00000484547", "32Q>32*"]


def test_split_csq_string_non_coding():
    s = "5_prime_utr|RABGEF1|ENST00000437078|protein_coding"
    with pytest.raises(tp.CsqParseError):
        tp.split_csq_string(s)


def test_split_csq_string_start_lost_short_form():
    s = "start_lost|FAM20C|ENST00000313766|protein_coding"
    assert tp.split_csq_string(s) == ["start_lost", "ENST00000313766", "1M>1*"]


def test_parse_amino_acid_field_1():
    r = tp.parse_amino_acid_field("32Q>32*")
    assert r == (32, "Q", 32, "*")


def test_parse_amino_acid_field_2():
    assert tp.parse_amino_acid_field("32QK>32*") == (32, "QK", 32, "*")


def test_parse_amino_acid_field_3():
    assert tp.parse_amino_acid_field("32QK>32NMKLOPLMNBJK*") == (
        32, "QK", 32, "NMKLOPLMNBJK*",
    )


def test_parse_amino_acid_field_4():
    assert tp.parse_amino_acid_field("32*>32NMKLOPLMNBJK*") == (
        32, "*", 32, "NMKLOPLMNBJK*",
    )


def test_parse_amino_acid_seq_position():
    assert tp.parse_amino_acid_seq_position("32Q") == (32, "Q")
    assert tp.parse_amino_acid_seq_position("32*") == (32, "*")
    assert tp.parse_amino_acid_seq_position("32KMNOPQQQ*") == (32, "KMNOPQQQ*")


def test_parse_amino_acid_seq_position_sweep():
    # the reference's 100x24 generated sweep (text_parser.rs:394-419)
    aa = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    for pos in range(100):
        for j in range(1, 24):
            seq = aa[:j]
            got = tp.parse_amino_acid_seq_position(f"{pos}{seq}")
            assert got == (pos, seq)


@pytest.mark.parametrize("bad", ["Test", "", "-223QK"])
def test_parse_amino_acid_seq_position_bad(bad):
    with pytest.raises(tp.CsqParseError):
        tp.parse_amino_acid_seq_position(bad)


def test_remove_leading_zeros():
    assert tp.remove_leading_zeros("3,4,0") == "3,4"
    assert tp.remove_leading_zeros("3,4,0,1,0") == "3,4,0,1"
    assert tp.remove_leading_zeros("0,0") == ""


def test_parse_fields():
    assert tp.parse_fields("0") == "0$"
    assert tp.parse_fields("6") == "6$"
    assert tp.parse_fields("6,3") == ""


def test_parse_fields_negative_panics():
    with pytest.raises(tp.InvalidBitMaskError):
        tp.parse_fields("-3")


@pytest.mark.parametrize(
    "field,expected",
    [
        ("0|0", ""),
        ("0|0:.:79,0:79:99:.:.:.:0", "0$"),
        ("0|0:.:37,0:37:72:.:.:.:0", "0$"),
        ("0|0:0", "0$"),
        ("0|1:0.541667:26,22:48:PASS:99:577,0,683:..:0.3336:2", "2$"),
        ("0|1:10", "10$"),
        ("0|1:0.432432:16,21:37:PASS:99:634,0,417:..:0.1989:10922", "10922$"),
        ("1|1:.:4,87:91:99:3000,249,0:..:0.4777:15", "15$"),
        ("1|1:.:4,87:91:99:3000,249,0:..:0.4777:15,32,14", "15,32,14"),
        ("1|1:.:4,87:91:99:3000,249,0:..:0.4777:15,32,14,0,0,0", "15,32,14"),
        ("0|1:0.432432:16,21:37:PASS:99:634,0,417:..:0.1989:10922,14,0,0,0", "10922,14"),
    ],
)
def test_get_bit_mask(field, expected):
    assert tp.get_bit_mask(field) == expected


def test_get_type():
    s = "*missense|ITPRID1|ENST00000409210|protein_coding|+|717C>717Y|31643796G>A"
    assert tp.get_type(s) == "*missense"


def test_mutated_string():
    assert MutatedString.from_str("KLM").kind == SEQ
    assert MutatedString.from_str("NOP*").kind == END
    assert MutatedString.from_str("*").kind == NOT
    with pytest.raises(tp.CsqParseError):
        MutatedString.from_str("")
