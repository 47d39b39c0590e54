"""Per-opcode instruction ISA conformance.

Ported from the reference's per-opcode doctests/unit tests
(reference: src/data_structures/InternalRep/instruction.rs:159-1435).
"""
import pytest

from vcf2prot_tpu.compiler import instruction as ins_mod
from vcf2prot_tpu.frontend.mutation import Mutation


def mk(mut_type, aa_field, transcript="ENST00000484547"):
    return Mutation.from_fields([mut_type, transcript, aa_field])


def compile_one(mut_type, aa_field):
    m = mk(mut_type, aa_field)
    return ins_mod.from_mutation(m, [m])


def test_missense():
    ins = compile_one("missense", "32Q>32R")
    assert (ins.code, ins.s_state, ins.pos_ref, ins.pos_res, ins.length, ins.data) == (
        "M", False, 31, 31, 1, "R",
    )


def test_s_missense():
    ins = compile_one("*missense", "32Q>32R")
    assert (ins.code, ins.s_state, ins.pos_ref, ins.length, ins.data) == (
        "N", True, 31, 1, "R",
    )


def test_inframe_insertion():
    ins = compile_one("inframe_insertion", "125Y>125YRR")
    assert (ins.code, ins.pos_ref, ins.pos_res, ins.length, ins.data) == (
        "I", 124, 124, 3, "YRR",
    )


def test_s_inframe_insertion():
    ins = compile_one("*inframe_insertion", "125Y>125YRR")
    assert (ins.code, ins.s_state, ins.length, ins.data) == ("J", True, 3, "YRR")


def test_inframe_deletion():
    ins = compile_one("inframe_deletion", "115SL>115S")
    assert (ins.code, ins.pos_ref, ins.length, ins.data) == ("D", 114, 1, "S")


def test_s_inframe_deletion():
    ins = compile_one("*inframe_deletion", "115SL>115S")
    assert (ins.code, ins.s_state, ins.length, ins.data) == ("C", True, 1, "S")


def test_frameshift():
    ins = compile_one("frameshift", "40VGLHFWTM*>40VDSTFGQC")
    assert (ins.code, ins.pos_ref, ins.length, ins.data) == (
        "F", 39, 8, "VDSTFGQC",
    )


def test_s_frameshift():
    ins = compile_one("*frameshift", "40VGLHFWTM*>40VDSTFGQC")
    assert (ins.code, ins.s_state, ins.length) == ("R", True, 8)


def test_stop_gained():
    ins = compile_one("stop_gained", "217E>217*")
    assert (ins.code, ins.pos_ref, ins.length, ins.data) == ("G", 216, 0, "")


def test_s_stop_gained():
    ins = compile_one("*stop_gained", "217E>217*")
    assert (ins.code, ins.s_state) == ("X", True)


def test_stop_lost():
    ins = compile_one("stop_lost", "489*>489S")
    assert (ins.code, ins.pos_ref, ins.length, ins.data) == ("L", 488, 1, "S")


def test_start_lost():
    ins = compile_one("start_lost", "1M>1K")
    assert (ins.code, ins.pos_ref, ins.pos_res, ins.length) == ("0", 0, 0, 0)


def test_s_missense_and_inframe_altering():
    ins = compile_one("*missense&inframe_altering", "188LAY>188LQS")
    assert (ins.code, ins.s_state, ins.pos_ref, ins.length, ins.data) == (
        "K", True, 187, 3, "LQS",
    )


def test_s_frameshift_and_stop_retained_end_sequence():
    # '*'-terminated payload routes through *frameshift -> 'R'
    ins = compile_one("*frameshift&stop_retained", "308GS*>308GQ*")
    assert (ins.code, ins.s_state, ins.data) == ("R", True, "GQ")


def test_s_frameshift_and_stop_retained_not_seq():
    ins = compile_one("*frameshift&stop_retained", "308GS*>308*")
    assert (ins.code, ins.s_state, ins.length, ins.data) == ("Q", True, 0, "")


def test_s_stop_gained_and_inframe_altering():
    ins = compile_one("*stop_gained&inframe_altering", "1273KEEDD>1273")
    assert (ins.code, ins.s_state, ins.pos_ref) == ("A", True, 1272)


def test_frameshift_and_stop_retained():
    ins = compile_one("frameshift&stop_retained", "20FIS*>20FLT*")
    assert (ins.code, ins.data) == ("B", "FLT")


def test_frameshift_and_stop_retained_not_seq_is_phi():
    ins = compile_one("frameshift&stop_retained", "733S*>733*")
    assert ins.is_phi()


def test_inframe_deletion_and_stop_retained():
    ins = compile_one("inframe_deletion&stop_retained", "90SL*>90*")
    assert (ins.code, ins.pos_ref, ins.length) == ("P", 89, 2)


def test_inframe_deletion_and_stop_retained_not_end():
    ins = compile_one("inframe_deletion&stop_retained", "38*>38*")
    assert (ins.code, ins.pos_ref, ins.length) == ("P", 37, 0)


def test_inframe_insertion_and_stop_retained_is_phi():
    ins = compile_one("inframe_insertion&stop_retained", "192*>192*")
    assert ins.is_phi()


def test_stop_gained_and_inframe_altering():
    ins = compile_one("stop_gained&inframe_altering", "22LESV>22*")
    assert (ins.code, ins.pos_ref) == ("T", 21)


def test_stop_lost_and_frameshift_ref_star():
    ins = compile_one("stop_lost&frameshift", "39*>39TEST")
    assert (ins.code, ins.data) == ("L", "TEST")


def test_stop_lost_and_frameshift_ref_seq():
    ins = compile_one("stop_lost&frameshift", "39Q>39TEST")
    assert (ins.code, ins.data) == ("F", "TEST")


def test_missense_and_inframe_altering_equal_len():
    ins = compile_one("missense&inframe_altering", "22LKM>22NOP")
    # pos_ref/pos_res are swapped for codes 2/3 (reference quirk)
    assert (ins.code, ins.pos_ref, ins.pos_res, ins.length, ins.data) == (
        "2", 21, 21, 3, "NOP",
    )


def test_missense_and_inframe_altering_diff_len():
    ins = compile_one("missense&inframe_altering", "22LKM>22NO")
    assert (ins.code, ins.length, ins.data) == ("3", 3, "NO")


def test_start_lost_and_splice_region():
    ins = compile_one("start_lost&splice_region", "1M>1I")
    assert ins.code == "U"


def test_insertion_escalates_to_replace():
    # multi-residue reference side -> '2' replace
    ins = compile_one("inframe_insertion", "10AB>10CD")
    assert (ins.code, ins.length, ins.data) == ("2", 2, "CD")


def test_insertion_escalates_to_3():
    ins = compile_one("inframe_insertion", "10AB>10CDE")
    assert (ins.code, ins.length, ins.data) == ("3", 2, "CDE")


def test_insertion_end_sequence_is_frameshift():
    ins = compile_one("inframe_insertion", "10A>10CDE*")
    assert (ins.code, ins.data) == ("F", "CDE")


def test_insertion_not_seq_is_stop_gained():
    ins = compile_one("inframe_insertion", "10A>10*")
    assert ins.code == "G"


def test_deletion_end_sequence_multi_is_frameshift():
    ins = compile_one("inframe_deletion", "10ABC>10DE*")
    assert (ins.code, ins.data) == ("F", "DE")


def test_validate_s_state_blocked_by_stop_gained():
    m1 = mk("stop_gained", "10Q>10*")
    m2 = mk("*missense", "20Q>20R")
    muts = sorted([m1, m2], key=lambda m: m.sort_key())
    assert ins_mod.from_mutation(m2, muts).is_phi()


def test_validate_s_state_blocked_by_frameshift():
    m1 = mk("frameshift", "10Q>10QRST")
    m2 = mk("*missense", "20Q>20R")
    muts = sorted([m1, m2], key=lambda m: m.sort_key())
    assert ins_mod.from_mutation(m2, muts).is_phi()


def test_validate_s_state_blocked_by_star_terminated_indel():
    m1 = mk("inframe_insertion", "10A>10CDE*")
    m2 = mk("*missense", "20Q>20R")
    muts = sorted([m1, m2], key=lambda m: m.sort_key())
    assert ins_mod.from_mutation(m2, muts).is_phi()


def test_validate_s_state_allows_plain_missense_before():
    m1 = mk("missense", "10Q>10R")
    m2 = mk("*missense", "20Q>20R")
    muts = sorted([m1, m2], key=lambda m: m.sort_key())
    assert ins_mod.from_mutation(m2, muts).code == "N"
