"""Executor edge shapes: zero-length tasks, empty programs, single-byte
interleavings -- gather formulation vs serial oracle."""
import numpy as np

from vcf2prot_tpu.compiler.haplotype import HaplotypeProgram, RefBlob
from vcf2prot_tpu.runtime.cpu_engine import execute_gather, execute_tasks
from vcf2prot_tpu.runtime.tpu_engine import TpuEngine


def mk_prog(tasks, alt, res_len, ann=()):
    exe = np.array([t[0] for t in tasks], dtype=np.uint8)
    src = np.array([t[1] for t in tasks], dtype=np.int64)
    length = np.array([t[2] for t in tasks], dtype=np.int64)
    dst = np.array([t[3] for t in tasks], dtype=np.int64)
    return HaplotypeProgram(exe, src, length, dst, alt, res_len, list(ann))


BLOB = RefBlob.from_ref_seqs({"T": "ABCDEFGHIJKLMNOP"})


def assert_all_engines(prog, expected):
    serial = execute_tasks(prog, BLOB)
    assert serial.tobytes() == expected
    gather = execute_gather(prog, BLOB)
    np.testing.assert_array_equal(serial, gather)
    dev = TpuEngine(BLOB)
    outs = dev.execute([prog])
    np.testing.assert_array_equal(serial, outs[0])


def test_zero_length_leading_task():
    # base copy of length 0 followed by real tasks
    prog = mk_prog(
        [(0, 0, 0, 0), (1, 0, 2, 0), (0, 2, 3, 2)], b"xy", 5
    )
    assert_all_engines(prog, b"xyCDE")


def test_interleaved_single_bytes():
    tasks = []
    alt = b"zzzzzzzz"
    for i in range(8):
        tasks.append((i % 2, i, 1, i))
    prog = mk_prog(tasks, alt, 8)
    assert_all_engines(prog, b"AzCzEzGz")


def test_empty_program():
    prog = mk_prog([], b"", 0)
    assert_all_engines(prog, b"")


def test_zero_length_between_tasks():
    prog = mk_prog(
        [(0, 0, 2, 0), (1, 0, 0, 2), (0, 5, 2, 2)], b"q", 4
    )
    assert_all_engines(prog, b"ABFG")
