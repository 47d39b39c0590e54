"""Packing/bucketing/chunking helpers."""
import numpy as np

from vcf2prot_tpu.pipeline import _chunk_indices
from vcf2prot_tpu.runtime.pack import pad_to_bucket


class FakeProg:
    def __init__(self, n):
        self.res_len = n


def test_pad_to_bucket():
    assert pad_to_bucket(0) == 1
    assert pad_to_bucket(1) == 1
    assert pad_to_bucket(2) == 2
    assert pad_to_bucket(3) == 4
    assert pad_to_bucket(1024) == 1024
    assert pad_to_bucket(1025) == 2048


def test_chunk_indices_respects_budget():
    progs = [FakeProg(10), FakeProg(20), FakeProg(15), FakeProg(40), FakeProg(5)]
    chunks = _chunk_indices(progs, 30)
    assert [i for c in chunks for i in c] == list(range(5))
    for c in chunks[:-1]:
        pass  # chunks may exceed the budget only via a single large program
    assert chunks == [[0, 1], [2], [3], [4]]


def test_chunk_indices_single_large_program():
    progs = [FakeProg(100)]
    assert _chunk_indices(progs, 10) == [[0]]
