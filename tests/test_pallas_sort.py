"""Property tests for the Pallas VMEM bitonic row sort (interpret mode
on the CPU test backend): bit-identical to np.sort on random i32 rows,
including sentinel padding, non-pow2 widths, and ragged batch sizes."""

import numpy as np
import pytest

from sage_tpu.ops.pallas_sort import bitonic_sort_rows


@pytest.mark.parametrize(
    "B,F", [(8, 128), (3, 128), (16, 512), (9, 300)]
)
def test_bitonic_matches_npsort(B, F):
    rng = np.random.default_rng(B * 1000 + F)
    x = rng.integers(-(2**26), 2**26, size=(B, F), dtype=np.int32)
    out = np.asarray(bitonic_sort_rows(x, interpret=True))
    np.testing.assert_array_equal(out, np.sort(x, axis=1))


def test_bitonic_sentinel_tail():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1000, size=(8, 200), dtype=np.int32)
    x[:, 150:] = 2**31 - 1  # sentinel-padded tail must stay at the tail
    out = np.asarray(bitonic_sort_rows(x, interpret=True))
    np.testing.assert_array_equal(out, np.sort(x, axis=1))


def test_bitonic_duplicates_and_negatives():
    rng = np.random.default_rng(1)
    x = rng.integers(-5, 5, size=(8, 256), dtype=np.int32)
    out = np.asarray(bitonic_sort_rows(x, interpret=True))
    np.testing.assert_array_equal(out, np.sort(x, axis=1))


@pytest.mark.parametrize(
    "B,F,block",
    [(8, 512, 128), (8, 1024, 128), (3, 700, 128), (8, 2048, 256),
     (9, 511, 64)],
)
def test_hierarchical_matches_npsort(B, F, block):
    """The block-merge path (rows wider than one VMEM block): block
    sorts + flip/cross passes + finish kernels, vs np.sort."""
    rng = np.random.default_rng(B * 7919 + F)
    x = rng.integers(-(2**26), 2**26, size=(B, F), dtype=np.int32)
    out = np.asarray(bitonic_sort_rows(x, interpret=True, block=block))
    np.testing.assert_array_equal(out, np.sort(x, axis=1))


def test_hierarchical_duplicates_sentinel():
    rng = np.random.default_rng(3)
    x = rng.integers(-3, 3, size=(8, 900), dtype=np.int32)
    x[:, 800:] = 2**31 - 1
    out = np.asarray(bitonic_sort_rows(x, interpret=True, block=128))
    np.testing.assert_array_equal(out, np.sort(x, axis=1))
