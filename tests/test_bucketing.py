"""Variable-N bucketing tests."""

import numpy as np
import pytest

from human_3d_reconstruction_tpu.utils.bucketing import (
    DEFAULT_BUCKETS,
    bucket_size,
    pad_people,
)

pytestmark = pytest.mark.fast  # pre-commit lane: `pytest -m fast` (<5 min warm)


class TestBucketing:
    def test_bucket_boundaries(self):
        assert bucket_size(1) == 1
        assert bucket_size(3) == 4
        assert bucket_size(4) == 4
        assert bucket_size(5) == 8
        assert bucket_size(DEFAULT_BUCKETS[-1]) == DEFAULT_BUCKETS[-1]

    def test_zero_rejected(self):
        with pytest.raises(ValueError):
            bucket_size(0)

    def test_beyond_largest_bucket_rejected(self):
        """Silently capping would return a mask shorter than the arrays."""
        with pytest.raises(ValueError):
            bucket_size(DEFAULT_BUCKETS[-1] + 1)

    def test_pad_replicates_and_masks(self, rng):
        arrays = {
            "centers": rng.normal(size=(3, 2)).astype(np.float32),
            "scales": rng.uniform(50, 100, (3,)).astype(np.float32),
        }
        padded, mask = pad_people(arrays, n_valid=3)
        assert padded["centers"].shape == (4, 2)
        np.testing.assert_array_equal(padded["centers"][3], arrays["centers"][0])
        np.testing.assert_array_equal(mask, [1, 1, 1, 0])

    def test_exact_bucket_no_padding(self, rng):
        arrays = {"x": rng.normal(size=(8, 5)).astype(np.float32)}
        padded, mask = pad_people(arrays, n_valid=8)
        assert padded["x"].shape == (8, 5)
        assert mask.sum() == 8

    def test_mismatched_leading_dim_raises(self, rng):
        with pytest.raises(ValueError):
            pad_people({"x": np.zeros((2, 3)), "y": np.zeros((5,))}, n_valid=2)

    def test_bucket_count_is_bounded(self):
        """A whole video of varying N compiles at most len(buckets) programs."""
        sizes = {bucket_size(n) for n in range(1, DEFAULT_BUCKETS[-1] + 1)}
        assert len(sizes) <= len(DEFAULT_BUCKETS)
