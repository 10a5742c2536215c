"""Prefetch pipeline tests."""

import time

import numpy as np
import pytest

import jax.numpy as jnp

from human_3d_reconstruction_tpu.data.prefetch import device_prefetch


class TestPrefetch:
    def test_order_and_completeness(self):
        batches = [{"x": np.full((2,), i, np.float32)} for i in range(10)]
        out = list(device_prefetch(iter(batches)))
        assert len(out) == 10
        for i, b in enumerate(out):
            assert float(b["x"][0]) == i

    def test_producer_exception_propagates(self):
        def bad_iter():
            yield {"x": np.zeros(2)}
            raise RuntimeError("decode failed")

        it = device_prefetch(bad_iter())
        next(it)
        with pytest.raises(RuntimeError, match="decode failed"):
            list(it)

    def test_overlaps_slow_producer(self):
        """Consumer that takes as long as the producer finishes in ~max(T)
        rather than sum(T) when depth>=2."""

        def slow_iter():
            for i in range(6):
                time.sleep(0.05)
                yield {"x": np.full((2,), i, np.float32)}

        t0 = time.perf_counter()
        for b in device_prefetch(slow_iter(), depth=3):
            time.sleep(0.05)  # simulated device step
        elapsed = time.perf_counter() - t0
        # serial would be ~0.6s; overlapped ~0.35s. Generous bound: the
        # suite may run under heavy parallel load (TPU benches on the same
        # host), so only catch a fully-serial regression.
        assert elapsed < 0.58, elapsed

    def test_custom_place_fn(self):
        seen = []

        def place(b):
            seen.append(True)
            return jnp.asarray(b["x"]) * 2

        out = list(device_prefetch(iter([{"x": np.ones(3)}]), place=place))
        assert len(seen) == 1
        np.testing.assert_allclose(np.asarray(out[0]), 2.0)


class TestEchoBatches:
    def test_factor_and_order(self):
        from human_3d_reconstruction_tpu.data.prefetch import echo_batches

        batches = [{"x": np.full((2,), i, np.float32)} for i in range(3)]
        out = list(echo_batches(iter(batches), 3))
        assert [float(b["x"][0]) for b in out] == [0, 0, 0, 1, 1, 1, 2, 2, 2]
        # echoes are the SAME object: no copies, no extra H2D when composed
        # after device_prefetch
        assert out[0] is out[1] is out[2]

    def test_factor_one_passthrough(self):
        from human_3d_reconstruction_tpu.data.prefetch import echo_batches

        batches = [{"x": np.zeros(1)} for _ in range(4)]
        assert len(list(echo_batches(iter(batches), 1))) == 4

    def test_invalid_factor(self):
        from human_3d_reconstruction_tpu.data.prefetch import echo_batches

        with pytest.raises(ValueError, match="echo factor"):
            next(echo_batches(iter([]), 0))
