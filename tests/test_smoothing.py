"""One-Euro temporal smoothing tests."""

import numpy as np

from human_3d_reconstruction_tpu.utils.smoothing import OneEuroFilter, ParamSmoother


class TestOneEuro:
    def test_first_sample_passthrough(self):
        f = OneEuroFilter()
        x = np.asarray([1.0, -2.0], np.float32)
        np.testing.assert_array_equal(f(x), x)

    def test_reduces_jitter_variance(self, rng):
        """Noisy constant signal: filtered variance << raw variance."""
        f = OneEuroFilter(min_cutoff=0.5, beta=0.0)
        raw = 1.0 + rng.normal(scale=0.1, size=(200, 4)).astype(np.float32)
        out = np.stack([f(x) for x in raw])
        assert out[50:].std() < raw[50:].std() * 0.5

    def test_tracks_fast_motion(self):
        """Speed-adaptive cutoff: a ramp is followed with small lag."""
        f = OneEuroFilter(min_cutoff=1.0, beta=1.0)
        xs = np.linspace(0, 10, 100, dtype=np.float32)[:, None]
        out = np.stack([f(x) for x in xs])
        assert abs(float(out[-1] - xs[-1])) < 0.5

    def test_reset(self):
        f = OneEuroFilter()
        f(np.ones(3))
        f.reset()
        np.testing.assert_array_equal(f(np.full(3, 5.0)), 5.0)


class TestParamSmoother:
    def test_per_track_isolation(self, rng):
        s = ParamSmoother()
        t1 = rng.normal(size=72).astype(np.float32)
        b1 = rng.normal(size=10).astype(np.float32)
        c1 = rng.normal(size=3).astype(np.float32)
        # first call passes through per track
        out1 = s.smooth(1, t1, b1, c1)
        out2 = s.smooth(2, t1 * 2, b1, c1)
        np.testing.assert_allclose(out1[0], t1)
        np.testing.assert_allclose(out2[0], t1 * 2)

    def test_shapes(self, rng):
        s = ParamSmoother()
        theta, beta, cam = s.smooth(
            0,
            rng.normal(size=72).astype(np.float32),
            rng.normal(size=10).astype(np.float32),
            rng.normal(size=3).astype(np.float32),
        )
        assert theta.shape == (72,) and beta.shape == (10,) and cam.shape == (3,)

    def test_forget(self, rng):
        s = ParamSmoother()
        s.smooth(7, np.zeros(72), np.zeros(10), np.zeros(3))
        s.forget(7)
        out = s.smooth(7, np.ones(72), np.ones(10), np.ones(3))
        np.testing.assert_allclose(out[0], 1.0)  # fresh filter passthrough
