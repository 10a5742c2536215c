"""Sort-based segment sum / scatter-free gather VJP (ops/segment_ops.py)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.ops.segment_ops import (
    gather_rows,
    sorted_segment_sum,
)


class TestSortedSegmentSum:
    def test_matches_numpy_bincount(self, rng):
        N, D, S = 257, 5, 19  # deliberately non-power-of-2, non-aligned
        data = rng.normal(size=(N, D)).astype(np.float32)
        ids = rng.integers(0, S, N).astype(np.int32)
        got = np.asarray(sorted_segment_sum(jnp.asarray(data), jnp.asarray(ids), S))
        want = np.zeros((S, D), np.float32)
        np.add.at(want, ids, data)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_empty_segments_are_zero(self, rng):
        data = rng.normal(size=(8, 3)).astype(np.float32)
        ids = np.asarray([2, 2, 2, 5, 5, 7, 7, 7], np.int32)  # 0,1,3,4,6 empty
        got = np.asarray(sorted_segment_sum(jnp.asarray(data), jnp.asarray(ids), 9))
        for s in (0, 1, 3, 4, 6, 8):
            np.testing.assert_array_equal(got[s], 0.0)
        np.testing.assert_allclose(got[2], data[:3].sum(0), atol=1e-6)

    def test_single_segment_and_jit(self, rng):
        data = rng.normal(size=(64, 2)).astype(np.float32)
        ids = np.zeros((64,), np.int32)
        got = jax.jit(sorted_segment_sum, static_argnums=2)(
            jnp.asarray(data), jnp.asarray(ids), 1
        )
        np.testing.assert_allclose(np.asarray(got)[0], data.sum(0), atol=1e-4)


class TestGatherRows:
    def test_forward_identical(self, rng):
        table = rng.normal(size=(37, 3, 3)).astype(np.float32)
        idx = rng.integers(0, 37, (4, 11)).astype(np.int32)
        got = np.asarray(gather_rows(jnp.asarray(table), jnp.asarray(idx)))
        np.testing.assert_array_equal(got, table[idx])

    def test_gradient_matches_scatter_vjp(self, rng):
        """The whole point: same gradients as plain table[idx] (which XLA
        differentiates with a scatter-add), summation order aside."""
        table = rng.normal(size=(53, 9)).astype(np.float32)
        idx = rng.integers(0, 53, (240,)).astype(np.int32)  # heavy collisions
        cot = rng.normal(size=(240, 9)).astype(np.float32)

        def f_plain(t):
            return jnp.vdot(t[jnp.asarray(idx)], jnp.asarray(cot))

        def f_sorted(t):
            return jnp.vdot(
                gather_rows(t, jnp.asarray(idx)), jnp.asarray(cot)
            )

        g_plain = np.asarray(jax.grad(f_plain)(jnp.asarray(table)))
        g_sorted = np.asarray(jax.grad(f_sorted)(jnp.asarray(table)))
        np.testing.assert_allclose(g_sorted, g_plain, atol=2e-5)

    def test_gradient_with_negative_indices(self, rng):
        """table[idx] accepts negative indices (numpy wrap); the custom
        VJP must route their gradients to the wrapped rows instead of
        silently dropping them (failed pre-fix)."""
        table = rng.normal(size=(6, 2)).astype(np.float32)
        idx = np.asarray([-1, 2, -6, 5], np.int32)
        cot = rng.normal(size=(4, 2)).astype(np.float32)

        g_plain = np.asarray(jax.grad(
            lambda t: jnp.vdot(t[jnp.asarray(idx)], jnp.asarray(cot))
        )(jnp.asarray(table)))
        g_sorted = np.asarray(jax.grad(
            lambda t: jnp.vdot(gather_rows(t, jnp.asarray(idx)), jnp.asarray(cot))
        )(jnp.asarray(table)))
        np.testing.assert_allclose(g_sorted, g_plain, atol=1e-6)

    def test_grad_under_vmap(self, rng):
        """The fitting path vmaps the render over persons — the custom VJP
        must batch correctly."""
        B, M, N = 3, 21, 50
        table = rng.normal(size=(B, M, 4)).astype(np.float32)
        idx = rng.integers(0, M, (B, N)).astype(np.int32)
        cot = rng.normal(size=(B, N, 4)).astype(np.float32)

        def per(t, i, c):
            return jnp.vdot(gather_rows(t, i), c)

        def per_plain(t, i, c):
            return jnp.vdot(t[i], c)

        g = jax.grad(lambda t: jnp.sum(jax.vmap(per)(t, jnp.asarray(idx), jnp.asarray(cot))))(
            jnp.asarray(table)
        )
        gp = jax.grad(
            lambda t: jnp.sum(jax.vmap(per_plain)(t, jnp.asarray(idx), jnp.asarray(cot)))
        )(jnp.asarray(table))
        np.testing.assert_allclose(np.asarray(g), np.asarray(gp), atol=2e-5)
