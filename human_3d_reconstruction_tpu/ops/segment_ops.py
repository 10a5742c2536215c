"""Sort-based segment reduction and a gather with a scatter-free VJP.

TPU scatters are slow: the r3 soft-raster attribution (BASELINE.md,
`benchmarks/probe_soft_raster.py`) measured the gather-VJP scatter-add at
~4.6 of the 8 ms soft-silhouette gradient, with the actual pixel-lattice
compute at ~0.5 ms. This module replaces that scatter with the repo's
standard TPU recipe (cf. the r3 sort-binning and rotation-aug lessons):
sort the contributions by destination row, reduce each contiguous
segment with a log-depth shifted-add scan, and pick each segment's total
with `searchsorted` — sorts, shifts, and vectorized compares, no
scatter, no data-dependent shapes.

`gather_rows` is the user-facing piece: identical forward to `table[idx]`
(it IS `table[idx]`), custom VJP through `sorted_segment_sum`. Gradients
differ from the scatter path only by summation order (a log-depth tree
vs. XLA's scatter order) — equality is pinned to fp tolerance in
tests/test_segment_ops.py, values are bit-identical by construction.

MEASURED OUTCOME (BASELINE.md r3): on the soft-raster gradient this is a
NEGATIVE result — 8.6 ms vs the scatter path's 8.0 — because the
backward's extra sort costs more than the *fused* scatter it replaces
(the isolated-scatter probe overstated the scatter's in-graph cost).
Kept as a tested opt-in for workloads where the destination table is
small or the cotangent is materialized anyway; measure before adopting.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def sorted_segment_sum(
    data: jax.Array, segment_ids: jax.Array, num_segments: int,
    max_segment: int = 0,
) -> jax.Array:
    """Sum `data` rows into `num_segments` buckets without a scatter.

    Args:
        data: (N, D) rows to reduce.
        segment_ids: (N,) int32 destination row per entry, in
            [0, num_segments); entries may repeat and appear in any order.
        num_segments: static S.
        max_segment: static upper bound on any segment's entry count, when
            the caller knows one BY CONSTRUCTION (e.g. the tiled raster's
            bin gather repeats each face at most span^2 times). Cuts the
            scan from log2(N) to log2(max_segment) rounds. 0 = unknown
            (safe default). An UNDERSTATED bound silently drops
            contributions — only pass structural guarantees.

    Returns:
        (S, D) sums; empty segments are exact zeros.

    Mechanics: sort ids (carrying a permutation), reorder rows with ONE
    gather, run a segmented inclusive scan (log-depth rounds of shifted
    masked adds — each round only adds rows that belong to the same
    segment), and read each segment's last (= total) row via
    `searchsorted` bounds.
    """
    N = data.shape[0]
    ids = segment_ids.astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).reshape(-1)
    sk, order = jax.lax.sort_key_val(ids, iota)
    ds = data[order]

    bound = min(N, max_segment) if max_segment > 0 else N
    shift = 1
    while shift < bound:
        same = (sk[shift:] == sk[:-shift])[:, None]
        ds = ds.at[shift:].set(  # static slice update, not a scatter
            ds[shift:] + jnp.where(same, ds[:-shift], 0.0)
        )
        shift *= 2

    bounds = jnp.searchsorted(sk, jnp.arange(num_segments + 1, dtype=jnp.int32))
    ends, counts = bounds[1:] - 1, bounds[1:] - bounds[:-1]
    out = ds[jnp.clip(ends, 0, N - 1)]
    return jnp.where((counts > 0)[:, None], out, 0.0)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows(
    table: jax.Array, idx: jax.Array, max_repeats: int = 0
) -> jax.Array:
    """`table[idx]` with a sort-based (scatter-free) backward.

    table: (M, ...) — gradients flow to it. idx: any int shape — treated
    as constant (zero tangent), matching `table[idx]`'s semantics.
    max_repeats: static bound on how many times any single row index can
    appear in `idx`, when structurally guaranteed (0 = unknown);
    forwarded to `sorted_segment_sum(max_segment=...)`.
    """
    return table[idx]


def _gather_rows_fwd(table, idx, max_repeats):
    return table[idx], (idx, table.shape)


def _gather_rows_bwd(max_repeats, res, g):
    import math

    idx, tshape = res
    M = tshape[0]
    row = math.prod(tshape[1:]) if len(tshape) > 1 else 1
    # Match the forward gather's index semantics so gradients land on the
    # rows the forward actually read: negatives wrap once (numpy-style),
    # then out-of-range clamps (XLA's jitted-gather behavior). Without
    # this, sorted_segment_sum would silently DROP ids outside [0, M).
    ids = idx.reshape(-1).astype(jnp.int32)
    ids = jnp.clip(jnp.where(ids < 0, ids + M, ids), 0, M - 1)
    dtab = sorted_segment_sum(
        g.reshape(-1, row), ids, M, max_segment=max_repeats
    ).reshape(tshape)
    return dtab, None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)
