"""GMM pose prior (SMPLify-style), fit and evaluated on device.

Reference parity: the SMPLify stage of the HMR family regularizes body
pose with a K=8 full-covariance Gaussian mixture fit to mocap poses
(Bogo et al. 2016, section 4.2 — SURVEY.md lists the fitting stage under
L5). The torch line ships pickled sklearn GMMs; here the prior is

- **fit in JAX**: batched EM where the E-step is one (N, K) Mahalanobis
  via triangular solves and the M-step is two einsums — no per-component
  Python loops, so the same code fits 8 components over a 100k-pose mosh
  pool on the chip, and
- **evaluated inside jit**: K quadratics through a precomputed precision
  Cholesky (one (B, K, D) x (K, D, D) contraction — MXU-shaped) plus a
  logsumexp, fully differentiable, so `fitting.refine_params` can take it
  as an objective term.

The prior covers the 69-d body pose `theta[3:72]`; the global rotation is
camera-relative, not anthropometric, and is excluded (as in SMPLify).
Two evaluation modes: `logsumexp` (the exact mixture NLL) and `min`
(SMPLify's min-of-quadratics upper bound — it optimizes the single best
mode and avoids averaging over distant components).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

BODY_DIM = 69  # theta[3:72]


class PosePrior(NamedTuple):
    """Pytree of the fitted mixture, parameterized for fast evaluation.

    `prec_chol[k]` is W_k with Sigma_k^{-1} = W_k^T W_k (the inverse of the
    covariance's lower Cholesky), so the Mahalanobis term is ||W_k d||^2.
    `log_norm[k]` folds the weight, the determinant, and the 2*pi constant:
    log p(x) = logsumexp_k(log_norm_k - 0.5 ||W_k (x - mu_k)||^2).
    """

    means: jax.Array      # (K, D)
    prec_chol: jax.Array  # (K, D, D)
    log_norm: jax.Array   # (K,)


def _split_body(theta: jax.Array) -> jax.Array:
    if theta.shape[-1] == BODY_DIM + 3:
        return theta[..., 3:]
    if theta.shape[-1] == BODY_DIM:
        return theta
    raise ValueError(f"expected trailing dim 69 or 72, got {theta.shape}")


def pose_nll(prior: PosePrior, theta: jax.Array, mode: str = "logsumexp") -> jax.Array:
    """Negative log-likelihood of body poses under the prior.

    theta: (..., 72) full pose (global rotation ignored) or (..., 69) body.
    Returns (...,) NLL. Differentiable; jit/vmap/scan-safe.
    """
    body = _split_body(jnp.asarray(theta, jnp.float32))
    diff = body[..., None, :] - prior.means                    # (..., K, D)
    y = jnp.einsum("...kd,ked->...ke", diff, prior.prec_chol)  # W_k d
    log_prob = prior.log_norm - 0.5 * jnp.sum(y * y, axis=-1)  # (..., K)
    if mode == "logsumexp":
        return -jax.nn.logsumexp(log_prob, axis=-1)
    if mode == "min":
        return jnp.min(-log_prob, axis=-1)
    raise ValueError(f"unknown mode {mode!r}; use 'logsumexp' or 'min'")


def _em_step(poses, means, covs, log_w, reg):
    """One EM iteration. poses (N, D); means (K, D); covs (K, D, D)."""
    N, D = poses.shape
    chol = jnp.linalg.cholesky(covs)                            # (K, D, D) lower
    diff = poses[:, None, :] - means                            # (N, K, D)
    # Solve L_k Y_k = D_k with one batched triangular solve (component-major:
    # solve_triangular batches over exactly-matching leading dims).
    y = jax.scipy.linalg.solve_triangular(
        chol, diff.transpose(1, 2, 0), lower=True
    )                                                            # (K, D, N)
    maha = jnp.sum(y * y, axis=1).T                              # (N, K)
    log_det = jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1
    )                                                            # (K,)
    log_prob = log_w - log_det - 0.5 * (maha + D * math.log(2 * math.pi))
    log_z = jax.nn.logsumexp(log_prob, axis=1, keepdims=True)    # (N, 1)
    resp = jnp.exp(log_prob - log_z)                             # (N, K)

    nk = jnp.sum(resp, axis=0) + 1e-8                            # (K,)
    new_means = (resp.T @ poses) / nk[:, None]
    d2 = poses[:, None, :] - new_means                           # (N, K, D)
    new_covs = (
        jnp.einsum("nk,nkd,nke->kde", resp, d2, d2) / nk[:, None, None]
        + reg * jnp.eye(D)
    )
    new_log_w = jnp.log(nk / N)
    return new_means, new_covs, new_log_w, jnp.mean(log_z)


def fit_pose_prior(
    poses,
    num_components: int = 8,
    num_iters: int = 60,
    reg: float = 1e-4,
    seed: int = 0,
    max_pool: int = 100_000,
) -> PosePrior:
    """Fit a full-covariance GMM to a pose pool by EM.

    poses: (N, 72) full thetas (body part sliced out) or (N, 69).
    reg: ridge added to every covariance each M-step — with D=69 and
        K=8 a pool needs N >> K*D samples for unregularized covariances;
        1e-4 rad^2 (~0.6 deg std) is far below real pose variance.
    max_pool: pools larger than this are deterministically subsampled —
        the E-step's (N, K, D) responsibility buffer is the memory ceiling
        (a raw CMU mosh dump is millions of frames; 100k poses already
        estimate 8 x (69 + 69^2/2) parameters with >25x oversampling).

    Deterministic: init means are K distinct pool samples (seeded
    permutation), shared covariance = pool covariance + reg.
    """
    poses = np.asarray(poses, np.float32)
    body = poses[:, 3:] if poses.shape[1] == BODY_DIM + 3 else poses
    if body.shape[1] != BODY_DIM:
        raise ValueError(f"expected pose dim 69 or 72, got {poses.shape}")
    if len(body) > max_pool:
        keep = np.random.default_rng(seed).permutation(len(body))[:max_pool]
        body = body[np.sort(keep)]
    N, D = body.shape
    K = num_components
    if N < K:
        raise ValueError(f"need at least {K} poses, got {N}")

    # k-means warmup (hard assignments) — initializing soft EM with the
    # broad pool covariance makes every responsibility near-uniform and EM
    # sits at the symmetric fixed point (all means -> the global mean).
    perm = np.random.default_rng(seed).permutation(N)[:K]
    mu = body[perm].copy()
    for _ in range(10):
        d2 = ((body[:, None, :] - mu[None]) ** 2).sum(-1)  # (N, K)
        hard = np.eye(K, dtype=np.float32)[d2.argmin(1)]   # (N, K)
        nk = hard.sum(0)
        new = (hard.T @ body) / np.maximum(nk, 1.0)[:, None]
        mu = np.where(nk[:, None] > 0, new, mu)
    means = jnp.asarray(mu)
    d2 = ((body[:, None, :] - mu[None]) ** 2).sum(-1)
    hard = np.eye(K, dtype=np.float32)[d2.argmin(1)]
    nk = np.maximum(hard.sum(0), 1.0)
    centered = body[:, None, :] - mu[None]                 # (N, K, D)
    within = (
        np.einsum("nk,nkd,nke->kde", hard, centered, centered) / nk[:, None, None]
    ).astype(np.float32) + reg * np.eye(D, dtype=np.float32)
    covs = jnp.asarray(within)
    log_w = jnp.asarray(np.log(nk / nk.sum()).astype(np.float32))

    body_j = jnp.asarray(body)
    step = jax.jit(lambda m, c, w: _em_step(body_j, m, c, w, reg))
    for _ in range(num_iters):
        means, covs, log_w, _ = step(means, covs, log_w)

    # Freeze into the evaluation parameterization.
    chol = jnp.linalg.cholesky(covs)
    eye = jnp.broadcast_to(jnp.eye(D), (K, D, D))
    w = jax.scipy.linalg.solve_triangular(chol, eye, lower=True)  # L^{-1}
    log_det_prec_chol = jnp.sum(
        jnp.log(jnp.diagonal(w, axis1=-2, axis2=-1)), axis=-1
    )
    log_norm = log_w + log_det_prec_chol - 0.5 * D * math.log(2 * math.pi)
    return PosePrior(means=means, prec_chol=w, log_norm=log_norm)


# SMPLify's "unnatural bend" angle prior (Bogo et al. 2016, eq. 7):
# exp(sign * theta) per hinge joint, exploding smoothly as the joint bends
# past its natural stop. (full-pose joint index, axis-angle component, sign)
# per the SMPL rest-pose conventions: knees (4/5) flex about +x so
# hyperextension is -x; elbows (18/19) flex about -y (left) / +y (right).
# The table's mirror consistency is pinned structurally: flip_pose (L/R
# permutation + y/z negation) must leave the prior invariant — so the
# elbow signs are opposite and the knee signs equal (tests/test_pose_prior).
ANGLE_PRIOR_TERMS: tuple[tuple[int, int, float], ...] = (
    (4, 0, -1.0),   # left knee
    (5, 0, -1.0),   # right knee
    (18, 1, 1.0),   # left elbow
    (19, 1, -1.0),  # right elbow
)


def angle_prior(theta: jax.Array) -> jax.Array:
    """Hyperextension penalty: sum_j exp(sign_j * theta_j) over knees/elbows.

    theta: (..., 72) full pose or (..., 69) body pose. Returns (...,).
    Smooth and cheap (4 exp), so it rides inside any jitted objective.
    """
    t = jnp.asarray(theta, jnp.float32)
    off = 0 if t.shape[-1] == BODY_DIM + 3 else -3
    if t.shape[-1] not in (BODY_DIM, BODY_DIM + 3):
        raise ValueError(f"expected trailing dim 69 or 72, got {t.shape}")
    terms = [
        jnp.exp(sign * t[..., joint * 3 + axis + off])
        for joint, axis, sign in ANGLE_PRIOR_TERMS
    ]
    return sum(terms)


def resolve_pose_prior(
    spec: str, mosh=None, num_components: int = 8
) -> PosePrior | None:
    """Config-level resolution mirroring `mean_params.resolve_mean_params`.

    spec: '' -> None (prior off); 'mosh' -> fit from the given
    MoshParamSource pool; any other string -> load that npz.
    """
    if not spec:
        return None
    if spec == "mosh":
        if mosh is None:
            raise ValueError("fit_pose_prior='mosh' needs a mosh source")
        return fit_pose_prior(mosh.thetas, num_components=num_components)
    return load_pose_prior(spec)


def save_pose_prior(path: str, prior: PosePrior) -> None:
    np.savez(
        path,
        means=np.asarray(prior.means),
        prec_chol=np.asarray(prior.prec_chol),
        log_norm=np.asarray(prior.log_norm),
    )


def load_pose_prior(path: str) -> PosePrior:
    with np.load(path) as z:
        return PosePrior(
            means=jnp.asarray(z["means"]),
            prec_chol=jnp.asarray(z["prec_chol"]),
            log_norm=jnp.asarray(z["log_norm"]),
        )
