"""Iterative error-feedback (IEF) SMPL parameter regressor.

Reference parity: concat(feature 2048, current params 85) -> FC(1024) ->
FC(1024) -> FC(85) residual, initialized from the mean parameter vector,
unrolled for 3 iterations (SURVEY.md section 2 "IEF regressor"; BASELINE
"3-iteration SMPL regressor"). The 85 params are theta[72] + beta[10] +
weak-perspective cam[3] = [s, tx, ty].

TPU notes: the loop is statically unrolled (3 tiny FC stacks fuse into the
encoder program); all math f32 — parameter-space precision feeds directly
into mm-scale joint outputs.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

NUM_POSE_PARAMS = 72
NUM_SHAPE_PARAMS = 10
NUM_CAM_PARAMS = 3
NUM_SMPL_PARAMS = NUM_POSE_PARAMS + NUM_SHAPE_PARAMS + NUM_CAM_PARAMS  # 85


def default_mean_params() -> jnp.ndarray:
    """Mean parameter vector used to seed the IEF loop.

    The reference loads a dataset-derived `mean_theta` file; without one we
    seed with the neutral pose/shape and a centered scale-0.9 camera (the
    conventional HMR initialization when the mosh mean is unavailable). A
    real mean file can be passed to `IEFRegressor(mean_params=...)`.
    """
    mean = jnp.zeros((NUM_SMPL_PARAMS,), dtype=jnp.float32)
    return mean.at[NUM_POSE_PARAMS + NUM_SHAPE_PARAMS].set(0.9)  # cam scale


NUM_ROT6D_POSE_PARAMS = 24 * 6  # continuous 6D per joint (Zhou et al. 2019)


class IEFRegressor(nn.Module):
    """3-iteration residual refinement over the SMPL parameter stream.

    `rot_rep` selects the pose parameterization the RESIDUAL STREAM lives
    in — the output contract is unchanged either way ((T, B, 85) with
    axis-angle theta), so every downstream consumer (losses, SMPL decode,
    serving, augmentation) is representation-agnostic:

    - 'aa' (default, reference parity): 85-d stream, additive axis-angle
      residuals (the torch line's exact formulation).
    - 'rot6d': 157-d stream (24x6 pose + 10 beta + 3 cam) — the successor
      line's (HMR-2.0-style) parameterization. Axis-angle is discontinuous
      at angle pi and its additive residuals leave the manifold of small
      corrections; the 6D representation is continuous everywhere (Zhou et
      al. 2019), so gradient steps in stream space map smoothly to
      rotations. Each iteration's 6D pose converts to axis-angle at the
      output boundary (utils/geometry.py rot6d_to_matrix ->
      rotation_matrix_to_axis_angle, both round-trip tested).
    """

    num_iterations: int = 3
    hidden_size: int = 1024
    dropout_rate: float = 0.0  # reference uses dropout 0.5 in some variants
    mean_params: Optional[jnp.ndarray] = None
    rot_rep: str = "aa"  # 'aa' | 'rot6d'

    def _stream_dim(self) -> int:
        if self.rot_rep == "rot6d":
            return NUM_ROT6D_POSE_PARAMS + NUM_SHAPE_PARAMS + NUM_CAM_PARAMS
        if self.rot_rep != "aa":
            raise ValueError(f"unknown rot_rep {self.rot_rep!r}; 'aa' | 'rot6d'")
        return NUM_SMPL_PARAMS

    def _mean_stream(self) -> jnp.ndarray:
        """Mean 85-d params -> mean stream vector (converted for rot6d)."""
        mean = (
            self.mean_params
            if self.mean_params is not None
            else default_mean_params()
        )
        if self.rot_rep == "aa":
            return mean
        from human_3d_reconstruction_tpu.utils.geometry import (
            matrix_to_rot6d,
            rodrigues,
        )

        theta, rest = mean[:NUM_POSE_PARAMS], mean[NUM_POSE_PARAMS:]
        pose6d = matrix_to_rot6d(rodrigues(theta.reshape(24, 3))).reshape(-1)
        return jnp.concatenate([pose6d, rest])

    def _to_smpl_params(self, stream: jnp.ndarray) -> jnp.ndarray:
        """Stream (B, D) -> canonical (B, 85) axis-angle params."""
        if self.rot_rep == "aa":
            return stream
        from human_3d_reconstruction_tpu.utils.geometry import (
            rot6d_to_matrix,
            rotation_matrix_to_axis_angle,
        )

        B = stream.shape[0]
        pose6d = stream[:, :NUM_ROT6D_POSE_PARAMS].reshape(B, 24, 6)
        theta = rotation_matrix_to_axis_angle(rot6d_to_matrix(pose6d))
        return jnp.concatenate(
            [theta.reshape(B, NUM_POSE_PARAMS), stream[:, NUM_ROT6D_POSE_PARAMS:]],
            axis=-1,
        )

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        train: bool = False,
        initial_params: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """features (B, F) -> (num_iterations, B, 85) parameter estimates.

        Returning every iteration matches the reference's forward, whose
        loss supervises all iterations (SURVEY.md section 2: "list of
        (theta, beta, cam) per iteration"). `initial_params`, when given,
        is in STREAM representation (85-d for 'aa', 157-d for 'rot6d').
        """
        B = features.shape[0]
        features = features.astype(jnp.float32)

        dim = self._stream_dim()
        params = (
            jnp.broadcast_to(self._mean_stream(), (B, dim))
            if initial_params is None
            else initial_params
        )

        fc1 = nn.Dense(self.hidden_size, name="fc1", param_dtype=jnp.float32)
        fc2 = nn.Dense(self.hidden_size, name="fc2", param_dtype=jnp.float32)
        # Small-init output layer: early iterations stay near the mean pose.
        out = nn.Dense(
            dim,
            name="fc_out",
            kernel_init=nn.initializers.normal(stddev=1e-2),
            param_dtype=jnp.float32,
        )

        estimates = []
        for _ in range(self.num_iterations):  # static unroll
            x = jnp.concatenate([features, params], axis=-1)
            x = nn.relu(fc1(x))
            if self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            x = nn.relu(fc2(x))
            if self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            params = params + out(x)
            estimates.append(self._to_smpl_params(params))

        return jnp.stack(estimates, axis=0)  # (T, B, 85) — always axis-angle


def split_params(params: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(..., 85) -> theta (..., 72), beta (..., 10), cam (..., 3)."""
    theta = params[..., :NUM_POSE_PARAMS]
    beta = params[..., NUM_POSE_PARAMS : NUM_POSE_PARAMS + NUM_SHAPE_PARAMS]
    cam = params[..., NUM_POSE_PARAMS + NUM_SHAPE_PARAMS :]
    return theta, beta, cam
