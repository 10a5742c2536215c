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


class IEFRegressor(nn.Module):
    """3-iteration residual refinement over the 85-d SMPL parameter stream."""

    num_iterations: int = 3
    hidden_size: int = 1024
    dropout_rate: float = 0.0  # reference uses dropout 0.5 in some variants
    mean_params: Optional[jnp.ndarray] = None

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
        (theta, beta, cam) per iteration").
        """
        B = features.shape[0]
        features = features.astype(jnp.float32)

        mean = self.mean_params if self.mean_params is not None else default_mean_params()
        params = jnp.broadcast_to(mean, (B, NUM_SMPL_PARAMS)) if initial_params is None else initial_params

        fc1 = nn.Dense(self.hidden_size, name="fc1", param_dtype=jnp.float32)
        fc2 = nn.Dense(self.hidden_size, name="fc2", param_dtype=jnp.float32)
        # Small-init output layer: early iterations stay near the mean pose.
        out = nn.Dense(
            NUM_SMPL_PARAMS,
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
            estimates.append(params)

        return jnp.stack(estimates, axis=0)  # (T, B, 85)


def split_params(params: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(..., 85) -> theta (..., 72), beta (..., 10), cam (..., 3)."""
    theta = params[..., :NUM_POSE_PARAMS]
    beta = params[..., NUM_POSE_PARAMS : NUM_POSE_PARAMS + NUM_SHAPE_PARAMS]
    cam = params[..., NUM_POSE_PARAMS + NUM_SHAPE_PARAMS :]
    return theta, beta, cam
