"""Adversarial prior: discriminators over SMPL pose/shape.

Reference parity (SURVEY.md section 2 "Discriminator", HMR paper section
3.2): K=23 per-joint discriminators on rotation matrices, one shape
discriminator on beta, one full-pose discriminator on the shared joint
embedding — K+2 = 25 outputs in [real-vs-regressed] least-squares GAN form.

TPU-first shaping: all 23 per-joint discriminators are evaluated as ONE
batched einsum over a stacked weight tensor (the reference loops a conv
over joints — here the joint axis is just another contraction axis, so the
whole prior is two matmuls + two MLPs in a single fused program).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.utils.geometry import rodrigues

NUM_DISC_JOINTS = 23  # non-root joints


class SMPLDiscriminator(nn.Module):
    """(theta, beta) -> (B, 25) real/fake scores (LSGAN convention)."""

    joint_embed_dim: int = 32
    pose_hidden: int = 1024
    shape_hidden: int = 10

    @nn.compact
    def __call__(self, theta: jax.Array, beta: jax.Array) -> jax.Array:
        B = theta.shape[0]
        # Rotation matrices for the 23 non-root joints, flattened to 9-d.
        rots = rodrigues(theta.reshape(B, 24, 3)[:, 1:])  # (B, 23, 3, 3)
        rots = rots.reshape(B, NUM_DISC_JOINTS, 9)

        # Shared per-joint embedding: one (23, 9, D) weight tensor applied
        # jointly — equivalent to 23 independent linear layers.
        w1 = self.param(
            "joint_embed_w1",
            nn.initializers.lecun_normal(),
            (NUM_DISC_JOINTS, 9, self.joint_embed_dim),
        )
        b1 = self.param(
            "joint_embed_b1", nn.initializers.zeros, (NUM_DISC_JOINTS, self.joint_embed_dim)
        )
        e = jnp.einsum("bjk,jkd->bjd", rots, w1) + b1
        e = nn.relu(e)
        w2 = self.param(
            "joint_embed_w2",
            nn.initializers.lecun_normal(),
            (NUM_DISC_JOINTS, self.joint_embed_dim, self.joint_embed_dim),
        )
        b2 = self.param(
            "joint_embed_b2", nn.initializers.zeros, (NUM_DISC_JOINTS, self.joint_embed_dim)
        )
        e = jnp.einsum("bjd,jde->bje", e, w2) + b2
        e = nn.relu(e)  # (B, 23, 32) shared embedding

        # K per-joint scores: one (23, 32) weight, contracted per joint.
        wk = self.param(
            "per_joint_score_w", nn.initializers.lecun_normal(), (NUM_DISC_JOINTS, self.joint_embed_dim)
        )
        bk = self.param("per_joint_score_b", nn.initializers.zeros, (NUM_DISC_JOINTS,))
        per_joint = jnp.einsum("bjd,jd->bj", e, wk) + bk  # (B, 23)

        # Full-pose discriminator over the concatenated embedding.
        flat = e.reshape(B, -1)
        h = nn.relu(nn.Dense(self.pose_hidden, name="pose_fc1")(flat))
        h = nn.relu(nn.Dense(self.pose_hidden, name="pose_fc2")(h))
        full_pose = nn.Dense(1, name="pose_out")(h)  # (B, 1)

        # Shape discriminator on beta.
        s = nn.relu(nn.Dense(self.shape_hidden, name="shape_fc1")(beta))
        s = nn.relu(nn.Dense(5, name="shape_fc2")(s))
        shape_score = nn.Dense(1, name="shape_out")(s)  # (B, 1)

        return jnp.concatenate([per_joint, full_pose, shape_score], axis=1)  # (B, 25)
