"""Independent torch-CPU SMPL oracle for golden-value tests.

This mirrors what the reference (a PyTorch HMR codebase) computes, written
directly from the SMPL equations (Loper et al. 2015) with torch ops — NOT a
copy of the JAX implementation's structure — so agreement between the two is
meaningful evidence of correctness. Used only inside tests and by bench.py
to measure the reference-CPU baseline (BASELINE.md TODO row).
"""

from __future__ import annotations

import numpy as np
import torch


def rodrigues_torch(aa: torch.Tensor) -> torch.Tensor:
    """(N, 3) axis-angle -> (N, 3, 3), classic normalized-quaternion route.

    Deliberately a *different algorithm* than the JAX path (quaternion
    composition vs. Rodrigues series) so the two implementations only agree
    if both are right.
    """
    angle = torch.norm(aa + 1e-12, dim=1, keepdim=True)
    axis = aa / angle
    half = angle * 0.5
    w = torch.cos(half)
    xyz = axis * torch.sin(half)
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    w = w[:, 0]
    return torch.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        dim=1,
    ).reshape(-1, 3, 3)


class SMPLOracle(torch.nn.Module):
    """Reference-style torch SMPL (double precision available via .double())."""

    def __init__(self, model):
        super().__init__()
        as_t = lambda a: torch.from_numpy(np.asarray(a, dtype=np.float32))
        self.register_buffer("v_template", as_t(model.v_template))
        self.register_buffer("shapedirs", as_t(model.shapedirs))
        self.register_buffer("posedirs", as_t(model.posedirs))
        self.register_buffer("J_regressor", as_t(model.J_regressor))
        self.register_buffer("weights", as_t(model.weights))
        if model.joint_regressor is not None:
            self.register_buffer("joint_regressor", as_t(model.joint_regressor))
        else:
            self.joint_regressor = None
        self.parents = [int(p) for p in model.kintree_parents]

    def forward(self, pose: torch.Tensor, betas: torch.Tensor):
        """pose (B, 72), betas (B, nb) -> dict of posed quantities."""
        B = pose.shape[0]
        dtype = self.v_template.dtype
        pose = pose.to(dtype).reshape(B, 24, 3)
        betas = betas.to(dtype)

        v_shaped = self.v_template[None] + torch.einsum(
            "bl,vcl->bvc", betas, self.shapedirs
        )
        J = torch.einsum("jv,bvc->bjc", self.J_regressor, v_shaped)

        R = rodrigues_torch(pose.reshape(-1, 3)).reshape(B, 24, 3, 3).to(dtype)
        eye = torch.eye(3, dtype=dtype)
        pose_feat = (R[:, 1:] - eye).reshape(B, -1)
        v_posed = v_shaped + torch.einsum("bp,vcp->bvc", pose_feat, self.posedirs)

        # Kinematic chain with homogeneous transforms.
        def make_tf(Rk, tk):
            tf = torch.zeros(B, 4, 4, dtype=dtype)
            tf[:, :3, :3] = Rk
            tf[:, :3, 3] = tk
            tf[:, 3, 3] = 1.0
            return tf

        G = [make_tf(R[:, 0], J[:, 0])]
        for k in range(1, 24):
            p = self.parents[k]
            G.append(G[p] @ make_tf(R[:, k], J[:, k] - J[:, p]))
        G = torch.stack(G, dim=1)  # (B, 24, 4, 4)

        # Remove rest-pose offset via explicit homogeneous subtraction.
        J_homo = torch.cat([J, torch.zeros(B, 24, 1, dtype=dtype)], dim=2)
        offset = torch.einsum("bjpq,bjq->bjp", G, J_homo)  # (B, 24, 4)
        A = G.clone()
        A[:, :, :, 3] = A[:, :, :, 3] - offset

        T = torch.einsum("vj,bjpq->bvpq", self.weights, A)
        v_homo = torch.cat(
            [v_posed, torch.ones(B, v_posed.shape[1], 1, dtype=dtype)], dim=2
        )
        verts = torch.einsum("bvpq,bvq->bvp", T, v_homo)[:, :, :3]

        joints = G[:, :, :3, 3]
        out = {"verts": verts, "joints": joints, "rest_joints": J, "rotations": R}
        if self.joint_regressor is not None:
            out["eval_joints"] = torch.einsum(
                "kv,bvc->bkc", self.joint_regressor.to(dtype), verts
            )
        return out
