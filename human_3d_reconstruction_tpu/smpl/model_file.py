"""SMPL model-file schema, loading, and synthetic generation.

The SMPL model file (classically a chumpy-pickled ``.pkl``; we canonically
use ``.npz``) carries the learned body-model tensors:

=================  ==============  =====================================
field              shape           meaning
=================  ==============  =====================================
v_template         (6890, 3)       mean-shape rest vertices
shapedirs          (6890, 3, 10)   shape blendshape basis (PCA)
posedirs           (6890, 3, 207)  pose-corrective blendshape basis
J_regressor        (24, 6890)      rest-joint regressor (sparse rows)
weights            (6890, 24)      LBS skinning weights (rows sum to 1)
kintree_parents    (24,)           kinematic-tree parent indices, root=-1
faces              (13776, 3)      triangle indices
joint_regressor    (K, 6890)       optional eval regressor (cocoplus 19 /
                                   h36m 17 / lsp 14) applied to POSED verts
=================  ==============  =====================================

Reference parity: the reference loads the same schema from the SMPL ``.pkl``
(SURVEY.md section 2, "SMPL layer" / depends-on column). The real model file
is not redistributable; `synthetic_smpl_model` generates a schema-exact,
numerically well-behaved stand-in (deterministic per seed) against which
both this framework and the torch oracle are validated — the BASELINE's
"MPJPE parity to 1e-3" is defined vs. the oracle on the same model file.
"""

from __future__ import annotations

import dataclasses
import pickle
from pathlib import Path
from typing import Optional

import numpy as np

NUM_VERTS = 6890
NUM_JOINTS = 24
NUM_BETAS = 10
NUM_POSE_DIRS = 9 * (NUM_JOINTS - 1)  # 207: vec((R_k - I)) for the 23 non-root joints
NUM_FACES = 13776

# Standard SMPL kinematic tree (root pelvis = 0, parent -1).
SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21],
    dtype=np.int32,
)

# Canonical SMPL joint names, index-aligned with SMPL_PARENTS.
SMPL_JOINT_NAMES = (
    "pelvis", "l_hip", "r_hip", "spine1", "l_knee", "r_knee", "spine2",
    "l_ankle", "r_ankle", "spine3", "l_foot", "r_foot", "neck", "l_collar",
    "r_collar", "head", "l_shoulder", "r_shoulder", "l_elbow", "r_elbow",
    "l_wrist", "r_wrist", "l_hand", "r_hand",
)


@dataclasses.dataclass(frozen=True)
class SMPLModel:
    """The SMPL parameter pytree. All float arrays are float32 numpy.

    This is a plain container — convert to device arrays at the call site
    (jax treats dataclasses of arrays as pytrees once registered; we keep
    this one host-side and pass a dict of jnp arrays into jitted code).
    """

    v_template: np.ndarray      # (V, 3)
    shapedirs: np.ndarray       # (V, 3, B)
    posedirs: np.ndarray        # (V, 3, P)
    J_regressor: np.ndarray     # (J, V)
    weights: np.ndarray         # (V, J)
    kintree_parents: np.ndarray # (J,) int32
    faces: np.ndarray           # (F, 3) int32
    joint_regressor: Optional[np.ndarray] = None  # (K, V) eval-keypoint regressor

    def __post_init__(self):
        v, j, b = NUM_VERTS, NUM_JOINTS, NUM_BETAS
        assert self.v_template.shape == (v, 3), self.v_template.shape
        assert self.shapedirs.shape[:2] == (v, 3), self.shapedirs.shape
        assert self.posedirs.shape == (v, 3, NUM_POSE_DIRS), self.posedirs.shape
        assert self.J_regressor.shape == (j, v), self.J_regressor.shape
        assert self.weights.shape == (v, j), self.weights.shape
        assert self.kintree_parents.shape == (j,), self.kintree_parents.shape
        assert self.faces.shape[1] == 3, self.faces.shape

    @property
    def num_betas(self) -> int:
        return self.shapedirs.shape[-1]

    def as_dict(self) -> dict:
        """Flat dict of arrays — the form passed into jitted functions."""
        d = {
            "v_template": self.v_template,
            "shapedirs": self.shapedirs,
            "posedirs": self.posedirs,
            "J_regressor": self.J_regressor,
            "weights": self.weights,
            "kintree_parents": self.kintree_parents,
            "faces": self.faces,
        }
        if self.joint_regressor is not None:
            d["joint_regressor"] = self.joint_regressor
        return d

    def save_npz(self, path: str | Path) -> None:
        np.savez_compressed(str(path), **{k: v for k, v in self.as_dict().items()})


def _f32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


def _dense(x) -> np.ndarray:
    """Densify scipy-sparse / chumpy-ish array-likes without importing them."""
    if hasattr(x, "toarray"):        # scipy sparse
        x = x.toarray()
    if hasattr(x, "r"):              # chumpy Ch object exposes .r
        x = x.r
    return np.asarray(x)


class _ChumpyShim:
    """Unpickling stand-in for anything under the chumpy package.

    Chumpy objects appear in pickles in two forms: class + ``__setstate__``
    dict, or a module-level reconstruct function called with the raw array.
    This shim covers both — it accepts any constructor args and captures the
    first array-like as the payload, and merges setstate dicts.
    """

    def __init__(self, *args, **kwargs):
        for a in args:
            if isinstance(a, np.ndarray):
                self.x = a
                break

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.x = np.asarray(state)

    @property
    def r(self):
        for key in ("x", "_x", "a"):
            if key in self.__dict__:
                return np.asarray(self.__dict__[key])
        raise ValueError("chumpy shim: no array payload found")


class _ShimUnpickler(pickle.Unpickler):
    def find_class(self, module, name):  # noqa: D102
        if module.startswith("chumpy"):
            return _ChumpyShim
        if module.startswith("scipy.sparse") and name in ("csr_matrix", "csc_matrix"):
            try:
                return super().find_class(module, name)
            except Exception:
                return _ChumpyShim
        return super().find_class(module, name)


def load_smpl_model(path: str | Path) -> SMPLModel:
    """Load an SMPL model from ``.npz`` (canonical) or legacy ``.pkl``.

    The ``.pkl`` path tolerates chumpy-pickled files without chumpy installed
    (the reference's model file format; SURVEY.md section 2 "depends on:
    model .pkl").
    """
    path = Path(path)
    if path.suffix == ".npz":
        z = np.load(str(path))
        raw = {k: z[k] for k in z.files}
    else:
        with open(path, "rb") as f:
            raw = _ShimUnpickler(f, encoding="latin1").load()

    def get(*names):
        for n in names:
            if n in raw:
                return _dense(raw[n])
        return None

    parents = get("kintree_parents")
    if parents is None:
        kt = get("kintree_table")  # legacy (2, 24): row 0 = parents
        parents = np.asarray(kt)[0] if kt is not None else SMPL_PARENTS.copy()
    parents = np.asarray(parents, dtype=np.int64)
    parents[0] = -1  # legacy files store 4294967295 at the root
    posedirs = _f32(get("posedirs"))
    if posedirs.ndim == 2:  # stored flattened (V*3, P)
        posedirs = posedirs.reshape(NUM_VERTS, 3, -1)
    jr = get("joint_regressor", "cocoplus_regressor", "J_regressor_extra")

    return SMPLModel(
        v_template=_f32(get("v_template")),
        shapedirs=_f32(get("shapedirs")),
        posedirs=posedirs,
        J_regressor=_f32(get("J_regressor")),
        weights=_f32(get("weights")),
        kintree_parents=parents.astype(np.int32),
        faces=np.asarray(get("f", "faces"), dtype=np.int32),
        joint_regressor=None if jr is None else _f32(jr),
    )


def synthetic_smpl_model(
    seed: int = 0,
    num_eval_joints: int = 19,
    symmetric: bool = False,
) -> SMPLModel:
    """Deterministic, schema-exact synthetic SMPL model.

    Built to be numerically representative of the real model so kernels and
    tests exercise realistic magnitudes:

    - vertices form a body-sized (~1.7 m tall) ellipsoidal cloud,
    - J_regressor rows are sparse convex combinations of nearby vertices,
    - skinning weights are spatially smooth, sparse (<=4 joints/vertex),
      rows sum to 1,
    - blendshape bases have cm-scale effect per unit coefficient.

    ``symmetric=True`` additionally makes the body bilaterally symmetric —
    the property real SMPL has (to ~mm) and every flip feature in the stack
    depends on (`smpl.pose_aug.flip_pose` theta GT, the trainer's mirrored
    kp2d/j3d targets, `eval.protocol.unflip_joints3d` flip-averaged eval):

    - mirrored vertex clusters (pair i <-> i + V/2 with x negated),
    - J_regressor / skinning weights / blendshapes averaged with their
      mirror image (posedirs through the exact (R-I)-feature conjugation
      map, so pose-corrective offsets are mirror-EQUIVARIANT),
    - the eval joint regressor targets the LSP-14 SEMANTIC skeleton
      (r_ankle at the right ankle, ...) with mirror-paired noise, so
      `data.skeleton.LSP_FLIP_MAP` is geometrically correct.

    The default stays asymmetric: committed round-artifacts (checkpoints,
    eval indices, golden numbers) were produced with it. On the asymmetric
    model, flip supervision targets are unreachable — training gates flip
    aug off via `train.trainer.gate_flip_aug` (measured: a 40k run with
    flip aug on this template served 56 mm direct but 461 mm mirrored).
    """
    rng = np.random.default_rng(seed)
    V, J, B, P = NUM_VERTS, NUM_JOINTS, NUM_BETAS, NUM_POSE_DIRS

    # Rest joints: a stylized skeleton roughly matching SMPL proportions (m).
    rest_joints = np.array(
        [
            [0.00, 0.00, 0.00],    # pelvis
            [0.09, -0.08, 0.00],   # l_hip
            [-0.09, -0.08, 0.00],  # r_hip
            [0.00, 0.11, -0.01],   # spine1
            [0.10, -0.48, 0.00],   # l_knee
            [-0.10, -0.48, 0.00],  # r_knee
            [0.00, 0.25, 0.00],    # spine2
            [0.10, -0.88, -0.03],  # l_ankle
            [-0.10, -0.88, -0.03], # r_ankle
            [0.00, 0.31, 0.01],    # spine3
            [0.12, -0.94, 0.10],   # l_foot
            [-0.12, -0.94, 0.10],  # r_foot
            [0.00, 0.46, 0.00],    # neck
            [0.07, 0.39, 0.00],    # l_collar
            [-0.07, 0.39, 0.00],   # r_collar
            [0.00, 0.55, 0.02],    # head
            [0.17, 0.41, 0.00],    # l_shoulder
            [-0.17, 0.41, 0.00],   # r_shoulder
            [0.43, 0.40, 0.00],    # l_elbow
            [-0.43, 0.40, 0.00],   # r_elbow
            [0.68, 0.40, 0.00],    # l_wrist
            [-0.68, 0.40, 0.00],   # r_wrist
            [0.76, 0.40, 0.00],    # l_hand
            [-0.76, 0.40, 0.00],   # r_hand
        ],
        dtype=np.float32,
    )

    mirror3 = np.array([-1.0, 1.0, 1.0], dtype=np.float32)
    if symmetric:
        # Half the cloud is drawn, the other half is its exact x-mirror
        # (vertex pairing i <-> i + V2; rest_joints is mirror-exact under
        # the SMPL joint permutation by construction of the table above).
        from human_3d_reconstruction_tpu.smpl.pose_aug import SMPL_POSE_FLIP_PERM

        V2 = V // 2
        owner_half = np.repeat(np.arange(J), V2 // J)
        owner_half = np.concatenate(
            [owner_half, np.zeros(V2 - owner_half.size, dtype=np.int64)]
        )
        rng.shuffle(owner_half)
        radius = rng.uniform(0.03, 0.12, size=(V2, 1)).astype(np.float32)
        direction = rng.normal(size=(V2, 3)).astype(np.float32)
        direction /= np.linalg.norm(direction, axis=1, keepdims=True) + 1e-8
        v_half = rest_joints[owner_half] + radius * direction
        v_template = np.concatenate([v_half, v_half * mirror3])
        # Involution over vertices: pair(i) = i +- V2.
        vperm = np.concatenate([np.arange(V2) + V2, np.arange(V2)])
    else:
        # Vertices: each joint owns a cluster of surface points around a bone.
        verts_per_joint = V // J  # 287, remainder goes to the root
        owner = np.repeat(np.arange(J), verts_per_joint)
        owner = np.concatenate([owner, np.zeros(V - owner.size, dtype=np.int64)])
        rng.shuffle(owner)
        radius = rng.uniform(0.03, 0.12, size=(V, 1)).astype(np.float32)
        direction = rng.normal(size=(V, 3)).astype(np.float32)
        direction /= np.linalg.norm(direction, axis=1, keepdims=True) + 1e-8
        v_template = rest_joints[owner] + radius * direction

    # J_regressor: convex weights over the 32 nearest template verts per joint.
    J_regressor = np.zeros((J, V), dtype=np.float32)
    for j in range(J):
        d = np.linalg.norm(v_template - rest_joints[j], axis=1)
        nearest = np.argsort(d)[:32]
        w = np.exp(-d[nearest] / 0.02)
        J_regressor[j, nearest] = w / w.sum()
    # Exactness: re-center clusters so J_regressor @ v_template == rest_joints
    # does not need to hold exactly — the forward re-derives joints from the
    # regressor, which is all the pipeline requires.

    # Skinning weights: softmax over the 4 nearest joints (spatially smooth).
    d_vj = np.linalg.norm(v_template[:, None, :] - rest_joints[None, :, :], axis=2)
    weights = np.zeros((V, J), dtype=np.float32)
    top4 = np.argsort(d_vj, axis=1)[:, :4]
    rows = np.arange(V)[:, None]
    logits = -d_vj[rows, top4] / 0.05
    logits -= logits.max(axis=1, keepdims=True)
    soft = np.exp(logits)
    soft /= soft.sum(axis=1, keepdims=True)
    weights[rows, top4] = soft.astype(np.float32)

    # Blendshapes: smooth low-rank random fields, cm-scale.
    def smooth_basis(k: int, scale: float) -> np.ndarray:
        freq = rng.normal(size=(k, 8, 3)).astype(np.float32)
        phase = rng.uniform(0, 2 * np.pi, size=(k, 8)).astype(np.float32)
        amp = rng.normal(size=(k, 8, 3)).astype(np.float32)
        out = np.zeros((V, 3, k), dtype=np.float32)
        for i in range(k):
            arg = v_template @ freq[i].T * 6.0 + phase[i]  # (V, 8)
            out[:, :, i] = np.sin(arg) @ amp[i] * scale
        return out

    shapedirs = smooth_basis(B, 0.01)
    posedirs = smooth_basis(P, 0.001)

    if symmetric:
        # Symmetrize every learned-table analog by averaging with its exact
        # mirror image — each transform below is an involution, so the
        # average is the projection onto the symmetric subspace (convexity
        # and row sums are preserved).
        jperm = np.asarray(SMPL_POSE_FLIP_PERM, dtype=np.int64)
        # J_regressor[j, v]: want row(perm(j)) == row(j) over paired verts.
        J_regressor = 0.5 * (J_regressor + J_regressor[jperm][:, vperm])
        # Skinning weights[v, j].
        weights = 0.5 * (weights + weights[vperm][:, jperm])
        # Shape blendshapes: displacement mirrors with the SAME beta
        # (real SMPL's betas are side-agnostic too).
        shapedirs = 0.5 * (shapedirs + shapedirs[vperm] * mirror3[None, :, None])
        # Pose blendshapes: mirror-EQUIVARIANT under the (R - I) feature
        # conjugation R' = M R M (entry signs s_a * s_b, s = (-1, 1, 1))
        # plus the joint permutation — matches smpl_forward's joint-major
        # row-major pose_feature layout (forward.py:202).
        s3 = np.array([-1.0, 1.0, 1.0], dtype=np.float32)
        fperm = np.empty(P, dtype=np.int64)
        fsign = np.empty(P, dtype=np.float32)
        for j in range(1, J):
            for a in range(3):
                for b in range(3):
                    f = (j - 1) * 9 + a * 3 + b
                    fperm[f] = (jperm[j] - 1) * 9 + a * 3 + b
                    fsign[f] = s3[a] * s3[b]
        pd_mirror = (posedirs[vperm] * mirror3[None, :, None] * fsign[None, None, :])[
            :, :, fperm
        ]
        posedirs = 0.5 * (posedirs + pd_mirror)

    # Faces: triangles over nearest-neighbor triples (valid indices; used by
    # the rasterizer tests, not by the forward math).
    idx = rng.integers(0, V, size=(NUM_FACES, 1))
    faces = np.concatenate(
        [idx, (idx + rng.integers(1, 50, size=(NUM_FACES, 2)))], axis=1
    ) % V
    faces = faces.astype(np.int32)

    # Eval joint regressor (cocoplus-19 style): sparse convex rows.
    joint_regressor = np.zeros((num_eval_joints, V), dtype=np.float32)
    if symmetric:
        # LSP-14 SEMANTIC targets (r_ankle, r_knee, r_hip, l_hip, l_knee,
        # l_ankle, r_wrist, r_elbow, r_shoulder, l_shoulder, l_elbow,
        # l_wrist, neck, head_top) mapped onto the SMPL skeleton, noise
        # mirror-paired so LSP_FLIP_MAP is geometrically exact; extra
        # cocoplus joints (nose/eyes/ears stand-ins) sit on the head
        # midline. The default mode's `k % J` targets carry NO left/right
        # semantics — self-consistent for training/eval, but mirrors map
        # pelvis onto r_knee there (the round-5 flip-aug finding).
        from human_3d_reconstruction_tpu.data.skeleton import LSP_FLIP_MAP

        lsp_to_smpl = np.array(
            [8, 5, 2, 1, 4, 7, 21, 19, 17, 16, 18, 20, 12, 15], dtype=np.int64
        )
        targets = np.zeros((num_eval_joints, 3), dtype=np.float32)
        noise = rng.normal(scale=0.02, size=(num_eval_joints, 3)).astype(np.float32)
        for k in range(14):
            m = int(LSP_FLIP_MAP[k])
            if m == k:  # midline joints: noise constrained to the x=0 plane
                noise[k, 0] = 0.0
            elif m < k:  # left member: exact mirror of the right's noise
                noise[k] = noise[m] * mirror3
            targets[k] = rest_joints[lsp_to_smpl[k]] + noise[k]
        for k in range(14, num_eval_joints):
            noise[k, 0] = 0.0
            targets[k] = rest_joints[15] + noise[k]  # head midline
        for k in range(num_eval_joints):
            d = np.linalg.norm(v_template - targets[k], axis=1)
            nearest = np.argsort(d)[:16]
            w = np.exp(-d[nearest] / 0.02)
            joint_regressor[k, nearest] = w / w.sum()
        eperm = np.concatenate(
            [np.asarray(LSP_FLIP_MAP, dtype=np.int64),
             np.arange(14, num_eval_joints)]
        )
        joint_regressor = 0.5 * (joint_regressor + joint_regressor[eperm][:, vperm])
    else:
        for k in range(num_eval_joints):
            target = rest_joints[k % J] + rng.normal(scale=0.02, size=3)
            d = np.linalg.norm(v_template - target, axis=1)
            nearest = np.argsort(d)[:16]
            w = np.exp(-d[nearest] / 0.02)
            joint_regressor[k, nearest] = w / w.sum()

    return SMPLModel(
        v_template=v_template,
        shapedirs=shapedirs,
        posedirs=posedirs,
        J_regressor=J_regressor,
        weights=weights,
        kintree_parents=SMPL_PARENTS.copy(),
        faces=faces,
        joint_regressor=joint_regressor,
    )
