"""Dataset adapters and batching.

Reference parity (SURVEY.md section 2 "Dataset loaders", L3): one adapter
per source — LSP, LSP-extended, MPII, COCO (2D keypoints); MPI-INF-3DHP,
Human3.6M (3D joints, optionally SMPL/mosh params); plus a Mosh parameter
source feeding the discriminator. The reference exposes them as torch
Datasets behind a DataLoader; here each adapter yields plain numpy records
into a host-side sampler, and ALL geometric work (crop/resize/aug/normalize)
happens on device via `data.preprocess` — the adapter only decodes.

Record schema (host numpy):
    image        (H, W, 3) float32 [0, 255]   — decoded frame
    center       (2,)  box center, px
    scale        ()    box side, px
    kp2d         (14, 3) LSP-14 [x, y, vis] in source px
    joints3d     (14, 3) meters, root-relative, or zeros
    has_3d       ()     1.0 if joints3d valid
    theta        (72,), beta (10,)            — SMPL GT (mosh), or zeros
    has_smpl     ()     1.0 if theta/beta valid

Annotation files: each adapter reads a simple ``.npz`` index (fields below
per adapter) next to an image directory. Converters from the original
distribution formats are in ``cli/convert_annotations.py``; this keeps the
hot path free of h5py/scipy-specific parsing.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Iterator, Optional, Sequence

import numpy as np

from human_3d_reconstruction_tpu.data.skeleton import (
    COCO_TO_LSP14,
    H36M_TO_LSP14,
    LSP_TO_LSP14,
    MPI3DHP_TO_LSP14,
    MPII_TO_LSP14,
    NUM_KP,
    remap_keypoints,
)


@dataclasses.dataclass
class Record:
    image: np.ndarray
    center: np.ndarray
    scale: np.ndarray
    kp2d: np.ndarray
    joints3d: np.ndarray
    has_3d: np.ndarray
    theta: np.ndarray
    beta: np.ndarray
    has_smpl: np.ndarray


def _empty_3d():
    return np.zeros((NUM_KP, 3), np.float32)


def _read_image(path: str | Path) -> np.ndarray:
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32)


class AnnotationDataset:
    """Base adapter over an npz index.

    Index fields: image_paths (N,) str; centers (N, 2); scales (N,);
    keypoints (N, Kn, 3) native order; optional joints3d (N, 17, 3) [m];
    optional thetas (N, 72), betas (N, 10).
    """

    name = "base"
    kp_table: np.ndarray = LSP_TO_LSP14
    has_3d_gt = False
    has_smpl_gt = False

    def __init__(self, index_path: str | Path, image_root: Optional[str | Path] = None):
        self.index_path = Path(index_path)
        z = np.load(str(index_path), allow_pickle=True)
        self.image_paths = [str(p) for p in z["image_paths"]]
        self.centers = z["centers"].astype(np.float32)
        self.scales = z["scales"].astype(np.float32)
        self.keypoints = z["keypoints"].astype(np.float32)
        self.joints3d = z["joints3d"].astype(np.float32) if "joints3d" in z else None
        self.thetas = z["thetas"].astype(np.float32) if "thetas" in z else None
        self.betas = z["betas"].astype(np.float32) if "betas" in z else None
        self.image_root = Path(image_root) if image_root else self.index_path.parent

    def __len__(self) -> int:
        return len(self.image_paths)

    def __getitem__(self, i: int) -> Record:
        kp = remap_keypoints(self.keypoints[i], self.kp_table)
        j3d = _empty_3d()
        has_3d = np.float32(0.0)
        if self.has_3d_gt and self.joints3d is not None:
            # 3D joints carry xyz (no vis column): plain gather + centering.
            j3d = self.joints3d[i][self.kp3d_table]
            j3d = (j3d - j3d.mean(axis=0, keepdims=True)).astype(np.float32)
            has_3d = np.float32(1.0)
        # SMPL GT needs BOTH theta and beta: an index with thetas but no
        # betas must not mark has_smpl, or the param loss would supervise
        # beta toward the zero vector it never annotated.
        smpl_ok = self.has_smpl_gt and self.thetas is not None and self.betas is not None
        theta = self.thetas[i] if smpl_ok else np.zeros(72, np.float32)
        beta = self.betas[i] if smpl_ok else np.zeros(10, np.float32)
        has_smpl = np.float32(1.0 if smpl_ok else 0.0)
        return Record(
            image=_read_image(self.image_root / self.image_paths[i]),
            center=self.centers[i],
            scale=self.scales[i],
            kp2d=kp,
            joints3d=j3d,
            has_3d=has_3d,
            theta=np.asarray(theta, np.float32),
            beta=np.asarray(beta, np.float32),
            has_smpl=has_smpl,
        )


class LSPDataset(AnnotationDataset):
    name = "lsp"
    kp_table = LSP_TO_LSP14


class LSPExtendedDataset(AnnotationDataset):
    name = "lsp_ext"
    kp_table = LSP_TO_LSP14


class MPIIDataset(AnnotationDataset):
    name = "mpii"
    kp_table = MPII_TO_LSP14


class COCODataset(AnnotationDataset):
    name = "coco"
    kp_table = COCO_TO_LSP14


class Human36MDataset(AnnotationDataset):
    name = "h36m"
    kp_table = H36M_TO_LSP14
    kp3d_table = H36M_TO_LSP14
    has_3d_gt = True
    has_smpl_gt = True  # mosh fits, when present in the index


class MPIInf3DHPDataset(AnnotationDataset):
    name = "mpi_inf_3dhp"
    kp_table = MPI3DHP_TO_LSP14
    kp3d_table = MPI3DHP_TO_LSP14
    has_3d_gt = True


DATASET_REGISTRY = {
    c.name: c
    for c in (
        LSPDataset,
        LSPExtendedDataset,
        MPIIDataset,
        COCODataset,
        Human36MDataset,
        MPIInf3DHPDataset,
    )
}


def make_dataset(name: str, path):
    """Factory covering the npz adapters plus the packed-record format."""
    if name == "packed":
        from human_3d_reconstruction_tpu.data.recordio import PackedDataset

        return PackedDataset(path)
    return DATASET_REGISTRY[name](path)


class MoshParamSource:
    """(theta, beta) prior pool for the discriminator (reference: Mosh'd CMU).

    Reads npz with thetas (N, 72), betas (N, 10); `sample(rng, n)` returns a
    batch. Without a real mosh file, `synthetic(rng)` builds a pool of
    smooth plausible poses (small axis-angle magnitudes, upright root).
    """

    def __init__(self, thetas: np.ndarray, betas: np.ndarray):
        self.thetas = thetas.astype(np.float32)
        self.betas = betas.astype(np.float32)

    @classmethod
    def from_npz(cls, path: str | Path) -> "MoshParamSource":
        z = np.load(str(path))
        return cls(z["thetas"], z["betas"])

    @classmethod
    def synthetic(
        cls, rng: np.random.Generator, n: int = 4096, anchors: int = 96
    ) -> "MoshParamSource":
        """Manifold-like pose pool (no real mosh data in this image).

        Real mosh'd poses lie on a low-dimensional correlated manifold, not
        iid noise — so the pool is built from a small set of anchor poses
        with per-joint-type amplitude (hinge joints like knees/elbows move
        most, spine/root least), convexly mixed pairwise plus small jitter.
        The discriminator then trains against samples with joint-to-joint
        correlation structure rather than white noise.
        """
        # SMPL joint order: 0 root, 1/2 hips, 3 spine, 4/5 knees, 6 spine,
        # 7/8 ankles, 9 spine, 10/11 feet, 12 neck, 13/14 collars, 15 head,
        # 16/17 shoulders, 18/19 elbows, 20/21 wrists, 22/23 hands.
        amp = np.array(
            [0.10, 0.35, 0.35, 0.15, 0.60, 0.60, 0.15, 0.40, 0.40, 0.10,
             0.15, 0.15, 0.20, 0.20, 0.20, 0.25, 0.45, 0.45, 0.60, 0.60,
             0.30, 0.30, 0.10, 0.10],
            np.float32,
        )
        pool = rng.normal(size=(anchors, 24, 3)).astype(np.float32) * amp[:, None]
        i, j = rng.integers(0, anchors, (2, n))
        t = rng.beta(2.0, 2.0, size=(n, 1, 1)).astype(np.float32)
        thetas = (1.0 - t) * pool[i] + t * pool[j]
        thetas += rng.normal(scale=0.03, size=thetas.shape).astype(np.float32)
        thetas = thetas.reshape(n, 72)
        # Anchor betas too: shapes cluster around a few body types.
        beta_pool = rng.normal(scale=0.8, size=(anchors, 10)).astype(np.float32)
        betas = (1.0 - t[:, :, 0]) * beta_pool[i] + t[:, :, 0] * beta_pool[j]
        return cls(thetas, betas.astype(np.float32))

    def sample(self, rng: np.random.Generator, n: int) -> tuple[np.ndarray, np.ndarray]:
        idx = rng.integers(0, len(self.thetas), size=n)
        return self.thetas[idx], self.betas[idx]


# Distinct per-joint RGB signatures for the rendered synthetic protocol
# (hue wheel over the LSP-14 joints; rows ~unit-norm so blob amplitudes are
# comparable across joints).
def _joint_palette(k: int = NUM_KP) -> np.ndarray:
    h = np.arange(k) / k * 2.0 * np.pi
    pal = np.stack(
        [np.cos(h), np.cos(h - 2.0 * np.pi / 3), np.cos(h + 2.0 * np.pi / 3)],
        axis=1,
    )
    return (pal / np.linalg.norm(pal, axis=1, keepdims=True)).astype(np.float32)


class SyntheticImageDataset:
    """Procedural dataset for tests/smoke-training (no real data in image).

    Generates deterministic (image, kp2d, joints3d, theta, beta) tuples from
    the synthetic SMPL model: pose/shape are sampled, 3D joints come from
    the model, 2D keypoints are a weak-perspective projection mapped into a
    fake frame.

    Three image modes (``render_mode``):
    - ``"noise"`` (default): structured noise keyed by the sample index —
      pose is NOT recoverable from pixels, so this mode can only be
      memorized (the overfit-one-batch test of SURVEY.md section 4 item 5).
    - ``"skeleton"`` (or legacy ``render_skeleton=True``): the image IS a
      deterministic function of the pose — one Gaussian blob per LSP-14
      joint at its projected pixel with a distinct RGB signature, blob
      radius encoding root-relative depth — so image -> pose is learnable
      and a held-out split measures GENERALIZATION, not memorization
      (VERDICT r2 item 2's protocol).
    - ``"mesh"``: the hardened protocol (VERDICT r3 weak #4) — the posed
      SMPL body rendered as a shaded, body-textured triangle surface over
      a randomized background (viz/body_render.py), on device in jitted
      frame chunks. Still a deterministic function of (pose, shape, index),
      but the encoder now faces self-occlusion, lighting, texture, and
      background clutter instead of reading blob positions.
    """

    name = "synthetic"
    has_3d_gt = True
    has_smpl_gt = True

    def __init__(
        self,
        smpl_model,
        n: int = 64,
        frame_hw=(256, 256),
        seed: int = 0,
        render_skeleton: bool = False,
        render_mode: str | None = None,
        thetas: Optional[np.ndarray] = None,
        betas: Optional[np.ndarray] = None,
    ):
        import jax
        import jax.numpy as jnp

        from human_3d_reconstruction_tpu.smpl.forward import smpl_forward

        if render_mode is None:
            render_mode = "skeleton" if render_skeleton else "noise"
        if render_mode not in ("noise", "skeleton", "mesh"):
            raise ValueError(f"unknown render_mode {render_mode!r}")
        rng = np.random.default_rng(seed)
        # Optional explicit pose/shape streams (e.g. a temporally-coherent
        # motion clip for the smoothing benchmark) — everything downstream
        # (joints, kp2d, rendering) is already a pure function of them.
        if thetas is not None:
            thetas = np.asarray(thetas, np.float32)
            if thetas.ndim != 2 or thetas.shape[1] != 72:
                raise ValueError(f"thetas shape {thetas.shape} != (n, 72)")
            n = len(thetas)
        if betas is not None:
            betas = np.asarray(betas, np.float32)
            if betas.shape != (n, 10):
                raise ValueError(f"betas shape {betas.shape} != ({n}, 10)")
        self.n = n
        self.frame_hw = frame_hw
        self.thetas = (
            thetas if thetas is not None
            else rng.normal(scale=0.3, size=(n, 72)).astype(np.float32)
        )
        self.betas = (
            betas if betas is not None
            else rng.normal(scale=0.8, size=(n, 10)).astype(np.float32)
        )
        params = {k: jnp.asarray(v) for k, v in smpl_model.as_dict().items()}
        # jit: eager dispatch of the many small SMPL ops costs minutes over
        # a high-latency device tunnel; one compiled call is a single trip.
        out = jax.jit(lambda p, b: smpl_forward(params, p, b))(
            jnp.asarray(self.thetas), jnp.asarray(self.betas)
        )
        # 14-kp subset of eval joints (first 14 of cocoplus ordering).
        j3d = np.array(out.eval_joints[:, :NUM_KP])  # copy: jax arrays are read-only views
        self.joints3d = j3d - j3d.mean(axis=1, keepdims=True)
        H, W = frame_hw
        self.centers = np.tile(np.array([[W / 2, H / 2]], np.float32), (n, 1))
        self.scales = np.full((n,), min(H, W) * 0.8, np.float32)
        # 2D kp: project with a fixed camera into the box.
        self._cam_s = 0.9
        xy = self.joints3d[:, :, :2] * self._cam_s  # [-1,1] crop units
        self.kp2d_px = self.centers[:, None] + xy * (self.scales[:, None, None] / 2.0)
        self.rng_images = np.random.default_rng(seed + 1)
        self.render_mode = render_mode
        self.render_skeleton = render_mode == "skeleton"  # legacy attribute
        self._palette = _joint_palette()
        self._image_cache: dict[int, np.ndarray] = {}
        if render_mode == "mesh":
            from human_3d_reconstruction_tpu.viz.body_render import (
                body_vertex_colors,
                local_surface_faces,
                make_frame_renderer,
            )

            v_template = np.asarray(smpl_model.as_dict()["v_template"])
            self._mesh_chunk = 16
            self._mesh_render = make_frame_renderer(
                local_surface_faces(v_template),
                body_vertex_colors(v_template, seed=0),
                frame_hw,
                cam_s=self._cam_s,
                chunk_frames=self._mesh_chunk,
            )
            # Verts are recomputed per chunk on device (storing n x 6890 x 3
            # floats on the host would dwarf the uint8 frame cache).
            self._smpl_fwd = jax.jit(
                lambda p, b: smpl_forward(params, p, b)
            )
            # Light/background randomness: deterministic per (seed, index).
            self._render_keys = (
                np.uint64(seed + 1) * np.uint64(1_000_003)
                + np.arange(n, dtype=np.uint64)
            ).astype(np.uint32)

    def __len__(self):
        return self.n

    def _render(self, i: int) -> np.ndarray:
        """Pose-determined frame: per-joint Gaussian blobs, depth-coded radius.

        Background is low-amplitude index-keyed noise (so the encoder must
        learn to ignore texture); each joint k adds a blob at kp2d_px[i, k]
        with color `_palette[k]` and sigma 5 * (1 + z_k) px (z root-relative
        meters) — x/y live in blob position, z in blob size.
        """
        r = np.random.default_rng(1000 + i)
        H, W = self.frame_hw
        img = 110.0 + r.uniform(-30, 30, (H, W, 3)).astype(np.float32)
        ys = np.arange(H, dtype=np.float32)[:, None]
        xs = np.arange(W, dtype=np.float32)[None, :]
        z = self.joints3d[i, :, 2]
        sigma = np.clip(5.0 * (1.0 + z), 2.0, 12.0)  # (14,)
        blobs = np.empty((NUM_KP, H, W), np.float32)
        for k in range(NUM_KP):
            x0, y0 = self.kp2d_px[i, k]
            d2 = (ys - y0) ** 2 + (xs - x0) ** 2
            blobs[k] = np.exp(-d2 / (2.0 * sigma[k] ** 2))
        img += 120.0 * np.einsum("khw,kc->hwc", blobs, self._palette)
        return np.clip(img, 0, 255).astype(np.float32)

    def _render_mesh_chunk(self, i: int) -> None:
        """Render the whole chunk containing sample i in ONE device program
        (per-frame dispatch over the tunnel costs ~27 ms; chunking
        amortizes it 16x) and cache the frames as uint8."""
        c0 = (i // self._mesh_chunk) * self._mesh_chunk
        c1 = min(c0 + self._mesh_chunk, self.n)
        out = self._smpl_fwd(
            np.asarray(self.thetas[c0:c1]), np.asarray(self.betas[c0:c1])
        )
        # Root-center EXACTLY like joints3d so the projection matches kp2d.
        mu = np.asarray(out.eval_joints[:, :NUM_KP]).mean(axis=1, keepdims=True)
        verts_c = np.asarray(out.verts) - mu
        frames = self._mesh_render(
            verts_c,
            self.centers[c0:c1],
            self.scales[c0:c1],
            self._render_keys[c0:c1],
        )
        for j in range(c0, c1):
            self._image_cache[j] = frames[j - c0]  # uint8 (H, W, 3)

    def __getitem__(self, i: int) -> Record:
        if i not in self._image_cache:
            if self.render_mode == "mesh":
                self._render_mesh_chunk(i)
            elif self.render_mode == "skeleton":
                self._image_cache[i] = self._render(i)
            else:
                r = np.random.default_rng(1000 + i)
                H, W = self.frame_hw
                self._image_cache[i] = r.uniform(0, 255, (H, W, 3)).astype(np.float32)
        kp = np.concatenate(
            [self.kp2d_px[i], np.ones((NUM_KP, 1), np.float32)], axis=1
        )
        return Record(
            image=self._image_cache[i],
            center=self.centers[i],
            scale=self.scales[i],
            kp2d=kp,
            joints3d=self.joints3d[i],
            has_3d=np.float32(1.0),
            theta=self.thetas[i],
            beta=self.betas[i],
            has_smpl=np.float32(1.0),
        )


@dataclasses.dataclass
class Batch:
    """Host-side batch, ready for device upload + on-device preprocess."""

    images: np.ndarray    # (B, H, W, 3) [0,255]
    centers: np.ndarray   # (B, 2)
    scales: np.ndarray    # (B,)
    kp2d: np.ndarray      # (B, 14, 3) source px + vis
    joints3d: np.ndarray  # (B, 14, 3)
    has_3d: np.ndarray    # (B,)
    theta: np.ndarray     # (B, 72)
    beta: np.ndarray      # (B, 10)
    has_smpl: np.ndarray  # (B,)


def collate(records: Sequence[Record]) -> Batch:
    """Stack records; images are padded to the max H/W in the batch so the
    device program sees one static shape per bucket."""
    H = max(r.image.shape[0] for r in records)
    W = max(r.image.shape[1] for r in records)
    imgs = np.zeros((len(records), H, W, 3), np.float32)
    for i, r in enumerate(records):
        h, w = r.image.shape[:2]
        imgs[i, :h, :w] = r.image
    stack = lambda f: np.stack([getattr(r, f) for r in records])
    return Batch(
        images=imgs,
        centers=stack("center"),
        scales=stack("scale"),
        kp2d=stack("kp2d"),
        joints3d=stack("joints3d"),
        has_3d=stack("has_3d"),
        theta=stack("theta"),
        beta=stack("beta"),
        has_smpl=stack("has_smpl"),
    )


class MixedLoader:
    """Uniformly mixes several datasets, yielding collated batches forever.

    The reference concatenates datasets and shuffles behind a multi-worker
    DataLoader; sampling ratios are configurable here because HMR's training
    recipe weights 2D vs 3D sources.

    `num_workers > 0` assembles batches on a thread pool: each worker
    decodes and collates a COMPLETE batch (image decode releases the GIL,
    so threads give real parallelism without pickling datasets into
    subprocesses), and a sliding window of in-flight batches keeps the
    host ahead of the accelerator. Sampling is per-batch-deterministic —
    batch k's records depend only on (seed, k), never on thread timing —
    so the stream is bit-identical at any worker count.
    """

    def __init__(
        self,
        datasets: Sequence,
        batch_size: int,
        weights: Optional[Sequence[float]] = None,
        seed: int = 0,
        num_workers: int = 0,
    ):
        assert datasets, "need at least one dataset"
        self.datasets = list(datasets)
        self.batch_size = batch_size
        w = np.asarray(weights if weights is not None else [1.0] * len(datasets), np.float64)
        self.weights = w / w.sum()
        self.seed = seed
        self.num_workers = num_workers

    def _build_batch(self, k: int) -> Batch:
        """Decode + collate batch k (pure function of (seed, k))."""
        rng = np.random.default_rng((self.seed, k))
        ds_idx = rng.choice(len(self.datasets), size=self.batch_size, p=self.weights)
        recs = [
            self.datasets[d][int(rng.integers(0, len(self.datasets[d])))]
            for d in ds_idx
        ]
        return collate(recs)

    def __iter__(self) -> Iterator[Batch]:
        if self.num_workers <= 0:
            k = 0
            while True:
                yield self._build_batch(k)
                k += 1
            return

        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        window = 2 * self.num_workers  # double-buffer per worker
        with ThreadPoolExecutor(self.num_workers) as pool:
            pending: deque = deque(
                pool.submit(self._build_batch, k) for k in range(window)
            )
            k = window
            while True:
                batch = pending.popleft().result()
                pending.append(pool.submit(self._build_batch, k))
                k += 1
                yield batch
