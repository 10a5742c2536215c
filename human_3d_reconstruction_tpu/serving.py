"""Production serving session: frames + boxes in, meshes out.

Wraps the flagship jitted program behind a stable, numpy-facing API for
deployment (BASELINE: "intended for large-scale production deployment and
serving"):

    session = MeshRecoverySession(variables, smpl_model)
    result = session.recover(frame, boxes)        # one frame, N boxes
    results = session.recover_batch(frames, boxes_list)

Properties:
- person counts are bucketed (utils/bucketing): at most ~8 compiled
  programs ever exist, any crowd size served without retracing;
- preprocessing (crop/resize/normalize) runs on device inside the same
  program as the network and SMPL decode;
- outputs are numpy, padded persons already stripped;
- optional overlay rendering via the native rasterizer.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.api import (
    MeshRecoveryOutput,
    make_recover_from_clip,
    make_recover_from_single_frame,
)
from human_3d_reconstruction_tpu.models.hmr import HMRConfig, HMRModel
from human_3d_reconstruction_tpu.utils.bucketing import (
    DEFAULT_BUCKETS,
    bucket_size,
    pad_people,
)


@dataclass
class PersonResult:
    theta: np.ndarray      # (72,)
    beta: np.ndarray       # (10,)
    cam: np.ndarray        # (3,)
    verts: np.ndarray      # (6890, 3)
    joints3d: np.ndarray   # (24, 3)
    joints2d: np.ndarray   # (K, 2) normalized crop coords
    box: np.ndarray        # (3,) [cx, cy, scale]
    # Heatmap-head detections (kp_head models; request via `fields`):
    kp2d_det: Optional[np.ndarray] = None  # (14, 2) crop coords
    kp_conf: Optional[np.ndarray] = None   # (14,) confidence


def run_person_chunks(boxes: np.ndarray, cap: int, run_chunk):
    """Serve any crowd size through fixed-bucket programs: run `run_chunk`
    on <=cap-person slices and concatenate the output pytrees along the
    person axis. Shared by the live and the AOT-exported sessions."""
    chunks = [run_chunk(boxes[i : i + cap]) for i in range(0, len(boxes), cap)]
    if len(chunks) == 1:
        return chunks[0]
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *chunks)


def run_person_chunks_multi(arrays: tuple, cap: int, run_chunk):
    """run_person_chunks for multiple person-axis inputs (boxes, kp2d, ...)."""
    n = len(arrays[0])
    chunks = [
        run_chunk(*(a[i : i + cap] for a in arrays)) for i in range(0, n, cap)
    ]
    if len(chunks) == 1:
        return chunks[0]
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *chunks)


class MeshRecoverySession:
    """Owns the model + compiled programs; thread-compatible (pure calls)."""

    def __init__(
        self,
        variables,
        smpl_model,
        hmr_config: Optional[HMRConfig] = None,
        crop_size: int = 224,
        smpl_path: str = "pallas",
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        optimize: bool = True,
        quantize: bool = False,
        mesh=None,
        pose_prior=None,
        refine_lr: float = 0.02,
        lambda_pose_prior: float = 1e-3,
        lambda_angle_prior: float = 0.0,
    ):
        """`mesh`: optional jax.sharding.Mesh with a 'data' axis — the person
        batch is sharded across its devices (weights/SMPL constants
        replicated, XLA splits the fused program; no collectives needed in
        the forward pass). Buckets are restricted to multiples of the device
        count so every chip gets equal work."""
        config = hmr_config or HMRConfig()
        model_cls = HMRModel
        if quantize and config.encoder.startswith("resnet") and "batch_stats" in variables:
            # Int8 W8A8 encoder (includes the serving rewrite); ~percent-level
            # output drift, measured in tests/test_quant.py.
            from human_3d_reconstruction_tpu.models.quant import (
                HMRModelInt8,
                quantize_hmr_for_serving,
            )

            config, variables = quantize_hmr_for_serving(config, variables)
            model_cls = HMRModelInt8
        elif optimize and config.encoder.startswith("resnet") and "batch_stats" in variables:
            # Serving graph rewrite: space-to-depth stem + BN folded into
            # conv weights — exact reparameterizations (models/resnet.py),
            # measurably faster on the MXU.
            from human_3d_reconstruction_tpu.models.hmr import optimize_for_serving

            config, variables = optimize_for_serving(config, variables)
        self.model = model_cls(config=config)
        self.variables = variables
        self.crop_size = crop_size
        self.buckets = tuple(buckets)
        self.faces = np.asarray(smpl_model.faces)
        if smpl_path == "pallas":
            from human_3d_reconstruction_tpu.ops import prepare_fused_smpl

            self.smpl_params = prepare_fused_smpl(smpl_model.as_dict())
        else:
            self.smpl_params = jax.tree.map(jnp.asarray, smpl_model.as_dict())

        self.mesh = mesh
        self._person_sharding = None
        self._replicated = None
        if mesh is not None:
            from human_3d_reconstruction_tpu.parallel import DATA_AXIS, replicate
            from jax.sharding import NamedSharding, PartitionSpec

            n = mesh.devices.size
            self.buckets = tuple(b for b in self.buckets if b % n == 0)
            if not self.buckets:
                self.buckets = (n,)
            self.variables = replicate(self.variables, mesh)
            self.smpl_params = replicate(self.smpl_params, mesh)
            self._person_sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
            self._replicated = NamedSharding(mesh, PartitionSpec())
        # One fused device program: preprocess + network + SMPL decode. The
        # frame crosses the jit boundary ONCE (H, W, 3); the broadcast to the
        # person axis happens inside the trace so HBM holds a single copy.
        self._recover = make_recover_from_single_frame(
            self.model, smpl_path=smpl_path, crop_size=crop_size
        )
        self._recover_clip = make_recover_from_clip(
            self.model, smpl_path=smpl_path, crop_size=crop_size
        )
        self.clip_buckets = (1, 2, 4, 8, 16)
        # Hybrid regression+fitting (recover(..., kp2d=, refine_steps=N)):
        # programs built lazily per refine_steps, raw SMPL params on first use.
        self._smpl_path = smpl_path
        self._smpl_dict = smpl_model.as_dict()
        self._raw_smpl = None
        self._refine_programs: dict[int, object] = {}
        self.pose_prior = pose_prior
        self.refine_lr = refine_lr
        self.lambda_pose_prior = lambda_pose_prior
        self.lambda_angle_prior = lambda_angle_prior

    # -- core ---------------------------------------------------------------

    def _run_chunk(self, frame: jax.Array, boxes: np.ndarray) -> MeshRecoveryOutput:
        N = len(boxes)
        padded, _ = pad_people(
            {"centers": boxes[:, :2], "scales": boxes[:, 2]}, N, self.buckets
        )
        centers = jnp.asarray(padded["centers"])
        scales = jnp.asarray(padded["scales"])
        if self.mesh is not None:
            # DP serving: person axis sharded, the single frame replicated.
            frame = jax.device_put(frame, self._replicated)
            centers = jax.device_put(centers, self._person_sharding)
            scales = jax.device_put(scales, self._person_sharding)
        out = self._recover(self.variables, self.smpl_params, frame, centers, scales)
        return jax.tree.map(lambda x: x[:N], out)

    def _refined_chunk(
        self, frame: jax.Array, boxes: np.ndarray, kp2d: np.ndarray,
        vis: np.ndarray, refine_steps: int,
    ) -> MeshRecoveryOutput:
        if refine_steps not in self._refine_programs:
            from human_3d_reconstruction_tpu.api import (
                make_refined_recover_from_single_frame,
            )

            self._refine_programs[refine_steps] = (
                make_refined_recover_from_single_frame(
                    self.model,
                    smpl_path=self._smpl_path,
                    crop_size=self.crop_size,
                    refine_steps=refine_steps,
                    refine_lr=self.refine_lr,
                    pose_prior=self.pose_prior,
                    lambda_pose_prior=self.lambda_pose_prior,
                    lambda_angle_prior=self.lambda_angle_prior,
                )
            )
        if self._raw_smpl is None:
            raw = jax.tree.map(jnp.asarray, self._smpl_dict)
            if self.mesh is not None:
                from human_3d_reconstruction_tpu.parallel import replicate

                raw = replicate(raw, self.mesh)
            self._raw_smpl = raw
        N = len(boxes)
        padded, _ = pad_people(
            {
                "centers": boxes[:, :2],
                "scales": boxes[:, 2],
                "kp2d": kp2d,
                "vis": vis,
            },
            N,
            self.buckets,
        )
        args = {k: jnp.asarray(v) for k, v in padded.items()}
        if self.mesh is not None:
            frame = jax.device_put(frame, self._replicated)
            args = {
                k: jax.device_put(v, self._person_sharding) for k, v in args.items()
            }
        out = self._refine_programs[refine_steps](
            self.variables, self.smpl_params, self._raw_smpl, frame,
            args["centers"], args["scales"], args["kp2d"], args["vis"],
        )
        return jax.tree.map(lambda x: x[:N], out)

    def _self_refined_chunk(
        self, frame: jax.Array, boxes: np.ndarray, refine_steps: int
    ) -> MeshRecoveryOutput:
        """Hybrid refinement with NO external keypoints: the model's own
        heatmap head (config.kp_head) supplies confidence-weighted 2D
        observations inside the same device program."""
        key = ("self", refine_steps)
        if key not in self._refine_programs:
            from human_3d_reconstruction_tpu.api import (
                make_self_refined_recover_from_single_frame,
            )

            self._refine_programs[key] = (
                make_self_refined_recover_from_single_frame(
                    self.model,
                    smpl_path=self._smpl_path,
                    crop_size=self.crop_size,
                    refine_steps=refine_steps,
                    refine_lr=self.refine_lr,
                    pose_prior=self.pose_prior,
                    lambda_pose_prior=self.lambda_pose_prior,
                    lambda_angle_prior=self.lambda_angle_prior,
                )
            )
        if self._raw_smpl is None:
            raw = jax.tree.map(jnp.asarray, self._smpl_dict)
            if self.mesh is not None:
                from human_3d_reconstruction_tpu.parallel import replicate

                raw = replicate(raw, self.mesh)
            self._raw_smpl = raw
        N = len(boxes)
        padded, _ = pad_people(
            {"centers": boxes[:, :2], "scales": boxes[:, 2]}, N, self.buckets
        )
        centers = jnp.asarray(padded["centers"])
        scales = jnp.asarray(padded["scales"])
        if self.mesh is not None:
            frame = jax.device_put(frame, self._replicated)
            centers = jax.device_put(centers, self._person_sharding)
            scales = jax.device_put(scales, self._person_sharding)
        out = self._refine_programs[key](
            self.variables, self.smpl_params, self._raw_smpl, frame,
            centers, scales,
        )
        return jax.tree.map(lambda x: x[:N], out)

    @staticmethod
    def _frame_to_device_dtype(frame: np.ndarray) -> np.ndarray:
        """uint8 frames ship as uint8 (4x less H2D traffic — the dominant
        serving cost on remote/tunneled hosts; the cast to compute dtype
        happens on device in separable_crop). Float inputs stay f32 — no
        silent quantization."""
        frame = np.asarray(frame)
        if frame.dtype == np.uint8:
            return frame
        return np.asarray(frame, np.float32)

    def _run(self, frame: np.ndarray, boxes: np.ndarray) -> MeshRecoveryOutput:
        """Any N: crowds beyond the largest bucket run in chunked batches."""
        frame = jnp.asarray(self._frame_to_device_dtype(frame))
        return run_person_chunks(
            boxes, self.buckets[-1], lambda b: self._run_chunk(frame, b)
        )

    # PersonResult fields -> MeshRecoveryOutput fields fetched from device.
    _ALL_FIELDS = ("theta", "beta", "cam", "verts", "joints3d", "joints2d")

    def _to_results(
        self, out: MeshRecoveryOutput, boxes: np.ndarray, fields
    ) -> list[PersonResult]:
        """device_get ONLY the requested fields — on remote/tunneled hosts
        the D2H copy of (N, 6890, 3) vertex buffers dominates serving time
        (measured: ~80% of per-frame latency at 480p), so a params-only
        caller skips it entirely. Unfetched fields are None."""
        missing = [k for k in fields if getattr(out, k, None) is None]
        if missing:
            raise ValueError(
                f"fields {missing} are not produced by this model/program "
                "(heatmap detections need HMRConfig.kp_head=True)"
            )
        host = jax.device_get({k: getattr(out, k) for k in fields})
        blank = {k: None for k in (*self._ALL_FIELDS, "kp2d_det", "kp_conf")}
        return [
            PersonResult(
                **{**blank, **{k: v[i] for k, v in host.items()}},
                box=boxes[i],
            )
            for i in range(len(boxes))
        ]

    def recover(
        self, frame: np.ndarray, boxes, fields=_ALL_FIELDS,
        kp2d=None, vis=None, refine_steps: int = 0,
    ) -> list[PersonResult]:
        """One frame (H, W, 3) [0,255] + boxes (N, 3) [cx, cy, scale].

        `fields` selects which outputs are copied to the host (e.g.
        ("theta", "beta", "cam") for a params-only stream); the device
        program is unchanged, only the transfer shrinks.

        `refine_steps > 0` + `kp2d` (N, K, 2) frame-pixel keypoints (e.g.
        from a 2D detector) runs the hybrid regression+fitting path: the
        SMPLify-style scan joins the SAME device program (session-level
        `pose_prior` / `lambda_*` / `refine_lr` set the objective). `vis`
        (N, K) defaults to all-visible. With a kp_head model
        (HMRConfig.kp_head=True), `kp2d` may be omitted: the model's own
        heatmap head supplies confidence-weighted observations — fully
        self-contained refinement.
        """
        boxes = np.atleast_2d(np.asarray(boxes, np.float32))
        if boxes.size == 0:  # detector found nobody: no work, no program
            return []
        if boxes.ndim != 2 or boxes.shape[-1] != 3:
            raise ValueError(f"boxes must be (N, 3) [cx, cy, scale], got {boxes.shape}")
        if refine_steps > 0:
            if kp2d is None:
                if not getattr(self.model.config, "kp_head", False):
                    raise ValueError(
                        "refine_steps > 0 needs kp2d observations (or a "
                        "model trained with HMRConfig.kp_head=True, whose "
                        "heatmap head supplies them)"
                    )
                dev_frame = jnp.asarray(self._frame_to_device_dtype(frame))
                out = run_person_chunks(
                    boxes,
                    self.buckets[-1],
                    lambda b: self._self_refined_chunk(dev_frame, b, refine_steps),
                )
                return self._to_results(out, boxes, fields)
            kp2d = np.asarray(kp2d, np.float32)
            if kp2d.ndim != 3 or len(kp2d) != len(boxes):
                raise ValueError(
                    f"kp2d must be (N, K, 2) matching boxes, got {kp2d.shape}"
                )
            vis = (
                np.ones(kp2d.shape[:2], np.float32)
                if vis is None
                else np.asarray(vis, np.float32)
            )
            dev_frame = jnp.asarray(self._frame_to_device_dtype(frame))
            out = run_person_chunks_multi(
                (boxes, kp2d, vis),
                self.buckets[-1],
                lambda b, k, v: self._refined_chunk(
                    dev_frame, b, k, v, refine_steps
                ),
            )
            return self._to_results(out, boxes, fields)
        return self._to_results(self._run(frame, boxes), boxes, fields)

    def recover_batch(
        self,
        frames: Sequence[np.ndarray],
        boxes_list: Sequence[np.ndarray],
        fields=_ALL_FIELDS,
    ) -> list[list[PersonResult]]:
        """Video-style API: list of frames, per-frame boxes."""
        return [self.recover(f, b, fields=fields) for f, b in zip(frames, boxes_list)]

    def recover_clip(
        self, frames: Sequence[np.ndarray], boxes_list: Sequence, fields=_ALL_FIELDS
    ) -> list[list[PersonResult]]:
        """Batched clip recovery: ALL frames' crops in one device program.

        For detector-fed streams (boxes known up front) this amortizes the
        per-call dispatch over the clip — on remote/tunneled hosts the
        dominant serving cost at small N. Frames must share one (H, W);
        person counts may vary per frame (padded to the max's bucket,
        frame count padded to a clip bucket). On a mesh session the clip
        program runs with replicated inputs (XLA still shards the big
        batched matmuls); use `recover` for explicit person-axis DP.
        """
        F = len(frames)
        if F == 0:
            return []
        if len(boxes_list) != F:
            raise ValueError(f"{F} frames but {len(boxes_list)} box lists")
        boxes_np = [
            np.atleast_2d(np.asarray(b, np.float32)).reshape(-1, 3)
            for b in boxes_list
        ]
        # Crowds beyond the largest person bucket: chunk the person axis and
        # merge per frame (same discipline as `recover`, kept clip-batched).
        pcap = self.buckets[-1]
        if max(len(b) for b in boxes_np) > pcap:
            merged: list[list[PersonResult]] = [[] for _ in range(F)]
            for pstart in range(0, max(len(b) for b in boxes_np), pcap):
                part = self.recover_clip(
                    frames,
                    [b[pstart : pstart + pcap] for b in boxes_np],
                    fields=fields,
                )
                for fi in range(F):
                    merged[fi].extend(part[fi])
            return merged
        frames = np.stack([self._frame_to_device_dtype(f) for f in frames])
        counts = [len(b) for b in boxes_np]
        H, W = frames.shape[1:3]
        full = np.asarray([[W / 2, H / 2, max(H, W)]], np.float32)
        # Per-frame pad to the shared person bucket (empty frames run one
        # dummy full-frame box; its result is masked out by count=0).
        n_max = max(max(counts), 1)
        padded = [
            pad_people(
                {"boxes": b if len(b) else full}, max(len(b), 1),
                (bucket_size(n_max, self.buckets),),
            )[0]["boxes"]
            for b in boxes_np
        ]
        boxes_arr = np.stack(padded)  # (F, Nb, 3)

        results: list[list[PersonResult]] = []
        cap = self.clip_buckets[-1]
        for start in range(0, F, cap):
            chunk = slice(start, min(start + cap, F))
            f_chunk, b_chunk = frames[chunk], boxes_arr[chunk]
            fb = bucket_size(len(f_chunk), self.clip_buckets)
            if fb > len(f_chunk):  # pad frames by replicating the first
                reps = fb - len(f_chunk)
                f_chunk = np.concatenate([f_chunk, np.repeat(f_chunk[:1], reps, 0)])
                b_chunk = np.concatenate([b_chunk, np.repeat(b_chunk[:1], reps, 0)])
            out = self._recover_clip(
                self.variables,
                self.smpl_params,
                jnp.asarray(f_chunk),
                jnp.asarray(b_chunk[:, :, :2]),
                jnp.asarray(b_chunk[:, :, 2]),
            )
            host = jax.device_get({k: getattr(out, k) for k in fields})
            blank = {k: None for k in self._ALL_FIELDS}
            for fi in range(chunk.stop - chunk.start):
                n = counts[start + fi]
                results.append(
                    [
                        PersonResult(
                            **{**blank, **{k: v[fi, i] for k, v in host.items()}},
                            box=boxes_np[start + fi][i],
                        )
                        for i in range(n)
                    ]
                )
        return results

    # -- extras ---------------------------------------------------------------

    def overlay(self, frame: np.ndarray, results: Sequence[PersonResult]) -> np.ndarray:
        from human_3d_reconstruction_tpu.viz import overlay_meshes

        return overlay_meshes(
            frame,
            [r.verts for r in results],
            self.faces,
            cams=[r.cam for r in results],
            centers=[r.box[:2] for r in results],
            scales=[float(r.box[2]) for r in results],
        )

    def num_compiled_buckets(self) -> int:
        """Upper bound on distinct compiled programs this session creates."""
        return len(self.buckets)
