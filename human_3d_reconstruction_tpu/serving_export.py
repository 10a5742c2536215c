"""AOT-exported serving artifacts: a mesh-recovery deployment without model code.

The reference family deploys by shipping the Python model code plus a
checkpoint and re-building the graph at startup (SURVEY.md section 3.2).
The TPU-native equivalent is `jax.export`: trace + lower the full fused
recovery program (on-device preprocess + encoder + IEF + SMPL decode) ONCE,
serialize the StableHLO — with the weights and SMPL constants baked in as
program constants — and serve from the artifact alone:

    # build machine (has flax model code + checkpoint)
    export_recovery_artifact(session, "artifact_dir", frame_shape=(720, 1280))

    # serving machine (needs only this module + jax)
    srv = ExportedRecoverySession("artifact_dir")
    people = srv.recover(frame, boxes)

Properties:
- self-contained: no flax module construction, no checkpoint restore, no
  Python-side model code on the serving host;
- one artifact per person-count bucket (same bucketing discipline as the
  live session), padding/chunking handled by the loader;
- the frame height/width are pinned at export time (static shapes are what
  let XLA compile the single fused program); export several frame shapes if
  the deployment sees more than one camera geometry;
- version/platform metadata recorded; `jax.export` refuses incompatible
  replays instead of silently miscomputing.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from human_3d_reconstruction_tpu.utils.bucketing import pad_people

_META = "recovery_artifact.json"


def export_recovery_artifact(
    session,
    path: str,
    frame_shape: tuple[int, int] = (480, 640),
    buckets: Sequence[int] | None = None,
) -> Path:
    """Serialize a MeshRecoverySession's fused program for each bucket.

    `session`: a live `serving.MeshRecoverySession` (its optimize/quantize
    rewrites are already applied to the variables, so whatever the session
    serves is exactly what gets exported). `frame_shape`: (H, W) of the
    frames the deployment will feed.
    """
    out = Path(path)
    out.mkdir(parents=True, exist_ok=True)
    buckets = tuple(buckets) if buckets is not None else session.buckets
    H, W = frame_shape

    # Close weights + SMPL constants over the trace: they serialize as
    # program constants, making the artifact self-contained. Return a plain
    # dict so deserialization needs no custom pytree registrations.
    def serve_fn(frame, centers, scales):
        o = session._recover.__wrapped__(
            session.variables, session.smpl_params, frame, centers, scales
        )
        return {
            "theta": o.theta,
            "beta": o.beta,
            "cam": o.cam,
            "verts": o.verts,
            "joints3d": o.joints3d,
            "eval_joints3d": o.eval_joints3d,
            "joints2d": o.joints2d,
        }

    platform = jax.default_backend()
    # The fused SMPL decode is a Pallas kernel -> `tpu_custom_call`, which
    # is not on the stable-ABI allowlist; exporting it is safe here because
    # the artifact records the platform and jax.export replays it only on
    # a matching one.
    checks = [
        jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call"),
        jax_export.DisabledSafetyCheck.custom_call("Sharding"),
    ]
    for B in buckets:
        exp = jax_export.export(
            jax.jit(serve_fn), disabled_checks=checks
        )(
            jax.ShapeDtypeStruct((H, W, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, 2), jnp.float32),
            jax.ShapeDtypeStruct((B,), jnp.float32),
        )
        (out / f"bucket_{B:05d}.jaxexport").write_bytes(exp.serialize())

    np.save(out / "faces.npy", np.asarray(session.faces))
    (out / _META).write_text(
        json.dumps(
            {
                "format_version": 1,
                "buckets": list(buckets),
                "frame_shape": [H, W],
                "crop_size": session.crop_size,
                "platform": platform,
                "jax_version": jax.__version__,
            }
        )
    )
    return out


class ExportedRecoverySession:
    """Serve mesh recovery from an exported artifact directory.

    API-compatible subset of `serving.MeshRecoverySession`: `recover`
    returns the same per-person dicts of numpy arrays (theta/beta/cam/
    verts/joints3d/joints2d), `faces` carries the mesh topology. Frames
    must match the exported (H, W).
    """

    def __init__(self, path: str):
        p = Path(path)
        meta = json.loads((p / _META).read_text())
        if meta.get("format_version") != 1:
            raise ValueError(f"unknown artifact version: {meta.get('format_version')}")
        self.buckets = tuple(meta["buckets"])
        self.frame_shape = tuple(meta["frame_shape"])
        self.crop_size = meta["crop_size"]
        self.platform = meta["platform"]
        self.faces = np.load(p / "faces.npy")
        self._programs = {
            B: jax_export.deserialize(
                (p / f"bucket_{B:05d}.jaxexport").read_bytes()
            )
            for B in self.buckets
        }

    def _run_chunk(self, frame: jax.Array, boxes: np.ndarray) -> dict:
        N = len(boxes)
        padded, _ = pad_people(
            {"centers": boxes[:, :2], "scales": boxes[:, 2]}, N, self.buckets
        )
        B = padded["scales"].shape[0]
        out = self._programs[B].call(
            frame,
            jnp.asarray(padded["centers"]),
            jnp.asarray(padded["scales"]),
        )
        return jax.tree.map(lambda x: x[:N], out)

    def recover(self, frame: np.ndarray, boxes) -> list[dict]:
        """One frame (H, W, 3) in [0, 255] + boxes (N, 3) [cx, cy, scale]."""
        if tuple(frame.shape[:2]) != self.frame_shape:
            raise ValueError(
                f"frame shape {frame.shape[:2]} != exported {self.frame_shape}; "
                "export an artifact per camera geometry"
            )
        from human_3d_reconstruction_tpu.serving import run_person_chunks

        boxes = np.atleast_2d(np.asarray(boxes, np.float32)).reshape(-1, 3)
        if len(boxes) == 0:
            return []
        frame = jnp.asarray(frame, jnp.float32)
        out = run_person_chunks(
            boxes, self.buckets[-1], lambda b: self._run_chunk(frame, b)
        )
        host = jax.device_get(out)
        return [
            {k: v[i] for k, v in host.items()} | {"box": boxes[i]}
            for i in range(len(boxes))
        ]
