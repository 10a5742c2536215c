"""Host input-pipeline benchmark: images/sec decoded + collated.

The chip consumes ~10k img/s at inference and ~hundreds during training;
the host loader must keep up with the TRAINING consumption rate or the
step becomes host-bound (SURVEY.md §3.1 hot-loop boundary). This measures
MixedLoader throughput on this host for:

  - file-backed npz-index datasets (cv2 JPEG decode per record)
  - the packed recordio fast path (mmap, pre-decoded float payloads)

at several worker counts. Emits one JSON line per configuration.

Usage: python benchmarks/bench_host_loader.py [--n-images 256] [--batches 20]
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_file_dataset(root: Path, n: int, hw=(480, 640)) -> Path:
    import cv2

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        p = f"img{i:04d}.jpg"
        cv2.imwrite(str(root / p), rng.integers(0, 255, (*hw, 3)).astype(np.uint8))
        paths.append(p)
    idx = root / "index.npz"
    np.savez(
        idx,
        image_paths=np.asarray(paths),
        centers=np.tile([[hw[1] / 2, hw[0] / 2]], (n, 1)).astype(np.float32),
        scales=np.full((n,), min(hw) * 0.8, np.float32),
        keypoints=rng.normal(size=(n, 14, 3)).astype(np.float32),
    )
    return idx


def make_packed_dataset(root: Path, n: int, hw=(480, 640)) -> Path:
    from human_3d_reconstruction_tpu.data.datasets import Record
    from human_3d_reconstruction_tpu.data.recordio import pack_dataset

    rng = np.random.default_rng(0)

    class _Tiny:
        def __len__(self):
            return n

        def __getitem__(self, i):
            return Record(
                image=rng.uniform(0, 255, (*hw, 3)).astype(np.float32),
                center=np.asarray([hw[1] / 2, hw[0] / 2], np.float32),
                scale=np.float32(min(hw) * 0.8),
                kp2d=rng.normal(size=(14, 3)).astype(np.float32),
                joints3d=np.zeros((14, 3), np.float32),
                has_3d=np.float32(0.0),
                theta=np.zeros(72, np.float32),
                beta=np.zeros(10, np.float32),
                has_smpl=np.float32(0.0),
            )

    path = root / "train.rio"
    pack_dataset(_Tiny(), path)
    return path


def measure(loader, batch_size: int, batches: int, warmup: int = 3) -> float:
    it = iter(loader)
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    for _ in itertools.islice(it, batches):
        pass
    dt = time.perf_counter() - t0
    return batch_size * batches / dt


def main() -> None:
    from human_3d_reconstruction_tpu.data.datasets import MixedLoader, make_dataset

    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=192)
    ap.add_argument("--batches", type=int, default=15)
    ap.add_argument("--batch-size", type=int, default=128)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        idx = make_file_dataset(root, args.n_images)
        rio = make_packed_dataset(root, args.n_images)
        sources = {
            "files_jpeg": make_dataset("lsp", idx),
            "packed_recordio": make_dataset("packed", rio),
        }
        for name, ds in sources.items():
            for workers in (0, 4, 8):
                loader = MixedLoader(
                    [ds], args.batch_size, seed=0, num_workers=workers
                )
                ips = measure(loader, args.batch_size, args.batches)
                print(
                    json.dumps(
                        {
                            "metric": "host_loader_img_per_s",
                            "source": name,
                            "num_workers": workers,
                            "batch_size": args.batch_size,
                            "value": round(ips, 1),
                        }
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
