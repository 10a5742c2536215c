"""Packed-record dataset: native C++ mmap record file for training IO.

The production alternative to reading thousands of image files: records are
packed once (`pack_dataset` / cli.pack_records) and served by the C++
reader (native/recordio.cpp — mmap, CRC-checked, no per-item syscalls),
with payloads as self-describing npz blobs of the standard Record fields.
"""

from __future__ import annotations

import ctypes
import io
from pathlib import Path
from typing import Optional

import numpy as np

from human_3d_reconstruction_tpu.data.datasets import Record
from human_3d_reconstruction_tpu.utils.native_build import build_native

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "recordio.cpp"

_lib: Optional[ctypes.CDLL] = None


def _get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(build_native(_SRC)))
        lib.rio_writer_open.restype = ctypes.c_void_p
        lib.rio_writer_open.argtypes = [ctypes.c_char_p]
        lib.rio_write.restype = ctypes.c_long
        lib.rio_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long]
        lib.rio_writer_close.argtypes = [ctypes.c_void_p]
        lib.rio_reader_open.restype = ctypes.c_void_p
        lib.rio_reader_open.argtypes = [ctypes.c_char_p]
        lib.rio_num_records.restype = ctypes.c_long
        lib.rio_num_records.argtypes = [ctypes.c_void_p]
        lib.rio_record_size.restype = ctypes.c_long
        lib.rio_record_size.argtypes = [ctypes.c_void_p, ctypes.c_long]
        lib.rio_read.restype = ctypes.c_long
        lib.rio_read.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long
        ]
        lib.rio_reader_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class RecordWriter:
    def __init__(self, path: str | Path):
        self._lib = _get_lib()
        self._h = self._lib.rio_writer_open(str(path).encode())
        if not self._h:
            raise OSError(f"cannot open {path} for writing")

    def write(self, payload: bytes) -> None:
        n = self._lib.rio_write(self._h, payload, len(payload))
        if n != len(payload):
            raise OSError("record write failed")

    def close(self) -> None:
        if self._h:
            self._lib.rio_writer_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class RecordReader:
    """Random-access CRC-checked reader over the mmap'd record file."""

    def __init__(self, path: str | Path):
        self._lib = _get_lib()
        self._h = self._lib.rio_reader_open(str(path).encode())
        if not self._h:
            raise OSError(f"cannot open record file {path}")
        self._n = self._lib.rio_num_records(self._h)

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i: int) -> bytes:
        size = self._lib.rio_record_size(self._h, i)
        if size < 0:
            raise IndexError(i)
        buf = ctypes.create_string_buffer(size)
        got = self._lib.rio_read(self._h, i, buf, size)
        if got == -2:
            raise IOError(f"record {i}: CRC mismatch (corrupt file)")
        if got != size:
            raise IOError(f"record {i}: short read {got} != {size}")
        return buf.raw

    def close(self) -> None:
        if self._h:
            self._lib.rio_reader_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


_FIELDS = (
    "image", "center", "scale", "kp2d", "joints3d", "has_3d",
    "theta", "beta", "has_smpl",
)

# Raw fixed-layout payload (v1): header + uint8 image + one f32 annotation
# block. Parsing is two frombuffer calls (~memcpy speed) — measured ~an
# order of magnitude cheaper than npz-in-zip parsing per record, which
# dominated the packed loader. Legacy npz blobs (zip magic "PK") still read.
_RAW_MAGIC = b"HMR1"
# annotation block: center 2 + scale 1 + kp2d 42 + joints3d 42 + has_3d 1
#                 + theta 72 + beta 10 + has_smpl 1 = 171 f32
_ANN_SPLITS = np.cumsum([2, 1, 42, 42, 1, 72, 10])
_ANN_LEN = 171


def _record_to_bytes(rec: Record) -> bytes:
    import struct

    img = np.ascontiguousarray(rec.image)
    kp2d = np.asarray(rec.kp2d, np.float32)
    j3d = np.asarray(rec.joints3d, np.float32)
    if (
        img.ndim == 3 and img.shape[2] == 3
        and kp2d.shape == (14, 3) and j3d.shape == (14, 3)
    ):
        if img.dtype == np.float32:
            # Pixels are [0, 255]: store uint8 — 4x smaller records; the
            # loader throughput scales with record size on this host.
            img = np.clip(np.rint(img), 0, 255).astype(np.uint8)
        if img.dtype == np.uint8:
            ann = np.concatenate(
                [
                    np.asarray(rec.center, np.float32).ravel(),
                    np.float32(rec.scale).reshape(1),
                    kp2d.ravel(),
                    j3d.ravel(),
                    np.float32(rec.has_3d).reshape(1),
                    np.asarray(rec.theta, np.float32).ravel(),
                    np.asarray(rec.beta, np.float32).ravel(),
                    np.float32(rec.has_smpl).reshape(1),
                ]
            )
            header = struct.pack("<4sII", _RAW_MAGIC, img.shape[0], img.shape[1])
            return header + img.tobytes() + ann.astype(np.float32).tobytes()
    # Fallback for non-standard shapes: self-describing npz blob.
    bio = io.BytesIO()
    np.savez(bio, **{f: np.asarray(getattr(rec, f)) for f in _FIELDS})
    return bio.getvalue()


def _record_from_bytes(blob: bytes) -> Record:
    if blob[:4] == _RAW_MAGIC:
        import struct

        H, W = struct.unpack_from("<II", blob, 4)
        off = 12
        img = (
            np.frombuffer(blob, np.uint8, H * W * 3, off)
            .reshape(H, W, 3)
            .astype(np.float32)
        )
        ann = np.frombuffer(blob, np.float32, _ANN_LEN, off + H * W * 3)
        center, scale, kp2d, j3d, has_3d, theta, beta, has_smpl = np.split(
            ann, _ANN_SPLITS
        )
        return Record(
            image=img,
            center=center.copy(),
            scale=scale[0],
            kp2d=kp2d.reshape(14, 3).copy(),
            joints3d=j3d.reshape(14, 3).copy(),
            has_3d=has_3d[0],
            theta=theta.copy(),
            beta=beta.copy(),
            has_smpl=has_smpl[0],
        )
    z = np.load(io.BytesIO(blob))
    fields = {f: z[f] for f in _FIELDS}
    if fields["image"].dtype == np.uint8:  # quantized at pack time
        fields["image"] = fields["image"].astype(np.float32)
    return Record(**fields)


def pack_dataset(dataset, path: str | Path, limit: Optional[int] = None) -> int:
    """Serialize any Record-yielding dataset into one packed file."""
    n = len(dataset) if limit is None else min(limit, len(dataset))
    with RecordWriter(path) as w:
        for i in range(n):
            w.write(_record_to_bytes(dataset[i]))
    return n


class PackedDataset:
    """Dataset adapter over a packed record file (drop-in for MixedLoader)."""

    name = "packed"

    def __init__(self, path: str | Path):
        self.reader = RecordReader(path)

    def __len__(self) -> int:
        return len(self.reader)

    def __getitem__(self, i: int) -> Record:
        return _record_from_bytes(self.reader[i])
