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


def _record_to_bytes(rec: Record) -> bytes:
    bio = io.BytesIO()
    np.savez(bio, **{f: np.asarray(getattr(rec, f)) for f in _FIELDS})
    return bio.getvalue()


def _record_from_bytes(blob: bytes) -> Record:
    z = np.load(io.BytesIO(blob))
    return Record(**{f: z[f] for f in _FIELDS})


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
