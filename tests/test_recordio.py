"""Native record-IO tests: roundtrip, corruption detection, dataset adapter."""

import numpy as np
import pytest

from human_3d_reconstruction_tpu.data.datasets import MixedLoader, SyntheticImageDataset
from human_3d_reconstruction_tpu.data.recordio import (
    PackedDataset,
    RecordReader,
    RecordWriter,
    pack_dataset,
)


class TestRecordIO:
    def test_roundtrip(self, tmp_path):
        path = tmp_path / "x.rec"
        payloads = [b"hello", b"", b"\x00" * 1000, bytes(range(256)) * 10]
        with RecordWriter(path) as w:
            for p in payloads:
                w.write(p)
        with RecordReader(path) as r:
            assert len(r) == len(payloads)
            for i, p in enumerate(payloads):
                assert r[i] == p

    def test_crc_detects_corruption(self, tmp_path):
        path = tmp_path / "x.rec"
        with RecordWriter(path) as w:
            w.write(b"A" * 500)
        raw = bytearray(path.read_bytes())
        raw[-10] ^= 0xFF  # flip a payload byte
        path.write_bytes(bytes(raw))
        with RecordReader(path) as r:
            with pytest.raises(IOError, match="CRC"):
                r[0]

    def test_truncated_tail_ignored(self, tmp_path):
        path = tmp_path / "x.rec"
        with RecordWriter(path) as w:
            w.write(b"one")
            w.write(b"two")
        raw = path.read_bytes()
        path.write_bytes(raw[:-2])  # truncate mid-record
        with RecordReader(path) as r:
            assert len(r) == 1
            assert r[0] == b"one"

    def test_bad_magic_rejected(self, tmp_path):
        path = tmp_path / "bad.rec"
        path.write_bytes(b"NOTMAGIC" + b"\x00" * 100)
        with pytest.raises(OSError):
            RecordReader(path)

    def test_out_of_range_index(self, tmp_path):
        path = tmp_path / "x.rec"
        with RecordWriter(path) as w:
            w.write(b"x")
        with RecordReader(path) as r:
            with pytest.raises(IndexError):
                r[5]


class TestPackedDataset:
    def test_pack_and_reload_matches(self, tmp_path, smpl_model):
        ds = SyntheticImageDataset(smpl_model, n=4, frame_hw=(64, 64), seed=0)
        n = pack_dataset(ds, tmp_path / "ds.rec")
        assert n == 4
        packed = PackedDataset(tmp_path / "ds.rec")
        assert len(packed) == 4
        for i in range(4):
            a, b = ds[i], packed[i]
            # Pixels quantize to uint8 at pack time (4x smaller records);
            # annotations roundtrip exactly.
            assert b.image.dtype == np.float32
            np.testing.assert_allclose(a.image, b.image, atol=0.5)
            np.testing.assert_array_equal(a.theta, b.theta)
            np.testing.assert_array_equal(a.kp2d, b.kp2d)
            assert float(a.has_smpl) == float(b.has_smpl)

    def test_feeds_mixed_loader(self, tmp_path, smpl_model):
        ds = SyntheticImageDataset(smpl_model, n=4, frame_hw=(64, 64), seed=0)
        pack_dataset(ds, tmp_path / "ds.rec")
        packed = PackedDataset(tmp_path / "ds.rec")
        batch = next(iter(MixedLoader([packed], batch_size=3, seed=0)))
        assert batch.images.shape[0] == 3
        assert batch.theta.shape == (3, 72)
