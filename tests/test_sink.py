"""Native async-sink tests (C++ background .npy writer with numpy fallback)."""

import os

import numpy as np
import pytest

from marlpde_tpu.utils.async_sink import AsyncSink


class TestAsyncSink:
    def test_roundtrip_dtypes(self, tmp_path, rng):
        s = AsyncSink(str(tmp_path))
        arrays = {
            "f32": rng.standard_normal((3, 4, 5)).astype(np.float32),
            "f64": rng.standard_normal((7,)).astype(np.float64),
            "i32": rng.integers(-100, 100, (2, 2)).astype(np.int32),
            "i64": rng.integers(-100, 100, (6,)).astype(np.int64),
        }
        for name, a in arrays.items():
            s.write(name, a)
        s.flush()
        for name, a in arrays.items():
            back = np.load(tmp_path / f"{name}.npy")
            np.testing.assert_array_equal(back, a)
            assert back.dtype == a.dtype
        s.close()

    def test_many_writes_drain(self, tmp_path, rng):
        s = AsyncSink(str(tmp_path))
        for i in range(50):
            s.write(f"chunk_{i}", rng.standard_normal(256).astype(np.float32))
        s.flush()
        assert s.pending() == 0
        assert len(list(tmp_path.glob("chunk_*.npy"))) == 50
        s.close()

    def test_unsupported_dtype_casts(self, tmp_path):
        s = AsyncSink(str(tmp_path))
        s.write("halfish", np.arange(4, dtype=np.float16))
        s.flush()
        back = np.load(tmp_path / "halfish.npy")
        assert back.dtype == np.float32
        s.close()
