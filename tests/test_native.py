"""Native C++ blosc decoder vs the system libblosc ground truth."""

import ctypes
import ctypes.util
import json
import os

import numpy as np
import pytest

from vqa_project_tpu.data.native import (
    _load_native,
    _load_system,
    native_blosc_decompress,
    system_blosc_decompress,
)

pytestmark = pytest.mark.skipif(
    _load_system() is None, reason="no system libblosc to create fixtures")


def _compress(data: bytes, typesize: int, clevel: int = 5,
              shuffle: int = 1, cname: bytes = b"lz4") -> bytes:
    lib = _load_system()
    lib.blosc_compress_ctx.restype = ctypes.c_int
    out = ctypes.create_string_buffer(len(data) + 1024)
    rc = lib.blosc_compress_ctx(
        ctypes.c_int(clevel), ctypes.c_int(shuffle),
        ctypes.c_size_t(typesize), ctypes.c_size_t(len(data)),
        data, out, ctypes.c_size_t(len(out)),
        ctypes.c_char_p(cname), ctypes.c_size_t(0), ctypes.c_int(1))
    assert rc > 0, f"libblosc compress failed: {rc}"
    return out.raw[:rc]


def test_native_lib_builds():
    assert _load_native() is not None, "C++ decoder failed to build"


CASES = [
    # (shape, dtype, clevel, shuffle)
    ((36, 2048), np.float32, 5, 1),     # the real feature-store shape
    ((36, 4), np.float32, 5, 1),        # box arrays
    ((1000,), np.float32, 9, 1),
    ((17,), np.uint8, 5, 1),            # tiny, likely memcpyed
    ((513, 7), np.float64, 1, 1),       # odd sizes, 8-byte typesize
    ((4096,), np.int16, 5, 1),
    ((2048,), np.float32, 5, 0),        # no shuffle
    ((100000,), np.float32, 5, 1),      # multiple blocks
]


@pytest.mark.parametrize("shape,dtype,clevel,shuffle", CASES)
def test_roundtrip_matches_libblosc(rng, shape, dtype, clevel, shuffle):
    if np.issubdtype(dtype, np.floating):
        arr = rng.normal(size=shape).astype(dtype)
    else:
        arr = rng.integers(0, 100, size=shape).astype(dtype)
    raw = arr.tobytes()
    frame = _compress(raw, arr.dtype.itemsize, clevel, shuffle)

    via_system = system_blosc_decompress(frame, len(raw))
    assert via_system == raw  # sanity: the fixture itself round-trips

    via_native = native_blosc_decompress(frame, len(raw))
    assert via_native == raw


def test_zeros_compress_small_and_decode(rng):
    raw = np.zeros(50_000, np.float32).tobytes()
    frame = _compress(raw, 4)
    assert len(frame) < len(raw) // 100
    assert native_blosc_decompress(frame, len(raw)) == raw


def test_zlib_codec(rng):
    arr = rng.normal(size=(300, 64)).astype(np.float32)
    frame = _compress(arr.tobytes(), 4, cname=b"zlib")
    assert native_blosc_decompress(frame, arr.nbytes) == arr.tobytes()


def test_truncated_frame_rejected_not_overread(rng):
    """A frame whose per-split compressed sizes point past the end of the
    input must fail cleanly (no out-of-bounds read)."""
    arr = rng.normal(size=(36, 2048)).astype(np.float32)
    raw = arr.tobytes()
    frame = _compress(raw, 4)
    # cut the payload but keep the 16-byte header + block starts intact,
    # then lie about cbytes so the header-level check alone cannot save us
    cut = bytearray(frame[: len(frame) // 2])
    cut[12:16] = int(len(cut)).to_bytes(4, "little")  # cbytes = new length
    with pytest.raises(ValueError):
        native_blosc_decompress(bytes(cut), len(raw))


def test_zarr_store_reads_blosc_chunks(tmp_path, rng):
    """End-to-end: a blosc-compressed zarr array (as zarr-python would
    write it) is read back by our ZarrGroup via the native decoder."""
    from vqa_project_tpu.data import open_group

    arr = rng.normal(size=(36, 128)).astype(np.float32)
    frame = _compress(arr.tobytes(), 4)

    root = tmp_path / "g.zarr"
    apath = root / "x"
    apath.mkdir(parents=True)
    (root / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    meta = {
        "zarr_format": 2,
        "shape": [36, 128],
        "chunks": [36, 128],
        "dtype": "<f4",
        "compressor": {"id": "blosc", "cname": "lz4", "clevel": 5,
                       "shuffle": 1},
        "fill_value": 0, "filters": None, "order": "C",
    }
    (apath / ".zarray").write_text(json.dumps(meta))
    (apath / "0.0").write_bytes(frame)

    g = open_group(str(root))
    np.testing.assert_array_equal(np.asarray(g["x"]), arr)
