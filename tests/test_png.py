"""PNG slice-grid writer: decode the emitted file back and verify pixels
(reference logging uses torchvision save_image — trainer.py:112-126)."""

import struct
import zlib

import numpy as np

from gan3d_tpu.utils.png import make_slice_grid, save_volume_grid, write_png_gray


def decode_png_gray(path):
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", chunk[:10])
            assert (depth, color) == (8, 0)
        elif tag == b"IDAT":
            idat += chunk
        pos += 12 + length
    raw = zlib.decompress(idat)
    rows = []
    stride = w + 1
    for r in range(len(raw) // stride):
        assert raw[r * stride] == 0  # filter: none
        rows.append(np.frombuffer(raw[r * stride + 1 : (r + 1) * stride],
                                  np.uint8))
    return np.stack(rows)


def test_write_and_decode_roundtrip(tmp_path):
    img = (np.arange(20 * 30, dtype=np.uint8).reshape(20, 30) * 3) % 251
    p = str(tmp_path / "x.png")
    write_png_gray(p, img)
    np.testing.assert_array_equal(decode_png_gray(p), img)


def test_slice_grid_layout():
    vols = np.zeros((2, 4, 8, 8), np.float32)
    vols[0, 0, 0, 0] = 1.0  # max
    vols[1, 3] = -1.0       # min slice
    grid = make_slice_grid(vols, nrow=4, padding=2)
    # 8 slices -> 2 rows x 4 cols of 8x8 tiles with padding 2
    assert grid.shape == (2 * 10 + 2, 4 * 10 + 2)
    assert grid.max() == 255 and grid.dtype == np.uint8


def test_save_volume_grid(tmp_path):
    vols = np.random.default_rng(0).normal(size=(1, 4, 8, 8, 1))
    p = str(tmp_path / "g.png")
    save_volume_grid(p, vols)
    img = decode_png_gray(p)
    assert img.ndim == 2 and img.size > 0
