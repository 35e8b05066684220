"""Native C++ IO runtime (native/phenaki_io.cpp via ctypes).

Covers: GIF encode -> decode round trip (palette quantization bound),
cross-decoding PIL-written GIFs, the parallel batch loader (threading +
frame-cast semantics), and the image transform against the Python reference.
"""

import numpy as np
import pytest
from PIL import Image

from phenaki_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native IO library unavailable"
)


def test_gif_roundtrip_native(tmp_path):
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (4, 24, 32, 3), np.uint8)
    path = str(tmp_path / "a.gif")
    native.gif_encode(path, frames, delay_ms=100)

    decoded = native.gif_decode(path)
    assert decoded.shape == frames.shape
    # fixed 6x7x6 palette: worst-case quantization error is half a cube step
    err = np.abs(decoded.astype(int) - frames.astype(int))
    assert err.max() <= 26


def test_native_decodes_pil_gifs(tmp_path):
    """The native decoder must agree byte-for-byte with PIL on PIL-written
    files (LZW, palettes, frame composition)."""
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 256, (3, 16, 16, 3), np.uint8)
    path = str(tmp_path / "pil.gif")
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:], duration=100, loop=0)

    native_dec = native.gif_decode(path)

    pil = Image.open(path)
    pil_frames = []
    i = 0
    while True:
        try:
            pil.seek(i)
        except EOFError:
            break
        pil_frames.append(np.asarray(pil.convert("RGB"), np.uint8))
        i += 1
    pil_dec = np.stack(pil_frames)

    np.testing.assert_array_equal(native_dec, pil_dec)


def test_pil_decodes_native_gifs(tmp_path):
    """Interop the other way: PIL must be able to read our encoder's output."""
    rng = np.random.RandomState(2)
    frames = rng.randint(0, 256, (3, 16, 16, 3), np.uint8)
    path = str(tmp_path / "native.gif")
    native.gif_encode(path, frames, delay_ms=100)

    pil = Image.open(path)
    count = 0
    while True:
        try:
            pil.seek(count)
        except EOFError:
            break
        count += 1
    assert count == 3
    assert pil.size == (16, 16)


def test_load_gif_batch_parallel(tmp_path):
    rng = np.random.RandomState(3)
    paths = []
    for i in range(6):
        frames = rng.randint(0, 256, (5, 20, 20, 3), np.uint8)
        p = str(tmp_path / f"{i}.gif")
        native.gif_encode(p, frames)
        paths.append(p)

    batch = native.load_gif_batch(
        paths, num_frames=8, height=16, width=16, num_threads=4
    )
    assert batch.shape == (6, 8, 16, 16, 3)
    assert batch.dtype == np.float32
    # frames 0-4 decoded, 5-7 zero padding (cast_num_frames semantics)
    assert batch[:, :5].max() > 0.1
    np.testing.assert_array_equal(batch[:, 5:], 0.0)
    assert batch.min() >= 0.0 and batch.max() <= 1.0

    # batch loading must equal per-item loading (thread safety / determinism)
    single = np.stack(
        [
            native.load_gif_batch([p], num_frames=8, height=16, width=16)[0]
            for p in paths
        ]
    )
    np.testing.assert_array_equal(batch, single)


def test_load_gif_batch_missing_file_zeros(tmp_path):
    frames = np.full((2, 8, 8, 3), 200, np.uint8)
    good = str(tmp_path / "ok.gif")
    native.gif_encode(good, frames)
    batch = native.load_gif_batch(
        [good, str(tmp_path / "missing.gif")], num_frames=2, height=8, width=8
    )
    assert batch[0].max() > 0.5
    np.testing.assert_array_equal(batch[1], 0.0)


def test_transform_image_matches_python_semantics():
    """Short-side resize + center crop: identity when sizes already match."""
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (16, 16, 3), np.uint8)
    out = native.transform_image(img, height=16, width=16)
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-6)

    # hflip flips the width axis
    flipped = native.transform_image(img, height=16, width=16, hflip=True)
    np.testing.assert_allclose(flipped, out[:, ::-1], atol=1e-6)

    # downscale keeps shape contract and value range
    small = native.transform_image(img, height=8, width=8)
    assert small.shape == (8, 8, 3)
    assert 0.0 <= small.min() and small.max() <= 1.0


def test_video_dataset_uses_native_path(tmp_path):
    from phenaki_tpu.data.datasets import VideoDataset

    rng = np.random.RandomState(5)
    for i in range(3):
        frames = rng.randint(0, 256, (4, 16, 16, 3), np.uint8)
        native.gif_encode(str(tmp_path / f"{i}.gif"), frames)

    ds = VideoDataset(str(tmp_path), image_size=16, num_frames=6)
    item = ds[0]
    assert item.shape == (6, 16, 16, 3)
    assert item.dtype == np.float32
    np.testing.assert_array_equal(item[4:], 0.0)  # padded frames


def _pack_lzw_codes(codes, code_size_start):
    """Bit-pack LZW codes with GIF's variable width growth."""
    out = bytearray()
    bits = 0
    nbits = 0
    code_size = code_size_start
    count_since_growth = 0
    for c, width in codes:
        bits |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(bits & 0xFF)
            bits >>= 8
            nbits -= 8
    if nbits:
        out.append(bits & 0xFF)
    return bytes(out)


def test_gce_state_resets_between_frames(tmp_path):
    """GIF89a: a Graphic Control Extension applies only to the image that
    immediately follows. A frame WITHOUT its own GCE must not inherit the
    previous frame's transparency index (regression: stale GCE state left
    later frames' pixels un-drawn)."""
    # 2x2 screen, 4-entry palette: 0=black 1=white; frame0 = all black with
    # GCE transparency index 1; frame1 = all white, NO GCE.
    def lzw_all(code):
        # min code size 2: clear=4, eoi=5; width starts at 3 bits and grows
        # to 4 after the dictionary passes code 7 (i.e. from the 4th pixel)
        codes = [(4, 3), (code, 3), (code, 3), (code, 3), (code, 4), (5, 4)]
        return _pack_lzw_codes(codes, 3)

    def image_block(code):
        data = lzw_all(code)
        return (
            b"\x2c" + b"\x00\x00\x00\x00" + b"\x02\x00\x02\x00" + b"\x00"
            + b"\x02" + bytes([len(data)]) + data + b"\x00"
        )

    gif = bytearray()
    gif += b"GIF89a"
    gif += b"\x02\x00\x02\x00"  # 2x2
    gif += b"\x91\x00\x00"  # GCT present, 4 entries
    gif += bytes([0, 0, 0, 255, 255, 255, 255, 0, 0, 0, 0, 255])  # palette
    # GCE with transparency on index 1, applies to frame 0 only
    gif += b"\x21\xf9\x04\x01\x0a\x00\x01\x00"
    gif += image_block(0)  # frame 0: all black
    gif += image_block(1)  # frame 1: all white (== old transparent index!)
    gif += b"\x3b"

    p = str(tmp_path / "gce.gif")
    open(p, "wb").write(bytes(gif))

    frames = native.gif_decode(p)
    assert frames.shape[0] == 2
    # frame 1 must be WHITE everywhere — with stale GCE state its pixels
    # would be skipped as transparent, leaving frame 0's black
    np.testing.assert_array_equal(frames[1], 255)

    # cross-check against PIL
    pil = Image.open(p)
    pil.seek(1)
    np.testing.assert_array_equal(
        np.asarray(pil.convert("RGB")), frames[1]
    )


def test_gif_gray_palette_entries_used(tmp_path):
    """Neutral pixels must snap to the 4 gray palette entries, not the coarse
    color cube: a uniform (96,96,96) frame round-trips exactly (the nearest
    cube cell would be (102,85,102) — max error 17)."""
    frames = np.full((2, 16, 16, 3), 96, np.uint8)
    path = str(tmp_path / "gray.gif")
    native.gif_encode(path, frames, delay_ms=100)
    decoded = native.gif_decode(path)
    np.testing.assert_array_equal(decoded, frames)
