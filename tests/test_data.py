"""Data pipeline tests: codecs round-trips, datasets, loader collation
(reference data.py:48-265)."""

import numpy as np
import pytest
from PIL import Image

from phenaki_tpu.data.codecs import (
    crop_center,
    gif_to_tensor,
    tensor_to_video,
    video_tensor_to_gif,
    video_to_tensor,
)
from phenaki_tpu.data.datasets import (
    DataLoader,
    ImageDataset,
    VideoDataset,
    cast_num_frames,
    collate_tensors_and_strings,
    random_split,
)


def test_cast_num_frames():
    v = np.random.rand(5, 8, 8, 3).astype(np.float32)
    assert cast_num_frames(v, frames=5) is v
    assert cast_num_frames(v, frames=3).shape == (3, 8, 8, 3)
    padded = cast_num_frames(v, frames=7)
    assert padded.shape == (7, 8, 8, 3)
    assert np.all(padded[5:] == 0)


def test_gif_roundtrip(tmp_path):
    video = np.random.rand(4, 16, 16, 3).astype(np.float32)
    path = str(tmp_path / "test.gif")
    video_tensor_to_gif(video, path, optimize=False)
    loaded = gif_to_tensor(path)
    assert loaded.shape == (4, 16, 16, 3)
    # gif palette quantizes to 256 colors; allow loose tolerance
    assert np.abs(loaded - video).mean() < 0.12


def test_mp4_roundtrip(tmp_path):
    video = (np.random.rand(6, 32, 32, 3) > 0.5).astype(np.float32)
    path = str(tmp_path / "test.mp4")
    tensor_to_video(video, path)
    loaded = video_to_tensor(path)
    assert loaded.shape[0] == 6
    assert loaded.shape[-1] == 3
    loaded2 = video_to_tensor(path, num_frames=3)
    assert loaded2.shape[0] == 3


def test_crop_center():
    img = np.arange(8 * 8 * 3).reshape(8, 8, 3)
    out = crop_center(img, 4, 4)
    assert out.shape == (4, 4, 3)
    np.testing.assert_array_equal(out, img[2:6, 2:6])


@pytest.fixture
def image_folder(tmp_path):
    for i in range(6):
        arr = (np.random.rand(20, 24, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.png")
    return str(tmp_path)


def test_image_dataset(image_folder):
    ds = ImageDataset(image_folder, 16)
    assert len(ds) == 6
    img = ds[0]
    assert img.shape == (16, 16, 3)
    assert img.dtype == np.float32
    assert 0 <= img.min() and img.max() <= 1


@pytest.fixture
def video_folder(tmp_path):
    for i in range(4):
        video = np.random.rand(5, 20, 20, 3).astype(np.float32)
        video_tensor_to_gif(video, str(tmp_path / f"v_{i}.gif"), optimize=False)
    return str(tmp_path)


def test_video_dataset(video_folder):
    ds = VideoDataset(video_folder, 16, num_frames=7)
    assert len(ds) == 4
    v = ds[0]
    assert v.shape == (7, 16, 16, 3)  # padded 5 -> 7
    assert np.all(v[5:] == 0)


def test_collate_strings_and_tensors():
    data = [
        (np.zeros((3, 4, 4, 3), np.float32), "a cat"),
        (np.zeros((3, 4, 4, 3), np.float32), "a dog"),
    ]
    videos, texts = collate_tensors_and_strings(data)
    assert videos.shape == (2, 3, 4, 4, 3)
    assert texts == ["a cat", "a dog"]


def test_dataloader(image_folder):
    ds = ImageDataset(image_folder, 16)
    dl = DataLoader(ds, batch_size=2, shuffle=True)
    batches = list(dl)
    assert len(batches) == 3
    (batch,) = batches[0]
    assert batch.shape == (2, 16, 16, 3)


def test_random_split(image_folder):
    ds = ImageDataset(image_folder, 16)
    train, valid = random_split(ds, valid_frac=0.34, seed=0)
    assert len(train) == 4 and len(valid) == 2
    train2, valid2 = random_split(ds, valid_frac=0.34, seed=0)
    assert train.indices == train2.indices  # deterministic
