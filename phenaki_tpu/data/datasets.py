"""Datasets + loader (reference data.py:48-265).

Numpy-native, host-side. The DataLoader is a minimal threaded prefetching
loader with the reference's string-aware collation (tensors stack, caption
strings stay lists) and an infinite-cycle iterator for trainers. Batches come
out channels-last ((b, f, H, W, c) / (b, H, W, c)) ready for device_put /
shard_batch.
"""

from __future__ import annotations

import queue
import random
import threading
from functools import partial
from pathlib import Path
from typing import Any, Callable, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from phenaki_tpu.data.codecs import gif_to_tensor, video_to_tensor


def identity(t, *args, **kwargs):
    return t


def pair(val):
    return val if isinstance(val, tuple) else (val, val)


def cast_num_frames(t: np.ndarray, *, frames: int) -> np.ndarray:
    """Pad (with zeros) or truncate (frames, H, W, c) to a fixed frame count
    (reference data.py:30-39)."""
    f = t.shape[0]
    if f == frames:
        return t
    if f > frames:
        return t[:frames]
    pad = np.zeros((frames - f, *t.shape[1:]), t.dtype)
    return np.concatenate([t, pad], axis=0)


def _resize_min_side(img: Image.Image, size: Tuple[int, int]) -> Image.Image:
    """torchvision T.Resize(int) semantics: scale so the SHORT side == size."""
    th, tw = size
    w, h = img.size
    scale = max(th / h, tw / w)
    return img.resize((max(int(round(w * scale)), tw), max(int(round(h * scale)), th)))


def _center_crop(img: Image.Image, size: Tuple[int, int]) -> Image.Image:
    th, tw = size
    w, h = img.size
    left = (w - tw) // 2
    top = (h - th) // 2
    return img.crop((left, top, left + tw, top + th))


class _ImageTransform:
    """Resize -> (random hflip) -> CenterCrop -> float array
    (reference ImageDataset transform, data.py:62-68)."""

    def __init__(self, image_size, horizontal_flip=False):
        self.size = pair(image_size)
        self.horizontal_flip = horizontal_flip

    def __call__(self, img: Image.Image) -> Image.Image:
        img = _resize_min_side(img, self.size)
        if self.horizontal_flip and random.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        return _center_crop(img, self.size)


class ImageDataset:
    """Recursive jpg/jpeg/png glob -> (H, W, 3) float32 arrays
    (reference data.py:48-76)."""

    def __init__(
        self,
        folder: str,
        image_size,
        exts: Sequence[str] = ("jpg", "jpeg", "png"),
        horizontal_flip: bool = True,
    ):
        self.folder = folder
        self.image_size = pair(image_size)
        self.paths = sorted(
            p for ext in exts for p in Path(folder).glob(f"**/*.{ext}")
        )
        print(f"{len(self.paths)} training samples found at {folder}")
        self.transform = _ImageTransform(image_size, horizontal_flip=horizontal_flip)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index) -> np.ndarray:
        img = Image.open(self.paths[index])
        if img.mode != "RGB":
            img = img.convert("RGB")
        img = self.transform(img)
        return np.asarray(img, np.float32) / 255.0


class VideoDataset:
    """Recursive gif/mp4 glob -> (frames, H, W, c) float32 arrays
    (reference data.py:196-241)."""

    def __init__(
        self,
        folder: str,
        image_size,
        channels: int = 3,
        num_frames: int = 17,
        horizontal_flip: bool = False,
        force_num_frames: bool = True,
        exts: Sequence[str] = ("gif", "mp4"),
    ):
        self.folder = folder
        self.image_size = pair(image_size)
        self.channels = channels
        self.num_frames = num_frames
        self.force_num_frames = force_num_frames
        self.horizontal_flip = horizontal_flip
        self.paths = sorted(
            p for ext in exts for p in Path(folder).glob(f"**/*.{ext}")
        )
        self.transform = _ImageTransform(image_size, horizontal_flip=horizontal_flip)
        self.gif_to_tensor = partial(
            gif_to_tensor, channels=channels, transform=self.transform
        )
        self.mp4_to_tensor = partial(video_to_tensor, crop_size=self.image_size)
        self.cast_num_frames_fn = (
            partial(cast_num_frames, frames=num_frames)
            if force_num_frames
            else identity
        )

    def _native_fast_path(self) -> bool:
        from phenaki_tpu.data import native

        return self.channels == 3 and self.force_num_frames and native.available()

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index) -> np.ndarray:
        path = self.paths[index]
        ext = path.suffix
        if ext == ".gif":
            if self._native_fast_path():
                # C++ codec: decode + resize + crop + flip + frame-cast in one
                # pass (native/phenaki_io.cpp), no PIL round trips
                from phenaki_tpu.data import native

                flip = np.asarray(
                    [self.horizontal_flip and random.random() < 0.5], np.uint8
                )
                return native.load_gif_batch(
                    [str(path)],
                    num_frames=self.num_frames,
                    height=self.image_size[0],
                    width=self.image_size[1],
                    hflip=flip,
                )[0]
            video = self.gif_to_tensor(str(path))
        elif ext == ".mp4":
            video = self.mp4_to_tensor(str(path))
        else:
            raise ValueError(f"unknown extension {ext}")
        return self.cast_num_frames_fn(video)


def collate_tensors_and_strings(data: List[Any]):
    """Stack array fields, keep string fields as lists
    (reference data.py:245-262)."""
    if isinstance(data[0], np.ndarray):
        return (np.stack(data, axis=0),)

    output = []
    for field in zip(*data):
        if isinstance(field[0], np.ndarray):
            output.append(np.stack(field, axis=0))
        elif isinstance(field[0], str):
            output.append(list(field))
        else:
            raise ValueError("detected invalid type being passed from dataset")
    return tuple(output)


class DataLoader:
    """Shuffling, batching, background-prefetching loader with string-aware
    collation (reference data.py:264-265 wraps torch's; this is a small
    host-side loader feeding device transfers asynchronously)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        prefetch: int = 2,
        seed: int = 0,
        collate_fn: Callable = collate_tensors_and_strings,
        post_collate: Optional[Callable] = None,
        num_workers: int = 4,
        num_shards: int = 1,
        shard_id: int = 0,
    ):
        assert len(dataset) > 0, "dataset is empty"
        assert 0 <= shard_id < num_shards
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.collate_fn = collate_fn
        # runs in the prefetch thread AFTER collation — trainers use it to
        # cast pixel batches to the device compute dtype off the critical path
        self.post_collate = post_collate
        # threads fetching dataset items WITHIN a batch (decode is IO/numpy
        # bound and releases the GIL; the native GIF loader also threads
        # internally per file)
        self.num_workers = max(1, num_workers)
        # multi-host data sharding: every process shuffles the SAME permutation
        # (seeded rng) and takes a disjoint interleaved slice, so `batch_size`
        # here is the PER-PROCESS batch (reference parity: Accelerate's
        # split_batches, phenaki_trainer.py:198,214)
        self.num_shards = num_shards
        self.shard_id = shard_id
        self._rng = random.Random(seed)

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self):
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            self._rng.shuffle(idx)
        if self.num_shards > 1:
            # drop the ragged tail so every shard sees the same batch count
            usable = (len(idx) // self.num_shards) * self.num_shards
            idx = idx[self.shard_id : usable : self.num_shards]
        return idx

    def __iter__(self):
        idx = self._epoch_indices()
        batches = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()  # set when the consumer abandons the iterator

        pool = None
        if self.num_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=self.num_workers)

        def fetch(idx_list):
            if pool is None:
                return [self.dataset[i] for i in idx_list]
            return list(pool.map(self.dataset.__getitem__, idx_list))

        def put(item) -> bool:
            # bounded put that aborts if the consumer went away — otherwise an
            # abandoned iterator leaves the worker blocked on a full queue and
            # the thread pool alive forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in batches:
                    if stop.is_set():
                        break
                    out = self.collate_fn(fetch(b))
                    if self.post_collate is not None:
                        out = self.post_collate(out)
                    if not put(out):
                        break
            finally:
                put(sentinel)
                if pool is not None:
                    pool.shutdown(wait=False)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            # runs on generator close/GC as well as normal exhaustion
            stop.set()


def cycle(dl):
    """Infinite iterator over a DataLoader (reference cvivit_trainer.py:36-39)."""
    while True:
        for data in dl:
            yield data


def random_split(dataset, valid_frac: float, seed: int = 42):
    """Deterministic train/valid split (reference cvivit_trainer.py:124-131)."""
    n = len(dataset)
    valid_size = int(valid_frac * n)
    train_size = n - valid_size
    rng = random.Random(seed)
    indices = list(range(n))
    rng.shuffle(indices)
    return (
        _Subset(dataset, indices[:train_size]),
        _Subset(dataset, indices[train_size:]),
    )


class _Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = indices

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]
