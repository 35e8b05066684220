"""Import the reference phenaki-pytorch package (/root/reference) with
no-op stubs for its unavailable dependencies (beartype, torchvision,
vector-quantize-pytorch, ema-pytorch).

Used ONLY by the numerical parity tests (tests/test_reference_parity.py):
converting random reference weights into phenaki_tpu param trees and
asserting the two implementations produce the same numbers is the
strongest possible check on both the converter (phenaki_tpu/convert.py)
and the reimplementation itself. The stubs are inert decorators/constructor
shims — every number in the parity tests comes from the reference's real
torch code.
"""

from __future__ import annotations

import importlib.machinery as _machinery
import sys
import types
import typing

_REFERENCE_PATH = "/root/reference"


def _mod(name: str, pkg: bool = False) -> types.ModuleType:
    m = types.ModuleType(name)
    m.__spec__ = _machinery.ModuleSpec(name, None, is_package=pkg)
    if pkg:
        m.__path__ = []
    sys.modules[name] = m
    return m


def install_reference_stubs() -> bool:
    """Install dependency stubs + reference path. Returns False if the
    reference checkout is unavailable (callers should skip)."""
    import os

    if not os.path.isdir(_REFERENCE_PATH):
        return False
    if "phenaki_pytorch" in sys.modules:
        return True

    # beartype: decorators become identity, validators become no-ops
    bt = _mod("beartype", pkg=True)
    bt.beartype = lambda fn=None, **kw: (
        fn if fn is not None else (lambda f: f)
    )
    btt = _mod("beartype.typing")
    for n in dir(typing):
        if not n.startswith("_"):
            setattr(btt, n, getattr(typing, n))
    bt.typing = btt
    btd = _mod("beartype.door")
    btd.is_bearable = lambda obj, hint: True
    btv = _mod("beartype.vale")

    class _Is:
        def __class_getitem__(cls, item):
            return cls

    btv.Is = _Is

    # torchvision: model constructors are shells, but the TRANSFORMS are
    # FUNCTIONAL (PIL + torch reimplementations of torchvision semantics) —
    # the GAN-parity harness (examples/quality_parity_gan.py) runs the
    # reference's own VideoDataset/gif_to_tensor data path through them
    # (reference data.py:118-124, 213-219)
    import torch as _torch

    tv = _mod("torchvision", pkg=True)
    tvm = _mod("torchvision.models")
    tv.models = tvm
    tvm.vgg16 = lambda **kw: None
    tvt = _mod("torchvision.transforms")
    tv.transforms = tvt

    class _Compose:
        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class _Resize:
        # torchvision: int size -> shorter side = size, keep aspect;
        # (h, w) -> exact
        def __init__(self, size, **kw):
            self.size = size

        def __call__(self, img):
            w, h = img.size
            if isinstance(self.size, (tuple, list)):
                th, tw = self.size
            elif w <= h:
                tw = self.size
                th = max(1, round(h * self.size / w))
            else:
                th = self.size
                tw = max(1, round(w * self.size / h))
            from PIL import Image as _Image

            return img.resize((tw, th), _Image.BILINEAR)

    class _CenterCrop:
        def __init__(self, size):
            self.size = (size, size) if isinstance(size, int) else tuple(size)

        def __call__(self, img):
            w, h = img.size
            th, tw = self.size
            left = int(round((w - tw) / 2))
            top = int(round((h - th) / 2))
            return img.crop((left, top, left + tw, top + th))

    class _ToTensor:
        def __init__(self, *a, **k):
            pass

        def __call__(self, img):
            import numpy as _np

            arr = _np.asarray(img, dtype=_np.uint8)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return (
                _torch.from_numpy(arr.transpose(2, 0, 1).copy()).float()
                / 255.0
            )

    class _RandomHorizontalFlip:
        def __init__(self, p=0.5):
            self.p = p

        def __call__(self, img):
            if float(_torch.rand(())) < self.p:
                from PIL import Image as _Image

                return img.transpose(_Image.FLIP_LEFT_RIGHT)
            return img

    class _Lambda:
        def __init__(self, fn):
            self.fn = fn

        def __call__(self, x):
            return self.fn(x)

    class _ToPILImage:
        def __init__(self, *a, **k):
            pass

        def __call__(self, t):
            import numpy as _np
            from PIL import Image as _Image

            arr = t.detach().cpu().clamp(0, 1).mul(255).byte().numpy()
            return _Image.fromarray(arr.transpose(1, 2, 0))

    tvt.Compose = _Compose
    tvt.Resize = _Resize
    tvt.CenterCrop = _CenterCrop
    tvt.ToTensor = _ToTensor
    tvt.RandomHorizontalFlip = _RandomHorizontalFlip
    tvt.Lambda = _Lambda
    tvt.ToPILImage = _ToPILImage
    tvu = _mod("torchvision.utils")
    tv.utils = tvu
    tvu.save_image = lambda *a, **k: None
    tvu.make_grid = lambda *a, **k: None
    tvd = _mod("torchvision.datasets")
    tv.datasets = tvd
    tvd.ImageFolder = object

    import torch.nn as nn

    # vector-quantize-pytorch: constructor-compatible stub; forward raises
    # (parity tests exercise encode/decode, which bypass the quantizer)
    vq = _mod("vector_quantize_pytorch")

    class _VQStub(nn.Module):
        def __init__(self, *a, **kw):
            super().__init__()
            self.codebook_size = kw.get("codebook_size")

        def forward(self, x, **kw):
            raise NotImplementedError("VQ stub — parity tests bypass the vq")

    vq.LFQ = _VQStub
    vq.VectorQuantize = _VQStub

    ema = _mod("ema_pytorch")

    class _EMA(nn.Module):
        def __init__(self, model, *a, **kw):
            super().__init__()
            self.ema_model = model

    ema.EMA = _EMA

    if _REFERENCE_PATH not in sys.path:
        sys.path.insert(0, _REFERENCE_PATH)
    return True
