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

    # torchvision: only constructors/transform shells are touched at import
    tv = _mod("torchvision", pkg=True)
    tvm = _mod("torchvision.models")
    tv.models = tvm
    tvm.vgg16 = lambda **kw: None
    tvt = _mod("torchvision.transforms")
    tv.transforms = tvt
    for n in [
        "Compose", "Resize", "RandomHorizontalFlip", "CenterCrop",
        "ToTensor", "Lambda",
    ]:
        setattr(
            tvt,
            n,
            type(
                n,
                (),
                {
                    "__init__": lambda self, *a, **k: None,
                    "__call__": lambda self, x: x,
                },
            ),
        )
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
