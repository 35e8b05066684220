"""VGG16 torch-state-dict converter (models/vgg.py::load_torch_state_dict):
output parity against a torch model built with torchvision's exact module
layout (features.N / classifier.N naming) and random weights — catches kernel
transposition or layer-ordering bugs that would otherwise pass silently
(reference loads torchvision.vgg16(pretrained=True), cvivit.py:345-351)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phenaki_tpu.models.vgg import VGG16_PLAN, VGG16Features, load_torch_state_dict

torch = pytest.importorskip("torch")


def build_torchvision_like_vgg16():
    """torchvision.models.vgg16 module layout (same state-dict keys), random
    weights; classifier truncated like the reference (last two layers
    stripped -> output is relu(fc2), cvivit.py:350-351)."""
    import torch.nn as nn

    layers = []
    in_c = 3
    for spec in VGG16_PLAN:
        if spec == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_c, spec, 3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            in_c = spec

    class TorchVGG16(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*layers)
            self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
            self.classifier = nn.Sequential(
                nn.Linear(512 * 7 * 7, 4096),
                nn.ReLU(True),
                nn.Dropout(),
                nn.Linear(4096, 4096),
                nn.ReLU(True),
                nn.Dropout(),
                nn.Linear(4096, 1000),
            )

        def forward(self, x):
            x = self.features(x)
            x = self.avgpool(x)
            x = torch.flatten(x, 1)
            # reference strips the last two classifier layers
            for layer in list(self.classifier.children())[:-2]:
                x = layer(x)
            return x

    torch.manual_seed(0)
    model = TorchVGG16()
    model.eval()
    return model


def test_torch_state_dict_conversion_output_parity():
    model = build_torchvision_like_vgg16()
    sd = model.state_dict()
    # sanity: the synthetic dict uses torchvision's key names
    assert "features.0.weight" in sd and "classifier.3.weight" in sd

    variables = load_torch_state_dict(sd)

    # 224x224 -> exactly 7x7 after the 5 pools, so the adaptive pool is the
    # identity on both sides (torch repeats / jax resizes differently on
    # smaller inputs — that path is loss-only, not weight-conversion)
    x = np.random.RandomState(0).rand(2, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    out = VGG16Features().apply(variables, jnp.asarray(x))
    assert out.shape == ref.shape == (2, 4096)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


def test_converted_params_match_init_tree():
    """The converted tree must be loadable wherever init_vgg params go: same
    structure and shapes as a fresh init."""
    from phenaki_tpu.models.vgg import init_vgg

    model = build_torchvision_like_vgg16()
    converted = load_torch_state_dict(model.state_dict())
    _, fresh = init_vgg()

    conv_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    fresh_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(fresh)[0]
    }
    assert conv_paths == fresh_paths
