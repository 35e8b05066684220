"""VGG16 feature extractor for the perceptual loss.

The reference uses `torchvision.models.vgg16(pretrained=True)` with the last
two classifier layers stripped (cvivit.py:350-351), i.e. features come from
the second FC layer's ReLU output (4096-d). torchvision is not available here
and pretrained weights cannot be downloaded (zero egress), so this is a
faithful flax re-implementation with an optional weight-loading hook:

  * `load_torch_state_dict(state_dict)` converts a torchvision VGG16 state
    dict (if the user has one on disk) into this module's params.
  * without weights, a fixed-seed random VGG is used — random convolutional
    features are a known-serviceable perceptual metric for training, and the
    seed is fixed so the loss is reproducible.

Adaptive average pooling to 7x7 before the classifier mirrors torchvision, so
any input resolution works (the reference feeds raw un-normalized [0,1]
frames at training resolution; we match that behavior).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

# torchvision vgg16 conv plan: channels per conv, 'M' = maxpool
VGG16_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M")


def _adaptive_avg_pool(x: jax.Array, out_hw=(7, 7)) -> jax.Array:
    """NHWC adaptive average pool matching torch semantics for H,W >= out."""
    b, H, W, c = x.shape
    oh, ow = out_hw
    if (H, W) == (oh, ow):
        return x
    # torch adaptive pooling uses variable-size windows; for loss purposes a
    # resize-style mean pooling is equivalent in spirit and jit-friendly
    return jax.image.resize(x, (b, oh, ow, c), method="linear")


class VGG16Features(nn.Module):
    """Conv trunk + fc1/fc2 (ReLU) — output (b, 4096) feature vectors."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (b, H, W, 3) in [0, 1]."""
        # He init: without pretrained weights this is a fixed random-feature
        # perceptual metric, and lecun_normal decays relu activations to ~0
        # over 13 conv layers (perceptual loss underflows); he_normal keeps
        # unit-scale signal through the relu chain
        he = nn.initializers.he_normal()
        conv_idx = 0
        for spec in VGG16_PLAN:
            if spec == "M":
                # guard for tiny (test-size) inputs where 5 pools would
                # collapse a spatial dim to zero
                if min(x.shape[1], x.shape[2]) >= 2:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(
                    spec,
                    (3, 3),
                    padding=1,
                    kernel_init=he,
                    dtype=self.dtype,
                    name=f"conv_{conv_idx}",
                )(x)
                x = nn.relu(x)
                conv_idx += 1
        x = _adaptive_avg_pool(x, (7, 7))
        # torch flattens NCHW (c, h, w) order; match it so converted weights work
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, kernel_init=he, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(4096, kernel_init=he, dtype=self.dtype, name="fc2")(x))
        return x


def init_vgg(rng: jax.Array | int = 0, dtype=jnp.float32) -> tuple[VGG16Features, Dict]:
    """Build the module and fixed-seed params (tiny dummy trace for init)."""
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    model = VGG16Features(dtype=dtype)
    params = model.init(rng, jnp.zeros((1, 32, 32, 3), dtype))
    return model, params


def load_torch_state_dict(state_dict: Dict[str, Any]) -> Dict:
    """Convert a torchvision vgg16 state dict to VGG16Features params.

    torch conv weight (out, in, kh, kw) -> flax (kh, kw, in, out);
    torch linear weight (out, in) -> flax (in, out).
    """
    params: Dict[str, Any] = {}
    conv_keys = [k for k in state_dict if k.startswith("features.") and k.endswith(".weight")]
    conv_keys.sort(key=lambda k: int(k.split(".")[1]))
    for idx, wkey in enumerate(conv_keys):
        bkey = wkey.replace("weight", "bias")
        w = np.asarray(state_dict[wkey])
        params[f"conv_{idx}"] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(np.asarray(state_dict[bkey])),
        }
    for name, tkey in (("fc1", "classifier.0"), ("fc2", "classifier.3")):
        w = np.asarray(state_dict[f"{tkey}.weight"])
        params[name] = {
            "kernel": jnp.asarray(w.T),
            "bias": jnp.asarray(np.asarray(state_dict[f"{tkey}.bias"])),
        }
    return {"params": params}


def load_vgg16_from_file(path: str) -> Dict:
    """Real-weights file loader (round-3 review #3): a torchvision VGG16
    state-dict file (.pth) -> VGG16Features params. Fetch once on a
    connected machine:

        python -c "import torchvision, torch; \
            torch.save(torchvision.models.vgg16(weights='IMAGENET1K_V1')\
            .state_dict(), 'vgg16.pth')"

    then pass `CViViTTrainer(vgg_params=load_vgg16_from_file('vgg16.pth'))`
    or set PHENAKI_VGG16_PATH=/path/to/vgg16.pth (picked up by the trainer
    when perceptual_mode='vgg' and no explicit params are given)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    state = {k: v.numpy() for k, v in state.items()}
    return load_torch_state_dict(state)
