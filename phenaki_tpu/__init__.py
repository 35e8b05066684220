"""phenaki_tpu — a TPU-native (JAX/XLA/Pallas/pjit) text-to-video framework.

Re-implements, from scratch and TPU-first, the full capability surface of
lucidrains/phenaki-pytorch (reference mounted at /root/reference):

  * C-ViViT video tokenizer (factorized spatial/temporal ViT autoencoder with
    an LFQ or cosine-VQ bottleneck and a full VQGAN training recipe)
  * MaskGit bidirectional transformer over video tokens with iterative
    parallel decoding, classifier-free guidance, and TokenCritic/SelfCritic
    re-scoring
  * Phenaki composition with frozen T5 text conditioning, prime-frame scene
    chaining (`make_video`) and trainers for both stages.

Public API mirrors the reference package root (reference
`phenaki_pytorch/__init__.py:1-4`).
"""

import importlib

__version__ = "0.1.0"

# lazy top-level exports: keeps `import phenaki_tpu.ops` cheap and avoids
# pulling trainer/data dependencies (PIL/cv2) into jitted-code-only users
_EXPORTS = {
    "CViViT": "phenaki_tpu.models.cvivit",
    "Discriminator": "phenaki_tpu.models.cvivit",
    "MaskGit": "phenaki_tpu.models.maskgit",
    "TokenCritic": "phenaki_tpu.models.maskgit",
    "SelfCritic": "phenaki_tpu.models.maskgit",
    "Phenaki": "phenaki_tpu.models.phenaki",
    "make_video": "phenaki_tpu.models.phenaki",
    "CViViTTrainer": "phenaki_tpu.training.cvivit_trainer",
    "PhenakiTrainer": "phenaki_tpu.training.phenaki_trainer",
    "PhenakiServer": "phenaki_tpu.serving",
    "serve_http": "phenaki_tpu.serving",
    "convert_cvivit_state_dict": "phenaki_tpu.convert",
    "convert_maskgit_state_dict": "phenaki_tpu.convert",
    "convert_token_critic_state_dict": "phenaki_tpu.convert",
    "flagship_cvivit": "phenaki_tpu.presets",
    "flagship_maskgit": "phenaki_tpu.presets",
    "flagship_token_critic": "phenaki_tpu.presets",
    "flagship_phenaki": "phenaki_tpu.presets",
}


def __getattr__(name):
    if name in _EXPORTS:
        module = importlib.import_module(_EXPORTS[name])
        return getattr(module, name)
    raise AttributeError(f"module 'phenaki_tpu' has no attribute {name!r}")

__all__ = [
    "Phenaki",
    "CViViT",
    "Discriminator",
    "MaskGit",
    "TokenCritic",
    "SelfCritic",
    "make_video",
    "CViViTTrainer",
    "PhenakiTrainer",
    "PhenakiServer",
    "serve_http",
    "convert_cvivit_state_dict",
    "convert_maskgit_state_dict",
    "convert_token_critic_state_dict",
    "flagship_cvivit",
    "flagship_maskgit",
    "flagship_token_critic",
    "flagship_phenaki",
]
