"""Real pretrained-weights pipeline (round-3 review #3) — GATED tests.

These run only when the actual assets are present (this CI image has zero
network egress and ships none, so they skip here); on a machine with the
weights they prove the full real-weights path:

  * T5: set PHENAKI_T5_PATH to a downloaded google/t5-v1_1-* checkpoint
    directory (config.json + model weights + spiece.model), or warm the
    transformers cache. Asserts the JAX T5 encoder (SentencePiece tokenizer
    -> converted weights -> jitted encoder) matches the HF torch encoder
    numerically on REAL prompts.
  * VGG16: set PHENAKI_VGG16_PATH to a torchvision vgg16 state-dict file.
    Asserts the converted params reproduce torchvision features on real
    images and that CViViTTrainer picks the file up automatically.

Asset fetch (any connected machine):
    huggingface-cli download google/t5-v1_1-base --local-dir t5-v1_1-base
    python -c "import torchvision, torch; torch.save(
        torchvision.models.vgg16(weights='IMAGENET1K_V1').state_dict(),
        'vgg16.pth')"
"""

import os

import numpy as np
import pytest

from phenaki_tpu.text.t5 import DEFAULT_T5_NAME, resolve_t5_source

PROMPTS = [
    "a teddy bear skating in times square",
    "fireworks over a calm lake at night",
    "a squirrel eats a burger",
]


def _t5_available() -> bool:
    try:
        from transformers import T5Config

        T5Config.from_pretrained(
            resolve_t5_source(DEFAULT_T5_NAME), local_files_only=True
        )
        return True
    except Exception:
        return False


def _vgg_path():
    p = os.environ.get("PHENAKI_VGG16_PATH")
    return p if p and os.path.isfile(p) else None


t5_required = pytest.mark.skipif(
    not _t5_available(),
    reason="real T5 weights absent (set PHENAKI_T5_PATH or warm the HF cache)",
)
vgg_required = pytest.mark.skipif(
    _vgg_path() is None,
    reason="real VGG16 weights absent (set PHENAKI_VGG16_PATH)",
)


@t5_required
def test_jax_t5_matches_hf_on_real_prompts():
    """SentencePiece tokenizer + converted weights + jitted encoder vs the
    HF torch encoder, on real text."""
    from phenaki_tpu.text.t5 import _HFT5Encoder
    from phenaki_tpu.text.t5_jax import JaxT5Encoder

    jax_enc = JaxT5Encoder(DEFAULT_T5_NAME)
    hf_enc = _HFT5Encoder(DEFAULT_T5_NAME)

    ours = jax_enc(PROMPTS)
    ref = hf_enc(PROMPTS)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)
    # zero-embed padding convention survives (mask recovery downstream)
    assert (np.abs(ours).sum(-1) == 0).any() or ours.shape[1] == min(
        len(p.split()) for p in PROMPTS
    )


@t5_required
def test_t5_encode_text_routes_to_real_weights():
    """The public entry (used by Phenaki.embed_texts) must resolve to a real
    encoder, not the hash fallback, when assets exist."""
    from phenaki_tpu.text.t5 import HashTextEncoder, get_text_encoder

    enc = get_text_encoder(DEFAULT_T5_NAME)
    assert not isinstance(enc, HashTextEncoder)
    out = enc(PROMPTS[:1])
    assert out.shape[-1] == 768 and np.isfinite(out).all()


@t5_required
def test_real_t5_conditioned_sample():
    """One command from real weight files to a conditioned sample: the
    driver path of examples/real_weights_sample.py."""
    import jax
    import jax.numpy as jnp

    from phenaki_tpu.models.cvivit import CViViT
    from phenaki_tpu.models.maskgit import MaskGit
    from phenaki_tpu.models.phenaki import Phenaki

    cvivit = CViViT(
        dim=32, codebook_size=64, image_size=16, patch_size=8,
        temporal_patch_size=2, spatial_depth=1, temporal_depth=1,
        dim_head=16, heads=2,
    )
    cvivit_vars = cvivit.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16, 3))
    )
    maskgit = MaskGit(
        dim=32, num_tokens=64, max_seq_len=16, depth=1, heads=2, dim_head=16,
        dim_context=768,
    )
    ph = Phenaki(
        maskgit=maskgit, cvivit=cvivit, cvivit_vars=cvivit_vars, steps=2,
    )  # text_embed_dim resolved from the real T5 config (768)
    assert ph.text_embed_dim == 768
    ph.init(jax.random.PRNGKey(1))
    video = ph.sample(
        num_frames=3, texts=["a red square sliding right"],
        rng=jax.random.PRNGKey(2),
    )
    v = np.asarray(video, np.float32)
    assert v.shape == (1, 3, 16, 16, 3) and np.isfinite(v).all()


@vgg_required
def test_vgg_file_loader_matches_torch():
    """Converted real VGG16 weights reproduce the torch features."""
    import torch

    from phenaki_tpu.models.vgg import VGG16Features, load_vgg16_from_file
    from test_vgg_convert import build_torchvision_like_vgg16

    path = _vgg_path()
    params = load_vgg16_from_file(path)

    torch_vgg = build_torchvision_like_vgg16()
    torch_vgg.load_state_dict(
        torch.load(path, map_location="cpu", weights_only=True)
    )
    torch_vgg.eval()

    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    ours = np.asarray(VGG16Features().apply(params, x))
    with torch.no_grad():
        ref = torch_vgg(
            torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous()
        ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


@vgg_required
def test_trainer_picks_up_vgg_env(tmp_path):
    """CViViTTrainer(perceptual_mode='vgg') loads PHENAKI_VGG16_PATH."""
    from phenaki_tpu.models.cvivit import CViViT
    from phenaki_tpu.training.cvivit_trainer import CViViTTrainer

    videos = np.random.RandomState(0).rand(4, 3, 16, 16, 3).astype(np.float32)

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return (videos[i],)

    vae = CViViT(
        dim=32, codebook_size=64, image_size=16, patch_size=8,
        temporal_patch_size=2, spatial_depth=1, temporal_depth=1,
        dim_head=16, heads=2,
    )
    trainer = CViViTTrainer(
        vae, num_train_steps=1, batch_size=2, dataset=DS(), num_frames=3,
        results_folder=str(tmp_path), save_results_every=10**9,
        save_model_every=10**9, use_ema=False, perceptual_mode="vgg",
        valid_frac=0.0,
    )
    assert trainer.perceptual_mode == "vgg"
    assert trainer.vgg_vars is not None
