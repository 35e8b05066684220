"""One command: local weight files -> text-conditioned sample (review #3).

Runs the REAL pretrained-encoder pipeline end to end: SentencePiece
tokenizer -> JAX T5 v1.1 encoder (converted from the HF checkpoint) ->
Phenaki conditioning -> jitted decode -> GIF on disk. The generative model
itself is whatever checkpoint you pass (or fresh random weights — the point
of this script is proving the frozen-encoder plumbing, not sample quality).

Assets (fetch once on any connected machine):

    huggingface-cli download google/t5-v1_1-base --local-dir t5-v1_1-base
    python -c "import torchvision, torch; torch.save(
        torchvision.models.vgg16(weights='IMAGENET1K_V1').state_dict(),
        'vgg16.pth')"    # optional, only used by C-ViViT GAN training

Run:
    PHENAKI_T5_PATH=/path/to/t5-v1_1-base \
        python examples/real_weights_sample.py \
        --prompt "a teddy bear skating in times square" \
        [--checkpoint /path/saved/by/Phenaki.save] [--out sample.gif]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", default="a teddy bear skating in times square")
    ap.add_argument("--checkpoint", default=None,
                    help="directory written by Phenaki.save (optional)")
    ap.add_argument("--out", default="real_weights_sample.gif")
    ap.add_argument("--num-frames", type=int, default=17)
    ap.add_argument("--image-size", type=int, nargs=2, default=(256, 128))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from phenaki_tpu.data.codecs import video_tensor_to_gif
    from phenaki_tpu.models.cvivit import CViViT
    from phenaki_tpu.models.maskgit import MaskGit
    from phenaki_tpu.models.phenaki import Phenaki
    from phenaki_tpu.text.t5 import (
        DEFAULT_T5_NAME,
        HashTextEncoder,
        get_text_encoder,
        resolve_t5_source,
    )
    from phenaki_tpu.utils.jit_init import jit_init

    # fail loudly if the REAL encoder is unavailable — this script exists to
    # prove the real-weights path, silent hash fallback would defeat it
    enc = get_text_encoder(DEFAULT_T5_NAME)
    if isinstance(enc, HashTextEncoder):
        raise SystemExit(
            "real T5 weights not found — set PHENAKI_T5_PATH to a downloaded"
            f" checkpoint directory (resolve source tried:"
            f" {resolve_t5_source(DEFAULT_T5_NAME)!r}); see module docstring"
        )
    print(f"text encoder: {type(enc).__name__}")

    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    H, W = args.image_size
    cvivit = CViViT(
        dim=512, codebook_size=65536, image_size=(H, W), patch_size=16,
        temporal_patch_size=2, spatial_depth=4, temporal_depth=4,
        dim_head=64, heads=8, scan_layers=True, dtype=dtype,
    )
    rng = jax.random.PRNGKey(0)
    cvivit_vars = jit_init(cvivit, rng, jnp.zeros((1, 3, H, W, 3), dtype))
    n = cvivit.num_tokens_per_frames(args.num_frames)
    maskgit = MaskGit(
        dim=512, num_tokens=65536, max_seq_len=n, depth=6, heads=8,
        dim_head=64, dim_context=768, scan_layers=True, dtype=dtype,
    )
    ph = Phenaki(
        maskgit=maskgit, cvivit=cvivit, cvivit_vars=cvivit_vars, steps=18,
    )
    assert ph.text_embed_dim == 768  # resolved from the real T5 config
    if args.checkpoint:
        ph.load(args.checkpoint)
        print(f"loaded checkpoint {args.checkpoint}")
    else:
        ph.init(jax.random.PRNGKey(1))
        print("no checkpoint given — sampling from fresh random weights")

    emb = ph.embed_texts([args.prompt])
    print(f"prompt embedded: shape {emb.shape}, nonzero rows"
          f" {(np.abs(emb).sum(-1) > 0).sum()}")
    video = ph.sample(
        num_frames=args.num_frames, text_embeds=emb,
        rng=jax.random.PRNGKey(2), cond_scale=5.0,
    )
    video = np.clip(np.asarray(jax.device_get(video), np.float32), 0, 1)
    video_tensor_to_gif(video[0], args.out)
    print(f"wrote {args.out}: {video.shape[1]} frames {video.shape[2:4]}")


if __name__ == "__main__":
    main()
