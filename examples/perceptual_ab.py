"""A/B: does the random-VGG perceptual term help reconstruction?

The reference uses a pretrained torchvision VGG16 for the perceptual loss
(cvivit.py:345-351,635-648); this framework ships a faithful VGG16 with a
verified torch-weight converter (tests/test_vgg_convert.py) but trains on
fixed-seed RANDOM features when no weights are cached. VERDICT round 1 asked
for the stand-in's value to be MEASURED, not asserted — this script trains
the same small C-ViViT twice on a textured synthetic image set:

  A: recon MSE + vq aux only
  B: recon MSE + vq aux + random-VGG perceptual (isolated: no GAN terms)

and reports held-out PSNR for both. Run:

    python examples/perceptual_ab.py [--steps 600]

Results are recorded in BASELINE.md ("Perceptual-term A/B").
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def textured_batch(key, batch, hw=64):
    """Procedural textures: oriented sinusoids + color gradients + soft disks
    — images with edge/frequency structure a perceptual metric can see."""
    import jax
    import jax.numpy as jnp

    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    yy, xx = jnp.meshgrid(
        jnp.linspace(0, 1, hw), jnp.linspace(0, 1, hw), indexing="ij"
    )
    freq = jax.random.uniform(k1, (batch, 1, 1, 1), minval=4.0, maxval=24.0)
    theta = jax.random.uniform(k2, (batch, 1, 1, 1), minval=0.0, maxval=np.pi)
    phase = jax.random.uniform(k3, (batch, 1, 1, 1), minval=0.0, maxval=2 * np.pi)
    grid = xx[None, :, :, None] * jnp.cos(theta) + yy[None, :, :, None] * jnp.sin(
        theta
    )
    stripes = 0.5 + 0.5 * jnp.sin(grid * freq * 2 * np.pi + phase)  # (b,hw,hw,1)

    color_a = jax.random.uniform(k4, (batch, 1, 1, 3))
    color_b = jax.random.uniform(k5, (batch, 1, 1, 3))
    img = stripes * color_a + (1 - stripes) * color_b

    # soft disk occluder
    kc1, kc2 = jax.random.split(k1)
    cx = jax.random.uniform(kc1, (batch, 1, 1, 1), minval=0.2, maxval=0.8)
    cy = jax.random.uniform(kc2, (batch, 1, 1, 1), minval=0.2, maxval=0.8)
    r2 = (xx[None, :, :, None] - cx) ** 2 + (yy[None, :, :, None] - cy) ** 2
    disk = jax.nn.sigmoid((0.02 - r2) * 300.0)
    img = img * (1 - disk) + disk * color_b
    return jnp.clip(img, 0.0, 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")

    from phenaki_tpu.models.cvivit import CViViT
    from phenaki_tpu.models.cvivit_losses import masked_recon_loss
    from phenaki_tpu.models.vgg import init_vgg
    from phenaki_tpu.utils.jit_init import jit_init
    from phenaki_tpu.utils.metrics import psnr

    hw = 64
    cvivit_kwargs = dict(
        dim=128,
        codebook_size=1024,
        image_size=hw,
        patch_size=8,
        temporal_patch_size=2,
        spatial_depth=2,
        temporal_depth=2,
        dim_head=32,
        heads=4,
        scan_layers=True,
    )
    vgg, vgg_vars = init_vgg()

    eval_key = jax.random.PRNGKey(10_000)
    eval_batch = jax.jit(lambda k: textured_batch(k, 64, hw))(eval_key)

    def run_variant(use_perceptual: bool):
        cvivit = CViViT(**cvivit_kwargs)
        variables = jit_init(
            cvivit, jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3))
        )
        params = variables["params"]
        opt = optax.adam(args.lr)
        opt_state = jax.jit(opt.init)(params)

        def loss_fn(p, vv, batch, rng):
            recon, _, vq_aux = cvivit.apply(
                {"params": p}, batch, deterministic=True
            )
            recon_loss = masked_recon_loss(
                batch[:, None], recon[:, None], None
            )
            loss = recon_loss + vq_aux
            if use_perceptual:
                feats_in = vgg.apply(vv, batch)
                feats_re = vgg.apply(vv, recon)
                perc = jnp.mean(
                    (feats_in.astype(jnp.float32) - feats_re.astype(jnp.float32))
                    ** 2
                )
                loss = loss + perc
            return loss, recon_loss

        # vgg_vars enters as an ARGUMENT: closed-over it would be baked into
        # the HLO as ~500 MB of constants (remote-compile body cap)
        @jax.jit
        def step(p, o, vv, rng):
            kd, kb = jax.random.split(rng)
            batch = textured_batch(kb, args.batch, hw)
            (loss, recon_l), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                p, vv, batch, kd
            )
            updates, o = opt.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return p, o, loss, recon_l

        @jax.jit
        def eval_psnr(p):
            recon, _, _ = cvivit.apply({"params": p}, eval_batch, deterministic=True)
            return psnr(eval_batch, jnp.clip(recon, 0.0, 1.0))

        rng = jax.random.PRNGKey(42)
        t0 = time.time()
        for i in range(args.steps):
            rng, sub = jax.random.split(rng)
            params, opt_state, loss, recon_l = step(
                params, opt_state, vgg_vars, sub
            )
            if i % 100 == 0:
                print(
                    f"  [{'B:+perc' if use_perceptual else 'A:recon'}] step {i} "
                    f"loss {float(loss):.4f} recon {float(recon_l):.4f} "
                    f"({time.time() - t0:.0f}s)",
                    flush=True,
                )
        return float(jax.device_get(eval_psnr(params)))

    psnr_a = run_variant(use_perceptual=False)
    print(f"A (recon only):        held-out PSNR {psnr_a:.2f} dB", flush=True)
    psnr_b = run_variant(use_perceptual=True)
    print(f"B (+ random-VGG perc): held-out PSNR {psnr_b:.2f} dB", flush=True)
    print(
        json.dumps(
            {
                "metric": "perceptual_ab_psnr_db",
                "recon_only": round(psnr_a, 2),
                "with_random_vgg_perceptual": round(psnr_b, 2),
                "steps": args.steps,
            }
        )
    )


if __name__ == "__main__":
    main()
