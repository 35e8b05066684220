"""A/B: which perceptual term helps reconstruction — and does 'disc' win?

The reference uses a pretrained torchvision VGG16 for the perceptual loss
(cvivit.py:345-351,635-648). With zero egress this framework has no
pretrained weights: the shipped VGG16 (converter parity-tested in
tests/test_vgg_convert.py) runs on fixed-seed RANDOM features, and round-2's
isolated A/B measured that the random-VGG term HURTS (−0.4 to −1.7 dB PSNR).

Round-2 review #7 asked for a perceptual signal that measurably HELPS. The
candidate is `perceptual_mode="disc"` (cvivit_losses.py): LPIPS-style
matching of the IN-TRAINING discriminator's block features — learned on the
user's own data, improving as training runs, no pretrained weights needed.

This script trains the SAME small C-ViViT through the full CViViTTrainer GAN
pipeline three times on a textured synthetic image set, changing ONLY the
perceptual term:

  none : recon MSE + vq aux + GAN (adaptive weight balances vs recon grad)
  vgg  : + random-VGG perceptual (the reference formula, stand-in weights)
  disc : + discriminator-feature perceptual (this framework's default)

and reports held-out reconstruction PSNR for each. Run:

    python examples/perceptual_ab.py [--steps 600]
    python examples/perceptual_ab.py --isolated   # round-2's no-GAN A/B

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


HW = 64

CVIVIT_KWARGS = dict(
    dim=128,
    codebook_size=1024,
    image_size=HW,
    patch_size=8,
    temporal_patch_size=2,
    spatial_depth=2,
    temporal_depth=2,
    dim_head=32,
    heads=4,
    scan_layers=True,
)


def run_gan_ab(args):
    """Full-trainer three-way: perceptual_mode in {none, vgg, disc}."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from phenaki_tpu.models.cvivit import CViViT
    from phenaki_tpu.training.cvivit_trainer import CViViTTrainer
    from phenaki_tpu.utils.metrics import psnr

    n_train = 512
    train_images = np.asarray(
        jax.jit(lambda k: textured_batch(k, n_train, HW))(jax.random.PRNGKey(1))
    )
    eval_batch = jax.jit(lambda k: textured_batch(k, 64, HW))(
        jax.random.PRNGKey(10_000)
    )

    class TexturedDataset:
        def __len__(self):
            return n_train

        def __getitem__(self, idx):
            return train_images[idx]

    def run_variant(mode: str) -> float:
        cvivit = CViViT(**CVIVIT_KWARGS)
        with tempfile.TemporaryDirectory() as results:
            trainer = CViViTTrainer(
                cvivit,
                dataset=TexturedDataset(),
                num_train_steps=args.steps,
                batch_size=args.batch,
                lr=args.lr,
                train_on_images=True,
                use_vgg_and_gan=True,
                perceptual_mode=mode,
                valid_frac=0.0,
                save_results_every=10**9,
                save_model_every=10**9,
                results_folder=results,
                use_ema=False,
                seed=42,
                log_every=200,
            )
            t0 = time.time()
            for i in range(args.steps):
                logs = trainer.train_step()
                if i % 200 == 0:
                    print(
                        f"  [{mode}] step {i} loss {logs['loss']:.4f}"
                        f" recon {logs['recon_loss']:.4f}"
                        f" ({time.time() - t0:.0f}s)",
                        flush=True,
                    )
            params = trainer.state["vae_params"]
            recon, _, _ = jax.jit(
                lambda p, b: cvivit.apply(
                    {"params": p}, b, deterministic=True
                )
            )(params, eval_batch)
            val = float(jax.device_get(psnr(eval_batch, jnp.clip(recon, 0.0, 1.0))))
            trainer.checkpoints.close()
        return val

    results = {}
    for mode in ("none", "vgg", "disc"):
        results[mode] = run_variant(mode)
        print(f"{mode:5s}: held-out PSNR {results[mode]:.2f} dB", flush=True)

    print(
        json.dumps(
            {
                "metric": "perceptual_gan_ab_psnr_db",
                "gan_no_perceptual": round(results["none"], 2),
                "gan_random_vgg": round(results["vgg"], 2),
                "gan_disc_features": round(results["disc"], 2),
                "steps": args.steps,
            }
        )
    )


def run_isolated_ab(args):
    """Round-2's original A/B: recon-only vs +random-VGG, no GAN anywhere."""
    import jax
    import jax.numpy as jnp
    import optax

    from phenaki_tpu.models.cvivit import CViViT
    from phenaki_tpu.models.cvivit_losses import masked_recon_loss
    from phenaki_tpu.models.vgg import init_vgg
    from phenaki_tpu.utils.jit_init import jit_init
    from phenaki_tpu.utils.metrics import psnr

    hw = HW
    vgg, vgg_vars = init_vgg()

    eval_key = jax.random.PRNGKey(10_000)
    eval_batch = jax.jit(lambda k: textured_batch(k, 64, hw))(eval_key)

    def run_variant(use_perceptual: bool):
        cvivit = CViViT(**CVIVIT_KWARGS)
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument(
        "--isolated", action="store_true",
        help="run round-2's no-GAN recon vs random-VGG A/B instead",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")

    if args.isolated:
        run_isolated_ab(args)
    else:
        run_gan_ab(args)


if __name__ == "__main__":
    main()
