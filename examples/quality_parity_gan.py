"""Full-VQGAN trained parity: reference trainer loop vs phenaki_tpu, SAME data.

Round-3 review #4: the recon-only A/B (examples/quality_parity.py) never
exercised the GAN objective. This arm trains BOTH sides with the full VQGAN
recipe — reconstruction + VGG-feature perceptual + hinge GAN + adaptive
generator weight + R1 gradient penalty — at a mid config (32x32, 5 frames),
the reference through its OWN CViViTTrainer loop (cvivit_trainer.py:217-345,
Accelerate on CPU) and ours through training/cvivit_trainer.py.

Matched:
  * data — one folder of GIF files written once; each side decodes it with
    its own loader (reference data.py vs data/codecs.py + native codec);
    eval targets are the pre-quantization float arrays for both sides.
  * VGG — ONE randomly initialized torchvision-layout VGG16
    (tests/test_vgg_convert.build_torchvision_like_vgg16, classifier cut to
    relu(fc2) like the reference does), passed to the reference as `vgg=`
    and converted to our side via models/vgg.load_torch_state_dict — both
    sides measure perceptual distance in the IDENTICAL feature space.
  * LFQ semantics (the reference's vector-quantize-pytorch is unavailable:
    quality_parity.make_torch_lfq is the verified functional stand-in),
    model dims, Adam(lr, (0.9, 0.99), wd 0) via each side's own factory,
    batch, steps.
  * R1 cadence — the reference trainer's discriminator phase calls
    forward(return_discr_loss=True) with the DEFAULT apply_grad_penalty=True
    (cvivit_trainer.py:262; the every-4th flag only reaches the generator
    phase, where it is unused — quirk Q4 territory), i.e. GP on EVERY discr
    step; ours runs apply_grad_penalty_every=1 to match.

Deliberately not matched: parameter init streams, data order rng, frame
picks (each side runs its own code).

Run:  python examples/quality_parity_gan.py --steps 2000
      (reference arm: torch CPU, the slow side; ours runs on whatever JAX
       backend is active. ~1-2 h total at 2000 steps.)
Writes one JSON line per arm + a combined line; PARITY.md records them.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from quality_parity import make_torch_lfq, psnr_np

IMG = 32
FRAMES = 5
N_TRAIN, N_EVAL = 512, 64
DIRS = np.asarray([(0, 1), (0, -1), (1, 0), (-1, 0)], np.int64)


def make_videos(n: int, seed: int):
    """Moving textured squares at 32x32 — same family as quality_parity but
    scaled up, with a textured fill so the perceptual/GAN terms have
    structure to discriminate."""
    rs = np.random.RandomState(seed)
    out = np.zeros((n, FRAMES, IMG, IMG, 3), np.float32)
    yy, xx = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    for i in range(n):
        d = DIRS[rs.randint(4)]
        y, x = rs.randint(4, IMG - 12, size=2)
        color = 0.4 + 0.6 * rs.rand(3)
        phase = rs.rand() * math.pi
        tex = 0.25 * np.sin(0.9 * xx + 1.3 * yy + phase)[..., None]
        patch = np.clip(color[None, None] + tex, 0.0, 1.0)
        for f in range(FRAMES):
            py = int(np.clip(y + d[0] * 2 * f, 0, IMG - 8))
            px = int(np.clip(x + d[1] * 2 * f, 0, IMG - 8))
            out[i, f, py : py + 8, px : px + 8] = patch
        out[i] += 0.04 * rs.rand(FRAMES, IMG, IMG, 3)
    return np.clip(out, 0.0, 1.0)


MODEL_KW = dict(
    dim=64, codebook_size=256, image_size=IMG, patch_size=8,
    temporal_patch_size=2, spatial_depth=2, temporal_depth=2,
    dim_head=32, heads=4,
)
DISCR_KW = dict(discr_base_dim=32, discr_attn_res_layers=(16,))


def write_gif_folder(videos: np.ndarray, folder: str):
    from phenaki_tpu.data.codecs import video_tensor_to_gif

    for i, v in enumerate(videos):
        video_tensor_to_gif(v, f"{folder}/{i:04d}.gif")


def shared_vgg():
    """One random torchvision-layout VGG16 (fixed seed inside the builder);
    classifier already truncated to relu(fc2) 4096-d features."""
    from test_vgg_convert import build_torchvision_like_vgg16

    return build_torchvision_like_vgg16()


# ---------------------------------------------------------------------- #
# reference arm                                                          #
# ---------------------------------------------------------------------- #


def run_reference(gif_dir, evals, steps, batch, lr, seed):
    import torch

    from _reference_stubs import install_reference_stubs

    assert install_reference_stubs()
    import vector_quantize_pytorch as vq_mod

    vq_mod.LFQ = make_torch_lfq()
    for m in list(sys.modules):
        if m.startswith("phenaki_pytorch"):
            del sys.modules[m]
    from phenaki_pytorch.cvivit import CViViT as RefCViViT
    from phenaki_pytorch.cvivit_trainer import CViViTTrainer as RefTrainer

    torch.manual_seed(seed)
    vgg = shared_vgg()
    vae = RefCViViT(use_vgg_and_gan=True, vgg=vgg, **MODEL_KW, **DISCR_KW)

    with tempfile.TemporaryDirectory() as results:
        trainer = RefTrainer(
            vae,
            num_train_steps=steps,
            batch_size=batch,
            folder=gif_dir,
            num_frames=FRAMES,
            lr=lr,
            valid_frac=0.0,
            use_ema=False,
            save_results_every=10**9,
            save_model_every=10**9,
            results_folder=results,
        )
        t0 = time.time()
        gen_losses, discr_losses = [], []
        for _ in range(steps):
            logs = trainer.train_step()
            if isinstance(logs, dict):
                gen_losses.append(logs.get("loss"))
                discr_losses.append(logs.get("discr_loss"))
        train_s = time.time() - t0

    vae.eval()
    t_eval = torch.from_numpy(evals.transpose(0, 4, 1, 2, 3)).contiguous()
    with torch.no_grad():
        recon = vae(t_eval, return_recons_only=True)
    # discriminator health after training: hinge discr loss + R1 penalty on
    # a batch. GP must stay ON: the reference forward never assigns `loss`
    # when apply_grad_penalty=False (cvivit.py:603-621, UnboundLocalError) —
    # a latent reference bug — so the ONLY discr loss it can return includes
    # GP. Ours evals with the identical hinge+GP composition below.
    discr_final = float(
        vae(t_eval[:batch], return_discr_loss=True, apply_grad_penalty=True)
    )
    p = psnr_np(np.clip(recon.numpy(), 0, 1).transpose(0, 2, 3, 4, 1), evals)
    out = {
        "recon_psnr_db": p,
        "final_discr_loss": discr_final,
        "train_seconds": train_s,
    }
    if gen_losses and gen_losses[-1] is not None:
        out["last100_gen_loss"] = float(np.mean([x for x in gen_losses[-100:] if x is not None]))
    if discr_losses and discr_losses[-1] is not None:
        out["last100_discr_loss"] = float(np.mean([x for x in discr_losses[-100:] if x is not None]))
    return out


# ---------------------------------------------------------------------- #
# phenaki_tpu arm                                                        #
# ---------------------------------------------------------------------- #


def run_ours(gif_dir, evals, steps, batch, lr, seed):
    import jax
    import jax.numpy as jnp

    from phenaki_tpu.models.cvivit import CViViT
    from phenaki_tpu.models.cvivit_losses import cvivit_discriminator_loss
    from phenaki_tpu.models.vgg import load_torch_state_dict
    from phenaki_tpu.training.cvivit_trainer import CViViTTrainer

    vgg_params = load_torch_state_dict(shared_vgg().state_dict())

    vae = CViViT(**MODEL_KW)
    with tempfile.TemporaryDirectory() as results:
        trainer = CViViTTrainer(
            vae,
            num_train_steps=steps,
            batch_size=batch,
            folder=gif_dir,
            num_frames=FRAMES,
            lr=lr,
            valid_frac=0.0,
            use_ema=False,
            save_results_every=10**9,
            save_model_every=10**9,
            results_folder=results,
            clear_previous_results=False,
            use_vgg_and_gan=True,
            perceptual_mode="vgg",
            vgg_params=vgg_params,
            # the reference's discr phase applies the R1 penalty every step
            # (forward default, see module docstring) — match it
            apply_grad_penalty_every=1,
            seed=seed,
            log_every=200,
            **DISCR_KW,
        )
        t0 = time.time()
        gen_losses, discr_losses = [], []
        while trainer.step < steps:
            logs = trainer.train_step()
            gen_losses.append(logs.get("loss"))
            discr_losses.append(logs.get("discr_loss"))
        jax.block_until_ready(gen_losses[-1])
        train_s = time.time() - t0

        variables = trainer._eval_variables(use_ema=False)
        discr_vars = {"params": jax.device_get(trainer.state["discr_params"])}
        discr_mod = trainer.discr
        # async Orbax save (step-0 milestone) must land before the tempdir
        # context deletes the tree under it
        trainer.checkpoints.wait()

    recon_fn = jax.jit(lambda vs, v: vae.apply(vs, v)[0])
    recon = np.asarray(
        jax.device_get(recon_fn(variables, jnp.asarray(evals))), np.float32
    )
    p = psnr_np(np.clip(recon, 0, 1), evals)

    # discriminator health: same hinge + R1 composition as the reference
    # eval (GP on — see run_reference; the reference CANNOT report a
    # GP-free discr loss)
    discr_final, _ = cvivit_discriminator_loss(
        vae,
        discr_mod,
        variables,
        discr_vars,
        jnp.asarray(evals[:batch]),
        jax.random.PRNGKey(0),
        apply_grad_penalty=True,
    )
    out = {
        "recon_psnr_db": p,
        "final_discr_loss": float(jax.device_get(discr_final)),
        "train_seconds": train_s,
        "last100_gen_loss": float(
            np.mean([float(jax.device_get(x)) for x in gen_losses[-100:]])
        ),
        "last100_discr_loss": float(
            np.mean([float(jax.device_get(x)) for x in discr_losses[-100:]])
        ),
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--arm", choices=["both", "reference", "ours"], default="both")
    args = ap.parse_args()

    train = make_videos(N_TRAIN, seed=0)
    evals = make_videos(N_EVAL, seed=1)

    results = {}
    with tempfile.TemporaryDirectory() as gif_dir:
        write_gif_folder(train, gif_dir)
        if args.arm in ("both", "ours"):
            print("== ours: full-VQGAN training ==", flush=True)
            results["ours"] = run_ours(
                gif_dir, evals, args.steps, args.batch, args.lr, 0
            )
            print(json.dumps({"ours": results["ours"]}), flush=True)
        if args.arm in ("both", "reference"):
            print("== reference: full-VQGAN training (own trainer loop) ==", flush=True)
            results["reference"] = run_reference(
                gif_dir, evals, args.steps, args.batch, args.lr, 0
            )
            print(json.dumps({"reference": results["reference"]}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
