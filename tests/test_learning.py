"""Learning sanity: the training plumbing must actually reduce losses.

Overfit a single tiny batch — catches sign errors, broken straight-through
estimators, dead gradients, and mis-wired optimizers that shape tests cannot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from phenaki_tpu.models.cvivit import CViViT
from phenaki_tpu.models.cvivit_losses import cvivit_generator_loss
from phenaki_tpu.models.maskgit import MaskGit
from phenaki_tpu.models.phenaki import Phenaki
from phenaki_tpu.training.optimizer import get_optimizer
from phenaki_tpu.utils.metrics import psnr, reconstruction_psnr

pytestmark = pytest.mark.slow  # big compiles / loops: not in the quick tier


def test_cvivit_overfits_one_batch():
    """30 recon-only steps on one batch: loss must drop and PSNR must rise."""
    model = CViViT(
        dim=32, codebook_size=64, image_size=16, patch_size=8,
        temporal_patch_size=2, spatial_depth=1, temporal_depth=1,
        dim_head=16, heads=2,
    )
    video = jnp.asarray(np.random.RandomState(0).rand(2, 3, 16, 16, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), video)
    params = variables["params"]
    opt = get_optimizer(lr=3e-3, wd=0.0)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            (loss, aux), _ = cvivit_generator_loss(
                model, {"params": p}, video, rng, use_vgg_and_gan=False
            )
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, aux["recon_loss"]

    rng = jax.random.PRNGKey(1)
    first = None
    for i in range(30):
        rng, sub = jax.random.split(rng)
        params, opt_state, recon_loss = step(params, opt_state, sub)
        if first is None:
            first = float(recon_loss)
    last = float(recon_loss)
    assert last < first * 0.7, f"recon loss did not drop: {first} -> {last}"

    p0 = reconstruction_psnr(model, variables, video)
    p1 = reconstruction_psnr(model, {"params": params}, video)
    assert float(p1) > float(p0), f"PSNR did not improve: {p0} -> {p1}"


def test_maskgit_overfits_one_batch():
    """30 masked-CE steps on fixed codebook ids: loss must drop sharply."""
    cvivit = CViViT(
        dim=32, codebook_size=64, image_size=16, patch_size=8,
        temporal_patch_size=2, spatial_depth=1, temporal_depth=1,
        dim_head=16, heads=2,
    )
    cvivit_vars = cvivit.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16, 3)))
    maskgit = MaskGit(
        dim=32, num_tokens=64, max_seq_len=16, depth=1, heads=2, dim_head=16,
        dim_context=16,
    )
    ph = Phenaki(
        maskgit=maskgit, cvivit=cvivit, cvivit_vars=cvivit_vars, steps=4,
        text_embed_dim=16, max_text_len=4,
    )
    params = ph.init(jax.random.PRNGKey(1))
    opt = get_optimizer(lr=3e-3, wd=0.0)
    opt_state = opt.init(params)

    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 2, 2, 2), 0, 64)
    text = jnp.asarray(np.random.RandomState(3).randn(2, 4, 16), np.float32)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            return ph.loss(p, rng, video_codebook_ids=ids, text_embeds=text)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(4)
    losses = []
    for i in range(30):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, f"CE did not drop: {losses[0]} -> {losses[-1]}"


def test_psnr_properties():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 8, 8, 3), np.float32)
    assert float(psnr(x, x)) >= 90.0  # identical -> clamp at eps
    noisy = jnp.clip(x + 0.1, 0, 1)
    assert float(psnr(noisy, x)) < 30.0
