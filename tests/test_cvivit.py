"""C-ViViT tests: patching round-trips, token arithmetic, forward shapes,
causal temporal consistency, VQGAN losses (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phenaki_tpu.models.cvivit import CViViT, Discriminator
from phenaki_tpu.models import cvivit_losses as L
from phenaki_tpu.models.vgg import init_vgg


def tiny_cvivit(**kw):
    cfg = dict(
        dim=32,
        codebook_size=64,
        image_size=16,
        patch_size=8,
        temporal_patch_size=2,
        spatial_depth=1,
        temporal_depth=1,
        dim_head=16,
        heads=2,
    )
    cfg.update(kw)
    return CViViT(**cfg)


@pytest.fixture(scope="module")
def model_and_vars():
    model = tiny_cvivit()
    video = jnp.zeros((1, 5, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), video)
    return model, variables


def test_token_arithmetic():
    m = tiny_cvivit()
    assert m.patch_height_width == (2, 2)
    assert m.image_num_tokens == 4
    assert m.get_video_patch_shape(5) == (3, 2, 2)  # 1 + (5-1)/2
    assert m.num_tokens_per_frames(5) == 12
    assert m.num_tokens_per_frames(4, include_first_frame=False) == 8
    assert m.frames_per_num_tokens(12) == 5


def test_video_token_mask():
    m = tiny_cvivit()
    frame_mask = jnp.asarray([[True, True, True, False, False]])
    token_mask = m.calculate_video_token_mask(frame_mask)
    # latent frames: first + 2 groups; group1 (frames 1,2) any=True, group2 False
    assert token_mask.shape == (1, 12)
    np.testing.assert_array_equal(np.asarray(token_mask[0]), [True] * 8 + [False] * 4)


def test_forward_shapes_video(model_and_vars):
    model, variables = model_and_vars
    video = jax.random.uniform(jax.random.PRNGKey(1), (2, 5, 16, 16, 3))
    recon, indices, aux = model.apply(variables, video)
    assert recon.shape == video.shape
    assert indices.shape == (2, 3, 2, 2)
    assert np.isfinite(float(aux))


def test_forward_shapes_image(model_and_vars):
    model, variables = model_and_vars
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    recon, indices, aux = model.apply(variables, img)
    assert recon.shape == img.shape
    assert indices.shape == (2, 1, 2, 2)


def test_decode_from_codebook_indices_roundtrip(model_and_vars):
    model, variables = model_and_vars
    video = jax.random.uniform(jax.random.PRNGKey(1), (1, 5, 16, 16, 3))
    recon, indices, _ = model.apply(variables, video)
    recon2 = model.apply(
        variables, indices, method=CViViT.decode_from_codebook_indices
    )
    np.testing.assert_allclose(np.asarray(recon), np.asarray(recon2), atol=1e-4)


def test_causal_tokenization_prefix_consistent(model_and_vars):
    """Token ids for a video prefix must match the prefix of the full video's
    ids — the property that makes prime-frame chaining work (causal temporal
    transformer + causal PEG, reference cvivit.py:297-308)."""
    model, variables = model_and_vars
    video = jax.random.uniform(jax.random.PRNGKey(2), (1, 5, 16, 16, 3))
    ids_full = model.apply(variables, video, return_only_codebook_ids=True)
    ids_prefix = model.apply(variables, video[:, :3], return_only_codebook_ids=True)
    np.testing.assert_array_equal(
        np.asarray(ids_full[:, :2]), np.asarray(ids_prefix)
    )


def test_generator_loss_recon_only(model_and_vars):
    model, variables = model_and_vars
    video = jax.random.uniform(jax.random.PRNGKey(1), (1, 5, 16, 16, 3))
    (loss, aux), _ = L.cvivit_generator_loss(
        model,
        variables,
        video,
        jax.random.PRNGKey(3),
        use_vgg_and_gan=False,
        deterministic=True,
    )
    assert np.isfinite(float(loss))
    assert float(aux["recon_loss"]) > 0


def test_generator_loss_full_gan(model_and_vars):
    model, variables = model_and_vars
    discr = Discriminator(dim=4, image_size=16, attn_res_layers=())
    video = jax.random.uniform(jax.random.PRNGKey(1), (1, 5, 16, 16, 3))
    dvars = discr.init(jax.random.PRNGKey(4), jnp.zeros((1, 16, 16, 3)))
    vgg, vgg_vars = init_vgg()
    (loss, aux), _ = L.cvivit_generator_loss(
        model,
        variables,
        video,
        jax.random.PRNGKey(3),
        discr=discr,
        discr_vars=dvars,
        vgg=vgg,
        vgg_vars=vgg_vars,
        deterministic=True,
    )
    assert np.isfinite(float(loss))
    assert float(aux["adaptive_weight"]) >= 0
    assert np.isfinite(float(aux["perceptual_loss"]))


def test_generator_loss_disc_perceptual(model_and_vars):
    """perceptual_mode='disc': LPIPS-style in-training discriminator features
    replace the VGG — no vgg module needed, loss finite, and the perceptual
    term's gradient reaches the full VAE params."""
    model, variables = model_and_vars
    discr = Discriminator(dim=4, image_size=16, attn_res_layers=())
    video = jax.random.uniform(jax.random.PRNGKey(1), (1, 5, 16, 16, 3))
    dvars = discr.init(jax.random.PRNGKey(4), jnp.zeros((1, 16, 16, 3)))

    def f(params):
        v = {**variables, "params": params}
        (loss, aux), _ = L.cvivit_generator_loss(
            model, v, video, jax.random.PRNGKey(3),
            discr=discr, discr_vars=dvars,
            deterministic=True, perceptual_mode="disc",
        )
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(f, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    assert np.isfinite(float(aux["perceptual_loss"]))
    assert float(aux["perceptual_loss"]) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert sum(float(jnp.sum(jnp.abs(l))) for l in leaves) > 0


def test_generator_loss_no_perceptual_mode(model_and_vars):
    """perceptual_mode='none': GAN terms without a perceptual loss; the
    adaptive weight balances against the recon gradient instead."""
    model, variables = model_and_vars
    discr = Discriminator(dim=4, image_size=16, attn_res_layers=())
    video = jax.random.uniform(jax.random.PRNGKey(1), (1, 5, 16, 16, 3))
    dvars = discr.init(jax.random.PRNGKey(4), jnp.zeros((1, 16, 16, 3)))
    (loss, aux), _ = L.cvivit_generator_loss(
        model, variables, video, jax.random.PRNGKey(3),
        discr=discr, discr_vars=dvars,
        deterministic=True, perceptual_mode="none",
    )
    assert np.isfinite(float(loss))
    assert float(aux["perceptual_loss"]) == 0.0
    assert np.isfinite(float(aux["adaptive_weight"]))


def test_discriminator_return_features():
    discr = Discriminator(dim=4, image_size=16, attn_res_layers=())
    dvars = discr.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    logits, feats = discr.apply(dvars, x, return_features=True)
    assert logits.shape == (2,)
    assert len(feats) >= 2  # one per block
    assert all(f.shape[0] == 2 for f in feats)
    # plain call unchanged
    logits2 = discr.apply(dvars, x)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2))


def test_generator_loss_differentiable(model_and_vars):
    model, variables = model_and_vars
    video = jax.random.uniform(jax.random.PRNGKey(1), (1, 5, 16, 16, 3))

    def f(params):
        v = {**variables, "params": params}
        (loss, _), _ = L.cvivit_generator_loss(
            model, v, video, jax.random.PRNGKey(3),
            use_vgg_and_gan=False, deterministic=True,
        )
        return loss

    grads = jax.grad(f)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0


def test_discriminator_loss_and_gp(model_and_vars):
    model, variables = model_and_vars
    discr = Discriminator(dim=4, image_size=16, attn_res_layers=())
    dvars = discr.init(jax.random.PRNGKey(4), jnp.zeros((1, 16, 16, 3)))
    video = jax.random.uniform(jax.random.PRNGKey(1), (2, 5, 16, 16, 3))
    loss, aux = L.cvivit_discriminator_loss(
        model, discr, variables, dvars, video, jax.random.PRNGKey(5),
        apply_grad_penalty=True,
    )
    assert np.isfinite(float(loss))
    assert float(aux["grad_penalty"]) > 0
    loss2, aux2 = L.cvivit_discriminator_loss(
        model, discr, variables, dvars, video, jax.random.PRNGKey(5),
        apply_grad_penalty=False,
    )
    assert float(aux2["grad_penalty"]) == 0.0


def test_discriminator_shapes():
    discr = Discriminator(dim=4, image_size=16, attn_res_layers=(8,))
    x = jax.random.uniform(jax.random.PRNGKey(0), (3, 16, 16, 3))
    dvars = discr.init(jax.random.PRNGKey(1), x)
    logits = discr.apply(dvars, x)
    assert logits.shape == (3,)


def test_vq_variant_forward():
    model = tiny_cvivit(lookup_free_quantization=False)
    video = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), video)
    recon, indices, aux = model.apply(variables, video)
    assert recon.shape == video.shape
    assert "vq_stats" in variables


def test_generator_loss_grayscale_vgg_path():
    """Quirk Q3: 1-channel video must work through the VGG perceptual loss
    (the reference's grayscale branch references undefined names)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from phenaki_tpu.models.cvivit import CViViT, Discriminator
    from phenaki_tpu.models.cvivit_losses import cvivit_generator_loss
    from phenaki_tpu.models.vgg import init_vgg

    model = CViViT(
        dim=32, codebook_size=64, image_size=16, patch_size=8,
        temporal_patch_size=2, spatial_depth=1, temporal_depth=1,
        dim_head=16, heads=2, channels=1,
    )
    video = jnp.asarray(np.random.rand(2, 3, 16, 16, 1), jnp.float32)
    vae_vars = model.init(jax.random.PRNGKey(0), video)
    discr = Discriminator(dim=4, image_size=(16, 16), channels=1, attn_res_layers=())
    discr_vars = discr.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 1)))
    vgg, vgg_vars = init_vgg()

    (loss, aux), _ = cvivit_generator_loss(
        model, vae_vars, video, jax.random.PRNGKey(2),
        discr=discr, discr_vars=discr_vars, vgg=vgg, vgg_vars=vgg_vars,
    )
    assert np.isfinite(float(loss))
    assert np.isfinite(float(aux["perceptual_loss"]))
