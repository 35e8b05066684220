"""End-to-end Phenaki tests: training loss, jitted sampling loop, critic
variants, prime-frame chaining / make_video (tiny configs, CPU).

Mirrors the reference's README mock-data smoke tests (README.md:94-122,190-199)
as real assertions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phenaki_tpu.models.cvivit import CViViT
from phenaki_tpu.models.maskgit import MaskGit, TokenCritic
from phenaki_tpu.models.phenaki import Phenaki, make_video

pytestmark = pytest.mark.slow  # big compiles / loops: not in the quick tier

TEXT_DIM = 16


def build_phenaki(critic=None, self_token_critic=False, unconditional=False):
    cvivit = CViViT(
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
    cvivit_vars = cvivit.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16, 3)))
    maskgit = MaskGit(
        dim=32,
        num_tokens=64,
        max_seq_len=64,
        depth=1,
        heads=2,
        dim_head=16,
        dim_context=TEXT_DIM,
        unconditional=unconditional,
    )
    phenaki = Phenaki(
        maskgit=maskgit,
        cvivit=cvivit,
        cvivit_vars=cvivit_vars,
        critic=critic,
        self_token_critic=self_token_critic,
        steps=4,
        text_embed_dim=TEXT_DIM,
        max_text_len=6,
    )
    phenaki.init(jax.random.PRNGKey(1))
    return phenaki


def text_embeds(b):
    emb = jax.random.normal(jax.random.PRNGKey(7), (b, 6, TEXT_DIM))
    return emb.at[:, 4:].set(0.0)  # last positions = padding


def videos(b, f=5):
    return jax.random.uniform(jax.random.PRNGKey(3), (b, f, 16, 16, 3))


def test_loss_basic():
    p = build_phenaki()
    loss, metrics = p.loss(
        p.params, jax.random.PRNGKey(0), videos=videos(2), text_embeds=text_embeds(2)
    )
    assert np.isfinite(float(loss))
    assert "maskgit_loss" in metrics


def test_loss_differentiable_and_cond_dropout_fires():
    p = build_phenaki()

    def f(params, rng):
        loss, _ = p.loss(
            params, rng, videos=videos(2), text_embeds=text_embeds(2)
        )
        return loss

    g = jax.grad(f)(p.params, jax.random.PRNGKey(0))
    leaves = jax.tree_util.tree_leaves(g["maskgit"])
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert sum(float(jnp.sum(jnp.abs(l))) for l in leaves) > 0


def test_loss_with_precomputed_codebook_ids():
    p = build_phenaki()
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 2, 2, 2), 0, 64)
    loss, _ = p.loss(
        p.params,
        jax.random.PRNGKey(0),
        video_codebook_ids=ids,
        text_embeds=text_embeds(2),
    )
    assert np.isfinite(float(loss))


def test_loss_with_frame_mask():
    p = build_phenaki()
    mask = jnp.asarray([[True, True, True, False, False]] * 2)
    loss, _ = p.loss(
        p.params,
        jax.random.PRNGKey(0),
        videos=videos(2),
        video_frame_mask=mask,
        text_embeds=text_embeds(2),
    )
    assert np.isfinite(float(loss))


def test_loss_with_token_critic():
    critic = TokenCritic(
        dim=32, num_tokens=64, max_seq_len=64, depth=1, heads=2, dim_head=16,
        has_cross_attn=True, dim_context=TEXT_DIM,
    )
    p = build_phenaki(critic=critic)
    loss, metrics = p.loss(
        p.params, jax.random.PRNGKey(0), videos=videos(2), text_embeds=text_embeds(2)
    )
    assert np.isfinite(float(loss))
    assert "critic_loss" in metrics
    # only_train_critic: loss is the critic BCE alone
    loss_c, m_c = p.loss(
        p.params,
        jax.random.PRNGKey(0),
        videos=videos(2),
        text_embeds=text_embeds(2),
        only_train_critic=True,
    )
    np.testing.assert_allclose(float(loss_c), float(m_c["critic_loss"]), rtol=1e-6)
    # critic params receive gradient (reference quirk Q6 fixed)
    def f(params):
        l, _ = p.loss(
            params, jax.random.PRNGKey(0), videos=videos(2),
            text_embeds=text_embeds(2),
        )
        return l
    g = jax.grad(f)(p.params)
    critic_grad = sum(
        float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g["critic"])
    )
    assert critic_grad > 0


def test_loss_with_self_critic():
    p = build_phenaki(self_token_critic=True)
    loss, metrics = p.loss(
        p.params, jax.random.PRNGKey(0), videos=videos(2), text_embeds=text_embeds(2)
    )
    assert np.isfinite(float(loss))
    assert "critic_loss" in metrics


def test_sample_shapes_and_validity():
    p = build_phenaki()
    video = p.sample(
        num_frames=5, text_embeds=text_embeds(2), rng=jax.random.PRNGKey(0)
    )
    assert video.shape == (2, 5, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(video)))


def test_sample_images():
    p = build_phenaki()
    img = p.sample_images(text_embeds=text_embeds(1), rng=jax.random.PRNGKey(0))
    assert img.shape == (1, 16, 16, 3)


def test_sample_unconditional():
    p = build_phenaki(unconditional=True)
    video = p.sample(num_frames=3, batch_size=2, rng=jax.random.PRNGKey(0))
    assert video.shape == (2, 3, 16, 16, 3)


def test_sample_with_critic():
    critic = TokenCritic(
        dim=32, num_tokens=64, max_seq_len=64, depth=1, heads=2, dim_head=16,
        has_cross_attn=True, dim_context=TEXT_DIM,
    )
    p = build_phenaki(critic=critic)
    video = p.sample(
        num_frames=3, text_embeds=text_embeds(1), rng=jax.random.PRNGKey(0)
    )
    assert video.shape == (1, 3, 16, 16, 3)


def test_sample_with_self_critic():
    p = build_phenaki(self_token_critic=True)
    video = p.sample(
        num_frames=3, text_embeds=text_embeds(1), rng=jax.random.PRNGKey(0)
    )
    assert video.shape == (1, 3, 16, 16, 3)


def test_sample_with_prime_frames():
    p = build_phenaki()
    prime = videos(1, f=3)
    video = p.sample(
        num_frames=4,  # must be divisible by temporal_patch_size w/o first frame
        text_embeds=text_embeds(1),
        prime_frames=prime,
        rng=jax.random.PRNGKey(0),
    )
    assert video.shape == (1, 4, 16, 16, 3)


def test_make_video_scene_chaining():
    p = build_phenaki()
    entire, scenes = make_video(
        p, texts=["a", "b"], num_frames=(5, 4), prime_lengths=3,
    )
    assert len(scenes) == 2
    assert entire.shape[1] == 9


def test_texts_path_via_hash_encoder():
    """texts -> embeddings via the offline hash T5 fallback end to end."""
    cvivit = CViViT(
        dim=32, codebook_size=64, image_size=16, patch_size=8,
        temporal_patch_size=2, spatial_depth=1, temporal_depth=1,
        dim_head=16, heads=2,
    )
    cvivit_vars = cvivit.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16, 3)))
    maskgit = MaskGit(
        dim=32, num_tokens=64, max_seq_len=64, depth=1, heads=2, dim_head=16,
        dim_context=512,
    )
    p = Phenaki(
        maskgit=maskgit, cvivit=cvivit, cvivit_vars=cvivit_vars,
        steps=2, t5_name="google/t5-v1_1-small", max_text_len=8,
    )
    p.init(jax.random.PRNGKey(1))
    video = p.sample(
        num_frames=3, texts=["a cat on a table"], rng=jax.random.PRNGKey(0)
    )
    assert video.shape == (1, 3, 16, 16, 3)
    loss = p(videos(1, 3), texts=["a dog"], rng=jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_phenaki_save_load_roundtrip(tmp_path):
    """Model-level save/load (reference CViViT.load parity): params and
    tokenizer vars survive a round trip and sampling still works."""
    import jax
    import numpy as np

    ph = build_phenaki()
    before = jax.device_get(ph.params)
    ph.save(str(tmp_path / "ckpt"))

    ph2 = build_phenaki()
    ph2.load(str(tmp_path / "ckpt"))
    for a, b in zip(
        jax.tree_util.tree_leaves(before),
        jax.tree_util.tree_leaves(jax.device_get(ph2.params)),
    ):
        np.testing.assert_array_equal(a, b)

    video = ph2.sample(
        num_frames=3,
        text_embeds=np.random.RandomState(0).randn(1, 4, TEXT_DIM).astype(
            np.float32
        ),
        rng=jax.random.PRNGKey(0),
    )
    assert video.shape[1] == 3


def test_fused_ce_loss_path_matches_xla(monkeypatch):
    """Phenaki.loss through the fused projection+CE kernels (interpret mode)
    must match the XLA logits path: same loss, same gradients."""
    import phenaki_tpu.models.phenaki as phenaki_mod
    import phenaki_tpu.ops.pallas_ce as pce

    cvivit = CViViT(
        dim=32,
        codebook_size=512,  # vocab >= 512 so can_fuse_ce passes
        image_size=16,
        patch_size=8,
        temporal_patch_size=2,
        spatial_depth=1,
        temporal_depth=1,
        dim_head=16,
        heads=2,
    )
    cvivit_vars = cvivit.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16, 3)))
    maskgit = MaskGit(
        dim=128,  # multiple of 128 so can_fuse_ce passes
        num_tokens=512,
        max_seq_len=64,
        depth=1,
        heads=2,
        dim_head=16,
        dim_context=TEXT_DIM,
    )
    ph = Phenaki(
        maskgit=maskgit,
        cvivit=cvivit,
        cvivit_vars=cvivit_vars,
        steps=4,
        text_embed_dim=TEXT_DIM,
        max_text_len=6,
    )
    ph.init(jax.random.PRNGKey(1))

    videos = jax.random.uniform(jax.random.PRNGKey(2), (2, 3, 16, 16, 3))
    te = text_embeds(2)
    rng = jax.random.PRNGKey(3)

    def run(loss_fn_params):
        loss, metrics = ph.loss(
            loss_fn_params, rng, videos=videos, text_embeds=te, train=True
        )
        return loss

    # XLA reference path
    monkeypatch.setattr(phenaki_mod, "use_fused_ce", lambda: False)
    l_xla, g_xla = jax.value_and_grad(run)(ph.params)

    # fused path (interpret mode on CPU)
    monkeypatch.setattr(pce, "_INTERPRET", True)
    monkeypatch.setattr(phenaki_mod, "use_fused_ce", lambda: True)
    l_fused, g_fused = jax.value_and_grad(run)(ph.params)

    np.testing.assert_allclose(float(l_fused), float(l_xla), atol=1e-5, rtol=1e-5)
    flat_x, _ = jax.flatten_util.ravel_pytree(g_xla)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_fused)
    np.testing.assert_allclose(
        np.asarray(flat_f), np.asarray(flat_x), atol=3e-4, rtol=3e-4
    )
