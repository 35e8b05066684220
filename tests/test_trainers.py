"""Trainer smoke tests (tiny configs): the reference-parity train loops run,
losses move, artifacts + checkpoints appear (SURVEY.md §3.1/§3.2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phenaki_tpu.data.codecs import video_tensor_to_gif
from phenaki_tpu.models.cvivit import CViViT
from phenaki_tpu.models.maskgit import MaskGit
from phenaki_tpu.models.phenaki import Phenaki

pytestmark = pytest.mark.slow  # big compiles / loops: not in the quick tier


def tiny_cvivit():
    return CViViT(
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


@pytest.fixture
def image_folder(tmp_path):
    from PIL import Image

    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(8):
        arr = (np.random.rand(16, 16, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i}.png")
    return str(d)


@pytest.fixture
def video_folder(tmp_path):
    d = tmp_path / "vids"
    d.mkdir()
    for i in range(4):
        video = np.random.rand(5, 16, 16, 3).astype(np.float32)
        video_tensor_to_gif(video, str(d / f"{i}.gif"), optimize=False)
    return str(d)


def test_cvivit_trainer_images_recon_only(image_folder, tmp_path):
    from phenaki_tpu.training.cvivit_trainer import CViViTTrainer

    trainer = CViViTTrainer(
        tiny_cvivit(),
        num_train_steps=3,
        batch_size=2,
        folder=image_folder,
        train_on_images=True,
        use_vgg_and_gan=False,
        valid_frac=0.25,
        save_results_every=2,
        save_model_every=2,
        results_folder=str(tmp_path / "results"),
        use_ema=True,
        log_every=1,
    )
    losses = []
    trainer.train(log_fn=lambda logs: losses.append(logs["loss"]))
    assert len(losses) == 3
    assert all(np.isfinite(l) for l in losses)
    assert trainer.step == 3
    # checkpoint written
    trainer.checkpoints.wait()
    assert trainer.checkpoints.latest_step is not None
    # recon grid written
    assert any((tmp_path / "results").glob("*.png"))


def test_cvivit_trainer_videos_with_gan(video_folder, tmp_path):
    from phenaki_tpu.training.cvivit_trainer import CViViTTrainer

    trainer = CViViTTrainer(
        tiny_cvivit(),
        num_train_steps=2,
        batch_size=2,
        folder=video_folder,
        num_frames=5,
        use_vgg_and_gan=True,
        discr_base_dim=4,
        discr_attn_res_layers=(),
        valid_frac=0.0,
        save_results_every=1000,
        save_model_every=1000,
        results_folder=str(tmp_path / "results"),
        use_ema=False,
        apply_grad_penalty_every=2,
        log_every=1,
    )
    logs = trainer.train_step()
    assert np.isfinite(logs["loss"])
    assert np.isfinite(logs["discr_loss"])
    assert logs["grad_penalty"] > 0  # step 0 applies the penalty
    logs2 = trainer.train_step()
    assert logs2["grad_penalty"] == 0.0  # step 1 skips it


def test_cvivit_trainer_save_load_roundtrip(image_folder, tmp_path):
    from phenaki_tpu.training.cvivit_trainer import CViViTTrainer

    trainer = CViViTTrainer(
        tiny_cvivit(),
        num_train_steps=1,
        batch_size=2,
        folder=image_folder,
        train_on_images=True,
        use_vgg_and_gan=False,
        valid_frac=0.0,
        save_results_every=1000,
        save_model_every=1000,
        results_folder=str(tmp_path / "results"),
    )
    trainer.train_step()
    trainer.save(7)
    trainer.checkpoints.wait()
    before = jax.device_get(trainer.state["vae_params"])
    trainer.train_step()  # params move
    trainer.load(7)
    after = jax.device_get(trainer.state["vae_params"])
    for a, b in zip(
        jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)
    ):
        np.testing.assert_allclose(a, b, atol=1e-6)


class MockTextVideoDataset:
    """The README's MockTextVideoDataset pattern (reference README.md:254-287)."""

    def __init__(self, length=8, image_size=16, num_frames=5):
        self.length = length
        self.shape = (num_frames, image_size, image_size, 3)

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        video = np.random.rand(*self.shape).astype(np.float32)
        return video, "a video of a cat"


def build_phenaki():
    cvivit = tiny_cvivit()
    cvivit_vars = cvivit.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16, 3)))
    maskgit = MaskGit(
        dim=32, num_tokens=64, max_seq_len=64, depth=1, heads=2, dim_head=16,
        dim_context=512,
    )
    return Phenaki(
        maskgit=maskgit,
        cvivit=cvivit,
        cvivit_vars=cvivit_vars,
        steps=2,
        t5_name="google/t5-v1_1-small",
        max_text_len=8,
    )


def test_phenaki_trainer_with_mock_dataset(tmp_path):
    from phenaki_tpu.training.phenaki_trainer import PhenakiTrainer

    trainer = PhenakiTrainer(
        build_phenaki(),
        dataset=MockTextVideoDataset(),
        batch_size=2,
        num_frames=5,
        sample_num_frames=3,
        train_num_steps=2,
        num_samples=1,
        save_and_sample_every=1000,
        results_folder=str(tmp_path / "results"),
        sample_texts=["a cat"],
        log_every=1,
    )
    loss1 = trainer.train_step()
    assert np.isfinite(loss1)
    assert trainer.dataset_fields == ("videos", "texts")
    loss2 = trainer.train_step()
    assert trainer.step == 2


def test_phenaki_trainer_sampling_artifacts(tmp_path):
    from phenaki_tpu.training.phenaki_trainer import PhenakiTrainer

    trainer = PhenakiTrainer(
        build_phenaki(),
        dataset=MockTextVideoDataset(length=4),
        batch_size=2,
        num_frames=5,
        sample_num_frames=3,
        train_num_steps=1,
        num_samples=1,
        save_and_sample_every=1,  # sample at the first step
        results_folder=str(tmp_path / "results"),
        sample_texts=["a cat dancing"],
    )
    trainer.train_step()
    trainer.checkpoints.wait()
    gifs = list((tmp_path / "results").glob("videos.*/*.gif"))
    assert len(gifs) >= 1
    assert trainer.checkpoints.latest_step is not None


def test_phenaki_trainer_image_mode(tmp_path):
    """Image co-training (reference quirk Q7 fixed): train on an image batch,
    periodically sample IMAGES and write a PNG grid."""
    from phenaki_tpu.training.phenaki_trainer import PhenakiTrainer

    class MockTextImageDataset:
        def __len__(self):
            return 8

        def __getitem__(self, idx):
            img = np.random.rand(16, 16, 3).astype(np.float32)
            return img, "a photo of a dog"

    trainer = PhenakiTrainer(
        build_phenaki(),
        dataset=MockTextImageDataset(),
        train_on_images=True,
        batch_size=2,
        train_num_steps=1,
        num_samples=1,
        save_and_sample_every=1,  # sample at the first step
        results_folder=str(tmp_path / "results"),
        sample_texts=["a dog"],
    )
    loss = trainer.train_step()
    assert np.isfinite(float(loss))
    trainer.checkpoints.wait()
    pngs = list((tmp_path / "results").glob("*.png"))
    assert len(pngs) >= 1, "image-mode sampling must write a PNG grid"


def test_phenaki_trainer_only_train_critic(tmp_path):
    """only_train_critic: maskgit grads are zeroed, critic params move
    (reference quirk Q6: its critic was never in any optimizer)."""
    from phenaki_tpu.models.maskgit import TokenCritic
    from phenaki_tpu.training.phenaki_trainer import PhenakiTrainer

    cvivit = tiny_cvivit()
    cvivit_vars = cvivit.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16, 3)))
    maskgit = MaskGit(
        dim=32, num_tokens=64, max_seq_len=64, depth=1, heads=2, dim_head=16,
        dim_context=512,
    )
    critic = TokenCritic(
        dim=32, num_tokens=64, max_seq_len=64, depth=1, heads=2, dim_head=16,
        has_cross_attn=True, dim_context=512,
    )
    ph = Phenaki(
        maskgit=maskgit, cvivit=cvivit, cvivit_vars=cvivit_vars, critic=critic,
        steps=2, t5_name="google/t5-v1_1-small", max_text_len=8,
    )
    trainer = PhenakiTrainer(
        ph,
        dataset=MockTextVideoDataset(),
        batch_size=2,
        num_frames=5,
        train_num_steps=1,
        num_samples=1,
        save_and_sample_every=1000,
        results_folder=str(tmp_path / "results"),
        sample_texts=["a cat"],
    )
    before = jax.device_get(trainer.state["params"])
    trainer.train_step(only_train_critic=True)
    after = jax.device_get(trainer.state["params"])

    def max_delta(a, b):
        return max(
            float(np.abs(np.asarray(x) - np.asarray(y)).max())
            for x, y in zip(
                jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
            )
        )

    assert max_delta(before["maskgit"], after["maskgit"]) == 0.0
    assert max_delta(before["critic"], after["critic"]) > 0.0


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_cvivit_trainer_true_resume_bitwise(tmp_path):
    """Resume parity with the reference (cvivit_trainer.py:176-196 packs both
    optimizers): train -> save -> reload into a FRESH trainer -> continue, and
    the continued trajectory is bit-identical to uninterrupted training.
    Covers Adam moments, MultiSteps accumulators, EMA state, and trainer rng."""
    from phenaki_tpu.training.cvivit_trainer import CViViTTrainer

    # all items identical -> every shuffled batch is the same tensor, so the
    # data stream is position-independent
    img = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
    dataset = [img] * 4

    def build(results):
        return CViViTTrainer(
            tiny_cvivit(),
            num_train_steps=10,
            batch_size=2,
            grad_accum_every=2,
            dataset=dataset,
            train_on_images=True,
            use_vgg_and_gan=False,
            valid_frac=0.0,
            save_results_every=10**9,
            save_model_every=10**9,
            results_folder=results,
            use_ema=True,
            seed=123,
        )

    # uninterrupted run: 4 steps
    tr_a = build(str(tmp_path / "a"))
    for _ in range(4):
        tr_a.train_step()
    ref_params = jax.device_get(tr_a.state["vae_params"])
    ref_ema = jax.device_get(tr_a.state["ema"].params)
    ref_opt = jax.device_get(tr_a.state["gen_opt_state"])

    # interrupted run: 2 steps -> save -> fresh trainer -> load -> 2 steps
    tr_b = build(str(tmp_path / "b"))
    tr_b.train_step()
    tr_b.train_step()
    tr_b.save(1)
    tr_b.checkpoints.wait()

    tr_c = build(str(tmp_path / "b"))
    tr_c.load(1)
    assert tr_c.step == 2
    tr_c.train_step()
    tr_c.train_step()

    _tree_equal(ref_params, jax.device_get(tr_c.state["vae_params"]))
    _tree_equal(ref_ema, jax.device_get(tr_c.state["ema"].params))
    _tree_equal(ref_opt, jax.device_get(tr_c.state["gen_opt_state"]))
    tr_a.checkpoints.close()
    tr_b.checkpoints.close()
    tr_c.checkpoints.close()


def test_phenaki_trainer_true_resume_bitwise(tmp_path):
    """Same bit-identical resume contract for PhenakiTrainer (reference
    phenaki_trainer.py:323-349 packs step/model/optimizer/scaler)."""
    from phenaki_tpu.training.phenaki_trainer import PhenakiTrainer

    video = np.random.RandomState(1).rand(5, 16, 16, 3).astype(np.float32)

    class FixedDataset:
        def __len__(self):
            return 4

        def __getitem__(self, idx):
            return video, "a video of a cat"

    def build(results):
        return PhenakiTrainer(
            build_phenaki(),
            dataset=FixedDataset(),
            batch_size=2,
            grad_accum_every=2,
            num_frames=5,
            train_num_steps=10,
            num_samples=1,
            save_and_sample_every=10**9,
            results_folder=results,
            sample_texts=["a cat"],
            seed=123,
        )

    tr_a = build(str(tmp_path / "a"))
    for _ in range(4):
        tr_a.train_step()
    ref_params = jax.device_get(tr_a.state["params"])
    ref_opt = jax.device_get(tr_a.state["opt_state"])

    tr_b = build(str(tmp_path / "b"))
    tr_b.train_step()
    tr_b.train_step()
    tr_b.save(1)
    tr_b.checkpoints.wait()

    tr_c = build(str(tmp_path / "b"))
    tr_c.load(1)
    assert tr_c.step == 2
    tr_c.train_step()
    tr_c.train_step()

    _tree_equal(ref_params, jax.device_get(tr_c.state["params"]))
    _tree_equal(ref_opt, jax.device_get(tr_c.state["opt_state"]))
    tr_a.checkpoints.close()
    tr_b.checkpoints.close()
    tr_c.checkpoints.close()


def test_ema_advances_once_per_outer_step(tmp_path):
    """Under grad accumulation the EMA must update on optimizer-step
    boundaries only — NOT once per micro-batch (which would shrink its time
    constant by the accumulation factor)."""
    from phenaki_tpu.training.cvivit_trainer import CViViTTrainer

    trainer = CViViTTrainer(
        tiny_cvivit(),
        num_train_steps=10,
        batch_size=2,
        grad_accum_every=4,
        dataset=[np.random.rand(16, 16, 3).astype(np.float32) for _ in range(8)],
        train_on_images=True,
        use_vgg_and_gan=False,
        valid_frac=0.0,
        save_results_every=10**9,
        save_model_every=10**9,
        results_folder=str(tmp_path / "results"),
        use_ema=True,
    )
    trainer.train_step()
    assert int(jax.device_get(trainer.state["ema"].step)) == 1
    trainer.train_step()
    assert int(jax.device_get(trainer.state["ema"].step)) == 2
    trainer.checkpoints.close()


def test_trainer_resume_with_grad_accum(tmp_path):
    """Regression: the device step counts MICRO-batches (grad_accum_every per
    outer step) — resume must restore the OUTER step count or every schedule
    shifts and training stops early."""
    from phenaki_tpu.training.cvivit_trainer import CViViTTrainer

    def build(results):
        return CViViTTrainer(
            tiny_cvivit(),
            num_train_steps=10,
            batch_size=2,
            grad_accum_every=2,
            dataset=[np.random.rand(16, 16, 3).astype(np.float32) for _ in range(8)],
            train_on_images=True,
            use_vgg_and_gan=False,
            valid_frac=0.0,
            save_results_every=1000,
            save_model_every=1000,
            results_folder=results,
            use_ema=False,
        )

    tr = build(str(tmp_path / "a"))
    tr.train_step()
    tr.train_step()
    tr.train_step()
    assert tr.step == 3
    tr.save(1)
    tr.checkpoints.wait()

    tr2 = build(str(tmp_path / "a"))
    tr2.load(1)
    assert tr2.step == 3, f"outer step must survive resume, got {tr2.step}"
    tr2.checkpoints.close()
    tr.checkpoints.close()
