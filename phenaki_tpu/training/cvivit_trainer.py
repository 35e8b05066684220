"""C-ViViT (VQGAN) trainer — reference cvivit_trainer.py:56-354, TPU-native.

Two-optimizer GAN loop as two jitted SPMD steps under a device mesh:

  * generator step: recon + perceptual + vq-aux + adaptive*gen loss, grads
    over the autoencoder params only, optax update (+ fused EMA update);
  * discriminator step: hinge/BCE + periodic R1 gradient penalty, grads over
    discriminator params only.

vs the reference:
  * no parameter-set subtraction (cvivit_trainer.py:101-103) — the
    discriminator/VGG own their params outright;
  * gradient accumulation via optax.MultiSteps instead of a host-side
    micro-batch loop (cvivit_trainer.py:231-243);
  * `accelerator.backward` DDP all-reduce -> batch sharded over the mesh 'dp'
    axis, XLA inserts the gradient all-reduce;
  * EMA runs inside the jitted step (ema-pytorch dep removed);
  * checkpoints via Orbax (async, sharded) instead of torch.save;
  * `wait_for_everyone` barriers are unnecessary under SPMD.

Reference quirk Q4 (undefined loss when apply_grad_penalty=False) is fixed:
the penalty is simply zero on non-penalty steps.
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from phenaki_tpu.data.codecs import video_tensor_to_gif
from phenaki_tpu.data.datasets import (
    DataLoader,
    ImageDataset,
    VideoDataset,
    cycle,
    random_split,
)
from phenaki_tpu.models.cvivit import CViViT, Discriminator
from phenaki_tpu.models.cvivit_losses import (
    cvivit_discriminator_loss,
    cvivit_generator_loss,
)
from phenaki_tpu.models.vgg import VGG16Features, init_vgg
from phenaki_tpu.parallel.mesh import (
    fully_addressable as _fully_addressable,
    make_mesh,
    place_like as _place_like,
    replicate,
    shard_batch,
    shard_like_params,
    shard_params,
)
from phenaki_tpu.training.checkpoint import CheckpointManager
from phenaki_tpu.training.ema import EMAState, ema_init, ema_update
from phenaki_tpu.training.optimizer import get_optimizer
from phenaki_tpu.utils.jit_init import jit_init
from phenaki_tpu.utils.image_grid import save_image_grid
from phenaki_tpu.utils.logging import accum_log, MetricLogger


def exists(v):
    return v is not None


class CViViTTrainer:
    def __init__(
        self,
        vae: CViViT,
        *,
        num_train_steps: int,
        batch_size: int,
        folder: Optional[str] = None,
        dataset=None,
        train_on_images: bool = False,
        num_frames: int = 17,
        lr: float = 3e-4,
        grad_accum_every: int = 1,
        wd: float = 0.0,
        max_grad_norm: Optional[float] = 0.5,
        discr_max_grad_norm: Optional[float] = None,
        save_results_every: int = 100,
        save_model_every: int = 1000,
        results_folder: str = "./results",
        # reference cvivit_trainer.py:171-174: y/n prompt before reusing a
        # non-empty results folder. None = prompt only on an attached TTY
        # (non-interactive runs keep existing files); True/False skip the
        # prompt (utils/results_folder.py).
        clear_previous_results: Optional[bool] = None,
        valid_frac: float = 0.05,
        random_split_seed: int = 42,
        use_ema: bool = True,
        ema_beta: float = 0.995,
        ema_update_after_step: int = 0,
        ema_update_every: int = 1,
        apply_grad_penalty_every: int = 4,
        use_vgg_and_gan: bool = True,
        use_hinge_loss: bool = True,
        # perceptual term when the GAN suite is on: "disc" matches
        # unit-normalized in-training discriminator features (default — the
        # measured A/B beats both recon-only and the random-VGG stand-in,
        # BASELINE.md), "vgg" is the reference's VGG16 feature MSE (pass
        # converted torchvision weights via vgg_params for the reference's
        # actual behavior; random VGG features measurably HURT), "none"
        # drops the term (cvivit_losses.cvivit_generator_loss)
        perceptual_mode: str = "disc",
        discr_base_dim: int = 16,
        discr_attn_res_layers: tuple = (16,),
        vgg_params: Optional[Dict] = None,
        mesh=None,
        fsdp: bool = False,
        seed: int = 42,
        log_every: int = 10,
        profile_dir: Optional[str] = None,
        profile_steps: tuple = (2, 4),
    ):
        self.vae = vae
        self.use_vgg_and_gan = use_vgg_and_gan
        self.use_hinge_loss = use_hinge_loss
        assert perceptual_mode in ("vgg", "disc", "none"), perceptual_mode
        if not exists(vgg_params) and perceptual_mode == "vgg":
            # real-weights hook (round-3 review #3): a torchvision VGG16
            # state-dict file supplied out of band (models/vgg.py). Gated on
            # an explicit perceptual_mode="vgg" so merely having the env var
            # set never silently overrides the measured "disc" default.
            import os

            vgg_path = os.environ.get("PHENAKI_VGG16_PATH")
            if vgg_path and os.path.isfile(vgg_path):
                from phenaki_tpu.models.vgg import load_vgg16_from_file

                vgg_params = load_vgg16_from_file(vgg_path)
        if exists(vgg_params):
            perceptual_mode = "vgg"  # explicit (converted) weights win
        self.perceptual_mode = perceptual_mode
        self.num_train_steps = num_train_steps
        self.batch_size = batch_size
        self.grad_accum_every = grad_accum_every
        self.save_results_every = save_results_every
        self.save_model_every = save_model_every
        self.apply_grad_penalty_every = apply_grad_penalty_every
        self.use_ema = use_ema
        self.ema_beta = ema_beta
        self.ema_update_after_step = ema_update_after_step
        self.ema_update_every = ema_update_every
        self.train_on_images = train_on_images
        self.log_every = log_every
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps

        self.mesh = mesh if exists(mesh) else make_mesh()
        self.logger = MetricLogger()
        import ml_dtypes

        # pixels cross host->device in the compute dtype (halves transfer)
        self._video_dtype = (
            ml_dtypes.bfloat16 if vae.dtype == jnp.bfloat16 else np.float32
        )

        rng = jax.random.PRNGKey(seed)
        rng, init_rng, discr_rng = jax.random.split(rng, 3)
        self.rng = rng

        # --- init params --- #
        image_hw = vae.image_hw
        if train_on_images:
            example = jnp.zeros((1, *image_hw, vae.channels))
        else:
            f = 1 + vae.temporal_patch_size
            example = jnp.zeros((1, f, *image_hw, vae.channels))
        vae_vars = jit_init(vae, init_rng, example)

        self.discr = None
        discr_vars = {"params": {}}
        self.vgg = None
        self.vgg_vars = None
        if use_vgg_and_gan:
            self.discr = Discriminator(
                dim=discr_base_dim,
                image_size=image_hw,
                channels=vae.channels,
                attn_res_layers=discr_attn_res_layers,
                dtype=vae.dtype,
            )
            discr_vars = jit_init(
                self.discr, discr_rng, jnp.zeros((1, *image_hw, vae.channels))
            )
            if self.perceptual_mode == "vgg":
                self.vgg, default_vgg = init_vgg(dtype=vae.dtype)
                self.vgg_vars = vgg_params if exists(vgg_params) else default_vgg

        # --- optimizers (reference optimizer.py via optax) --- #
        gen_opt = get_optimizer(lr=lr, wd=wd, max_grad_norm=max_grad_norm)
        discr_opt = get_optimizer(lr=lr, wd=wd, max_grad_norm=discr_max_grad_norm)
        if grad_accum_every > 1:
            gen_opt = optax.MultiSteps(gen_opt, grad_accum_every)
            discr_opt = optax.MultiSteps(discr_opt, grad_accum_every)
        self.gen_opt, self.discr_opt = gen_opt, discr_opt

        # params placed per the Megatron TP rules (replicated when tp == 1);
        # fsdp=True additionally shards large params (and so Adam moments +
        # EMA) over 'dp' ZeRO-3-style; moments/EMA inherit the shardings
        # through jitted init
        vae_params = shard_params(vae_vars["params"], self.mesh, fsdp=fsdp, copy=True)
        discr_params = shard_params(discr_vars["params"], self.mesh, fsdp=fsdp, copy=True)
        self.state = {
            "vae_params": vae_params,
            "vq_stats": replicate(vae_vars.get("vq_stats", {}), self.mesh, copy=True),
            "discr_params": discr_params,
            # jit(opt.init)/jit(ema_init) don't propagate input shardings
            # (zeros_like/copies come back single-device) — place moments
            # and EMA explicitly to mirror the param tp/fsdp placements
            "gen_opt_state": shard_like_params(
                jax.jit(gen_opt.init)(vae_params), vae_params, self.mesh,
                fsdp=fsdp, copy=True,
            ),
            "discr_opt_state": shard_like_params(
                jax.jit(discr_opt.init)(discr_params), discr_params,
                self.mesh, fsdp=fsdp, copy=True,
            ),
            "ema": (
                shard_like_params(
                    jax.jit(ema_init)(vae_params), vae_params, self.mesh,
                    fsdp=fsdp, copy=True,
                )
                if use_ema
                else None
            ),
            "step": replicate(jnp.zeros((), jnp.int32), self.mesh),
        }
        if self.vgg_vars is not None:
            self.vgg_vars = replicate(self.vgg_vars, self.mesh)

        # --- dataset / loaders --- #
        self.dl_iter = None
        self.valid_dl_iter = None
        if exists(dataset) or exists(folder):
            if exists(dataset):
                self.ds = dataset
            elif train_on_images:
                assert vae.channels == 3, (
                    "ImageDataset decodes RGB; set channels=3 or pass a custom"
                    " dataset for grayscale"
                )
                self.ds = ImageDataset(folder, image_hw)
            else:
                self.ds = VideoDataset(
                    folder, image_hw, channels=vae.channels, num_frames=num_frames
                )

            if valid_frac > 0:
                self.ds, self.valid_ds = random_split(
                    self.ds, valid_frac, seed=random_split_seed
                )
                self.print(
                    f"training with dataset of {len(self.ds)} samples and "
                    f"validating with randomly splitted {len(self.valid_ds)} samples"
                )
            else:
                self.valid_ds = self.ds
                self.print(
                    f"training with shared training and valid dataset of "
                    f"{len(self.ds)} samples"
                )

            # multi-host: `batch_size` is the GLOBAL batch; each process loads
            # a disjoint shard of it (reference parity: Accelerate
            # split_batches) and shard_batch assembles the global array
            pc, pi = jax.process_count(), jax.process_index()
            assert batch_size % pc == 0, (
                f"global batch ({batch_size}) must divide process count ({pc})"
            )
            loader_kwargs = dict(
                batch_size=batch_size // pc,
                num_shards=pc,
                shard_id=pi,
                post_collate=self._cast_batch,
            )
            self.dl_iter = cycle(DataLoader(self.ds, **loader_kwargs))
            self.valid_dl_iter = cycle(DataLoader(self.valid_ds, **loader_kwargs))

        self._host_step = 0
        from phenaki_tpu.utils.results_folder import prepare_results_folder

        self.results_folder = prepare_results_folder(
            results_folder, clear_previous_results
        )
        self.checkpoints = CheckpointManager(self.results_folder / "checkpoints")

        # --- jitted steps --- #
        # donate the state: outputs alias input buffers, so (a) state memory
        # doesn't double per step and (b) a training loop dispatching steps
        # back-to-back (the trainers never sync on the loss) can't pile up
        # N in-flight full-state allocations — at the flagship config that
        # overcommitted HBM and collapsed throughput ~30x. Old state objects
        # are invalid after a step, as in any donated JAX train loop.
        self._gen_step = jax.jit(self._make_gen_step(), donate_argnums=(0,))
        # apply_grad_penalty is a TRACED bool (lax.cond in the loss): one
        # discriminator executable for both penalty and plain steps —
        # keeping them as separate (static-arg) programs thrashed the
        # device program store when alternating with the generator step
        self._discr_step = (
            jax.jit(self._make_discr_step(), donate_argnums=(0,))
            if use_vgg_and_gan
            else None
        )

    # ------------------------------------------------------------------ #

    def print(self, msg):
        if jax.process_index() == 0:
            print(msg)

    def _cast_batch(self, batch):
        """DataLoader post_collate hook: cast float pixel arrays to the
        compute dtype inside the prefetch thread, off the step path."""
        return tuple(
            np.asarray(el, self._video_dtype)
            if isinstance(el, np.ndarray) and np.issubdtype(el.dtype, np.floating)
            else el
            for el in batch
        )

    @property
    def step(self) -> int:
        # host-side mirror: reading the device counter would force a sync
        # (one tunnel round trip) on every access
        return self._host_step

    def _make_gen_step(self):
        vae, discr, vgg = self.vae, self.discr, self.vgg
        use_gan = self.use_vgg_and_gan
        mutable_vq = not vae.lookup_free_quantization
        # pin updated params to their placement (tp/fsdp) — don't let the
        # SPMD partitioner reshard the state between steps. Only on real
        # multi-device meshes: on a single chip the constraint is a no-op
        # semantically but this backend lowers it to per-leaf device copies
        # (measured 54 s/step vs 0.5 s at the flagship config)
        vae_shardings = (
            jax.tree_util.tree_map(
                lambda x: x.sharding, self.state["vae_params"]
            )
            if self.mesh.devices.size > 1
            else None
        )

        def gen_step(state, vgg_vars, batch, rng):
            def loss_fn(vae_params):
                vae_vars = {"params": vae_params}
                if mutable_vq:
                    vae_vars["vq_stats"] = state["vq_stats"]
                (loss, aux), new_vq = cvivit_generator_loss(
                    vae,
                    vae_vars,
                    batch,
                    rng,
                    discr=discr,
                    discr_vars={"params": state["discr_params"]} if use_gan else None,
                    vgg=vgg,
                    vgg_vars=vgg_vars,
                    use_vgg_and_gan=use_gan,
                    use_hinge_loss=self.use_hinge_loss,
                    deterministic=True,
                    mutable_vq=mutable_vq,
                    perceptual_mode=self.perceptual_mode,
                )
                aux["new_vq"] = new_vq
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["vae_params"]
            )
            updates, new_opt_state = self.gen_opt.update(
                grads, state["gen_opt_state"], state["vae_params"]
            )
            new_params = optax.apply_updates(state["vae_params"], updates)
            if vae_shardings is not None:
                new_params = jax.lax.with_sharding_constraint(
                    new_params, vae_shardings
                )

            new_state = dict(state)
            new_state["vae_params"] = new_params
            new_state["gen_opt_state"] = new_opt_state
            if mutable_vq and aux["new_vq"] is not None:
                new_state["vq_stats"] = aux["new_vq"]["vq_stats"]
            if self.use_ema:
                # under MultiSteps accumulation, params only change when the
                # accumulator wraps (mini_step back to 0) — gate the EMA on
                # that boundary so it advances once per OUTER optimizer step
                did_opt_step = (
                    new_opt_state.mini_step == 0
                    if self.grad_accum_every > 1
                    else None
                )
                new_state["ema"] = ema_update(
                    state["ema"],
                    new_params,
                    decay=self.ema_beta,
                    update_after_step=self.ema_update_after_step,
                    update_every=self.ema_update_every,
                    apply=did_opt_step,
                )
            new_state["step"] = state["step"] + 1

            metrics = {
                "loss": loss,
                "recon_loss": aux["recon_loss"],
                "vq_aux_loss": aux["vq_aux_loss"],
            }
            if use_gan:
                metrics["perceptual_loss"] = aux["perceptual_loss"]
                metrics["gen_loss"] = aux["gen_loss"]
                metrics["adaptive_weight"] = aux["adaptive_weight"]
            return new_state, metrics

        return gen_step

    def _make_discr_step(self):
        vae, discr = self.vae, self.discr
        discr_shardings = (
            jax.tree_util.tree_map(
                lambda x: x.sharding, self.state["discr_params"]
            )
            if self.mesh.devices.size > 1
            else None
        )

        def discr_step(state, batch, rng, apply_grad_penalty):
            apply_grad_penalty = jnp.asarray(apply_grad_penalty, bool)
            def loss_fn(discr_params):
                loss, aux = cvivit_discriminator_loss(
                    vae,
                    discr,
                    {"params": state["vae_params"], **(
                        {"vq_stats": state["vq_stats"]} if state["vq_stats"] else {}
                    )},
                    {"params": discr_params},
                    batch,
                    rng,
                    apply_grad_penalty=apply_grad_penalty,
                    use_hinge_loss=self.use_hinge_loss,
                )
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["discr_params"]
            )
            updates, new_opt_state = self.discr_opt.update(
                grads, state["discr_opt_state"], state["discr_params"]
            )
            new_params = optax.apply_updates(state["discr_params"], updates)
            if discr_shardings is not None:
                new_params = jax.lax.with_sharding_constraint(
                    new_params, discr_shardings
                )

            new_state = dict(state)
            new_state["discr_params"] = new_params
            new_state["discr_opt_state"] = new_opt_state
            return new_state, {"discr_loss": aux["discr_loss"], "grad_penalty": aux["grad_penalty"]}

        return discr_step

    # ------------------------------------------------------------------ #

    def _maybe_profile(self, step: int) -> None:
        """jax.profiler capture of steps [start, stop) when profile_dir is
        set (SURVEY.md §5.1: tracing hooks the reference lacks)."""
        if not self.profile_dir:
            return
        start, stop = self.profile_steps
        if step == start:
            jax.profiler.start_trace(self.profile_dir)
        elif step == stop:
            jax.profiler.stop_trace()

    def train_step(self) -> Dict[str, float]:
        assert self.dl_iter is not None, "no dataset configured"
        steps = self.step
        self._maybe_profile(steps)
        apply_gp = (steps % self.apply_grad_penalty_every) == 0

        logs: Dict[str, float] = {}

        # generator phase (+ accumulation)
        for _ in range(self.grad_accum_every):
            (batch, *_r) = next(self.dl_iter)
            batch = shard_batch(
                jnp.asarray(np.asarray(batch, self._video_dtype)), self.mesh
            )
            self.rng, sub = jax.random.split(self.rng)
            self.state, metrics = self._gen_step(
                self.state, self.vgg_vars, batch, sub
            )
            # metrics stay on device — fetching per micro-batch serializes
            # dispatch with the host (reference quirk: its .item() logging
            # forced a device sync per micro-batch, SURVEY §3.1)
            accum_log(
                logs,
                {k: v / self.grad_accum_every for k, v in metrics.items()},
            )

        # discriminator phase
        if self.use_vgg_and_gan:
            for _ in range(self.grad_accum_every):
                (batch, *_r) = next(self.dl_iter)
                batch = shard_batch(
                    jnp.asarray(np.asarray(batch, self._video_dtype)), self.mesh
                )
                self.rng, sub = jax.random.split(self.rng)
                self.state, metrics = self._discr_step(
                    self.state, batch, sub, apply_grad_penalty=apply_gp
                )
                accum_log(
                    logs,
                    {k: v / self.grad_accum_every for k, v in metrics.items()},
                )
            if steps % self.log_every == 0:
                self.print(
                    f"{steps}: vae loss: {float(logs['loss']):.4f} - "
                    f"discr loss: {float(logs['discr_loss']):.4f}"
                )
        elif steps % self.log_every == 0:
            self.print(f"{steps}: vae loss: {float(logs['loss']):.4f}")

        # periodic reconstructions
        if steps % self.save_results_every == 0:
            self._save_results(steps)

        # periodic model checkpoints
        if steps % self.save_model_every == 0:
            self.save(steps)

        self._host_step += 1
        self.logger.log(steps, logs)
        return logs

    def _eval_variables(self, use_ema: bool):
        params = (
            self.state["ema"].params
            if (use_ema and self.use_ema)
            else self.state["vae_params"]
        )
        variables = {"params": params}
        if self.state["vq_stats"]:
            variables["vq_stats"] = self.state["vq_stats"]
        return variables

    def _save_results(self, steps: int):
        if self.valid_dl_iter is None or jax.process_index() != 0:
            return
        if not _fully_addressable(self.state["vae_params"]):
            # cross-host sharded (fsdp multi-host) params cannot be consumed
            # on one process; skip the recon artifacts, keep checkpoints
            self.print(f"{steps}: skipping recon artifacts (params sharded across hosts)")
            return
        (valid_batch, *_r) = next(self.valid_dl_iter)
        valid_batch = jnp.asarray(valid_batch)
        is_video = valid_batch.ndim == 5

        to_eval = [(False, str(steps))]
        if self.use_ema:
            to_eval.insert(0, (True, f"{steps}.ema"))

        for use_ema, filename in to_eval:
            variables = self._eval_variables(use_ema)
            recons, _, _ = self.vae.apply(variables, valid_batch)
            recons = np.asarray(jax.device_get(recons))

            if is_video:
                sampled_videos_path = self.results_folder / f"samples.{filename}"
                sampled_videos_path.mkdir(parents=True, exist_ok=True)
                for i, tensor in enumerate(recons):
                    video_tensor_to_gif(
                        tensor, str(sampled_videos_path / f"{filename}-{i}.gif")
                    )
            else:
                originals = np.asarray(jax.device_get(valid_batch))
                interleaved = np.stack([originals, recons], axis=1).reshape(
                    -1, *recons.shape[1:]
                )
                save_image_grid(
                    np.clip(interleaved, 0.0, 1.0),
                    str(self.results_folder / f"{filename}.png"),
                    nrow=2,
                )
        self.print(f"{steps}: saving to {self.results_folder}")

    def _ckpt_tree(self):
        """Everything needed for TRUE resume (reference
        cvivit_trainer.py:176-196 packs model + both optimizers): params,
        both optimizer states (incl. MultiSteps accumulators), EMA (params AND
        step counter), the trainer rng, and both step counters."""
        return {
            "vae_params": self.state["vae_params"],
            "vq_stats": self.state["vq_stats"],
            "discr_params": self.state["discr_params"],
            "gen_opt_state": self.state["gen_opt_state"],
            "discr_opt_state": self.state["discr_opt_state"],
            "ema": self.state["ema"] if self.use_ema else None,
            "rng": self.rng,
            "step": self.state["step"],
            "host_step": jnp.asarray(self._host_step, jnp.int32),
        }

    def save(self, milestone: int):
        # hand the (possibly cross-host-sharded) device arrays straight to
        # Orbax — each host writes its own shards; jax.device_get here would
        # raise on non-fully-addressable fsdp/multi-host state (round-2 review)
        self.checkpoints.save(milestone, self._ckpt_tree())
        self.print(f"{self.step}: saving model to {self.results_folder}")

    def load(self, milestone: Optional[int] = None):
        # layout detection from METADATA (no array data loaded): round-1
        # checkpoints lack optimizer state and need the legacy path
        try:
            meta = self.checkpoints.metadata(milestone)
            legacy = "gen_opt_state" not in meta
        except Exception:
            legacy = "gen_opt_state" not in self.checkpoints.restore(milestone)
        if legacy:
            return self._load_legacy(self.checkpoints.restore(milestone))
        # re-restore WITH the live sharded state as template: optax NamedTuple
        # states come back as the right container types AND every leaf is
        # restored directly into the live sharding (multi-host safe; Orbax
        # reshards if the checkpoint was written on a different topology)
        template = self._ckpt_tree()
        restored = self.checkpoints.restore(milestone, template=template)
        new_state = dict(self.state)
        # place restored leaves with the LIVE state's shardings (preserves the
        # TP placement; equals replication on a dp-only mesh)
        for k in (
            "vae_params",
            "vq_stats",
            "discr_params",
            "gen_opt_state",
            "discr_opt_state",
        ):
            new_state[k] = _place_like(self.state[k], restored[k])
        if self.use_ema and restored.get("ema") is not None:
            new_state["ema"] = _place_like(self.state["ema"], restored["ema"])
        new_state["step"] = _place_like(
            self.state["step"], jnp.asarray(restored["step"], jnp.int32)
        )
        self.state = new_state
        # uncommitted host copy: a device-0-committed rng would conflict with
        # the mesh-placed state args inside the jitted step
        self.rng = jnp.asarray(jax.device_get(restored["rng"]))
        self._host_step = int(restored["host_step"])

    def _load_legacy(self, restored):
        """Round-1 checkpoints: no optimizer state (Adam moments re-init)."""
        new_state = dict(self.state)
        new_state["vae_params"] = _place_like(
            self.state["vae_params"], restored["vae_params"]
        )
        if restored.get("vq_stats"):
            new_state["vq_stats"] = _place_like(
                self.state["vq_stats"], restored["vq_stats"]
            )
        new_state["discr_params"] = _place_like(
            self.state["discr_params"], restored["discr_params"]
        )
        if self.use_ema and restored.get("ema_params") is not None:
            new_state["ema"] = EMAState(
                params=_place_like(
                    self.state["ema"].params, restored["ema_params"]
                ),
                step=_place_like(
                    self.state["ema"].step,
                    jnp.asarray(restored["step"], jnp.int32),
                ),
            )
        new_state["step"] = _place_like(
            self.state["step"], jnp.asarray(restored["step"], jnp.int32)
        )
        self.state = new_state
        # device 'step' counts micro-batches; host_step counts outer steps
        self._host_step = int(
            restored.get(
                "host_step", int(restored["step"]) // self.grad_accum_every
            )
        )

    def train(self, log_fn=None):
        while self.step < self.num_train_steps:
            logs = self.train_step()
            if exists(log_fn):
                log_fn(logs)
        self.print("training complete")
