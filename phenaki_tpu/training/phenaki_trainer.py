"""Phenaki (MaskGit + critic) trainer — reference phenaki_trainer.py:174-470,
TPU-native.

Single-optimizer loop over the Phenaki masked-token loss as one jitted SPMD
step (batch sharded over the mesh 'dp' axis). vs the reference:

  * the optimizer covers maskgit AND critic params (reference quirk Q6: its
    optimizer only holds maskgit params, so the critic loss never trains
    anything — fixed here; `only_train_generator`/`only_train_critic` select
    the trainable subset via optax masking of the gradients);
  * grad accumulation via optax.MultiSteps; AMP -> bf16 compute dtype on the
    modules (no loss-scaler needed on TPU);
  * type-driven dataset-field inference kept (videos / texts /
    video_codebook_ids / video_frame_mask / text_embeds recognized by
    dtype/ndim like the reference's beartype dispatch,
    phenaki_trainer.py:42-60,160-170);
  * periodic text-conditioned sampling in batch groups + gif/png artifacts,
    checkpoints via Orbax. Reference quirk Q7 (broken image-mode sampling)
    fixed.
"""

from __future__ import annotations

import math
from functools import partial
from pathlib import Path
from random import choices
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from phenaki_tpu.data.codecs import video_tensor_to_gif
from phenaki_tpu.data.datasets import DataLoader, ImageDataset, VideoDataset, cycle
from phenaki_tpu.models.phenaki import Phenaki
from phenaki_tpu.parallel.mesh import (
    MODEL_AXIS,
    fully_addressable as _fully_addressable,
    make_mesh,
    place_like as _place_like,
    replicate,
    shard_batch,
    shard_like_params,
    shard_params,
)
from phenaki_tpu.training.checkpoint import CheckpointManager
from phenaki_tpu.training.optimizer import get_optimizer
from phenaki_tpu.utils.image_grid import save_image_grid
from phenaki_tpu.utils.logging import MetricLogger


def exists(v):
    return v is not None


def num_to_groups(num: int, divisor: int) -> List[int]:
    groups, rem = divmod(num, divisor)
    out = [divisor] * groups
    if rem > 0:
        out.append(rem)
    return out


def simple_slugify(text: str, max_length: int = 255) -> str:
    return (
        text.replace("-", "_")
        .replace(",", "")
        .replace(" ", "_")
        .replace("|", "--")
        .strip("-_")[:max_length]
    )


def determine_field(el: Any) -> str:
    """Dtype/ndim-driven field inference (reference DATASET_FIELD_TYPE_CONFIG,
    phenaki_trainer.py:42-60). Channels-last layout: videos are float ndim 4
    (image batch) or 5 (video batch)."""
    if isinstance(el, list) and all(isinstance(x, str) for x in el):
        return "texts"
    arr = np.asarray(el)
    if arr.dtype == np.bool_:
        return "video_frame_mask"
    if jnp.issubdtype(arr.dtype, jnp.integer):
        return "video_codebook_ids"
    # jnp.issubdtype (not np): pixel batches may already be bfloat16
    # (ml_dtypes), which numpy does not classify as floating
    if jnp.issubdtype(arr.dtype, jnp.floating):
        if arr.ndim == 3:
            return "text_embeds"
        if arr.ndim in (4, 5):
            return "videos"
    raise TypeError(f"unable to determine type of dataset field (shape {arr.shape})")


def determine_types(data: Sequence[Any]) -> Tuple[str, ...]:
    return tuple(determine_field(el) for el in data)


class PhenakiTrainer:
    def __init__(
        self,
        phenaki: Phenaki,
        *,
        folder: Optional[str] = None,
        train_on_images: bool = False,
        batch_size: int = 16,
        grad_accum_every: int = 1,
        num_frames: int = 17,
        sample_num_frames: Optional[int] = None,
        train_lr: float = 1e-4,
        train_num_steps: int = 100000,
        max_grad_norm: Optional[float] = None,
        adam_betas: Tuple[float, float] = (0.9, 0.99),
        wd: float = 0.0,
        save_and_sample_every: int = 1000,
        num_samples: int = 25,
        results_folder: str = "./results",
        # y/n guard before reusing a non-empty results folder (reference
        # cvivit_trainer.py:171-174; see utils/results_folder.py). None =
        # prompt only on a TTY; non-interactive runs keep existing files.
        clear_previous_results: Optional[bool] = None,
        sample_texts_file_path: Optional[str] = None,
        sample_texts: Optional[List[str]] = None,
        dataset=None,
        dataset_fields: Optional[Tuple[str, ...]] = None,
        mesh=None,
        fsdp: bool = False,
        pp: int = 1,
        pipeline_microbatches: Optional[int] = None,
        seed: int = 42,
        log_every: int = 10,
        profile_dir: Optional[str] = None,
        profile_steps: Tuple[int, int] = (2, 4),
    ):
        self.model = phenaki
        assert phenaki.cvivit is not None, "cvivit must be present on phenaki"
        self.unconditional = phenaki.unconditional

        self.batch_size = batch_size
        self.grad_accum_every = grad_accum_every
        self.train_num_steps = train_num_steps
        self.image_size = phenaki.cvivit.image_hw
        self.train_on_images = train_on_images
        self.sample_num_frames = (
            sample_num_frames if exists(sample_num_frames) else num_frames
        )
        self.num_samples = num_samples
        self.save_and_sample_every = save_and_sample_every
        self.log_every = log_every
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps

        assert (
            int(math.isqrt(num_samples)) ** 2 == num_samples
        ), "number of samples must have an integer square root"

        # sample captions (reference :241-250)
        self.sample_texts = None
        if exists(sample_texts_file_path):
            p = Path(sample_texts_file_path)
            assert p.exists()
            self.sample_texts = [t for t in p.read_text().split("\n") if len(t)]
        elif exists(sample_texts):
            self.sample_texts = sample_texts
        assert self.unconditional or exists(self.sample_texts), (
            "sample_texts or sample_texts_file_path must be given for"
            " text-conditioned training"
        )

        self.mesh = mesh if exists(mesh) else make_mesh(pp=pp)
        self.logger = MetricLogger()
        self.rng = jax.random.PRNGKey(seed)

        # pipeline parallelism (GPipe over the maskgit/critic trunk layers —
        # parallel/pipeline.py): a 'pp' mesh axis routes the trunks through
        # the pipelined schedule; composes with dp (each dp row runs its own
        # pipeline over its microbatches)
        pp_size = self.mesh.shape.get("pp", 1)
        if pp_size > 1:
            assert phenaki.maskgit.scan_layers, (
                "pipeline parallelism needs MaskGit(scan_layers=True)"
                " (stacked per-layer params shard over 'pp')"
            )
            # composes with tp: the pipeline's layer body runs manual
            # Megatron TP per stage (parallel/pipeline.py module docstring);
            # heads must divide the tp axis
            tp_size = self.mesh.shape.get(MODEL_AXIS, 1)
            assert phenaki.maskgit.heads % tp_size == 0, (
                f"heads ({phenaki.maskgit.heads}) % tp ({tp_size})"
            )
            assert phenaki.maskgit.depth % pp_size == 0
            phenaki.pipeline_mesh = self.mesh
            phenaki.pipeline_microbatches = pipeline_microbatches

        # dataset / dataloader
        self.dl = None
        if exists(dataset):
            self.ds = dataset
        elif train_on_images:
            assert exists(folder)
            self.ds = ImageDataset(folder, self.image_size)
        elif exists(folder):
            self.ds = VideoDataset(folder, self.image_size, num_frames=num_frames)
        else:
            self.ds = None
        if exists(self.ds):
            # multi-host: `batch_size` is the GLOBAL batch; each process loads
            # a disjoint shard (reference parity: Accelerate split_batches)
            pc, pi = jax.process_count(), jax.process_index()
            assert batch_size % pc == 0, (
                f"global batch ({batch_size}) must divide process count ({pc})"
            )
            self.dl = cycle(
                DataLoader(
                    self.ds,
                    batch_size=batch_size // pc,
                    num_shards=pc,
                    shard_id=pi,
                    post_collate=self._cast_videos_in_batch,
                )
            )

        valid_fields = {
            "videos",
            "texts",
            "video_codebook_ids",
            "video_frame_mask",
            "text_embeds",
        }
        if exists(dataset_fields):
            assert len(set(dataset_fields)) == len(dataset_fields)
            assert set(dataset_fields) <= valid_fields
        self.dataset_fields = dataset_fields

        # optimizer over maskgit + critic params (quirk Q6 fixed)
        if phenaki.params is None:
            phenaki.init(jax.random.PRNGKey(seed + 1))
        opt = get_optimizer(
            lr=train_lr, wd=wd, betas=adam_betas, max_grad_norm=max_grad_norm
        )
        if grad_accum_every > 1:
            opt = optax.MultiSteps(opt, grad_accum_every)
        self.opt = opt

        # place params per the Megatron TP rules (replicated when tp == 1,
        # attention/FF/vocab dims sharded over 'tp' otherwise); with
        # fsdp=True, large params additionally shard over 'dp' (ZeRO-3 —
        # params all-gathered on use, grads reduce-scattered, Adam moments
        # sharded); moments inherit the param shardings through jitted init
        params = shard_params(phenaki.params, self.mesh, fsdp=fsdp, copy=True)
        self.state = {
            "params": params,
            # jit(opt.init) does not propagate input shardings (zeros_like
            # broadcasts come back single-device) — place moments explicitly
            # to mirror the param tp/fsdp placements
            "opt_state": shard_like_params(
                jax.jit(opt.init)(params), params, self.mesh, fsdp=fsdp,
                copy=True,
            ),
            "step": replicate(jnp.zeros((), jnp.int32), self.mesh),
        }
        self.tp_size = self.mesh.shape.get(MODEL_AXIS, 1)
        # the frozen tokenizer rides along as a step argument — pin it to the
        # mesh so a tp>1 step doesn't mix differently-placed inputs
        self.model.cvivit_vars = replicate(self.model.cvivit_vars, self.mesh)

        from phenaki_tpu.utils.results_folder import prepare_results_folder

        self.results_folder = prepare_results_folder(
            results_folder, clear_previous_results
        )
        self.checkpoints = CheckpointManager(self.results_folder / "checkpoints")
        self._host_step = 0
        import ml_dtypes

        self._video_dtype = (
            ml_dtypes.bfloat16
            if phenaki.cvivit.dtype == jnp.bfloat16
            else np.float32
        )

        # state donated: outputs alias inputs — no per-step state copy, and
        # back-to-back dispatched steps can't accumulate in-flight states
        # (see cvivit_trainer.py)
        self._train_step = jax.jit(
            self._make_train_step(),
            static_argnames=("only_train_generator", "only_train_critic", "fields"),
            donate_argnums=(0,),
        )

    # ------------------------------------------------------------------ #

    def print(self, msg):
        if jax.process_index() == 0:
            print(msg)

    def _cast_videos_in_batch(self, batch):
        """DataLoader post_collate hook: cast float pixel fields (ndim >= 4)
        to the compute dtype inside the prefetch thread, off the step path."""
        return tuple(
            np.asarray(el, self._video_dtype)
            if isinstance(el, np.ndarray)
            and np.issubdtype(el.dtype, np.floating)
            and el.ndim >= 4
            else el
            for el in batch
        )

    @property
    def step(self) -> int:
        # host-side mirror: reading the device counter would force a sync
        # (and through a tunneled backend, a full round trip) on every access
        return self._host_step

    def _make_train_step(self):
        model = self.model
        has_critic = model.critic is not None
        # pin updated params to their placement (tp/fsdp) — don't let the
        # SPMD partitioner reshard the state between steps. Only on real
        # multi-device meshes: this backend lowers a single-device
        # constraint to per-leaf device copies (see cvivit_trainer.py)
        param_shardings = (
            jax.tree_util.tree_map(
                lambda x: x.sharding, self.state["params"]
            )
            if self.mesh.devices.size > 1
            else None
        )

        def train_step(
            state,
            batch: Tuple,
            rng,
            cvivit_vars,  # frozen tokenizer weights as an ARG (not a baked
            # constant): keeps the compiled program small (remote-compile
            # body caps) and swap-safe
            fields: Tuple[str, ...],
            only_train_generator: bool = False,
            only_train_critic: bool = False,
        ):
            kwargs = dict(zip(fields, batch))

            def loss_fn(params):
                return model.loss(
                    params,
                    rng,
                    only_train_generator=only_train_generator,
                    only_train_critic=only_train_critic,
                    cvivit_vars=cvivit_vars,
                    **kwargs,
                )

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["params"]
            )

            # freeze the untargeted half when only_train_* is set
            if has_critic and not model.self_token_critic:
                if only_train_critic:
                    grads["maskgit"] = jax.tree_util.tree_map(
                        jnp.zeros_like, grads["maskgit"]
                    )
                if only_train_generator and grads.get("critic") is not None:
                    grads["critic"] = jax.tree_util.tree_map(
                        jnp.zeros_like, grads["critic"]
                    )

            updates, new_opt_state = self.opt.update(
                grads, state["opt_state"], state["params"]
            )
            new_params = optax.apply_updates(state["params"], updates)
            if param_shardings is not None:
                new_params = jax.lax.with_sharding_constraint(
                    new_params, param_shardings
                )
            new_state = {
                "params": new_params,
                "opt_state": new_opt_state,
                "step": state["step"] + 1,
            }
            return new_state, metrics

        return train_step

    def data_tuple_to_fields(self, data: Tuple) -> Tuple[str, ...]:
        if not exists(self.dataset_fields):
            self.dataset_fields = determine_types(data)
            assert len(set(self.dataset_fields)) == len(self.dataset_fields)
        return self.dataset_fields

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

    def train_step(
        self, only_train_generator: bool = False, only_train_critic: bool = False
    ) -> jax.Array:
        """One outer training step; returns the accumulated loss as a DEVICE
        array (fetch with float(...)/jax.device_get when a Python number is
        needed — keeping it on device avoids a host sync per step)."""
        assert self.dl is not None, "no dataset configured"
        self._maybe_profile(self.step)
        total_loss = 0.0

        for _ in range(self.grad_accum_every):
            data = next(self.dl)
            fields = self.data_tuple_to_fields(data)

            # texts must be embedded host-side before entering jit
            batch = []
            jit_fields = []
            for name, el in zip(fields, data):
                if name == "texts":
                    emb = self.model.embed_texts(el)
                    batch.append(jnp.asarray(emb))
                    jit_fields.append("text_embeds")
                elif name == "videos":
                    # pixels cross host->device in the compute dtype: raw
                    # video batches dominate transfer and the model consumes
                    # bf16 anyway. The cast itself normally already happened
                    # in the DataLoader prefetch thread (post_collate).
                    batch.append(
                        jnp.asarray(np.asarray(el, self._video_dtype))
                    )
                    jit_fields.append(name)
                else:
                    batch.append(jnp.asarray(el))
                    jit_fields.append(name)

            assert not (
                self.train_on_images
                and "videos" in jit_fields
                and batch[jit_fields.index("videos")].ndim != 4
            ), (
                "you have it set to train on images, but the dataset is not"
                " returning image batches"
            )

            batch = [shard_batch(b, self.mesh) for b in batch]
            self.rng, sub = jax.random.split(self.rng)
            self.state, metrics = self._train_step(
                self.state,
                tuple(batch),
                sub,
                self.model.cvivit_vars,
                fields=tuple(jit_fields),
                only_train_generator=only_train_generator,
                only_train_critic=only_train_critic,
            )
            # keep the loss on device: fetching per step would serialize
            # dispatch with the host (one tunnel round trip per step)
            total_loss = total_loss + metrics["loss"] / self.grad_accum_every

        self._host_step += 1
        steps = self.step
        if steps % self.log_every == 0:
            self.print(f"{steps}: loss: {float(jax.device_get(total_loss)):.4f}")
        # per-step record; MetricLogger only materializes when a sink is set
        self.logger.log(steps, {"loss": total_loss})

        if (steps - 1) % self.save_and_sample_every == 0:
            self._sample_and_save((steps - 1) // self.save_and_sample_every)

        return total_loss

    # ------------------------------------------------------------------ #

    def _sample_and_save(self, milestone: int):
        # artifacts are rank-0 work, but the checkpoint save must be entered
        # by ALL processes (Orbax coordinates a multi-host save; rank-gating
        # it deadlocks/corrupts cross-host-sharded state) — round-2 review
        self._sample_artifacts(milestone)
        self.save(milestone)

    def _sample_artifacts(self, milestone: int):
        if jax.process_index() != 0:
            return
        if not _fully_addressable(self.state["params"]):
            # cross-host sharded (fsdp multi-host) params cannot be fetched
            # on one process; skip the sample artifacts, keep the checkpoint
            self.print(
                f"milestone {milestone}: skipping sample artifacts"
                " (params sharded across hosts)"
            )
            return
        model = self.model
        model.params = jax.device_get(self.state["params"])

        if not self.unconditional:
            texts = choices(self.sample_texts, k=self.num_samples)
        else:
            texts = [None] * self.num_samples

        groups = num_to_groups(self.num_samples, self.batch_size)
        all_sampled = []
        start = 0
        for group_size in groups:
            group_texts = texts[start : start + group_size]
            start += group_size
            kwargs = {}
            if not self.unconditional:
                kwargs["texts"] = list(group_texts)
            else:
                kwargs["batch_size"] = group_size
            self.rng, sub = jax.random.split(self.rng)
            if self.train_on_images:
                sampled = model.sample_images(rng=sub, **kwargs)
            else:
                sampled = model.sample(
                    num_frames=self.sample_num_frames, rng=sub, **kwargs
                )
            all_sampled.append(np.asarray(jax.device_get(sampled)))

        sampled = np.concatenate(all_sampled, axis=0)

        if not self.train_on_images:
            folder = self.results_folder / f"videos.{milestone}"
            folder.mkdir(parents=True, exist_ok=True)
            for ind, video_tensor in enumerate(sampled):
                caption = texts[ind]
                slug = simple_slugify(caption) if exists(caption) else str(ind)
                video_tensor_to_gif(video_tensor, str(folder / f"{slug}.gif"))
        else:
            nrows = int(math.sqrt(self.num_samples))
            save_image_grid(
                np.clip(sampled, 0.0, 1.0),
                str(self.results_folder / f"{milestone}.png"),
                nrow=nrows,
            )

    def _ckpt_tree(self):
        """Full resume state (reference phenaki_trainer.py:323-349 packs step,
        model, optimizer, AMP scaler — no scaler needed on TPU/bf16): params,
        optimizer state (incl. MultiSteps accumulators), trainer rng, and both
        step counters."""
        return {
            "params": self.state["params"],
            "opt_state": self.state["opt_state"],
            "rng": self.rng,
            # device 'step' counts MICRO-batches (one per jitted call,
            # grad_accum_every per outer step); host_step counts outer
            # steps and drives every schedule — save both
            "step": self.state["step"],
            "host_step": jnp.asarray(self._host_step, jnp.int32),
        }

    def save(self, milestone: int):
        # hand the (possibly cross-host-sharded) device arrays straight to
        # Orbax — each host writes its own shards; jax.device_get here would
        # raise on non-fully-addressable fsdp/multi-host state (round-2 review)
        self.checkpoints.save(milestone, self._ckpt_tree())

    def load(self, milestone: Optional[int] = None):
        # layout detection from METADATA (no array data loaded): round-1
        # checkpoints lack optimizer state and need the legacy path
        try:
            meta = self.checkpoints.metadata(milestone)
            legacy = "opt_state" not in meta
        except Exception:
            legacy = "opt_state" not in self.checkpoints.restore(milestone)
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
        new_state["params"] = _place_like(self.state["params"], restored["params"])
        new_state["opt_state"] = _place_like(
            self.state["opt_state"], restored["opt_state"]
        )
        new_state["step"] = _place_like(
            self.state["step"], jnp.asarray(restored["step"], jnp.int32)
        )
        self.state = new_state
        if _fully_addressable(new_state["params"]):
            self.model.params = jax.device_get(new_state["params"])
        # uncommitted host copy: a device-0-committed rng would conflict with
        # the mesh-placed state args inside the jitted step
        self.rng = jnp.asarray(jax.device_get(restored["rng"]))
        self._host_step = int(restored["host_step"])

    def _load_legacy(self, restored):
        """Round-1 checkpoints: no optimizer state (Adam moments re-init)."""
        new_state = dict(self.state)
        new_state["params"] = _place_like(self.state["params"], restored["params"])
        new_state["step"] = _place_like(
            self.state["step"], jnp.asarray(restored["step"], jnp.int32)
        )
        self.state = new_state
        if _fully_addressable(new_state["params"]):
            self.model.params = jax.device_get(new_state["params"])
        # old checkpoints lack host_step; derive outer steps from micro-steps
        self._host_step = int(
            restored.get(
                "host_step", int(restored["step"]) // self.grad_accum_every
            )
        )

    def train(
        self, only_train_generator: bool = False, only_train_critic: bool = False
    ):
        while self.step < self.train_num_steps:
            self.train_step(
                only_train_generator=only_train_generator,
                only_train_critic=only_train_critic,
            )
        self.print("training complete")
