"""Phenaki: composition of frozen C-ViViT + MaskGit (+ critic) with T5 text
conditioning, the masked-token training loss, and the jitted sampling loop.

Reference: phenaki_pytorch.py:341-714. Differences by design:

  * `Phenaki` is a plain Python orchestrator over pure/jitted functions, not a
    framework Module: it owns the module *definitions* plus the frozen C-ViViT
    variables, and the trainable (maskgit/critic) variables live in an
    explicit pytree that trainers thread through jitted steps.
  * Sampling (`sample`, `sample_images`) runs as ONE compiled program per
    static shape: prime tokenization -> lax.scan decode loop -> C-ViViT decode
    (see sampling_loop.py). Compiled programs are cached per static config.
  * Reference quirk Q1 fixed: conditioning dropout actually fires during
    training with prob `cond_drop_prob` (the reference zeroes it at
    phenaki_pytorch.py:594 and never drops).
  * Text embeddings are padded/truncated to the static `max_text_len` so text
    length never triggers recompilation.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from phenaki_tpu.models.cvivit import CViViT
from phenaki_tpu.models.maskgit import MaskGit, SelfCritic, TokenCritic
from phenaki_tpu.models.sampling_loop import maskgit_sample_loop
from phenaki_tpu.ops.pallas_ce import (
    can_fuse_ce,
    fused_vocab_cross_entropy,
    use_fused_ce,
)
from phenaki_tpu.ops.pallas_sampling import project_gumbel_sample_with_score
from phenaki_tpu.ops.sampling import get_mask_subset_with_prob, gumbel_sample
from phenaki_tpu.text.t5 import DEFAULT_T5_NAME, get_encoded_dim, t5_encode_text
from phenaki_tpu.utils.jit_init import jit_init


def exists(v):
    return v is not None


def cast_tuple(val, length=1):
    return val if isinstance(val, tuple) else (val,) * length


class Phenaki:
    def __init__(
        self,
        *,
        maskgit: MaskGit,
        cvivit: CViViT,
        cvivit_vars: Dict[str, Any],
        critic: Optional[TokenCritic] = None,
        steps: int = 18,  # 18 is the ideal steps with token critic
        t5_name: str = DEFAULT_T5_NAME,
        text_embed_dim: Optional[int] = None,
        cond_drop_prob: float = 0.25,
        max_text_len: int = 128,
        self_token_critic: bool = False,
        critic_loss_weight: float = 1.0,
        critic_noise_anneal_schedule: str = "decay",
        critic_train_sample_temperature: float = 1.0,
    ):
        self.cvivit = cvivit
        self.cvivit_vars = jax.tree_util.tree_map(
            jax.lax.stop_gradient, cvivit_vars
        )

        self.maskgit = maskgit
        self.unconditional = maskgit.unconditional
        self.mask_id = maskgit.mask_id

        assert not (self_token_critic and exists(critic))
        self.self_token_critic = self_token_critic
        if self_token_critic:
            critic = SelfCritic(maskgit)
        if exists(critic) and not self_token_critic:
            assert (not maskgit.unconditional) == critic.has_cross_attn
        self.critic = critic

        self.critic_loss_weight = critic_loss_weight
        self.critic_noise_anneal_schedule = critic_noise_anneal_schedule
        self.critic_train_sample_temperature = critic_train_sample_temperature

        # NOTE: the reference also stores a `sample_temperature` constructor
        # knob that nothing reads (phenaki_pytorch.py:352,379 — sample() takes
        # its own temperature). Dead knob dropped here; use
        # sample(starting_temperature=...).
        self.steps = steps

        self.t5_name = t5_name
        self.text_embed_dim = (
            text_embed_dim if exists(text_embed_dim) else get_encoded_dim(t5_name)
        )
        self.max_text_len = max_text_len

        assert cond_drop_prob > 0.0
        self.cond_drop_prob = cond_drop_prob

        self.params: Optional[Dict[str, Any]] = None  # set by init()/trainers
        self._sample_cache: Dict[Tuple, Any] = {}

        # GPipe pipeline parallelism over the maskgit/critic trunks: set by
        # PhenakiTrainer (pp knob) or directly — a Mesh with a 'pp' axis.
        # None = sequential scan stack (parallel/pipeline.py)
        self.pipeline_mesh = None
        self.pipeline_microbatches: Optional[int] = None

    # ------------------------------------------------------------------ #
    # parameter init                                                      #
    # ------------------------------------------------------------------ #

    def init(self, rng: jax.Array) -> Dict[str, Any]:
        """Initialize maskgit (+ critic head) params. Returns and stores the
        trainable variables pytree {'maskgit': ..., 'critic': ...}."""
        k1, k2 = jax.random.split(rng)
        patch_shape = (2, *self.cvivit.patch_height_width)
        n = int(np.prod(patch_shape))
        ids = jnp.zeros((1, n), jnp.int32)
        ctx = (
            None
            if self.unconditional
            else jnp.zeros((1, self.max_text_len, self.text_embed_dim))
        )
        mg_vars = jit_init(
            self.maskgit, k1, ids, video_patch_shape=patch_shape, context=ctx
        )

        critic_vars = None
        if exists(self.critic):
            if self.self_token_critic:
                full = jit_init(
                    self.critic, k2, ids, video_patch_shape=patch_shape, context=ctx
                )
                # trunk params are shared with maskgit; store only the head
                critic_vars = {"params": {"to_pred": full["params"]["to_pred"]}}
            else:
                c_ctx = ctx if self.critic.has_cross_attn else None
                critic_vars = jit_init(
                    self.critic, k2, ids, video_patch_shape=patch_shape, context=c_ctx
                )

        self.params = {
            "maskgit": mg_vars["params"],
            "critic": None if critic_vars is None else critic_vars["params"],
        }
        return self.params

    def _critic_variables(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """Assemble full critic variables (re-attaching the shared maskgit
        trunk for SelfCritic, reference phenaki_pytorch.py:307-336)."""
        if self.self_token_critic:
            return {
                "params": {
                    "maskgit": params["maskgit"],
                    "to_pred": params["critic"]["to_pred"],
                }
            }
        return {"params": params["critic"]}

    # ------------------------------------------------------------------ #
    # standalone checkpointing (reference CViViT.load / torch.save parity) #
    # ------------------------------------------------------------------ #

    def save(self, path: str) -> None:
        """Save trainable params + frozen tokenizer vars to one directory."""
        from phenaki_tpu.training.checkpoint import save_pytree

        assert self.params is not None, "nothing to save — call init() first"
        save_pytree(
            path,
            {
                "params": jax.device_get(self.params),
                "cvivit_vars": jax.device_get(self.cvivit_vars),
            },
        )

    def load(self, path: str) -> None:
        """Restore params + tokenizer vars saved by `save`."""
        from phenaki_tpu.training.checkpoint import load_pytree

        restored = load_pytree(path)
        self.params = restored["params"]
        self.cvivit_vars = restored["cvivit_vars"]

    # ------------------------------------------------------------------ #
    # text handling (host-side)                                           #
    # ------------------------------------------------------------------ #

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        """texts -> (b, max_text_len, d) float32, zero-padded to static len."""
        emb = np.asarray(
            t5_encode_text(
                texts, name=self.t5_name, fallback_dim=self.text_embed_dim
            )
        )
        return self.pad_text_embeds(emb)

    def pad_text_embeds(self, emb: np.ndarray) -> np.ndarray:
        b, L, d = emb.shape
        assert d == self.text_embed_dim, "text embedding dimension is not correct"
        if L >= self.max_text_len:
            return emb[:, : self.max_text_len]
        out = np.zeros((b, self.max_text_len, d), emb.dtype)
        out[:, :L] = emb
        return out

    # ------------------------------------------------------------------ #
    # training loss (pure / jittable)                                     #
    # ------------------------------------------------------------------ #

    def loss(
        self,
        params: Dict[str, Any],
        rng: jax.Array,
        *,
        videos: Optional[jax.Array] = None,  # (b, f, H, W, c)
        video_codebook_ids: Optional[jax.Array] = None,  # (b, t, h, w) or (b, n)
        text_embeds: Optional[jax.Array] = None,  # (b, L, d)
        video_frame_mask: Optional[jax.Array] = None,  # (b, f)
        cond_drop_prob: Optional[float] = None,
        only_train_generator: bool = False,
        only_train_critic: bool = False,
        train: bool = True,
        cvivit_vars: Optional[Dict[str, Any]] = None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Masked-token CE (+ critic BCE) training loss
        (reference phenaki_pytorch.py:562-687, quirk Q1 fixed).

        Pass `cvivit_vars` explicitly when calling from inside a jitted step so
        the frozen tokenizer weights enter as an argument instead of being
        baked into the compiled program as constants (bloats the HLO)."""
        assert not (only_train_generator and only_train_critic)
        assert exists(videos) ^ exists(video_codebook_ids)
        assert (
            exists(text_embeds) or self.unconditional
        ), "text embeds must be given unless unconditional"

        # one distinct key per random consumer — sharing keys across branches
        # (e.g. maskgit dropout vs critic gumbel) correlates their noise
        (
            rng_mask,
            rng_step,
            rng_mg_drop,
            rng_mg_dropout,
            rng_gumbel,
            rng_cr_drop,
            rng_cr_dropout,
        ) = jax.random.split(rng, 7)

        if not exists(video_codebook_ids):
            if not exists(cvivit_vars):
                cvivit_vars = self.cvivit_vars
            video_codebook_ids = jax.lax.stop_gradient(
                self.cvivit.apply(
                    cvivit_vars, videos, return_only_codebook_ids=True
                )
            )

        if video_codebook_ids.ndim == 4:
            patch_shape = video_codebook_ids.shape[1:]
            ids = video_codebook_ids.reshape(video_codebook_ids.shape[0], -1)
        else:
            raise ValueError("video_codebook_ids must be (b, t, h, w)")

        b, seq = ids.shape

        text_mask = None
        drop_prob = 0.0
        if not self.unconditional:
            # zero-embedding convention: all-zero feature rows are padding
            # (reference phenaki_pytorch.py:601)
            text_mask = jnp.any(text_embeds != 0, axis=-1)
            drop_prob = (
                cond_drop_prob if exists(cond_drop_prob) else self.cond_drop_prob
            )

        video_mask = None
        if exists(video_frame_mask):
            video_mask = self.cvivit.calculate_video_token_mask(video_frame_mask)
        if not exists(video_mask):
            video_mask = jnp.ones((b, seq), dtype=bool)

        # per-sample random step -> cosine mask prob (reference :622-628)
        rand_step = jax.random.randint(rng_step, (b,), 0, self.steps)
        mask_prob = jnp.cos(rand_step * math.pi * 0.5 / self.steps)

        mask_token_mask = get_mask_subset_with_prob(rng_mask, video_mask, mask_prob)
        masked_input = jnp.where(mask_token_mask, self.mask_id, ids)
        masked_input = masked_input.reshape(b, *patch_shape)

        mg_vars = {"params": params["maskgit"]}
        mg_kwargs = dict(
            video_mask=video_mask,
            cond_drop_prob=drop_prob if train else 0.0,
            text_mask=text_mask,
            context=text_embeds,
            deterministic=not train,
            rngs={"cond_drop": rng_mg_drop, "dropout": rng_mg_dropout},
        )
        if self.pipeline_mesh is not None:
            mg_kwargs.update(
                pipeline_mesh=self.pipeline_mesh,
                pipeline_microbatches=self.pipeline_microbatches,
            )

        # On TPU the 65536-way CE is fused with the vocab projection
        # (ops/pallas_ce.py): the forward returns EMBEDDINGS and the
        # (b, n, vocab) logits never exist in HBM — at the flagship train
        # shape that removes a ~2.4 GB fp32 logits+dlogits live range.
        proj = params["maskgit"]["to_logits"]
        w_vocab, b_vocab = proj["kernel"], proj.get("bias")
        fuse_ce = use_fused_ce() and can_fuse_ce(
            w_vocab.shape[0], w_vocab.shape[1]
        )

        logits32 = None
        if fuse_ce:
            embeds = self.maskgit.apply(
                mg_vars, masked_input, return_embeds=True, **mg_kwargs
            )
            if only_train_critic:
                embeds = jax.lax.stop_gradient(embeds)
                w_vocab = jax.lax.stop_gradient(w_vocab)
                if b_vocab is not None:
                    b_vocab = jax.lax.stop_gradient(b_vocab)
            ce = fused_vocab_cross_entropy(embeds, w_vocab, b_vocab, ids)
        else:
            logits = self.maskgit.apply(mg_vars, masked_input, **mg_kwargs)
            if only_train_critic:
                logits = jax.lax.stop_gradient(logits)
            logits32 = logits.astype(jnp.float32)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits32, ids)

        w = mask_token_mask.astype(jnp.float32)
        gen_loss = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)

        metrics = {"maskgit_loss": gen_loss}

        if not exists(self.critic) or only_train_generator:
            metrics["loss"] = gen_loss
            return gen_loss, metrics

        # critic: did the generator fool you, per token? (reference :654-687)
        if fuse_ce:
            # same fused-projection sampler as decode: gumbel-max over the
            # vocab without materializing logits (hardware-PRNG noise stream)
            seed = jax.random.randint(rng_gumbel, (), 0, 2**31 - 1)
            pred_ids, _ = project_gumbel_sample_with_score(
                jax.lax.stop_gradient(embeds),
                jax.lax.stop_gradient(w_vocab),
                jax.lax.stop_gradient(b_vocab) if b_vocab is not None else None,
                seed,
                jnp.float32(self.critic_train_sample_temperature),
            )
        else:
            pred_ids = gumbel_sample(
                rng_gumbel, logits32, self.critic_train_sample_temperature
            ).astype(jnp.int32)
        pred_ids = jax.lax.stop_gradient(pred_ids)
        critic_input = jnp.where(mask_token_mask, pred_ids, ids)
        critic_input = critic_input.reshape(b, *patch_shape)

        critic_vars = self._critic_variables(params)
        critic_ctx = (
            text_embeds
            if (self.self_token_critic or self.critic.has_cross_attn)
            else None
        )
        critic_kwargs = dict(
            video_mask=video_mask,
            cond_drop_prob=drop_prob if train else 0.0,
            text_mask=text_mask if critic_ctx is not None else None,
            context=critic_ctx,
            deterministic=not train,
            rngs={"cond_drop": rng_cr_drop, "dropout": rng_cr_dropout},
        )
        # the critic trunk pipelines only when its own layer stack is
        # compatible (scan_layers, depth divisible by pp); otherwise it runs
        # sequentially with replicated params (the mesh sharding rule skips
        # indivisible depths too, so placement stays consistent)
        critic_mg = self.critic.maskgit if self.self_token_critic else self.critic
        if (
            self.pipeline_mesh is not None
            and critic_mg.scan_layers
            and critic_mg.depth % self.pipeline_mesh.shape["pp"] == 0
        ):
            critic_kwargs.update(
                pipeline_mesh=self.pipeline_mesh,
                pipeline_microbatches=self.pipeline_microbatches,
            )
        critic_logits = self.critic.apply(
            critic_vars, critic_input, **critic_kwargs
        ).astype(jnp.float32)

        critic_labels = (ids != pred_ids).astype(jnp.float32)
        critic_loss = jnp.mean(
            optax.sigmoid_binary_cross_entropy(critic_logits, critic_labels)
        )
        metrics["critic_loss"] = critic_loss

        if only_train_critic:
            loss = critic_loss
        else:
            loss = gen_loss + critic_loss * self.critic_loss_weight
        metrics["loss"] = loss
        return loss, metrics

    def __call__(
        self,
        videos=None,
        *,
        texts: Optional[List[str]] = None,
        rng: Optional[jax.Array] = None,
        text_embeds=None,
        **kwargs,
    ):
        """Convenience training forward with stored params (reference-parity
        call shape). Prefer `loss()` inside jitted trainer steps."""
        assert self.params is not None, "call init() first"
        if exists(texts):
            assert not exists(text_embeds)
            text_embeds = jnp.asarray(self.embed_texts(texts))
        if rng is None:
            rng = jax.random.PRNGKey(0)
        loss, _ = self.loss(
            self.params, rng, videos=videos, text_embeds=text_embeds, **kwargs
        )
        return loss

    # ------------------------------------------------------------------ #
    # sampling                                                            #
    # ------------------------------------------------------------------ #

    def _build_sample_fn(
        self,
        *,
        batch_size: int,
        num_frames: int,
        prime_num_frames: int,
        has_text: bool,
        cond_scale: float,
        starting_temperature: float,
        noise_K: float,
        mesh=None,
    ):
        """One jitted program: prime tokenize -> decode scan -> video decode.

        With `mesh`, the program runs under shard_map: the batch shards over
        the 'dp' axis (sampling is embarrassingly batch-parallel) and, when
        the mesh has a 'tp' axis > 1, the MaskGit/critic trunks run MANUAL
        Megatron tensor parallelism — heads and GEGLU columns sharded per
        rank with one psum per attention/FF block (parallel/tp_inference.py)
        — so a trunk bigger than one chip still samples. Manual sharding
        keeps the Pallas kernels operating on local shapes (GSPMD cannot
        partition an opaque pallas_call)."""
        dp = mesh.shape.get("dp", 1) if mesh is not None else 1
        tp = mesh.shape.get("tp", 1) if mesh is not None else 1
        sharded = mesh is not None and (dp > 1 or tp > 1)
        assert batch_size % dp == 0, (
            f"sampling batch ({batch_size}) must divide the mesh dp axis ({dp})"
        )
        local_batch = batch_size // dp
        has_prime = prime_num_frames > 0
        num_tokens = self.cvivit.num_tokens_per_frames(
            num_frames, include_first_frame=not has_prime
        )
        patch_shape = self.cvivit.get_video_patch_shape(
            num_frames + prime_num_frames, include_first_frame=True
        )
        # latent frames contributed by the prime (first frame counted once)
        prime_patch_frames = (
            self.cvivit.get_video_patch_shape(prime_num_frames)[0] if has_prime else 0
        )

        from phenaki_tpu.parallel.tp_inference import (
            pack_tp_params,
            tp_local_module,
            tp_param_specs,
        )

        # tp > 1: the trunks run as LOCAL head shards (psum-completed);
        # embeddings, vocab head, and C-ViViT stay replicated over tp
        maskgit = tp_local_module(self.maskgit, tp)
        critic = self.critic
        if critic is not None:
            if self.self_token_critic:
                critic = SelfCritic(maskgit)
            else:
                critic = tp_local_module(critic, tp)
        cvivit = self.cvivit

        # cvivit_vars enters as an ARGUMENT, not a closure: closed-over arrays
        # are baked into the program as constants, which bloats the HLO upload
        # (the TPU backend compiles via an HTTP service with a body-size cap)
        # and forces a recompile if the tokenizer is ever swapped.
        def sample_program(params, cvivit_vars, rng, prime_frames, text_embeds):
            if dp > 1:
                # decorrelate the per-shard random streams (tp ranks keep the
                # SAME stream: they compute the same batch rows jointly)
                rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
            prime_ids = None
            if has_prime:
                prime_ids = cvivit.apply(
                    cvivit_vars, prime_frames, return_only_codebook_ids=True
                )
                prime_ids = prime_ids.reshape(local_batch, -1)

            text_mask = None
            context = None
            if has_text:
                context = text_embeds
                text_mask = jnp.any(text_embeds != 0, axis=-1)

            mg_vars = {"params": params["maskgit"]}

            # hoist the CPB bias MLP (depends only on static shape + params)
            # out of the decode scan — one evaluation instead of `steps`
            rel_pos_bias = maskgit.apply(
                mg_vars, patch_shape, method=MaskGit.rel_pos_bias
            )

            # CFG is combined in EMBEDDING space (the output projection is
            # affine, so this is exact) and the vocab projection is fused
            # into the Pallas sampling kernel — the (b, n, 65536) logits
            # never exist in HBM (on CPU the projection runs once in XLA)
            def embeds_fn(input_ids):
                return maskgit.apply(
                    mg_vars,
                    input_ids,
                    video_patch_shape=patch_shape,
                    context=context,
                    text_mask=text_mask,
                    cond_scale=cond_scale,
                    attn_bias=rel_pos_bias,
                    method=MaskGit.embeds_with_cond_scale,
                )

            proj_params = params["maskgit"]["to_logits"]
            vocab_proj = (proj_params["kernel"], proj_params.get("bias"))

            critic_fn = None
            if exists(critic):
                critic_vars = self._critic_variables(params)
                critic_has_text = has_text and (
                    self.self_token_critic or critic.has_cross_attn
                )

                # SelfCritic runs the MaskGit trunk: reuse the hoisted CPB
                # bias there too (TokenCritic has no positional bias)
                critic_kwargs = (
                    {"attn_bias": rel_pos_bias} if self.self_token_critic else {}
                )

                def critic_fn(input_ids):  # noqa: F811
                    return critic.apply(
                        critic_vars,
                        input_ids,
                        video_patch_shape=patch_shape,
                        context=context if critic_has_text else None,
                        text_mask=text_mask if critic_has_text else None,
                        cond_scale=cond_scale,
                        method=type(critic).forward_with_cond_scale,
                        **critic_kwargs,
                    )

            ids = maskgit_sample_loop(
                None,
                rng=rng,
                batch=local_batch,
                num_tokens_seq=num_tokens,
                mask_id=self.mask_id,
                steps=self.steps,
                starting_temperature=starting_temperature,
                prime_ids=prime_ids,
                critic_fn=critic_fn,
                noise_K=noise_K,
                critic_noise_anneal_schedule=self.critic_noise_anneal_schedule,
                embeds_fn=embeds_fn,
                vocab_proj=vocab_proj,
            )

            if has_prime:
                ids = jnp.concatenate([prime_ids, ids], axis=-1)

            video = cvivit.apply(
                cvivit_vars, ids, method=CViViT.decode_from_codebook_indices
            )
            if has_prime:
                video = video[:, prime_num_frames:]
            return video

        if not sharded:
            return jax.jit(sample_program)

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        bspec = P("dp") if dp > 1 else P()

        def sharded_program(params, cvivit_vars, rng, prime_frames, text_embeds):
            # tp packing happens in the GLOBAL view (outside shard_map): the
            # fused to_kv / GEGLU proj_in kernels are column-reordered so a
            # contiguous 1/tp slice keeps (k|v) / (a|g) pairs on one rank
            # (parallel/tp_inference.py); tp == 1 is the identity
            mg_packed = pack_tp_params(params["maskgit"], tp)
            cr = params.get("critic")
            if cr is not None and not self.self_token_critic:
                cr = pack_tp_params(cr, tp)
            packed = {"maskgit": mg_packed, "critic": cr}
            specs = {
                "maskgit": tp_param_specs(mg_packed, tp),
                "critic": (
                    tp_param_specs(cr, tp)
                    if cr is not None and not self.self_token_critic
                    else jax.tree_util.tree_map(lambda _: P(), cr)
                ),
            }
            fn = shard_map(
                sample_program,
                mesh=mesh,
                in_specs=(specs, P(), P(), bspec, bspec),
                out_specs=bspec,
                check_vma=False,
            )
            return fn(packed, cvivit_vars, rng, prime_frames, text_embeds)

        return jax.jit(sharded_program)

    def sample(
        self,
        *,
        num_frames: int,
        texts: Union[List[str], str, None] = None,
        text_embeds: Optional[jax.Array] = None,
        prime_frames: Optional[jax.Array] = None,
        batch_size: int = 1,
        cond_scale: float = 3.0,
        starting_temperature: float = 0.9,
        noise_K: float = 1.0,
        params: Optional[Dict[str, Any]] = None,
        rng: Optional[jax.Array] = None,
        mesh=None,
    ) -> jax.Array:
        """Text-to-video sampling (reference phenaki_pytorch.py:418-560).

        Returns (b, num_frames, H, W, c) in the cvivit pixel space.
        With `mesh`, the batch is sharded over the mesh's 'dp' axis
        (batch_size must divide it) and each device samples its shard.
        """
        params = params if exists(params) else self.params
        assert exists(params), "no params — call init() or load a checkpoint"
        if rng is None:
            rng = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))

        if isinstance(texts, str):
            texts = [texts]
        if exists(texts):
            text_embeds = jnp.asarray(self.embed_texts(texts))
            batch_size = len(texts)
        elif exists(text_embeds):
            text_embeds = jnp.asarray(self.pad_text_embeds(np.asarray(text_embeds)))
            batch_size = text_embeds.shape[0]

        has_text = exists(text_embeds) and not self.unconditional
        prime_num_frames = prime_frames.shape[1] if exists(prime_frames) else 0

        # stable mesh identity: axis layout + device ids (NOT id(mesh) — a
        # GC'd mesh's id can be reused and resurrect a stale compiled program
        # pinned to dead devices)
        mesh_key = (
            (
                tuple(mesh.shape.items()),
                tuple(d.id for d in mesh.devices.flat),
            )
            if mesh is not None
            else None
        )
        key = (
            batch_size,
            num_frames,
            prime_num_frames,
            has_text,
            float(cond_scale),
            float(starting_temperature),
            float(noise_K),
            mesh_key,
        )
        if key not in self._sample_cache:
            self._sample_cache[key] = self._build_sample_fn(
                batch_size=batch_size,
                num_frames=num_frames,
                prime_num_frames=prime_num_frames,
                has_text=has_text,
                cond_scale=cond_scale,
                starting_temperature=starting_temperature,
                noise_K=noise_K,
                mesh=mesh,
            )
        fn = self._sample_cache[key]
        return fn(params, self.cvivit_vars, rng, prime_frames, text_embeds)

    def sample_images(
        self,
        *,
        texts: Union[List[str], str, None] = None,
        batch_size: int = 1,
        cond_scale: float = 3.0,
        starting_temperature: float = 0.9,
        noise_K: float = 1.0,
        num_frames: int = 1,  # accepted for trainer parity (quirk Q7 fixed)
        **kwargs,
    ) -> jax.Array:
        video = self.sample(
            texts=texts,
            num_frames=1,
            batch_size=batch_size,
            cond_scale=cond_scale,
            starting_temperature=starting_temperature,
            noise_K=noise_K,
            **kwargs,
        )
        return video[:, 0]


def make_video(
    phenaki: Phenaki,
    texts: List[str],
    num_frames,
    prime_lengths,
    **sample_kwargs,
):
    """Multi-scene long video via prime-frame chaining
    (reference phenaki_pytorch.py:692-714). Returns (entire_video, scenes)."""
    num_scenes = len(texts)
    num_frames = cast_tuple(num_frames, num_scenes)

    prime_lengths = cast_tuple(prime_lengths, num_scenes - 1)
    prime_lengths = (*prime_lengths, 0)  # last scene needs no priming

    video_prime = None
    scenes = []

    for text, scene_num_frames, next_prime_len in zip(
        texts, num_frames, prime_lengths
    ):
        video = phenaki.sample(
            texts=text,
            prime_frames=video_prime,
            num_frames=scene_num_frames,
            **sample_kwargs,
        )
        scenes.append(video)
        if next_prime_len > 0:
            video_prime = video[:, -next_prime_len:]
        else:
            video_prime = None

    return jnp.concatenate(scenes, axis=1), scenes
