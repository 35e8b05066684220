"""Sharding tests on the virtual 8-device CPU mesh (SURVEY.md §2 parallelism
inventory: DP via mesh 'dp' axis; TP extension over 'tp')."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from phenaki_tpu.models.maskgit import MaskGit
from phenaki_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    partition_specs_for,
    replicate,
    shard_batch,
    shard_params,
)
from phenaki_tpu.training.optimizer import get_optimizer

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs 8 virtual devices"
    ),
]

PATCH_SHAPE = (2, 2, 2)


def build_maskgit():
    mg = MaskGit(
        dim=32, num_tokens=64, max_seq_len=16, depth=1, heads=2, dim_head=16,
        dim_context=16,
    )
    ids = jnp.zeros((1, 8), jnp.int32)
    ctx = jnp.zeros((1, 4, 16))
    variables = mg.init(jax.random.PRNGKey(0), ids, video_patch_shape=PATCH_SHAPE, context=ctx)
    return mg, variables


def test_mesh_shapes():
    mesh = make_mesh(tp=2)
    assert mesh.shape[DATA_AXIS] == 4
    assert mesh.shape[MODEL_AXIS] == 2
    mesh_dp = make_mesh()
    assert mesh_dp.shape[DATA_AXIS] == 8


def test_tp_param_sharding_rules():
    mg, variables = build_maskgit()
    mesh = make_mesh(tp=2)
    sharded = shard_params(variables["params"], mesh)
    specs = partition_specs_for(variables["params"], mesh)
    layer = sharded["transformer"]["layers_0"]["self_attn"]
    # column-parallel qkv: output dim sharded over tp
    q_shard = layer["to_q"]["kernel"].sharding.spec
    assert tuple(q_shard) == (None, MODEL_AXIS)
    # row-parallel output proj
    o_shard = layer["to_out"]["kernel"].sharding.spec
    assert tuple(o_shard)[0] == MODEL_AXIS


def test_dp_tp_forward_matches_single_device():
    mg, variables = build_maskgit()
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 8), 0, 64)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (8, 4, 16))

    expected = mg.apply(variables, ids, video_patch_shape=PATCH_SHAPE, context=ctx)

    mesh = make_mesh(tp=2)
    params = shard_params(variables["params"], mesh)
    ids_s = shard_batch(ids, mesh)
    ctx_s = shard_batch(ctx, mesh)

    @jax.jit
    def fwd(p, ids, ctx):
        return mg.apply(
            {"params": p}, ids, video_patch_shape=PATCH_SHAPE, context=ctx
        )

    with mesh:
        got = fwd(params, ids_s, ctx_s)

    np.testing.assert_allclose(
        np.asarray(expected), np.asarray(got), atol=2e-4
    )


def test_sharded_train_step_runs_and_matches():
    """One CE train step, 8-way dp+tp sharded vs single-device."""
    mg, variables = build_maskgit()
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 8), 0, 64)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (8, 4, 16))
    labels = jax.random.randint(jax.random.PRNGKey(3), (8, 8), 0, 64)

    opt = get_optimizer(lr=1e-3, wd=0.0)

    def loss_fn(p, ids, ctx, labels):
        logits = mg.apply(
            {"params": p}, ids, video_patch_shape=PATCH_SHAPE, context=ctx
        )
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels
            )
        )

    def step(p, opt_state, ids, ctx, labels):
        loss, grads = jax.value_and_grad(loss_fn)(p, ids, ctx, labels)
        updates, opt_state = opt.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), grads, loss

    # single device
    p0 = variables["params"]
    s0 = opt.init(p0)
    p1, g1, loss1 = jax.jit(step)(p0, s0, ids, ctx, labels)

    # sharded
    mesh = make_mesh(tp=2)
    p_sh = shard_params(p0, mesh)
    s_sh = replicate(opt.init(p0), mesh)
    with mesh:
        p2, g2, loss2 = jax.jit(step)(
            p_sh, s_sh, shard_batch(ids, mesh), shard_batch(ctx, mesh),
            shard_batch(labels, mesh),
        )

    np.testing.assert_allclose(float(loss1), float(loss2), atol=1e-5)
    # compare gradients, not post-Adam params: Adam normalizes near-zero
    # grads to lr-scale updates, amplifying reduction-order noise
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    for leaf in jax.tree_util.tree_leaves(p2):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_sharded_sampling_over_dp():
    """Batch-parallel sampling under shard_map: batch shards over 'dp', each
    shard draws a decorrelated rng stream; output is the full global batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from phenaki_tpu.models.cvivit import CViViT
    from phenaki_tpu.models.maskgit import MaskGit
    from phenaki_tpu.models.phenaki import Phenaki
    from phenaki_tpu.parallel.mesh import make_mesh

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
        maskgit=maskgit, cvivit=cvivit, cvivit_vars=cvivit_vars, steps=2,
        text_embed_dim=16, max_text_len=4,
    )
    ph.init(jax.random.PRNGKey(1))

    mesh = make_mesh(jax.devices()[:4], tp=1)  # dp=4
    text_embeds = np.random.RandomState(0).randn(4, 3, 16).astype(np.float32)

    video = ph.sample(
        num_frames=3, text_embeds=text_embeds, mesh=mesh,
        rng=jax.random.PRNGKey(7), cond_scale=2.0,
    )
    assert video.shape == (4, 3, 16, 16, 3)
    v = np.asarray(video, np.float32)
    assert np.isfinite(v).all()
    # decorrelated shard rngs: identical text rows must still sample
    # different videos across shards
    assert not np.allclose(v[0], v[1])


def _tiny_phenaki_for_sampling(critic_kind=None):
    from phenaki_tpu.models.cvivit import CViViT
    from phenaki_tpu.models.maskgit import MaskGit, TokenCritic
    from phenaki_tpu.models.phenaki import Phenaki

    cvivit = CViViT(
        dim=32, codebook_size=64, image_size=16, patch_size=8,
        temporal_patch_size=2, spatial_depth=1, temporal_depth=1,
        dim_head=16, heads=2,
    )
    cvivit_vars = cvivit.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16, 3)))
    maskgit = MaskGit(
        dim=32, num_tokens=64, max_seq_len=16, depth=2, heads=2, dim_head=16,
        dim_context=16,
    )
    critic = None
    self_critic = False
    if critic_kind == "token":
        critic = TokenCritic(
            dim=32, num_tokens=64, max_seq_len=16, depth=1, heads=2,
            dim_head=16, has_cross_attn=True, dim_context=16,
        )
    elif critic_kind == "self":
        self_critic = True
    ph = Phenaki(
        maskgit=maskgit, cvivit=cvivit, cvivit_vars=cvivit_vars, steps=2,
        critic=critic, self_token_critic=self_critic,
        text_embed_dim=16, max_text_len=4,
    )
    ph.init(jax.random.PRNGKey(1))
    return ph


@pytest.mark.parametrize("critic_kind", [None, "token", "self"])
def test_tp_sharded_sampling_matches_dense(critic_kind):
    """Tensor-parallel sampling (round-3 review #2): the decode program on a
    tp=2 mesh — trunk heads/GEGLU columns sharded per rank with psum
    completion (parallel/tp_inference.py) — must reproduce the single-device
    sample bit-for-bit up to float reassociation."""
    ph = _tiny_phenaki_for_sampling(critic_kind)
    text_embeds = np.random.RandomState(3).randn(2, 3, 16).astype(np.float32)

    dense = ph.sample(
        num_frames=3, text_embeds=text_embeds, rng=jax.random.PRNGKey(9),
        cond_scale=2.0,
    )

    mesh = make_mesh(jax.devices()[:2], dp=1, tp=2)
    tp_video = ph.sample(
        num_frames=3, text_embeds=text_embeds, mesh=mesh,
        rng=jax.random.PRNGKey(9), cond_scale=2.0,
    )
    np.testing.assert_allclose(
        np.asarray(dense, np.float32), np.asarray(tp_video, np.float32),
        atol=2e-4,
        err_msg="tp=2 sampling diverged from the dense program",
    )


def test_dp_tp_sharded_sampling_runs():
    """dp x tp composed sampling: batch shards over dp while each shard's
    trunk is tensor-parallel over tp."""
    ph = _tiny_phenaki_for_sampling()
    mesh = make_mesh(jax.devices()[:4], dp=2, tp=2)
    text_embeds = np.random.RandomState(4).randn(2, 3, 16).astype(np.float32)
    video = ph.sample(
        num_frames=3, text_embeds=text_embeds, mesh=mesh,
        rng=jax.random.PRNGKey(11), cond_scale=2.0,
    )
    v = np.asarray(video, np.float32)
    assert v.shape == (2, 3, 16, 16, 3) and np.isfinite(v).all()
    assert not np.allclose(v[0], v[1])


def test_tp_sampling_with_prime_frames():
    """tp-sharded sampling with prime-frame conditioning (make_video path)."""
    ph = _tiny_phenaki_for_sampling()
    text_embeds = np.random.RandomState(5).randn(1, 3, 16).astype(np.float32)
    prime = np.random.RandomState(6).rand(1, 1, 16, 16, 3).astype(np.float32)

    dense = ph.sample(
        num_frames=2, text_embeds=text_embeds, prime_frames=jnp.asarray(prime),
        rng=jax.random.PRNGKey(13), cond_scale=2.0,
    )
    mesh = make_mesh(jax.devices()[:2], dp=1, tp=2)
    tp_video = ph.sample(
        num_frames=2, text_embeds=text_embeds, prime_frames=jnp.asarray(prime),
        mesh=mesh, rng=jax.random.PRNGKey(13), cond_scale=2.0,
    )
    np.testing.assert_allclose(
        np.asarray(dense, np.float32), np.asarray(tp_video, np.float32),
        atol=2e-4,
    )


def test_pack_tp_params_roundtrip_math():
    """pack_tp_params: a packed-and-contiguously-split GEGLU/KV kernel gives
    the same layer output as the dense kernel (including the odd inner width
    the reference formula produces)."""
    from phenaki_tpu.ops.feedforward import FeedForward, ff_inner_dim
    from phenaki_tpu.parallel.tp_inference import (
        _repack_geglu_in,
        _pad_geglu_out,
    )

    dim, tp = 20, 2
    inner = ff_inner_dim(dim)  # 53 — odd, exercises the per-rank zero-pad
    ff = FeedForward(dim=dim)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, dim), jnp.float32)
    params = ff.init(jax.random.PRNGKey(0), x)["params"]
    dense_out = ff.apply({"params": params}, x)

    w_in = _repack_geglu_in(params["proj_in"]["kernel"], tp)
    w_out = _pad_geglu_out(params["proj_out"]["kernel"], tp)
    il = -(-inner // tp)
    partial_sum = 0.0
    for r in range(tp):
        local = {
            "norm": params["norm"],
            "proj_in": {"kernel": w_in[:, r * 2 * il : (r + 1) * 2 * il]},
            "proj_out": {"kernel": w_out[r * il : (r + 1) * il]},
        }
        ff_local = FeedForward(dim=dim, inner_dim=il)
        partial_sum = partial_sum + ff_local.apply({"params": local}, x)
    np.testing.assert_allclose(
        np.asarray(dense_out), np.asarray(partial_sum), atol=1e-5
    )


def test_phenaki_trainer_tp_equals_dp():
    """TP is wired INTO the trainer (round-1 weak #2): a dp=2 x tp=2 mesh
    passed to PhenakiTrainer must shard params per the Megatron rules and
    produce the same training trajectory as dp=4 (same data, same seed) —
    tensor parallelism changes the compute layout, not the math."""
    import jax.numpy as jnp
    import numpy as np

    from phenaki_tpu.models.cvivit import CViViT
    from phenaki_tpu.models.maskgit import MaskGit
    from phenaki_tpu.models.phenaki import Phenaki
    from phenaki_tpu.training.phenaki_trainer import PhenakiTrainer

    video = np.random.RandomState(3).rand(5, 16, 16, 3).astype(np.float32)

    class FixedDataset:
        def __len__(self):
            return 4

        def __getitem__(self, idx):
            return video, "a video of a cat"

    def build(tp, results):
        cvivit = CViViT(
            dim=32, codebook_size=64, image_size=16, patch_size=8,
            temporal_patch_size=2, spatial_depth=1, temporal_depth=1,
            dim_head=16, heads=2,
        )
        cvivit_vars = cvivit.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16, 3))
        )
        maskgit = MaskGit(
            dim=32, num_tokens=64, max_seq_len=64, depth=1, heads=2,
            dim_head=16, dim_context=512,
        )
        ph = Phenaki(
            maskgit=maskgit, cvivit=cvivit, cvivit_vars=cvivit_vars, steps=2,
            t5_name="google/t5-v1_1-small", max_text_len=8,
        )
        return PhenakiTrainer(
            ph,
            dataset=FixedDataset(),
            batch_size=4,
            num_frames=5,
            train_num_steps=10,
            num_samples=1,
            save_and_sample_every=10**9,
            results_folder=results,
            sample_texts=["a cat"],
            mesh=make_mesh(jax.devices()[:4], tp=tp),
            seed=7,
        )

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        tr_dp = build(1, d + "/dp")
        tr_tp = build(2, d + "/tp")

        # tp=2 actually sharded something
        leaves_sharded = [
            l
            for l in jax.tree_util.tree_leaves(tr_tp.state["params"])
            if any(s is not None for s in getattr(l.sharding, "spec", ()))
        ]
        assert leaves_sharded, "tp=2 trainer must tensor-shard some params"

        losses_dp = [float(jax.device_get(tr_dp.train_step())) for _ in range(2)]
        losses_tp = [float(jax.device_get(tr_tp.train_step())) for _ in range(2)]
        np.testing.assert_allclose(losses_dp, losses_tp, rtol=2e-4, atol=2e-5)

        # params: tolerance is a few lr-quanta (lr=1e-4) — Adam's normalized
        # first steps are sign-driven, so a zero-init param with a near-zero
        # (reassociation-noise-level) gradient can legitimately differ by
        # ~2*lr between reduction orders; a real TP math bug shows up at
        # weight scale (~1e-1), three orders of magnitude larger
        p_dp = jax.device_get(tr_dp.state["params"])
        p_tp = jax.device_get(tr_tp.state["params"])
        for a, b in zip(
            jax.tree_util.tree_leaves(p_dp), jax.tree_util.tree_leaves(p_tp)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=3e-4
            )
        tr_dp.checkpoints.close()
        tr_tp.checkpoints.close()


def test_sample_cache_mesh_key_is_stable():
    """Regression (round-1 weak #6): the sample-program cache keyed on
    id(mesh); a GC'd mesh's id could be reused by a DIFFERENT mesh and hit a
    stale program. The key must be the mesh layout + device ids: two equal
    meshes share one entry, a different layout gets its own."""
    import gc

    import jax.numpy as jnp
    import numpy as np

    from phenaki_tpu.models.cvivit import CViViT
    from phenaki_tpu.models.maskgit import MaskGit
    from phenaki_tpu.models.phenaki import Phenaki

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
        maskgit=maskgit, cvivit=cvivit, cvivit_vars=cvivit_vars, steps=2,
        text_embed_dim=16, max_text_len=4,
    )
    ph.init(jax.random.PRNGKey(1))
    text_embeds = np.random.RandomState(0).randn(2, 3, 16).astype(np.float32)

    mesh1 = make_mesh(jax.devices()[:2], tp=1)
    ph.sample(
        num_frames=3, text_embeds=text_embeds, mesh=mesh1,
        rng=jax.random.PRNGKey(7), cond_scale=2.0,
    )
    assert len(ph._sample_cache) == 1

    del mesh1
    gc.collect()
    mesh2 = make_mesh(jax.devices()[:2], tp=1)  # same layout, new object
    ph.sample(
        num_frames=3, text_embeds=text_embeds, mesh=mesh2,
        rng=jax.random.PRNGKey(8), cond_scale=2.0,
    )
    assert len(ph._sample_cache) == 1, "equal mesh layout must reuse the entry"

    mesh3 = make_mesh(jax.devices()[2:4], tp=1)  # different devices
    ph.sample(
        num_frames=3, text_embeds=text_embeds, mesh=mesh3,
        rng=jax.random.PRNGKey(9), cond_scale=2.0,
    )
    assert len(ph._sample_cache) == 2, "different devices must get a new entry"


def test_tp_param_sharding_rules_scan_layout():
    """scan_layers stacks per-layer params with a leading depth axis; TP rules
    must shard the same logical dims and keep the depth axis replicated."""
    import jax.numpy as jnp

    from phenaki_tpu.models.maskgit import MaskGit

    mg = MaskGit(
        dim=32, num_tokens=64, max_seq_len=16, depth=2, heads=2, dim_head=16,
        dim_context=16, scan_layers=True,
    )
    variables = mg.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
        video_patch_shape=(2, 2, 2), context=jnp.zeros((1, 4, 16)),
    )
    mesh = make_mesh(tp=2)
    sharded = shard_params(variables["params"], mesh)
    layer = sharded["transformer"]["layers_scan"]["self_attn"]
    assert layer["to_q"]["kernel"].ndim == 3  # (depth, in, out)
    assert tuple(layer["to_q"]["kernel"].sharding.spec) == (None, None, MODEL_AXIS)
    assert tuple(layer["to_out"]["kernel"].sharding.spec) == (None, MODEL_AXIS, None)


def test_multislice_mesh_train_step():
    """('dcn', 'dp', 'tp') hybrid mesh: a train step runs with the batch
    sharded over dcn x dp (on CPU all devices report slice 0, so the mesh
    degenerates to dcn=1 — the axis plumbing is what's under test)."""
    from phenaki_tpu.parallel.mesh import make_multislice_mesh

    mesh = make_multislice_mesh(tp=2)
    assert mesh.shape["dcn"] >= 1
    assert mesh.shape[MODEL_AXIS] == 2
    assert mesh.shape["dcn"] * mesh.shape[DATA_AXIS] * 2 == 8

    mg, variables = build_maskgit()
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 8), 0, 64)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (8, 4, 16))

    expected = mg.apply(variables, ids, video_patch_shape=PATCH_SHAPE, context=ctx)

    params = shard_params(variables["params"], mesh)
    ids_s = shard_batch(ids, mesh)
    ctx_s = shard_batch(ctx, mesh)
    assert ids_s.sharding.spec[0] == ("dcn", DATA_AXIS)

    @jax.jit
    def fwd(p, ids, ctx):
        return mg.apply({"params": p}, ids, video_patch_shape=PATCH_SHAPE, context=ctx)

    with mesh:
        got = fwd(params, ids_s, ctx_s)
    np.testing.assert_allclose(np.asarray(expected), np.asarray(got), atol=2e-4)


def test_fsdp_param_sharding_rules(monkeypatch):
    """fsdp=True shards each large param's largest free dim over 'dp'
    (ZeRO-3), composing with the TP rules, and leaves small params and the
    scanned depth axis replicated."""
    import phenaki_tpu.parallel.mesh as mesh_mod

    monkeypatch.setattr(mesh_mod, "_FSDP_MIN_SIZE", 256)

    mg, variables = build_maskgit()
    mesh = make_mesh(tp=2)  # dp=4 x tp=2
    sharded = shard_params(variables["params"], mesh, fsdp=True)

    layer = sharded["transformer"]["layers_0"]["self_attn"]
    # qkv kernel (32, 32): tp on the output dim, fsdp on the input dim
    assert tuple(layer["to_q"]["kernel"].sharding.spec) == (DATA_AXIS, MODEL_AXIS)
    # token embedding (65, 32): rows not divisible by dp=4 -> only try dims
    # that divide; (65 % 4 != 0, 32 % 4 == 0) -> dim 1
    emb_spec = tuple(sharded["token_emb"]["embedding"].sharding.spec)
    assert DATA_AXIS in emb_spec
    # small params (biases, norms) stay replicated
    ln = sharded["transformer"]["norm_out"]["gamma"]
    assert all(s is None for s in ln.sharding.spec) or ln.sharding.spec == ()


def test_fsdp_scan_layers_keeps_depth_replicated(monkeypatch):
    import jax.numpy as jnp

    import phenaki_tpu.parallel.mesh as mesh_mod
    from phenaki_tpu.models.maskgit import MaskGit

    monkeypatch.setattr(mesh_mod, "_FSDP_MIN_SIZE", 256)
    mg = MaskGit(
        dim=32, num_tokens=64, max_seq_len=16, depth=2, heads=2, dim_head=16,
        dim_context=16, scan_layers=True,
    )
    variables = mg.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
        video_patch_shape=(2, 2, 2), context=jnp.zeros((1, 4, 16)),
    )
    mesh = make_mesh(tp=2)
    sharded = shard_params(variables["params"], mesh, fsdp=True)
    layer = sharded["transformer"]["layers_scan"]["self_attn"]
    spec = tuple(layer["to_q"]["kernel"].sharding.spec)  # (depth, in, out)
    assert spec[0] is None, "scanned depth axis must stay replicated"
    assert spec == (None, DATA_AXIS, MODEL_AXIS)


def test_phenaki_trainer_fsdp_equals_replicated(monkeypatch):
    """fsdp=True wired into PhenakiTrainer: params/opt-state shard over 'dp'
    and the training trajectory matches replicated dp (same data, same seed)
    — FSDP changes memory layout, not math."""
    import tempfile

    import jax.numpy as jnp
    import numpy as np

    import phenaki_tpu.parallel.mesh as mesh_mod
    from phenaki_tpu.models.cvivit import CViViT
    from phenaki_tpu.models.maskgit import MaskGit
    from phenaki_tpu.models.phenaki import Phenaki
    from phenaki_tpu.training.phenaki_trainer import PhenakiTrainer

    monkeypatch.setattr(mesh_mod, "_FSDP_MIN_SIZE", 256)

    video = np.random.RandomState(3).rand(5, 16, 16, 3).astype(np.float32)

    class FixedDataset:
        def __len__(self):
            return 4

        def __getitem__(self, idx):
            return video, "a video of a cat"

    def build(fsdp, results):
        cvivit = CViViT(
            dim=32, codebook_size=64, image_size=16, patch_size=8,
            temporal_patch_size=2, spatial_depth=1, temporal_depth=1,
            dim_head=16, heads=2,
        )
        cvivit_vars = cvivit.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16, 3))
        )
        maskgit = MaskGit(
            dim=32, num_tokens=64, max_seq_len=64, depth=1, heads=2,
            dim_head=16, dim_context=512,
        )
        ph = Phenaki(
            maskgit=maskgit, cvivit=cvivit, cvivit_vars=cvivit_vars, steps=2,
            t5_name="google/t5-v1_1-small", max_text_len=8,
        )
        return PhenakiTrainer(
            ph,
            dataset=FixedDataset(),
            batch_size=4,
            num_frames=5,
            train_num_steps=10,
            num_samples=1,
            save_and_sample_every=10**9,
            results_folder=results,
            sample_texts=["a cat"],
            mesh=make_mesh(jax.devices()[:4], tp=1),
            fsdp=fsdp,
            seed=7,
        )

    with tempfile.TemporaryDirectory() as d:
        tr_rep = build(False, d + "/rep")
        tr_fsdp = build(True, d + "/fsdp")

        def dp_sharded_leaves(tree):
            return [
                l
                for l in jax.tree_util.tree_leaves(tree)
                if DATA_AXIS
                in jax.tree_util.tree_leaves(
                    getattr(l.sharding, "spec", ()), is_leaf=lambda x: True
                )
                or any(s == DATA_AXIS for s in getattr(l.sharding, "spec", ()))
            ]

        assert dp_sharded_leaves(tr_fsdp.state["params"]), (
            "fsdp trainer must dp-shard some params"
        )
        assert dp_sharded_leaves(tr_fsdp.state["opt_state"]), (
            "Adam moments must inherit the fsdp shardings"
        )

        losses_rep = [float(jax.device_get(tr_rep.train_step())) for _ in range(2)]
        losses_fsdp = [
            float(jax.device_get(tr_fsdp.train_step())) for _ in range(2)
        ]
        np.testing.assert_allclose(losses_rep, losses_fsdp, rtol=2e-4, atol=2e-5)

        # params stay pinned to their fsdp placement across steps
        assert dp_sharded_leaves(tr_fsdp.state["params"])

        p_rep = jax.device_get(tr_rep.state["params"])
        p_fsdp = jax.device_get(tr_fsdp.state["params"])
        for a, b in zip(
            jax.tree_util.tree_leaves(p_rep), jax.tree_util.tree_leaves(p_fsdp)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=3e-4
            )
        tr_rep.checkpoints.close()
        tr_fsdp.checkpoints.close()


def test_phenaki_trainer_fsdp_checkpoint_roundtrip(monkeypatch):
    """Multi-host-safe checkpointing (round-2 review): fsdp-sharded state is
    handed to Orbax WITHOUT jax.device_get, and restore uses the live sharded
    state as template — leaves come back bitwise equal AND keep their dp
    shardings."""
    import tempfile

    import jax.numpy as jnp
    import numpy as np

    import phenaki_tpu.parallel.mesh as mesh_mod
    from phenaki_tpu.models.cvivit import CViViT
    from phenaki_tpu.models.maskgit import MaskGit
    from phenaki_tpu.models.phenaki import Phenaki
    from phenaki_tpu.training.phenaki_trainer import PhenakiTrainer

    monkeypatch.setattr(mesh_mod, "_FSDP_MIN_SIZE", 256)

    video = np.random.RandomState(3).rand(5, 16, 16, 3).astype(np.float32)

    class FixedDataset:
        def __len__(self):
            return 4

        def __getitem__(self, idx):
            return video, "a video of a cat"

    def build(results):
        cvivit = CViViT(
            dim=32, codebook_size=64, image_size=16, patch_size=8,
            temporal_patch_size=2, spatial_depth=1, temporal_depth=1,
            dim_head=16, heads=2,
        )
        cvivit_vars = cvivit.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16, 3))
        )
        maskgit = MaskGit(
            dim=32, num_tokens=64, max_seq_len=64, depth=1, heads=2,
            dim_head=16, dim_context=512,
        )
        ph = Phenaki(
            maskgit=maskgit, cvivit=cvivit, cvivit_vars=cvivit_vars, steps=2,
            t5_name="google/t5-v1_1-small", max_text_len=8,
        )
        return PhenakiTrainer(
            ph,
            dataset=FixedDataset(),
            batch_size=4,
            num_frames=5,
            train_num_steps=10,
            num_samples=1,
            save_and_sample_every=10**9,
            results_folder=results,
            sample_texts=["a cat"],
            mesh=make_mesh(jax.devices()[:4], tp=1),
            fsdp=True,
            seed=7,
        )

    def dp_sharded(tree):
        return [
            l
            for l in jax.tree_util.tree_leaves(tree)
            if any(s == DATA_AXIS for s in getattr(l.sharding, "spec", ()))
        ]

    with tempfile.TemporaryDirectory() as d:
        tr = build(d + "/a")
        tr.train_step()
        assert dp_sharded(tr.state["params"]), "precondition: fsdp shards params"
        tr.save(1)
        tr.checkpoints.wait()
        before = jax.device_get(tr.state["params"])
        before_opt = jax.device_get(tr.state["opt_state"])
        step_before = int(jax.device_get(tr.state["step"]))

        # fresh trainer (different seed => different init) restores into the
        # SAME fsdp placement
        tr2 = build(d + "/a")
        tr2.load(1)
        assert dp_sharded(tr2.state["params"]), (
            "restored params must keep their fsdp dp-sharding"
        )
        after = jax.device_get(tr2.state["params"])
        for a, b in zip(
            jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)
        ):
            assert np.array_equal(np.asarray(a), np.asarray(b))
        after_opt = jax.device_get(tr2.state["opt_state"])
        for a, b in zip(
            jax.tree_util.tree_leaves(before_opt),
            jax.tree_util.tree_leaves(after_opt),
        ):
            assert np.array_equal(np.asarray(a), np.asarray(b))
        assert int(jax.device_get(tr2.state["step"])) == step_before
        tr.checkpoints.close()
        tr2.checkpoints.close()


def test_phenaki_trainer_pp_equals_dp():
    """Pipeline parallelism is wired INTO the trainer (round-2 review #4): a
    pp=2 x dp=4 mesh routes the MaskGit trunk through the GPipe schedule
    (parallel/pipeline.py) with the stacked layer params sharded over 'pp',
    and must produce the same training trajectory as plain dp=8 (same data,
    same seed) — the pipeline changes the schedule, not the math."""
    from phenaki_tpu.models.cvivit import CViViT
    from phenaki_tpu.models.phenaki import Phenaki
    from phenaki_tpu.parallel.mesh import PIPE_AXIS
    from phenaki_tpu.training.phenaki_trainer import PhenakiTrainer

    video = np.random.RandomState(3).rand(5, 16, 16, 3).astype(np.float32)

    class FixedDataset:
        def __len__(self):
            return 8

        def __getitem__(self, idx):
            return video, "a video of a cat"

    def build(pp, results):
        cvivit = CViViT(
            dim=32, codebook_size=64, image_size=16, patch_size=8,
            temporal_patch_size=2, spatial_depth=1, temporal_depth=1,
            dim_head=16, heads=2,
        )
        cvivit_vars = cvivit.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16, 3))
        )
        maskgit = MaskGit(
            dim=32, num_tokens=64, max_seq_len=64, depth=2, heads=2,
            dim_head=16, dim_context=512, scan_layers=True,
        )
        ph = Phenaki(
            maskgit=maskgit, cvivit=cvivit, cvivit_vars=cvivit_vars, steps=2,
            t5_name="google/t5-v1_1-small", max_text_len=8,
        )
        return PhenakiTrainer(
            ph,
            dataset=FixedDataset(),
            batch_size=8,
            num_frames=5,
            train_num_steps=10,
            num_samples=1,
            save_and_sample_every=10**9,
            results_folder=results,
            sample_texts=["a cat"],
            mesh=make_mesh(jax.devices()[:8], pp=pp),
            seed=7,
        )

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        tr_dp = build(1, d + "/dp")
        tr_pp = build(2, d + "/pp")

        assert tr_pp.model.pipeline_mesh is not None

        # the stacked trunk layer params are actually sharded over 'pp'
        pp_sharded = [
            l
            for l in jax.tree_util.tree_leaves(
                tr_pp.state["params"]["maskgit"]["transformer"]
            )
            if any(
                s == PIPE_AXIS for s in getattr(l.sharding, "spec", ())
            )
        ]
        assert pp_sharded, "pp=2 trainer must shard layers_scan depth over pp"

        losses_dp = [float(jax.device_get(tr_dp.train_step())) for _ in range(2)]
        losses_pp = [float(jax.device_get(tr_pp.train_step())) for _ in range(2)]
        np.testing.assert_allclose(losses_dp, losses_pp, rtol=2e-4, atol=2e-5)

        p_dp = jax.device_get(tr_dp.state["params"])
        p_pp = jax.device_get(tr_pp.state["params"])
        for a, b in zip(
            jax.tree_util.tree_leaves(p_dp), jax.tree_util.tree_leaves(p_pp)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=3e-4
            )
        tr_dp.checkpoints.close()
        tr_pp.checkpoints.close()
