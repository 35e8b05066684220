"""Ring attention (sequence-sharded over the virtual 8-device mesh) must match
dense attention exactly — bias, key-padding masks, causal, bf16 inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phenaki_tpu.ops.attention import qk_norm_attention
from phenaki_tpu.parallel.mesh import make_mesh
from phenaki_tpu.parallel.ring_attention import sequence_sharded_attention

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs 8 virtual devices"
    ),
]


def rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def setup(n=64, b=2, h=2, d=16):
    # the op contract (like qk_norm_attention) is cosine attention: q/k arrive
    # L2-normalized from the caller, so scores live in [-scale, scale]
    from phenaki_tpu.ops.norms import l2norm

    q, k = l2norm(rand(0, b, h, n, d)), l2norm(rand(1, b, h, n, d))
    v = rand(2, b, h, n, d)
    return q, k, v


def test_ring_matches_dense_with_bias():
    q, k, v = setup()
    bias = rand(3, 2, 64, 64) * 0.3
    mesh = make_mesh(tp=1)  # dp=8 used as the sequence axis

    dense = qk_norm_attention(q, k, v, attn_bias=bias)
    ring = sequence_sharded_attention(q, k, v, mesh, attn_bias=bias)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense), atol=2e-5)


def test_ring_matches_dense_causal():
    q, k, v = setup()
    mesh = make_mesh(tp=1)

    dense = qk_norm_attention(q, k, v, causal=True)
    ring = sequence_sharded_attention(q, k, v, mesh, causal=True)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense), atol=2e-5)


def test_ring_matches_dense_key_mask():
    q, k, v = setup()
    mask = jnp.asarray(np.random.RandomState(0).rand(2, 64) > 0.25)
    mesh = make_mesh(tp=1)

    dense = qk_norm_attention(q, k, v, key_mask=mask)
    ring = sequence_sharded_attention(q, k, v, mesh, key_mask=mask)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense), atol=2e-5)


def test_ring_bf16_inputs():
    q, k, v = (t.astype(jnp.bfloat16) for t in setup())
    mesh = make_mesh(tp=1)

    dense = qk_norm_attention(q, k, v)
    ring = sequence_sharded_attention(q, k, v, mesh)
    assert ring.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(ring, np.float32), np.asarray(dense, np.float32), atol=2e-2
    )


def test_ring_grad_flows():
    q, k, v = setup()
    mesh = make_mesh(tp=1)

    def loss_ring(q, k, v):
        return jnp.sum(sequence_sharded_attention(q, k, v, mesh) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(qk_norm_attention(q, k, v) ** 2)

    g_r = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_d = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_r, g_d):
        # rtol=0: ~1e-10 gradient components are reduction-order noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=5e-5)


def test_maskgit_seq_shard_matches_dense():
    """Ring attention integrated INTO the models (round-2 review #5): a
    MaskGit built with seq_shard_mesh/axis routes its self-attention through
    ring attention under shard_map — same params, same output as the dense
    model. Sequence 4*4*4 = 64 tokens sharded 8-way."""
    from phenaki_tpu.models.maskgit import MaskGit

    mesh = make_mesh(tp=1)  # dp=8 as the sequence axis
    common = dict(
        dim=32, num_tokens=64, max_seq_len=64, depth=2, heads=2, dim_head=16,
        dim_context=16,
    )
    dense = MaskGit(**common)
    ring = MaskGit(**common, seq_shard_mesh=mesh, seq_shard_axis="dp")

    patch_shape = (4, 4, 4)
    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, 64, (2, 64)), jnp.int32
    )
    ctx = jnp.asarray(np.random.RandomState(1).randn(2, 5, 16), jnp.float32)
    variables = dense.init(
        jax.random.PRNGKey(0), ids, video_patch_shape=patch_shape, context=ctx
    )

    out_dense = dense.apply(
        variables, ids, video_patch_shape=patch_shape, context=ctx
    )
    out_ring = ring.apply(
        variables, ids, video_patch_shape=patch_shape, context=ctx
    )
    np.testing.assert_allclose(
        np.asarray(out_dense), np.asarray(out_ring), atol=5e-5, rtol=5e-5
    )


def test_cvivit_temporal_seq_shard_matches_dense():
    """C-ViViT's temporal transformers run ring attention over the frame
    axis when configured; reconstruction must match the dense model."""
    from phenaki_tpu.models.cvivit import CViViT

    mesh = make_mesh(tp=1)
    common = dict(
        dim=32, codebook_size=64, image_size=16, patch_size=8,
        temporal_patch_size=2, spatial_depth=1, temporal_depth=1,
        dim_head=16, heads=2,
    )
    dense = CViViT(**common)
    ring = CViViT(**common, seq_shard_mesh=mesh, seq_shard_axis="dp")

    # 17 frames -> 1 + 16/2 = 9 latent frames; 9 % 8 != 0 so ring would fall
    # back — use 15 frames -> 8 latent frames, divisible by the 8-way axis
    video = jnp.asarray(
        np.random.RandomState(0).rand(1, 15, 16, 16, 3), jnp.float32
    )
    variables = dense.init(jax.random.PRNGKey(0), video)

    ids_dense = dense.apply(variables, video, return_only_codebook_ids=True)
    ids_ring = ring.apply(variables, video, return_only_codebook_ids=True)
    # token ids are argmax-like discrete outputs: require exact agreement
    assert np.array_equal(np.asarray(ids_dense), np.asarray(ids_ring))


def test_maskgit_seq_shard_falls_back_on_indivisible():
    """Sequences that don't divide the axis fall back to dense attention
    (no error, same params)."""
    from phenaki_tpu.models.maskgit import MaskGit

    mesh = make_mesh(tp=1)
    common = dict(
        dim=32, num_tokens=64, max_seq_len=96, depth=1, heads=2, dim_head=16,
        dim_context=16,
    )
    ring = MaskGit(**common, seq_shard_mesh=mesh, seq_shard_axis="dp")
    dense = MaskGit(**common)

    patch_shape = (3, 3, 3)  # 27 tokens, not divisible by 8
    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, 64, (2, 27)), jnp.int32
    )
    ctx = jnp.asarray(np.random.RandomState(1).randn(2, 5, 16), jnp.float32)
    variables = dense.init(
        jax.random.PRNGKey(0), ids, video_patch_shape=patch_shape, context=ctx
    )
    out_ring = ring.apply(
        variables, ids, video_patch_shape=patch_shape, context=ctx
    )
    out_dense = dense.apply(
        variables, ids, video_patch_shape=patch_shape, context=ctx
    )
    np.testing.assert_allclose(
        np.asarray(out_ring), np.asarray(out_dense), atol=1e-6
    )


# ---------------------------------------------------------------------- #
# flash-kernel ring (bounded-shift Pallas chunks; interpret mode on CPU) #
# ---------------------------------------------------------------------- #


def _flash_ring_setup(n=128, b=1, h=2, d=16):
    from phenaki_tpu.ops.norms import l2norm

    q, k = l2norm(rand(10, b, h, n, d)), l2norm(rand(11, b, h, n, d))
    v = rand(12, b, h, n, d)
    return q, k, v


@pytest.fixture()
def interpret_pallas(monkeypatch):
    from phenaki_tpu.ops import pallas_attention as pa

    monkeypatch.setattr(pa, "_INTERPRET", True)
    yield


def test_flash_ring_matches_dense(interpret_pallas):
    """Per-rotation Pallas chunks with the GLOBAL pmax'd score bound must
    reproduce dense attention (round-3 review #5)."""
    from phenaki_tpu.parallel.ring_attention import _ring_use_flash

    q, k, v = _flash_ring_setup()
    bias = rand(13, 2, 128, 128) * 0.3
    mask = jnp.asarray(np.random.RandomState(1).rand(1, 128) > 0.2)
    mesh = make_mesh(jax.devices()[:2], tp=1)  # sp=2 -> 64 local rows
    assert _ring_use_flash(64, 16)  # this test must exercise the flash path

    dense = qk_norm_attention(
        q, k, v, attn_bias=bias, key_mask=mask, allow_flash=False
    )
    ring = sequence_sharded_attention(
        q, k, v, mesh, attn_bias=bias, key_mask=mask
    )
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense), atol=2e-5)


def test_flash_ring_matches_dense_causal(interpret_pallas):
    """Causal masking via runtime (q, k) offsets in SMEM: each rotation's
    chunk sees its true global positions."""
    q, k, v = _flash_ring_setup()
    mesh = make_mesh(jax.devices()[:2], tp=1)

    dense = qk_norm_attention(q, k, v, causal=True, allow_flash=False)
    ring = sequence_sharded_attention(q, k, v, mesh, causal=True)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense), atol=2e-5)


def test_flash_ring_grads_match_dense(interpret_pallas):
    """The chunk custom-VJP (raw-accumulator cotangents riding the standard
    backward kernels with do=ca, delta=-cl, lse=c2*ln2) must reproduce the
    dense gradients for q, k, v AND the bias."""
    q, k, v = _flash_ring_setup()
    bias = rand(14, 2, 128, 128) * 0.3
    mesh = make_mesh(jax.devices()[:2], tp=1)

    def loss_ring(q, k, v, bias):
        out = sequence_sharded_attention(q, k, v, mesh, attn_bias=bias)
        return jnp.sum(jnp.sin(out))

    def loss_dense(q, k, v, bias):
        out = qk_norm_attention(q, k, v, attn_bias=bias, allow_flash=False)
        return jnp.sum(jnp.sin(out))

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(g_ring, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


def test_flash_ring_null_kv_matches_dense(interpret_pallas):
    """Null keys/values (replicated learned params) fold into the ring as an
    extra local block — sequence sharding no longer excludes null-KV."""
    q, k, v = _flash_ring_setup()
    nkv = 2
    null_k = rand(15, 1, 2, nkv, 16) * 0.5
    null_v = rand(16, 1, 2, nkv, 16)
    mesh = make_mesh(jax.devices()[:2], tp=1)

    k_full = jnp.concatenate([null_k, k], axis=2)
    v_full = jnp.concatenate([null_v, v], axis=2)
    dense = qk_norm_attention(q, k_full, v_full, allow_flash=False)
    ring = sequence_sharded_attention(
        q, k, v, mesh, null_k=null_k, null_v=null_v
    )
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense), atol=2e-5)


def test_xla_ring_null_kv_matches_dense():
    """The XLA online-softmax ring supports null-KV too (small local rows
    route here)."""
    q, k, v = setup()  # n=64 over sp=8 -> 8 local rows -> XLA path
    nkv = 2
    null_k = rand(17, 2, 2, nkv, 16) * 0.5
    null_v = rand(18, 2, 2, nkv, 16)
    mesh = make_mesh(tp=1)

    k_full = jnp.concatenate([null_k, k], axis=2)
    v_full = jnp.concatenate([null_v, v], axis=2)
    dense = qk_norm_attention(q, k_full, v_full, allow_flash=False)
    ring = sequence_sharded_attention(
        q, k, v, mesh, null_k=null_k, null_v=null_v
    )
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense), atol=2e-5)


def test_flash_ring_sp_crossover(interpret_pallas, monkeypatch):
    """Past FLASH_RING_MAX_SP the wrapper must route to the XLA fori_loop
    ring (sp-independent program size; the flash unroll grows linearly in
    sp — measured 10x HLO at sp=8, examples/ring_timing.py --cpu-compile),
    and the numerics must stay identical to dense."""
    from phenaki_tpu.parallel import ring_attention as ra

    # selection logic: flash below the cap, XLA ring above it
    assert ra._ring_use_flash(64, 16, sp=ra.FLASH_RING_MAX_SP)
    assert not ra._ring_use_flash(64, 16, sp=ra.FLASH_RING_MAX_SP + 1)

    # force the crossover at sp=2 and check the XLA path's numerics ride
    # through the same wrapper unchanged
    monkeypatch.setattr(ra, "FLASH_RING_MAX_SP", 1)
    q, k, v = _flash_ring_setup()
    mesh = make_mesh(jax.devices()[:2], tp=1)  # sp=2 > cap -> XLA ring
    dense = qk_norm_attention(q, k, v, allow_flash=False)
    ring = sequence_sharded_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense), atol=2e-5)
