"""JAX-native T5 encoder (text/t5_jax.py): numerical parity with HuggingFace's
torch T5EncoderModel on randomly initialized weights (no network needed —
transformers builds models from a config without downloading), plus the
mask/output contract the pipeline relies on (reference t5.py:64-103)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phenaki_tpu.text.t5_jax import (
    T5EncoderConfig,
    T5EncoderStack,
    convert_hf_state_dict,
    relative_position_bucket,
)

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


TINY = dict(
    vocab_size=100,
    d_model=32,
    d_kv=8,
    num_heads=4,
    d_ff=64,
    num_layers=2,
)


def build_hf_model(gated: bool):
    hf_cfg = transformers.T5Config(
        **TINY,
        relative_attention_num_buckets=32,
        relative_attention_max_distance=128,
        feed_forward_proj="gated-gelu" if gated else "relu",
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    model = transformers.T5EncoderModel(hf_cfg)
    model.eval()
    return model, hf_cfg


@pytest.mark.parametrize("gated", [True, False])
def test_parity_with_hf_random_weights(gated):
    """Full-stack output parity: random HF weights -> convert_hf_state_dict ->
    T5EncoderStack must reproduce last_hidden_state (catches any kernel
    transposition / bucketing / norm mistakes)."""
    model, hf_cfg = build_hf_model(gated)
    cfg = T5EncoderConfig.from_hf(hf_cfg)
    assert cfg.gated_act == gated

    variables = convert_hf_state_dict(model.state_dict(), cfg)
    stack = T5EncoderStack(cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, TINY["vocab_size"], size=(2, 7))
    mask = np.ones((2, 7), np.int64)
    mask[0, 5:] = 0  # ragged batch
    mask[1, 3:] = 0

    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()
    ref = ref * mask[..., None]  # reference pipeline zeroes padding

    out = jax.jit(stack.apply)(
        variables, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_bucket_function_matches_hf():
    from transformers.models.t5.modeling_t5 import T5Attention

    rel = np.arange(-300, 301).reshape(1, -1)
    ours = relative_position_bucket(rel, num_buckets=32, max_distance=128)
    theirs = T5Attention._relative_position_bucket(
        torch.from_numpy(rel), bidirectional=True, num_buckets=32, max_distance=128
    ).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_output_contract_mask_recoverable():
    """Padded positions must be exactly zero so downstream can recover the
    text mask as any(embed != 0, -1) (reference phenaki_pytorch.py:461,601)."""
    cfg = T5EncoderConfig(**TINY)
    stack = T5EncoderStack(cfg)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 100, (2, 6)), jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], jnp.int32)
    variables = stack.init(jax.random.PRNGKey(0), ids, mask)
    out = stack.apply(variables, ids, mask)
    recovered = jnp.any(out != 0, axis=-1)
    np.testing.assert_array_equal(np.asarray(recovered), np.asarray(mask, bool))


def test_runs_inside_jit_and_grad_free():
    cfg = T5EncoderConfig(**TINY)
    stack = T5EncoderStack(cfg)
    ids = jnp.zeros((1, 4), jnp.int32)
    variables = stack.init(jax.random.PRNGKey(0), ids)

    @jax.jit
    def encode(v, i):
        return stack.apply(v, i)

    out = encode(variables, ids)
    assert out.shape == (1, 4, TINY["d_model"])
    assert np.isfinite(np.asarray(out)).all()
