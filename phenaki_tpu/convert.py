"""Reference-checkpoint converters: load `lucidrains/phenaki-pytorch`
torch `state_dict`s into phenaki_tpu param trees.

A user of the reference switching to this framework brings their trained
weights with them:

    sd = torch.load("cvivit.pt")["model"]          # reference checkpoint
    params = convert_cvivit_state_dict(sd, cvivit) # flax param tree
    sd = torch.load("maskgit.pt")
    mg_params = convert_maskgit_state_dict(sd, maskgit)

Layout differences handled here (reference attention.py / cvivit.py /
phenaki_pytorch.py @ 2024-08-07):

  * torch `nn.Linear.weight` is (out, in) -> flax Dense kernel is (in, out)
    (transposed);
  * the PEG depthwise conv weight is (dim, 1, kt, kh, kw) -> ours is
    (kt, kh, kw, 1, dim);
  * the reference stores null key/values INTERLEAVED — `null_kv[h, 2i]` is
    the i-th null key and `null_kv[h, 2i+1]` the i-th null value
    (attention.py:148 `'h (n r) d'` with r=2) — ours stores all keys then
    all values;
  * the reference's bias-less LayerNorm keeps a frozen all-zero `beta`
    buffer in the state_dict (attention.py:29-36); it is validated to be
    zero and dropped. The FF block's inner LayerNorm is a regular LN whose
    weight/bias map to our gamma/beta;
  * `scan_layers=True` models stack the converted per-layer trees with
    `stack_layer_params`.

The quantizer inside C-ViViT lives in an external dependency
(`vector-quantize-pytorch`); LFQ projection weights (`vq.project_in/out`)
are mapped when present, and the cosine-VQ codebook (`vq._codebook.embed`)
maps to our `codebook`. Missing vq keys leave the target's initialized
values in place (reported in the returned `unused` list of `strict=False`
mode).

Numerical parity of every converter here is asserted against the actual
reference implementation in tests/test_reference_parity.py.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Tuple

import numpy as np


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _t(v) -> np.ndarray:
    """torch Linear weight (out, in) -> flax Dense kernel (in, out)."""
    return _np(v).T


class _SD:
    """State-dict view with consumption tracking."""

    def __init__(self, sd: Mapping[str, Any], prefix: str = ""):
        self.sd = dict(sd)
        self.prefix = prefix
        self.consumed: set = set()

    def sub(self, prefix: str) -> "_SD":
        child = _SD.__new__(_SD)
        child.sd = self.sd
        child.prefix = self.prefix + prefix
        child.consumed = self.consumed
        return child

    def take(self, key: str) -> np.ndarray:
        full = self.prefix + key
        self.consumed.add(full)
        return self.sd[full]

    def has(self, key: str) -> bool:
        return (self.prefix + key) in self.sd

    def take_zero_beta(self, key: str) -> None:
        """Consume a frozen-zero beta buffer, validating it IS zero."""
        full = self.prefix + key
        if full in self.sd:
            v = _np(self.sd[full])
            assert np.allclose(v, 0.0), (
                f"{full} expected to be the reference's frozen-zero LayerNorm "
                f"beta but is non-zero (max |v|={np.abs(v).max()})"
            )
            self.consumed.add(full)

    def unused(self) -> List[str]:
        return sorted(k for k in self.sd if k not in self.consumed)


def _convert_attention(sd: _SD, num_null_kv: int, cross: bool) -> Dict[str, Any]:
    out: Dict[str, Any] = {
        "to_q": {"kernel": _t(sd.take("to_q.weight"))},
        "to_kv": {"kernel": _t(sd.take("to_kv.weight"))},
        "to_out": {"kernel": _t(sd.take("to_out.weight"))},
        "q_scale": _np(sd.take("q_scale")),
        "k_scale": _np(sd.take("k_scale")),
        "norm": {"gamma": _np(sd.take("norm.gamma"))},
    }
    sd.take_zero_beta("norm.beta")

    null_kv = _np(sd.take("null_kv"))  # (h, 2n, d), interleaved k/v pairs
    if num_null_kv > 0:
        h, two_n, d = null_kv.shape
        assert two_n == 2 * num_null_kv
        pairs = null_kv.reshape(h, num_null_kv, 2, d)
        # ours: all keys first, then all values
        out["null_kv"] = np.concatenate([pairs[:, :, 0], pairs[:, :, 1]], axis=1)

    if cross:
        out["context_norm"] = {"gamma": _np(sd.take("context_norm.gamma"))}
        sd.take_zero_beta("context_norm.beta")
    else:
        # the reference's self-attention still constructs (and checkpoints)
        # an unused context_norm; consume it so strict mode stays clean
        if sd.has("context_norm.gamma"):
            sd.consumed.add(sd.prefix + "context_norm.gamma")
            sd.take_zero_beta("context_norm.beta")
    return out


def _convert_ff(sd: _SD) -> Dict[str, Any]:
    return {
        "norm": {
            "gamma": _np(sd.take("0.weight")),
            "beta": _np(sd.take("0.bias")),
        },
        "proj_in": {"kernel": _t(sd.take("1.weight"))},
        "proj_out": {"kernel": _t(sd.take("4.weight"))},
    }


def _convert_transformer(
    sd: _SD,
    *,
    depth: int,
    peg: bool,
    has_cross_attn: bool,
    num_null_kv: int,
    scan_layers: bool,
) -> Dict[str, Any]:
    """Reference Transformer (attention.py:279-332) -> our Transformer
    subtree. Reference layer tuple order: (peg?, self_attn, cross_attn?, ff)
    indexed 0..3 with None placeholders KEPT in the ModuleList, so indices
    are stable: 0=peg, 1=self_attn, 2=cross_attn, 3=ff."""
    out: Dict[str, Any] = {}
    for i in range(depth):
        layer_sd = sd.sub(f"layers.{i}.")
        layer: Dict[str, Any] = {}
        if peg:
            w = _np(layer_sd.take("0.dsconv.weight"))  # (dim, 1, kt, kh, kw)
            layer["peg"] = {
                "kernel": w.transpose(2, 3, 4, 1, 0),
                "bias": _np(layer_sd.take("0.dsconv.bias")),
            }
        layer["self_attn"] = _convert_attention(
            layer_sd.sub("1."), num_null_kv=0, cross=False
        )
        if has_cross_attn:
            layer["cross_attn"] = _convert_attention(
                layer_sd.sub("2."), num_null_kv=num_null_kv, cross=True
            )
        layer["ff"] = _convert_ff(layer_sd.sub("3."))
        out[f"layers_{i}"] = layer

    out["norm_out"] = {"gamma": _np(sd.take("norm_out.gamma"))}
    sd.take_zero_beta("norm_out.beta")

    if scan_layers:
        from phenaki_tpu.models.transformer import stack_layer_params

        out = stack_layer_params(out, depth)
    return out


def _convert_cpb(sd: _SD, layers: int) -> Dict[str, Any]:
    """ContinuousPositionBias MLP (attention.py:229-275): net.0.0 ->
    net_in, net.k.0 -> net_hidden_{k-1}, net.<layers> -> net_out."""
    out = {
        "net_in": {
            "kernel": _t(sd.take("net.0.0.weight")),
            "bias": _np(sd.take("net.0.0.bias")),
        }
    }
    for k in range(1, layers):
        out[f"net_hidden_{k - 1}"] = {
            "kernel": _t(sd.take(f"net.{k}.0.weight")),
            "bias": _np(sd.take(f"net.{k}.0.bias")),
        }
    out["net_out"] = {
        "kernel": _t(sd.take(f"net.{layers}.weight")),
        "bias": _np(sd.take(f"net.{layers}.bias")),
    }
    return out


def convert_maskgit_state_dict(
    sd: Mapping[str, Any], maskgit, strict: bool = True
) -> Dict[str, Any]:
    """Reference MaskGit (phenaki_pytorch.py:105-213) state_dict ->
    phenaki_tpu MaskGit param tree."""
    assert maskgit.reference_attention_kv, (
        "construct the MaskGit with reference_attention_kv=True — reference"
        " weights expect self-attention K/V from the pre-norm input"
        " (reference attention.py:138-142)"
    )
    s = _SD(sd)
    params = {
        "token_emb": {"embedding": _np(s.take("token_emb.weight"))},
        "pos_emb": {"embedding": _np(s.take("pos_emb.weight"))},
        "continuous_pos_bias": _convert_cpb(s.sub("continuous_pos_bias."), 2),
        "transformer": _convert_transformer(
            s.sub("transformer."),
            depth=maskgit.depth,
            peg=True,
            has_cross_attn=not maskgit.unconditional,
            num_null_kv=2,  # both implementations hardcode 2 null KV pairs
            scan_layers=maskgit.scan_layers,
        ),
        "to_logits": {
            "kernel": _t(s.take("to_logits.weight")),
            "bias": _np(s.take("to_logits.bias")),
        },
    }
    unused = s.unused()
    if strict and unused:
        raise ValueError(f"unconverted reference keys: {unused}")
    return params


def convert_token_critic_state_dict(
    sd: Mapping[str, Any], critic, strict: bool = True
) -> Dict[str, Any]:
    """Reference TokenCritic (phenaki_pytorch.py:217-302) state_dict ->
    phenaki_tpu TokenCritic param tree."""
    assert critic.reference_attention_kv, (
        "construct the TokenCritic with reference_attention_kv=True (see"
        " convert_maskgit_state_dict)"
    )
    s = _SD(sd)
    params = {
        "token_emb": {"embedding": _np(s.take("token_emb.weight"))},
        "pos_emb": {"embedding": _np(s.take("pos_emb.weight"))},
        "transformer": _convert_transformer(
            s.sub("transformer."),
            depth=critic.depth,
            peg=True,
            has_cross_attn=critic.has_cross_attn,
            num_null_kv=2,  # Transformer default in both implementations
            scan_layers=critic.scan_layers,
        ),
        "to_logits": {
            "kernel": _t(s.take("to_logits.0.weight")),
            "bias": _np(s.take("to_logits.0.bias")),
        },
    }
    unused = s.unused()
    if strict and unused:
        raise ValueError(f"unconverted reference keys: {unused}")
    return params


def _convert_patch_emb(sd: _SD) -> Tuple[Dict, Dict, Dict]:
    """Dual-patch-norm embedding: Sequential(Rearrange, LN, Linear, LN)
    (cvivit.py:273-285) -> (norm_in, proj, norm_out)."""
    norm_in = {"gamma": _np(sd.take("1.weight")), "beta": _np(sd.take("1.bias"))}
    proj = {"kernel": _t(sd.take("2.weight")), "bias": _np(sd.take("2.bias"))}
    norm_out = {"gamma": _np(sd.take("3.weight")), "beta": _np(sd.take("3.bias"))}
    return norm_in, proj, norm_out


def convert_cvivit_state_dict(
    sd: Mapping[str, Any], cvivit, strict: bool = True
) -> Dict[str, Any]:
    """Reference CViViT (cvivit.py:226-671) state_dict -> phenaki_tpu CViViT
    param tree (encoder, decoder, patch embeddings, CPB; the external-dep
    quantizer's projections/codebook map when their keys are present).

    Pass the vgg-stripped model state_dict (the reference already excludes
    vgg from checkpoints, cvivit.py:423-429); discriminator keys (`discr.*`)
    are ignored — the tokenizer consumed by Phenaki doesn't carry one."""
    assert cvivit.peg_reference_layout and cvivit.reference_attention_kv, (
        "construct the CViViT with peg_reference_layout=True and"
        " reference_attention_kv=True — reference weights expect the"
        " scrambled temporal-PEG grid (reference attention.py:71) and"
        " pre-norm self-attention K/V (attention.py:138-142)"
    )
    s = _SD(sd)
    # discriminator/vgg are separate models in our layout — drop here
    for k in list(s.sd):
        if k.startswith(("discr.", "vgg.")):
            s.consumed.add(k)

    params: Dict[str, Any] = {}
    params["spatial_rel_pos_bias"] = _convert_cpb(
        s.sub("spatial_rel_pos_bias."), 2
    )

    ni, pj, no = _convert_patch_emb(s.sub("to_patch_emb_first_frame."))
    params["patch_norm_in_first"] = ni
    params["patch_proj_first"] = pj
    params["patch_norm_out_first"] = no
    ni, pj, no = _convert_patch_emb(s.sub("to_patch_emb."))
    params["patch_norm_in_rest"] = ni
    params["patch_proj_rest"] = pj
    params["patch_norm_out_rest"] = no

    common = dict(num_null_kv=0, scan_layers=cvivit.scan_layers)
    params["enc_spatial_transformer"] = _convert_transformer(
        s.sub("enc_spatial_transformer."),
        depth=cvivit.spatial_depth, peg=False, has_cross_attn=False, **common,
    )
    params["enc_temporal_transformer"] = _convert_transformer(
        s.sub("enc_temporal_transformer."),
        depth=cvivit.temporal_depth, peg=True, has_cross_attn=False, **common,
    )
    params["dec_spatial_transformer"] = _convert_transformer(
        s.sub("dec_spatial_transformer."),
        depth=cvivit.spatial_depth, peg=False, has_cross_attn=False, **common,
    )
    params["dec_temporal_transformer"] = _convert_transformer(
        s.sub("dec_temporal_transformer."),
        depth=cvivit.temporal_depth, peg=True, has_cross_attn=False, **common,
    )

    params["to_pixels_first"] = {
        "kernel": _t(s.take("to_pixels_first_frame.0.weight")),
        "bias": _np(s.take("to_pixels_first_frame.0.bias")),
    }
    params["to_pixels_rest"] = {
        "kernel": _t(s.take("to_pixels.0.weight")),
        "bias": _np(s.take("to_pixels.0.bias")),
    }

    # quantizer (external vector-quantize-pytorch): best-effort mapping
    vq_params: Dict[str, Any] = {}
    if s.has("vq.project_in.weight"):
        vq_params["project_in"] = {"kernel": _t(s.take("vq.project_in.weight"))}
    if s.has("vq.project_out.weight"):
        vq_params["project_out"] = {"kernel": _t(s.take("vq.project_out.weight"))}
    if s.has("vq._codebook.embed"):
        emb = _np(s.take("vq._codebook.embed"))
        vq_params["codebook"] = emb[0] if emb.ndim == 3 else emb
    if vq_params:
        params["vq"] = vq_params

    unused = [
        k for k in s.unused() if not k.startswith("vq.")
    ]
    if strict and unused:
        raise ValueError(f"unconverted reference keys: {unused}")
    return params
