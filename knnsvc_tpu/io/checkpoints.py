"""PyTorch checkpoint -> JAX pytree conversion.

Converts the reference's released checkpoints (WavLM-Large.pt with {'cfg',
'model'}, HiFi-GAN g_*.pt with {'generator'} — ref ddsp_hubconf.py:113-121,
hifigan/utils.py:41-46) into this framework's parameter pytrees.

Weight-norm (g·v/||v||) is folded into plain weights at conversion time —
inference never pays for the re-normalization (ref SURVEY.md §7.3).

torch is only needed for conversion, never at runtime; import is deferred.
"""

from __future__ import annotations

import pickle
from typing import Any, Mapping

import numpy as np

from knnsvc_tpu.config import WavLMConfig

Params = dict[str, Any]


def _np(t) -> np.ndarray:
    """torch tensor -> float32 numpy."""
    return t.detach().cpu().float().numpy()


def fold_weight_norm(g: np.ndarray, v: np.ndarray, dim: int) -> np.ndarray:
    """weight = g * v / ||v|| with the norm over all dims except `dim`
    (torch.nn.utils.weight_norm semantics)."""
    axes = tuple(i for i in range(v.ndim) if i != dim)
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes, keepdims=True))
    return (g * v / norm).astype(np.float32)


def _lin(sd: Mapping[str, Any], prefix: str) -> Params:
    """torch Linear (out,in) -> {'w': (in,out), 'b': (out,)}."""
    p: Params = {"w": np.ascontiguousarray(_np(sd[prefix + ".weight"]).T)}
    if prefix + ".bias" in sd:
        p["b"] = _np(sd[prefix + ".bias"])
    return p


def _ln(sd: Mapping[str, Any], prefix: str) -> Params:
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


# ------------------------------------------------------------------ WavLM


def convert_wavlm_state_dict(sd: Mapping[str, Any], cfg: WavLMConfig) -> Params:
    """Reference WavLM state_dict -> knnsvc_tpu pytree (see models/wavlm)."""
    fe_layers = []
    for i, _ in enumerate(cfg.conv_layers):
        pre = f"feature_extractor.conv_layers.{i}"
        blk: Params = {"conv": {"w": _np(sd[f"{pre}.0.weight"])}}
        if f"{pre}.0.bias" in sd:
            blk["conv"]["b"] = _np(sd[f"{pre}.0.bias"])
        if cfg.extractor_mode == "layer_norm":
            # Sequential(TransposeLast, Fp32LayerNorm, TransposeLast) at idx 2
            blk["norm"] = _ln(sd, f"{pre}.2.1")
        elif cfg.extractor_mode == "default" and i == 0:
            blk["norm"] = _ln(sd, f"{pre}.2")  # Fp32GroupNorm at idx 2
        fe_layers.append(blk)

    pos_w = fold_weight_norm(
        _np(sd["encoder.pos_conv.0.weight_g"]), _np(sd["encoder.pos_conv.0.weight_v"]), dim=2
    )

    n_layers = cfg.encoder_layers

    def stack_lin(fmt: str) -> Params:
        ws, bs = [], []
        for i in range(n_layers):
            p = _lin(sd, fmt.format(i))
            ws.append(p["w"])
            if "b" in p:
                bs.append(p["b"])
        out: Params = {"w": np.stack(ws)}
        if bs:
            out["b"] = np.stack(bs)
        return out

    def stack_ln(fmt: str) -> Params:
        return {
            "scale": np.stack([_np(sd[fmt.format(i) + ".weight"]) for i in range(n_layers)]),
            "bias": np.stack([_np(sd[fmt.format(i) + ".bias"]) for i in range(n_layers)]),
        }

    layers: Params = {
        "attn": {
            "q": stack_lin("encoder.layers.{}.self_attn.q_proj"),
            "k": stack_lin("encoder.layers.{}.self_attn.k_proj"),
            "v": stack_lin("encoder.layers.{}.self_attn.v_proj"),
            "out": stack_lin("encoder.layers.{}.self_attn.out_proj"),
        },
        "ln1": stack_ln("encoder.layers.{}.self_attn_layer_norm"),
        "fc1": stack_lin("encoder.layers.{}.fc1"),
        "fc2": stack_lin("encoder.layers.{}.fc2"),
        "ln2": stack_ln("encoder.layers.{}.final_layer_norm"),
    }
    if cfg.gru_rel_pos:
        layers["attn"]["grep"] = stack_lin("encoder.layers.{}.self_attn.grep_linear")
        layers["attn"]["grep_a"] = np.stack(
            [_np(sd[f"encoder.layers.{i}.self_attn.grep_a"]).reshape(-1) for i in range(n_layers)]
        )

    params: Params = {
        "feature_extractor": {"layers": fe_layers},
        "layer_norm": _ln(sd, "layer_norm"),
        "encoder": {
            "pos_conv": {"w": pos_w, "b": _np(sd["encoder.pos_conv.0.bias"])},
            "layer_norm": _ln(sd, "encoder.layer_norm"),
            "layers": layers,
        },
    }
    if "post_extract_proj.weight" in sd:
        params["post_extract_proj"] = _lin(sd, "post_extract_proj")
    if cfg.relative_position_embedding:
        params["encoder"]["rel_attn_bias"] = _np(
            sd["encoder.layers.0.self_attn.relative_attention_bias.weight"]
        )
    return params


def load_wavlm_checkpoint(path: str) -> tuple[Params, WavLMConfig]:
    """Load a WavLM-Large.pt torch checkpoint ({'cfg': dict, 'model':
    state_dict} — ref ddsp_hubconf.py:113-121)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    cfg = WavLMConfig.from_dict(ckpt["cfg"])
    return convert_wavlm_state_dict(ckpt["model"], cfg), cfg


# ------------------------------------------------------------------ pytree io


def save_params(path: str, params: Params) -> None:
    """Persist a parameter pytree as pickled numpy (framework-native format)."""
    np_params = _to_numpy(params)
    with open(path, "wb") as f:
        pickle.dump(np_params, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_params(path: str) -> Params:
    with open(path, "rb") as f:
        return pickle.load(f)


def _to_numpy(tree):
    if isinstance(tree, dict):
        return {k: _to_numpy(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_to_numpy(v) for v in tree)
    return np.asarray(tree)
