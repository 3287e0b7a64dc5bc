"""WavLM encoder, TPU-native.

Functional re-design of the reference encoder (ref wavlm/WavLM.py,
wavlm/modules.py). Parameters are a plain pytree (nested dicts; the 24
transformer layers are *stacked* along a leading axis so the encoder body is a
single `lax.scan` — one compiled layer program instead of 24, and early exit
at layer L is just slicing the stacked params to [:L]).

Architecture notes (with reference anchors):

- Conv frontend: 7 strided Conv1d blocks, total stride 320
  (WavLM.py:173,378-504). 'default' mode = GroupNorm(d, d) on block 0 only;
  'layer_norm' mode = fp32 LayerNorm on every block. GELU (exact/erf form)
  throughout.
- Positional conv: Conv1d(k=128, groups=16) with weight-norm (folded at
  conversion), SamePad trims 1, GELU (WavLM.py:514-527).
- Transformer: T5-style bucketed relative position bias computed ONCE from
  layer 0's embedding table and shared by all layers (WavLM.py:549,
  modules.py:504-506); each layer applies its own gated-relative-position
  (gru_rel_pos) scaling computed from that layer's *post-layernorm attention
  input* reshaped to heads — matching the CUDA fast path the reference
  actually executes (modules.py:523-533), not the slow-path variant that
  gates on the scaled q-projection.
- Early exit at `output_layer` (WavLM.py:595-604): with layer_norm_first the
  final encoder LayerNorm is NOT applied when exiting early (WavLM.py:567).
- The layer-results list is [post-pos-conv input, layer_1, ..., layer_24]
  (25 entries) — a one-hot layer weighting at index L therefore equals the
  output of layer L (WavLM.py:589-601, knnvc_utils.py:3-6).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from knnsvc_tpu.config import WavLMConfig
from knnsvc_tpu.precision import get_precision

Params = dict[str, Any]


# ---------------------------------------------------------------- primitives


def layer_norm(x: jax.Array, p: Params, eps: float = 1e-5) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def group_norm_per_channel(x: jax.Array, p: Params, eps: float = 1e-5) -> jax.Array:
    """GroupNorm(num_groups == channels): normalize each channel over time.
    x: (B, C, T). Ref wavlm/modules.py:45-57 (Fp32GroupNorm)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"][None, :, None] + p["bias"][None, :, None]


def linear(x: jax.Array, p: Params) -> jax.Array:
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32, precision=get_precision())
    if "b" in p:
        y = y + p["b"]
    return y


def gelu(x: jax.Array) -> jax.Array:
    # reference uses exact (erf) GELU everywhere (wavlm/modules.py:140-141)
    return jax.nn.gelu(x, approximate=False)


def conv1d(x: jax.Array, w: jax.Array, b: jax.Array | None = None, stride: int = 1,
           padding: int = 0, groups: int = 1) -> jax.Array:
    """x: (B, C_in, T), w: (C_out, C_in/groups, K) — torch Conv1d layout."""
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
        precision=get_precision(),
    )
    if b is not None:
        y = y + b[None, :, None]
    return y


# ---------------------------------------------------------------- rel pos bias


def relative_position_bucket(relative_position: jax.Array, num_buckets: int,
                             max_distance: int) -> jax.Array:
    """Bidirectional T5 bucketing (ref wavlm/modules.py:417-442)."""
    num_buckets = num_buckets // 2
    relative_buckets = (relative_position > 0).astype(jnp.int32) * num_buckets
    rel = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    rel_if_large = max_exact + (
        jnp.log(rel.astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    rel_if_large = jnp.minimum(rel_if_large, num_buckets - 1)
    return relative_buckets + jnp.where(is_small, rel, rel_if_large)


def compute_position_bias(rel_attn_bias: jax.Array, seq_len: int, num_buckets: int,
                          max_distance: int) -> jax.Array:
    """-> (H, T, T). Computed from the relative offset diagonal (2T-1 distinct
    values) instead of a (T, T) bucket matrix — same result, O(T) bucket math."""
    offsets = jnp.arange(-(seq_len - 1), seq_len)          # j - i
    buckets = relative_position_bucket(offsets, num_buckets, max_distance)  # (2T-1,)
    diag_bias = rel_attn_bias[buckets]                      # (2T-1, H)
    i = jnp.arange(seq_len)
    idx = (seq_len - 1) + (i[None, :] - i[:, None])         # (T, T) in [0, 2T-2]
    bias = diag_bias[idx]                                   # (T, T, H)
    return jnp.transpose(bias, (2, 0, 1))


# ---------------------------------------------------------------- attention


# Pallas fused-attention fast path: enabled automatically on TPU for the
# B=1, unmasked, bias-present case (the conversion pipeline's shape).
USE_PALLAS_ATTENTION = True


def _pallas_attention_ok(B: int, head_dim: int, pos_bias, padding_mask) -> bool:
    if not USE_PALLAS_ATTENTION or B != 1 or pos_bias is None or padding_mask is not None:
        return False
    if head_dim % 8 != 0:
        return False
    # the kernel's MXU dots run at hardware-default precision; keep the fp32
    # HIGHEST parity path on the XLA einsums
    if get_precision() == jax.lax.Precision.HIGHEST:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def _gate_values(query: jax.Array, p: Params, num_heads: int) -> jax.Array:
    """gate_a_1 per (B, H, T, 1) — shared by both attention paths."""
    B, T, C = query.shape
    head_dim = C // num_heads
    q_heads = query.reshape(B, T, num_heads, head_dim).transpose(0, 2, 1, 3)
    g = linear(q_heads, p["grep"]).reshape(B, num_heads, T, 2, 4).sum(-1)
    gate_a, gate_b = jnp.split(jax.nn.sigmoid(g), 2, axis=-1)
    grep_a = p["grep_a"].reshape(1, num_heads, 1, 1)
    return gate_a * (gate_b * grep_a - 1.0) + 2.0            # (B, H, T, 1)


def multihead_attention(x: jax.Array, p: Params, pos_bias: jax.Array | None,
                        num_heads: int, padding_mask: jax.Array | None = None) -> jax.Array:
    """Self-attention with additive (gated) relative position bias.
    x: (B, T, C) -> (B, T, C). Semantics == F.multi_head_attention_forward with
    attn_mask = gated bias (ref wavlm/modules.py:540-563)."""
    B, T, C = x.shape
    head_dim = C // num_heads
    scaling = head_dim ** -0.5

    q = linear(x, p["q"])
    k = linear(x, p["k"])
    v = linear(x, p["v"])

    def heads(t):
        return t.reshape(B, T, num_heads, head_dim).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)

    if _pallas_attention_ok(B, head_dim, pos_bias, padding_mask):
        from knnsvc_tpu.ops.attention import gated_bias_attention

        gate = _gate_values(x, p, num_heads)[0, :, :, 0]     # (H, T)
        out = gated_bias_attention(q[0], k[0], v[0], pos_bias, gate)[None]
    else:
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scaling, k,
                            preferred_element_type=jnp.float32, precision=get_precision())
        if pos_bias is not None:
            gated = _gate_values(x, p, num_heads) * pos_bias[None]
            logits = logits + gated
        if padding_mask is not None:
            logits = jnp.where(padding_mask[:, None, None, :], -jnp.inf, logits)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                         preferred_element_type=jnp.float32, precision=get_precision())
    out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
    return linear(out, p["out"])


def encoder_layer(x: jax.Array, p: Params, pos_bias: jax.Array | None, num_heads: int,
                  layer_norm_first: bool, padding_mask: jax.Array | None = None) -> jax.Array:
    """One transformer layer (ref wavlm/WavLM.py:677-742)."""
    if layer_norm_first:
        h = layer_norm(x, p["ln1"])
        x = x + multihead_attention(h, p["attn"], pos_bias, num_heads, padding_mask)
        h = layer_norm(x, p["ln2"])
        x = x + linear(gelu(linear(h, p["fc1"])), p["fc2"])
    else:
        x = x + multihead_attention(x, p["attn"], pos_bias, num_heads, padding_mask)
        x = layer_norm(x, p["ln1"])
        x = x + linear(gelu(linear(x, p["fc1"])), p["fc2"])
        x = layer_norm(x, p["ln2"])
    return x


# ---------------------------------------------------------------- frontend


def conv_frontend(wav: jax.Array, p: Params, cfg: WavLMConfig) -> jax.Array:
    """(B, T_samples) -> (B, C, T_frames). Ref wavlm/WavLM.py:378-504."""
    x = wav[:, None, :]
    for i, (dim, kernel, stride) in enumerate(cfg.conv_layers):
        blk = p["layers"][i]
        x = conv1d(x, blk["conv"]["w"], blk["conv"].get("b"), stride=stride)
        if cfg.extractor_mode == "layer_norm":
            x = jnp.swapaxes(x, 1, 2)
            x = layer_norm(x, blk["norm"])
            x = jnp.swapaxes(x, 1, 2)
        elif cfg.extractor_mode == "default" and i == 0:
            x = group_norm_per_channel(x, blk["norm"])
        x = gelu(x)
    return x


def pos_conv(x: jax.Array, p: Params, cfg: WavLMConfig) -> jax.Array:
    """Convolutional positional embedding (ref wavlm/WavLM.py:514-527).
    x: (B, T, C). weight-norm is folded into p['w'] at load time."""
    h = conv1d(jnp.swapaxes(x, 1, 2), p["w"], p["b"],
               padding=cfg.conv_pos // 2, groups=cfg.conv_pos_groups)
    if cfg.conv_pos % 2 == 0:
        h = h[:, :, :-1]  # SamePad (ref wavlm/modules.py:72-83)
    return gelu(jnp.swapaxes(h, 1, 2))


# ---------------------------------------------------------------- full encoder


def _encoder_prelude(params: Params, cfg: WavLMConfig, wav: jax.Array,
                     padding_mask: jax.Array | None = None) -> jax.Array:
    """wav (B, T_samples) -> transformer input (B, T, C): conv frontend,
    post-frontend LayerNorm, projection, pos-conv add, optional pre-LN.
    Padded frames are zeroed BEFORE the positional conv (ref WavLM.py:574-577)
    so they cannot leak into real frames through its 128-tap kernel."""
    feats = conv_frontend(wav, params["feature_extractor"], cfg)   # (B, C0, T)
    feats = jnp.swapaxes(feats, 1, 2)                               # (B, T, C0)
    feats = layer_norm(feats, params["layer_norm"])
    if "post_extract_proj" in params:
        feats = linear(feats, params["post_extract_proj"])
    if padding_mask is not None:
        feats = jnp.where(padding_mask[:, :, None], 0.0, feats)
    enc = params["encoder"]
    x = feats + pos_conv(feats, enc["pos_conv"], cfg)
    if not cfg.layer_norm_first:
        x = layer_norm(x, enc["layer_norm"])
    return x


def _scan_layers(x: jax.Array, stacked: Params, pos_bias: jax.Array | None,
                 cfg: WavLMConfig, collect: bool, padding_mask: jax.Array | None = None):
    def body(carry, layer_params):
        y = encoder_layer(carry, layer_params, pos_bias,
                          cfg.encoder_attention_heads, cfg.layer_norm_first,
                          padding_mask=padding_mask)
        return y, (y if collect else None)

    return jax.lax.scan(body, x, stacked)


_jit_position_bias = jax.jit(compute_position_bias, static_argnames=("seq_len", "num_buckets", "max_distance"))
# keyed by id(table) BUT each entry keeps a strong reference to the table, so
# the id can never be recycled while the entry lives (arrays are neither
# hashable nor weak-referenceable, ruling out WeakKeyDictionary). Bounded LRU.
_POS_BIAS_CACHE: dict[int, tuple] = {}  # id -> (table_ref, {seq_len: bias})
_POS_BIAS_MAX_TABLES = 4


def cached_position_bias(params: Params, cfg: WavLMConfig, seq_len: int) -> jax.Array | None:
    """The (H, T, T) bias only depends on (table, T) — materializing it costs
    ~19 ms at T=1504 (145 MB of HBM writes), more than the attention math of
    six layers. Cache it per sequence length across encode calls (both pools,
    every 30-s chunk, every utterance of a bulk run share it)."""
    if not cfg.relative_position_embedding:
        return None
    table = params["encoder"]["rel_attn_bias"]
    if isinstance(table, jax.core.Tracer):
        # inside an outer jit trace: no host-side caching, just inline
        return compute_position_bias(table, seq_len, cfg.num_buckets, cfg.max_distance)
    key = id(table)
    entry = _POS_BIAS_CACHE.get(key)
    if entry is None or entry[0] is not table:
        if len(_POS_BIAS_CACHE) >= _POS_BIAS_MAX_TABLES:
            _POS_BIAS_CACHE.pop(next(iter(_POS_BIAS_CACHE)))
        entry = (table, {})
    else:
        del _POS_BIAS_CACHE[key]  # re-insert at the back: true LRU eviction
    _POS_BIAS_CACHE[key] = entry
    per_table = entry[1]
    if seq_len not in per_table:
        if len(per_table) > 16:
            per_table.clear()
        per_table[seq_len] = _jit_position_bias(
            table, seq_len, cfg.num_buckets, cfg.max_distance
        )
    return per_table[seq_len]


@functools.partial(jax.jit, static_argnums=(1, 4))
def _extract_layer_with_bias(params: Params, cfg: WavLMConfig, wav: jax.Array,
                             pos_bias: jax.Array | None, output_layer: int,
                             padding_mask: jax.Array | None = None) -> jax.Array:
    x = _encoder_prelude(params, cfg, wav, padding_mask)
    enc = params["encoder"]
    sliced = jax.tree.map(lambda a: a[:output_layer], enc["layers"])
    x, _ = _scan_layers(x, sliced, pos_bias, cfg, collect=False,
                        padding_mask=padding_mask)
    # early exit skips the final encoder LayerNorm (ref wavlm/WavLM.py:567)
    return x


def wavlm_extract_layer(params: Params, cfg: WavLMConfig, wav: jax.Array,
                        output_layer: int) -> jax.Array:
    """Features at encoder layer `output_layer` (1-based, matching the
    reference's extract_features(output_layer=L)). (B, T_samples) -> (B, T, C).

    TPU notes: only the first `output_layer` layers execute (stacked-param
    slice), unlike the reference pool builder which always runs all 24
    (ref ddsp_prematch_dataset.py:289) — 4x less encoder compute at L=6; the
    relative-position bias is computed once per sequence length and reused.
    """
    t = frame_count(cfg, wav.shape[-1])
    pos_bias = cached_position_bias(params, cfg, t)
    return _extract_layer_with_bias(params, cfg, wav, pos_bias, output_layer)


def frame_count(cfg: WavLMConfig, n_samples: int) -> int:
    """Output frames of the conv frontend for a given sample count."""
    t = n_samples
    for _, kernel, stride in cfg.conv_layers:
        t = (t - kernel) // stride + 1
    return t


# sample-length buckets for the production fast path: ~1/2/4/8/16/30 s,
# aligned to the pool-builder's hop+1 padding convention
ENCODE_BUCKETS_SAMPLES = tuple(s * 16000 + 320 for s in (1, 2, 4, 8, 16, 30))


def wavlm_extract_layer_bucketed(params: Params, cfg: WavLMConfig, wav: jax.Array,
                                 output_layer: int) -> jax.Array:
    """Production fast path: pad the waveform up to a fixed bucket length and
    mask the padded frames out of attention, so bulk conversion compiles one
    encoder per bucket instead of one per utterance length. Returns only the
    true frames.

    Numerics differ slightly from the exact path at the tail (the reference
    zero-pads unmasked to the next hop, so padded samples DO attend there —
    ref ddsp_prematch_dataset.py:284-289); use the exact path for parity."""
    B, n = wav.shape
    bucket = next((b for b in ENCODE_BUCKETS_SAMPLES if b >= n), None)
    if bucket is None:
        return wavlm_extract_layer(params, cfg, wav, output_layer)
    t_real = frame_count(cfg, n)
    t_bucket = frame_count(cfg, bucket)
    wav_p = jnp.pad(wav, ((0, 0), (0, bucket - n)))
    mask = (jnp.arange(t_bucket) >= t_real)[None].repeat(B, axis=0)
    pos_bias = cached_position_bias(params, cfg, t_bucket)
    out = _extract_layer_with_bias(params, cfg, wav_p, pos_bias, output_layer,
                                   padding_mask=mask)
    return out[:, :t_real]


@functools.partial(jax.jit, static_argnums=(1,))
def wavlm_extract_all_layers(params: Params, cfg: WavLMConfig, wav: jax.Array) -> jax.Array:
    """All layer outputs: (n_layers+1, B, T, C) — entry 0 is the transformer
    input (post pos-conv), entries 1..L the per-layer outputs. Matches the
    reference's layer_results ordering (ref wavlm/WavLM.py:589-601) so a
    one-hot weighting at index L selects layer L's output."""
    x = _encoder_prelude(params, cfg, wav)
    enc = params["encoder"]
    pos_bias = None
    if cfg.relative_position_embedding:
        pos_bias = compute_position_bias(enc["rel_attn_bias"], x.shape[1],
                                         cfg.num_buckets, cfg.max_distance)
    final, stacked_out = _scan_layers(x, enc["layers"], pos_bias, cfg, collect=True)
    return jnp.concatenate([x[None], stacked_out], axis=0)


def wavlm_encode(params: Params, cfg: WavLMConfig, wav: jax.Array,
                 output_layer: int | None = None) -> jax.Array:
    """Convenience dispatch (both callees are jitted)."""
    if output_layer is None:
        return wavlm_extract_all_layers(params, cfg, wav)
    return wavlm_extract_layer(params, cfg, wav, output_layer)


# ---------------------------------------------------------------- init


@functools.partial(jax.jit, static_argnames=("cfg",))
def init_wavlm_params(key: jax.Array, cfg: WavLMConfig) -> Params:
    """Random init with reference-matching shapes (for tests/benchmarks; real
    use converts a torch checkpoint via io/checkpoints.py).

    Jitted as ONE program: un-jitted, the ~50 RNG/zeros ops each pay a
    dispatch round trip AND a remote compile on tunneled TPU setups —
    measured 185 s of 'params init' per bench child vs ~45 s for the single
    program. (A single flat 316M-element RNG draw was tried and is WORSE
    there: the axon AOT compiler takes ~270 s on it.)"""
    keys = iter(jax.random.split(key, 256))
    D = cfg.encoder_embed_dim

    def lin(din, dout, bias=True, std=0.02):
        p = {"w": jax.random.normal(next(keys), (din, dout)) * std}
        if bias:
            p["b"] = jnp.zeros((dout,))
        return p

    def ln(dim):
        return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}

    fe_layers = []
    in_d = 1
    for i, (dim, kernel, stride) in enumerate(cfg.conv_layers):
        blk: Params = {"conv": {"w": jax.random.normal(next(keys), (dim, in_d, kernel)) * 0.05}}
        if cfg.conv_bias:
            blk["conv"]["b"] = jnp.zeros((dim,))
        if cfg.extractor_mode == "layer_norm" or (cfg.extractor_mode == "default" and i == 0):
            blk["norm"] = ln(dim)
        fe_layers.append(blk)
        in_d = dim

    n_layers = cfg.encoder_layers
    ffn = cfg.encoder_ffn_embed_dim
    head_dim = D // cfg.encoder_attention_heads

    def stacked_lin(din, dout, bias=True, std=0.02):
        p = {"w": jax.random.normal(next(keys), (n_layers, din, dout)) * std}
        if bias:
            p["b"] = jnp.zeros((n_layers, dout))
        return p

    def stacked_ln(dim):
        return {"scale": jnp.ones((n_layers, dim)), "bias": jnp.zeros((n_layers, dim))}

    layers = {
        "attn": {
            "q": stacked_lin(D, D),
            "k": stacked_lin(D, D),
            "v": stacked_lin(D, D),
            "out": stacked_lin(D, D),
        },
        "ln1": stacked_ln(D),
        "fc1": stacked_lin(D, ffn),
        "fc2": stacked_lin(ffn, D),
        "ln2": stacked_ln(D),
    }
    if cfg.gru_rel_pos:
        layers["attn"]["grep"] = stacked_lin(head_dim, 8)
        layers["attn"]["grep_a"] = jnp.ones((n_layers, cfg.encoder_attention_heads))

    params: Params = {
        "feature_extractor": {"layers": fe_layers},
        "layer_norm": ln(cfg.conv_layers[-1][0]),
        "encoder": {
            "pos_conv": {
                "w": jax.random.normal(next(keys), (D, D // cfg.conv_pos_groups, cfg.conv_pos)) * 0.01,
                "b": jnp.zeros((D,)),
            },
            "layer_norm": ln(D),
            "layers": layers,
        },
    }
    if cfg.conv_layers[-1][0] != D:
        params["post_extract_proj"] = lin(cfg.conv_layers[-1][0], D)
    if cfg.relative_position_embedding:
        params["encoder"]["rel_attn_bias"] = (
            jax.random.normal(next(keys), (cfg.num_buckets, cfg.encoder_attention_heads)) * 0.02
        )
    return params
