"""Incremental streaming WavLM encoder: KV-cache chunked attention.

No reference analogue — the reference encodes whole utterances only
(ref wavlm/WavLM.py:556-604). The framework's windowed streaming mode
(hub.stream_convert_chunks) re-encodes [chunk - context, chunk + lookahead]
from scratch every chunk, a (C+F+CR)/F compute amplification (~2x at the
defaults) on the stage that dominates the serving budget. This module
removes the left-context re-encode:

- **Conv frontend** is computed incrementally and EXACTLY: frame t depends
  only on samples [t*hop, t*hop + receptive_field), and WavLM-Large's
  'layer_norm' extractor mode normalizes per frame (ref wavlm/modules.py
  Fp32LayerNorm), so streaming frames bit-match the batch encode. (The
  Base-model 'default' mode group-norms over the whole utterance
  (ref modules.py:45-57); there the stats are computed over the step's
  frames — window-local, exactly like the windowed mode's stats are.)
- **Positional conv** (128-tap, ref WavLM.py:514-527) reads a cache of the
  last K/2 projected feature frames, so mid-stream chunks see REAL left
  context where the windowed mode saw the window's zero pad; the right edge
  is zero-padded beyond the lookahead, same as a window edge.
- **Transformer**: each step runs queries/FFN for the F new ("final")
  frames plus CR lookahead frames only; attention keys are the new frames
  plus a sliding cache of the last `cache_frames` finalized frames' per-
  layer K/V (Emformer-style chunked streaming attention). The cached K/V
  were computed when those frames were final — they differ from a full
  re-encode (which would see the newest frames as their right context);
  tests/test_streaming_encoder.py bounds that deviation against the
  windowed mode's own deviation from the full-utterance encode.

TPU-first: the whole step is ONE jitted program with static shapes — the
KV cache is a fixed-size ring (shift-concat, validity-masked while warming
up), the relative-position bias needs only LOCAL offsets (cache slot j is
always j-Tc frames behind the chunk start, so no global positions enter
the program), and per-step host<->device traffic is one (Tn*hop + RF-hop)-
sample upload. Compute per emitted frame drops from (C+F+CR)/F encoder
passes to (F+CR)/F, while the attention left context (cache_frames) can be
LONGER than the windowed C for nearly free — cache keys cost attention
FLOPs only, no conv/FFN.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from knnsvc_tpu.config import WavLMConfig
from knnsvc_tpu.models.wavlm.model import (
    _gate_values,
    conv_frontend,
    conv1d,
    frame_count,
    gelu,
    layer_norm,
    linear,
    relative_position_bucket,
)
from knnsvc_tpu.precision import get_precision

Params = dict[str, Any]


def conv_receptive_field(cfg: WavLMConfig) -> int:
    """Samples of input one output frame of the conv frontend depends on
    (WavLM-Large: 400 at hop 320)."""
    rf = 1
    for _, kernel, stride in reversed(cfg.conv_layers):
        rf = (rf - 1) * stride + kernel
    return rf


def step_sample_len(cfg: WavLMConfig, n_frames: int) -> int:
    """Sample count a step consuming `n_frames` new frames needs:
    (n_frames-1)*hop + receptive_field. The hub supplies hop*n_frames new
    samples plus (rf - hop) of lookahead beyond the last frame boundary."""
    n = (n_frames - 1) * cfg.total_stride + conv_receptive_field(cfg)
    assert frame_count(cfg, n) == n_frames, (n, n_frames)
    return n


class WavLMStreamState(NamedTuple):
    """Device-resident carry of the incremental encoder (a pytree)."""

    k_cache: jax.Array       # (L, H, Tc, head_dim) — per-layer key cache
    v_cache: jax.Array       # (L, H, Tc, head_dim)
    feat_cache: jax.Array    # (conv_pos//2, C) — projected feats for pos_conv
    valid: jax.Array         # () int32 — filled cache slots (last `valid`)


def init_stream_state(cfg: WavLMConfig, n_layers: int,
                      cache_frames: int) -> WavLMStreamState:
    """Fresh state for a stream (cache empty, fully masked)."""
    D = cfg.encoder_embed_dim
    H = cfg.encoder_attention_heads
    hd = D // H
    return WavLMStreamState(
        k_cache=jnp.zeros((n_layers, H, cache_frames, hd), jnp.float32),
        v_cache=jnp.zeros((n_layers, H, cache_frames, hd), jnp.float32),
        feat_cache=jnp.zeros((cfg.conv_pos // 2, D), jnp.float32),
        valid=jnp.zeros((), jnp.int32),
    )


def _stream_position_bias(table: jax.Array, t_cache: int, t_new: int,
                          num_buckets: int, max_distance: int) -> jax.Array:
    """(H, Tn, Tc+Tn) bias. Key slot j sits j - Tc frames from the chunk
    start (cache slots are strictly older), query i sits at +i — offsets are
    purely local, identical every step, so the bias is a compile-time-shaped
    constant-free computation (O(Tc+2Tn) bucket math + one gather)."""
    offsets = jnp.arange(-(t_cache + t_new - 1), t_new)        # j - Tc - i
    buckets = relative_position_bucket(offsets, num_buckets, max_distance)
    diag = table[buckets]                                      # (Tc+2Tn-1, H)
    i = jnp.arange(t_new)
    j = jnp.arange(t_cache + t_new)
    idx = (j[None, :] - t_cache - i[:, None]) + (t_cache + t_new - 1)
    return jnp.transpose(diag[idx], (2, 0, 1))                 # (H, Tn, Tc+Tn)


def _cached_attention(x: jax.Array, p: Params, pos_bias: jax.Array,
                      k_cache: jax.Array, v_cache: jax.Array,
                      key_invalid: jax.Array, num_heads: int):
    """Self-attention of Tn query frames over [cache || new] keys.
    x: (Tn, C); k_cache/v_cache: (H, Tc, hd); key_invalid: (Tc+Tn,) bool.
    Returns (out (Tn, C), k_new (H, Tn, hd), v_new (H, Tn, hd))."""
    Tn, C = x.shape
    hd = C // num_heads
    scaling = hd ** -0.5

    def heads(t):
        return t.reshape(Tn, num_heads, hd).transpose(1, 0, 2)  # (H, Tn, hd)

    q = heads(linear(x, p["q"])) * scaling
    k_new = heads(linear(x, p["k"]))
    v_new = heads(linear(x, p["v"]))
    k = jnp.concatenate([k_cache, k_new], axis=1)               # (H, Tc+Tn, hd)
    v = jnp.concatenate([v_cache, v_new], axis=1)
    logits = jnp.einsum("hqd,hkd->hqk", q, k,
                        preferred_element_type=jnp.float32,
                        precision=get_precision())
    if pos_bias is not None:
        gate = _gate_values(x[None], p, num_heads)[0, :, :, :]  # (H, Tn, 1)
        logits = logits + gate * pos_bias
    logits = jnp.where(key_invalid[None, None, :], -jnp.inf, logits)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("hqk,hkd->hqd", probs, v,
                     preferred_element_type=jnp.float32,
                     precision=get_precision())
    out = out.transpose(1, 0, 2).reshape(Tn, C)
    return linear(out, p["out"]), k_new, v_new


@functools.partial(jax.jit, static_argnums=(1, 4, 5))
def _stream_step(params: Params, cfg: WavLMConfig, samples: jax.Array,
                 state: WavLMStreamState, output_layer: int, n_final: int):
    """One incremental encode step.

    samples: (step_sample_len(cfg, Tn),) covering frames [t0, t0+Tn) — the
    first `n_final` frames are emitted as final (their K/V enter the cache);
    the rest are lookahead, re-presented as final frames of a later step.
    Returns (feats (Tn, C) at encoder layer `output_layer`, new state)."""
    enc = params["encoder"]
    Tc = state.k_cache.shape[2]
    H = cfg.encoder_attention_heads

    # conv frontend (exact: per-frame normalization in 'layer_norm' mode)
    feats = conv_frontend(samples[None], params["feature_extractor"], cfg)
    feats = jnp.swapaxes(feats, 1, 2)[0]                        # (Tn, C0)
    feats = layer_norm(feats, params["layer_norm"])
    if "post_extract_proj" in params:
        feats = linear(feats, params["post_extract_proj"])
    Tn = feats.shape[0]

    # positional conv over [cached left | new | zero right]: output i uses
    # input frames [i, i + conv_pos - 1] == frames [t0 - K/2 + i, t0 + i +
    # K/2 - 1] — the windowed mode's SamePad arithmetic with REAL left
    # context instead of the window's zero pad (ref wavlm/modules.py:72-83)
    K = cfg.conv_pos
    xin = jnp.concatenate(
        [state.feat_cache, feats, jnp.zeros((K - 1 - K // 2, feats.shape[1]))])
    pos = conv1d(jnp.swapaxes(xin, 0, 1)[None], enc["pos_conv"]["w"],
                 enc["pos_conv"]["b"], groups=cfg.conv_pos_groups)
    x = feats + gelu(jnp.swapaxes(pos[0], 0, 1))
    if not cfg.layer_norm_first:
        x = layer_norm(x, enc["layer_norm"])

    pos_bias = None
    if cfg.relative_position_embedding:
        pos_bias = _stream_position_bias(enc["rel_attn_bias"], Tc, Tn,
                                         cfg.num_buckets, cfg.max_distance)
    # cache slots fill from the back; slot j invalid while j < Tc - valid
    key_invalid = jnp.concatenate(
        [jnp.arange(Tc) < Tc - state.valid, jnp.zeros((Tn,), bool)])

    sliced = jax.tree.map(lambda a: a[:output_layer], enc["layers"])

    def body(carry, xs):
        layer_p, kc, vc = xs
        h = carry
        if cfg.layer_norm_first:
            a = layer_norm(h, layer_p["ln1"])
            attn, k_new, v_new = _cached_attention(
                a, layer_p["attn"], pos_bias, kc, vc, key_invalid, H)
            h = h + attn
            a = layer_norm(h, layer_p["ln2"])
            h = h + linear(gelu(linear(a, layer_p["fc1"])), layer_p["fc2"])
        else:
            attn, k_new, v_new = _cached_attention(
                h, layer_p["attn"], pos_bias, kc, vc, key_invalid, H)
            h = layer_norm(h + attn, layer_p["ln1"])
            h = h + linear(gelu(linear(h, layer_p["fc1"])), layer_p["fc2"])
            h = layer_norm(h, layer_p["ln2"])
        # only the final frames' K/V are cacheable (lookahead re-encodes)
        return h, (k_new[:, :n_final], v_new[:, :n_final])

    out, (k_fin, v_fin) = jax.lax.scan(
        body, x, (sliced, state.k_cache, state.v_cache))
    # early exit skips the final encoder LayerNorm (ref wavlm/WavLM.py:567),
    # matching wavlm_extract_layer

    new_state = WavLMStreamState(
        k_cache=jnp.concatenate([state.k_cache, k_fin], axis=2)[:, :, -Tc:],
        v_cache=jnp.concatenate([state.v_cache, v_fin], axis=2)[:, :, -Tc:],
        feat_cache=jnp.concatenate([state.feat_cache,
                                    feats[:n_final]])[-(K // 2):],
        valid=jnp.minimum(state.valid + n_final, Tc),
    )
    return out, new_state


class WavLMStreamEncoder:
    """Stateful convenience wrapper: feed fixed-size sample steps, get
    layer-L features back. Shapes are static -> one compiled program for
    the whole stream (first call compiles, the rest replay)."""

    def __init__(self, params: Params, cfg: WavLMConfig, output_layer: int,
                 chunk_frames: int, lookahead_frames: int = 0,
                 cache_frames: int = 200):
        if cache_frames < 1:
            raise ValueError("cache_frames must be >= 1")
        self.params, self.cfg = params, cfg
        self.output_layer = output_layer
        self.n_final = chunk_frames
        self.n_frames = chunk_frames + lookahead_frames
        self.sample_len = step_sample_len(cfg, self.n_frames)
        self.state = init_stream_state(cfg, output_layer, cache_frames)

    def step(self, samples) -> jax.Array:
        """samples: (sample_len,) — frames [t0, t0 + chunk+lookahead) where
        t0 advances by chunk_frames per call (the caller re-sends the
        lookahead region's samples next call). Returns (chunk+lookahead, C)
        features; the first chunk_frames rows are final."""
        samples = jnp.asarray(samples, jnp.float32)
        if samples.shape != (self.sample_len,):
            raise ValueError(f"step needs exactly {self.sample_len} samples "
                             f"(got {samples.shape}); zero-pad the tail")
        out, self.state = _stream_step(self.params, self.cfg, samples,
                                       self.state, self.output_layer,
                                       self.n_final)
        return out
