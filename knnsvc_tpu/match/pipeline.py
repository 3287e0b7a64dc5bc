"""Inference-time conversion pipeline.

Equivalent of the reference's `match_at_inference_time`
(ddsp_prematch_dataset.py:1074-1459): per (source utterance x target pool),
kNN-match WavLM frames, shift f0 into the target register, optionally
reselect with the concatenation cost and optimize smoothness weights, and
produce the vocoder inputs.

Faithful ordering quirks (deliberately replicated):
- the WavLM feature output uses the *unpitched* selection (top-4 of the raw
  kNN, optionally concat-reselected — ref :1246,1292-1295,1348-1364), while
  the harmonic amplitudes use the *f0-prioritized* selection (resorted from
  the ORIGINAL 32 candidates, optionally pitched-concat-reselected —
  ref :1375-1414,1430-1450);
- prioritize_f0 is effectively mandatory (assert at ref :1375);
- uniform mean weights (softmax of ones) when post_opt is disabled
  (ref :1360-1364).

Documented divergence: the reference ignores its `topk` argument and
hardcodes 4 (ref :1246,1398); here `topk` is honored (default 4 == reference
behavior).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from pathlib import Path
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from knnsvc_tpu.config import PostOpt, uses_harmonics
from knnsvc_tpu.match.concat_cost import knn_with_concat_cost, knn_with_concat_cost_pair
from knnsvc_tpu.match.f0_logic import shift_f0_to_target_register, sort_by_f0_compatibility
from knnsvc_tpu.match.knn import knn_topk
from knnsvc_tpu.match.quantized_pool import QuantizedPool, knn_topk_quantized, quantize_pool
from knnsvc_tpu.match.pool import SpeakerPool, build_speaker_pool
from knnsvc_tpu.match.smoothness import (
    HARMONICS_LOSS_SCALE,
    WAVLM_LOSS_SCALE,
    optimize_smoothness_weights,
)

KNN_CANDIDATES = 32  # ref :1203


@functools.partial(jax.jit, static_argnames=("topk", "approx", "use_harmonics"))
def _match_core(q, matching, synth, pool_f0, harmonics, qf0, qmed,
                topk: int, approx: bool, use_harmonics: bool):
    """The whole no_post_opt match as ONE compiled program: kNN + register
    shift + f0-priority re-rank + top-k mean gathers. A single dispatch —
    the eager per-op path pays a tunnel round-trip per jnp call on remote
    TPU setups, which costs more than the compute."""
    nearest_nbrs, _ = knn_topk(q, matching, k=KNN_CANDIDATES, approx=approx)
    shifted = shift_f0_to_target_register(qf0, pool_f0, qmed)
    out = jnp.mean(synth[nearest_nbrs[:, :topk]], axis=1)
    harm = None
    if use_harmonics:
        pitched = sort_by_f0_compatibility(shifted, pool_f0, nearest_nbrs)[:, :topk]
        harm = jnp.mean(harmonics[pitched], axis=1)
    return out, shifted, harm

@functools.partial(jax.jit, static_argnames=("topk", "approx", "use_harmonics",
                                             "concat_weight", "opt_enabled",
                                             "use_pallas_concat"))
def _match_core_post_opt(q, matching, synth, pool_f0, harmonics, qf0, qmed,
                         topk: int, approx: bool, use_harmonics: bool,
                         concat_weight: float, opt_enabled: bool,
                         use_pallas_concat: bool = False):
    """The whole post_opt match as ONE compiled program: kNN + register shift
    + f0-priority re-rank + both concat-cost reselections (lane-stacked into
    a single scan — they are independent) + both smoothness optimizations +
    the weighted gathers. Same selection semantics as the step-by-step path
    in match_utterance (tested equal); one dispatch instead of ~8."""
    nearest_nbrs, _ = knn_topk(q, matching, k=KNN_CANDIDATES, approx=approx)
    shifted = shift_f0_to_target_register(qf0, pool_f0, qmed)

    target_idx = nearest_nbrs[:, :topk]
    pitched_idx = None
    if use_harmonics:
        pitched_idx = sort_by_f0_compatibility(shifted, pool_f0, nearest_nbrs)[:, :topk]

    if concat_weight != -1.0:
        if use_harmonics:
            from knnsvc_tpu.ops.concat_scan import (
                concat_cost_pair_pallas, pallas_concat_pair_ok)

            T, D = q.shape
            P = matching.shape[0]
            if use_pallas_concat and pallas_concat_pair_ok(T, P, D, topk):
                # opt-in experiment: measured at parity with the scan
                # (selection-identical; see ops/concat_scan.py docstring)
                target_idx, pitched_idx = concat_cost_pair_pallas(
                    target_idx, pitched_idx, q, matching, shifted, pool_f0,
                    concat_weight=concat_weight)
            else:
                target_idx, pitched_idx = knn_with_concat_cost_pair(
                    target_idx, pitched_idx, q, matching, shifted, pool_f0,
                    concat_weight=concat_weight)
        else:
            target_idx = knn_with_concat_cost(
                target_idx, q, matching, concat_weight=concat_weight)

    if opt_enabled:
        w = optimize_smoothness_weights(target_idx, synth, scale=WAVLM_LOSS_SCALE)
        out = jnp.sum(synth[target_idx] * w[..., None], axis=1)
    else:
        out = jnp.mean(synth[target_idx], axis=1)

    harm = None
    if use_harmonics:
        if opt_enabled:
            hw = optimize_smoothness_weights(pitched_idx, harmonics,
                                             scale=HARMONICS_LOSS_SCALE)
            harm = jnp.sum(harmonics[pitched_idx] * hw[..., None], axis=1)
        else:
            harm = jnp.mean(harmonics[pitched_idx], axis=1)
    return out, shifted, harm


@functools.partial(jax.jit, static_argnames=("topk", "approx", "use_harmonics",
                                             "concat_weight", "opt_enabled",
                                             "scan_from", "has_carry"))
def _match_core_post_opt_stream(q, matching, synth, pool_f0, harmonics, qf0,
                                qmed, carry_idx, carry_weight,
                                topk: int, approx: bool, use_harmonics: bool,
                                concat_weight: float, opt_enabled: bool,
                                scan_from: int, has_carry: bool):
    """The post_opt match for ONE streaming window, continuing the concat
    scan from an explicit cross-chunk carry (VERDICT r3 #2).

    kNN + register shift run over ALL window frames (the vocode margins need
    shifted f0); the concat-cost scan runs over frames [scan_from, T) only —
    the frames this chunk is responsible for — with its initial state either
    the carried (previous chunk's last emitted selection, sticky concat
    weight) when has_carry, or the reference's standard first-frame init
    (chunk 0). Chaining chunks this way reproduces the reference's whole-
    utterance serial pass (ref lib_ongaku_test.py:294-336): chunk N+1's
    first frame sees chunk N's selection and the sticky `concat_weight = 0`
    latch never resets at a boundary. Smoothness weights are re-solved per
    window slice (the right context absorbs the optimizer's right-edge
    effect; the left edge is the streaming approximation, bound-tested).

    Returns (out (Ts, D), shifted (T,), harm (Ts, H) | None,
    sel (Ts, 2, k) | (Ts, 1, k), weight_after (Ts,)) where Ts = T -
    scan_from; the caller picks its carry at the last emitted frame."""
    from knnsvc_tpu.match.concat_cost import (
        concat_cost_pair_core, concat_cost_pair_stream_core,
        concat_cost_stream_core)

    nearest_nbrs, _ = knn_topk(q, matching, k=KNN_CANDIDATES, approx=approx)
    shifted = shift_f0_to_target_register(qf0, pool_f0, qmed)

    s = scan_from
    target_idx = nearest_nbrs[:, :topk]
    pitched_idx = None
    if use_harmonics:
        pitched_idx = sort_by_f0_compatibility(shifted, pool_f0, nearest_nbrs)[:, :topk]

    gather = lambda idx: matching[idx]
    P = matching.shape[0]
    tgt_log_f0 = jnp.log2(pool_f0 + 1e-5)
    k = topk

    if concat_weight == -1.0:
        # no concat reselection: selections are frame-local, nothing carries
        sel_u = target_idx[s:]
        sel_p = None if pitched_idx is None else pitched_idx[s:]
        weights_after = jnp.full((q.shape[0] - s,), -1.0, jnp.float32)
    elif use_harmonics:
        if has_carry:
            sel_u, sel_p, weights_after = concat_cost_pair_stream_core(
                gather, target_idx[s:], pitched_idx[s:], q[s - 1], q[s:], P,
                shifted[s:], tgt_log_f0, carry_idx, carry_weight,
                concat_weight=concat_weight)
        else:
            # chunk 0: standard init — frame s passes through as its own
            # top-k; later frames scan with the stream body (identical to
            # concat_cost_pair_core, which shares the same body)
            first = jnp.stack([target_idx[s], pitched_idx[s]])        # (2, k)
            tail_u, tail_p, tail_w = concat_cost_pair_stream_core(
                gather, target_idx[s + 1:], pitched_idx[s + 1:], q[s],
                q[s + 1:], P, shifted[s + 1:], tgt_log_f0, first,
                jnp.float32(concat_weight), concat_weight=concat_weight)
            sel_u = jnp.concatenate([first[None, 0], tail_u])
            sel_p = jnp.concatenate([first[None, 1], tail_p])
            weights_after = jnp.concatenate(
                [jnp.full((1,), concat_weight, jnp.float32), tail_w])
    else:
        if has_carry:
            sel_u, weights_after = concat_cost_stream_core(
                gather, target_idx[s:], q[s - 1], q[s:], P, carry_idx[0],
                carry_weight, concat_weight=concat_weight)
        else:
            first = target_idx[s]
            tail_u, tail_w = concat_cost_stream_core(
                gather, target_idx[s + 1:], q[s], q[s + 1:], P, first,
                jnp.float32(concat_weight), concat_weight=concat_weight)
            sel_u = jnp.concatenate([first[None], tail_u])
            weights_after = jnp.concatenate(
                [jnp.full((1,), concat_weight, jnp.float32), tail_w])
        sel_p = None

    if opt_enabled:
        w = optimize_smoothness_weights(sel_u, synth, scale=WAVLM_LOSS_SCALE)
        out = jnp.sum(synth[sel_u] * w[..., None], axis=1)
    else:
        out = jnp.mean(synth[sel_u], axis=1)

    harm = None
    if use_harmonics:
        if opt_enabled:
            hw = optimize_smoothness_weights(sel_p, harmonics,
                                             scale=HARMONICS_LOSS_SCALE)
            harm = jnp.sum(harmonics[sel_p] * hw[..., None], axis=1)
        else:
            harm = jnp.mean(harmonics[sel_p], axis=1)

    sel = (jnp.stack([sel_u, sel_p], axis=1) if sel_p is not None
           else sel_u[:, None, :])                                # (Ts, L, k)
    return out, shifted, harm, sel, weights_after


def match_utterance_stream(
    query_seq,
    query_f0,
    matching_list,
    synth_list,
    matching_f0,
    harmonics_list,
    ckpt_type: str,
    post_opt: PostOpt,
    scan_from: int,
    carry: tuple | None,
    topk: int = 4,
    matcher: str = "approx",
    query_f0_log_median: float | None = None,
):
    """One streaming window of the post_opt pipeline with cross-chunk concat
    continuity. `carry` is (sel (L, k) int32, weight scalar) from the
    previous chunk's last emitted frame (None for the first chunk);
    `scan_from` is the window-local index of the first frame this chunk owns.

    Returns (out (Ts, D), shifted (T,), harm (Ts, H) | None, new_carry_fn)
    where new_carry_fn(emit_end) gives the carry at window-local frame
    emit_end - 1 for the next chunk. All outputs stay on device."""
    use_harm = uses_harmonics(ckpt_type)
    q = jnp.asarray(query_seq)
    qmed = jnp.float32(np.nan if query_f0_log_median is None
                       else query_f0_log_median)
    n_lanes = 2 if use_harm else 1
    if carry is None:
        carry_idx = jnp.zeros((2, topk), jnp.int32)   # ignored (has_carry=False)
        carry_weight = jnp.float32(0.0)
    else:
        carry_idx, carry_weight = carry
        if use_harm:
            assert carry_idx.shape == (2, topk), carry_idx.shape
        else:
            carry_idx = carry_idx.reshape(n_lanes, topk)
    out, shifted, harm, sel, weights_after = _match_core_post_opt_stream(
        q, matching_list, synth_list, matching_f0,
        harmonics_list if use_harm else synth_list[:, :1],
        jnp.asarray(query_f0), qmed, carry_idx, carry_weight,
        topk=topk, approx=(matcher == "approx"), use_harmonics=use_harm,
        concat_weight=post_opt.concat_weight, opt_enabled=post_opt.enabled,
        scan_from=scan_from, has_carry=carry is not None)

    def carry_at(emit_end: int):
        """Carry for the next chunk = state after window-local frame
        emit_end - 1 (the last frame this chunk emitted)."""
        pos = emit_end - 1 - scan_from
        return sel[pos], weights_after[pos]

    return out, shifted, (harm if use_harm else None), carry_at


def _prepare_ref_pool(ref_pool: SpeakerPool, need_fp32_matching: bool,
                      need_harmonics: bool, need_quantized: bool,
                      mesh=None, quantize_sharded: bool = False) -> dict:
    # Device-side preparation memo, stored ON the pool object: the
    # SpeakerPool concat properties re-run np.concatenate on every access and
    # quantize_pool is an O(P*D) host pass + transfer; bulk conversion shares
    # one target pool across every source speaker, so prepare once. Living on
    # the pool means the prep's lifetime (and HBM) tracks the caller's own
    # pool cache exactly — when hub.bulk_convert evicts a host pool, its
    # device arrays are freed with it (no second, differently-sized cache).
    prep = ref_pool.__dict__.setdefault("_device_prep", {})
    if "host_matching" not in prep:
        prep["host_matching"] = ref_pool.matching
    if mesh is not None:
        # sharded serving: matching/synth/harmonics live at ~P/n_shards rows
        # per device; NO dense replicated copy of any pool array is created
        # (that replication was exactly what erased the HBM scaling).
        # quantize_sharded additionally stores the matching rows int8
        # (P/(4*n_shards) bytes per device; serving configs only)
        key = "sharded_int8" if quantize_sharded else "sharded"
        if prep.get(f"{key}_mesh") is not mesh:
            from knnsvc_tpu.parallel.sharded_match import shard_speaker_pool

            prep[f"{key}_mesh"] = mesh
            prep[key] = shard_speaker_pool(
                prep["host_matching"], ref_pool.synth, ref_pool.f0,
                ref_pool.harmonics if need_harmonics else None, mesh,
                quantize_matching=quantize_sharded)
        return prep
    if "synth" not in prep:
        prep["synth"] = jnp.asarray(ref_pool.synth)
        prep["f0"] = jnp.asarray(ref_pool.f0)
    if need_fp32_matching and "matching" not in prep:
        prep["matching"] = jnp.asarray(prep["host_matching"])
    if need_harmonics and "harmonics" not in prep:
        prep["harmonics"] = jnp.asarray(ref_pool.harmonics)
    if need_quantized and "quantized" not in prep:
        prep["quantized"] = quantize_pool(prep["host_matching"])
    return prep


@functools.partial(jax.jit, static_argnames=("topk", "approx", "use_harmonics",
                                             "concat_weight", "opt_enabled"))
def _match_core_batch(qs, qf0s, matching, synth, pool_f0, harmonics,
                      topk: int, approx: bool, use_harmonics: bool,
                      concat_weight: float, opt_enabled: bool):
    """The fused match vmapped over a batch of equal-length queries against
    ONE shared target pool: (B, Tb, D) -> (B, Tb, D) in a single dispatch.
    The per-frame scans/loops (concat cost, smoothness) are serial in T but
    independent across utterances — batching B utterances into the same
    dispatch is where bulk throughput comes from (and, with the batch axis
    sharded over the mesh 'data' axis, where multi-chip serving scales)."""
    nan_med = jnp.float32(jnp.nan)  # per-utterance register shift (ref)
    if not opt_enabled and concat_weight == -1.0:
        def one(q, qf0):
            return _match_core(q, matching, synth, pool_f0, harmonics, qf0,
                               nan_med, topk=topk, approx=approx,
                               use_harmonics=use_harmonics)
    else:
        def one(q, qf0):
            return _match_core_post_opt(q, matching, synth, pool_f0,
                                        harmonics, qf0, nan_med, topk=topk,
                                        approx=approx,
                                        use_harmonics=use_harmonics,
                                        concat_weight=concat_weight,
                                        opt_enabled=opt_enabled)
    return jax.vmap(one)(qs, qf0s)


def match_utterances_batched(qs, qf0s, matching, synth, pool_f0, harmonics,
                             ckpt_type: str, post_opt: PostOpt, topk: int = 4,
                             matcher: str = "approx", mesh=None,
                             sharded=None):
    """Batch of equal-length queries (B, Tb, D) + (B, Tb) f0 against one
    prepared target pool -> (out (B, Tb, D), shifted_f0 (B, Tb),
    harmonics (B, Tb, 49) | None), all still on device.

    mesh (dense matchers): when given (with a 'data' axis), the batch axis
    is sharded across it — B/n_data utterances per chip, pool replicated; an
    n-chip mesh converts ~n x the utterances per dispatch. The reference
    converts strictly one utterance at a time on one GPU (ref
    ddsp_matcher.py:1106); this is the framework's data-axis serving fan-out
    (no ref analogue).

    matcher='sharded'/'sharded_int8' (pass `sharded`, a ShardedPool built on
    a 2-D Mesh('data','pool')): the two scaling axes composed — the batch
    sharded over 'data' AND the pool over 'pool', B/n_data utterances and
    P/n_pool (or P/(4*n_pool) int8) pool rows per device in one dispatch."""
    use_harm = uses_harmonics(ckpt_type)
    qs = jnp.asarray(qs)
    qf0s = jnp.asarray(qf0s)
    if matcher in ("sharded", "sharded_int8"):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from knnsvc_tpu.parallel.sharded_match import (
            sharded_match_core_batch, sharded_match_core_int8_batch)

        assert sharded is not None, f"matcher={matcher!r} needs a ShardedPool"
        smesh = sharded.mesh
        assert "data" in smesh.shape, (
            "batched sharded serving needs a 2-D Mesh('data','pool'); use "
            "parallel.mesh.make_mesh(n_data, n_pool)")
        if qs.shape[0] % smesh.shape["data"] != 0:
            raise ValueError(f"mesh 'data' axis ({smesh.shape['data']}) must "
                             f"divide the batch ({qs.shape[0]})")
        qs = jax.device_put(qs, NamedSharding(smesh, P("data", None, None)))
        qf0s = jax.device_put(qf0s, NamedSharding(smesh, P("data", None)))
        if sharded.matching_q8 is not None:
            assert not post_opt.enabled and post_opt.concat_weight == -1.0, (
                "sharded_int8 serves no_post_opt configs only")
            out, shifted, harm = sharded_match_core_int8_batch(
                qs, qf0s, sharded.matching_q8, sharded.inv_norms,
                sharded.synth,
                sharded.harmonics if use_harm else sharded.synth,
                sharded.f0, sharded.true_len, mesh=smesh, topk=topk,
                use_harmonics=use_harm)
        else:
            out, shifted, harm = sharded_match_core_batch(
                qs, qf0s, sharded.matching, sharded.synth,
                sharded.harmonics if use_harm else sharded.synth,
                sharded.f0, sharded.true_len, mesh=smesh, topk=topk,
                use_harmonics=use_harm,
                concat_weight=post_opt.concat_weight,
                opt_enabled=post_opt.enabled)
        return out, shifted, (harm if use_harm else None)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert qs.shape[0] % mesh.shape["data"] == 0, (
            f"mesh 'data' axis ({mesh.shape['data']}) must divide the "
            f"batch ({qs.shape[0]})")
        qs = jax.device_put(qs, NamedSharding(mesh, P("data", None, None)))
        qf0s = jax.device_put(qf0s, NamedSharding(mesh, P("data", None)))
    out, shifted, harm = _match_core_batch(
        qs, qf0s, matching, synth, pool_f0,
        harmonics if use_harm else synth[:, :1],
        topk=topk, approx=(matcher == "approx"), use_harmonics=use_harm,
        concat_weight=post_opt.concat_weight, opt_enabled=post_opt.enabled,
    )
    return out, shifted, (harm if use_harm else None)


@dataclasses.dataclass
class ConversionFeatures:
    """Vocoder inputs for one source utterance."""

    out_feats_weighted: np.ndarray          # (T, 1024)
    shifted_query_f0: np.ndarray            # (T,)
    harmonics_out_feats_weighted: np.ndarray | None = None  # (T, 49), mix only


@functools.lru_cache(maxsize=1)
def _default_pool_mesh():
    """One shared all-devices pool mesh. _prepare_ref_pool caches shardings
    by mesh identity; a fresh mesh per call would re-shard (re-upload) the
    whole target pool on every conversion."""
    import jax

    from knnsvc_tpu.parallel.mesh import make_mesh

    return make_mesh(n_data=1, n_pool=len(jax.devices()))


def subset_key(src_path: str, ref_path: str) -> str:
    """Membership key for required_subset filtering (ref :1181)."""
    return os.path.basename(src_path).split(".")[0] + "/" + os.path.basename(ref_path)


def match_utterance(
    query_seq: np.ndarray,
    query_f0: np.ndarray,
    matching_list: jnp.ndarray,
    synth_list: jnp.ndarray,
    matching_f0: jnp.ndarray,
    harmonics_list: jnp.ndarray | None,
    ckpt_type: str,
    post_opt: PostOpt,
    topk: int = 4,
    prioritize_f0: bool = True,
    matcher: str = "exact",
    quantized: QuantizedPool | None = None,
    sharded=None,
    as_numpy: bool = True,
    query_f0_log_median: float | None = None,
) -> ConversionFeatures:
    """Convert one utterance against a prepared (concatenated) target pool.

    matcher: 'exact' (reference-parity top-k), 'approx' (TPU aggregated
    top-k, ~4x faster at hours-scale pools), 'int8' (quantized pool matmul,
    ~8x, pass `quantized`), 'sharded' (the WHOLE match fused over a Mesh
    'pool' axis with the pool arrays sharded at P/n_shards rows per device —
    pass `sharded` (a ShardedPool); the distributed generalization of the
    reference's chunk loops, ref ddsp_prematch_dataset.py:1195-1210).
    Everything downstream of the candidate search (concat cost, weights,
    gathers) stays fp32.

    as_numpy=False keeps the outputs on the device (the zero-copy serving
    path: results feed the vocoder without a round trip to the host).

    query_f0_log_median: optional register anchor — overrides the query-side
    median in the f0 register shift (see shift_f0_to_target_register). Used
    by streaming conversion, where per-chunk medians would make each chunk
    jump registers independently; None = reference semantics."""
    assert prioritize_f0, "prioritize_f0 is mandatory on the reference live path (ref :1375)"

    q = jnp.asarray(query_seq)
    qmed = jnp.float32(np.nan if query_f0_log_median is None
                       else query_f0_log_median)

    if matcher in ("sharded", "sharded_int8"):
        # fused one-dispatch sharded path: kNN + shift + rerank + concat +
        # smoothness + gathers inside one jitted shard_map; post_opt composes
        # without replicating any pool array. sharded_int8 runs the candidate
        # search on int8 matching rows (P/(4*n_shards) bytes per device) —
        # serving configs only (no concat/post_opt: they read fp32 rows)
        from knnsvc_tpu.parallel.sharded_match import (
            sharded_match_core, sharded_match_core_int8)

        assert sharded is not None, f"matcher={matcher!r} needs a ShardedPool"
        use_harm = uses_harmonics(ckpt_type)
        if sharded.matching_q8 is not None:
            assert not post_opt.enabled and post_opt.concat_weight == -1.0, (
                "sharded_int8 serves no_post_opt configs only (concat/"
                "smoothness read fp32 matching rows; use matcher='sharded')")
            out, shifted, harm = sharded_match_core_int8(
                q, jnp.asarray(query_f0), sharded.matching_q8,
                sharded.inv_norms, sharded.synth,
                sharded.harmonics if use_harm else sharded.synth, sharded.f0,
                sharded.true_len, qmed, mesh=sharded.mesh, topk=topk,
                use_harmonics=use_harm)
        else:
            out, shifted, harm = sharded_match_core(
                q, jnp.asarray(query_f0), sharded.matching, sharded.synth,
                sharded.harmonics if use_harm else sharded.synth, sharded.f0,
                sharded.true_len, qmed, mesh=sharded.mesh, topk=topk,
                use_harmonics=use_harm, concat_weight=post_opt.concat_weight,
                opt_enabled=post_opt.enabled)
        if not as_numpy:
            return ConversionFeatures(out, shifted, harm)
        return ConversionFeatures(
            np.asarray(out, dtype=np.float32),
            np.asarray(shifted, dtype=np.float32),
            None if harm is None else np.asarray(harm, dtype=np.float32))

    # fused fast path: the whole match — no_post_opt AND post_opt — is one
    # compiled dispatch for the exact/approx matchers
    if matcher in ("exact", "approx") and matching_list is not None:
        use_harm = uses_harmonics(ckpt_type)
        if not post_opt.enabled and post_opt.concat_weight == -1.0:
            out, shifted, harm = _match_core(
                q, matching_list, synth_list, matching_f0,
                harmonics_list if use_harm else synth_list[:, :1],
                jnp.asarray(query_f0), qmed, topk=topk,
                approx=(matcher == "approx"), use_harmonics=use_harm)
        else:
            out, shifted, harm = _match_core_post_opt(
                q, matching_list, synth_list, matching_f0,
                harmonics_list if use_harm else synth_list[:, :1],
                jnp.asarray(query_f0), qmed, topk=topk,
                approx=(matcher == "approx"),
                use_harmonics=use_harm, concat_weight=post_opt.concat_weight,
                opt_enabled=post_opt.enabled,
                # read OUTSIDE the jit so toggling the env var retraces
                use_pallas_concat=os.environ.get("KNNSVC_PALLAS_CONCAT") == "1")
        if not as_numpy:
            return ConversionFeatures(out, shifted, harm)
        return ConversionFeatures(
            np.asarray(out, dtype=np.float32),
            np.asarray(shifted, dtype=np.float32),
            None if harm is None else np.asarray(harm, dtype=np.float32))
    if matcher == "int8":
        assert quantized is not None
        nearest_nbrs, _ = knn_topk_quantized(q, quantized, k=KNN_CANDIDATES)
    else:
        assert matching_list is not None
        nearest_nbrs, _ = knn_topk(q, matching_list, k=KNN_CANDIDATES,
                                   approx=(matcher == "approx"))
    if post_opt.concat_weight != -1.0:
        assert matching_list is not None, "concat cost needs the fp32 pool"

    qf0 = jnp.asarray(query_f0)
    shifted_f0 = shift_f0_to_target_register(qf0, matching_f0, qmed)

    target_idx = nearest_nbrs[:, :topk]
    if post_opt.concat_weight != -1.0:
        target_idx = knn_with_concat_cost(
            target_idx, q, matching_list, concat_weight=post_opt.concat_weight
        )

    if post_opt.enabled:
        weights = optimize_smoothness_weights(target_idx, synth_list, scale=WAVLM_LOSS_SCALE)
    else:
        weights = jnp.full(target_idx.shape, 1.0 / target_idx.shape[1])
    out_feats = synth_list[target_idx]                               # (T, k, D)
    out_feats_weighted = jnp.sum(out_feats * weights[..., None], axis=1)

    harmonics_weighted = None
    if uses_harmonics(ckpt_type):
        assert harmonics_list is not None
        pitched_idx = sort_by_f0_compatibility(shifted_f0, matching_f0, nearest_nbrs)[:, :topk]
        if post_opt.concat_weight != -1.0:
            pitched_idx = knn_with_concat_cost(
                pitched_idx, q, matching_list, shifted_f0, matching_f0,
                concat_weight=post_opt.concat_weight,
            )
        harm_feats = harmonics_list[pitched_idx]                     # (T, k, 49)
        if post_opt.enabled:
            h_weights = optimize_smoothness_weights(
                pitched_idx, harmonics_list, scale=HARMONICS_LOSS_SCALE
            )
            harmonics_weighted = jnp.sum(harm_feats * h_weights[..., None], axis=1)
        else:
            harmonics_weighted = jnp.mean(harm_feats, axis=1)

    if not as_numpy:
        return ConversionFeatures(out_feats_weighted, shifted_f0, harmonics_weighted)
    return ConversionFeatures(
        out_feats_weighted=np.asarray(out_feats_weighted, dtype=np.float32),
        shifted_query_f0=np.asarray(shifted_f0, dtype=np.float32),
        harmonics_out_feats_weighted=(
            None if harmonics_weighted is None else np.asarray(harmonics_weighted, dtype=np.float32)
        ),
    )


def match_at_inference_time(
    src_path: str | Path,
    ref_path: str | Path,
    wavlm_params,
    wavlm_cfg,
    match_weights: np.ndarray,
    synth_weights: np.ndarray,
    topk: int = 4,
    prioritize_f0: bool = True,
    ckpt_type: str = "wavlm_only",
    required_subset: Iterable[str] | None = None,
    post_opt: str = "no_post_opt",
    duration_limit: float | None = None,
    query_pool: SpeakerPool | None = None,
    ref_pool: SpeakerPool | None = None,
    matcher: str = "exact",
    mesh=None,
) -> dict[str, ConversionFeatures]:
    """Full source x target conversion. Returns {src utterance path:
    ConversionFeatures}. Pools may be passed in to reuse across pairs (fixes
    the reference's force-disabled cache, ref :1086-1087)."""
    popt = PostOpt.parse(post_opt)
    required = set(required_subset) if required_subset is not None else None

    if query_pool is None:
        query_pool = build_speaker_pool(
            src_path, wavlm_params, wavlm_cfg, match_weights, synth_weights
        )
    if ref_pool is None:
        ref_pool = build_speaker_pool(
            ref_path, wavlm_params, wavlm_cfg, match_weights, synth_weights,
            duration_limit=duration_limit,
        )

    if matcher in ("sharded", "sharded_int8") and mesh is None:
        mesh = _default_pool_mesh()
    if matcher == "sharded_int8":
        assert not popt.enabled and popt.concat_weight == -1.0, (
            "matcher='sharded_int8' serves no_post_opt configs only")

    # the fp32 matching pool only goes to the device (replicated) when
    # something reads it. The sharded matchers NEVER replicate it — the fp32
    # one's concat cost gathers candidate rows across shards, the int8 one
    # never touches fp32 matching at all; dense int8 still needs the dense
    # pool for the concat cost's row reads
    need_fp32_matching = (matcher not in ("int8", "sharded", "sharded_int8")
                          or (matcher == "int8" and popt.concat_weight != -1.0))
    prep = _prepare_ref_pool(
        ref_pool, need_fp32_matching, uses_harmonics(ckpt_type),
        matcher == "int8",
        mesh=mesh if matcher in ("sharded", "sharded_int8") else None,
        quantize_sharded=matcher == "sharded_int8")
    matching_list = prep.get("matching")
    synth_list = prep.get("synth")
    matching_f0 = prep.get("f0")
    harmonics_list = prep.get("harmonics")
    quantized = prep.get("quantized")

    results: dict[str, ConversionFeatures] = {}
    for item, pools in query_pool.utterances.items():
        if required is not None and subset_key(item, str(ref_path)) not in required:
            continue
        results[item] = match_utterance(
            pools.matching, pools.f0, matching_list, synth_list, matching_f0,
            harmonics_list, ckpt_type, popt, topk=topk, prioritize_f0=prioritize_f0,
            matcher=matcher, quantized=quantized,
            sharded=prep.get("sharded_int8" if matcher == "sharded_int8"
                             else "sharded"),
        )
    return results
