"""Parity tests for the kNN converter stack vs the reference's torch
implementations (lib_ongaku_test.py, ddsp_prematch_dataset.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from knnsvc_tpu.match import (
    cosine_distance,
    knn_topk,
    torch_median,
    shift_f0_to_target_register,
    sort_by_f0_compatibility,
    knn_with_concat_cost,
)
from knnsvc_tpu.match.distance import weighted_cosine_distance
from knnsvc_tpu.match.smoothness import optimize_smoothness_weights, WAVLM_LOSS_SCALE


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


def test_cosine_distance_vs_reference(reference, torch):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((37, 64)).astype(np.float32)
    p = rng.standard_normal((211, 64)).astype(np.float32)
    ours = np.asarray(cosine_distance(jnp.asarray(q), jnp.asarray(p)))
    ref = reference.lib_ongaku.fast_cosine_dist(torch.tensor(q), torch.tensor(p)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_weighted_cosine_distance_vs_reference(reference, torch):
    import importlib

    matcher = importlib.import_module("ddsp_matcher")
    rng = np.random.default_rng(1)
    q = rng.standard_normal((23, 32)).astype(np.float32)
    p = rng.standard_normal((57, 32)).astype(np.float32)
    w = (rng.random((23, 32)) + 0.5).astype(np.float32)
    ours = np.asarray(weighted_cosine_distance(jnp.asarray(q), jnp.asarray(p), jnp.asarray(w)))
    ref = matcher.fast_weighted_cosine_dist(torch.tensor(q), torch.tensor(p), torch.tensor(w)).numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_knn_topk_vs_reference(reference, torch):
    """Indices must match the reference's chunked cosine-dist + topk(32)
    (ddsp_prematch_dataset.py:1195-1210)."""
    rng = np.random.default_rng(2)
    q = rng.standard_normal((85, 48)).astype(np.float32)
    p = rng.standard_normal((500, 48)).astype(np.float32)

    idx, vals = knn_topk(jnp.asarray(q), jnp.asarray(p), k=32)

    dists = reference.lib_ongaku.fast_cosine_dist(torch.tensor(q), torch.tensor(p))
    ref = dists.topk(k=32, dim=-1, largest=False)
    np.testing.assert_array_equal(np.asarray(idx), ref.indices.numpy())
    np.testing.assert_allclose(np.asarray(vals), ref.values.numpy(), atol=2e-5)


def test_torch_median_semantics(torch):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((5, 4)).astype(np.float32)  # even count: lower middle
    ours = np.asarray(torch_median(jnp.asarray(x), axis=0))
    ref = torch.median(torch.tensor(x), dim=0).values.numpy()
    np.testing.assert_allclose(ours, ref)


def test_f0_shift_vs_reference(torch):
    """ref ddsp_prematch_dataset.py:1224-1233 inline logic."""
    rng = np.random.default_rng(4)
    q = np.zeros(101, dtype=np.float32)
    q[10:60] = 150 + 50 * rng.random(50)
    m = np.zeros(301, dtype=np.float32)
    m[50:200] = 220 + 80 * rng.random(150)

    ours = np.asarray(shift_f0_to_target_register(jnp.asarray(q), jnp.asarray(m)))

    qt, mt = torch.tensor(q), torch.tensor(m)
    q_med = torch.median(torch.log(qt[qt != 0]))
    m_med = torch.median(torch.log(mt[mt != 0]))
    ref = qt.clone()
    ref[qt != 0] = torch.exp(torch.log(qt[qt != 0]) + m_med - q_med)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5)
    assert ours[0] == 0.0  # unvoiced stays zero


def test_sort_by_f0_compatibility_vs_reference(reference, torch):
    rng = np.random.default_rng(5)
    T, k, P = 50, 8, 400
    expected = np.zeros(T, dtype=np.float32)
    expected[5:40] = 100 + 300 * rng.random(35)
    f0_list = np.zeros(P, dtype=np.float32)
    f0_list[::2] = 80 + 400 * rng.random(P // 2)
    idx = rng.integers(0, P, size=(T, k)).astype(np.int64)

    ours = np.asarray(sort_by_f0_compatibility(
        jnp.asarray(expected), jnp.asarray(f0_list), jnp.asarray(idx.astype(np.int32))))
    ref = reference.prematch.sort_by_f0_compatibility(
        torch.tensor(expected), torch.tensor(f0_list), torch.tensor(idx)).numpy()
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("pitched", [False, True])
def test_knn_with_concat_cost_vs_reference(reference, torch, pitched):
    """The sequential CAT reselection as a lax.scan must reproduce the
    reference's greedy loop (lib_ongaku_test.py:270-369), including the sticky
    concat-weight zeroing in pitched mode."""
    rng = np.random.default_rng(6)
    T, k, P, D = 40, 4, 120, 24
    src = rng.standard_normal((T, D)).astype(np.float32)
    # smooth chunks so some frames get src_concat_baseline < 0.08
    src[10:20] = src[10:11] + 0.05 * rng.standard_normal((10, D)).astype(np.float32)
    tgt = rng.standard_normal((P, D)).astype(np.float32)
    idx = rng.integers(0, P, size=(T, k)).astype(np.int64)

    if pitched:
        sf0 = np.zeros(T, dtype=np.float32)
        sf0[5:35] = 150 + 100 * rng.random(30)
        tf0 = np.zeros(P, dtype=np.float32)
        tf0[::3] = 100 + 200 * rng.random((P + 2) // 3)
        ours = np.asarray(knn_with_concat_cost(
            jnp.asarray(idx.astype(np.int32)), jnp.asarray(src), jnp.asarray(tgt),
            jnp.asarray(sf0), jnp.asarray(tf0), concat_weight=0.2))
        ref = reference.lib_ongaku.knn_with_concat_cost(
            torch.tensor(idx), torch.tensor(src), torch.tensor(tgt),
            torch.tensor(sf0), torch.tensor(tf0), concat_weight=0.2).numpy()
    else:
        ours = np.asarray(knn_with_concat_cost(
            jnp.asarray(idx.astype(np.int32)), jnp.asarray(src), jnp.asarray(tgt),
            concat_weight=0.2))
        ref = reference.lib_ongaku.knn_with_concat_cost(
            torch.tensor(idx), torch.tensor(src), torch.tensor(tgt),
            concat_weight=0.2).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_smoothness_optimizer_vs_reference(reference, torch, capsys):
    """The jitted while-loop optimizer must reach the reference Adam loop's
    smoothness quality (trajectories can't be bit-compared over thousands of
    fp32 steps; we compare converged loss)."""
    rng = np.random.default_rng(7)
    T, k, P, D = 24, 4, 80, 16
    synth = rng.standard_normal((P, D)).astype(np.float32)
    idx = rng.integers(0, P, size=(T, k)).astype(np.int64)

    ours_w = np.asarray(optimize_smoothness_weights(
        jnp.asarray(idx.astype(np.int32)), jnp.asarray(synth), scale=WAVLM_LOSS_SCALE))
    ref_w = reference.prematch.compute_wavlm_weight(
        torch.tensor(idx), torch.tensor(synth)).numpy()

    assert ours_w.shape == ref_w.shape
    np.testing.assert_allclose(ours_w.sum(axis=1), 1.0, atol=1e-5)  # simplex

    # evaluate both weight sets under the same reference loss
    def ref_loss(w):
        import jax

        from knnsvc_tpu.match.smoothness import _gather_surrounding, _loss_fn

        surrounding = _gather_surrounding(jnp.asarray(idx.astype(np.int32)), jnp.asarray(synth), None)
        # invert softmax: use logits = log(w) (same softmax output)
        return float(_loss_fn(jnp.log(jnp.asarray(w) + 1e-12), surrounding, WAVLM_LOSS_SCALE))

    ours_loss, refs_loss = ref_loss(ours_w), ref_loss(ref_w)
    assert ours_loss <= refs_loss * 1.02 + 1e-6, (ours_loss, refs_loss)


def test_quantized_pool_knn_agreement():
    """int8 pool selection must near-match fp32 (scales cancel in cosine)."""
    from knnsvc_tpu.match.quantized_pool import knn_topk_quantized, quantize_pool

    rng = np.random.default_rng(11)
    # WavLM-like feature stats
    pool = (rng.standard_normal((2000, 256)) * 1.5).astype(np.float32)
    query = (rng.standard_normal((64, 256)) * 1.5).astype(np.float32)

    qp = quantize_pool(pool)
    assert qp.values.dtype == jnp.int8

    idx_q, vals_q = knn_topk_quantized(jnp.asarray(query), qp, k=8, approx=False)
    idx_f, vals_f = knn_topk(jnp.asarray(query), jnp.asarray(pool), k=8)

    top1 = np.mean(np.asarray(idx_q)[:, 0] == np.asarray(idx_f)[:, 0])
    top4 = np.mean([
        len(set(a[:4].tolist()) & set(b[:4].tolist())) / 4
        for a, b in zip(np.asarray(idx_q), np.asarray(idx_f))
    ])
    assert top1 > 0.9, top1
    assert top4 > 0.9, top4
    # distances agree to quantization noise
    np.testing.assert_allclose(np.asarray(vals_q), np.asarray(vals_f), atol=0.02)


def test_quantized_pool_zero_row_safe():
    from knnsvc_tpu.match.quantized_pool import knn_topk_quantized, quantize_pool

    pool = np.zeros((40, 16), dtype=np.float32)
    pool[1:] = np.random.default_rng(0).standard_normal((39, 16))
    qp = quantize_pool(pool)
    idx, vals = knn_topk_quantized(jnp.ones((3, 16)), qp, k=4, approx=False)
    assert np.all(np.isfinite(np.asarray(vals)))


def test_zero_norm_rows_finite():
    """All-zero frames (silence / padding) must yield finite distances and
    sane top-k, never NaN (ref only detects NaN: lib_ongaku_test.py:166-169)."""
    rng = np.random.default_rng(7)
    q = rng.standard_normal((9, 32)).astype(np.float32)
    p = rng.standard_normal((57, 32)).astype(np.float32)
    q[3] = 0.0
    p[10] = 0.0
    d = np.asarray(cosine_distance(jnp.asarray(q), jnp.asarray(p)))
    assert np.all(np.isfinite(d))
    # zero rows sit at max distance, so they are never preferred neighbors
    assert np.all(d[3] == 2.0)
    assert np.all(d[:, 10] == 2.0)
    idx, vals = knn_topk(jnp.asarray(q), jnp.asarray(p), k=4)
    assert np.all(np.isfinite(np.asarray(vals)))
    assert 10 not in np.asarray(idx)

    w = np.abs(rng.standard_normal((9, 32))).astype(np.float32)
    dw = np.asarray(weighted_cosine_distance(jnp.asarray(q), jnp.asarray(p), jnp.asarray(w)))
    assert np.all(np.isfinite(dw))


def test_nan_input_rows_cannot_win_topk():
    """NaN *inputs* (corrupt features) are clamped to max distance instead of
    propagating — the reference aborts on detected NaN
    (lib_ongaku_test.py:166-169); producing a finite worst-case is safer."""
    rng = np.random.default_rng(11)
    q = rng.standard_normal((6, 32)).astype(np.float32)
    p = rng.standard_normal((25, 32)).astype(np.float32)
    q[2, 5] = np.nan
    p[7, 0] = np.nan
    for fn in (lambda a, b: cosine_distance(a, b),
               lambda a, b: weighted_cosine_distance(
                   a, b, jnp.abs(jnp.asarray(
                       rng.standard_normal((6, 32)).astype(np.float32))))):
        d = np.asarray(fn(jnp.asarray(q), jnp.asarray(p)))
        assert np.all(np.isfinite(d))
        assert np.all(d[2] == 2.0) and np.all(d[:, 7] == 2.0)
    idx, vals = knn_topk(jnp.asarray(q), jnp.asarray(p), k=4)
    assert np.all(np.isfinite(np.asarray(vals)))
    assert 7 not in np.asarray(idx)


def test_concat_cost_pair_equals_two_singles():
    """knn_with_concat_cost_pair (one lane-stacked scan) is bit-identical to
    running the unpitched and pitched reselections separately."""
    from knnsvc_tpu.match.concat_cost import knn_with_concat_cost, knn_with_concat_cost_pair

    rng = np.random.default_rng(3)
    T, P, D, k = 40, 60, 16, 4
    src = rng.standard_normal((T, D)).astype(np.float32)
    # smooth segments so some frames land under the 0.08 baseline
    src[10:20] = src[10] + 0.01 * rng.standard_normal((10, D)).astype(np.float32)
    tgt = rng.standard_normal((P, D)).astype(np.float32)
    idx_u = rng.integers(0, P, (T, k)).astype(np.int32)
    idx_p = rng.integers(0, P, (T, k)).astype(np.int32)
    sf0 = (80 + 300 * rng.random(T)).astype(np.float32)
    tf0 = (80 + 300 * rng.random(P)).astype(np.float32)

    a_u = np.asarray(knn_with_concat_cost(
        jnp.asarray(idx_u), jnp.asarray(src), jnp.asarray(tgt), concat_weight=0.2))
    a_p = np.asarray(knn_with_concat_cost(
        jnp.asarray(idx_p), jnp.asarray(src), jnp.asarray(tgt),
        jnp.asarray(sf0), jnp.asarray(tf0), concat_weight=0.2))
    b_u, b_p = knn_with_concat_cost_pair(
        jnp.asarray(idx_u), jnp.asarray(idx_p), jnp.asarray(src),
        jnp.asarray(tgt), jnp.asarray(sf0), jnp.asarray(tf0), concat_weight=0.2)
    np.testing.assert_array_equal(a_u, np.asarray(b_u))
    np.testing.assert_array_equal(a_p, np.asarray(b_p))


def test_smoothness_unroll_invariant():
    """Unrolled while_loop (frozen-when-done) == step-at-a-time loop."""
    from knnsvc_tpu.match.smoothness import optimize_smoothness_weights

    rng = np.random.default_rng(4)
    T, P, D, k = 12, 30, 8, 4
    idx = jnp.asarray(rng.integers(0, P, (T, k)).astype(np.int32))
    pool = jnp.asarray(rng.standard_normal((P, D)).astype(np.float32))

    w1, t1 = optimize_smoothness_weights(idx, pool, return_steps=True, unroll=1)
    w8, t8 = optimize_smoothness_weights(idx, pool, return_steps=True, unroll=8)
    w5, t5 = optimize_smoothness_weights(idx, pool, return_steps=True, unroll=5)
    # identical bookkeeping -> identical step counts; weights agree up to
    # XLA fusion reordering of the unrolled body
    assert int(t1) == int(t8) == int(t5)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w8), atol=1e-4)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w5), atol=1e-4)


def test_match_core_post_opt_equals_stepwise():
    """The fused one-dispatch post_opt core == the step-by-step path (int8
    branch disabled so match_utterance takes the eager route for comparison)."""
    from knnsvc_tpu.config import PostOpt
    from knnsvc_tpu.match import pipeline as pl

    rng = np.random.default_rng(5)
    Tq, P, D = 30, 50, 16
    q = rng.standard_normal((Tq, D)).astype(np.float32)
    pool = rng.standard_normal((P, D)).astype(np.float32)
    qf0 = (100 + 200 * rng.random(Tq)).astype(np.float32)
    pf0 = (100 + 200 * rng.random(P)).astype(np.float32)
    harm = np.abs(rng.standard_normal((P, 49))).astype(np.float32) * 0.05

    out, shifted, hm = pl._match_core_post_opt(
        jnp.asarray(q), jnp.asarray(pool), jnp.asarray(pool), jnp.asarray(pf0),
        jnp.asarray(harm), jnp.asarray(qf0), jnp.float32(np.nan), topk=4,
        approx=False, use_harmonics=True, concat_weight=0.2, opt_enabled=True)

    # step-by-step replication
    from knnsvc_tpu.match.concat_cost import knn_with_concat_cost
    from knnsvc_tpu.match.f0_logic import shift_f0_to_target_register, sort_by_f0_compatibility
    from knnsvc_tpu.match.knn import knn_topk
    from knnsvc_tpu.match.smoothness import (
        HARMONICS_LOSS_SCALE, WAVLM_LOSS_SCALE, optimize_smoothness_weights)

    nbrs, _ = knn_topk(jnp.asarray(q), jnp.asarray(pool), k=32, approx=False)
    sh = shift_f0_to_target_register(jnp.asarray(qf0), jnp.asarray(pf0))
    tidx = knn_with_concat_cost(nbrs[:, :4], jnp.asarray(q), jnp.asarray(pool),
                                concat_weight=0.2)
    pidx = sort_by_f0_compatibility(sh, jnp.asarray(pf0), nbrs)[:, :4]
    pidx = knn_with_concat_cost(pidx, jnp.asarray(q), jnp.asarray(pool),
                                sh, jnp.asarray(pf0), concat_weight=0.2)
    w = optimize_smoothness_weights(tidx, jnp.asarray(pool), scale=WAVLM_LOSS_SCALE)
    hw = optimize_smoothness_weights(pidx, jnp.asarray(harm), scale=HARMONICS_LOSS_SCALE)
    exp_out = jnp.sum(jnp.asarray(pool)[tidx] * w[..., None], axis=1)
    exp_hm = jnp.sum(jnp.asarray(harm)[pidx] * hw[..., None], axis=1)

    np.testing.assert_array_equal(np.asarray(shifted), np.asarray(sh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp_out), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hm), np.asarray(exp_hm), atol=1e-6)



def test_concat_stream_chaining_equals_whole_scan():
    """Cross-chunk continuity invariant (streaming post_opt): running the
    stream cores chunk-by-chunk, feeding each chunk's last-frame carry
    (selections + sticky weight) into the next, is BIT-IDENTICAL to the
    whole-sequence scan — the carry threads the reference's serial
    semantics (incl. the sticky concat_weight=0 latch) across boundaries."""
    from knnsvc_tpu.match.concat_cost import (
        concat_cost_core, concat_cost_pair_core,
        concat_cost_pair_stream_core, concat_cost_stream_core)

    rng = np.random.default_rng(11)
    T, k, P, D = 48, 4, 150, 24
    src = rng.standard_normal((T, D)).astype(np.float32)
    # smooth run so the pitched lane's sticky latch has low-baseline frames,
    # and rough frames elsewhere so it FIRES before the first boundary
    src[8:20] = src[8:9] + 0.03 * rng.standard_normal((12, D)).astype(np.float32)
    tgt = rng.standard_normal((P, D)).astype(np.float32)
    idx_u = rng.integers(0, P, size=(T, k)).astype(np.int32)
    idx_p = rng.integers(0, P, size=(T, k)).astype(np.int32)
    sf0 = np.zeros(T, np.float32)
    sf0[4:40] = 150 + 100 * rng.random(36)
    tf0 = np.zeros(P, np.float32)
    tf0[::3] = 100 + 200 * rng.random((P + 2) // 3)

    gather = lambda i: jnp.asarray(tgt)[i]
    tgt_lf0 = jnp.log2(jnp.asarray(tf0) + 1e-5)

    # ---- pair (lane-stacked) version ----
    whole_u, whole_p = concat_cost_pair_core(
        gather, jnp.asarray(idx_u), jnp.asarray(idx_p), jnp.asarray(src), P,
        jnp.asarray(sf0), tgt_lf0, concat_weight=0.2)

    got_u, got_p = [idx_u[:1]], [idx_p[:1]]
    carry_idx = jnp.stack([jnp.asarray(idx_u[0]), jnp.asarray(idx_p[0])])
    carry_w = jnp.float32(0.2)
    for lo, hi in ((1, 17), (17, 33), (33, T)):  # uneven chunk boundaries
        su, sp, wts = concat_cost_pair_stream_core(
            gather, jnp.asarray(idx_u[lo:hi]), jnp.asarray(idx_p[lo:hi]),
            jnp.asarray(src[lo - 1]), jnp.asarray(src[lo:hi]), P,
            jnp.asarray(sf0[lo:hi]), tgt_lf0, carry_idx, carry_w,
            concat_weight=0.2)
        got_u.append(np.asarray(su))
        got_p.append(np.asarray(sp))
        carry_idx = jnp.stack([su[-1], sp[-1]])
        carry_w = wts[-1]
    np.testing.assert_array_equal(np.concatenate(got_u), np.asarray(whole_u))
    np.testing.assert_array_equal(np.concatenate(got_p), np.asarray(whole_p))
    # the latch must actually have fired mid-stream for the test to bite
    assert float(carry_w) == 0.0

    # ---- single-lane (unpitched) version ----
    whole = concat_cost_core(gather, jnp.asarray(idx_u), jnp.asarray(src), P,
                             concat_weight=0.2)
    got = [idx_u[:1]]
    carry = jnp.asarray(idx_u[0])
    cw = jnp.float32(0.2)
    for lo, hi in ((1, 20), (20, T)):
        s, wts = concat_cost_stream_core(
            gather, jnp.asarray(idx_u[lo:hi]), jnp.asarray(src[lo - 1]),
            jnp.asarray(src[lo:hi]), P, carry, cw, concat_weight=0.2)
        got.append(np.asarray(s))
        carry, cw = s[-1], wts[-1]
    np.testing.assert_array_equal(np.concatenate(got), np.asarray(whole))
