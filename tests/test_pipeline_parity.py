"""End-to-end parity of the conversion pipeline vs the reference's
match_at_inference_time (ref ddsp_prematch_dataset.py:1074-1459).

Every stage already has an exact-parity test; this locks the *ordering quirks*
of the full converter — the unpitched selection feeding the WavLM features,
the f0-prioritized selection resorted from the ORIGINAL 32 candidates feeding
the harmonics, and the two concat-cost reselections — by running the actual
reference function on synthetic pools (get_complete_spk_pool monkeypatched on
both sides; it is separately parity-tested via match/pool.py tests).

The smoothness optimizer is stubbed with the same deterministic index-derived
weights on both sides (its convergence is covered by
test_match.py::test_smoothness_optimizer_vs_reference); everything else runs
the real code.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from knnsvc_tpu.match import pipeline as pl
from knnsvc_tpu.match.pool import SpeakerPool, UtterancePools


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


def _make_world(torch, seed=0):
    """Synthetic 2-utterance source speaker + 2-utterance target pool,
    as (torch dicts for the reference, SpeakerPool for us)."""
    rng = np.random.default_rng(seed)
    D, S, A = 16, 12, 8

    def utt(T, voiced_frac=0.8):
        f0 = np.zeros(T, dtype=np.float32)
        voiced = rng.random(T) < voiced_frac
        f0[voiced] = (80 + 400 * rng.random(int(voiced.sum()))).astype(np.float32)
        return dict(
            matching=rng.standard_normal((T, D)).astype(np.float32),
            synth=rng.standard_normal((T, D)).astype(np.float32),
            audio=rng.standard_normal((T, A)).astype(np.float32),
            spec=np.abs(rng.standard_normal((T, S))).astype(np.float32),
            f0=f0,
            harmonics=np.abs(rng.standard_normal((T, 49))).astype(np.float32) * 0.05,
        )

    src = {"src/u1.wav": utt(25), "src/u2.wav": utt(35)}
    ref = {"ref/r1.wav": utt(40), "ref/r2.wav": utt(30)}

    def as_torch_pools(d):
        fields = ["matching", "synth", "audio", "spec", "f0", "harmonics"]
        return tuple({k: torch.tensor(v[f]) for k, v in d.items()} for f in fields)

    def as_speaker_pool(d):
        return SpeakerPool({k: UtterancePools(**v) for k, v in d.items()})

    return src, ref, as_torch_pools, as_speaker_pool


def _stub_weights_np(idx: np.ndarray) -> np.ndarray:
    """Deterministic simplex weights derived from the selected indices —
    sensitive to any selection mismatch, identical in torch and jax."""
    logits = (idx % 7).astype(np.float32) * 0.1
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


@pytest.mark.parametrize("ckpt_type", ["wavlm_only", "mix"])
@pytest.mark.parametrize("post_opt", ["no_post_opt", "post_opt_0.2"])
def test_full_pipeline_parity(reference, torch, monkeypatch, ckpt_type, post_opt):
    src, ref, as_torch_pools, as_speaker_pool = _make_world(torch)

    # ---- reference side ----
    calls = {"n": 0}

    def fake_pool(wav_file, wavlm, match_weights, synth_weights, **kw):
        calls["n"] += 1
        return as_torch_pools(src if calls["n"] == 1 else ref)

    monkeypatch.setattr(reference.prematch, "get_complete_spk_pool", fake_pool)

    def ref_wavlm_weight(indices, synth_list, process_type="sum_to_1_geq", *a, **k):
        return torch.tensor(_stub_weights_np(indices.cpu().numpy()))

    monkeypatch.setattr(reference.prematch, "compute_wavlm_weight", ref_wavlm_weight)
    monkeypatch.setattr(reference.prematch, "compute_extended_weight",
                        lambda indices, pool, process_type, factors:
                        torch.tensor(_stub_weights_np(indices.cpu().numpy())))

    from pathlib import Path

    ref_out = reference.prematch.match_at_inference_time(
        Path("src/u.wav"), Path("ref/r.wav"), wavlm=None,
        match_weights=None, synth_weights=None, topk=4, device="cpu",
        prioritize_f0=True, ckpt_type=ckpt_type,
        src_dataset_path="src", tgt_dataset_path="ref", post_opt=post_opt,
    )
    if ckpt_type == "mix":
        ref_feats, ref_harm, _, ref_f0 = ref_out
    else:
        ref_feats, _, ref_f0 = ref_out

    # ---- our side ----
    def our_stub_weights(idx, pool, scale=None, **kw):
        # jnp-traceable twin of _stub_weights_np (runs inside the fused jit)
        import jax

        return jax.nn.softmax((idx % 7).astype(jnp.float32) * 0.1, axis=1)

    monkeypatch.setattr(pl, "optimize_smoothness_weights", our_stub_weights)
    # the fused post_opt core traces the (patched) global at trace time;
    # drop any cached traces so the stub takes effect here and the stubbed
    # trace does not leak into later tests
    pl._match_core_post_opt.clear_cache()
    try:
        ours = pl.match_at_inference_time(
            "src", "ref/r.wav", None, None, None, None, topk=4,
            prioritize_f0=True, ckpt_type=ckpt_type, post_opt=post_opt,
            query_pool=as_speaker_pool(src), ref_pool=as_speaker_pool(ref),
        )
    finally:
        pl._match_core_post_opt.clear_cache()

    assert set(ours.keys()) == set(ref_feats.keys())
    for item in ours:
        np.testing.assert_allclose(
            ours[item].shifted_query_f0, ref_f0[item].numpy(), rtol=1e-5, atol=1e-4,
            err_msg=f"{item} shifted f0")
        np.testing.assert_allclose(
            ours[item].out_feats_weighted, ref_feats[item].numpy(), atol=1e-5,
            err_msg=f"{item} weighted feats")
        if ckpt_type == "mix":
            np.testing.assert_allclose(
                ours[item].harmonics_out_feats_weighted, ref_harm[item].numpy(),
                atol=1e-5, err_msg=f"{item} harmonics")
        else:
            assert ours[item].harmonics_out_feats_weighted is None
