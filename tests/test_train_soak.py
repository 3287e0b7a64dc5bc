"""Training soak at realistic (in-image) scale — VERDICT r3 #9.

The short train-loop tests prove wiring on 3-utterance worlds and 1-2 steps;
this soak runs a ~100-utterance synthetic corpus for a few hundred steps and
asserts the *training dynamics* the reference loop promises
(ref hifigan/ddsp_train.py:169-383):

- validation mel error IMPROVES over training (first validation vs best
  later one),
- best-checkpoint rotation keeps exactly ONE g_/do_ pair after many
  validations (stale pairs deleted, the kept pair is the best-val step),
- mid-epoch resume continues the step counter and epoch counter for BOTH
  checkpoint backends (pickle pair and orbax).
"""

import glob
import json
import os

import jax
import numpy as np
import pytest

from knnsvc_tpu.config import HiFiGANConfig, WavLMConfig
from knnsvc_tpu.io.audio import save_audio
from knnsvc_tpu.models.wavlm import init_wavlm_params
from knnsvc_tpu.train.prematch import per_spk_extract
from knnsvc_tpu.utils.layer_weights import generate_matrix_from_index

pytestmark = pytest.mark.slow

SOAK_H = dict(
    upsample_initial_channel=32,
    n_harmonic=4,
    hubert_dim=16,
    hifi_dim=16,
    segment_size=1280,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3, 5),),
    batch_size=4,
    seed=1234,
)


@pytest.fixture(scope="module")
def soak_world(tmp_path_factory):
    """~100 synthetic utterances (3 speakers x 32 train + 3 x 4 valid):
    harmonic stacks with per-utterance f0 and formant-ish spectral tilt —
    learnable structure, not white noise."""
    root = tmp_path_factory.mktemp("soakworld")
    cfg = WavLMConfig.from_dict(dict(
        extractor_mode="layer_norm", encoder_layers=2, encoder_embed_dim=16,
        encoder_ffn_embed_dim=32, encoder_attention_heads=2, layer_norm_first=True,
        conv_feature_layers="[(16,10,5)] + [(16,4,4)] + [(16,4,4)] + [(16,4,4)]",
        conv_bias=True, conv_pos=8, conv_pos_groups=2,
        relative_position_embedding=True, num_buckets=16, max_distance=32,
        gru_rel_pos=True,
    ))
    params = init_wavlm_params(jax.random.PRNGKey(0), cfg)
    w = generate_matrix_from_index(1, size=3)

    rng = np.random.default_rng(7)
    sr = 16000
    t = np.arange(sr) / sr                      # 1 s per utterance
    base_f0 = {0: 140.0, 1: 220.0, 2: 330.0}    # per-speaker register
    for split, per_spk in (("train", 32), ("valid", 4)):
        for spk in range(3):
            d = root / split / f"spk{spk}"
            d.mkdir(parents=True)
            for i in range(per_spk):
                f0 = base_f0[spk] * (1.0 + 0.1 * rng.standard_normal())
                vib = 1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * t)
                phase = 2 * np.pi * f0 * np.cumsum(vib) / sr
                wav = np.zeros_like(t)
                for h_idx in range(1, 6):
                    wav += np.sin(h_idx * phase) / h_idx ** 1.5
                wav *= 0.25 * (0.5 - 0.5 * np.cos(2 * np.pi * t))  # fade env
                wav += 0.01 * rng.standard_normal(len(t))
                save_audio(d / f"utt{i}.wav", wav.astype(np.float32), sr)
        per_spk_extract(root / split, root / f"cached_{split}", params, cfg, w, w)
    return root


def _train_kwargs(root, ckpt_dir, **over):
    kw = dict(
        audio_root_train=str(root / "train"),
        feat_root_train=str(root / "cached_train"),
        audio_root_valid=str(root / "valid"),
        feat_root_valid=str(root / "cached_valid"),
        checkpoint_path=str(ckpt_dir),
        training_epochs=1000,
        validation_interval=24,          # one validation per epoch
        summary_interval=24,
        stdout_interval=1000,
        with_harm=True,
        max_val_items=4,
        val_artifacts=0,
        # full 5+3 discriminator topology, narrow channels: the soak is
        # about training DYNAMICS (val improvement, rotation, resume), and
        # full-width discs cost ~10 s/step on the 1-core CPU box
        disc_width_scale=8,
    )
    kw.update(over)
    return kw


def test_soak_learning_rotation_and_resume_pickle(soak_world, tmp_path):
    from knnsvc_tpu.train.loop import train

    h = HiFiGANConfig.from_dict(SOAK_H)
    ckpt_dir = tmp_path / "soak_ckpts"
    # 96 train utts / batch 4 = 24 steps per epoch; stop mid-epoch-9
    state = train(h, **_train_kwargs(soak_world, ckpt_dir, max_steps=210))
    assert int(state.steps) >= 210

    # --- validation mel error improves ---
    vals = []
    for line in open(ckpt_dir / "logs" / "train_log.jsonl"):
        s = json.loads(line)
        if "validation/mel_spec_error" in s:
            vals.append((s["step"], s["validation/mel_spec_error"]))
    assert len(vals) >= 6, vals
    first = vals[0][1]
    later_best = min(v for _, v in vals[1:])
    assert later_best < first, (first, vals)

    # --- best-ckpt rotation: one pair left, tagged with the best-val step ---
    gs = glob.glob(str(ckpt_dir / "g_*.knnsvc.pkl"))
    dos = glob.glob(str(ckpt_dir / "do_*.knnsvc.pkl"))
    assert len(gs) == 1 and len(dos) == 1, (gs, dos)
    best_step = min(vals, key=lambda sv: sv[1])[0]
    # name layout: g_{ckpt_type}_{steps:08d}.knnsvc.pkl
    tag = os.path.basename(gs[0]).rsplit("_", 1)[1].split(".")[0]
    assert int(tag) == int(best_step), (tag, best_step, vals)

    # --- mid-epoch resume (pickle): counters continue ---
    from knnsvc_tpu.io.checkpoints import load_params

    do = load_params(dos[0])
    ckpt_steps, ckpt_epoch = int(do["steps"]), int(do["epoch"])
    resume_dir = tmp_path / "soak_resume"
    state2 = train(h, **_train_kwargs(
        soak_world, resume_dir,
        max_steps=int(state.steps) + 24, resume_from=str(ckpt_dir)))
    assert int(state2.steps) > int(state.steps) >= ckpt_steps
    # the resumed run's own best-val do_ pair carries the continued epoch
    dos2 = glob.glob(str(resume_dir / "do_*.knnsvc.pkl"))
    assert dos2, "resumed run never validated/checkpointed"
    do2 = load_params(dos2[0])
    assert int(do2["steps"]) > ckpt_steps
    assert int(do2["epoch"]) > ckpt_epoch, (int(do2["epoch"]), ckpt_epoch)


def test_soak_resume_orbax(soak_world, tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from knnsvc_tpu.train.loop import train

    h = HiFiGANConfig.from_dict(SOAK_H)
    ckpt_dir = tmp_path / "soak_orbax"
    state = train(h, **_train_kwargs(
        soak_world, ckpt_dir, max_steps=60, checkpoint_backend="orbax"))
    assert os.path.isdir(ckpt_dir / "orbax")

    state2 = train(h, **_train_kwargs(
        soak_world, tmp_path / "soak_orbax_resume",
        max_steps=int(state.steps) + 24, validation_interval=10_000,
        checkpoint_backend="orbax", resume_from=str(ckpt_dir)))
    assert int(state2.steps) > int(state.steps)
