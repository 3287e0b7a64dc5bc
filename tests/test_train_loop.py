"""End-to-end training-loop test: prematch -> train() (steps, validation,
best-only checkpoint retention, JSONL log) -> resume_from restore."""

import glob
import json

import numpy as np
import pytest

import jax

from knnsvc_tpu.config import HiFiGANConfig, WavLMConfig
from knnsvc_tpu.io.audio import save_audio
from knnsvc_tpu.models.wavlm import init_wavlm_params
from knnsvc_tpu.train.prematch import per_spk_extract
from knnsvc_tpu.utils.layer_weights import generate_matrix_from_index

TINY_H = dict(
    upsample_initial_channel=32,
    n_harmonic=4,
    hubert_dim=16,
    hifi_dim=16,
    segment_size=1280,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3, 5),),
    batch_size=2,
    seed=1234,
)


@pytest.fixture(scope="module")
def prematched_world(tmp_path_factory):
    root = tmp_path_factory.mktemp("trainworld")
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

    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000
    for split in ("train", "valid"):
        d = root / split / "spk0"
        d.mkdir(parents=True)
        for i, f in enumerate((200.0, 240.0, 300.0)):
            wav = (0.3 * np.sin(2 * np.pi * f * t) + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
            save_audio(d / f"utt{i}.wav", wav, 16000)
        per_spk_extract(root / split, root / f"cached_{split}", params, cfg, w, w)
    return root


def test_train_loop_end_to_end(prematched_world, tmp_path):
    from knnsvc_tpu.train.loop import train

    root = prematched_world
    h = HiFiGANConfig.from_dict(TINY_H)
    ckpt_dir = tmp_path / "ckpts"

    state = train(
        h,
        audio_root_train=str(root / "train"),
        feat_root_train=str(root / "cached_train"),
        audio_root_valid=str(root / "valid"),
        feat_root_valid=str(root / "cached_valid"),
        checkpoint_path=str(ckpt_dir),
        training_epochs=3,
        validation_interval=1,
        summary_interval=1,
        stdout_interval=100,
        with_harm=True,
        max_steps=2,
        max_val_items=1,
    )
    assert int(state.steps) >= 2

    # best-only retention: exactly one g_/do_ pair remains
    gs = sorted(glob.glob(str(ckpt_dir / "g_*.knnsvc.pkl")))
    dos = sorted(glob.glob(str(ckpt_dir / "do_*.knnsvc.pkl")))
    assert len(gs) == 1 and len(dos) == 1

    # do_ checkpoint carries the full resume payload
    from knnsvc_tpu.io.checkpoints import load_params

    do = load_params(dos[0])
    for key in ("mpd", "msd", "optim_g", "optim_d", "steps", "epoch"):
        assert key in do, key

    # JSONL metrics log written
    log_lines = open(ckpt_dir / "logs" / "train_log.jsonl").read().strip().split("\n")
    scalars = [json.loads(l) for l in log_lines]
    assert any("loss_gen_total" in s for s in scalars)
    assert any("validation/mel_spec_error" in s for s in scalars)

    # resume: restores step counter and optimizer state, continues training
    state2 = train(
        h,
        audio_root_train=str(root / "train"),
        feat_root_train=str(root / "cached_train"),
        audio_root_valid=str(root / "valid"),
        feat_root_valid=str(root / "cached_valid"),
        checkpoint_path=str(tmp_path / "ckpts2"),
        training_epochs=4,
        validation_interval=1000,  # no validation this run
        summary_interval=1000,
        stdout_interval=1000,
        with_harm=True,
        max_steps=int(do["steps"]) + 2,
        max_val_items=1,
        resume_from=str(ckpt_dir),
    )
    assert int(state2.steps) > int(do["steps"])


def _wavlm_cfg_dict():
    return dict(
        extractor_mode="layer_norm", encoder_layers=2, encoder_embed_dim=16,
        encoder_ffn_embed_dim=32, encoder_attention_heads=2, layer_norm_first=True,
        conv_feature_layers="[(16,10,5)] + [(16,4,4)] + [(16,4,4)] + [(16,4,4)]",
        conv_bias=True, conv_pos=8, conv_pos_groups=2,
        relative_position_embedding=True, num_buckets=16, max_distance=32,
        gru_rel_pos=True,
    )


def _serve_and_convert(prematched_world, ckpt_dir, tmp_path, tag):
    """Deploy path: KnnSvc.load(ckpt_dir, 'mix') -> convert_pair -> audio
    (ref ddsp_hubconf.py:85-95 -> scan_checkpoint -> inference)."""
    from knnsvc_tpu.hub import KnnSvc
    from knnsvc_tpu.io.audio import load_audio

    root = prematched_world
    knn = KnnSvc.load(str(ckpt_dir), "mix",
                      wavlm_ckpt=str(root / "wavlm.knnsvc.pkl"),
                      config_path=str(root / "config.json"))
    knn.weighting = generate_matrix_from_index(1, size=3)
    out = tmp_path / f"served_{tag}.wav"
    got = knn.convert_pair(str(root / "train" / "spk0" / "utt0.wav"),
                           str(root / "valid" / "spk0" / "utt1.wav"),
                           fast=True, matcher="approx", output_path=str(out))
    assert got == str(out) and out.is_file()
    y, sr = load_audio(out)
    assert sr == 16000 and np.isfinite(y).all() and np.abs(y).max() <= 1.0
    return knn


def test_trained_checkpoint_serves(prematched_world, tmp_path):
    """Close the training->serving circle, BOTH backends: prematch -> train
    a few steps -> (a) pickle: KnnSvc.load finds the trained
    g_mix_*.knnsvc.pkl via scan_checkpoint and converts; (b) orbax:
    KnnSvc.load serves straight from the orbax dir, and
    export_servable_checkpoint materializes a loadable g_/do_ pair."""
    pytest.importorskip("orbax.checkpoint")
    from knnsvc_tpu.config import WavLMConfig as _WCfg
    from knnsvc_tpu.io.checkpoints import save_params
    from knnsvc_tpu.models.wavlm import init_wavlm_params as _init_wavlm
    from knnsvc_tpu.train.loop import export_servable_checkpoint, train

    root = prematched_world
    h = HiFiGANConfig.from_dict(TINY_H)
    # deployable sidecar assets: WavLM pkl (with its cfg) + vocoder config
    cfg_dict = _wavlm_cfg_dict()
    save_params(str(root / "wavlm.knnsvc.pkl"), {
        "cfg": cfg_dict,
        "model": jax.device_get(_init_wavlm(jax.random.PRNGKey(0), _WCfg.from_dict(cfg_dict))),
    })
    (root / "config.json").write_text(json.dumps(TINY_H))

    common = dict(
        audio_root_train=str(root / "train"),
        feat_root_train=str(root / "cached_train"),
        audio_root_valid=str(root / "valid"),
        feat_root_valid=str(root / "cached_valid"),
        training_epochs=1, validation_interval=1, summary_interval=100,
        stdout_interval=100, with_harm=True, max_steps=1, max_val_items=1,
        val_artifacts=0,
    )

    # (a) pickle backend: trained name carries the ckpt_type
    pkl_dir = tmp_path / "ckpts_pkl"
    train(h, checkpoint_path=str(pkl_dir), **common)
    assert glob.glob(str(pkl_dir / "g_mix_*.knnsvc.pkl"))
    _serve_and_convert(prematched_world, pkl_dir, tmp_path, "pkl")

    # (b) orbax backend: serve directly from the orbax directory...
    orb_dir = tmp_path / "ckpts_orb"
    train(h, checkpoint_path=str(orb_dir), checkpoint_backend="orbax", **common)
    assert not glob.glob(str(orb_dir / "g_*.knnsvc.pkl"))
    _serve_and_convert(prematched_world, orb_dir, tmp_path, "orbax_direct")

    # ...and through the exported reference-shaped pair
    exp_dir = tmp_path / "exported"
    g_path, do_path = export_servable_checkpoint(
        str(orb_dir), h, with_harm=True, out_dir=str(exp_dir))
    assert g_path.endswith(".knnsvc.pkl") and "g_mix_" in g_path
    from knnsvc_tpu.io.checkpoints import load_params
    do = load_params(do_path)
    assert {"mpd", "msd", "optim_g", "optim_d", "steps", "epoch"} <= set(do)
    _serve_and_convert(prematched_world, exp_dir, tmp_path, "orbax_export")


def test_validation_artifacts_written(prematched_world, tmp_path):
    """Validation writes generated audio + mel artifacts (the reference's
    tensorboard audio/figure logging, ref ddsp_train.py:320-336)."""
    from knnsvc_tpu.train.loop import train

    root = prematched_world
    h = HiFiGANConfig.from_dict(TINY_H)
    ckpt_dir = tmp_path / "ckpts_art"
    train(
        h,
        audio_root_train=str(root / "train"),
        feat_root_train=str(root / "cached_train"),
        audio_root_valid=str(root / "valid"),
        feat_root_valid=str(root / "cached_valid"),
        checkpoint_path=str(ckpt_dir),
        training_epochs=1,
        validation_interval=1,
        summary_interval=100,
        stdout_interval=100,
        with_harm=True,
        max_steps=1,
        max_val_items=1,
        val_artifacts=1,
    )
    wavs = glob.glob(str(ckpt_dir / "logs" / "val_*_0.wav"))
    mels = glob.glob(str(ckpt_dir / "logs" / "val_*_0_mel.npy"))
    assert wavs and mels
    mel = np.load(mels[0])
    assert mel.ndim == 2 and np.isfinite(mel).all()


def test_bf16_train_step_and_orbax_backend(prematched_world, tmp_path):
    """compute_dtype='bfloat16' (the reference's AMP analogue) keeps master
    params fp32 and losses finite; checkpoint_backend='orbax' stores and
    restores the full TrainState."""
    pytest.importorskip("orbax.checkpoint")
    from knnsvc_tpu.train.loop import train

    root = prematched_world
    h = HiFiGANConfig.from_dict(TINY_H)
    ckpt_dir = tmp_path / "ckpts_bf16"
    state = train(
        h,
        audio_root_train=str(root / "train"),
        feat_root_train=str(root / "cached_train"),
        audio_root_valid=str(root / "valid"),
        feat_root_valid=str(root / "cached_valid"),
        checkpoint_path=str(ckpt_dir),
        training_epochs=2,
        validation_interval=1,
        summary_interval=1,
        stdout_interval=100,
        with_harm=True,
        max_steps=1,
        max_val_items=1,
        val_artifacts=0,
        compute_dtype="bfloat16",
        checkpoint_backend="orbax",
    )
    # master params stayed fp32 through the bf16 compute path
    leaves = jax.tree.leaves(state.g_params)
    assert all(l.dtype == np.float32 for l in leaves)
    log_lines = open(ckpt_dir / "logs" / "train_log.jsonl").read().strip().split("\n")
    losses = [json.loads(l) for l in log_lines if "loss_gen_total" in l]
    assert losses and all(np.isfinite(s["loss_gen_total"]) for s in losses)

    # orbax best-val checkpoint exists and resumes
    import os

    assert os.path.isdir(ckpt_dir / "orbax")
    state2 = train(
        h,
        audio_root_train=str(root / "train"),
        feat_root_train=str(root / "cached_train"),
        audio_root_valid=str(root / "valid"),
        feat_root_valid=str(root / "cached_valid"),
        checkpoint_path=str(tmp_path / "ckpts_bf16_resume"),
        training_epochs=3,
        validation_interval=1000,
        summary_interval=1000,
        stdout_interval=1000,
        with_harm=True,
        max_steps=int(state.steps) + 1,
        max_val_items=1,
        val_artifacts=0,
        checkpoint_backend="orbax",
        resume_from=str(ckpt_dir),
    )
    assert int(state2.steps) > 0
