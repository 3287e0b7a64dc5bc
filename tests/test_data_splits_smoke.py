"""End-to-end smoke over the VENDORED pinned data splits (data_splits/):
real rows of speaker-sim-test-clean.csv and test_intelli.txt drive a
conversion + both evaluation harnesses against a miniature LibriSpeech-shaped
world, writing the reference-shaped result files.

This is the paper's actual eval protocol executed on its actual pinned pair
lists (ref data_splits/speaker-sim-test-clean.csv,
eval_intelligibility.py:211-216, speaker_similarity.py:145) — only the audio
is synthetic and the embedder/ASR backends are the documented smoke
fallbacks (x-vector weights / Whisper are not in this image).
"""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import jax

from knnsvc_tpu.config import HiFiGANConfig, ModelFamily, WavLMConfig
from knnsvc_tpu.io.audio import save_audio
from knnsvc_tpu.models.hifigan import init_generator_params
from knnsvc_tpu.models.wavlm import init_wavlm_params
from knnsvc_tpu.utils.layer_weights import generate_matrix_from_index

from tests.test_pipeline import SMALL_HIFIGAN, SMALL_WAVLM, _sing

REPO = Path(__file__).resolve().parents[1]
SPLITS = REPO / "data_splits"

SRC_UTT = "1089-134686-0005"           # row 1 of test_intelli.txt
TGT_SPKS = ("1188", "121")


def test_pinned_splits_vendored():
    """The pinned assets are in-tree with their import manifest."""
    manifest = json.loads((SPLITS / "MANIFEST.json").read_text())
    assert {"speaker-sim-test-clean.csv", "test_to_test.txt",
            "test_intelli.txt", "wavlm-hifigan-train.csv"} <= set(manifest["assets"])
    assert not manifest["problems"]
    assert manifest["assets"]["speaker-sim-test-clean.csv"]["rows"] == 15601
    sim = pd.read_csv(SPLITS / "speaker-sim-test-clean.csv")
    assert list(sim.columns) == ["src_speaker", "tgt_speaker", "x_path",
                                 "y_path", "label"]
    assert len(sim) == 15600


@pytest.fixture(scope="module")
def split_world(tmp_path_factory):
    """Mini LibriSpeech-shaped ground truth + converted tree, built from the
    REAL pinned rows for source utterance 1089-134686-0005."""
    root = tmp_path_factory.mktemp("splits")
    gt_root = root / "LibriSpeech" / "test-clean"
    conv_root = root / "converted" / "1089"    # <out>/<src_spk> layout

    sim = pd.read_csv(SPLITS / "speaker-sim-test-clean.csv", dtype=str)
    conv_rows = sim[(sim.label == "0") & (sim.src_speaker == "1089")
                    & sim.tgt_speaker.isin(TGT_SPKS)
                    & sim.x_path.str.startswith(SRC_UTT + "/")]
    gt_rows = sim[(sim.label == "1") & sim.tgt_speaker.isin(TGT_SPKS)].groupby(
        "tgt_speaker", group_keys=False).head(3)
    subset = pd.concat([conv_rows, gt_rows])
    eval_csv = root / "pairs.csv"
    subset.to_csv(eval_csv, index=False)

    # ground-truth audio for every real y/x path referenced by the subset
    sr = 16000
    rng_seed = 0
    gt_paths = set(subset.y_path) | set(gt_rows.x_path)
    for rel in sorted(gt_paths):
        p = gt_root / (rel + ".flac")
        p.parent.mkdir(parents=True, exist_ok=True)
        spk_f0 = 160 + (hash(rel.split("/")[0]) % 5) * 30
        save_audio(p, _sing(sr, 0.6, spk_f0, rng_seed), sr)
        rng_seed += 1
        # LibriSpeech layout: every chapter dir carries its .trans.txt
        chap_trans = p.parent / ("-".join(p.stem.split("-")[:2]) + ".trans.txt")
        with open(chap_trans, "a") as fh:
            fh.write(f"{p.stem} SOME TARGET SPEAKER WORDS\n")

    # the intelligibility source utterance + its LibriSpeech .trans.txt
    src_flac = gt_root / "1089" / (SRC_UTT + ".flac")
    src_flac.parent.mkdir(parents=True, exist_ok=True)
    save_audio(src_flac, _sing(sr, 0.8, 170, 99), sr)
    trans = src_flac.parent / ("-".join(SRC_UTT.split("-")[:2]) + ".trans.txt")
    trans.write_text(f"{SRC_UTT} HE HOPED THERE WOULD BE STEW FOR DINNER\n")

    # convert the source against each pinned target speaker through the hub
    cfg = WavLMConfig.from_dict(SMALL_WAVLM)
    h = HiFiGANConfig.from_dict(SMALL_HIFIGAN)
    from knnsvc_tpu.hub import KnnSvc

    knn = KnnSvc(
        init_wavlm_params(jax.random.PRNGKey(0), cfg), cfg,
        init_generator_params(jax.random.PRNGKey(1), h, ModelFamily.MIX), h,
        ckpt_type="mix",
    )
    knn.weighting = generate_matrix_from_index(2, size=cfg.encoder_layers + 1)
    for _, row in conv_rows.iterrows():
        ref = gt_root / (row.y_path + ".flac")
        out = conv_root / (row.x_path + ".wav")
        out.parent.mkdir(parents=True, exist_ok=True)
        knn.convert_pair(str(src_flac), str(ref), fast=True, matcher="approx",
                         output_path=str(out))
    return root, gt_root, conv_root, eval_csv


def test_speaker_sim_on_pinned_rows(split_world):
    """compute_speaker_similarity over REAL pinned CSV rows writes the
    reference-shaped `<dir>_sim_result.txt` (ref speaker_similarity.py:145)."""
    root, gt_root, conv_root, eval_csv = split_world
    from knnsvc_tpu.eval.speaker_sim import compute_speaker_similarity

    sim = compute_speaker_similarity(str(eval_csv), str(conv_root),
                                     str(gt_root), result_dir=str(root))
    assert np.isfinite(sim.loc["mean", "eer"])
    result = root / "1089_sim_result.txt"
    assert result.is_file()
    scores = pd.read_csv(result)
    # one score row per pinned pair, labels preserved
    assert len(scores) == len(pd.read_csv(eval_csv))
    assert set(scores.label) == {0, 1}


def test_intelligibility_on_pinned_subset(split_world, tmp_path):
    """evaluate_intelligibility driven by the REAL test_intelli.txt subset
    format and LibriSpeech layout; fake ASR; reference-shaped result file
    (ref eval_intelligibility.py:211-216)."""
    root, gt_root, conv_root, eval_csv = split_world
    from knnsvc_tpu.eval.intelligibility import evaluate_intelligibility

    # real subset file format: keep only our utterance's row
    subset_file = tmp_path / "test_intelli.txt"
    lines = (SPLITS / "test_intelli.txt").read_text().splitlines()
    assert f"1089/{SRC_UTT}.flac" in lines
    subset_file.write_text(f"1089/{SRC_UTT}.flac\n")

    truth = "HE HOPED THERE WOULD BE STEW FOR DINNER"
    fake_asr = lambda path: truth  # noqa: E731 — perfect-ASR smoke

    result = evaluate_intelligibility(
        str(gt_root), str(subset_file), str(conv_root.parent / "1089"),
        fake_asr, result_dir=str(tmp_path))
    assert result["wer"]["wer"] == 0.0
    assert result["cer"]["wer"] == 0.0
    assert Path(result["result_file"]).is_file()
    assert "WER measure" in Path(result["result_file"]).read_text()
