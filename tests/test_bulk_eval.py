"""Paper-protocol integration smoke: dataset -> dataset bulk conversion
through the real hub surface, then the full evaluation chain (pinned-format
pairs CSV -> speaker-similarity EER -> score diffing), all on synthetic
speakers with random weights (CPU mesh).

This exercises the exact production workflow of the reference's
`ddsp_inference.py SRC_ROOT TGT_ROOT` + `data_splits/speaker_similarity.py`
(ref ddsp_matcher.py:1027-1156, data_splits/speaker_similarity.py:23-149):
output tree naming, resume skip-existing, eval path conventions.
"""

import numpy as np
import pytest

import jax

from knnsvc_tpu.config import HiFiGANConfig, ModelFamily, WavLMConfig
from knnsvc_tpu.io.audio import load_audio, save_audio
from knnsvc_tpu.models.hifigan import init_generator_params
from knnsvc_tpu.models.wavlm import init_wavlm_params
from knnsvc_tpu.utils.layer_weights import generate_matrix_from_index

from tests.test_pipeline import SMALL_HIFIGAN, SMALL_WAVLM, _sing


@pytest.fixture(scope="module")
def bulk_world(tmp_path_factory):
    """Two-speaker source and target dataset roots + a hub instance."""
    root = tmp_path_factory.mktemp("bulk")
    src_root = root / "src_data"
    tgt_root = root / "tgt_data"
    sr = 16000
    for spk, base_f0, seed in (("s1", 170, 0), ("s2", 210, 1)):
        d = src_root / spk
        d.mkdir(parents=True)
        save_audio(d / f"{spk}_utt1.wav", _sing(sr, 0.8, base_f0, seed), sr)
        save_audio(d / f"{spk}_utt2.wav", _sing(sr, 0.6, base_f0 + 15, seed + 10), sr)
    for spk, base_f0, seed in (("t1", 250, 2), ("t2", 280, 3)):
        d = tgt_root / spk
        d.mkdir(parents=True)
        save_audio(d / f"{spk}_ref1.wav", _sing(sr, 1.0, base_f0, seed), sr)
        save_audio(d / f"{spk}_ref2.wav", _sing(sr, 0.7, base_f0 - 20, seed + 10), sr)

    from knnsvc_tpu.hub import KnnSvc

    cfg = WavLMConfig.from_dict(SMALL_WAVLM)
    h = HiFiGANConfig.from_dict(SMALL_HIFIGAN)
    knn = KnnSvc(
        init_wavlm_params(jax.random.PRNGKey(0), cfg), cfg,
        init_generator_params(jax.random.PRNGKey(1), h, ModelFamily.MIX), h,
        ckpt_type="mix",
    )
    knn.weighting = generate_matrix_from_index(2, size=cfg.encoder_layers + 1)
    return root, src_root, tgt_root, knn


@pytest.mark.slow
def test_bulk_convert_then_speaker_sim_eval(bulk_world, tmp_path):
    root, src_root, tgt_root, knn = bulk_world
    out_dir = tmp_path / "converted"

    written = knn.bulk_convert(str(src_root), str(tgt_root), str(out_dir))
    # 2 src spk x 2 utts x 2 tgt spk = 8 outputs, ref tree naming
    # <dir>/<src_spk>/<utt>/<tgt_spk>.wav (ref ddsp_matcher.py:1130-1152)
    assert len(written) == 8
    expect = out_dir / "s1" / "s1_utt1" / "t1.wav"
    assert expect.is_file(), sorted(map(str, written))
    for p in written:
        y, sr = load_audio(p)
        assert sr == 16000 and np.isfinite(y).all()

    # resume=True skips all existing outputs
    again = knn.bulk_convert(str(src_root), str(tgt_root), str(out_dir), resume=True)
    assert len(again) == 0

    # ---- evaluation chain on the converted tree (speaker s1) ----
    # pinned-format pairs CSV (ref data_splits/speaker-sim-*.csv header)
    rows = ["src_speaker,tgt_speaker,x_path,y_path,label"]
    for utt in ("s1_utt1", "s1_utt2"):
        for tgt, ref_utt in (("t1", "t1_ref1"), ("t2", "t2_ref1")):
            rows.append(f"s1,{tgt},{utt}/{tgt},{tgt}/{ref_utt},0")
    rows.append("s1,t1,t1/t1_ref1,t1/t1_ref2,1")
    rows.append("s1,t2,t2/t2_ref1,t2/t2_ref2,1")
    eval_csv = tmp_path / "pairs.csv"
    eval_csv.write_text("\n".join(rows) + "\n")

    from knnsvc_tpu.eval.speaker_sim import compute_speaker_similarity

    sim = compute_speaker_similarity(
        str(eval_csv), str(out_dir / "s1"), str(tgt_root), result_dir=str(tmp_path)
    )
    assert np.isfinite(sim.loc["mean", "eer"])
    score_csv = tmp_path / "s1_sim_result.txt"
    assert score_csv.is_file()

    # score diffing between two "checkpoints" (here: same scores -> zero diff)
    from knnsvc_tpu.eval.pairs import compare_score_csvs

    diff = compare_score_csvs(str(score_csv), str(score_csv), k=2)
    assert all(abs(d) < 1e-12 for _, d, _ in diff["best"] + diff["worst"])


@pytest.mark.slow
def test_bulk_convert_fast_mode(bulk_world, tmp_path):
    """Device-resident bulk loop: same output tree, valid audio, resume."""
    root, src_root, tgt_root, knn = bulk_world
    out_dir = tmp_path / "converted_fast"

    written = knn.bulk_convert(str(src_root), str(tgt_root), str(out_dir), fast=True)
    assert len(written) == 8
    assert (out_dir / "s2" / "s2_utt2" / "t2.wav").is_file()
    for p in written:
        y, sr = load_audio(p)
        assert sr == 16000 and np.isfinite(y).all() and np.abs(y).max() <= 1.0

    again = knn.bulk_convert(str(src_root), str(tgt_root), str(out_dir),
                             fast=True, resume=True)
    assert len(again) == 0

    # duration_limit bounds the target pool without breaking conversion
    limited = knn.bulk_convert(str(src_root), str(tgt_root),
                               str(tmp_path / "converted_lim"), fast=True,
                               duration_limit=0.5)
    assert len(limited) == 8


@pytest.mark.slow
def test_cli_pair_and_folder_modes(bulk_world, tmp_path, monkeypatch):
    """CLI main(): argument plumbing, file/dir sniffing, --out, --fast,
    bulk output-dir naming (ref ddsp_inference.py:79-103)."""
    root, src_root, tgt_root, knn = bulk_world
    from knnsvc_tpu.cli import inference as cli
    from knnsvc_tpu.hub import KnnSvc

    monkeypatch.setattr(KnnSvc, "random_init", classmethod(lambda cls, *a, **k: knn))

    # pair mode with explicit --out
    out = tmp_path / "pair.wav"
    rc = cli.main([
        str(src_root / "s1" / "s1_utt1.wav"), str(tgt_root / "t1" / "t1_ref1.wav"),
        "--random_init", "true", "--fast", "true", "--matcher", "approx",
        "--out", str(out),
    ])
    assert rc == 0 and out.is_file()
    y, sr = load_audio(out)
    assert sr == 16000 and np.isfinite(y).all()

    # folder mode: output dir naming next to the target root
    rc = cli.main([
        str(src_root), str(tgt_root),
        "--random_init", "true", "--fast", "true", "--matcher", "approx",
    ])
    assert rc == 0
    expect_dir = tgt_root.parent / f"{src_root.name}_to_{tgt_root.name}_mix_post_opt_no_post_opt"
    assert expect_dir.is_dir(), sorted(p.name for p in tgt_root.parent.iterdir())
    wavs = list(expect_dir.rglob("*.wav"))
    assert len(wavs) == 8


@pytest.mark.slow
def test_bulk_convert_fast_sharded_int8(bulk_world, tmp_path):
    """Bulk serving through the int8-sharded matcher (8-device CPU mesh):
    same output tree, valid audio."""
    root, src_root, tgt_root, knn = bulk_world
    out_dir = tmp_path / "converted_q8"
    written = knn.bulk_convert(str(src_root), str(tgt_root), str(out_dir),
                               fast=True, matcher="sharded_int8")
    assert len(written) == 8
    for p in written:
        y, sr = load_audio(p)
        assert sr == 16000 and np.isfinite(y).all() and np.abs(y).max() <= 1.0
