"""Eval harness tests: WER/CER vs hand-computed values, EER sanity, pair-list
generation, speaker-sim protocol on synthetic speakers."""

import numpy as np
import pytest

from knnsvc_tpu.eval.metrics import cer, compute_measures, eer, numbers_to_words, wer


def test_numbers_to_words():
    assert numbers_to_words("i have 2 cats") == "i have two cats"
    assert numbers_to_words("21 dogs") == "twenty one dogs"
    assert numbers_to_words("chapter 115") == "chapter one hundred and fifteen"
    assert numbers_to_words("year 1984 came") == "year one thousand nine hundred and eighty four came"
    assert numbers_to_words("no digits here") == "no digits here"


def test_wer_hand_computed():
    # ref: "the cat sat" vs "the cat sat" -> 0
    assert wer(["the cat sat"], ["the cat sat"]) == 0.0
    # 1 substitution of 3 words
    assert wer(["the cat sat"], ["the dog sat"]) == pytest.approx(1 / 3)
    # 1 deletion + 1 insertion
    assert wer(["a b c d"], ["a x b c"]) == pytest.approx(2 / 4)
    # punctuation/case insensitive (jiwer cleaner chain)
    assert wer(["Hello, World!"], ["hello world"]) == 0.0


def test_cer_hand_computed():
    assert cer(["abc"], ["abc"]) == 0.0
    assert cer(["abc"], ["axc"]) == pytest.approx(1 / 3)


def test_compute_measures_counts():
    m = compute_measures(["a b c"], ["a x c y"], "words")
    assert m["hits"] == 2 and m["substitutions"] == 1 and m["insertions"] == 1
    assert m["deletions"] == 0


def test_eer_separable_and_random():
    rng = np.random.default_rng(0)
    # perfectly separable: same-speaker (label 1) distances < different (label 0)
    labels = np.array([1] * 50 + [0] * 50)
    scores = np.concatenate([rng.random(50) * 0.2, 0.8 + rng.random(50) * 0.2])
    assert eer(labels, scores) < 0.02
    # random scores -> ~0.5
    scores_rand = rng.random(100)
    assert 0.25 < eer(labels, scores_rand) < 0.75


def test_pair_list_generation_and_speaker_sim(tmp_path):
    from knnsvc_tpu.eval.pairs import generate_pair_lists
    from knnsvc_tpu.eval.speaker_sim import compute_speaker_similarity
    from knnsvc_tpu.io.audio import save_audio

    sr = 16000
    rng = np.random.default_rng(0)

    # two "speakers" with distinct spectral signatures
    def make(freq, seed):
        t = np.arange(sr) / sr
        return (0.3 * np.sin(2 * np.pi * freq * t)
                + 0.02 * np.random.default_rng(seed).standard_normal(sr)).astype(np.float32)

    gt = tmp_path / "gt"
    for spk, freq in (("spkA", 200), ("spkB", 420)):
        d = gt / spk
        d.mkdir(parents=True)
        for i in range(3):
            save_audio(d / f"{spk}_utt{i}.wav", make(freq + 5 * i, i), sr)

    sim_csv, intelli = generate_pair_lists(str(gt), str(gt), str(tmp_path / "splits"))
    lines = open(sim_csv).read().strip().split("\n")
    assert lines[0] == "src_speaker,tgt_speaker,x_path,y_path,label"
    assert len(lines) > 1
    assert len(open(intelli).read().strip().split("\n")) > 0

    # fake converted outputs: converted-to-spkB files actually sound like spkA
    # (bad conversion) -> per-speaker EER should be high... use good conversion:
    # converted file == a target-speaker utterance -> low EER
    conv = tmp_path / "converted"
    import csv

    with open(sim_csv) as fh:
        rows = [r for r in csv.reader(fh)][1:]
    for src, tgt, x_path, y_path, label in rows:
        if label != "0":
            continue
        out = conv / (x_path + ".wav")
        out.parent.mkdir(parents=True, exist_ok=True)
        freq = 200 if tgt == "spkA" else 420
        save_audio(out, make(freq + 2, hash(x_path) % 100), sr)

    sim = compute_speaker_similarity(sim_csv, str(conv), str(gt),
                                     result_dir=str(tmp_path))
    # VC speaker-sim EER: chance (~0.5) = converted indistinguishable from real
    # target = GOOD; near 0 = trivially separable = bad conversion
    assert float(sim.loc["mean"].iloc[0]) > 0.3
    assert (tmp_path / "converted_sim_result.txt").exists()

    # now overwrite with BAD conversions (wrong speaker) -> separable -> low EER
    for src, tgt, x_path, y_path, label in rows:
        if label != "0":
            continue
        wrong_freq = 420 if tgt == "spkA" else 200
        save_audio(conv / (x_path + ".wav"), make(wrong_freq, hash(x_path) % 50), sr)
    sim_bad = compute_speaker_similarity(sim_csv, str(conv), str(gt),
                                         result_dir=str(tmp_path))
    assert float(sim_bad.loc["mean"].iloc[0]) < 0.2


def test_intelligibility_harness_with_fake_asr(tmp_path):
    from knnsvc_tpu.eval.intelligibility import evaluate_intelligibility
    from knnsvc_tpu.io.audio import save_audio

    # librispeech-ish layout: root/spk/chapter/spk-chap-utt.flac + trans
    root = tmp_path / "ls" / "clean" / "19" / "198"
    root.mkdir(parents=True)
    sr = 16000
    texts = {"19-198-0000": "HELLO WORLD", "19-198-0001": "TWO CATS SAT"}
    with open(root / "19-198.trans.txt", "w") as fh:
        for utt, text in texts.items():
            save_audio(root / f"{utt}.wav", np.zeros(sr, np.float32), sr)
            fh.write(f"{utt} {text}\n")

    subset = tmp_path / "subset.txt"
    subset.write_text("19-198-0000\n19-198-0001\n")

    pred = tmp_path / "converted"
    for utt in texts:
        d = pred / "19" / utt
        d.mkdir(parents=True)
        save_audio(d / "spkX.wav", np.zeros(sr, np.float32), sr)

    # fake ASR: perfect on one, one word wrong on the other
    def fake_asr(path):
        return "HELLO WORLD" if "0000" in path else "TWO DOGS SAT"

    res = evaluate_intelligibility(
        str(tmp_path / "ls"), str(subset), str(pred), fake_asr, result_dir=str(tmp_path)
    )
    assert res["wer"]["wer"] == pytest.approx(1 / 5)
    assert res["cer"]["wer"] > 0
    assert (tmp_path / "converted_result.txt").exists()


def test_compare_score_csvs(tmp_path):
    from knnsvc_tpu.eval.pairs import compare_score_csvs

    header = ",src_speaker,tgt_speaker,src_path,tgt_path,score,label\n"
    a = tmp_path / "a.csv"
    b = tmp_path / "b.csv"
    a.write_text(header + "".join(f"{i},s,t,x{i},y{i},{0.1 * i},0\n" for i in range(6)))
    b.write_text(header + "".join(f"{i},s,t,x{i},y{i},{0.5 - 0.1 * i},0\n" for i in range(6)))
    out = compare_score_csvs(str(a), str(b), k=2)
    assert len(out["best"]) == 2 and len(out["worst"]) == 2
    assert out["worst"][0][1] < out["best"][-1][1]


def test_import_pinned_data_splits(tmp_path):
    """The paper's pinned split assets install + validate from an upstream
    checkout (ref data_splits/: 15.6k/14k pinned speaker-sim pairs, intelli
    subsets, LibriSpeech path lists, hifigan train/valid splits); the
    importer checks schema + exact row counts and pins SHA-256 provenance."""
    import json
    import sys

    sys.path.insert(0, "tools")
    try:
        from import_data_splits import import_splits
    finally:
        sys.path.pop(0)

    manifest = import_splits("/root/reference/data_splits", tmp_path / "ds", strict=True)
    assert manifest["speaker-sim-test-clean.csv"]["rows"] == 15601
    assert manifest["OpenSinger_test_to_nus-smc-corpus_48.txt"]["rows"] == 14077
    m = json.loads((tmp_path / "ds" / "MANIFEST.json").read_text())
    assert not m["problems"]
    # the installed pairs CSV feeds the speaker-sim harness unchanged
    import pandas as pd

    pairs = pd.read_csv(tmp_path / "ds" / "speaker-sim-test-clean.csv")
    assert set(pairs.columns) == {"src_speaker", "tgt_speaker", "x_path", "y_path", "label"}
    assert set(pairs.label.unique()) == {0, 1}
