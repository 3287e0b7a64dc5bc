"""knnsvc_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
SmoothKen/knn-svc (kNN-SVC: robust zero-shot singing voice conversion).

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):

  io/        audio read/write, resample, VAD, loudness        (ref L0)
  dsp/       STFT, mel, f0 (Harvest port), additive synth     (ref L0)
  models/    WavLM encoder, HiFi-GAN vocoder variants         (ref L1, L4)
  ops/       Pallas TPU kernels (tiled kNN, attention)        (new)
  match/     kNN converter: distance, top-k, f0 logic,
             concat-cost reselect, smoothness optimizer,
             speaker pools, inference pipeline                 (ref L2, L3)
  parallel/  mesh setup, sharded-pool kNN, DP training utils   (ref §2.7, new)
  train/     prematch extractor, dataset, GAN trainer          (ref L6a)
  eval/      WER/CER + EER harnesses, golden regression        (ref §2.6)
  cli/       ddsp_inference-compatible CLI surface             (ref L6b)

The compute path is pure-functional JAX: every stage is a pure function over
arrays, jitted per shape bucket. Model parameters are plain pytrees (nested
dicts) so that PyTorch checkpoints convert 1:1 (see io/checkpoints.py).
"""

__version__ = "0.1.0"

HOP_LENGTH = 320          # WavLM frame hop in samples @ 16 kHz (ref ddsp_prematch_dataset.py:20)
SAMPLE_RATE = 16000
SPEAKER_INFORMATION_LAYER = 6  # matching/synthesis WavLM layer (ref ddsp_matcher.py:88)
