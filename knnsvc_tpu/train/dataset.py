"""Training dataset for vocoder fine-tuning on prematched features.

Equivalent of the reference MelDataset (hifigan/ddsp_meldataset.py:332-593),
fine-tuning mode (the only mode the reference allows — asserts at ref
:434,451):

- pairs the audio tree with the prematch feature tree by relative path
  (ref :340-389);
- item: features = mean of pool.npy[nearest_nbrs[:, :4]] (mmap, ref :482),
  harmonics = pool_harmonics[nearest_nbrs_f0_priority[:, :4]] with ONE
  randomly chosen candidate times its amp_ratio (ref :498-499);
- random segment crop of segment_size samples / ceil(seg/hop) frames
  (ref :512-518); f0 extracted on the crop (ref :524-532, pyworld harvest
  there, Harvest-port/YIN here); mel_loss = log-mel of the crop;
- validation (split=False): full utterances, f0 loaded from the prematch
  pickle (works because our extractor stores "f0"; the reference's does not
  — ref :1766 vs :538), priority utterances first (ref :358-376).

The loader yields numpy batch dicts ready for the jitted DP train step;
a background thread prefetches while the TPU runs.
"""

from __future__ import annotations

import math
import os
import pickle
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

from knnsvc_tpu import HOP_LENGTH
from knnsvc_tpu.config import HiFiGANConfig
from knnsvc_tpu.dsp.f0 import get_f0
from knnsvc_tpu.io.audio import load_audio, to_mono

TOPK = 4


class MelDataset:
    def __init__(
        self,
        h: HiFiGANConfig,
        audio_root_path: str | Path,
        feat_root_path: str | Path,
        split: bool = True,
        shuffle: bool = True,
        seed: int = 1234,
        priority_substrings: tuple[str, ...] = ("Cantoria_EJB2_S_resampled_16000.pt",),
    ):
        self.h = h
        self.split = split
        self.segment_size = h.segment_size
        self.frames_per_seg = math.ceil(h.segment_size / h.hop_size)
        self.audio_root = Path(audio_root_path)
        self.feat_root = Path(feat_root_path)

        # pair by relative stem path (extension-grouped positional pairing
        # silently mis-pairs mixed .flac/.wav datasets against the globally
        # sorted feature list)
        audio_paths = sorted(
            (os.path.relpath(p, self.audio_root)
             for ext in (".flac", ".wav")
             for p in self.audio_root.rglob("*" + ext)),
            key=lambda rp: os.path.splitext(rp)[0],
        )
        assert audio_paths, f"no audio under {self.audio_root}"
        feat_paths = sorted(
            (os.path.relpath(p, self.feat_root) for p in self.feat_root.rglob("*.pt")),
            key=lambda rp: os.path.splitext(rp)[0],
        )
        assert [os.path.splitext(a)[0] for a in audio_paths] == \
               [os.path.splitext(f)[0] for f in feat_paths], \
            "audio and feature trees must mirror each other by relative path"

        if not split and priority_substrings:
            # force the reference's pinned validation utterance(s) first (ref :358-376)
            def is_priority(fp):
                return any(s in fp for s in priority_substrings)

            order = sorted(range(len(feat_paths)), key=lambda i: (not is_priority(feat_paths[i]), i))
            feat_paths = [feat_paths[i] for i in order]
            audio_paths = [audio_paths[i] for i in order]

        assert len(audio_paths) == len(feat_paths), (len(audio_paths), len(feat_paths))
        for a, f in zip(audio_paths, feat_paths):
            stem_a = os.path.basename(a).rsplit(".", 1)[0]
            stem_f = os.path.basename(f).rsplit(".", 1)[0]
            assert stem_a == stem_f, (a, f)
        self.rows = list(zip(audio_paths, feat_paths))
        if shuffle:
            rng = np.random.default_rng(seed)
            rng.shuffle(self.rows)
        self._rng = np.random.default_rng(seed)
        self._pool_cache: dict[Path, tuple[np.memmap, np.memmap]] = {}

    def __len__(self) -> int:
        return len(self.rows)

    def _pools(self, feat_path: Path):
        folder = feat_path.parent
        if folder not in self._pool_cache:
            self._pool_cache[folder] = (
                np.load(folder / "pool.npy", mmap_mode="r"),
                np.load(folder / "pool_harmonics.npy", mmap_mode="r"),
            )
        return self._pool_cache[folder]

    def __getitem__(self, index: int) -> dict[str, np.ndarray]:
        audio_rel, feat_rel = self.rows[index]
        x, sr = load_audio(self.audio_root / audio_rel)
        assert sr == self.h.sampling_rate, (sr, self.h.sampling_rate)
        audio = to_mono(x)[0].astype(np.float32)

        feat_path = self.feat_root / feat_rel
        with open(feat_path, "rb") as fh:
            fd = pickle.load(fh)
        nearest_nbrs = np.asarray(fd["nearest_nbrs"])
        nbrs_f0 = np.asarray(fd["nearest_nbrs_f0_priority"])
        amp_ratio = np.asarray(fd["amp_ratio"], dtype=np.float32)

        pool, pool_harm = self._pools(feat_path)
        feats = np.asarray(pool[nearest_nbrs[:, :TOPK]]).mean(axis=1)        # (T, 1024)
        harm_cands = np.asarray(pool_harm[nbrs_f0[:, :TOPK]])                # (T, k, 49)
        pick = self._rng.integers(0, harm_cands.shape[1], size=len(harm_cands))
        ar = np.arange(len(harm_cands))
        harmonics = harm_cands[ar, pick] * amp_ratio[ar, pick][:, None]      # (T, 49)

        if self.split:
            fps = self.frames_per_seg
            if audio.shape[0] >= self.segment_size and feats.shape[0] > fps + 1:
                start = int(self._rng.integers(0, feats.shape[0] - fps - 1))
            else:
                start = 0
            feats = feats[start : start + fps]
            harmonics = harmonics[start : start + fps]
            audio = audio[start * HOP_LENGTH : (start + fps) * HOP_LENGTH]
            if feats.shape[0] < fps:  # short utterance: pad
                pad_f = fps - feats.shape[0]
                feats = np.pad(feats, ((0, pad_f), (0, 0)))
                harmonics = np.pad(harmonics, ((0, pad_f), (0, 0)))
                audio = np.pad(audio, (0, self.segment_size - audio.shape[0]))
            f0 = get_f0(audio, self.h.sampling_rate, audio_path=None,
                        use_sidecar=False, write_sidecar=False)
        else:
            f0 = np.asarray(fd["f0"], dtype=np.float32)

        T = feats.shape[0]
        f0 = np.asarray(f0[:T], dtype=np.float32)
        if len(f0) < T:
            f0 = np.pad(f0, (0, T - len(f0)))

        from knnsvc_tpu.dsp.stft import log_mel_spectrogram
        import jax.numpy as jnp

        mel_loss = np.asarray(log_mel_spectrogram(
            jnp.asarray(audio)[None], n_fft=self.h.n_fft, num_mels=self.h.num_mels,
            sampling_rate=self.h.sampling_rate, hop_size=self.h.hop_size,
            win_size=self.h.win_size, fmin=self.h.fmin, fmax=self.h.fmax,
        ))[0]

        return {
            "feats": feats.astype(np.float32),
            "audio": audio.astype(np.float32),
            "mel_loss": mel_loss.astype(np.float32),
            "f0": f0[:, None],
            "harmonics": harmonics.astype(np.float32),
            "path": str(audio_rel),
        }


def batch_iterator(dataset: MelDataset, batch_size: int, shuffle: bool = True,
                   seed: int = 0, drop_last: bool = True, prefetch: int = 2,
                   num_workers: int = 4):
    """Yield stacked numpy batches with multi-worker background prefetch (the
    reference's DataLoader(num_workers=12) — ref ddsp_train.py:52-56).

    The reference parallelizes item loading with worker *processes*; here the
    per-item hot work (mmap reads, native f0 extraction via a ctypes call,
    XLA-executed mel) releases the GIL, so a thread pool gives the same
    parallelism without process-spawn or pickling costs. `prefetch` batches
    are kept in flight (`prefetch * batch_size` item futures); batches are
    assembled and yielded strictly in submission order, so results are
    deterministic for a fixed seed regardless of num_workers. Worker
    exceptions re-raise at the consuming `f.result()`."""
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    n_batches = len(order) // batch_size if drop_last else math.ceil(len(order) / batch_size)

    pool = ThreadPoolExecutor(max_workers=max(1, num_workers),
                              thread_name_prefix="melds")
    pending: deque = deque()

    def submit(b: int) -> None:
        idx = order[b * batch_size : (b + 1) * batch_size]
        pending.append([pool.submit(dataset.__getitem__, int(i)) for i in idx])

    try:
        next_b = min(prefetch, n_batches)
        for b in range(next_b):
            submit(b)
        while pending:
            futs = pending.popleft()
            items = [f.result() for f in futs]
            if next_b < n_batches:
                submit(next_b)
                next_b += 1
            batch = {
                k: np.stack([it[k] for it in items])
                for k in ("feats", "audio", "mel_loss", "f0", "harmonics")
            }
            batch["paths"] = [it["path"] for it in items]
            yield batch
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
