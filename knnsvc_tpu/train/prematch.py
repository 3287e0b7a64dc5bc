"""Offline prematch feature extraction (training data prep).

Equivalent of the reference's `per_spk_extract` + CLI main
(ddsp_prematch_dataset.py:1464-1812): for every speaker (= audio-containing
leaf folder), build the six pools, save the concatenated synth pool
(`pool.npy`, rounded through fp16 like ref :1510) and harmonics pool
(`pool_harmonics.npy`), then for each utterance compute the self-speaker
kNN (k=32) with the utterance's own slice masked out (distance forced to 1,
ref :1623-1624), the f0-priority re-sort, the spec-L1 amplitude ratio
(ref :1672-1675) and the amp-weighted smoothness weights (ref :1681), and
pickle a per-utterance `.pt` dict {slice, nearest_nbrs,
nearest_nbrs_f0_priority, harmonics_best_weight_para, amp_ratio} with
merge-into-existing semantics (ref :1581-1593).

The pickle layout is byte-compatible with the reference's so prematched data
prepared by either implementation is interchangeable. We additionally store
"f0" — the reference's validation dataset reads feat_dict["f0"]
(hifigan/ddsp_meldataset.py:538) but its extractor never writes it
(commented out at ref :1766), which breaks reference validation; storing it
fixes that (documented divergence).
"""

from __future__ import annotations

import os
import pickle
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from knnsvc_tpu.config import WavLMConfig
from knnsvc_tpu.match.f0_logic import sort_by_f0_compatibility
from knnsvc_tpu.match.knn import knn_topk
from knnsvc_tpu.match.pool import build_speaker_pool
from knnsvc_tpu.match.smoothness import HARMONICS_LOSS_SCALE, optimize_smoothness_weights
from knnsvc_tpu.match.distance import cosine_distance

KNN_CANDIDATES = 32
TOPK = 4


def find_speaker_folders(root: str | Path) -> list[Path]:
    """Audio-containing leaf folders (ref :1467-1473)."""
    root = Path(root)
    audio_files = list(root.glob("**/*.wav")) + list(root.glob("**/*.flac"))
    return sorted(set(f.parent for f in audio_files))


def self_knn_with_mask(matching_pool_j, start: int, end: int, query) -> np.ndarray:
    """kNN of `query` rows against the full pool with [start, end) masked to
    distance 1 (the utterance's own frames — ref :1612-1635)."""
    import jax

    dists = cosine_distance(jnp.asarray(query), matching_pool_j)
    P = matching_pool_j.shape[0]
    own = (jnp.arange(P) >= start) & (jnp.arange(P) < end)
    dists = jnp.where(own[None, :], 1.0, dists)
    _, idx = jax.lax.top_k(-dists, KNN_CANDIDATES)
    return np.asarray(idx, dtype=np.int64)


def per_spk_extract(
    dataset_root: str | Path,
    out_path: str | Path,
    wavlm_params,
    wavlm_cfg: WavLMConfig,
    match_weights: np.ndarray,
    synth_weights: np.ndarray,
    save_pool_only: bool = False,
    topk: int = TOPK,
) -> None:
    dataset_root = Path(dataset_root)
    out_path = Path(out_path)

    for i, spk_folder in enumerate(find_speaker_folders(dataset_root)):
        pool = build_speaker_pool(
            spk_folder, wavlm_params, wavlm_cfg, match_weights, synth_weights
        )
        # fp16 rounding quirk baked into reference training pools (ref :1510)
        synth_list = pool.synth.astype(np.float16).astype(np.float32)
        matching_list = pool.matching.astype(np.float16).astype(np.float32)
        harmonics_list = pool.harmonics
        spec_list = pool.spec
        f0_list = pool.f0
        starts = pool.utterance_start_indices

        spk_cache_folder = out_path / spk_folder.relative_to(dataset_root)
        os.makedirs(spk_cache_folder, exist_ok=True)
        np.save(spk_cache_folder / "pool.npy", synth_list)
        np.save(spk_cache_folder / "pool_harmonics.npy", harmonics_list)
        if save_pool_only:
            np.save(spk_cache_folder / "pool_f0.npy", f0_list)
            np.save(spk_cache_folder / "pool_spec.npy", spec_list)

        matching_j = jnp.asarray(matching_list)
        harmonics_j = jnp.asarray(harmonics_list)
        f0_j = jnp.asarray(f0_list)

        for k, (item, utt) in enumerate(pool.utterances.items()):
            start, end = starts[k], starts[k + 1]
            target_feature_path = (out_path / Path(item).relative_to(dataset_root)).with_suffix(".pt")
            os.makedirs(target_feature_path.parent, exist_ok=True)

            if target_feature_path.is_file():
                with open(target_feature_path, "rb") as fh:
                    existing = pickle.load(fh)
                assert tuple(existing["slice"]) == (start, end)
            else:
                existing = {"slice": (start, end)}

            if save_pool_only:
                with open(target_feature_path, "wb") as fh:
                    pickle.dump(existing, fh, protocol=pickle.HIGHEST_PROTOCOL)
                continue

            query = matching_list[start:end]
            nearest_nbrs = self_knn_with_mask(matching_j, start, end, query)
            nbrs_f0 = np.asarray(sort_by_f0_compatibility(
                jnp.asarray(utt.f0), f0_j, jnp.asarray(nearest_nbrs.astype(np.int32))
            ), dtype=np.int64)

            target_idx = nbrs_f0[:, :topk]
            # amp_ratio: per-frame L1 spec of the original over each selected
            # neighbor's L1 spec (ref :1672-1675)
            orig_l1 = np.abs(utt.spec).sum(axis=1)                      # (T,)
            knn_l1 = np.abs(spec_list[target_idx]).sum(axis=-1)          # (T, k)
            amp_ratio = (orig_l1[:, None] / (knn_l1 + 1e-5)).astype(np.float32)

            weights = np.asarray(optimize_smoothness_weights(
                jnp.asarray(target_idx.astype(np.int32)), harmonics_j,
                scale=HARMONICS_LOSS_SCALE, amp_ratio=jnp.asarray(amp_ratio),
            ))

            existing["nearest_nbrs"] = nearest_nbrs
            existing["nearest_nbrs_f0_priority"] = nbrs_f0
            existing["harmonics_best_weight_para"] = weights
            existing["amp_ratio"] = amp_ratio
            existing["f0"] = utt.f0  # fixes the reference's broken validation load
            existing.pop("best_weights", None)

            with open(target_feature_path, "wb") as fh:
                pickle.dump(existing, fh, protocol=pickle.HIGHEST_PROTOCOL)

        print(f"[prematch] {i}: {spk_folder}", flush=True)
