"""Training-stack tests on the virtual 8-device CPU mesh: sharded kNN parity,
DP GAN train step, prematch extractor -> dataset -> train step round trip."""

import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from knnsvc_tpu.config import HiFiGANConfig, ModelFamily, WavLMConfig
from knnsvc_tpu.match.knn import knn_topk
from knnsvc_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from knnsvc_tpu.parallel.sharded_knn import shard_pool, sharded_knn_topk

TINY_H = dict(
    upsample_initial_channel=32,
    n_harmonic=4,
    hubert_dim=16,
    hifi_dim=16,
    segment_size=1280,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3, 5),),
    batch_size=2,
)


def test_sharded_knn_matches_single_device():
    rng = np.random.default_rng(0)
    pool = rng.standard_normal((333, 32)).astype(np.float32)
    query = rng.standard_normal((17, 32)).astype(np.float32)

    mesh = make_mesh(n_data=1, n_pool=8)
    pool_sharded, true_len = shard_pool(pool, mesh)
    idx_s, vals_s = sharded_knn_topk(jnp.asarray(query), pool_sharded,
                                     jnp.int32(true_len), mesh, k=16)
    idx_1, vals_1 = knn_topk(jnp.asarray(query), jnp.asarray(pool), k=16)

    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_1))
    np.testing.assert_allclose(np.asarray(vals_s), np.asarray(vals_1), atol=1e-5)


def test_sharded_knn_never_selects_padding():
    rng = np.random.default_rng(1)
    pool = rng.standard_normal((13, 8)).astype(np.float32)  # 13 % 8 != 0
    query = rng.standard_normal((5, 8)).astype(np.float32)
    mesh = make_mesh(n_data=1, n_pool=8)
    pool_sharded, true_len = shard_pool(pool, mesh)
    idx, vals = sharded_knn_topk(jnp.asarray(query), pool_sharded,
                                 jnp.int32(true_len), mesh, k=4)
    assert int(jnp.max(idx)) < 13
    assert np.all(np.isfinite(np.asarray(vals)))


@pytest.fixture(scope="module")
def tiny_train_setup():
    from knnsvc_tpu.train.trainer import init_train_state, make_optimizers, make_train_step

    h = HiFiGANConfig.from_dict(TINY_H)
    family = ModelFamily.MIX
    opt_g, opt_d = make_optimizers(h)
    state = init_train_state(jax.random.PRNGKey(0), h, family, disc_width_scale=8)
    step = make_train_step(h, family, opt_g, opt_d)
    return h, family, state, step


def _tiny_batch(h, B, seed=0):
    rng = np.random.default_rng(seed)
    T = h.segment_size // h.hop_size
    n_mel_frames = (h.segment_size + (h.n_fft - h.hop_size) - h.n_fft) // h.hop_size + 1
    return {
        "feats": jnp.asarray(rng.standard_normal((B, T, h.hubert_dim)).astype(np.float32)),
        "audio": jnp.asarray((rng.standard_normal((B, h.segment_size)) * 0.1).astype(np.float32)),
        "mel_loss": jnp.full((B, h.num_mels, n_mel_frames), -5.0, dtype=jnp.float32),
        "f0": jnp.asarray((rng.random((B, T, 1)) * 200).astype(np.float32)),
        "harmonics": jnp.asarray((rng.random((B, T, 49)) * 0.05).astype(np.float32)),
    }


def test_train_step_dp_runs_and_learns(tiny_train_setup):
    h, family, state, step = tiny_train_setup
    mesh = make_mesh(n_data=2, n_pool=1)
    state = jax.device_put(state, replicated(mesh))
    batch = {k: jax.device_put(v, data_sharding(mesh)) for k, v in _tiny_batch(h, 2).items()}

    state1, m1 = step(state, batch)
    state2, m2 = step(state1, batch)
    assert int(state2.steps) == 2
    for v in m1.values():
        assert np.isfinite(float(v))
    # parameters actually move
    d0 = jax.tree.leaves(state.g_params)[0]
    d2 = jax.tree.leaves(state2.g_params)[0]
    assert float(jnp.max(jnp.abs(d0 - d2))) > 0

    # same batch, discriminator loss should change after updates
    assert float(m1["loss_disc_total"]) != float(m2["loss_disc_total"])


def test_train_step_dp_matches_single_device(tiny_train_setup):
    """DP over 2 devices == single device on the same global batch (the psum
    grad average must equal the full-batch gradient)."""
    h, family, state, step = tiny_train_setup
    batch = _tiny_batch(h, 2, seed=3)

    mesh1 = make_mesh(n_data=1, n_pool=1)
    s1 = jax.device_put(state, replicated(mesh1))
    b1 = {k: jax.device_put(v, data_sharding(mesh1)) for k, v in batch.items()}
    out1, m1 = step(s1, b1)

    mesh2 = make_mesh(n_data=2, n_pool=1)
    s2 = jax.device_put(state, replicated(mesh2))
    b2 = {k: jax.device_put(v, data_sharding(mesh2)) for k, v in batch.items()}
    out2, m2 = step(s2, b2)

    np.testing.assert_allclose(float(m1["loss_gen_total"]), float(m2["loss_gen_total"]), rtol=1e-4)
    a = jax.tree.leaves(out1.g_params)[0]
    b = jax.tree.leaves(out2.g_params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_prematch_dataset_roundtrip(tmp_path):
    """prematch extractor output feeds the MelDataset and a train step."""
    from knnsvc_tpu.io.audio import save_audio
    from knnsvc_tpu.models.wavlm import init_wavlm_params
    from knnsvc_tpu.train.dataset import MelDataset, batch_iterator
    from knnsvc_tpu.train.prematch import per_spk_extract
    from knnsvc_tpu.utils.layer_weights import generate_matrix_from_index

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

    # 1 speaker, 2 utterances
    data = tmp_path / "data" / "spk0"
    data.mkdir(parents=True)
    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000
    for i, f in enumerate((200.0, 240.0)):
        wav = (0.3 * np.sin(2 * np.pi * f * t) + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
        save_audio(data / f"utt{i}.wav", wav, 16000)

    out = tmp_path / "cached"
    per_spk_extract(tmp_path / "data", out, params, cfg, w, w)

    # extractor artifacts exist and have reference-compatible keys
    assert (out / "spk0" / "pool.npy").exists()
    assert (out / "spk0" / "pool_harmonics.npy").exists()
    with open(out / "spk0" / "utt0.pt", "rb") as fh:
        fd = pickle.load(fh)
    for key in ("slice", "nearest_nbrs", "nearest_nbrs_f0_priority",
                "harmonics_best_weight_para", "amp_ratio", "f0"):
        assert key in fd, key
    assert fd["nearest_nbrs"].shape[1] == 32
    # own-utterance frames must be masked out of the self-kNN
    s, e = fd["slice"]
    assert not np.any((fd["nearest_nbrs"] >= s) & (fd["nearest_nbrs"] < e))

    h = HiFiGANConfig.from_dict({**TINY_H, "hubert_dim": 16, "segment_size": 1280})
    ds = MelDataset(h, tmp_path / "data", out, split=True)
    assert len(ds) == 2
    item = ds[0]
    T = h.segment_size // h.hop_size
    assert item["feats"].shape == (T, 16)
    assert item["audio"].shape == (h.segment_size,)
    assert item["f0"].shape == (T, 1)
    assert item["harmonics"].shape == (T, 49)

    batches = list(batch_iterator(ds, batch_size=2, shuffle=True))
    assert len(batches) == 1
    assert batches[0]["feats"].shape == (2, T, 16)

    # feed a real train step
    from knnsvc_tpu.train.trainer import init_train_state, make_optimizers, make_train_step

    opt_g, opt_d = make_optimizers(h)
    state = init_train_state(jax.random.PRNGKey(1), h, ModelFamily.MIX, disc_width_scale=8)
    step = make_train_step(h, ModelFamily.MIX, opt_g, opt_d)
    arrays = {k: jnp.asarray(batches[0][k]) for k in ("feats", "audio", "mel_loss", "f0", "harmonics")}
    state, metrics = step(state, arrays)
    assert np.isfinite(float(metrics["loss_gen_total"]))


def test_eval_step(tiny_train_setup):
    from knnsvc_tpu.train.trainer import eval_step

    h, family, state, step = tiny_train_setup
    batch = _tiny_batch(h, 1, seed=5)
    err, y_hat = eval_step(state.g_params, h, family, batch)
    assert np.isfinite(float(err))
    assert y_hat.shape == (1, 1, h.segment_size)


def test_eval_step_padded_matches_eval_step(tiny_train_setup):
    """Bucket-padded masked validation == exact per-length validation."""
    from knnsvc_tpu.train.trainer import eval_bucket, eval_step, eval_step_padded

    h, family, state, _ = tiny_train_setup
    batch = _tiny_batch(h, 1, seed=7)
    item = {k: np.asarray(v[0]) for k, v in batch.items()}
    T = item["feats"].shape[0]
    exact, _ = eval_step(state.g_params, h, family,
                         {k: jnp.asarray(v)[None] for k, v in item.items()})

    Tb = eval_bucket(T, bucket=T + 8)  # force nontrivial padding

    def fit(a, n, axis=0):
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(0, n)
        a = a[tuple(sl)]
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, n - a.shape[axis])
        return np.pad(a, widths)

    padded = {
        "feats": jnp.asarray(fit(item["feats"], Tb))[None],
        "audio": jnp.asarray(fit(item["audio"], Tb * h.hop_size))[None],
        "mel_loss": jnp.asarray(fit(item["mel_loss"], Tb + 1, axis=-1))[None],
        "f0": jnp.asarray(fit(item["f0"], Tb))[None],
        "harmonics": jnp.asarray(fit(item["harmonics"], Tb))[None],
    }
    mel_true = item["mel_loss"].shape[-1]
    masked, y_hat = eval_step_padded(state.g_params, h, family, padded,
                                     jnp.int32(mel_true))
    # identical on the true frames: zero-padded features produce the same
    # prefix through the convolutional generator up to edge effects of the
    # receptive field; the masked mean must agree closely
    assert np.isfinite(float(masked))
    np.testing.assert_allclose(float(masked), float(exact), rtol=0.15)


class _FakeMelDataset:
    """Minimal batch_iterator input: deterministic items, optional poison."""

    def __init__(self, n: int, poison: int | None = None):
        self.n, self.poison = n, poison

    def __len__(self):
        return self.n

    def __getitem__(self, i: int):
        if i == self.poison:
            raise ValueError(f"poisoned item {i}")
        base = np.full((4, 3), float(i), np.float32)
        return {"feats": base, "audio": np.full(8, float(i), np.float32),
                "mel_loss": base, "f0": base[:, :1], "harmonics": base,
                "path": f"utt{i}"}


def test_batch_iterator_deterministic_across_workers():
    """Same seed -> identical batch stream for any num_workers/prefetch
    (ordered assembly; the thread pool must not reorder results)."""
    from knnsvc_tpu.train.dataset import batch_iterator

    ds = _FakeMelDataset(13)
    ref = list(batch_iterator(ds, 3, seed=5, num_workers=1, prefetch=1))
    assert len(ref) == 4  # drop_last
    for workers, prefetch in ((4, 2), (8, 3)):
        got = list(batch_iterator(ds, 3, seed=5, num_workers=workers,
                                  prefetch=prefetch))
        assert [b["paths"] for b in got] == [b["paths"] for b in ref]
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(a["feats"], b["feats"])


def test_batch_iterator_propagates_worker_exception():
    from knnsvc_tpu.train.dataset import batch_iterator

    ds = _FakeMelDataset(8, poison=5)
    with pytest.raises(ValueError, match="poisoned item 5"):
        list(batch_iterator(ds, 2, shuffle=False, num_workers=4))
