"""Speech-translation slice tests: log-mel frontend, speech dataset,
CoLaCTC labels, transformer_afs train/score/decode + CTC loss."""

import os
import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zero_tpu.models  # noqa: F401
from zero_tpu.audio import (SpeechDataset, coarse_labels, load_features,
                            logmel, mel_filterbank)
from zero_tpu.models.base import get_model
from zero_tpu.search import beam_search
from tests.helpers import tiny_config, tiny_vocab


def test_logmel_shapes_and_energy():
    rs = np.random.RandomState(0)
    wav = rs.randn(16000).astype(np.float32)  # 1 second
    feats = logmel(wav, 16000, num_mels=40)
    # 25ms window / 10ms shift -> ~98 frames
    assert feats.shape[1] == 40
    assert 95 <= feats.shape[0] <= 100
    # louder signal -> larger log energy
    feats_loud = logmel(10 * wav, 16000, num_mels=40)
    assert feats_loud.mean() > feats.mean()


def test_mel_filterbank_covers_spectrum():
    fb = mel_filterbank(40, 512, 16000)
    assert fb.shape == (257, 40)
    assert (fb >= 0).all()
    assert fb.sum() > 0


def test_wav_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    wav = (rs.randn(8000) * 3000).astype(np.int16)
    path = tmp_path / "x.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(wav.tobytes())
    feats = load_features(str(path), num_mels=24)
    assert feats.shape[1] == 24


def test_coarse_labels_modulo():
    assert coarse_labels([0, 1, 2], 4) == [0, 1, 2]  # specials pass
    assert coarse_labels([3, 4, 5, 6, 7], 4) == [3, 4, 5, 6, 3]
    # ids map into [3, 3+base)
    out = coarse_labels(list(range(3, 50)), 7)
    assert min(out) >= 3 and max(out) < 10


@pytest.fixture(scope="module")
def speech_manifest(tmp_path_factory):
    root = tmp_path_factory.mktemp("speech")
    rs = np.random.RandomState(0)
    lines = []
    for i in range(8):
        t = rs.randint(20, 60)
        feats = rs.randn(t, 20).astype(np.float32)
        path = root / ("utt%d.npy" % i)
        np.save(path, feats)
        transcript = " ".join(rs.choice(["w%d" % j for j in range(10)],
                                        rs.randint(2, 6)))
        translation = " ".join(rs.choice(["w%d" % j for j in range(10)],
                                         rs.randint(2, 6)))
        lines.append("%s\t%s\t%s" % (path.name, transcript, translation))
    manifest = root / "manifest.tsv"
    manifest.write_text("\n".join(lines) + "\n")
    return manifest


def _speech_cfg(**over):
    cfg = tiny_config(model_name="transformer_afs",
                      audio_num_mel_bins=20,
                      audio_frame_stride=2,
                      num_st_encoder_layer=1,
                      num_encoder_layer=1,
                      num_decoder_layer=1,
                      ctc_enable=True,
                      ctc_alpha=0.3,
                      max_frame_len=64,
                      data_kind="speech")
    for k, v in over.items():
        setattr(cfg, k, v)
    return cfg


def test_speech_dataset_batches(speech_manifest):
    cfg = _speech_cfg()
    ds = SpeechDataset(str(speech_manifest), cfg.src_vocab, cfg.tgt_vocab,
                       batch_or_token="batch", num_mels=20,
                       pad_seq_multiple=8)
    batches = list(ds.batcher(4, buffer_size=16, shuffle=False, train=False))
    total = sum(len(b["raw"]) for b in batches)
    assert total == 8
    b = batches[0]
    assert b["src"].ndim == 3 and b["src"].shape[2] == 20
    assert b["src_mask"].shape == b["src"].shape[:2]
    assert (b["src_mask"].sum(1) > 0).all()
    assert b["transcript"].dtype == np.int32


def _speech_features(speech_manifest, cfg, n=4):
    ds = SpeechDataset(str(speech_manifest), cfg.src_vocab, cfg.tgt_vocab,
                       batch_or_token="batch", num_mels=20,
                       pad_seq_multiple=8)
    batch = next(ds.batcher(n, buffer_size=16, shuffle=False, train=False))
    return {"audio": jnp.asarray(batch["src"]),
            "audio_mask": jnp.asarray(batch["src_mask"]),
            "target": jnp.asarray(batch["tgt"]),
            "transcript": jnp.asarray(batch["transcript"])}


@pytest.mark.parametrize("afs_mode", ["t", "tf"])
def test_afs_train_loss_finite(speech_manifest, afs_mode):
    cfg = _speech_cfg(afs_mode=afs_mode)
    model = get_model("transformer_afs")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = _speech_features(speech_manifest, cfg)
    out = model.train_fn(params, feats, cfg, jax.random.PRNGKey(1), step=100)
    assert np.isfinite(float(out["loss"]))
    # CTC adds loss mass
    cfg2 = _speech_cfg(afs_mode=afs_mode, ctc_enable=False)
    params2 = model.init_fn(jax.random.PRNGKey(0), cfg2)
    out2 = model.train_fn(params2, feats, cfg2, jax.random.PRNGKey(1),
                          step=100)
    assert float(out["loss"]) != float(out2["loss"])


def test_afs_score(speech_manifest):
    cfg = _speech_cfg()
    model = get_model("transformer_afs")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = _speech_features(speech_manifest, cfg)
    score = model.score_fn(params, feats, cfg)["score"]
    assert score.shape[0] == feats["target"].shape[0]
    assert np.isfinite(np.asarray(score)).all()


def test_afs_cache_decode_equals_dev(speech_manifest):
    cfg = _speech_cfg()
    model = get_model("transformer_afs")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = _speech_features(speech_manifest, cfg, n=2)
    source = {"audio": feats["audio"][:2], "mask": feats["audio_mask"][:2]}
    out_c = beam_search(params, source, model.infer_fn(cfg), cfg)
    cfg_dev = _speech_cfg(search_mode="dev")
    out_d = beam_search(params, source, model.infer_fn(cfg_dev), cfg_dev)
    np.testing.assert_array_equal(np.asarray(out_c["seq"]),
                                  np.asarray(out_d["seq"]))
