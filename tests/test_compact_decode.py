"""Static-k compacted decode tests (L0Drop/AFS): the compacted
count-softmax path must equal the full-length zero-vector path whenever
k covers the survivors, across mixed drop patterns."""

import jax
import jax.numpy as jnp
import numpy as np

import zero_tpu.models  # noqa: F401
from zero_tpu.models.base import get_model
from zero_tpu.models.transformer_l0drop import compact_encodings
from zero_tpu.search import beam_search
from tests.helpers import tiny_config, toy_batch


def _mixed_drop_params(cfg):
    """l0drop params whose gates drop roughly half the positions."""
    model = get_model("transformer_l0drop")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    # centre log-alpha near the hard-concrete zero threshold so the
    # input-dependent spread puts some positions on each side
    params["source_pruning"]["ws"][0] = \
        params["source_pruning"]["ws"][0] * 40.0
    params["source_pruning"]["b"] = params["source_pruning"]["b"] - 2.4
    return model, params


def test_compact_encodings_shapes_and_counts():
    B, S, D = 2, 6, 4
    rs = np.random.RandomState(0)
    enc = jnp.asarray(rs.randn(B, S, D).astype(np.float32))
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], jnp.float32)
    score = jnp.asarray([[0.9, 0.0, 0.5, 0.0, 0.3, 0.2],
                         [0.1, 0.2, 0.3, 0.4, 0.5, 0.6]], jnp.float32)
    mem, new_mask, count = compact_encodings(enc, mask, score, ratio=0.5)
    assert mem.shape == (B, 4, D)
    # row 0: survivors at 0,2 (score>0 within mask); dropped = 2
    assert float(count[0, 0]) == 2.0
    assert float(new_mask[0, 0]) == 1.0  # pad slot active
    np.testing.assert_allclose(np.asarray(mem[0, 0]), 0.0)  # zero pad slot
    # row 1: all six valid, only 3 kept -> 3 fold into the pad slot
    assert float(count[1, 0]) == 3.0


def test_l0drop_compact_scores_match_full():
    """Teacher-forced scores: compacted (ratio=1 -> k covers everything)
    == full-length zero-vector path, with a mixed drop pattern."""
    cfg_full = tiny_config(model_name="transformer_l0drop",
                           l0_compact_ratio=0.0)
    cfg_comp = tiny_config(model_name="transformer_l0drop",
                           l0_compact_ratio=1.0)
    model, params = _mixed_drop_params(cfg_full)
    feats = {k: jnp.asarray(v) for k, v in toy_batch().items()}
    s_full = np.asarray(model.score_fn(params, feats, cfg_full)["score"])
    s_comp = np.asarray(model.score_fn(params, feats, cfg_comp)["score"])
    np.testing.assert_allclose(s_comp, s_full, rtol=1e-4, atol=1e-4)


def test_l0drop_compact_beam_matches_full():
    cfg_full = tiny_config(model_name="transformer_l0drop",
                           l0_compact_ratio=0.0)
    cfg_comp = tiny_config(model_name="transformer_l0drop",
                           l0_compact_ratio=1.0)
    model, params = _mixed_drop_params(cfg_full)
    src = jnp.asarray(toy_batch(batch=2)["source"])
    out_full = beam_search(params, src, model.infer_fn(cfg_full), cfg_full)
    out_comp = beam_search(params, src, model.infer_fn(cfg_comp), cfg_comp)
    np.testing.assert_array_equal(np.asarray(out_full["seq"]),
                                  np.asarray(out_comp["seq"]))


def test_l0drop_compact_cache_equals_dev():
    cfg = tiny_config(model_name="transformer_l0drop", l0_compact_ratio=0.6)
    model, params = _mixed_drop_params(cfg)
    src = jnp.asarray(toy_batch(batch=2)["source"])
    out_c = beam_search(params, src, model.infer_fn(cfg), cfg)
    cfg_dev = tiny_config(model_name="transformer_l0drop",
                          l0_compact_ratio=0.6, search_mode="dev")
    out_d = beam_search(params, src, model.infer_fn(cfg_dev), cfg_dev)
    np.testing.assert_array_equal(np.asarray(out_c["seq"]),
                                  np.asarray(out_d["seq"]))


def _afs_cfg(**over):
    return tiny_config(model_name="transformer_afs", audio_num_mel_bins=8,
                       audio_frame_stride=1, num_st_encoder_layer=1,
                       num_encoder_layer=1, num_decoder_layer=1,
                       ctc_enable=False, **over)


def test_afs_compact_runs_and_matches_at_init():
    """At init no AFS gate is exactly zero, so ratio=1 compaction is a
    no-drop reshuffle: scores must match the full path."""
    cfg_full = _afs_cfg(l0_compact_ratio=0.0)
    cfg_comp = _afs_cfg(l0_compact_ratio=1.0)
    model = get_model("transformer_afs")
    params = model.init_fn(jax.random.PRNGKey(0), cfg_full)
    rs = np.random.RandomState(0)
    feats = {"audio": jnp.asarray(rs.randn(2, 12, 8).astype(np.float32)),
             "audio_mask": jnp.asarray((np.arange(12)[None, :]
                                        < np.array([[9], [12]]))
                                       .astype(np.float32)),
             "target": jnp.asarray(toy_batch(batch=2)["target"])}
    s_full = np.asarray(model.score_fn(params, feats, cfg_full)["score"])
    s_comp = np.asarray(model.score_fn(params, feats, cfg_comp)["score"])
    np.testing.assert_allclose(s_comp, s_full, rtol=1e-4, atol=1e-4)
    # and beam decode under compaction passes the cache==dev oracle
    source = {"audio": feats["audio"], "mask": feats["audio_mask"]}
    cfg_half = _afs_cfg(l0_compact_ratio=0.6)
    out_c = beam_search(params, source, model.infer_fn(cfg_half), cfg_half)
    cfg_dev = _afs_cfg(l0_compact_ratio=0.6, search_mode="dev")
    out_d = beam_search(params, source, model.infer_fn(cfg_dev), cfg_dev)
    np.testing.assert_array_equal(np.asarray(out_c["seq"]),
                                  np.asarray(out_d["seq"]))
