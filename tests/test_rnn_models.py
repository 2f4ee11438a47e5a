"""RNN family tests: cell zoo, scan drivers, and the three RNN seq2seq
models (train finiteness + cache-decode == dev-decode oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zero_tpu.models  # noqa: F401
from zero_tpu import rnns
from zero_tpu.models.base import get_model
from zero_tpu.search import beam_search
from tests.helpers import tiny_config, toy_batch

ALL_CELLS = ["gru", "lstm", "sru", "atr", "lrn", "olrn"]


@pytest.mark.parametrize("cell_name", ALL_CELLS)
def test_cell_shapes_and_mask_carry(cell_name):
    cell = rnns.get_cell(cell_name)
    key = jax.random.PRNGKey(0)
    B, L, E, D = 2, 6, 4, 8
    params = cell.init(key, E, D, False,
                       lambda k, s, d=jnp.float32: 0.1 * jax.random.normal(k, s, d))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, L, E))
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], jnp.float32)
    (outputs, last), (hid, hid_last) = rnns.rnn(cell, params, x, D, mask=mask)
    assert outputs.shape == (B, L, D * cell.state_mult)
    assert hid.shape == (B, L, D)
    # masked positions carry the previous state forward
    np.testing.assert_allclose(np.asarray(outputs[0, 3]),
                               np.asarray(outputs[0, 2]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(outputs[0, 5]),
                               np.asarray(outputs[0, 2]), atol=1e-6)


def test_rnn_step_equals_scan():
    """Single-step application reproduces the scan (decode-cache oracle)."""
    cell = rnns.get_cell("gru")
    key = jax.random.PRNGKey(0)
    B, L, E, D = 2, 5, 4, 8
    params = cell.init(key, E, D, False,
                       lambda k, s, d=jnp.float32: 0.1 * jax.random.normal(k, s, d))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, L, E))
    (outputs, _), _ = rnns.rnn(cell, params, x, D)
    h = rnns.zero_state(cell, B, D)
    for t in range(L):
        vs = cell.fetch(params, x[:, t:t + 1], False)
        vs = tuple(v[:, 0] for v in vs)
        h = cell.step(params, h, vs, False)
        np.testing.assert_allclose(np.asarray(h), np.asarray(outputs[:, t]),
                                   rtol=1e-5, atol=1e-5)


RNN_CONFIGS = [
    ("rnnsearch", dict(cell="gru", caencoder=True)),
    ("rnnsearch", dict(cell="lstm", caencoder=False)),
    ("rnnsearch", dict(cell="atr", caencoder=True, layer_norm=True)),
    ("deepnmt", dict(cell="gru", caencoder=False, use_deep_att=False)),
    ("deepnmt", dict(cell="gru", caencoder=True, use_deep_att=False)),
    ("deepnmt", dict(cell="lstm", caencoder=False, use_deep_att=True)),
    ("rnnsearch_deepatt", dict(cell="gru")),
]


@pytest.mark.parametrize("name,over", RNN_CONFIGS)
def test_rnn_model_train_and_decode_oracle(name, over):
    cfg = tiny_config(model_name=name, **over)
    model = get_model(name)
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = {k: jnp.asarray(v) for k, v in toy_batch().items()}

    loss = float(model.train_fn(params, feats, cfg,
                                jax.random.PRNGKey(1))["loss"])
    assert np.isfinite(loss) and loss > 0

    score = model.score_fn(params, feats, cfg)["score"]
    assert score.shape == (4,)

    src = feats["source"][:2]
    out_c = beam_search(params, src, model.infer_fn(cfg), cfg)
    cfg_dev = tiny_config(model_name=name, search_mode="dev", **over)
    out_d = beam_search(params, src, model.infer_fn(cfg_dev), cfg_dev)
    np.testing.assert_array_equal(np.asarray(out_c["seq"]),
                                  np.asarray(out_d["seq"]))
