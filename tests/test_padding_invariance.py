"""Shape-padding invariance: the TPU shape-bucket discipline pads batches
with all-pad rows and sequences with pad columns; results must be
identical to the unpadded computation (CLAUDE.md invariant)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zero_tpu.models  # noqa: F401
from zero_tpu.models.base import get_model
from zero_tpu.search import beam_search
from tests.helpers import tiny_config, toy_batch

PADDED_MODELS = ["transformer", "transformer_aan", "transformer_l0drop",
                 "rnnsearch"]


def _pad_feats(feats, extra_rows=3, extra_cols=5):
    out = {}
    for k, v in feats.items():
        v = np.asarray(v)
        out[k] = np.pad(v, ((0, extra_rows), (0, extra_cols)))
    return {k: jnp.asarray(v) for k, v in out.items()}


@pytest.mark.parametrize("name", PADDED_MODELS)
def test_loss_invariant_to_padding(name):
    over = dict(dropout=0.0, residual_dropout=0.0, relu_dropout=0.0,
                attention_dropout=0.0)
    cfg = tiny_config(model_name=name, **over)
    model = get_model(name)
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = {k: jnp.asarray(v) for k, v in toy_batch().items()}
    padded = _pad_feats(feats)

    if name != "transformer_l0drop":
        # (l0drop's training path samples gates whose noise shape follows
        # the padded shape; its deterministic eval path is checked below)
        l0 = float(model.train_fn(params, feats, cfg, None)["loss"])
        l1 = float(model.train_fn(params, padded, cfg, None)["loss"])
        assert abs(l0 - l1) < 1e-4, (name, l0, l1)

    s0 = np.asarray(model.score_fn(params, feats, cfg)["score"])
    s1 = np.asarray(model.score_fn(params, padded, cfg)["score"])
    np.testing.assert_allclose(s1[:len(s0)], s0, rtol=1e-4, atol=1e-4)
    # padded rows score 0 (all-pad sentences)
    np.testing.assert_allclose(s1[len(s0):], 0.0, atol=1e-6)


def test_decode_invariant_to_source_column_padding():
    cfg = tiny_config(model_name="transformer")
    model = get_model("transformer")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    src = toy_batch(batch=2)["source"]
    src_padded = np.pad(src, ((0, 0), (0, 6)))

    inf = model.infer_fn(cfg)
    out0 = beam_search(params, jnp.asarray(src), inf, cfg)
    out1 = beam_search(params, jnp.asarray(src_padded), inf, cfg)
    t = out0["seq"].shape[2]
    np.testing.assert_array_equal(np.asarray(out1["seq"])[:, :, :t],
                                  np.asarray(out0["seq"]))
    np.testing.assert_allclose(np.asarray(out1["score"]),
                               np.asarray(out0["score"]), rtol=1e-4,
                               atol=1e-4)
