"""Chunked tied-softmax CE (loss_chunk_tokens) equivalence tests.

The chunked path (models/common.py:chunked_tied_ce) must be numerically
identical to the full-logits path for loss, per-sentence scores, and
gradients -- it is a memory/traffic optimisation, never a math change
(CLAUDE.md loss-parity invariant).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zero_tpu.models  # noqa: F401 (registers models)
from zero_tpu.models.base import get_model
from tests.helpers import tiny_config, toy_batch

# hooks-skeleton + standalone transformer-family + RNN-family models that
# route through ce_from_feature
MODELS = ["transformer", "transformer_aan", "transformer_ibdecoder",
          "transformer_multilingual", "transformer_clsr",
          "rnnsearch", "deepnmt", "rnnsearch_deepatt"]


def _cfgs(name):
    over = {}
    if "multilingual" in name or "clsr" in name:
        over = dict(num_languages=3)
    cfg0 = tiny_config(model_name=name, scope_name=name, **over)
    cfg1 = tiny_config(model_name=name, scope_name=name,
                       loss_chunk_tokens=5, **over)  # odd chunk: pad path
    return cfg0, cfg1


@pytest.mark.parametrize("name", MODELS)
def test_chunked_loss_matches_full(name):
    cfg0, cfg1 = _cfgs(name)
    model = get_model(name)
    params = model.init_fn(jax.random.PRNGKey(0), cfg0)
    feats = {k: jnp.asarray(v) for k, v in toy_batch().items()}
    rng = jax.random.PRNGKey(1)

    l0 = model.train_fn(params, feats, cfg0, rng)["loss"]
    l1 = model.train_fn(params, feats, cfg1, rng)["loss"]
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)

    s0 = model.score_fn(params, feats, cfg0)["score"]
    s1 = model.score_fn(params, feats, cfg1)["score"]
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)


def test_chunked_loss_grads_match():
    cfg0, cfg1 = _cfgs("transformer")
    model = get_model("transformer")
    params = model.init_fn(jax.random.PRNGKey(0), cfg0)
    feats = {k: jnp.asarray(v) for k, v in toy_batch().items()}
    rng = jax.random.PRNGKey(1)
    g0 = jax.grad(lambda p: model.train_fn(p, feats, cfg0, rng)["loss"])(params)
    g1 = jax.grad(lambda p: model.train_fn(p, feats, cfg1, rng)["loss"])(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_chunked_loss_allpad_rows():
    """All-pad batch rows stay legal and NaN-free under chunking."""
    cfg0, cfg1 = _cfgs("transformer")
    model = get_model("transformer")
    params = model.init_fn(jax.random.PRNGKey(0), cfg0)
    batch = toy_batch()
    batch["source"][2:] = 0
    batch["target"][2:] = 0
    feats = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(1)
    l0 = float(model.train_fn(params, feats, cfg0, rng)["loss"])
    l1 = float(model.train_fn(params, feats, cfg1, rng)["loss"])
    assert np.isfinite(l0) and np.isfinite(l1)
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
