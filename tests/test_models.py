"""Model-zoo tests: init/train/score shapes, finiteness, and the
cache-decode == dev-mode-decode property (SURVEY §4 oracle #1) per model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zero_tpu.models  # noqa: F401  (registration)
from zero_tpu.models.base import get_model, registered_models
from zero_tpu.search import beam_search
from tests.helpers import tiny_config, toy_batch

TRANSFORMER_FAMILY = [
    "transformer", "transformer_rpr", "transformer_aan", "transformer_fuse",
    "transformer_rela", "transformer_fixup", "transformer_l0drop",
]


def _cfg_for(name):
    over = {}
    if name == "transformer_fixup":
        over["shared_target_softmax_embedding"] = False
    return tiny_config(model_name=name, **over)


@pytest.mark.parametrize("name", TRANSFORMER_FAMILY)
def test_train_loss_finite(name):
    cfg = _cfg_for(name)
    model = get_model(name)
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = {k: jnp.asarray(v) for k, v in toy_batch().items()}
    out = model.train_fn(params, feats, cfg, jax.random.PRNGKey(1), step=10)
    assert np.isfinite(float(out["loss"]))
    assert float(out["loss"]) > 0


@pytest.mark.parametrize("name", TRANSFORMER_FAMILY)
def test_score_shape(name):
    cfg = _cfg_for(name)
    model = get_model(name)
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = {k: jnp.asarray(v) for k, v in toy_batch().items()}
    out = model.score_fn(params, feats, cfg)
    assert out["score"].shape == (4,)
    assert np.isfinite(np.asarray(out["score"])).all()


@pytest.mark.parametrize("name", TRANSFORMER_FAMILY)
def test_cache_decode_equals_dev_decode(name):
    """Beam search with incremental caches must produce the same sequences
    and scores as full-recompute dev mode."""
    cfg = _cfg_for(name)
    model = get_model(name)
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    source = jnp.asarray(toy_batch(batch=3)["source"])

    inf = model.infer_fn(cfg)
    out_cache = beam_search(params, source, inf, cfg)

    cfg_dev = _cfg_for(name)
    cfg_dev.search_mode = "dev"
    inf_dev = model.infer_fn(cfg_dev)
    out_dev = beam_search(params, source, inf_dev, cfg_dev)

    np.testing.assert_array_equal(np.asarray(out_cache["seq"]),
                                  np.asarray(out_dev["seq"]))
    np.testing.assert_allclose(np.asarray(out_cache["score"]),
                               np.asarray(out_dev["score"]),
                               rtol=1e-3, atol=1e-3)


def test_beam_search_terminates_with_eos():
    cfg = _cfg_for("transformer")
    model = get_model("transformer")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    source = jnp.asarray(toy_batch(batch=2)["source"])
    out = beam_search(params, source, model.infer_fn(cfg), cfg)
    assert out["seq"].shape[:2] == (2, cfg.beam_size)
    assert out["score"].shape == (2, cfg.beam_size)
    # scores sorted descending along beams
    s = np.asarray(out["score"])
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_registry_contents():
    names = registered_models()
    for expected in TRANSFORMER_FAMILY:
        assert expected in names


def test_train_is_deterministic_given_rng():
    cfg = _cfg_for("transformer")
    model = get_model("transformer")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = {k: jnp.asarray(v) for k, v in toy_batch().items()}
    l1 = float(model.train_fn(params, feats, cfg, jax.random.PRNGKey(7))["loss"])
    l2 = float(model.train_fn(params, feats, cfg, jax.random.PRNGKey(7))["loss"])
    assert l1 == l2


def test_cross_family_ensemble():
    """Ensembling different model families (transformer + rnnsearch) via
    per-step probability averaging (reference main.py:65-115 allows any
    registered models)."""
    from zero_tpu.search import beam_search
    from zero_tpu.train import make_ensemble_inference

    cfg_t = _cfg_for("transformer")
    cfg_r = tiny_config(model_name="rnnsearch", cell="gru", caencoder=True)
    m_t = get_model("transformer")
    m_r = get_model("rnnsearch")
    p_t = m_t.init_fn(jax.random.PRNGKey(0), cfg_t)
    p_r = m_r.init_fn(jax.random.PRNGKey(1), cfg_r)

    ens = make_ensemble_inference([m_t.infer_fn(cfg_t), m_r.infer_fn(cfg_r)])
    src = jnp.asarray(toy_batch(batch=2)["source"])
    out = beam_search([p_t, p_r], src, ens, cfg_t)
    assert out["seq"].shape[:2] == (2, cfg_t.beam_size)
    assert np.isfinite(np.asarray(out["score"])).all()
