"""Multilingual LaLN/LaLT tests: language extraction, per-language LN,
train/score/decode with the cache==dev oracle, and language sensitivity."""

import jax
import jax.numpy as jnp
import numpy as np

import zero_tpu.models  # noqa: F401
from zero_tpu.models.base import get_model
from zero_tpu.models.transformer_multilingual import (lang_from_source,
                                                      lang_layer_norm,
                                                      init_lang_ln)
from zero_tpu.search import beam_search
from tests.helpers import tiny_config, toy_batch


def _cfg(**over):
    over.setdefault("model_name", "transformer_multilingual")
    return tiny_config(num_languages=3, lang_id_offset=3, **over)


def _batch(batch=4):
    b = toy_batch(batch=batch)
    # first source token is the language tag in [3, 6)
    rs = np.random.RandomState(1)
    b["source"][:, 0] = rs.randint(3, 6, batch)
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_lang_from_source():
    cfg = _cfg()
    src = jnp.asarray([[3, 7, 8], [5, 9, 0], [9, 9, 9]], jnp.int32)
    langs = np.asarray(lang_from_source(src, cfg))
    assert list(langs) == [0, 2, 2]  # out-of-range tags clip


def test_lang_layer_norm_selects_params():
    p = init_lang_ln(2, 4)
    p["scale"] = p["scale"].at[1].set(2.0)
    x = jnp.ones((2, 3, 4)) * jnp.asarray([1.0, 2.0, 3.0, 4.0])
    y0 = lang_layer_norm(p, x, jnp.asarray([0, 0]))
    y1 = lang_layer_norm(p, x, jnp.asarray([1, 1]))
    np.testing.assert_allclose(np.asarray(y1), 2 * np.asarray(y0), rtol=1e-5)


def test_train_and_score():
    cfg = _cfg()
    model = get_model("transformer_multilingual")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = _batch()
    loss = float(model.train_fn(params, feats, cfg,
                                jax.random.PRNGKey(1))["loss"])
    assert np.isfinite(loss) and loss > 0
    score = model.score_fn(params, feats, cfg)["score"]
    assert np.isfinite(np.asarray(score)).all()


def test_language_changes_output():
    """Different language tags must change the decoder output (LaLN/LaLT
    params differ once perturbed)."""
    cfg = _cfg()
    model = get_model("transformer_multilingual")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    # perturb language 1's components away from language 0's
    params["lalt"] = params["lalt"].at[1].add(
        0.1 * jax.random.normal(jax.random.PRNGKey(5),
                                params["lalt"][1].shape))
    feats = _batch(batch=2)
    src = np.asarray(feats["source"]).copy()
    src[:, 0] = 3  # lang 0
    s0 = model.score_fn(params, {"source": jnp.asarray(src),
                                 "target": feats["target"]}, cfg)["score"]
    src[:, 0] = 4  # lang 1
    s1 = model.score_fn(params, {"source": jnp.asarray(src),
                                 "target": feats["target"]}, cfg)["score"]
    assert not np.allclose(np.asarray(s0), np.asarray(s1))


def test_cache_decode_equals_dev():
    cfg = _cfg()
    model = get_model("transformer_multilingual")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    src = _batch(batch=2)["source"]
    out_c = beam_search(params, src, model.infer_fn(cfg), cfg)
    cfg_dev = _cfg(search_mode="dev")
    out_d = beam_search(params, src, model.infer_fn(cfg_dev), cfg_dev)
    np.testing.assert_array_equal(np.asarray(out_c["seq"]),
                                  np.asarray(out_d["seq"]))


# -- CLSR ---------------------------------------------------------------------

def test_clsr_train_score_and_budget():
    cfg = _cfg(model_name="transformer_clsr", clsr_budget=0.5, clsr_alpha=1.0)
    model = get_model("transformer_clsr")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = _batch()
    loss = float(model.train_fn(params, feats, cfg,
                                jax.random.PRNGKey(1))["loss"])
    assert np.isfinite(loss) and loss > 0
    # budget loss contributes: alpha=0 must change the total
    cfg0 = _cfg(model_name="transformer_clsr", clsr_budget=0.0,
                clsr_alpha=10.0)
    loss0 = float(model.train_fn(params, feats, cfg0,
                                 jax.random.PRNGKey(1))["loss"])
    assert loss0 != loss
    score = model.score_fn(params, feats, cfg)["score"]
    assert np.isfinite(np.asarray(score)).all()


def test_clsr_cache_decode_equals_dev():
    cfg = _cfg(model_name="transformer_clsr")
    model = get_model("transformer_clsr")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    src = _batch(batch=2)["source"]
    out_c = beam_search(params, src, model.infer_fn(cfg), cfg)
    cfg_dev = _cfg(model_name="transformer_clsr", search_mode="dev")
    out_d = beam_search(params, src, model.infer_fn(cfg_dev), cfg_dev)
    np.testing.assert_array_equal(np.asarray(out_c["seq"]),
                                  np.asarray(out_d["seq"]))
