"""TF-checkpoint importer round trip, all reference model families.

Creates a real TF checkpoint whose variables follow the reference's
variable-scope naming (derived from /root/reference/models/*.py, func.py,
modules/*.py, rnns/*.py), imports it, and checks every parameter lands on
the right zero_tpu slot with dims/sharing/cell inferred from the
checkpoint alone. Concat-input TF weights (pre_logits, deepnmt redict,
deepatt ff) are built full-width and must import as the right row slices.
The tested surface is the TF read path + name mapping; parity against a
genuinely reference-trained checkpoint needs network access (the
pretrained models live at data.statmt.org).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402

from zero_tpu.config import default_config  # noqa: E402
from zero_tpu.models.base import get_model  # noqa: E402
from zero_tpu.scripts.import_tf_checkpoint import (  # noqa: E402
    _DEAD_LEAF, import_checkpoint, tf_name_for)
from zero_tpu.saver import Saver  # noqa: E402
from zero_tpu.vocab import Vocab  # noqa: E402


def _tiny_cfg(model_name, shared_all=True, **over):
    cfg = default_config()
    cfg.model_name = model_name
    cfg.scope_name = "transformer"
    cfg.hidden_size = 8
    cfg.embed_size = 8
    cfg.filter_size = 16
    cfg.num_heads = 2
    cfg.num_encoder_layer = 2
    cfg.num_decoder_layer = 2
    cfg.shared_source_target_embedding = shared_all
    cfg.shared_target_softmax_embedding = True
    v = Vocab()
    for i in range(10 - 3):
        v.insert("w%d" % i)
    cfg.src_vocab = v
    cfg.tgt_vocab = v
    for k, x in over.items():
        setattr(cfg, k, x)
    return cfg


def _flat_params(cfg):
    model = get_model(cfg.model_name)
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        pstr = "/".join(str(getattr(q, "key", getattr(q, "idx", q)))
                        for q in path)
        out.append((pstr, np.asarray(leaf)))
    return out


def _make_tf_ckpt(tmp_path, cfg, inferred):
    """Write a TF checkpoint with reference-named variables; returns
    ({tf_name: value}, ckpt_path). Concat-input weights are grown to
    full width as slices are discovered."""
    rs = np.random.RandomState(0)
    values = {}
    for pstr, leaf in _flat_params(cfg):
        if _DEAD_LEAF.search(pstr):
            continue
        name, rows = tf_name_for(pstr, "transformer", inferred)
        if rows is None:
            values.setdefault(
                name, rs.randn(*leaf.shape).astype(np.float32))
        else:
            full = values.get(name)
            need = rows[1]
            if full is None or full.shape[0] < need:
                grown = rs.randn(need, *leaf.shape[1:]).astype(np.float32)
                if full is not None:
                    grown[:full.shape[0]] = full
                full = grown
            values[name] = full

    g = tf.Graph()
    with g.as_default():
        tfvars = [tf.compat.v1.get_variable(n, initializer=v)
                  for n, v in values.items()]
        saver = tf.compat.v1.train.Saver(tfvars)
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            ckpt = saver.save(sess, str(tmp_path / "ref.ckpt"))
    return values, ckpt


def _leafval(tree, path):
    for p in path.split("/"):
        tree = tree[int(p)] if p.isdigit() else tree[p]
    return np.asarray(tree)


def _inferred_for(cfg):
    """The subset of inferred config tf_name_for consumes."""
    return dict(model_name=cfg.model_name,
                shared_source_target_embedding=(
                    cfg.shared_source_target_embedding),
                shared_target_softmax_embedding=(
                    cfg.shared_target_softmax_embedding),
                cell=cfg.cell, caencoder=cfg.caencoder,
                hidden_size=cfg.hidden_size, embed_size=cfg.embed_size,
                num_decoder_layer=cfg.num_decoder_layer)


def _run_round_trip(tmp_path, cfg, expect):
    values, ckpt = _make_tf_ckpt(tmp_path, cfg, _inferred_for(cfg))
    out = str(tmp_path / "imported")
    info = import_checkpoint(ckpt, out, scope="transformer")
    assert not info["missing"], info["missing"]
    assert not info["unused_tf_vars"], info["unused_tf_vars"]
    got = info["model"]
    for k, v in expect.items():
        assert got[k] == v, (k, got[k], v)

    # restore through the normal Saver path and check EVERY parameter
    model = get_model(cfg.model_name)
    template = model.init_fn(jax.random.PRNGKey(1), cfg)
    restored = Saver(output_dir=out).restore({"params": template})["params"]
    inferred = _inferred_for(cfg)
    n_checked = 0
    for pstr, _ in _flat_params(cfg):
        if _DEAD_LEAF.search(pstr):
            continue
        name, rows = tf_name_for(pstr, "transformer", inferred)
        want = values[name] if rows is None else values[name][rows[0]:rows[1]]
        np.testing.assert_array_equal(_leafval(restored, pstr), want,
                                      err_msg=pstr)
        n_checked += 1
    assert n_checked > 10
    return info


@pytest.mark.parametrize("model_name,shared",
                         [("transformer", True), ("transformer", False),
                          ("transformer_rpr", True),
                          ("transformer_fuse", True)])
def test_tf_import_base_families(tmp_path, model_name, shared):
    cfg = _tiny_cfg(model_name, shared)
    info = _run_round_trip(tmp_path, cfg, dict(
        model_name=model_name, num_encoder_layer=2, hidden_size=8,
        filter_size=16, shared_source_target_embedding=shared,
        src_vocab_size=10))
    assert info["model"]["shared_target_softmax_embedding"]


@pytest.mark.parametrize("model_name", ["transformer_aan",
                                        "transformer_rela",
                                        "transformer_l0drop"])
def test_tf_import_attention_variants(tmp_path, model_name):
    cfg = _tiny_cfg(model_name)
    _run_round_trip(tmp_path, cfg, dict(
        model_name=model_name, num_encoder_layer=2, num_decoder_layer=2,
        hidden_size=8, filter_size=16))


def test_tf_import_aan_use_ffn(tmp_path):
    cfg = _tiny_cfg("transformer_aan", use_ffn=True)
    info = _run_round_trip(tmp_path, cfg, dict(model_name="transformer_aan"))
    assert info["model"]["use_ffn"]


def test_tf_import_fixup(tmp_path):
    """Fixup: bias-free linears, scalar shift/scale; the reference shares
    one ffn shift var across our shift0/1/2 (AUTO_REUSE)."""
    cfg = _tiny_cfg("transformer_fixup")
    values, ckpt = _make_tf_ckpt(tmp_path, cfg, _inferred_for(cfg))
    out = str(tmp_path / "imported")
    info = import_checkpoint(ckpt, out, scope="transformer")
    assert info["model"]["model_name"] == "transformer_fixup"
    assert not info["missing"] and not info["unused_tf_vars"]
    model = get_model("transformer_fixup")
    template = model.init_fn(jax.random.PRNGKey(1), cfg)
    restored = Saver(output_dir=out).restore({"params": template})["params"]
    shared = values["transformer/encoder/layer_0/feed_forward/"
                    "ffn_layer/shift/offset"]
    for k in ("shift0", "shift1", "shift2"):
        np.testing.assert_array_equal(
            _leafval(restored, "encoder/0/ffn/%s/offset" % k), shared)


@pytest.mark.parametrize("model_name,cell,caencoder",
                         [("rnnsearch", "atr", True),
                          ("rnnsearch", "gru", False),
                          ("deepnmt", "atr", True),
                          ("rnnsearch_deepatt", "lstm", True)])
def test_tf_import_rnn_families(tmp_path, model_name, cell, caencoder):
    cfg = _tiny_cfg(model_name, cell=cell, caencoder=caencoder)
    info = _run_round_trip(tmp_path, cfg, dict(
        model_name=model_name, cell=cell, hidden_size=8))
    if model_name != "rnnsearch":
        assert info["model"]["num_decoder_layer"] == 2
    # dead feed_memory slots are reported, not errors
    if model_name in ("rnnsearch", "deepnmt", "rnnsearch_deepatt"):
        assert all("feed_memory" in d for d in info["dead"])


# ---- numerical score parity: import -> score_fn vs reference-math oracle ----


def _np_linear(values, prefix, x):
    return x @ values[prefix + "/W_0_0"] + values[prefix + "/b_0"]


def _np_ln(values, prefix, x, eps=1e-8):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * values[prefix + "/scale"] \
        + values[prefix + "/offset"]


def _np_softmax(x):
    m = x.max(-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(-1, keepdims=True)


def _np_timing(length, channels):
    # func.add_timing_signal:341-369 (min 1.0, max 1e4)
    position = np.arange(length, dtype=np.float32)
    num_ts = channels // 2
    log_inc = np.log(1e4) / (num_ts - 1)
    inv_ts = np.exp(np.arange(num_ts, dtype=np.float32) * -log_inc)
    scaled = position[:, None] * inv_ts[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], 1)[None]


def _np_split_heads(x, H):
    B, L, D = x.shape
    return x.reshape(B, L, H, D // H).transpose(0, 2, 1, 3)


def _np_attention(values, base, x, mem, bias, d, H):
    """func.dot_attention:164-286 (no cache, no rpr)."""
    if mem is None:
        h = _np_linear(values, base + "/qkv_map", x)
        q, k, v = np.split(h, 3, -1)
    else:
        q = _np_linear(values, base + "/q_map", x)
        k = _np_linear(values, base + "/k_map", mem)
        v = _np_linear(values, base + "/v_map", mem)
    q = _np_split_heads(q, H) * (d // H) ** -0.5
    k = _np_split_heads(k, H)
    v = _np_split_heads(v, H)
    logits = q @ k.transpose(0, 1, 3, 2) + bias
    o = _np_softmax(logits) @ v
    o = o.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], d)
    return _np_linear(values, base + "/o_map", o)


def _reference_scores(values, src, tgt, d, H, n_enc, n_dec, filt):
    """Per-sentence teacher-forced scores with the reference's exact math
    (transformer.py:15-223, func.py): post-LN, emb*sqrt(d)+bias+timing,
    shift-right decoder input, fp32 logits, per-sentence mean CE."""
    S = "transformer"
    NEG = -1e9
    src_mask = (src != 0).astype(np.float32)
    tgt_mask = (tgt != 0).astype(np.float32)

    x = values[S + "/src_embedding"][src] * d ** 0.5 + values[S + "/bias"]
    x = x + _np_timing(src.shape[1], d)
    enc_bias = ((1.0 - src_mask) * NEG)[:, None, None, :]
    for l in range(n_enc):
        base = "%s/encoder/layer_%d" % (S, l)
        y = _np_attention(values, base + "/self_attention/dot_attention",
                          x, None, enc_bias, d, H)
        x = _np_ln(values, base + "/self_attention/layer_norm", x + y)
        h = np.maximum(_np_linear(
            values, base + "/feed_forward/ffn_layer/enlarge", x), 0.0)
        y = _np_linear(values, base + "/feed_forward/ffn_layer/output", h)
        x = _np_ln(values, base + "/feed_forward/layer_norm", x + y)
    memory = x

    t = values[S + "/tgt_embedding"][tgt] * d ** 0.5 + values[S + "/bias"]
    t = np.pad(t, ((0, 0), (1, 0), (0, 0)))[:, :-1]   # shift right
    t = t + _np_timing(tgt.shape[1], d)
    L = tgt.shape[1]
    causal = np.triu(np.full((L, L), NEG, np.float32), 1)[None, None]
    for l in range(n_dec):
        base = "%s/decoder/layer_%d" % (S, l)
        y = _np_attention(values, base + "/self_attention/dot_attention",
                          t, None, causal, d, H)
        t = _np_ln(values, base + "/self_attention/layer_norm", t + y)
        y = _np_attention(values, base + "/cross_attention/dot_attention",
                          t, memory, enc_bias, d, H)
        t = _np_ln(values, base + "/cross_attention/layer_norm", t + y)
        h = np.maximum(_np_linear(
            values, base + "/feed_forward/ffn_layer/enlarge", t), 0.0)
        y = _np_linear(values, base + "/feed_forward/ffn_layer/output", h)
        t = _np_ln(values, base + "/feed_forward/layer_norm", t + y)

    logits = (t @ values[S + "/tgt_embedding"].T).astype(np.float32)
    logp = logits - logits.max(-1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
    nll = -np.take_along_axis(logp, tgt[..., None], -1)[..., 0]
    return (nll * tgt_mask).sum(-1) / tgt_mask.sum(-1)


def test_tf_import_score_parity_with_reference_math(tmp_path):
    """Import a TF checkpoint and check our score_fn reproduces the
    reference forward pass computed independently in numpy from the SAME
    TF-named weights -- catches any semantic (not just positional)
    mapping error: qkv split order, head layout, shift/timing order."""
    import jax.numpy as jnp

    cfg = _tiny_cfg("transformer", shared_all=False)
    values, ckpt = _make_tf_ckpt(tmp_path, cfg, _inferred_for(cfg))
    out = str(tmp_path / "imported")
    import_checkpoint(ckpt, out, scope="transformer")

    model = get_model("transformer")
    template = model.init_fn(jax.random.PRNGKey(1), cfg)
    restored = Saver(output_dir=out).restore({"params": template})["params"]

    rs = np.random.RandomState(7)
    src = rs.randint(3, 10, size=(2, 6)).astype(np.int32)
    tgt = rs.randint(3, 10, size=(2, 5)).astype(np.int32)
    src[1, 4:] = 0   # padding rows (row 0 keeps full length: no all-pad col)
    tgt[1, 3:] = 0

    ours = np.asarray(model.score_fn(
        restored, {"source": jnp.asarray(src), "target": jnp.asarray(tgt)},
        cfg)["score"])
    ref = _reference_scores(values, src, tgt, cfg.hidden_size,
                            cfg.num_heads, cfg.num_encoder_layer,
                            cfg.num_decoder_layer, cfg.filter_size)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)
