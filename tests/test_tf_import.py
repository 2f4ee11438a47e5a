"""TF-checkpoint importer round trip.

Creates a real TF checkpoint whose variables follow the reference's
variable-scope naming (derived from /root/reference/models/transformer.py
and func.py), imports it, and checks values land on the right zero_tpu
parameters with dims/sharing inferred from the checkpoint alone. The
tested surface is the TF read path + name mapping; parity against a
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
    import_checkpoint, tf_name_for)
from zero_tpu.saver import Saver  # noqa: E402
from zero_tpu.vocab import Vocab  # noqa: E402


def _tiny_cfg(model_name, shared_all, **over):
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


def _make_tf_ckpt(tmp_path, cfg, inferred):
    """Write a TF checkpoint with reference-named variables; returns
    {tf_name: value}."""
    model = get_model(cfg.model_name)
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    values = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        pstr = "/".join(str(getattr(q, "key", getattr(q, "idx", q)))
                        for q in path)
        name = tf_name_for(pstr, "transformer", inferred)
        values.setdefault(name, rs.randn(*leaf.shape).astype(np.float32))

    g = tf.Graph()
    with g.as_default():
        tfvars = [tf.compat.v1.get_variable(n, initializer=v)
                  for n, v in values.items()]
        saver = tf.compat.v1.train.Saver(tfvars)
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            ckpt = saver.save(sess, str(tmp_path / "ref.ckpt"))
    return values, ckpt


@pytest.mark.parametrize("model_name,shared",
                         [("transformer", True), ("transformer", False),
                          ("transformer_rpr", True),
                          ("transformer_fuse", True)])
def test_tf_import_round_trip(tmp_path, model_name, shared):
    cfg = _tiny_cfg(model_name, shared)
    inferred = dict(model_name=model_name,
                    shared_source_target_embedding=shared,
                    shared_target_softmax_embedding=True)
    values, ckpt = _make_tf_ckpt(tmp_path, cfg, inferred)

    out = str(tmp_path / "imported")
    info = import_checkpoint(ckpt, out, scope="transformer")
    assert not info["missing"]
    assert not info["unused_tf_vars"]
    got = info["model"]
    assert got["model_name"] == model_name
    assert got["num_encoder_layer"] == 2
    assert got["hidden_size"] == 8
    assert got["filter_size"] == 16
    assert got["shared_source_target_embedding"] == shared
    assert got["src_vocab_size"] == 10

    # restore through the normal Saver path and spot-check values
    model = get_model(model_name)
    template = model.init_fn(jax.random.PRNGKey(1), cfg)
    restored = Saver(output_dir=out).restore({"params": template})["params"]

    def leafval(tree, path):
        for p in path.split("/"):
            tree = tree[int(p)] if p.isdigit() else tree[p]
        return np.asarray(tree)

    checks = ["encoder/0/self/qkv/ws/0", "decoder/1/ffn/output/b",
              "encoder/1/ln2/scale", "emb_bias"]
    if model_name == "transformer_fuse":
        checks.append("decoder/0/fuse/v/ws/0")
    elif model_name == "transformer_rpr":
        checks.append("encoder/0/self_rpr/keys")
        checks.append("decoder/0/cross/q/ws/0")
    else:
        checks.append("decoder/0/cross/q/ws/0")
    for pstr in checks:
        want = values[tf_name_for(pstr, "transformer", inferred)]
        np.testing.assert_array_equal(leafval(restored, pstr), want,
                                      err_msg=pstr)
