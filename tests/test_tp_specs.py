"""TP partition-rule coverage (VERDICT r1 weak #5).

Asserts, per model family, exactly which parameters receive a 'model'-axis
sharding under spec_for_param, and that no large matmul weight can fall
through the rules silently (unsharded_big_params reports it).
"""

import jax
import jax.tree_util as jtu
import numpy as np
import pytest

from zero_tpu.config import default_config
from zero_tpu.models.base import get_model
from zero_tpu.parallel.mesh import (_path_str, make_mesh, param_sharding,
                                    spec_for_param, unsharded_big_params)
from zero_tpu.vocab import Vocab


def _cfg(name, **over):
    cfg = default_config()
    cfg.model_name = name
    cfg.scope_name = name
    cfg.hidden_size = 16
    cfg.embed_size = 16
    cfg.filter_size = 32
    cfg.num_heads = 2
    cfg.num_encoder_layer = 1
    cfg.num_decoder_layer = 1
    v = Vocab()
    for i in range(61):
        v.insert("w%d" % i)
    cfg.src_vocab = v
    cfg.tgt_vocab = v
    for k, x in over.items():
        setattr(cfg, k, x)
    return cfg


def _sharded_names(params):
    """Short names (without layer indices / ws leaf suffixes) of params
    that get a 'model' axis."""
    names = set()
    for path, leaf in jtu.tree_flatten_with_path(params)[0]:
        if not hasattr(leaf, "shape"):
            continue
        pstr = _path_str(path)
        spec = spec_for_param(pstr, leaf.shape)
        if any(ax == "model" for ax in spec):
            parts = [p for p in pstr.split("/")
                     if p not in ("ws", "b") and not p.isdigit()]
            names.add("/".join(parts))
    return names


TRANSFORMER_CORE = {
    "encoder/self/qkv", "encoder/self/o",
    "encoder/ffn/enlarge", "encoder/ffn/output",
    "decoder/ffn/enlarge", "decoder/ffn/output",
    "src_embedding", "tgt_embedding",
}
DEC_SELF_CROSS = {
    "decoder/self/qkv", "decoder/self/o",
    "decoder/cross/q", "decoder/cross/k", "decoder/cross/v",
    "decoder/cross/o",
}

EXPECTED = {
    "transformer": TRANSFORMER_CORE | DEC_SELF_CROSS,
    "transformer_rpr": TRANSFORMER_CORE | DEC_SELF_CROSS,
    "transformer_rela": TRANSFORMER_CORE | DEC_SELF_CROSS,
    "transformer_fixup": TRANSFORMER_CORE | DEC_SELF_CROSS,
    "transformer_l0drop": TRANSFORMER_CORE | DEC_SELF_CROSS,
    "transformer_aan": TRANSFORMER_CORE | {
        "decoder/cross/q", "decoder/cross/k", "decoder/cross/v",
        "decoder/cross/o", "decoder/z_project"},
    "transformer_fuse": TRANSFORMER_CORE | {
        "decoder/fuse/q", "decoder/fuse/k", "decoder/fuse/v",
        "decoder/fuse/o"},
    "transformer_multilingual": TRANSFORMER_CORE | DEC_SELF_CROSS | {
        "lalt"},
    "transformer_clsr": TRANSFORMER_CORE | DEC_SELF_CROSS | {
        "encoder/clsr1/lang", "encoder/clsr1/shared",
        "encoder/clsr2/lang", "encoder/clsr2/shared",
        "decoder/clsr1/lang", "decoder/clsr1/shared",
        "decoder/clsr2/lang", "decoder/clsr2/shared",
        "decoder/clsr3/lang", "decoder/clsr3/shared"},
    "transformer_ibdecoder": TRANSFORMER_CORE | DEC_SELF_CROSS | {
        "dir_embedding"},
    # RNN families: recurrent/additive-attention matrices replicated BY
    # DESIGN (TP inside lax.scan would all-reduce every step); only the
    # embeddings shard
    "rnnsearch": {"src_embedding", "tgt_embedding"},
    "deepnmt": {"src_embedding", "tgt_embedding"},
    "rnnsearch_deepatt": {"src_embedding", "tgt_embedding"},
}


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_tp_sharded_param_set(name):
    over = {}
    if name == "transformer_multilingual":
        over = dict(num_languages=4, lang_id_offset=3)
    cfg = _cfg(name, **over)
    model = get_model(name)
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    assert _sharded_names(params) == EXPECTED[name]


@pytest.mark.parametrize("name", ["transformer", "transformer_multilingual",
                                  "rnnsearch"])
def test_no_silent_tp_degradation(name):
    """Every large matmul weight is either sharded or documented."""
    over = {}
    if name == "transformer_multilingual":
        over = dict(num_languages=4, lang_id_offset=3)
    cfg = _cfg(name, hidden_size=64, embed_size=64, filter_size=128,
               **over)
    model = get_model(name)
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(data=4, model=2)
    assert unsharded_big_params(params, mesh, min_elems=64 * 64) == []


def test_renamed_param_is_reported():
    """A renamed projection (the r1 silent-degradation scenario) must show
    up in the unsharded report instead of quietly replicating."""
    mesh = make_mesh(data=4, model=2)
    params = {"decoder": {"0": {"myattn": {
        "query_projection_new_name": {"ws": [np.zeros((256, 256))]}}}}}
    bad = unsharded_big_params(params, mesh, min_elems=1024)
    assert bad == ["decoder/0/myattn/query_projection_new_name/ws/0"]


def test_scan_layers_stacked_specs():
    """scan_layers stacks params to [L, in, out]: the 'model' axis must land
    on the same trailing dims."""
    assert spec_for_param("encoder/self/qkv/ws/0", (4, 64, 192)) \
        == jax.sharding.PartitionSpec(None, None, "model")
    assert spec_for_param("encoder/ffn/output/ws/0", (4, 128, 64)) \
        == jax.sharding.PartitionSpec(None, "model", None)


def test_param_sharding_divisibility_fallback():
    mesh = make_mesh(data=4, model=2)
    params = {"enlarge": {"ws": [np.zeros((16, 33))]}}  # 33 % 2 != 0
    tree = param_sharding(params, mesh, warn_unsharded=False)
    assert tree["enlarge"]["ws"][0].spec == jax.sharding.PartitionSpec(
        None, None)
