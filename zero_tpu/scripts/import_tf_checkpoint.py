"""Import a reference (bzhangGo/zero, TF1) checkpoint into zero_tpu format.

The reference ecosystem warm-starts from TF checkpoints and publishes
pretrained models (reference main.py:222-223, docs/depth_scale_init_and_
merged_attention/README.md "pretrained models"); zero_tpu stores npz
pytrees (saver.py). This importer reads a TF checkpoint with
TensorFlow's checkpoint reader, maps the reference's variable-scope names
onto the zero_tpu parameter tree, and writes a zero_tpu checkpoint
directory usable as ``--parameters pretrained_model=<dir>`` or
``output_dir`` for decoding.

Supported model families: transformer, transformer_rpr, transformer_fuse
(the families with published reference checkpoints). Model dimensions and
embedding-sharing flags are inferred from the checkpoint itself.

Name mapping (ours -> reference TF; S = scope_name):
  src_embedding            S/src_embedding | S/embedding (shared)
  tgt_embedding            S/tgt_embedding | S/embedding
  softmax_embedding        S/softmax_embedding | S/tgt_embedding | S/embedding
  emb_bias                 S/bias                    (shared enc/dec)
  encoder/i/self/qkv       S/encoder/layer_i/self_attention/dot_attention/
                             qkv_map/{W_0_0, b_0}
  encoder/i/self/o         ...same.../o_map/{W_0_0, b_0}
  encoder/i/ln1, ln2       .../self_attention/layer_norm, /feed_forward/
                             layer_norm {scale, offset}
  encoder/i/ffn/enlarge    .../feed_forward/ffn_layer/enlarge/{W_0_0, b_0}
  decoder cross q/k/v/o    .../cross_attention/dot_attention/{q,k,v,o}_map
  decoder fuse q/k/v/o     .../fuse_attention/dot_attention/{q,k,v,o}_map
  *_rpr keys/values        .../dot_attention/rpr_{keys,values}/embeddings
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np


def load_tf_variables(path: str) -> dict:
    """name -> np.ndarray for every variable in a TF checkpoint."""
    from tensorflow.python.training import py_checkpoint_reader

    reader = py_checkpoint_reader.NewCheckpointReader(path)
    out = {}
    for name in reader.get_variable_to_shape_map():
        if name.startswith("global_step") or "/Adam" in name \
                or "CTrainOpReplica" in name or "ExponentialMovingAverage" \
                in name or name.endswith("/beta1_power") \
                or name.endswith("/beta2_power"):
            continue  # optimizer slots / step counters: params only
        out[name] = reader.get_tensor(name)
    return out


def infer_config(tf_vars: dict, scope: str):
    """Infer model family, dims, and sharing flags from variable names."""
    names = set(tf_vars)
    p = scope + "/"

    def have(suffix):
        return any(n.startswith(p) and suffix in n for n in names)

    model = "transformer"
    if have("fuse_attention"):
        model = "transformer_fuse"
    elif have("rpr_keys"):
        model = "transformer_rpr"

    enc_layers = len({m.group(1) for n in names
                      for m in [re.search(r"encoder/layer_(\d+)/", n)] if m})
    dec_layers = len({m.group(1) for n in names
                      for m in [re.search(r"decoder/layer_(\d+)/", n)] if m})
    qkv = tf_vars[p + "encoder/layer_0/self_attention/dot_attention/"
                  "qkv_map/W_0_0"]
    enlarge = tf_vars[p + "encoder/layer_0/feed_forward/ffn_layer/"
                      "enlarge/W_0_0"]
    hidden = qkv.shape[0]
    filt = enlarge.shape[1]
    # head count only shapes the RPR tables (depth = hidden/heads); for the
    # other families it's decode-config, not checkpoint structure
    num_heads = 8
    rpr_key = p + "encoder/layer_0/self_attention/dot_attention/" \
        "rpr_keys/embeddings"
    if rpr_key in tf_vars:
        num_heads = hidden // tf_vars[rpr_key].shape[1]

    shared_all = (p + "embedding") in names
    shared_tgt_softmax = not ((p + "softmax_embedding") in names)
    if shared_all:
        src_v = tgt_v = tf_vars[p + "embedding"].shape[0]
    else:
        src_v = tf_vars[p + "src_embedding"].shape[0]
        tgt_v = tf_vars[p + "tgt_embedding"].shape[0]
    return dict(model_name=model, num_encoder_layer=enc_layers,
                num_decoder_layer=dec_layers, hidden_size=hidden,
                embed_size=hidden, filter_size=filt, num_heads=num_heads,
                shared_source_target_embedding=shared_all,
                shared_target_softmax_embedding=shared_tgt_softmax,
                src_vocab_size=src_v, tgt_vocab_size=tgt_v)


_ATTN = {"self": "self_attention", "cross": "cross_attention",
         "fuse": "fuse_attention"}
_LIN = {"qkv": "qkv_map", "q": "q_map", "k": "k_map", "v": "v_map",
        "o": "o_map", "enlarge": "enlarge", "output": "output"}


def tf_name_for(path: str, scope: str, cfg) -> str:
    """zero_tpu param path -> reference TF variable name."""
    S = scope
    parts = path.split("/")
    if parts[0] == "embedding":  # fully shared: single leaf in our tree
        return "%s/embedding" % S
    if parts[0] in ("src_embedding", "tgt_embedding", "softmax_embedding"):
        if cfg["shared_source_target_embedding"]:
            return "%s/embedding" % S
        if parts[0] == "softmax_embedding" \
                and cfg["shared_target_softmax_embedding"]:
            return "%s/tgt_embedding" % S
        return "%s/%s" % (S, parts[0])
    if parts[0] == "emb_bias":
        return "%s/bias" % S
    side, layer = parts[0], parts[1]  # encoder/decoder, index
    rest = parts[2:]
    base = "%s/%s/layer_%s" % (S, side, layer)
    if rest[0] in _ATTN:
        mod = "%s/%s/dot_attention/%s" % (base, _ATTN[rest[0]],
                                          _LIN[rest[1]])
        return mod + ("/W_0_0" if rest[2] == "ws" else "/b_0")
    if rest[0] == "ffn":
        # the ffn sublayer lives under feed_forward in every family
        mod = "%s/feed_forward/ffn_layer/%s" % (base, _LIN[rest[1]])
        return mod + ("/W_0_0" if rest[2] == "ws" else "/b_0")
    if rest[0].endswith("_rpr"):
        attn = _ATTN[rest[0][:-4]]
        which = "rpr_keys" if rest[1] == "keys" else "rpr_values"
        return "%s/%s/dot_attention/%s/embeddings" % (base, attn, which)
    if rest[0].startswith("ln"):
        # ln1/ln2/ln3 follow sublayer order: self, (cross,) ffn
        if side == "encoder":
            sub = ["self_attention", "feed_forward"]
        elif cfg["model_name"] == "transformer_fuse":
            sub = ["fuse_attention", "feed_forward"]
        else:
            sub = ["self_attention", "cross_attention", "feed_forward"]
        idx = int(rest[0][2:]) - 1
        return "%s/%s/layer_norm/%s" % (base, sub[idx], rest[1])
    raise KeyError("no TF mapping for param path %r" % path)


def import_checkpoint(tf_ckpt: str, out_dir: str, scope: str = "transformer",
                      strict: bool = True) -> dict:
    import jax

    from zero_tpu.config import default_config
    from zero_tpu.models.base import get_model
    from zero_tpu.saver import save_checkpoint_file, _write_index
    from zero_tpu.vocab import Vocab

    tf_vars = load_tf_variables(tf_ckpt)
    inferred = infer_config(tf_vars, scope)

    cfg = default_config()
    for k, v in inferred.items():
        if not k.endswith("_size") or k in ("hidden_size", "embed_size",
                                            "filter_size"):
            setattr(cfg, k, v)
    cfg.scope_name = scope

    # dummy vocabs with the right sizes (ids beyond the 3 specials)
    def mk_vocab(n):
        v = Vocab()
        for i in range(n - 3):
            v.insert("w%d" % i)
        return v
    cfg.src_vocab = mk_vocab(inferred["src_vocab_size"])
    cfg.tgt_vocab = mk_vocab(inferred["tgt_vocab_size"])

    model = get_model(cfg.model_name)
    params = model.init_fn(jax.random.PRNGKey(0), cfg)

    flat = jax.tree_util.tree_flatten_with_path(params)
    filled, missing = {}, []
    for path, leaf in flat[0]:
        pstr = "/".join(str(getattr(q, "key", getattr(q, "idx", q)))
                        for q in path)
        tf_name = tf_name_for(pstr, scope, inferred)
        if tf_name not in tf_vars:
            missing.append((pstr, tf_name))
            filled["params/" + pstr] = np.asarray(leaf)
            continue
        arr = tf_vars[tf_name]
        if tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError("shape mismatch %s: tf %s vs model %s"
                             % (tf_name, arr.shape, leaf.shape))
        filled["params/" + pstr] = arr.astype(np.asarray(leaf).dtype)
    if missing and strict:
        raise KeyError("unmapped TF variables for: %s" % missing[:5])

    os.makedirs(out_dir, exist_ok=True)
    name = "imported-0"
    path = os.path.join(out_dir, name + ".npz")
    with open(path, "wb") as f:
        np.savez(f, **filled)
    _write_index(out_dir, [name])
    return {"model": inferred, "n_params": len(filled),
            "missing": missing, "out": path,
            "unused_tf_vars": sorted(
                set(tf_vars) - {tf_name_for(
                    "/".join(str(getattr(q, "key", getattr(q, "idx", q)))
                             for q in p), scope, inferred)
                    for p, _ in flat[0]})}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("tf_checkpoint", help="TF checkpoint prefix")
    ap.add_argument("out_dir")
    ap.add_argument("--scope", default="transformer")
    ap.add_argument("--lenient", action="store_true")
    args = ap.parse_args()
    info = import_checkpoint(args.tf_checkpoint, args.out_dir,
                             scope=args.scope, strict=not args.lenient)
    print("imported %d tensors (%s %dL/%dL h%d f%d) -> %s"
          % (info["n_params"], info["model"]["model_name"],
             info["model"]["num_encoder_layer"],
             info["model"]["num_decoder_layer"],
             info["model"]["hidden_size"], info["model"]["filter_size"],
             info["out"]))
    if info["missing"]:
        print("missing:", info["missing"])
    if info["unused_tf_vars"]:
        print("unused tf vars:", info["unused_tf_vars"])


if __name__ == "__main__":
    main()
