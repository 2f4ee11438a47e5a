"""Import a reference (bzhangGo/zero, TF1) checkpoint into zero_tpu format.

The reference ecosystem warm-starts from TF checkpoints and publishes
pretrained models (reference main.py:222-223, docs/depth_scale_init_and_
merged_attention/README.md "pretrained models"); zero_tpu stores npz
pytrees (saver.py). This importer reads a TF checkpoint with
TensorFlow's checkpoint reader, maps the reference's variable-scope names
onto the zero_tpu parameter tree, and writes a zero_tpu checkpoint
directory usable as ``--parameters pretrained_model=<dir>`` or
``output_dir`` for decoding.

Supported families (reference main.py:222-223 warm-starts ANY registered
model): transformer, transformer_rpr, transformer_fuse, transformer_aan,
transformer_rela, transformer_fixup, transformer_l0drop, rnnsearch,
deepnmt, rnnsearch_deepatt. Model dimensions, cell type, and sharing
flags are inferred from the checkpoint itself.

Name-mapping notes (ours -> reference TF; S = scope_name):
  * transformer family: see tf_name_for -- qkv/q/k/v/o under
    <sub>_attention/dot_attention/{x}_map/{W_0_0,b_0}, LNs follow
    sublayer order, ffn under feed_forward/ffn_layer.
  * aan: decoder sublayers are average_attention (z_project + optional
    ffn_layer + layer_norm), cross_attention, feed_forward
    (transformer_aan.py:164-224).
  * rela: gated RMSNorm under .../dot_attention/post/{scale,gate}
    (modules/rela.py:95-109).
  * fixup: per-sublayer shift/offset + scale/scale scalars; the three
    shift calls inside the reference ffn_layer share ONE variable
    (the model builds under reuse=tf.AUTO_REUSE, transformer_fixup.py:
    231-236), so our shift0/shift1/shift2 all import the same value;
    attention/ffn linears are bias-free (modules/fixup.py:29-185).
  * l0drop: S/source_pruning/{W_0_0,b_0} (transformer_l0drop.py:250).
  * RNN families: cells store fetch_state_<cscope>/{hide_x,gate_x} and
    cell_<cscope>/{hide_h,gate_h} (rnns/gru.py:24-51 etc.); cond_rnn
    cells use <cell>_lower/<cell>_higher scopes (rnns/rnn.py:91-94);
    concat-input linears (pre_logits, deepnmt redict, deepatt ff) are a
    single W_0_0 over the concatenated input that we split row-wise onto
    our per-input weight list (func.py:36-55 concatenates when ln=False).
  * our cond_rnn keeps an (unused) attention/feed_memory parameter slot
    for API symmetry; the reference never creates that variable when a
    projected memory is passed (func.py:123-126), so it stays at init.
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np

_CELLS = ("gru", "lstm", "sru", "atr", "lrn", "olrn")

# cell param leaves living in the fetch_state_* scope (input projections,
# bias-free); the rest (hide_h/gate_h) live in cell_* with bias
_FETCH_LEAVES = ("hide_x", "gate_x")


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


def _detect_cell(names, scope):
    """Find the reference cell type from cell_<name>* scopes."""
    pat = re.compile(re.escape(scope) + r"/.*(?:fetch_state|cell)_(\w+?)"
                     r"(?:_lower|_higher(?:_\d+)?)?/")
    found = set()
    for n in names:
        m = pat.match(n)
        if m and m.group(1) in _CELLS:
            found.add(m.group(1))
    return found.pop() if len(found) == 1 else "atr"


def infer_config(tf_vars: dict, scope: str):
    """Infer model family, dims, and sharing flags from variable names."""
    names = set(tf_vars)
    p = scope + "/"

    def have(suffix):
        return any(n.startswith(p) and suffix in n for n in names)

    shared_all = (p + "embedding") in names
    shared_tgt_softmax = not ((p + "softmax_embedding") in names)
    if shared_all:
        src_v = tgt_v = tf_vars[p + "embedding"].shape[0]
    else:
        src_v = tf_vars[p + "src_embedding"].shape[0]
        tgt_v = tf_vars[p + "tgt_embedding"].shape[0]
    embed = tf_vars[p + "bias"].shape[0]

    common = dict(shared_source_target_embedding=shared_all,
                  shared_target_softmax_embedding=shared_tgt_softmax,
                  src_vocab_size=src_v, tgt_vocab_size=tgt_v)

    # ---- RNN families --------------------------------------------------
    if have("fetch_state_") or have("cell_"):
        cell = _detect_cell(names, scope)
        hidden = tf_vars[next(n for n in names
                              if re.search(r"cell_\w+/hide_h/W_0_0$", n))
                         ].shape[1]
        # hide_h output width == d for every cell
        if have("deep_attention_0"):
            model = "rnnsearch_deepatt"
            enc_layers = len({m.group(1) for n in names for m in
                              [re.search(r"encoder/layer_(\d+)/", n)]
                              if m}) - 1
            dec_layers = len({m.group(1) for n in names for m in
                              [re.search(r"deep_attention_(\d+)/", n)]
                              if m})
        elif have("encoder/layer_0/"):
            model = "deepnmt"
            enc_layers = len({m.group(1) for n in names for m in
                              [re.search(r"encoder/layer_(\d+)/", n)] if m})
            dec_layers = len({m.group(1) for n in names for m in
                              [re.search(r"decoder/layer_(\d+)/", n)] if m})
        else:
            model = "rnnsearch"
            enc_layers = dec_layers = 1
        # multi-head additive attention: the attention width is
        # feed_query's output (== memory width, 2d for non-CAEncoder
        # rnnsearch) and feed_logits rows are width/heads
        num_heads = 1
        fl = next((n for n in names if n.endswith("feed_logits/W_0_0")), None)
        fq = next((n for n in names if n.endswith("feed_query/W_0_0")), None)
        if fl is not None and fq is not None:
            num_heads = max(1, tf_vars[fq].shape[1]
                            // tf_vars[fl].shape[0])
        caencoder = any("_lower" in n for n in names
                        if n.startswith(p + "encoder/"))
        use_deep_att = any(re.search(r"decoder/layer_[1-9]\d*/attention/", n)
                           for n in names)
        return dict(model_name=model, cell=cell, caencoder=caencoder,
                    use_deep_att=use_deep_att, hidden_size=hidden,
                    embed_size=embed, num_heads=num_heads,
                    num_encoder_layer=enc_layers,
                    num_decoder_layer=dec_layers, **common)

    # ---- transformer family --------------------------------------------
    model = "transformer"
    if have("average_attention"):
        model = "transformer_aan"
    elif have("fuse_attention"):
        model = "transformer_fuse"
    elif have("rpr_keys"):
        model = "transformer_rpr"
    elif have("dot_attention/post/"):
        model = "transformer_rela"
    elif have("/shift/offset"):
        model = "transformer_fixup"
    elif have("source_pruning"):
        model = "transformer_l0drop"

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

    out = dict(model_name=model, num_encoder_layer=enc_layers,
               num_decoder_layer=dec_layers, hidden_size=hidden,
               embed_size=hidden, filter_size=filt, num_heads=num_heads,
               **common)
    if model == "transformer_aan":
        out["use_ffn"] = have("average_attention/ffn_layer")
    return out


_ATTN = {"self": "self_attention", "cross": "cross_attention",
         "fuse": "fuse_attention"}
_LIN = {"qkv": "qkv_map", "q": "q_map", "k": "k_map", "v": "v_map",
        "o": "o_map", "enlarge": "enlarge", "output": "output"}


def _linear_leaf(rest):
    """['ws','0'] -> W_0_0; ['b'] -> b_0."""
    return "W_0_0" if rest[0] == "ws" else "b_0"


def _embedding_name(part, scope, cfg):
    S = scope
    if part == "embedding":  # fully shared: single leaf in our tree
        return "%s/embedding" % S
    if cfg["shared_source_target_embedding"]:
        return "%s/embedding" % S
    if part == "softmax_embedding" and cfg["shared_target_softmax_embedding"]:
        return "%s/tgt_embedding" % S
    return "%s/%s" % (S, part)


def _transformer_name(path, scope, cfg):
    """Transformer-family param path -> (tf_name, row_slice|None)."""
    S = scope
    model = cfg["model_name"]
    parts = path.split("/")
    if parts[0] in ("embedding", "src_embedding", "tgt_embedding",
                    "softmax_embedding"):
        return _embedding_name(parts[0], scope, cfg), None
    if parts[0] == "emb_bias":
        return "%s/bias" % S, None
    if parts[0] == "source_pruning":  # l0drop gate (l0drop.py:250)
        return "%s/source_pruning/%s" % (S, _linear_leaf(parts[1:])), None
    if parts[0] in ("enc_post", "dec_post"):  # fixup stack-final shift/scale
        side = "encoder" if parts[0] == "enc_post" else "decoder"
        return "%s/%s/%s/%s" % (S, side, parts[1], parts[2]), None
    side, layer = parts[0], parts[1]  # encoder/decoder, index
    rest = parts[2:]
    base = "%s/%s/layer_%s" % (S, side, layer)
    if rest[0] in _ATTN:
        if rest[1] == "post":  # rela gated RMSNorm: scale/gate leaves
            return "%s/%s/dot_attention/post/%s" % (base, _ATTN[rest[0]],
                                                    rest[2]), None
        mod = "%s/%s/dot_attention/%s" % (base, _ATTN[rest[0]],
                                          _LIN[rest[1]])
        return mod + "/" + _linear_leaf(rest[2:]), None
    if rest[0] == "z_project":  # aan gating layer
        return "%s/average_attention/z_project/%s" \
            % (base, _linear_leaf(rest[1:])), None
    if rest[0] == "aan_ffn":  # aan use_ffn path
        return "%s/average_attention/ffn_layer/%s/%s" \
            % (base, _LIN[rest[1]], _linear_leaf(rest[2:])), None
    if rest[0] == "ffn":
        # the ffn sublayer lives under feed_forward in every family
        if rest[1].startswith("shift"):  # fixup: 3 shifts share ONE TF var
            return "%s/feed_forward/ffn_layer/shift/offset" % base, None
        if rest[1] == "scale":
            return "%s/feed_forward/ffn_layer/scale/scale" % base, None
        mod = "%s/feed_forward/ffn_layer/%s" % (base, _LIN[rest[1]])
        return mod + "/" + _linear_leaf(rest[2:]), None
    if rest[0].endswith("_rpr"):
        attn = _ATTN[rest[0][:-4]]
        which = "rpr_keys" if rest[1] == "keys" else "rpr_values"
        return "%s/%s/dot_attention/%s/embeddings" % (base, attn,
                                                      which), None
    if rest[0] in ("self_shift", "cross_shift"):  # fixup pre-attn shift
        return "%s/%s/shift/offset" % (base, _ATTN[rest[0][:-6]]), None
    if rest[0] in ("self_scale", "cross_scale"):
        return "%s/%s/scale/scale" % (base, _ATTN[rest[0][:-6]]), None
    if rest[0].startswith("ln"):
        # ln1/ln2/ln3 follow sublayer order
        if side == "encoder":
            sub = ["self_attention", "feed_forward"]
        elif model == "transformer_fuse":
            sub = ["fuse_attention", "feed_forward"]
        elif model == "transformer_aan":
            sub = ["average_attention", "cross_attention", "feed_forward"]
        else:
            sub = ["self_attention", "cross_attention", "feed_forward"]
        idx = int(rest[0][2:]) - 1
        return "%s/%s/layer_norm/%s" % (base, sub[idx], rest[1]), None
    raise KeyError("no TF mapping for param path %r" % path)


def _cell_name(prefix, cscope, leaf, rest):
    """Cell param -> fetch_state_*/cell_* TF name (rnns/cell naming)."""
    kind = "fetch_state_" if leaf in _FETCH_LEAVES else "cell_"
    return "%s/%s%s/%s/%s" % (prefix, kind, cscope, leaf,
                              _linear_leaf(rest))


def _rnn_name(path, scope, cfg):
    """RNN-family param path -> (tf_name, row_slice|None).

    row_slice selects rows of a concat-input TF weight (func.py:36-55:
    ln=False concatenates the input list into one W_0_0).
    """
    S = scope
    model = cfg["model_name"]
    C = cfg["cell"]
    d = cfg["hidden_size"]
    e = cfg["embed_size"]
    parts = path.split("/")
    if parts[0] in ("embedding", "src_embedding", "tgt_embedding",
                    "softmax_embedding"):
        return _embedding_name(parts[0], scope, cfg), None
    if parts[0] == "emb_bias":
        return "%s/bias" % S, None

    if model == "rnnsearch":
        if parts[0] == "forward":
            return _cell_name("%s/encoder/forward" % S, C, parts[1],
                              parts[2:]), None
        if parts[0] == "backward":
            if parts[1] in ("lower", "higher"):  # caencoder cond_rnn
                return _cell_name("%s/encoder/backward" % S,
                                  "%s_%s" % (C, parts[1]), parts[2],
                                  parts[3:]), None
            return _cell_name("%s/encoder/backward" % S, C, parts[1],
                              parts[2:]), None
        if parts[0] == "decoder_init":
            # rnnsearch calls get_init_state with no scope: the linear
            # scope becomes "None_init" (rnns/cell.py:37 with scope=None)
            return "%s/decoder_initializer/None_init/%s" \
                % (S, _linear_leaf(parts[1:])), None
        if parts[0] == "decoder":
            if parts[1] in ("lower", "higher"):
                return _cell_name("%s/decoder" % S,
                                  "%s_%s" % (C, parts[1]), parts[2],
                                  parts[3:]), None
            if parts[1] == "context_att":
                return "%s/decoder/context_att/%s" \
                    % (S, _linear_leaf(parts[2:])), None
            if parts[1] == "attention":
                return "%s/decoder/attention/%s/%s" \
                    % (S, parts[2], _linear_leaf(parts[3:])), None
        if parts[0] == "pre_logits":
            # ours: per-input ws over [outputs(d), contexts(dm), inputs(e)];
            # TF: one concat W (rnnsearch.py:118-119)
            dm = 2 * d if not cfg["caencoder"] else d
            widths = [d, dm, e]
            if parts[1] == "b":
                return "%s/pre_logits/b_0" % S, None
            i = int(parts[2])
            lo = sum(widths[:i])
            return "%s/pre_logits/W_0_0" % S, (lo, lo + widths[i])

    if model == "deepnmt":
        if parts[0] == "encoder":
            layer, rest = parts[1], parts[2:]
            base = "%s/encoder/layer_%s" % (S, layer)
            if rest[0] == "forward":
                return _cell_name("%s/forward" % base, C, rest[1],
                                  rest[2:]), None
            if rest[0] == "backward":
                if rest[1] in ("lower", "higher"):
                    return _cell_name("%s/backward" % base,
                                      "%s_%s" % (C, rest[1]), rest[2],
                                      rest[3:]), None
                return _cell_name("%s/backward" % base, C, rest[1],
                                  rest[2:]), None
            if rest[0] == "ff":
                return "%s/ff/%s" % (base, _linear_leaf(rest[1:])), None
            if rest[0] == "ln":
                return "%s/ln/%s" % (base, rest[1]), None
        if parts[0] == "x_map":
            return "%s/x_map/%s" % (S, _linear_leaf(parts[1:])), None
        if parts[0] == "x_map_ln":
            return "%s/layer_norm/%s" % (S, parts[1]), None
        if parts[0] == "decoder_init":
            # get_init_state(x=z, scope="layer_l") runs at function level
            # (deepnmt.py:93-96 return statement, outside the with)
            return "%s/layer_%s_init/%s" % (S, parts[1],
                                            _linear_leaf(parts[2:])), None
        if parts[0] == "decoder":
            layer, rest = parts[1], parts[2:]
            base = "%s/decoder/layer_%s" % (S, layer)
            if rest[0] == "cond":
                if rest[1] in ("lower", "higher"):
                    return _cell_name(base, "%s_%s" % (C, rest[1]),
                                      rest[2], rest[3:]), None
                if rest[1] == "context_att":
                    return "%s/context_att/%s" \
                        % (base, _linear_leaf(rest[2:])), None
                if rest[1] == "attention":
                    return "%s/attention/%s/%s" \
                        % (base, rest[2], _linear_leaf(rest[3:])), None
            if rest[0] == "rnn":  # non-caencoder upper decoder layers
                return _cell_name(base, C, rest[1], rest[2:]), None
            if rest[0] == "ff":
                return "%s/ff/%s" % (base, _linear_leaf(rest[1:])), None
            if rest[0] == "ln":
                return "%s/ln/%s" % (base, rest[1]), None
        if parts[0] == "redict":
            # dl4mt readout over concat [x(e), c(dm)] (deepnmt.py:176-177)
            return "%s/ff/%s" % (S, _linear_leaf(parts[1:])), None

    if model == "rnnsearch_deepatt":
        if parts[0] == "enc0":
            return _cell_name("%s/encoder/layer_0" % S, C, parts[1],
                              parts[2:]), None
        if parts[0] == "encoder":
            layer, rest = int(parts[1]), parts[2:]
            base = "%s/encoder/layer_%d" % (S, layer + 1)
            return _cell_name(base, "%s_%s" % (C, rest[0]), rest[1],
                              rest[2:]), None
        if parts[0] == "decoder_init":
            # get_init_state(x=z, scope="dec_init_state") at function level
            return "%s/dec_init_state_init/%s" \
                % (S, _linear_leaf(parts[1:])), None
        if parts[0] == "dec_lower":
            return _cell_name("%s/decoder" % S, "%s_lower" % C, parts[1],
                              parts[2:]), None
        if parts[0] == "dec_higher":
            return _cell_name("%s/decoder" % S,
                              "%s_higher_%s" % (C, parts[1]), parts[2],
                              parts[3:]), None
        if parts[0] == "context_att":
            return "%s/decoder/context_att/%s" \
                % (S, _linear_leaf(parts[1:])), None
        if parts[0] == "dec_att":
            return "%s/decoder/deep_attention_%s/%s/%s" \
                % (S, parts[1], parts[2], _linear_leaf(parts[3:])), None
        if parts[0] == "ff":
            # readout over concat [x(d), c(depth*d), inputs(e)]
            # (rnnsearch_deepatt.py:288)
            widths = [d, cfg["num_decoder_layer"] * d, e]
            if parts[1] == "b":
                return "%s/ff/b_0" % S, None
            i = int(parts[2])
            lo = sum(widths[:i])
            return "%s/ff/W_0_0" % S, (lo, lo + widths[i])

    raise KeyError("no TF mapping for param path %r (model %s)"
                   % (path, model))


def tf_name_for(path: str, scope: str, cfg):
    """zero_tpu param path -> (reference TF variable name, row_slice|None).

    row_slice = (lo, hi) selects rows of the TF tensor (concat-input
    linears that our tree stores as a per-input weight list).
    """
    if cfg["model_name"] in ("rnnsearch", "deepnmt", "rnnsearch_deepatt"):
        return _rnn_name(path, scope, cfg)
    return _transformer_name(path, scope, cfg)


# our param slots with no reference counterpart: left at model init
_DEAD_LEAF = re.compile(r"(^|/)(attention|dec_att/\d+)/feed_memory/")


def import_checkpoint(tf_ckpt: str, out_dir: str, scope: str = "transformer",
                      strict: bool = True) -> dict:
    import jax

    from zero_tpu.config import default_config
    from zero_tpu.models.base import get_model
    from zero_tpu.saver import _write_index
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
    filled, missing, dead = {}, [], []
    used_tf = set()
    for path, leaf in flat[0]:
        pstr = "/".join(str(getattr(q, "key", getattr(q, "idx", q)))
                        for q in path)
        if _DEAD_LEAF.search(pstr):
            dead.append(pstr)
            filled["params/" + pstr] = np.asarray(leaf)
            continue
        tf_name, rows = tf_name_for(pstr, scope, inferred)
        if tf_name not in tf_vars:
            missing.append((pstr, tf_name))
            filled["params/" + pstr] = np.asarray(leaf)
            continue
        used_tf.add(tf_name)
        arr = tf_vars[tf_name]
        if rows is not None:
            arr = arr[rows[0]:rows[1]]
        if tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError("shape mismatch %s%s: tf %s vs model %s"
                             % (tf_name, "" if rows is None else rows,
                                arr.shape, leaf.shape))
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
            "missing": missing, "dead": dead, "out": path,
            "unused_tf_vars": sorted(set(tf_vars) - used_tf)}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("tf_checkpoint", help="TF checkpoint prefix")
    ap.add_argument("out_dir")
    ap.add_argument("--scope", default="transformer")
    ap.add_argument("--lenient", action="store_true")
    args = ap.parse_args()
    info = import_checkpoint(args.tf_checkpoint, args.out_dir,
                             scope=args.scope, strict=not args.lenient)
    print("imported %d tensors (%s %dL/%dL h%d) -> %s"
          % (info["n_params"], info["model"]["model_name"],
             info["model"]["num_encoder_layer"],
             info["model"]["num_decoder_layer"],
             info["model"]["hidden_size"], info["out"]))
    if info["missing"]:
        print("missing:", info["missing"])
    if info["unused_tf_vars"]:
        print("unused tf vars:", info["unused_tf_vars"])


if __name__ == "__main__":
    main()
