"""Shared test fixtures: tiny configs and toy vocabularies."""

import numpy as np

from zero_tpu.config import default_config
from zero_tpu.vocab import Vocab


def tiny_vocab(n_words: int = 20) -> Vocab:
    v = Vocab()
    for i in range(n_words):
        v.insert("w%d" % i)
    return v


def tiny_config(**overrides):
    cfg = default_config()
    cfg.hidden_size = 16
    cfg.embed_size = 16
    cfg.filter_size = 32
    cfg.num_heads = 2
    cfg.num_encoder_layer = 2
    cfg.num_decoder_layer = 2
    cfg.dropout = 0.1
    cfg.relu_dropout = 0.1
    cfg.residual_dropout = 0.1
    cfg.attention_dropout = 0.1
    cfg.label_smooth = 0.1
    cfg.beam_size = 3
    cfg.decode_length = 8
    cfg.decode_max_len = 32
    cfg.max_len = 16
    cfg.src_vocab = tiny_vocab()
    cfg.tgt_vocab = tiny_vocab()
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg


def toy_batch(rs=None, batch=4, src_len=7, tgt_len=6, vocab=20):
    rs = rs or np.random.RandomState(0)
    src = rs.randint(3, vocab, (batch, src_len)).astype(np.int32)
    tgt = rs.randint(3, vocab, (batch, tgt_len)).astype(np.int32)
    # realistic padding + eos structure
    for i in range(batch):
        ls = rs.randint(2, src_len)
        lt = rs.randint(2, tgt_len)
        src[i, ls:] = 0
        tgt[i, lt:] = 0
        src[i, ls - 1] = 2
        tgt[i, lt - 1] = 2
    return {"source": src, "target": tgt}
