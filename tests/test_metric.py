"""Metric tests: BLEU/OTEM/UTEM/chrF sanity + known-value checks."""

import math

from zero_tpu.metric import bleu, chrf, otem, utem


def _toks(*sents):
    return [s.split() for s in sents]


def test_bleu_perfect_match():
    cand = _toks("a b c d e", "f g h i")
    refs = [[c] for c in cand]
    assert abs(bleu(cand, refs) - 1.0) < 1e-9


def test_bleu_no_match():
    cand = _toks("a a a a")
    refs = [[["b", "b", "b", "b"]]]
    assert bleu(cand, refs) < 1e-6


def test_bleu_brevity_penalty():
    # half-length candidate with perfect ngrams gets penalised
    cand = _toks("a b c d")
    refs = [[["a", "b", "c", "d", "e", "f", "g", "h"]]]
    score = bleu(cand, refs)
    assert 0 < score < math.exp(1 - 8 / 4) + 1e-9


def test_bleu_multi_reference_clip():
    cand = _toks("the the the")
    refs = [[["the", "cat"], ["the", "dog", "the"]]]
    # unigram matches clipped at max ref count (2), total 3; closest ref
    # length is 3 so no brevity penalty
    s1 = bleu(cand, refs, n=1)
    assert abs(s1 - 2 / 3) < 1e-9


def test_bleu_closest_ref_length():
    cand = _toks("a b c")
    refs = [[["a", "b", "x"], ["a", "b", "c", "d", "e", "f"]]]
    # closest ref length = 3 -> no BP from the long ref; all unigrams
    # ('a','b' in ref1; 'c' in ref2) match
    s = bleu(cand, refs, n=1)
    assert abs(s - 1.0) < 1e-9


def test_otem_flags_overtranslation():
    good = _toks("a b c")
    over = _toks("a a a b c")
    refs = [[["a", "b", "c"]]]
    assert otem(over, refs) > otem(good, refs)


def test_utem_flags_undertranslation():
    good = _toks("a b c d")
    under = _toks("a b")
    refs = [[["a", "b", "c", "d"]]]
    assert utem(under, refs) > utem(good, refs)


def test_chrf_perfect_and_orders():
    assert abs(chrf(["abcdef"], ["abcdef"]) - 1.0) < 1e-9
    assert chrf(["abcdef"], ["abcdef"]) > chrf(["abcxef"], ["abcdef"])
    assert chrf(["zzzzz"], ["abcde"]) < 0.01
