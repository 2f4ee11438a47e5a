"""Metric tests: BLEU/OTEM/UTEM/chrF sanity + known-value checks."""

import math

import pytest

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


# ---- detokenized BLEU (v13a) -------------------------------------------------

_DETOK_HYP = [
    'The U.S. costs $1,234.56, right?',
    'He said: "Hello, world" - isn\'t it nice?',
    'Der 2-jährige Hund lief 3.5 km weit.',
    'A&amp;B &lt;tag&gt; &quot;quoted&quot; <skipped> text',
    'Numbers 1.5, 2.5 and 3,000 plus e.g. etc.',
    'no punctuation here',
]
_DETOK_REF0 = [
    'The U.S. cost $1,234.56, right?',
    'He said: "Hello, world" - is it not nice?',
    'Der 2-jährige Hund lief 3,5 km weit.',
    'A&B <tag> "quoted" text',
    'Numbers 1.5, 2.5 and 3,000 plus e.g. etc.',
    'no punctuation there',
]
_DETOK_REF1 = [
    'The US costs $1234.56 right?',
    'He said "Hello world" — wasn\'t it nice?',
    'Der zweijährige Hund lief 3,5 km.',
    'A&B <tag> "quoted" extra text',
    'Numbers 1.5 and 2.5 and 3,000, e.g. etc.',
    'there is no punctuation',
]


def test_v13a_tokenize_rules():
    from zero_tpu.metric import v13a_tokenize
    # periods/commas split unless flanked by digits; SGML entities unescape;
    # <skipped> stripped; digit-dash splits
    assert v13a_tokenize('The U.S. costs $1,234.56, right?') == \
        ['The', 'U', '.', 'S', '.', 'costs', '$', '1,234.56', ',',
         'right', '?']
    assert v13a_tokenize('A&amp;B &lt;t&gt; &quot;q&quot; <skipped> x') == \
        ['A', '&', 'B', '<', 't', '>', '"', 'q', '"', 'x']
    assert v13a_tokenize('2-jährige') == ['2', '-', 'jährige']
    assert v13a_tokenize('pre-war') == ['pre-war']
    assert v13a_tokenize('e.g. 3.5') == ['e', '.', 'g', '.', '3.5']


def test_detok_bleu_matches_perl_golden():
    """Golden value computed with the reference multi-bleu-detok.perl
    (BLEU = 81.75, 95.0/88.9/79.2/71.4, BP=0.983, hyp_len=60, ref_len=61)
    and independently confirmed against sacrebleu 13a (81.75383049272442)."""
    from zero_tpu.metric import detok_bleu
    refs = list(zip(_DETOK_REF0, _DETOK_REF1))
    score = detok_bleu(_DETOK_HYP, refs)
    assert abs(score - 0.8175383049272444) < 1e-9, score


def test_detok_bleu_matches_sacrebleu_if_available():
    sacrebleu = pytest.importorskip("sacrebleu")
    from zero_tpu.metric import detok_bleu
    refs = list(zip(_DETOK_REF0, _DETOK_REF1))
    ours = detok_bleu(_DETOK_HYP, refs) * 100.0
    theirs = sacrebleu.corpus_bleu(
        _DETOK_HYP, [_DETOK_REF0, _DETOK_REF1], tokenize="13a").score
    assert abs(ours - theirs) < 1e-6


def test_detok_bleu_lowercase():
    from zero_tpu.metric import detok_bleu
    assert detok_bleu(["Hello There Big World"],
                      [("hello there big world",)],
                      lowercase=True) > 0.99


def test_detok_cli(tmp_path, capsys):
    import sys
    from zero_tpu import metric as metric_mod
    hyp = tmp_path / "hyp.txt"
    ref = tmp_path / "ref.txt"
    hyp.write_text("\n".join(_DETOK_HYP) + "\n")
    ref.write_text("\n".join(_DETOK_REF0) + "\n")
    argv = sys.argv
    sys.argv = ["metric", "--detok", str(hyp), str(ref)]
    try:
        metric_mod.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "detok BLEU-4 (v13a):" in out
