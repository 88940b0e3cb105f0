"""CTC prefix beam search goldens: exact vs brute-force enumeration on
tiny inputs; agreement with greedy on peaked distributions."""

import itertools

import numpy as np
import pytest

from davar_lab_ocr_spark.functions.beam import (
    ctc_beam_search,
    ctc_label_probability,
)
from davar_lab_ocr_spark.functions.text import CTC_CHARSET, ctc_decode_py


def _norm_log(rng, t, v):
    p = rng.random((t, v)) + 1e-3
    p /= p.sum(axis=1, keepdims=True)
    return np.log(p)


def test_beam_matches_bruteforce_map_label():
    """With a full-width beam and no pruning, beam search must return
    the maximum-probability LABEL (summed over alignments)."""
    rng = np.random.default_rng(17)
    for trial in range(15):
        t, v = int(rng.integers(2, 5)), 3  # blank + chars '0','1'
        lp = _norm_log(rng, t, v)
        # enumerate every possible label up to length t
        best_label, best_p = None, -float("inf")
        syms = [1, 2]
        labels = [()]
        for L in range(1, t + 1):
            labels += list(itertools.product(syms, repeat=L))
        for lab in labels:
            p = ctc_label_probability(lp, lab)
            if p > best_p:
                best_p, best_label = p, lab
        want = "".join(CTC_CHARSET[i] for i in best_label)
        got = ctc_beam_search(lp, beam_size=200, cutoff_top_n=None)
        assert got == want, (trial, lp.shape, got, want)


def test_beam_equals_greedy_on_peaked():
    rng = np.random.default_rng(3)
    for _ in range(20):
        t = int(rng.integers(3, 12))
        ids = rng.integers(0, 10, size=t)
        lp = np.full((t, 10), np.log(0.01 / 9))
        lp[np.arange(t), ids] = np.log(0.99)
        greedy = ctc_decode_py(ids.tolist())
        assert ctc_beam_search(lp, beam_size=66, cutoff_top_n=2) == greedy


def test_beam_prefers_summed_paths_over_greedy():
    """The canonical case where greedy is wrong: blank is the argmax at
    every step but the summed mass favors a non-empty label."""
    # V = 2: blank, 'a'. P(blank)=0.6, P(a)=0.4 at both steps.
    lp = np.log(np.array([[0.6, 0.4], [0.6, 0.4]]))
    # greedy: blank,blank -> ''; P('')=0.36
    # P('a') = 0.4*0.6 + 0.6*0.4 + 0.4*0.4 = 0.64 -> beam must pick 'a'
    assert ctc_decode_py([0, 0]) == ""
    assert ctc_beam_search(lp, beam_size=10, cutoff_top_n=None) == "0"[0:0] + CTC_CHARSET[1]


def test_beam_empty_and_single_step():
    lp = np.log(np.array([[0.9, 0.1]]))
    assert ctc_beam_search(lp) == ""
    lp = np.log(np.array([[0.1, 0.9]]))
    assert ctc_beam_search(lp) == CTC_CHARSET[1]


def test_beam_with_lm_matches_brute_force():
    """Shallow-fusion LM: beam argmax must equal exhaustive
    enumeration of labels scored by exact P_ctc(label) + LM terms."""
    import itertools

    import numpy as np

    from davar_lab_ocr_spark.functions.beam import (
        ctc_beam_search,
        ctc_label_probability,
    )

    charset = ["-", "a", "b"]  # blank at 0
    # bigram LM strongly prefers 'ab' transitions and ending in 'b'
    def lm_scorer(prefix, ch):
        last = prefix[-1] if prefix else ""
        if last == "a" and ch == "b":
            return 1.5
        if last == "b" and ch == "a":
            return -2.0
        return 0.0

    def lm_eos(prefix):
        return 0.8 if prefix.endswith("b") else 0.0

    rng = np.random.default_rng(31)
    for trial in range(8):
        lp = np.log(rng.dirichlet(np.ones(3), size=4))  # T=4, V=3

        def total_score(label):
            s = ctc_label_probability(lp, label)
            txt = ""
            for i in label:
                s += lm_scorer(txt, charset[i])
                txt += charset[i]
            return s + lm_eos(txt)

        cands = [
            lab
            for n in range(0, 5)
            for lab in itertools.product((1, 2), repeat=n)
        ]
        want = max(cands, key=total_score)
        got = ctc_beam_search(
            lp, beam_size=64, cutoff_top_n=0, charset=charset,
            lm_scorer=lm_scorer, lm_eos=lm_eos,
        )
        assert got == "".join(charset[i] for i in want), f"trial {trial}"


def test_beam_zero_lm_equals_no_lm():
    # a scorer that always returns 0 exercises the full LM bookkeeping
    # path (per-prefix score + string carry + combined pruning key) and
    # must be decode-identical to the no-LM path on every input
    import numpy as np

    from davar_lab_ocr_spark.functions.beam import ctc_beam_search

    rng = np.random.default_rng(7)
    charset = ["-", "a", "b", "c"]
    for _ in range(10):
        lp = np.log(rng.dirichlet(np.ones(4), size=int(rng.integers(3, 9))))
        assert ctc_beam_search(lp, charset=charset) == ctc_beam_search(
            lp, charset=charset, lm_scorer=lambda p, c: 0.0, lm_eos=lambda p: 0.0
        )


def _dist(pairs, v):
    """log-prob row over vocabulary size v from {id: prob} (rest uniform
    on the leftover mass)."""
    import math

    rest = (1.0 - sum(pairs.values())) / (v - len(pairs))
    return [math.log(pairs.get(i, rest)) for i in range(v)]


def test_lexicon_fused_beam_recovers_lexicon_word():
    """Greedy (and no-LM beam) read 'cax'; fusing the lexicon trie
    recovers 'cat' — the reference's lexicon-corrected decode intent."""
    from davar_lab_ocr_spark.functions.beam import ctc_beam_search, lexicon_lm
    from davar_lab_ocr_spark.functions.text import CTC_CHARSET

    v = len(CTC_CHARSET)
    c, a, t, x = (CTC_CHARSET.index(ch) for ch in "catx")
    lp = np.array([
        _dist({c: 0.95}, v),
        _dist({a: 0.95}, v),
        _dist({x: 0.55, t: 0.42}, v),
    ])
    assert ctc_beam_search(lp, beam_size=8, cutoff_top_n=4) == "cax"
    scorer, eos = lexicon_lm(["cat", "dog"], weight=1.0)
    fused = ctc_beam_search(
        lp, beam_size=8, cutoff_top_n=4, lm_scorer=scorer, lm_eos=eos
    )
    assert fused == "cat"


def test_lexicon_lm_scores():
    import math

    from davar_lab_ocr_spark.functions.beam import lexicon_lm

    scorer, eos = lexicon_lm(["cat", "car", "dog"], weight=1.0, oov_log_prob=-8.0)
    # root has children {c, d}: extending "" with 'c' costs log(1/2)
    assert scorer("", "c") == pytest.approx(-math.log(2))
    # "ca" -> {t, r}: two children
    assert scorer("ca", "t") == pytest.approx(-math.log(2))
    # off-trie characters pay the OOV penalty
    assert scorer("ca", "z") == pytest.approx(-8.0)
    assert scorer("zz", "z") == pytest.approx(-8.0)
    # EOS at a full word is log(1/branching-at-terminal); 'cat' node has
    # only the stop symbol
    assert eos("cat") == pytest.approx(0.0)
    assert eos("ca") == pytest.approx(-8.0)
    # case-insensitive, matching the reference's uppercase comparison
    assert scorer("CA", "T") == pytest.approx(-math.log(2))


def test_lexicon_fusion_does_not_override_confident_evidence():
    """A strongly-supported OOV string must survive fusion (the LM
    biases, it does not dictate)."""
    from davar_lab_ocr_spark.functions.beam import ctc_beam_search, lexicon_lm
    from davar_lab_ocr_spark.functions.text import CTC_CHARSET

    v = len(CTC_CHARSET)
    z, x, q = (CTC_CHARSET.index(ch) for ch in "zxq")
    lp = np.array([
        _dist({z: 0.999}, v),
        _dist({x: 0.999}, v),
        _dist({q: 0.999}, v),
    ])
    scorer, eos = lexicon_lm(["cat"], weight=0.1)
    assert ctc_beam_search(lp, beam_size=8, cutoff_top_n=4,
                           lm_scorer=scorer, lm_eos=eos) == "zxq"
