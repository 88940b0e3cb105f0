"""CTC prefix beam search with optional shallow-fusion language model.

The classic prefix beam search (public algorithm; reference wrapper
ctc_converter.py:210-334 with beam_size=66, cutoff_top_n=2): per
prefix keep (log p ending-in-blank, log p ending-in-non-blank); at
each timestep extend with the top-``cutoff_top_n`` tokens, with the
CTC merge rules (repeat w/o blank merges into the same prefix; repeat
after blank extends), then keep the ``beam_size`` best prefixes by
total probability.
"""

from __future__ import annotations

import math

import numpy as np

NEG_INF = -float("inf")

_END = "\0"  # trie terminal marker


def lexicon_lm(words: list[str], weight: float = 1.0, oov_log_prob: float = -8.0):
    """Build shallow-fusion (lm_scorer, lm_eos) hooks from a word list —
    the lexicon-corrected decode intent of the reference's vocabulary
    filter (davar_videotext/tools/filter.py:88-105 picks the nearest
    lexicon word post-hoc; fusing the lexicon INTO the beam biases the
    search toward lexicon words during decoding instead).

    The lexicon becomes a prefix trie. Extending a prefix along the
    trie scores log(1/branching) at that node (a proper next-char
    distribution, uniform over children plus the stop symbol at word
    ends); stepping off the trie scores ``oov_log_prob`` per character,
    as does ending at a non-word. ``weight`` is the fusion weight
    lambda. Matching is case-insensitive (the reference uppercases
    before lexicon comparison, filter.py:57).

    At cluster scale the word list rides to executors as a broadcast
    variable and the trie builds once per worker — it is plain python
    data, so nothing here needs Spark to test."""
    import math

    root: dict = {}
    for w in words:
        node = root
        for ch in w.upper():
            node = node.setdefault(ch, {})
        node[_END] = {}

    cache: dict[str, dict | None] = {"": root}

    def node_for(prefix: str):
        if prefix in cache:
            return cache[prefix]
        parent = node_for(prefix[:-1])
        node = parent.get(prefix[-1].upper()) if parent is not None else None
        cache[prefix] = node
        return node

    def scorer(prefix: str, ch: str) -> float:
        node = node_for(prefix)
        child = node.get(ch.upper()) if node is not None else None
        if child is None:
            return weight * oov_log_prob
        return weight * -math.log(len(node))

    def eos(prefix: str) -> float:
        node = node_for(prefix)
        if node is None or _END not in node:
            return weight * oov_log_prob
        return weight * -math.log(len(node))

    return scorer, eos


def _logaddexp(a: float, b: float) -> float:
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    m = max(a, b)
    return m + math.log1p(math.exp(min(a, b) - m))


def ctc_beam_search(
    log_probs: np.ndarray,
    beam_size: int = 66,
    blank: int = 0,
    cutoff_top_n: int = 2,
    charset: list[str] | None = None,
    lm_scorer=None,
    lm_eos=None,
) -> str:
    """log_probs: [T, V] log-probability matrix -> best decoded string
    (ids joined via ``charset`` which must include the blank symbol at
    index ``blank``; defaults to functions.text.CTC_CHARSET).

    Optional shallow-fusion LM (ctc_converter.py:210-327 semantics):
    ``lm_scorer(prefix_str, next_char) -> log-prob increment`` is added
    to a prefix's LM score each time a NEW character extends it (never
    on blanks or merged repeats), and the combined ctc+lm score drives
    both beam pruning and the final argmax; ``lm_eos(prefix_str) ->
    log-prob`` adds the end-of-sequence term at finalization."""
    from .text import CTC_CHARSET

    charset = charset or CTC_CHARSET
    lp = np.asarray(log_probs, dtype=np.float64)
    if lp.ndim != 2:
        raise ValueError("log_probs must be [T, V]")
    t_steps, v = lp.shape
    top_n = min(cutoff_top_n, v) if cutoff_top_n else v

    def to_str(prefix):
        return "".join(charset[min(i, len(charset) - 1)] for i in prefix)

    # prefix -> (p_b, p_nb); lm score and decoded string carried per
    # prefix (both are path-invariant — they depend only on the prefix
    # characters — so a single slot per prefix is exact, and carrying
    # the string incrementally avoids an O(len) rebuild per extension)
    beams: dict[tuple, tuple[float, float]] = {(): (0.0, NEG_INF)}
    lm: dict[tuple, float] = {(): 0.0}
    strs: dict[tuple, str] = {(): ""}
    for t in range(t_steps):
        step = lp[t]
        tokens = np.argsort(-step)[:top_n]
        nxt: dict[tuple, tuple[float, float]] = {}
        nxt_lm: dict[tuple, float] = {}
        nxt_strs: dict[tuple, str] = {}

        def upd(prefix, parent, tok=None, p_b=NEG_INF, p_nb=NEG_INF):
            ob, onb = nxt.get(prefix, (NEG_INF, NEG_INF))
            nxt[prefix] = (_logaddexp(ob, p_b), _logaddexp(onb, p_nb))
            if prefix not in nxt_lm:
                if tok is None:
                    nxt_lm[prefix] = lm[parent]
                    nxt_strs[prefix] = strs[parent]
                else:
                    ch = charset[min(tok, len(charset) - 1)]
                    inc = lm_scorer(strs[parent], ch) if lm_scorer else 0.0
                    nxt_lm[prefix] = lm[parent] + inc
                    nxt_strs[prefix] = strs[parent] + ch

        for prefix, (p_b, p_nb) in beams.items():
            total = _logaddexp(p_b, p_nb)
            for tok in tokens:
                p = float(step[tok])
                if tok == blank:
                    upd(prefix, prefix, p_b=total + p)
                    continue
                last = prefix[-1] if prefix else None
                if tok == last:
                    # repeat w/o blank merges into the SAME prefix
                    upd(prefix, prefix, p_nb=p_nb + p)
                    # extension only via the ending-in-blank mass
                    upd(prefix + (int(tok),), prefix, tok=int(tok), p_nb=p_b + p)
                else:
                    upd(prefix + (int(tok),), prefix, tok=int(tok), p_nb=total + p)

        ranked = sorted(
            nxt.items(), key=lambda kv: -(_logaddexp(*kv[1]) + nxt_lm[kv[0]])
        )[:beam_size]
        beams = dict(ranked)
        lm = {k: nxt_lm[k] for k, _ in ranked}
        strs = {k: nxt_strs[k] for k, _ in ranked}

    def final_score(kv):
        prefix, (p_b, p_nb) = kv
        s = _logaddexp(p_b, p_nb) + lm[prefix]
        if lm_eos:
            s += lm_eos(strs[prefix])
        return s

    best = max(beams.items(), key=final_score)[0]
    return to_str(best)


def ctc_label_probability(log_probs: np.ndarray, label: tuple, blank: int = 0) -> float:
    """Exact P(label) by brute-force enumeration of ALL alignments —
    exponential; test oracle only."""
    lp = np.asarray(log_probs, dtype=np.float64)
    t_steps, v = lp.shape
    total = NEG_INF

    def collapse(path):
        out, prev = [], None
        for s in path:
            if s != blank and s != prev:
                out.append(s)
            prev = s
        return tuple(out)

    def rec(t, acc, path):
        nonlocal total
        if t == t_steps:
            if collapse(path) == label:
                total = _logaddexp(total, acc)
            return
        for s in range(v):
            rec(t + 1, acc + lp[t, s], path + (s,))

    rec(0, 0.0, ())
    return total
