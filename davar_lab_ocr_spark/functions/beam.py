"""CTC prefix beam search (no language model).

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
) -> str:
    """log_probs: [T, V] log-probability matrix -> best decoded string
    (ids joined via ``charset`` which must include the blank symbol at
    index ``blank``; defaults to functions.text.CTC_CHARSET)."""
    from .text import CTC_CHARSET

    charset = charset or CTC_CHARSET
    lp = np.asarray(log_probs, dtype=np.float64)
    if lp.ndim != 2:
        raise ValueError("log_probs must be [T, V]")
    t_steps, v = lp.shape
    top_n = min(cutoff_top_n, v) if cutoff_top_n else v

    # prefix -> (p_b, p_nb)
    beams: dict[tuple, tuple[float, float]] = {(): (0.0, NEG_INF)}
    for t in range(t_steps):
        step = lp[t]
        tokens = np.argsort(-step)[:top_n]
        nxt: dict[tuple, tuple[float, float]] = {}

        def upd(prefix, p_b=NEG_INF, p_nb=NEG_INF):
            ob, onb = nxt.get(prefix, (NEG_INF, NEG_INF))
            nxt[prefix] = (_logaddexp(ob, p_b), _logaddexp(onb, p_nb))

        for prefix, (p_b, p_nb) in beams.items():
            total = _logaddexp(p_b, p_nb)
            for tok in tokens:
                p = float(step[tok])
                if tok == blank:
                    upd(prefix, p_b=total + p)
                    continue
                last = prefix[-1] if prefix else None
                if tok == last:
                    # repeat w/o blank merges into the SAME prefix
                    upd(prefix, p_nb=p_nb + p)
                    # extension only via the ending-in-blank mass
                    upd(prefix + (int(tok),), p_nb=p_b + p)
                else:
                    upd(prefix + (int(tok),), p_nb=total + p)

        beams = dict(
            sorted(nxt.items(), key=lambda kv: -_logaddexp(*kv[1]))[:beam_size]
        )

    best = max(beams.items(), key=lambda kv: _logaddexp(*kv[1]))[0]
    return "".join(charset[min(i, len(charset) - 1)] for i in best)


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
