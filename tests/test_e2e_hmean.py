"""End-to-end spotting evaluation goldens (semantics:
davarocr/davar_spotting/core/evaluation/e2e_hmean.py:111-357) —
transcription tolerance rules, word-spotting dictionary demotion, and
the corpus det/spot hmean on a hand-computed fixture."""

import pytest

from davar_lab_ocr_spark.functions.text import (
    dictionary_transcription,
    include_in_dictionary,
    transcription_match,
)
from davar_lab_ocr_spark.operators.metrics import e2e_hmean
from davar_lab_ocr_spark.schemas import EVAL_PAIRS


def test_transcription_match_first_last_rules():
    assert transcription_match("APPLE", "APPLE")
    # GT-side specials forgiven at first/last position only
    assert transcription_match("(HELLO", "HELLO")
    assert transcription_match("HELLO)", "HELLO")
    assert transcription_match("(HELLO)", "HELLO")
    assert transcription_match("((X", "(X")  # exactly one leading char removed
    assert not transcription_match("((X", "X")
    # det-side specials are NOT forgiven in first/last mode
    assert not transcription_match("HELLO", "(HELLO")
    # iterative strip mode removes from both sides of both strings
    assert transcription_match("((X", "X", only_remove_first_last_gt=False)
    assert transcription_match("X", "(X))", only_remove_first_last_gt=False)


def test_include_in_dictionary_rules():
    assert include_in_dictionary("hello")
    assert not include_in_dictionary("he")  # < MIN_LENGTH_CARE_WORD
    assert not include_in_dictionary("ab1c")  # digit outside ranges
    assert not include_in_dictionary("a.b c")  # inner space after replace
    assert include_in_dictionary("dog's")  # 's termination stripped
    assert include_in_dictionary("-dash-")  # hyphens stripped at ends
    assert not include_in_dictionary("a×b")  # forbidden multiplication sign
    assert dictionary_transcription("dog's") == "dog"
    assert dictionary_transcription("(hello)") == "hello"


def _rect(x0, y0, x1, y1):
    return [float(x0), float(y0), float(x1), float(y0), float(x1), float(y1), float(x0), float(y1)]


@pytest.fixture()
def planted_pairs(spark):
    gt = [
        {"poly": _rect(0, 0, 100, 30), "care": 1, "text": "apple"},
        {"poly": _rect(200, 0, 300, 30), "care": 1, "text": "###"},
        {"poly": _rect(0, 100, 100, 130), "care": 1, "text": "(hello"},
        {"poly": _rect(200, 100, 320, 130), "care": 1, "text": "ab"},  # dict-ineligible
    ]
    pred = [
        {"poly": _rect(0, 0, 100, 30), "conf": 0.9, "text": "apple"},
        {"poly": _rect(210, 5, 290, 25), "conf": 0.8, "text": "x"},  # inside '###'
        {"poly": _rect(0, 100, 100, 130), "conf": 0.7, "text": "hello"},
        {"poly": _rect(200, 100, 320, 130), "conf": 0.6, "text": "wrong"},
    ]
    return spark.createDataFrame([{"doc_id": "d1", "pred": pred, "gt": gt}], schema=EVAL_PAIRS)


def test_e2e_hmean_default_mode(planted_pairs):
    # care gt = {apple, (hello, ab}; det b is don't-care (inside ###);
    # 3 matches, transcription correct for apple and (hello only
    row = e2e_hmean(planted_pairs).collect()[0]
    assert row["det_precision"] == 1.0
    assert row["det_recall"] == 1.0
    assert row["det_hmean"] == 1.0
    assert row["spot_precision"] == round(2 / 3, 6)
    assert row["spot_recall"] == round(2 / 3, 6)
    assert row["spot_hmean"] == round(2 / 3, 6)


def test_e2e_hmean_word_spotting(planted_pairs):
    # 'ab' demoted to don't-care -> det 'wrong' overlaps it and is
    # demoted too; '(hello' normalizes to 'hello' -> everything correct
    row = e2e_hmean(planted_pairs, word_spotting=True).collect()[0]
    assert row["det_hmean"] == 1.0
    assert row["spot_precision"] == 1.0
    assert row["spot_recall"] == 1.0
    assert row["spot_hmean"] == 1.0
