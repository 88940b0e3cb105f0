"""Projection / filter operators (pure pyspark.sql expressions).

Reference semantics: davar_custom.py:182-207 (_filter_imgs),
davar_loading.py:242 (_load_cares), davar_custom.py:315-319
(poly->rect), davar_loading.py:763-830 (text filters).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def filter_docs(df: DataFrame, min_size: int = 32) -> DataFrame:
    """Drop gif docs, docs below min side, docs without cared regions."""
    cared = F.size(F.filter("regions", lambda r: r["care"] == 1))
    return df.filter(
        (~F.col("doc_id").endswith(".gif"))
        & (F.least("width", "height") >= min_size)
        & (cared > 0)
    )


def care_split(df: DataFrame, regions_col: str = "regions") -> DataFrame:
    """Split the region array into cared / ignored sub-arrays
    (higher-order filter; no explode, no shuffle)."""
    return df.withColumn(
        "regions_care", F.filter(regions_col, lambda r: r["care"] == 1)
    ).withColumn("regions_ignore", F.filter(regions_col, lambda r: r["care"] != 1))


def poly_to_rect_cols(poly_col) -> list:
    """2N-point polygon array -> (x0, y0, x1, y1) columns: min/max of
    even/odd coordinate positions, pure SQL."""
    xs = F.filter(poly_col, lambda _v, i: i % 2 == 0)
    ys = F.filter(poly_col, lambda _v, i: i % 2 == 1)
    return [
        F.array_min(xs).alias("x0"),
        F.array_min(ys).alias("y0"),
        F.array_max(xs).alias("x1"),
        F.array_max(ys).alias("y1"),
    ]


def filter_texts(
    df: DataFrame,
    text_col: str = "text",
    max_len: int | None = None,
    charset: str | None = None,
    lowercase: bool = False,
) -> DataFrame:
    """Recognition-datalist text filters: length cap, unsupported-char
    drop, case fold (davar_rcg_dataset.py:301-489 flavors)."""
    out = df
    if lowercase:
        out = out.withColumn(text_col, F.lower(F.col(text_col)))
    if max_len is not None:
        out = out.filter(F.length(text_col) <= max_len)
    if charset is not None:
        out = out.filter(~F.col(text_col).rlike(_charset_class(charset)))
    return out


def _charset_class(charset: str) -> str:
    """Validate a user charset (a regex character-class BODY like
    'a-z0-9') and return the negated class pattern. Fails fast at plan
    time instead of a runtime PatternSyntaxException on executors."""
    import re

    pattern = f"[^{charset}]"
    try:
        re.compile(pattern)
    except re.error as exc:
        raise ValueError(f"invalid charset {charset!r}: {exc}") from exc
    return pattern
