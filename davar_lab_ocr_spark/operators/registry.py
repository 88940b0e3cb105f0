"""Stage registry — the Spark analog of the reference's mmcv registries
(PREPROCESS / POSTPROCESS / CONVERTERS, davarocr/davar_common/core/
builder.py:13-15). A stage is any ``DataFrame -> DataFrame`` callable;
pipeline configs (lists of stage names + kwargs) compile to a chain.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

STAGES: dict[str, Callable] = {}


def register_stage(name: str):
    def deco(fn):
        STAGES[name] = fn
        return fn

    return deco


def compose(stage_cfgs: list[dict]) -> Callable[[DataFrame], DataFrame]:
    """[{'type': name, **kwargs}, ...] -> chained DataFrame transform
    (mirrors mmcv Compose over the pipeline config)."""

    def run(df: DataFrame) -> DataFrame:
        for cfg in stage_cfgs:
            cfg = dict(cfg)
            fn = STAGES[cfg.pop("type")]
            df = fn(df, **cfg)
        return df

    return run
