"""NER span decode: tag sequences -> entity spans.

The reference decodes model output into ``[entity_type, start, end]``
triples (davarocr/davar_ner/core/converters/span_converter.py:89-112;
BIO-style converters elsewhere in davar_ner). We implement the
canonical BIO decode as the operator kernel: a 'B-X' opens an entity,
'I-X' extends it when the open entity is type X, anything else closes
it. End index is exclusive.

Spark shape: an Arrow batch stage over (doc_id, tags array<string>)
rows — decode is per-row sequential but trivially batched; entity
explosion for metrics is plain SQL afterwards.
"""

from __future__ import annotations

import pyarrow as pa
import pyspark.sql.types as T
from pyspark.sql import DataFrame


def bio_decode_py(tags: list[str]) -> list[tuple[str, int, int]]:
    """['B-PER','I-PER','O',...] -> [(type, start, end_exclusive)]."""
    entities = []
    cur_type, cur_start = None, 0
    for i, tag in enumerate(tags):
        if tag.startswith("B-"):
            if cur_type is not None:
                entities.append((cur_type, cur_start, i))
            cur_type, cur_start = tag[2:], i
        elif tag.startswith("I-") and cur_type == tag[2:]:
            continue
        else:
            if cur_type is not None:
                entities.append((cur_type, cur_start, i))
            cur_type = None
    if cur_type is not None:
        entities.append((cur_type, cur_start, len(tags)))
    return entities


ENTITY_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("etype", T.StringType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
        ]
    )
)


def ner_decode_stage(df: DataFrame, tags_col: str = "tags") -> DataFrame:
    """(..., tags array<string>) -> + entities array<struct>."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("entities", ENTITY_TYPE)])
    pa_ent = pa.list_(
        pa.struct([("etype", pa.string()), ("start", pa.int32()), ("end", pa.int32())])
    )

    def run(batches):
        for batch in batches:
            tags = batch.column(tags_col).to_pylist()
            ents = [
                [
                    {"etype": t, "start": s, "end": e}
                    for t, s, e in bio_decode_py(row or [])
                ]
                for row in tags
            ]
            arrays = [batch.column(i) for i in range(batch.num_columns)]
            yield pa.RecordBatch.from_arrays(
                arrays + [pa.array(ents, type=pa_ent)],
                names=list(batch.schema.names) + ["entities"],
            )

    return df.mapInArrow(run, schema=out_schema)
