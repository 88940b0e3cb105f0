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

import numpy as np
import pyarrow as pa
import pyspark.sql.types as T
from pyspark.sql import DataFrame


def bio_decode_py(tags: list[str]) -> list[tuple[str, int, int]]:
    """['B-PER','I-PER','O',...] -> [(type, start, end_exclusive)].

    Accepts both plain BIO and IOBES (the scheme the reference's
    shipped NER datalists use — demo/ner/data/CoNLL2003 tags entities
    'S-LOC' / 'B-PER I-PER E-PER'): 'S-X' is a single-token entity,
    'E-X' extends-and-closes the open X entity. Unknown/inconsistent
    continuations close the open entity (canonical strict reading)."""
    entities = []
    cur_type, cur_start = None, 0
    for i, tag in enumerate(tags):
        if tag.startswith("B-"):
            if cur_type is not None:
                entities.append((cur_type, cur_start, i))
            cur_type, cur_start = tag[2:], i
        elif tag.startswith("S-"):
            if cur_type is not None:
                entities.append((cur_type, cur_start, i))
            entities.append((tag[2:], i, i + 1))
            cur_type = None
        elif tag.startswith("I-") and cur_type == tag[2:]:
            continue
        elif tag.startswith("E-") and cur_type == tag[2:]:
            entities.append((cur_type, cur_start, i + 1))
            cur_type = None
        else:
            if cur_type is not None:
                entities.append((cur_type, cur_start, i))
            cur_type = None
    if cur_type is not None:
        entities.append((cur_type, cur_start, len(tags)))
    return entities


def viterbi_decode_py(
    emissions: np.ndarray,
    transitions: np.ndarray,
    start_transitions: np.ndarray,
    end_transitions: np.ndarray,
) -> list[int]:
    """Max-score tag path through a linear-chain CRF.

    Semantics: davarocr/davar_ner/models/decoders/layers/crf.py:254-335
    (_viterbi_decode) — path score = start[t0] + sum(emission[i, t_i])
    + sum(transitions[t_{i-1}, t_i]) + end[t_last]; forward max-product
    with backpointers, then trace-back. Vectorized over tags per step.
    """
    emissions = np.asarray(emissions, dtype=np.float64)
    n_steps = emissions.shape[0]
    score = start_transitions + emissions[0]
    history = np.zeros((max(n_steps - 1, 0), emissions.shape[1]), dtype=np.int64)
    for i in range(1, n_steps):
        # next[j, k] = best path ending in j, transitioning to k, emitting k
        nxt = score[:, None] + transitions + emissions[i][None, :]
        history[i - 1] = nxt.argmax(axis=0)
        score = nxt.max(axis=0)
    best = int(np.argmax(score + end_transitions))
    path = [best]
    for i in range(n_steps - 2, -1, -1):
        path.append(int(history[i][path[-1]]))
    return path[::-1]


def crf_viterbi_stage(
    df: DataFrame,
    transitions: np.ndarray,
    start_transitions: np.ndarray,
    end_transitions: np.ndarray,
    tag_vocab: list[str],
    emissions_col: str = "emissions",
    out_col: str = "tags",
) -> DataFrame:
    """(..., emissions array<array<double>> [T x K]) -> + tags
    array<string>: the learned-transition CRF decode that fronts the
    reference's NER head. Transition matrices are small model weights —
    closure-captured per batch (the Spark-idiomatic broadcast for
    kilobyte constants); decode is per-row but Arrow-batched, and the
    per-step max-product is vectorized over the tag dimension."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )
    trans = np.asarray(transitions, dtype=np.float64)
    start = np.asarray(start_transitions, dtype=np.float64)
    end = np.asarray(end_transitions, dtype=np.float64)

    def run(batches):
        for batch in batches:
            ems = batch.column(emissions_col).to_pylist()
            tag_rows = [
                [tag_vocab[t] for t in viterbi_decode_py(np.asarray(e), trans, start, end)]
                if e
                else []
                for e in ems
            ]
            arrays = [batch.column(i) for i in range(batch.num_columns)]
            yield pa.RecordBatch.from_arrays(
                arrays + [pa.array(tag_rows, type=pa.list_(pa.string()))],
                names=list(batch.schema.names) + [out_col],
            )

    return df.mapInArrow(run, schema=out_schema)


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
