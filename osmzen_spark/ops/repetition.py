"""Repetition filters for training-data curation (Gopher-style):
per-document word n-gram repetition statistics used to drop
boilerplate / template / spam documents before training.

Two standard signals over word n-grams (documents here are
single-space word streams, so line-level duplicates degenerate —
n-gram coverage is the meaningful repetition axis):

* top_bigram_frac  — fraction of all bigram occurrences taken by the
  single most frequent bigram (high -> "foo bar foo bar ..." spam).
* dup_trigram_frac — fraction of trigram occurrences whose trigram
  appears more than once in the document (high -> copy-pasted /
  templated text).

Scale shape: every statistic is DOC-LOCAL — no gram ever needs to
meet a gram from another document — so the operator is ONE
embarrassingly-parallel Arrow pass (mapInArrow, np.unique per doc),
zero shuffles, and scales linearly to 100 TB with the scan. The
obvious explode -> groupBy(doc, gram) formulation was measured 2-5x
slower even at sf0.1 (it shuffles ~20x the corpus size in string keys
for an aggregation whose keys never cross documents) and was
rejected; see BASELINE.md round-1 lesson "don't hand Catalyst work
that never crosses rows".

Determinism: fractions are exact-integer-valued doubles divided once
(IEEE division is exactly rounded), and splitting is on the literal
single space — both identical in the DuckDB oracle, so the value hash
is bit-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_STATS_SCHEMA = T.StructType(
    [
        T.StructField("__rep_id", T.LongType()),
        T.StructField("n_bigrams", T.LongType()),
        T.StructField("top_bigram_n", T.LongType()),
        T.StructField("top_bigram_frac", T.DoubleType()),
        T.StructField("dup_trigram_frac", T.DoubleType()),
    ]
)


def _doc_stats(text: str) -> tuple[int, int, float, float]:
    words = text.split(" ")
    nw = len(words)
    if nw < 2:
        return 0, 0, 0.0, 0.0
    # join is only a per-doc counting key; '\x00' cannot appear in words
    big = np.array(["\x00".join(p) for p in zip(words, words[1:])])
    _, bc = np.unique(big, return_counts=True)
    n_b = int(bc.sum())
    top_b = int(bc.max())
    top_frac = top_b / max(n_b, 1)
    if nw < 3:
        return n_b, top_b, top_frac, 0.0
    tri = np.array(["\x00".join(p) for p in zip(words, words[1:], words[2:])])
    _, tc = np.unique(tri, return_counts=True)
    dup_frac = int(tc[tc > 1].sum()) / max(int(tc.sum()), 1)
    return n_b, top_b, top_frac, dup_frac


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition statistics:
    (id, n_bigrams, top_bigram_n, top_bigram_frac, dup_trigram_frac).
    One Arrow pass, no shuffle (see module doc)."""

    def mapper(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            texts = batch.column(1).to_pylist()
            out = [_doc_stats(t if t is not None else "") for t in texts]
            n_b, top_b, top_f, dup_f = zip(*out) if out else ((), (), (), ())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.asarray(ids, dtype=np.int64)),
                    pa.array(np.asarray(n_b, dtype=np.int64)),
                    pa.array(np.asarray(top_b, dtype=np.int64)),
                    pa.array(np.asarray(top_f, dtype=np.float64)),
                    pa.array(np.asarray(dup_f, dtype=np.float64)),
                ],
                names=[f.name for f in _STATS_SCHEMA.fields],
            )

    return (
        df.select(F.col(id_col).cast("long"), F.col(text_col))
        .mapInArrow(mapper, schema=_STATS_SCHEMA)
        .withColumnRenamed("__rep_id", id_col)
    )


def repetition_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_top_bigram_frac: float = 0.18,
    max_dup_trigram_frac: float = 0.30,
) -> DataFrame:
    """Keep documents under both repetition ceilings (the curation
    gate): semi-join of the fact table against the passing stats, so
    the text column itself is never reshuffled."""
    stats = repetition_stats(df, id_col=id_col, text_col=text_col)
    passing = stats.filter(
        (F.col("top_bigram_frac") <= max_top_bigram_frac)
        & (F.col("dup_trigram_frac") <= max_dup_trigram_frac)
    ).select(id_col)
    return df.join(passing, on=id_col, how="left_semi")
