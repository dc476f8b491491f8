"""Batch embedding generation (north-star extension — SURVEY §2.11).

The reference consumes precomputed SIFT vectors from HDF5
(`watermarking.py:30-37`); the north star names "batch embedding
generation" as the Spark-fit half of a vector pipeline. This module is
that producer: documents → dense vectors via Arrow-batched
``mapInPandas`` — the exact plumbing a real encoder needs (schema,
batching, per-partition model reuse), with the model itself pluggable.

The default model is a deterministic hash-based bag-of-words encoder —
an honest stand-in (this container ships no model runtime) whose
output is nevertheless exactly replayable in SQL, so the whole path is
oracle-checkable end to end: token t contributes the 64 bytes of four
keyed md5 digests (shifted to [-128, 127]) summed per dimension in
INTEGER space (order-free, so partitioning can never flip a float
hash), and the integer sums are L2-normalized in one final double
division per dimension.

Scale shape: one narrow pass — no shuffle at all (tokenize + encode
inside the map task); output partitioning inherits the scan. A real
encoder slots into ``model_fn`` unchanged; batch size is then governed
by ``spark.sql.execution.arrow.maxRecordsPerBatch`` and executor
memory, and the per-partition model load is amortized across batches
exactly as here (the closure initializes once per task, not per row).
"""

from __future__ import annotations

import hashlib
import re
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

#: dims produced by the default encoder: 4 digests × 16 bytes.
DEFAULT_D = 64


def _default_model(token_lists: list[list[str]]) -> np.ndarray:
    """Deterministic bag-of-words encoder (see module docstring).
    Returns a float64 (n, 64) matrix of L2-normalized vectors; rows
    whose token list is empty come back all-zero."""
    out = np.zeros((len(token_lists), DEFAULT_D))
    cache: dict[str, np.ndarray] = {}
    for r, toks in enumerate(token_lists):
        if not toks:
            continue
        s = np.zeros(DEFAULT_D, dtype=np.int64)
        for t in toks:
            v = cache.get(t)
            if v is None:
                raw = b"".join(
                    hashlib.md5(f"enc_{j}_{t}".encode()).digest() for j in range(4)
                )
                v = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
                cache[t] = v
            s += v
        norm = float(np.sqrt((s.astype(np.float64) ** 2).sum()))
        if norm:
            out[r] = s / norm
    return out


def embed_documents(
    docs: DataFrame,
    model_fn: Callable[[list[list[str]]], np.ndarray] | None = None,
    d: int = DEFAULT_D,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, embedding array<double>) — one vector per document
    with at least one token (token-less docs produce no row, matching
    the SQL replay). Tokenization is the engine's canonical form
    (lower, collapse whitespace, split on space)."""
    model = model_fn or _default_model

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            tok_lists = [
                [t for t in re.sub(r"\s+", " ", x.lower()).strip().split(" ") if t]
                for x in pdf[text_col]
            ]
            keep = [i for i, tl in enumerate(tok_lists) if tl]
            if not keep:
                continue
            vecs = model([tok_lists[i] for i in keep])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[keep],
                    "embedding": list(vecs),
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(
        encode, schema="doc_id long, embedding array<double>"
    )
