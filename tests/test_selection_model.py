"""Model-based test for W1 carrier selection: the DataFrame logic in
``_select_by_ai`` must match an independent per-group Python
simulation of the reference semantics (``select_by_ai``,
``watermarking.py:203-246``): threshold at rank int(n·th) of the
AI-descending order; tier 1 takes passers in vec_id order up to the
deficit; tier 2 backfills non-passers in AI-descending order."""

import math

from pyspark.sql import functions as F

from vector_database_watermarking_spark.functions.hashing import key_dims
from vector_database_watermarking_spark.operators.graph import accessibility_index
from vector_database_watermarking_spark.operators.knn import knn_edges
from vector_database_watermarking_spark.watermark.tvp import (
    _select_by_ai,
    _selection_base,
)

WM = "10101"
SEED = 20


def model_select(rows, th):
    """rows: list of (vec_id, ai, deficit) for one group, any order."""
    rows = sorted(rows)  # vec_id order
    deficit = rows[0][2] if rows else 0
    by_ai = sorted(rows, key=lambda r: (-r[1], r[0]))
    n = len(rows)
    thr_idx = int(n * th) - 1
    thr_ai = by_ai[thr_idx][1] if thr_idx >= 0 else float("-inf")
    selected = []
    for vid, ai, _ in rows:  # data order
        if len(selected) >= deficit:
            break
        if ai >= thr_ai:
            selected.append(vid)
    if len(selected) < deficit:
        chosen = set(selected)
        for vid, ai, _ in by_ai:
            if len(selected) >= deficit:
                break
            if vid not in chosen:
                selected.append(vid)
    return set(selected)


def test_select_by_ai_matches_model(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dims = key_dims(64, SEED)
    edges = knn_edges(emb.select("vec_id", "embedding"), k=10)
    ai = accessibility_index(edges, emb).select("vec_id", "ai")
    for th in (0.1, 0.5, 1.0):
        avail = _selection_base(emb, WM, dims, 0.8).join(ai, on="vec_id")
        got = (
            _select_by_ai(avail, th)
            .select("group_id", "vec_id")
            .collect()
        )
        got_by_group = {}
        for r in got:
            got_by_group.setdefault(r["group_id"], set()).add(r["vec_id"])
        rows = avail.select("group_id", "vec_id", "ai", "deficit").collect()
        groups = {}
        for r in rows:
            groups.setdefault(r["group_id"], []).append(
                (r["vec_id"], r["ai"], r["deficit"])
            )
        for gid, grows in groups.items():
            expect = model_select(grows, th)
            assert got_by_group.get(gid, set()) == expect, (th, gid)
