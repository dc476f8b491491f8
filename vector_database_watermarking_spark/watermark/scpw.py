"""SCPW baseline: correlated-noise (distribution-preserving) watermark
(SURVEY C4/C5, ``/root/reference/SCPW.py``).

Scheme: vectors group by a keyed hash of a content id built from the
first ``top_k`` dims (``SCPW.py:73-84``); the hidden bit of a vector is
the md5-parity of the value at the watermark dimension XOR'd with the
dimension's parity (``SCPW.py:120-128``); embedding adds
distribution-preserving noise ``e = kx·x + k1·u + k2`` (``found_e``,
``SCPW.py:31-62``) to that dimension, re-drawing until the parity
expresses the wanted bit (``SCPW.py:217-222``).

Documented deviations:
- **Parity terms, reference-exact**: extraction hashes the value at
  the fixed ``position`` and XORs with the *vid-derived* dimension
  parity ``(hash(vid) % d) % 2`` (``SCPW.py:120-128``: ``pos =
  hash_value % len(vector)`` feeds only the XOR term; the value is
  read at the passed ``position``). Both terms are reproduced here, so
  hidden-bit classification matches the reference on
  reference-embedded data, and the rejection loop terminates exactly
  as the reference's does (perturb and read at the same fixed column).
- Noise ``u`` and the rejection re-draws are pure functions of
  (seed, vec_id, attempt), not a shared RNG stream — partitioning-
  invariant (SURVEY §4.2). The rejection loop is bounded at 64
  attempts with a final parity-forcing nudge (probability 2⁻⁶⁴ of
  being reached).
- The parity hash canonicalizes the float through ``str(float32)``
  exactly like the reference (numpy shortest-repr).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import compat_md5_mod, hash60
from ..operators.grouping import decode_bitstring

MAX_REDRAWS = 64


def _scpw_vid(vector: list[float], top_k: int, scale: float = 100.0) -> str:
    """Content id from the *first* ``top_k`` dims (``SCPW.py:73-84``),
    with the same magnitude scaling as the engine-wide content id."""
    return "".join(str(int(abs(float(vector[i])) * scale))[0] for i in range(top_k))


def _parity_bit(value: float, xor_parity: int) -> int:
    """``SCPW.py:120-128``: md5-parity of str(float32 value) XOR the
    vid-derived dimension parity ``(hash(vid) % d) % 2`` (the
    reference's ``pos % 2`` where ``pos = hash_value % len(vector)``)."""
    s = str(np.float32(value))
    h = int(hashlib.md5(s.encode("utf-8")).hexdigest(), 16)
    return (h % 2) ^ xor_parity


def _vid_parity(vid: str, d: int) -> int:
    """The XOR term: ``(hash_re(vid) % d) % 2`` (``SCPW.py:121-122``)."""
    from ..functions.hashing import compat_md5_int

    return (compat_md5_int(vid) % d) % 2


def _noise_params(
    emb: DataFrame, position: int, std_e: float | None
) -> tuple[float, float, float]:
    """``found_e`` coefficients (``SCPW.py:31-62``): e = kx·x + k1·u + k2
    preserves the column's mean/variance while adding σe of noise.

    The construction is real-valued only for σe ≤ 2·σx; ``std_e=None``
    picks σe = σx (always valid). The reference's σe=1.8 presumes
    SIFT-scale column variance."""
    row = emb.select(
        F.avg(F.element_at("embedding", position + 1)).alias("mean"),
        F.var_pop(F.element_at("embedding", position + 1)).alias("var"),
    ).head()
    mean, var = float(row["mean"]), float(row["var"])
    if std_e is None:
        std_e = math.sqrt(var)
    if std_e > 2 * math.sqrt(var):
        raise ValueError(
            f"std_e={std_e} exceeds 2*column_std={2 * math.sqrt(var):.4f}; "
            "the distribution-preserving construction (SCPW.py:48-49) "
            "requires sigma_e <= 2*sigma_x"
        )
    kx = -(std_e**2) / (2 * var)
    k1 = math.sqrt(std_e**2 - kx**2 * var)
    k2 = -kx * mean
    return kx, k1, k2


def _gauss(seed: int, vec_id: int, attempt: int) -> float:
    """Unit gaussian as a pure function of (seed, vec_id, attempt):
    Box-Muller over two keyed 60-bit hashes."""
    def h(tag: str) -> float:
        key = f"{seed}_{vec_id}_{attempt}_{tag}".encode()
        v = int(hashlib.md5(key).hexdigest()[:15], 16)
        return (v + 1) / (2**60 + 2)  # in (0, 1)

    u1, u2 = h("u1"), h("u2")
    return math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.pi * u2)


def classify_scpw(emb: DataFrame, top_k: int, L: int, position: int) -> DataFrame:
    """A1 for SCPW (``group_vectors_and_classify_bits``,
    ``SCPW.py:130-169``) with the fixed-position parity bit."""

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("vid", T.StringType()),
                T.StructField("group_id", T.IntegerType()),
                T.StructField("hidden_bit", T.IntegerType()),
            ]
        )
    )
    def _cls(embs: pd.Series) -> pd.DataFrame:
        vids, gids, bitss = [], [], []
        for vec in embs:
            vec = list(vec)
            vid = _scpw_vid(vec, top_k)
            vids.append(vid)
            gids.append(compat_md5_mod(vid, L))
            bitss.append(_parity_bit(vec[position], _vid_parity(vid, len(vec))))
        return pd.DataFrame({"vid": vids, "group_id": gids, "hidden_bit": bitss})

    return emb.withColumn("_c", _cls(F.col("embedding"))).select(
        "*", "_c.vid", "_c.group_id", "_c.hidden_bit"
    ).drop("_c")


def scpw_embed(
    emb: DataFrame,
    watermark: str,
    strength: float,
    top_k: int = 3,
    position: int = 10,
    std_e: float | None = None,
    seed: int = 20,
) -> tuple[DataFrame, DataFrame]:
    """C4 (``SCPW.watermark_embedding``, ``SCPW.py:179-229``)."""
    L = len(watermark)
    kx, k1, k2 = _noise_params(emb, position, std_e)

    cls = classify_scpw(emb, top_k, L, position)
    wm_arr = F.array(*[F.lit(int(b)) for b in watermark])
    cls = cls.withColumn("wm_bit", F.element_at(wm_arr, F.col("group_id") + 1))

    stats = cls.groupBy("group_id").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum((F.col("hidden_bit") == F.col("wm_bit")).cast("int")).alias("n_have"),
    )
    stats = stats.withColumn(
        "deficit",
        F.least(
            F.greatest(
                F.lit(0),
                F.ceil(F.lit(strength) * F.col("n_total")).cast("long") - F.col("n_have"),
            ),
            F.col("n_total") - F.col("n_have"),
        ),
    )
    avail = cls.filter(F.col("hidden_bit") != F.col("wm_bit")).join(
        F.broadcast(stats.select("group_id", "deficit")), on="group_id"
    )
    order_key = hash60(F.concat_ws("_", F.lit(str(seed)), F.col("vec_id")))
    w = Window.partitionBy("group_id").orderBy(order_key, F.col("vec_id"))
    carriers = (
        avail.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("deficit"))
        .select("vec_id", "group_id", "wm_bit")
    )

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(embs: pd.Series, vec_ids: pd.Series, targets: pd.Series) -> pd.Series:
        out = []
        for vec, vec_id, target in zip(embs, vec_ids, targets):
            if target is None or (isinstance(target, float) and math.isnan(target)):
                out.append(vec)
                continue
            target = int(target)
            v = list(vec)
            xp = _vid_parity(_scpw_vid(v, top_k), len(v))
            x = float(np.float32(v[position]))
            val = x
            for attempt in range(MAX_REDRAWS):
                e = kx * x + k1 * _gauss(seed, int(vec_id), attempt) + k2
                val = float(np.float32(val + e))  # cumulative, like SCPW.py:217-222
                if _parity_bit(val, xp) == target:
                    break
            else:  # parity-forcing nudge (never expected in practice)
                step = abs(val) * 1e-6 + 1e-6
                while _parity_bit(val, xp) != target:
                    val = float(np.float32(val + step))
            v[position] = val
            out.append(v)
        return pd.Series(out)

    tagged = emb.join(
        carriers.select("vec_id", F.col("wm_bit").alias("_target")), on="vec_id", how="left"
    )
    out_cols = list(emb.columns)
    wm_df = tagged.withColumn(
        "embedding", _embed(F.col("embedding"), F.col("vec_id"), F.col("_target").cast("double"))
    ).select(*out_cols)
    return wm_df, carriers


def scpw_extract(
    wm_data: DataFrame, L: int, top_k: int = 3, position: int = 10
) -> str:
    """C5 (``SCPW.watermark_extraction``, ``SCPW.py:231-252``)."""
    cls = classify_scpw(wm_data, top_k, L, position)
    return decode_bitstring(cls, L)
