"""Experiment harnesses (SURVEY C9/C10/A14): robustness grids and
utility-impact measurement.

Reference: ``strength_analysis``/``th_analysis``
(``/root/reference/roubust/roubust.py:226-304``), scheme comparison
(``compare/roubust.py:158-306``), impact (``impact/impact.py:70-171``).

The grid is driver-side orchestration of parameterized DAGs (SURVEY
§3.3). Unlike the reference — which rebuilds its HNSW index in every
cell (its dominant cost) — the loaded base table and the embedded
output are cached across attack proportions, and each cell reuses one
watermarked DataFrame.

Results come back as a DataFrame-able list of dicts; ``to_df`` writes
the grid as a table (the reference pickles nested dicts —
``roubust/roubust.py:262-263``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .operators import attacks
from .operators.grouping import ber
from .operators.knn import knn_edges
from .operators.graph import accessibility_index
from .watermark.tvp import rs_embed, tvp_embed, tvp_extract


@dataclass
class RobustnessResult:
    scheme: str
    attack: str
    strength: float
    th: float
    p: float
    ber: float
    extracted: str = field(repr=False, default="")


def robustness_grid(
    emb: DataFrame,
    watermark: str,
    attack: str = "random_delete",
    scheme: str = "tvp",
    strengths: tuple[float, ...] = (0.7,),
    ths: tuple[float, ...] = (1.0,),
    ps: tuple[float, ...] = (0.1, 0.3, 0.5, 0.8),
    seed: int = 20,
) -> list[RobustnessResult]:
    """C10: embed once per (strength, th), attack per p, extract, BER.

    ``attack`` ∈ {random_delete, adaptive_delete, random_modify,
    adaptive_modify, insertion}.
    """
    L = len(watermark)
    emb = emb.cache()
    results: list[RobustnessResult] = []
    need_ai = attack.startswith("adaptive")
    for strength in strengths:
        for th in ths:
            if scheme == "tvp":
                wm_df, _ = tvp_embed(emb, watermark, strength, th, seed=seed)
            elif scheme == "rs":
                wm_df, _ = rs_embed(emb, watermark, strength, seed=seed)
            else:
                raise ValueError(f"unknown scheme {scheme}")
            wm_df = wm_df.cache()
            ai = None
            if need_ai:
                # the attacker recomputes AI on the (watermarked) data
                edges = knn_edges(wm_df.select("vec_id", "embedding"), k=10)
                ai = accessibility_index(edges, wm_df).select("vec_id", "ai").cache()
            for p in ps:
                attacked = _apply_attack(wm_df, attack, p, ai, seed)
                extracted = tvp_extract(attacked, L, seed=seed)
                results.append(
                    RobustnessResult(
                        scheme, attack, strength, th, p, ber(watermark, extracted), extracted
                    )
                )
            wm_df.unpersist()
            if ai is not None:
                ai.unpersist()
    emb.unpersist()
    return results


def _apply_attack(
    wm_df: DataFrame, attack: str, p: float, ai: DataFrame | None, seed: int
) -> DataFrame:
    if attack == "random_delete":
        return attacks.random_delete(wm_df, p, seed=seed)
    if attack == "adaptive_delete":
        return attacks.adaptive_delete(wm_df, ai, p)
    if attack == "random_modify":
        return attacks.random_modify(wm_df, p, seed=seed)
    if attack == "adaptive_modify":
        return attacks.adaptive_modify(wm_df, ai, p, seed=seed)
    if attack == "insertion":
        n = wm_df.count()
        inserted = attacks.gaussian_insertion(
            wm_df.select("vec_id", "embedding"), int(n * p), seed=seed
        )
        return inserted
    raise ValueError(f"unknown attack {attack}")


def to_df(spark: SparkSession, results: list[RobustnessResult]) -> DataFrame:
    return spark.createDataFrame(
        [
            (r.scheme, r.attack, r.strength, r.th, r.p, r.ber)
            for r in results
        ],
        "scheme string, attack string, strength double, th double, p double, ber double",
    )


def utility_impact(
    emb: DataFrame,
    wm_df: DataFrame,
    carriers: DataFrame,
    k: int = 100,
) -> DataFrame:
    """C9 (``impact/impact.py:70-128``, ``test_erro.py:31-120``): build
    the kNN result before and after embedding; per-carrier missed/extra
    querying vectors (A13, averaged — see stats.carrier_impact)."""
    from .operators.stats import carrier_impact

    before = knn_edges(emb.select("vec_id", "embedding"), k=k)
    after = knn_edges(wm_df.select("vec_id", "embedding"), k=k)
    return carrier_impact(before, after, carriers)
