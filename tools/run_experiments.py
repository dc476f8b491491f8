"""Run the robustness experiment grids (SURVEY C10/A14) and write the
result tables as parquet — the engine's analogue of the reference's
pickled grids (``compare_dele_robust.pkl``, ``Adaptive_*_roubust.pkl``).

Usage:
    python tools/run_experiments.py [sf_dir] [out_dir]

Writes one parquet per attack with schema
(scheme, attack, strength, th, p, ber) plus a JSON summary.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_database_watermarking_spark.experiments import robustness_grid, to_df
from vector_database_watermarking_spark.session import get_spark

WATERMARK = "001010010101001010010"  # L=21, compare/roubust.py:162
PS = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8)
ATTACKS = ("random_delete", "adaptive_delete", "random_modify", "adaptive_modify", "insertion")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "results"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("experiments")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    summary: dict[str, dict[str, list[float]]] = {}
    for scheme in ("tvp", "rs"):
        summary[scheme] = {}
        for attack in ATTACKS:
            if scheme == "rs" and attack.startswith("adaptive"):
                continue  # RS has no AI; reference compares it under random attacks
            res = robustness_grid(
                emb, WATERMARK, attack=attack, scheme=scheme,
                strengths=(0.55,), ths=(1.0,), ps=PS, seed=20,
            )
            df = to_df(spark, res)
            path = os.path.join(out_dir, f"{scheme}_{attack}.parquet")
            df.write.mode("overwrite").parquet(path)
            summary[scheme][attack] = [round(r.ber, 4) for r in res]
            print(scheme, attack, summary[scheme][attack])
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump({"watermark": WATERMARK, "ps": PS, "ber": summary}, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
