"""End-to-end walkthrough of the engine through the reference-shaped
API: embed → verify → attack → re-extract → measure utility impact.

Usage: python tools/demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_database_watermarking_spark import api
from vector_database_watermarking_spark.experiments import utility_impact
from vector_database_watermarking_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("demo")
    watermark, seed = "1011001", 20

    data = api.load_data(spark, sf_dir).cache()
    print(f"collection: {data.count()} vectors, d={len(data.select('embedding').head()[0])}")

    wm_df, L, carriers, _, ai = api.watermark_embedding_by_ai(
        data, strength=0.7, th=1.0, watermark=watermark, random_seed=seed
    )
    wm_df = wm_df.cache()
    print(f"embedded {watermark!r} via {carriers.count()} carriers")

    extracted = api.watermark_extraction(wm_df, L, random_seed=seed)
    print(f"clean extraction: {extracted!r}  BER={api.BER(watermark, extracted)}")

    for attack, attacked in [
        ("random deletion p=0.3", api.random_dele(wm_df, 0.3)),
        ("adaptive deletion p=0.3", api.adaptive_dele(wm_df, 0.3, ai)),
        ("modification p=0.3", api.random_modify(wm_df, 0.3)),
        ("insertion p=0.5", api.adaptive_insertion(wm_df, 0.5)),
    ]:
        ex = api.watermark_extraction(attacked, L, random_seed=seed)
        print(f"after {attack}: {ex!r}  BER={api.BER(watermark, ex):.3f}")

    impact = utility_impact(data, wm_df, carriers, k=50)
    row = impact.agg({"missed": "avg", "false_hits": "avg"}).head()
    print(
        f"ANN utility impact per carrier (k=50): missed={row[0]:.2f} "
        f"false={row[1]:.2f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
