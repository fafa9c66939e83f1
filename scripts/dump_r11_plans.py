"""Capture .explain('formatted') for named queries into plans/r11/.

Usage: python scripts/dump_r11_plans.py before|after name [name...]
Writes /root/repo/plans/r11/<name>_<suffix>.txt for each query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from big_data_audio_classification_spark.plans.introspect import formatted_plan
from big_data_audio_classification_spark.registry import all_queries
from big_data_audio_classification_spark.session import get_spark

OUT = "/root/repo/plans/r11"


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-r11-plans")
    qs = all_queries()
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        plan = formatted_plan(qs[name].fn(spark, sf_dir))
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
