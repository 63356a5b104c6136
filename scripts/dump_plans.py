"""Dump `.explain("formatted")` for every registered query to
plans/$SPARK_GRAFT_PLANS_ROUND/ (default plans/r15/).

Usage: PYTHONPATH=/root/repo python scripts/dump_plans.py <suffix> [sf_dir] [name...]

Writes plans/r14/<query>_<suffix>.txt (suffix = "before" / "after"). Plans
are pre-execution AQE plans at the bench scale (sf0.1 by default) — the
same artifact the optimization-round judge checks plan claims against.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectrekker_spark.plans import formatted_plan  # noqa: E402
from vectrekker_spark.queries import all_specs  # noqa: E402
from vectrekker_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    n = 0
    for name, spec in sorted(all_specs().items()):
        if only and name not in only:
            continue
        try:
            plan = formatted_plan(spec.spark(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 - record, don't abort the dump
            plan = f"ERROR: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({suffix})\n{plan}\n")
        n += 1
    print(f"wrote {n} plans to {out_dir} (*_{suffix}.txt)")


if __name__ == "__main__":
    main()
