"""Capture .explain("formatted") for every headline lane into
plans/r09/<query>_<tag>.txt — the optimization round's before/after
plan evidence (judge checks plan-shape claims against these files).

Usage: python tools/capture_plans_r09.py <before|after> [sf_dir] [lane ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from bench import HEADLINE, headline_impls
    from tcdb_spark.session import get_spark

    lanes = sys.argv[3:] or HEADLINE
    spark = get_spark("plan-capture")
    impls = headline_impls()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r09")
    os.makedirs(out_dir, exist_ok=True)
    for name in lanes:
        df = impls[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"captured {name}_{tag}")


if __name__ == "__main__":
    main()
