"""Dump .explain("formatted") for every headline query to
plans/r15/<query>_<suffix>.txt (suffix = argv[1], default "before").

Usage: python tools/r15_plans.py [before|after] [sf_dir] [query ...]
"""
import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from bench import HEADLINE
    from financedatabase_spark.plans.registry import QUERIES
    from financedatabase_spark.session import get_spark

    names = sys.argv[3:] or HEADLINE
    out_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r15_plans")
    for name in names:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            QUERIES[name](spark, sf_dir).explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
