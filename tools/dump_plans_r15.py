"""Dump .explain("formatted") per-query plan files for the r15
optimization round's before/after evidence:

    python tools/dump_plans_r15.py <before|after> [sf_dir] [name ...]

Writes plans/r15/<query>_<tag>.txt for every HEADLINE query (or just the
named ones).  Same escaping rules as tools/dump_plans.py.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, RESOLVE  # noqa: E402
from img2dataset_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    names = sys.argv[3:] or HEADLINE
    spark = get_spark(app_name="dump_plans_r15")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15",
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = RESOLVE[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue().strip()
        plan = "".join(
            c if c in "\n\t" or ord(c) >= 32 else f"\\x{ord(c):02x}"
            for c in plan
        )
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan + "\n")
        print(name, flush=True)
    print(f"wrote {len(names)} plans to {outdir}")


if __name__ == "__main__":
    main()
