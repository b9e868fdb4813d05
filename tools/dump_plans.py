"""Dump explain("formatted") for named registry queries to plans/<tag>/.

Usage:
    python tools/dump_plans.py <suffix> <query> [<query> ...]
e.g.
    python tools/dump_plans.py before graph_pagerank_authority

Writes plans/r16/<query>_<suffix>.txt. SF dir from $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1), cores from $SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

ROUND = "r16"


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import io
    from contextlib import redirect_stdout

    from workbench_spark.session import get_spark
    from workbench_spark import queries as registry

    spark = get_spark()
    out_dir = _REPO / "plans" / ROUND
    out_dir.mkdir(parents=True, exist_ok=True)
    q = registry.queries()
    for name in names:
        df = q[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote plans/{ROUND}/{name}_{suffix}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
