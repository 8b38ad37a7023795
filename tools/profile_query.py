#!/usr/bin/env python
"""Per-query optimization harness (guide §1): for each named query,
capture .explain('formatted') and time the noop-sink materialization
min-of-N on the engine session. Usage:

  python tools/profile_query.py q1,q2,... [sf_dir] [repeats] [plansdir]

Writes <plansdir>/<query>.txt when plansdir is given (e.g.
plans/r12 with suffix handled by the caller renaming), prints one
line per query:  <name>  <min_sec>  [<all runs>]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as em
from awi_datapipelinepublic_spark import get_spark


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    plansdir = Path(sys.argv[4]) if len(sys.argv) > 4 else None
    suffix = os.environ.get("PLAN_SUFFIX", "")
    spark = get_spark("profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    # warm the JVM + python worker pool once (bench.py's protocol)
    qs["grouped_agg"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    qs["knn_cosine"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in names:
        df = qs[name](spark, sf_dir)
        if plansdir is not None:
            plansdir.mkdir(parents=True, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            (plansdir / f"{name}{suffix}.txt").write_text(buf.getvalue())
        runs = []
        for _ in range(repeats):
            # bench.py's r13 measurement fix: operators that persist()
            # intermediates would otherwise serve the next run from the
            # CacheManager (plans match canonically across invocations)
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"{name}  {min(runs):.3f}  {runs}", flush=True)


if __name__ == "__main__":
    main()
