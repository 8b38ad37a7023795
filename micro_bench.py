#!/usr/bin/env python
"""Micro-benchmark: built-in Column expressions vs Arrow Pandas UDF vs
row-at-a-time Python UDF for the same computation (cosine similarity
against a fixed query vector over the embeddings table).

Quantifies the engine's "UDFs are the slow path" design rule
(SCALING.md); results are recorded there. Run:
    python micro_bench.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from awi_datapipelinepublic_spark import get_spark
from awi_datapipelinepublic_spark.functions.vectors import cosine_similarity


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("micro-bench")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # amplify rows so per-row cost dominates scheduling overhead
    emb = emb.crossJoin(spark.range(20).select(F.col("id").alias("rep"))).select("vec_id", "embedding")
    emb.cache().count()
    qv = [float(x) for x in emb.limit(1).first()["embedding"]]
    qarr = np.asarray(qv)
    qn = float(np.linalg.norm(qarr))

    variants = {}

    q = F.array(*[F.lit(float(x)) for x in qv])
    variants["builtin_expr"] = emb.select(cosine_similarity(F.col("embedding"), q).alias("c"))

    @F.pandas_udf(DoubleType())
    def cos_pandas(col: pd.Series) -> pd.Series:
        m = np.stack(col.values).astype(float)
        d = np.linalg.norm(m, axis=1) * qn
        out = (m @ qarr) / np.where(d == 0, 1.0, d)
        return pd.Series(np.where(d == 0, 0.0, out))

    variants["pandas_udf"] = emb.select(cos_pandas("embedding").alias("c"))

    @F.udf(DoubleType())
    def cos_py(v):
        num = sum(a * b for a, b in zip(v, qv))
        nv = sum(a * a for a in v) ** 0.5
        d = nv * qn
        return float(num / d) if d else 0.0

    variants["python_udf"] = emb.select(cos_py("embedding").alias("c"))

    results = {}
    for name, df in variants.items():
        df.write.format("noop").mode("overwrite").save()  # warm codegen/workers
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        results[name] = round(statistics.median(times), 3)
    base = results["builtin_expr"]
    print(json.dumps({
        "rows": emb.count(),
        "median_sec": results,
        "slowdown_vs_builtin": {k: round(v / base, 2) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
