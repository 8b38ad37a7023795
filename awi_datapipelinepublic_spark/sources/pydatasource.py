"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

Demonstrates the engine's source-extensibility path: when an input
system has no built-in reader (an internal feed, a bespoke binary
format, a service API), a Python DataSource gives it a first-class
`spark.read.format(...)` surface with schema, options, and
partition-parallel reads — each `InputPartition` is read by a
different task, so ingestion scales with the cluster like any file
source.

Everything is defined INSIDE the factory function: Spark pickles the
DataSource class to Python workers, and a module-level class would be
pickled by reference — dying with ModuleNotFoundError whenever the
session is launched by a host application that does not have this
package on the workers' import path (the same trap as UDF closures;
see SCALING.md "Python boundaries"). Nested classes are cloudpickled
by value and run anywhere.

The synthetic generator emits (doc_id, md5-prefix) rows so tests and
the driver's DuckDB oracle can reproduce the exact content without
sharing any engine code.
"""

from __future__ import annotations


def synthetic_docs_source():
    """Return the DataSource class for a deterministic synthetic
    corpus: options ``rows`` (total) and ``partitions`` (parallelism);
    row i is (i, md5(str(i))[:8])."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _Part(InputPartition):
        def __init__(self, start: int, end: int):
            self.start, self.end = start, end

    class _Reader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("rows", 100))
            self.parts = int(options.get("partitions", 4))

        def partitions(self):
            step = max(1, self.n // self.parts)
            bounds = list(range(0, self.n, step)) + [self.n]
            return [_Part(a, b) for a, b in zip(bounds, bounds[1:])]

        def read(self, part):
            import hashlib

            for i in range(part.start, part.end):
                yield (i, hashlib.md5(str(i).encode()).hexdigest()[:8])

    class SyntheticDocs(DataSource):
        @classmethod
        def name(cls) -> str:
            return "synthetic_docs"

        def schema(self) -> str:
            return "doc_id bigint, text string"

        def reader(self, schema):
            return _Reader(self.options)

    return SyntheticDocs


def register_synthetic_source(spark) -> None:
    """Idempotently register the synthetic_docs format on a session."""
    spark.dataSource.register(synthetic_docs_source())
