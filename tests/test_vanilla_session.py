"""Driver-environment guard: the external driver imports
__spark_entry__ under a VANILLA SparkSession (Spark 4 ANSI defaults,
none of the engine's tuned confs) with a NON-repo working directory
(Python workers inherit cwd, so closures cloudpickled by reference to
package modules fail only there). This test replays that environment
in a subprocess so regressions fail CI instead of the next driver run.

Gates chosen to cover the fragile classes: entry() (the smoke check),
an Arrow-UDF pipeline (minhash shingle UDF — worker-side import path),
a stateful-ish multi-action op (triangle census), and an ANSI-
sensitive cast path (cast_date_coerce's NULL-on-failure contract).
"""

import pytest
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

PROBE = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
assert spark.conf.get("spark.sql.ansi.enabled") == "true", "probe must run ANSI"
import __spark_entry__ as em
assert len(em.entry(spark).collect()) > 0
qs = em.queries()
for name in [
    "dedup_minhash_lsh", "triangle_count", "cast_date_coerce",
    # ANSI-divide hazards (the r7 driver-red class): these gates carry
    # data-dependent denominators and must materialize under ANSI=true
    "ab_test_zscore", "feature_hash", "degree_assortativity",
    "gini_coefficient", "ks_drift", "mixture_weights",
]:
    rows = qs[name](spark, "/root/testdata/sf0.001").collect()
    assert rows is not None
    print("ok", name, len(rows))
print("VANILLA_PROBE_PASS")
"""


def test_gates_run_under_vanilla_ansi_session_from_foreign_cwd(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-c", PROBE.format(repo=str(REPO))],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo — the driver's actual shape
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "VANILLA_PROBE_PASS" in proc.stdout, proc.stdout[-2000:]


@pytest.mark.slow
def test_full_inventory_under_vanilla_ansi_oracle(tmp_path):
    """Nightly tier: the COMPLETE 259-id oracle differential under the
    driver's session shape (ORACLE_VANILLA=1 → vanilla builder, ANSI
    asserted on) from a foreign cwd at sf0.001. The fast tier's probe
    covers the known-fragile gates; this closes the class."""
    import os

    env = dict(os.environ, ORACLE_VANILLA="1")
    proc = subprocess.run(
        [sys.executable, str(REPO / "tests" / "oracle_check.py"),
         "/root/testdata/sf0.001", "", "8"],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=3600,
    )
    fails = [l for l in proc.stdout.splitlines() if l.startswith("FAIL")]
    assert proc.returncode == 0 and not fails, (
        "\n".join(fails) or proc.stderr[-3000:]
    )
