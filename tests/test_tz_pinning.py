"""Process-timezone pinning (r14 ADVICE, high).

``spark.sql.session.timeZone=UTC`` governs only SQL semantics;
Python<->JVM timestamp exchange goes through TimestampType.toInternal
(``time.mktime``) / fromInternal (``datetime.fromtimestamp``) — the
PROCESS timezone. On a non-UTC host, a naive ``F.lit(datetime)``
residual bound in the pruning layer or a collected zone-map min/max
bracket would denote a different instant than the same ISO string under
the UTC session: west-of-UTC hosts silently DROP matching rows (the
outer SQL re-applies its WHERE over the already-filtered pruned view,
so nothing recovers them).

The fix pins the whole process to UTC before the JVM starts
(session._pin_process_utc) and sets the driver JVM default TZ
post-launch. These tests run REAL subprocesses with a hostile TZ env so
the pin is exercised, not assumed — the in-suite session was created by
other tests and can't be re-created with a different TZ.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import datetime as dt
import os
import time

# libc applied TZ=America/Los_Angeles at process start (env set by the
# parent); importing the session module must re-pin the process to UTC
# BEFORE any JVM exists.
assert time.timezone != 0 or time.altzone != 0, "harness TZ not applied"

from miniodb_spark.session import get_spark  # noqa: E402

assert os.environ["TZ"] == "UTC", os.environ.get("TZ")
time.tzset()
assert time.timezone == 0, time.timezone

spark = get_spark("tz-pin-probe", cpus=2)
from pyspark.sql import functions as F  # noqa: E402

# driver JVM default TZ pinned post-launch (client mode can't take
# -Duser.timezone via conf)
jvm = spark.sparkContext._jvm
assert jvm.java.util.TimeZone.getDefault().getID() == "UTC"

naive = dt.datetime(2024, 1, 2, 6, 30, 0)
row = spark.range(1).select(
    F.lit(naive).alias("a"),
    F.to_timestamp(F.lit("2024-01-02 06:30:00")).alias("b"),
).select(
    (F.col("a") == F.col("b")).alias("eq"), "a", "b",
).collect()[0]
# toInternal path: the naive Python literal must mean the same instant
# as the ISO string cast under the UTC session
assert row["eq"] is True, (row["a"], row["b"])
# fromInternal path: a JVM-side timestamp must collect back as the
# same naive-UTC datetime (this is the zonemap Spark-agg fallback's
# bracket-collection path)
assert row["a"] == naive and row["b"] == naive, row

# end-to-end through the layer the bug would corrupt: seed two
# intra-day files, prune on a timestamp bound, compare to full scan
import tempfile  # noqa: E402

from miniodb_spark.engine import Engine  # noqa: E402

root = tempfile.mkdtemp(prefix="tzpin_store_")
eng = Engine(spark, root)
US = 1_000_000
day0 = int(dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc).timestamp()) * US
for h in (6, 7, 8):
    eng.write("t", {"v": h}, record_id=f"m{h:02d}",
              timestamp_us=day0 + h * 3600 * US)
eng.flush("t")
for h in (18, 19, 20):
    eng.write("t", {"v": h}, record_id=f"e{h:02d}",
              timestamp_us=day0 + h * 3600 * US)
eng.flush("t")
noon = dt.datetime(2024, 1, 2, 12, 0, 0)
df, report = eng.range_lookup_df("t", lo=noon, id_col="timestamp")
got = sorted(r["id"] for r in df.select("id").collect())
assert got == ["e18", "e19", "e20"], got
assert report["files_skipped"] >= 1, report

import json  # noqa: E402

out = json.loads(eng.query(
    "SELECT id FROM t WHERE timestamp >= '2024-01-02 12:00:00' "
    "ORDER BY id"))
assert [r["id"] for r in out] == ["e18", "e19", "e20"], out

spark.stop()
print("TZPIN_OK")
"""


def test_non_utc_host_pins_to_utc_end_to_end(tmp_path):
    """A west-of-UTC host (America/Los_Angeles, UTC-8) — the exact
    direction that made the residual filter TIGHTER and dropped rows —
    must produce identical pruning results to a UTC host."""
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["TZ"] = "America/Los_Angeles"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(script)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=280,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "TZPIN_OK" in proc.stdout, proc.stdout[-2000:]


def test_executor_tz_flag_merges_with_caller_java_options():
    """r15 ADVICE: a caller-supplied spark.executor.extraJavaOptions
    (e.g. GC flags) must not silently REPLACE the executor TZ pin —
    the factory appends the flag to the caller's string."""
    from miniodb_spark.session import _EXEC_TZ_FLAG, _merged_extra_conf

    got = _merged_extra_conf(
        {"spark.executor.extraJavaOptions": "-XX:+UseG1GC"})
    assert got["spark.executor.extraJavaOptions"] == \
        f"-XX:+UseG1GC {_EXEC_TZ_FLAG}"
    # already present: not duplicated
    val = f"-XX:+UseG1GC {_EXEC_TZ_FLAG}"
    assert _merged_extra_conf(
        {"spark.executor.extraJavaOptions": val}
    )["spark.executor.extraJavaOptions"] == val
    # unrelated keys pass through untouched; None is fine
    assert _merged_extra_conf({"spark.foo": "1"}) == {"spark.foo": "1"}
    assert _merged_extra_conf(None) == {}


def test_tz_pin_import_optout_defers_to_get_spark(tmp_path):
    """MINIODB_SPARK_NO_TZ_PIN defers the process-TZ pin from import
    time to get_spark(): importing the module leaves the embedder's
    TZ alone, and the pin still lands before any JVM would launch."""
    script = tmp_path / "optout.py"
    script.write_text(
        "import os, time\n"
        "import miniodb_spark.session as s\n"
        "assert os.environ.get('TZ') == 'America/New_York', "
        "'import must not pin under the opt-out'\n"
        "s._pin_process_utc()\n"  # what get_spark runs first
        "assert os.environ['TZ'] == 'UTC'\n"
        "print('OPTOUT_OK')\n"
    )
    env = dict(os.environ)
    env["TZ"] = "America/New_York"
    env["MINIODB_SPARK_NO_TZ_PIN"] = "1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(script)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OPTOUT_OK" in proc.stdout
