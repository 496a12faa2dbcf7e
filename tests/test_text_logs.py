"""Grok text-log source: fixture files -> typed fields + path keys +
dead-letter complement (line-exact partition of the input)."""

import gzip
import os

from log_analysis_spark.sources.text_logs import dead_letters, read_grok_logs

PATTERN = (
    "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} %{NOTSPACE:unit}: "
    "took %{INT:ms:int}ms%{GREEDYDATA:rest}"
)

GOOD = [
    "2024-07-01 10:00:00 INFO api: took 12ms",
    "2024-07-01 10:00:01 ERROR worker/3: took 1500ms (retrying)",
    "2024-07-02T23:59:59.250Z WARN api: took 9ms",
]
BAD = ["not structured", "2024-07-01 10:00:02 TRACE api: took ms"]


def _write_fixture(root):
    for day, lines, gz in (
        ("2024-07-01", GOOD[:2] + BAD[:1], False),
        ("2024-07-02", GOOD[2:] + BAD[1:], True),
    ):
        d = os.path.join(root, "app=svc", f"day={day}")
        os.makedirs(d, exist_ok=True)
        if gz:
            with gzip.open(os.path.join(d, "log.txt.gz"), "wt") as f:
                f.write("\n".join(lines) + "\n")
        else:
            with open(os.path.join(d, "log.txt"), "w") as f:
                f.write("\n".join(lines) + "\n")


def test_read_grok_logs_typed_and_path_keys(spark, tmpdir_path):
    _write_fixture(tmpdir_path)
    df = read_grok_logs(
        spark,
        f"{tmpdir_path}/app=*/day=*/*",
        PATTERN,
        path_keys=["app", "day"],
    )
    rows = sorted(df.collect(), key=lambda r: r.ts)
    assert len(rows) == 3  # malformed lines dropped
    assert [r.ms for r in rows] == [12, 1500, 9]
    assert df.schema["ms"].dataType.typeName() == "long"
    assert {r.app for r in rows} == {"svc"}
    assert {r.day for r in rows} == {"2024-07-01", "2024-07-02"}
    assert rows[1].unit == "worker/3" and rows[1].rest == " (retrying)"


def test_dead_letters_complement(spark, tmpdir_path):
    _write_fixture(tmpdir_path)
    glob = f"{tmpdir_path}/app=*/day=*/*"
    dead = {r.value for r in dead_letters(spark, glob, PATTERN).collect()}
    assert dead == set(BAD)
    kept = read_grok_logs(spark, glob, PATTERN, keep_line=True)
    assert {r.value for r in kept.collect()} | dead == set(GOOD) | set(BAD)


def test_keep_unmatched_nulls(spark, tmpdir_path):
    _write_fixture(tmpdir_path)
    df = read_grok_logs(
        spark, f"{tmpdir_path}/app=*/day=*/*", PATTERN, keep_unmatched=True
    )
    assert df.count() == 5
    assert df.filter(df.ts.isNull()).count() == 2
