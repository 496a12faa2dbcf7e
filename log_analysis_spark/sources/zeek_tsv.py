"""Zeek gzipped-TSV source: the format-fidelity reader (S1-S6).

Reproduces the reference's self-describing log format handling
(/root/reference/src/zeek/zeek_log.rs:86-224) Spark-first:

- S1 partitioned directory scan: ``{prefix}/{YYYY-MM-DD}/`` date dirs
  (zeek_search_params.rs:59-74), with ``~`` expansion (:77-82) and
  yyyy-mm-dd validation (:96-123);
- S2 partition-key extraction: ``{proto}.{HH:MM:SS-HH:MM:SS}.log.gz``
  filename split (zeek_log.rs:374-383) — here from the path driver-side
  plus ``input_file_name()`` executor-side;
- S3 gzip decode: Spark's built-in .gz codec on ``spark.read.text``
  (vs the reference's flate2 stream at zeek_log.rs:93-94);
- S4 header parse / schema inference: separator sniffed from the
  ``#separator \\xNN`` escape (zeek_log.rs:104-117), field names from
  ``#fields`` (:131-146) — a small driver-side prelude reading ONE file's
  first lines per (date, proto), not two full passes per file
  (the reference re-opens and re-reads every file, zeek_log.rs:157-160);
- S5 tokenize/project: native ``split`` + ``getItem(i)`` per field —
  whole-stage codegen, no Python;
- S6 footer/comment filter: drop every ``#``-prefixed line (covers the
  header block and the ``#close`` footer, zeek_log.rs:167-178);
- F1 predicate: row-level ``id_orig_h == ip OR id_resp_h == ip``. The
  reference compares EVERY column's cells to the IP and keeps matching
  cells (zeek_log.rs:191-221) — a documented deviation; the row-level
  semantics are the sane relational equivalent (SURVEY.md §2 F1).

Zeek's unset (``-``) and empty (``(empty)``) sentinels become NULL
(zeek_log_header.rs:8-9). ``#types`` is ignored like the reference
(zeek_log.rs:147-149): values stay strings; callers cast.
"""

from __future__ import annotations

import gzip
import io
import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
# Hour buckets: the reference's filenames use ':' (e.g.
# conn.00:00:00-01:00:00.log.gz, zeek_log.rs:377-383) but Hadoop Path rejects
# ':' in file names, so on-disk buckets use '_' and the reader normalizes the
# hour_bucket VALUE back to the reference's ':' form — documented deviation.
FILE_RE = re.compile(r"^(?P<proto>[A-Za-z0-9_-]+)\.(?P<hours>[\d:_+-]+)\.log(\.gz)?$")
UNSET = "-"
EMPTY = "(empty)"


class SearchInvalidStartDate(ValueError):
    """Mirror of the reference error enum (/root/reference/src/types/error.rs:4-17)."""


def check_date_format(date: str) -> bool:
    """yyyy-mm-dd validation (zeek_search_params.rs:96-123)."""
    return bool(DATE_RE.match(date))


def expand_path(prefix: str) -> str:
    """~ -> $HOME (zeek_search_params.rs:77-82)."""
    return os.path.expanduser(prefix)


@dataclass(frozen=True)
class ZeekHeader:
    separator: str
    path: str          # record type from '#path'
    fields: list[str]  # from '#fields'


def parse_header(lines: list[str]) -> ZeekHeader:
    """Positional header-block parse (zeek_log.rs:99-155).

    Line 0 ``#separator \\xNN`` (hex escape -> char), line 4 ``#path``,
    line 6 ``#fields``; ``#set_separator``/``#empty_field``/``#unset_field``/
    ``#open``/``#types`` are read past, matching the reference.
    """
    sep = "\t"
    path = ""
    fields: list[str] = []
    for ln in lines:
        if ln.startswith("#separator"):
            tok = ln.split(" ", 1)[1].strip()
            if tok.startswith("\\x"):
                sep = chr(int(tok[2:], 16))
            else:
                sep = tok
        elif ln.startswith("#path"):
            path = ln.split(sep, 1)[1].strip() if sep in ln else ln.split(" ", 1)[1].strip()
        elif ln.startswith("#fields"):
            rest = ln[len("#fields") :].strip(sep).strip()
            fields = rest.split(sep) if sep in rest else rest.split()
        elif not ln.startswith("#"):
            break
    return ZeekHeader(separator=sep, path=path, fields=fields)


def sniff_header(file_path: str, max_lines: int = 8) -> ZeekHeader:
    """Driver-side prelude: read only the first lines of one file."""
    opener = gzip.open if file_path.endswith(".gz") else open
    with opener(file_path, "rb") as f:
        text = io.TextIOWrapper(f, encoding="utf-8")
        lines = []
        for _ in range(max_lines):
            ln = text.readline()
            if not ln:
                break
            lines.append(ln.rstrip("\n"))
    return parse_header(lines)


def discover(path_prefix: str, date: str) -> dict[str, list[str]]:
    """S1+S2: list one date dir, group files by record type.

    Missing dir -> SearchInvalidStartDate (zeek_log.rs:367-371).
    Unknown filenames are skipped (NONE analog).
    """
    if not check_date_format(date):
        raise SearchInvalidStartDate(f"bad date format: {date!r}")
    d = os.path.join(expand_path(path_prefix), date)
    if not os.path.isdir(d):
        raise SearchInvalidStartDate(d)
    by_proto: dict[str, list[str]] = {}
    for name in sorted(os.listdir(d)):
        m = FILE_RE.match(name)
        if not m:
            continue
        by_proto.setdefault(m.group("proto").lower(), []).append(os.path.join(d, name))
    return by_proto


def _null_sentinels(c: F.Column) -> F.Column:
    return F.when((c == UNSET) | (c == EMPTY), F.lit(None)).otherwise(c)


def read_proto(
    spark: SparkSession,
    files: list[str],
    header: ZeekHeader | None = None,
) -> DataFrame:
    """Read one record type's files into a typed-string DataFrame.

    Columns are the ``#fields`` names with ``.`` -> ``_`` (Spark-safe),
    plus ``record_type`` and ``hour_bucket`` derived from the file path —
    the reference's LogTree keys (proto, hour) as ordinary columns.
    """
    if header is None:
        header = sniff_header(files[0])
    sep = header.separator
    df = spark.read.text(files).withColumn("_file", F.input_file_name())
    df = df.filter(~F.col("value").startswith("#"))  # S6
    parts = F.split(F.col("value"), re.escape(sep))
    # F.get (not getItem): ANSI mode throws on out-of-bounds, and a single
    # short/truncated line must never fail the whole task
    cols = [
        _null_sentinels(F.get(parts, i)).alias(name.replace(".", "_"))
        for i, name in enumerate(header.fields)
    ]
    fname = F.element_at(F.split(F.col("_file"), "/"), -1)
    return df.select(
        *cols,
        F.lower(F.split(fname, r"\.").getItem(0)).alias("record_type"),
        F.regexp_replace(F.split(fname, r"\.").getItem(1), "_", ":").alias(
            "hour_bucket"
        ),
    )


def search(
    spark: SparkSession,
    path_prefix: str,
    selected_date: str,
    proto_type: str | None = None,
    src_ip: str | None = None,
    typed: bool = False,
) -> dict[str, DataFrame]:
    """The ZeekLog::search equivalent (zeek_log.rs:364-461).

    The three optional predicates (src_ip, proto, date) of
    ZeekSearchParams::check's bitmask dispatch (zeek_search_params.rs:38-57)
    are plain composed Column filters — Catalyst fuses them into the scan,
    so no strategy dispatch table exists here.
    Returns {record_type: DataFrame}, deterministically ordered by type
    (BTreeMap analog). ``typed=True`` additionally applies the per-family
    typed cast stage (``zeek_records``) to families that have one
    (conn/http/dns/ssl/weird/files/ssh/smtp/notice); other families stay
    string-typed like the reference.
    """
    from .zeek_records import FIELDS_BY_TYPE, cast_records

    by_proto = discover(path_prefix, selected_date)
    out: dict[str, DataFrame] = {}
    for proto in sorted(by_proto):
        if proto_type is not None and proto != proto_type.lower():
            continue
        df = read_proto(spark, by_proto[proto])
        if typed and proto in FIELDS_BY_TYPE:
            df = cast_records(df, proto)
        if src_ip is not None:
            preds = [
                F.col(c) == src_ip
                for c in ("id_orig_h", "id_resp_h")
                if c in df.columns
            ]
            if preds:
                p = preds[0]
                for q in preds[1:]:
                    p = p | q
                df = df.filter(p)
            else:
                df = df.limit(0)
        out[proto] = df
    return out


def distinct_src_ips(frames: dict[str, DataFrame]) -> DataFrame:
    """_create_overview rebuilt (zeek_log.rs:332-362): the full distinct of
    id.orig_h across all record types, not the value[0]-only sample the
    reference takes (documented deviation, SURVEY.md §2 A1)."""
    parts = [
        df.select(F.col("id_orig_h").alias("ip"))
        for df in frames.values()
        if "id_orig_h" in df.columns
    ]
    if not parts:
        raise ValueError("no frames with id_orig_h")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.filter(F.col("ip").isNotNull()).distinct()


def write_ip_db(
    frames_by_date: dict[str, dict[str, DataFrame]] | dict[str, DataFrame],
    out_path: str,
) -> int:
    """Export the distinct source-IP set to a read-only ``ip.db`` file —
    the enrichment-cache seed the reference's tests build
    (/root/reference/tests/zeek_search.rs:70-123 ``_write_to_file``:
    one IP per line, chmod 444).

    Accepts either one date's ``{proto: DataFrame}`` or a
    ``{date: {proto: DataFrame}}`` tree; the cross-date union is first-seen
    dedup (main.rs:321-330) which for a plain set is just distinct. The
    collect is bounded: distinct IPs are the enrichment dim's key set
    (reference design holds the same set in memory as ``summary``).
    Returns the number of IPs written.
    """
    inner = list(frames_by_date.values())
    if inner and isinstance(inner[0], dict):
        per_date = [distinct_src_ips(f) for f in frames_by_date.values()]
        ips_df = per_date[0]
        for p in per_date[1:]:
            ips_df = ips_df.unionByName(p)
        ips_df = ips_df.distinct()
    else:
        ips_df = distinct_src_ips(frames_by_date)
    ips = sorted(r["ip"] for r in ips_df.collect())
    if os.path.exists(out_path):
        os.chmod(out_path, 0o644)  # previous export is read-only
    with open(out_path, "w", encoding="utf-8") as f:
        for ip in ips:
            f.write(ip + "\n")
    os.chmod(out_path, 0o444)
    return len(ips)


def write_zeek_fixture(
    out_dir: str,
    date: str,
    proto: str,
    hour_bucket: str,
    fields: list[str],
    rows: list[list[str]],
    separator: str = "\t",
) -> str:
    """Test helper: write one header-exact .log.gz fixture
    (format per /root/reference/src/zeek/zeek_log.rs:99-155 and FIXTURES.md §4)."""
    d = os.path.join(out_dir, date)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"{proto}.{hour_bucket.replace(':', '_')}.log.gz")
    sep = separator
    lines = [
        "#separator \\x%02x" % ord(sep),
        f"#set_separator{sep},",
        f"#empty_field{sep}(empty)",
        f"#unset_field{sep}-",
        f"#path{sep}{proto}",
        f"#open{sep}{date}-00-00-01",
        f"#fields{sep}" + sep.join(fields),
        f"#types{sep}" + sep.join(["string"] * len(fields)),
    ]
    lines += [sep.join(r) for r in rows]
    lines.append(f"#close{sep}{date}-01-00-00")
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return path
