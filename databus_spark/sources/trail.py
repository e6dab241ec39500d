"""GoldenGate-style XML trail directory: rotating files, position seek,
batch + streaming ingest (SURVEY §2.1 S6/S7).

Reference shape: the GoldenGate event producer tails a directory of
rotating trail files as one logical byte stream and, on (re)start,
locates the (file, offset) where a target SCN begins
(reference: databus2-relay/databus2-event-producer-ggviews/.../
TrailFilePositionSetter.java — scan/locate semantics,
ConcurrentAppendableCompositeFileInputStream.java — the composite
rotating-file stream; GoldenGateEventProducer parses the XML records).

Spark restatement:
  * the trail is a directory of line-oriented XML files `x0000000001..`;
    one <tx> element per line (a txn is written atomically — the same
    invariant the reference gets from GoldenGate's writer);
  * `TrailPositionSetter.locate(scn)` finds the exact (file, line,
    byte offset) where scns > target begin — driver-side metadata scan
    reading only first/last records per file (the binary-search-over-
    files analog), then one partial file scan;
  * batch reads prune WHOLE FILES below the position (the engine-native
    "seek": Spark never opens files the position setter excluded);
  * streaming tails the directory with the file source — rotation is
    just a new file appearing, handled by source file tracking.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRAIL_PREFIX = "x"
_SCN_RE = re.compile(r'scn="(\d+)"')


@dataclass(frozen=True)
class TrailColumn:
    """One per-op attribute of a trail record: XML attribute name, output
    column name, Spark SQL type."""

    attr: str
    out: str
    dtype: str


# Per-source record spec: the reference's ggParser StateMachine walks
# arbitrary per-source column sets from the GG dictionary
# (databus2-relay-impl/.../ggParser/XmlStateMachine/StateMachine.java);
# here the same generality is a tuple of TrailColumns driving both the
# writer's attribute layout and the from_xml reader schema. The default
# is the original (key, price) demo shape.
DEFAULT_TRAIL_SPEC: tuple[TrailColumn, ...] = (
    TrailColumn("key", "key_num", "BIGINT"),
    TrailColumn("price", "price", "DOUBLE"),
)


def tx_xml_schema(spec: tuple[TrailColumn, ...] = DEFAULT_TRAIL_SPEC) -> str:
    """from_xml schema for a spec (ggParser analog)."""
    fields = ", ".join(f"_{c.attr}: {c.dtype}" for c in spec)
    return f"_scn BIGINT, op ARRAY<STRUCT<_type: STRING, {fields}>>"


# back-compat alias for the default shape
TX_XML_SCHEMA = tx_xml_schema()


class TrailWriter:
    """Appends one <tx> line per transaction; rotates by size
    (GoldenGate trail rotation). Record shape is spec-driven."""

    def __init__(
        self,
        trail_dir: str,
        max_bytes: int = 1 << 20,
        spec: tuple[TrailColumn, ...] = DEFAULT_TRAIL_SPEC,
    ) -> None:
        self.trail_dir = trail_dir
        self.max_bytes = max_bytes
        self.spec = spec
        os.makedirs(trail_dir, exist_ok=True)
        files = trail_files(trail_dir)
        self._seq = int(files[-1][len(TRAIL_PREFIX):]) if files else 1

    def _path(self) -> str:
        return os.path.join(self.trail_dir, f"{TRAIL_PREFIX}{self._seq:010d}")

    def rotate(self) -> None:
        self._seq += 1

    def append_txn(self, scn: int, ops: list[tuple]) -> None:
        """ops: (type, *values) tuples, values matching self.spec order;
        one atomic <tx> line."""
        attrs = [c.attr for c in self.spec]

        def render(op: tuple) -> str:
            t, *vals = op
            kv = "".join(f' {a}="{v}"' for a, v in zip(attrs, vals))
            return f'<op type="{t}"{kv}/>'

        body = "".join(render(op) for op in ops)
        line = f'<tx scn="{scn}">{body}</tx>\n'
        path = self._path()
        if os.path.exists(path) and os.path.getsize(path) + len(line) > self.max_bytes:
            self.rotate()
            path = self._path()
        with open(path, "a") as f:
            f.write(line)


def trail_files(trail_dir: str) -> list[str]:
    try:
        names = os.listdir(trail_dir)
    except FileNotFoundError:
        return []
    return sorted(
        n for n in names if n.startswith(TRAIL_PREFIX) and n[len(TRAIL_PREFIX):].isdigit()
    )


@dataclass(frozen=True)
class TrailPosition:
    file: str          # trail file name holding the first scn > target
    line: int          # 0-based line number within that file
    byte_offset: int   # byte offset of that line
    scn: int           # the scn found there (-1 = end of trail)


class TrailPositionSetter:
    """Locate where consumption should (re)start for a target SCN.

    Two-phase, like the reference: (1) bracket the file by reading only
    each file's FIRST record scn (trail scns are monotone, so file f
    contains scns [first(f), first(f+1))); (2) scan inside the one
    bracketed file for the first line with scn > target, recording its
    byte offset. Only metadata + one partial file are read — never the
    whole trail (TrailFilePositionSetter.java's FULL_SCAN fallback vs
    located-scan fast path)."""

    def __init__(self, trail_dir: str) -> None:
        self.trail_dir = trail_dir

    def _first_scn(self, name: str) -> int | None:
        with open(os.path.join(self.trail_dir, name)) as f:
            line = f.readline()
        m = _SCN_RE.search(line)
        return int(m.group(1)) if m else None

    def locate(self, target_scn: int) -> TrailPosition:
        """Position of the first transaction with scn > target_scn."""
        files = trail_files(self.trail_dir)
        if not files:
            raise FileNotFoundError(f"empty trail dir {self.trail_dir}")
        # phase 1: bracket by first-record scns (monotone across rotation)
        firsts = [(name, self._first_scn(name)) for name in files]
        candidates = []
        for i, (name, first) in enumerate(firsts):
            nxt = firsts[i + 1][1] if i + 1 < len(firsts) else None
            if nxt is not None and nxt <= target_scn:
                continue  # whole file is <= target: prune
            candidates.append(name)
        # phase 2: scan candidate files for the first line > target
        for name in candidates:
            offset = 0
            with open(os.path.join(self.trail_dir, name)) as f:
                for line_no, line in enumerate(f):
                    m = _SCN_RE.search(line)
                    if m and int(m.group(1)) > target_scn:
                        return TrailPosition(name, line_no, offset, int(m.group(1)))
                    offset += len(line.encode())
        return TrailPosition(files[-1], -1, -1, -1)  # fully consumed

    def files_from(self, target_scn: int) -> list[str]:
        """Trail files that may contain scns > target (file-level prune)."""
        files = trail_files(self.trail_dir)
        firsts = [(name, self._first_scn(name)) for name in files]
        keep = []
        for i, (name, _first) in enumerate(firsts):
            nxt = firsts[i + 1][1] if i + 1 < len(firsts) else None
            if nxt is not None and nxt <= target_scn:
                continue
            keep.append(name)
        return keep


def _parse_lines(
    lines: DataFrame, spec: tuple[TrailColumn, ...] = DEFAULT_TRAIL_SPEC
) -> DataFrame:
    parsed = lines.select(F.from_xml("value", tx_xml_schema(spec)).alias("tx"))
    return parsed.select(
        F.col("tx._scn").alias("txn_scn"), F.explode("tx.op").alias("op")
    ).select(
        "txn_scn",
        F.col("op._type").alias("op_type"),
        *[F.col(f"op._{c.attr}").alias(c.out) for c in spec],
    )


def read_trail(
    spark: SparkSession,
    trail_dir: str,
    from_scn: int = -1,
    spec: tuple[TrailColumn, ...] = DEFAULT_TRAIL_SPEC,
) -> DataFrame:
    """Batch read of the trail past from_scn. The position setter prunes
    whole files BEFORE Spark lists them — the seek — and the residual
    head of the boundary file is dropped by the scn predicate."""
    if from_scn >= 0:
        setter = TrailPositionSetter(trail_dir)
        names = setter.files_from(from_scn)
        if not names:
            return _parse_lines(
                spark.createDataFrame([], "value STRING"), spec
            ).where(F.lit(False))
        paths = [os.path.join(trail_dir, n) for n in names]
    else:
        paths = [trail_dir]
    lines = spark.read.text(paths)
    out = _parse_lines(lines, spec)
    return out.where(F.col("txn_scn") > from_scn) if from_scn >= 0 else out


def tail_trail_stream(
    spark: SparkSession,
    trail_dir: str,
    spec: tuple[TrailColumn, ...] = DEFAULT_TRAIL_SPEC,
) -> DataFrame:
    """Tail the trail dir as a stream; a rotation is just a new file.
    NOTE: Spark's file source tracks files, not offsets, so a trail file
    must be complete before it is picked up in a micro-batch — the tests
    drain with availableNow between rotations, and a live deployment
    points this at closed trail files (the current hot file is read on
    the next trigger after rotation)."""
    lines = spark.readStream.format("text").load(trail_dir + f"/{TRAIL_PREFIX}*")
    return _parse_lines(lines, spec)


def trail_health(
    spark: SparkSession,
    trail_dir: str,
    spec: tuple[TrailColumn, ...] = DEFAULT_TRAIL_SPEC,
) -> DataFrame:
    """Parse-health accounting for a trail directory: from_xml drops
    malformed records SILENTLY (returns NULL), which is the right
    behavior for the hot path but must be observable — the reference's
    GG parser counts and surfaces parse errors rather than wedging
    (ggParser StateMachine error handling). One row:
    (n_lines, n_parsed, n_corrupt)."""
    lines = spark.read.text(trail_dir + f"/{TRAIL_PREFIX}*")
    parsed = lines.select(F.from_xml("value", tx_xml_schema(spec)).alias("tx"))
    return parsed.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count(F.col("tx._scn")).alias("n_parsed"),
        (F.count(F.lit(1)) - F.count(F.col("tx._scn"))).alias("n_corrupt"),
    )
