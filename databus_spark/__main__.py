"""Command-line tools: the engine's dtail / snapshot / serve utilities.

Parity with the reference's operator tooling (SURVEY §2.2 K7: dtail
CLI with all five output formats — JSON / AVRO_JSON / AVRO_BIN / NOOP /
EVENT_INFO, databus-tools/databus-dtail-impl/.../DtailCliBase.java:57-64):

    python -m databus_spark dtail    --source orders --n 20 --printer json
    python -m databus_spark snapshot --source orders --out /tmp/orders_state
    python -m databus_spark sources
    python -m databus_spark bench    (delegates to bench.py)
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _spark(cpus: int):
    from databus_spark.session import build_session

    return build_session("databus_spark_cli", cpus=cpus)


# Writer schema for the dtail AVRO printer modes: the event envelope as
# an Avro record (the reference's AvroJson/AvroBinaryDtailPrinter
# re-serialize each event's GenericRecord; DtailCliBase.java:57-64).
# ts is epoch-millis (Avro has no bare timestamp primitive here).
DTAIL_EVENT_AVRO = json.dumps({
    "type": "record",
    "name": "databus_event",
    "fields": [
        {"name": "scn", "type": "long"},
        {"name": "ts_ms", "type": ["null", "long"], "default": None},
        {"name": "opcode", "type": "string"},
        {"name": "source", "type": "string"},
        {"name": "source_id", "type": "int"},
        {"name": "part_id", "type": "int"},
        {"name": "key_num", "type": ["null", "long"], "default": None},
        {"name": "key_str", "type": ["null", "string"], "default": None},
        {"name": "txn_end", "type": "boolean"},
    ],
})


def _event_record(r) -> dict:
    # ts_ms is computed JVM-side (unix_millis) before collect: plain
    # collect() renders TimestampType as a NAIVE datetime in the HOST OS
    # timezone, so stamping UTC onto it driver-side skewed epoch-millis
    # on any non-UTC host.
    ts_ms = r["ts_ms"]
    return {
        "scn": r["scn"],
        "ts_ms": None if ts_ms is None else int(ts_ms),
        "opcode": r["opcode"],
        "source": r["source"],
        "source_id": r["source_id"],
        "part_id": r["part_id"],
        "key_num": r["key_num"],
        "key_str": r["key_str"],
        "txn_end": bool(r["txn_end"]),
    }


def cmd_dtail(args) -> int:
    from pyspark.sql import functions as F

    from databus_spark.envelope import multi_source_changelog
    from databus_spark.functions.codecs import render_event_json

    spark = _spark(args.cpus)
    log = multi_source_changelog(spark, args.sf_dir)
    if args.source:
        log = log.where(F.col("source") == args.source)
    tail = log.orderBy(F.desc("scn"), F.desc("source"), F.desc("key_str")).limit(args.n)
    if args.printer == "json":
        for r in tail.select(render_event_json().alias("j")).collect():
            print(r["j"])
    elif args.printer == "event_info":
        for r in tail.collect():
            print(
                f"scn={r['scn']} op={r['opcode']} src={r['source']} "
                f"part={r['part_id']} key={r['key_str']}"
            )
    elif args.printer == "avro_json":
        from databus_spark.functions.avro_codec import avro_json_render

        schema = json.loads(DTAIL_EVENT_AVRO)
        for r in tail.withColumn("ts_ms", F.expr("unix_millis(ts)")).collect():
            print(avro_json_render(_event_record(r), schema))
    elif args.printer == "avro_bin":
        # standard Avro binary serialization, concatenated records to
        # the raw byte stream (AvroBinaryDtailPrinter writes to its
        # OutputStream the same way); decode by walking the stream with
        # decode_record(return_consumed=True)
        from databus_spark.functions.avro_codec import encode_record

        schema = json.loads(DTAIL_EVENT_AVRO)
        out = sys.stdout.buffer
        for r in tail.withColumn("ts_ms", F.expr("unix_millis(ts)")).collect():
            out.write(encode_record(_event_record(r), schema))
        out.flush()
    else:  # noop — counts only (NOOP printer analog)
        print(tail.count())
    return 0


def cmd_snapshot(args) -> int:
    from databus_spark.envelope import (
        customer_changelog,
        lineitem_changelog,
        orders_changelog,
    )
    from databus_spark.operators.compaction import snapshot

    builders = {
        "orders": orders_changelog,
        "customer": customer_changelog,
        "lineitem": lineitem_changelog,
    }
    spark = _spark(args.cpus)
    log = builders[args.source](spark, args.sf_dir)
    state = snapshot(log, key_cols=("key_str",))
    state.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"source": args.source, "rows": state.count(), "out": args.out}))
    return 0


def cmd_sources(args) -> int:
    from databus_spark.catalog import SOURCE_IDS

    for name, sid in sorted(SOURCE_IDS.items(), key=lambda kv: kv[1]):
        print(f"{sid}\t{name}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="databus_spark")
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    p.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dtail", help="tail the multi-source change stream")
    d.add_argument("--source", default=None)
    d.add_argument("--n", type=int, default=20)
    d.add_argument(
        "--printer",
        choices=["json", "event_info", "noop", "avro_json", "avro_bin"],
        default="json",
    )
    d.set_defaults(fn=cmd_dtail)

    s = sub.add_parser("snapshot", help="materialize a source's current state")
    s.add_argument("--source", required=True, choices=["orders", "customer", "lineitem"])
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_snapshot)

    src = sub.add_parser("sources", help="list the source registry")
    src.set_defaults(fn=cmd_sources)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
