"""Drive the dtail CLI through every printer mode (SURVEY §2.2 K7 —
the reference offers JSON / AVRO_JSON / AVRO_BIN / NOOP / EVENT_INFO,
DtailCliBase.java:57-64; these tests close the last two modes).

The AVRO_BIN test is the parity proof the mode exists for: the bytes the
CLI writes must decode BYTE-EXACTLY back to the events the JSON printer
shows, by walking the concatenated-record stream with
decode_record(return_consumed=True).
"""

from __future__ import annotations

import io
import json
import sys


def _run_cli(argv, spark):  # spark fixture keeps one shared session alive
    from databus_spark.__main__ import main

    return main(argv)


def test_dtail_avro_json_mode(spark, sf_dir, capsys):
    rc = _run_cli(["--sf-dir", sf_dir, "dtail", "--n", "5", "--printer", "avro_json"], spark)
    assert rc == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(lines) == 5
    for ln in lines:
        rec = json.loads(ln)
        # Avro JSON encoding: union values arrive wrapped {branch: value}
        assert isinstance(rec["scn"], int)
        assert rec["key_str"] is None or set(rec["key_str"]) == {"string"}
        assert rec["key_num"] is None or set(rec["key_num"]) == {"long"}


def test_dtail_avro_bin_roundtrips_byte_exact(spark, sf_dir, monkeypatch):
    from databus_spark.__main__ import DTAIL_EVENT_AVRO, main
    from databus_spark.functions.avro_codec import decode_record, encode_record

    buf = io.BytesIO()

    class _Cap:
        buffer = buf

        def write(self, s):  # stray text writes (none expected) stay visible
            sys.__stdout__.write(s)

        def flush(self):
            pass

    monkeypatch.setattr(sys, "stdout", _Cap())
    rc = main(["--sf-dir", sf_dir, "dtail", "--n", "7", "--printer", "avro_bin"])
    monkeypatch.undo()
    assert rc == 0
    raw = buf.getvalue()
    assert raw  # non-empty binary stream

    schema = json.loads(DTAIL_EVENT_AVRO)
    pos, events = 0, []
    while pos < len(raw):
        rec, used = decode_record(raw[pos:], schema, schema, return_consumed=True)
        assert used > 0
        events.append(rec)
        # byte-exact: re-encoding the decoded record reproduces the slice
        assert encode_record(rec, schema) == raw[pos : pos + used]
        pos += used
    assert pos == len(raw) and len(events) == 7
    scns = [e["scn"] for e in events]
    assert scns == sorted(scns, reverse=True)  # dtail is a descending tail


def test_dtail_json_and_noop_modes(spark, sf_dir, capsys):
    rc = _run_cli(["--sf-dir", sf_dir, "dtail", "--n", "3", "--printer", "json"], spark)
    assert rc == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(lines) == 3 and all(json.loads(ln)["scn"] for ln in lines)

    rc = _run_cli(["--sf-dir", sf_dir, "dtail", "--n", "3", "--printer", "noop"], spark)
    assert rc == 0
    assert capsys.readouterr().out.strip() == "3"
