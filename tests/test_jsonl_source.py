"""JSONL ingestion: clean/quarantine split, nothing silently dropped."""

from __future__ import annotations

import json


def test_jsonl_clean_and_quarantine(spark, tmp_path):
    from databus_spark.sources.jsonl import read_jsonl

    good = [
        {"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11},
        {"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "n_chars": 7},
    ]
    shape_bad = [
        {"doc_id": None, "text": "no id", "lang": "en", "source": "web", "n_chars": 5},
        {"doc_id": 3, "lang": "en", "source": "web", "n_chars": 0},  # text missing
    ]
    lines = [json.dumps(r) for r in good + shape_bad]
    lines.insert(2, '{"doc_id": 4, "text": "torn line')       # invalid JSON
    lines.append("complete garbage")                           # invalid JSON
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(lines) + "\n")

    clean, quarantine = read_jsonl(spark, str(p))
    got = sorted((r["doc_id"], r["text"]) for r in clean.collect())
    assert got == [(1, "hello world"), (2, "bonjour")]
    assert clean.columns == ["doc_id", "text", "lang", "source", "n_chars"]

    q = quarantine.collect()
    reasons = sorted(r["reason"] for r in q)
    assert reasons == ["json", "json", "shape", "shape"]
    # nothing silently dropped: every input line is in exactly one side
    assert clean.count() + quarantine.count() == len(lines)
    # corrupt raw lines preserved verbatim for reprocessing
    raws = {r["raw"] for r in q if r["reason"] == "json"}
    assert '{"doc_id": 4, "text": "torn line' in raws
    assert "complete garbage" in raws
    assert all(r["source_file"].endswith("corpus.jsonl") for r in q)


def test_jsonl_all_clean_roundtrip(spark, sf_dir, tmp_path):
    """documents written as JSONL and re-ingested must round-trip exactly
    with an empty quarantine."""
    from pyspark.sql import functions as F

    from databus_spark.catalog import load_table
    from databus_spark.sources.jsonl import read_jsonl

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_jsonl")
    docs.write.json(out)
    clean, quarantine = read_jsonl(spark, out + "/*.json")
    assert quarantine.count() == 0
    assert clean.count() == docs.count()
    assert (
        clean.agg(F.sum("doc_id"), F.sum(F.length("text"))).collect()
        == docs.agg(F.sum("doc_id"), F.sum(F.length("text"))).collect()
    )
