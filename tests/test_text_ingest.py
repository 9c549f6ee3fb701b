"""Raw-corpus ingest (sources/text_ingest.py): JSONL/CSV/text → documents
shape, deterministic content-addressed ids, corrupt-line quarantine."""

from __future__ import annotations

import gzip
import json

import pytest

from heparchy_spark.sources.text_ingest import CORRUPT_COL, read_documents

DOCS = [
    {"text": "the quick brown fox", "lang": "en"},
    {"text": "jumps over the lazy dog", "lang": "en"},
    {"text": "pack my box with five dozen jugs", "lang": "en"},
]
SCHEMA = "text string, lang string"


@pytest.fixture()
def jsonl_dir(tmp_path):
    d = tmp_path / "jsonl"
    d.mkdir()
    (d / "a.jsonl").write_text("\n".join(json.dumps(r) for r in DOCS[:2]) + "\n")
    (d / "b.jsonl").write_text(json.dumps(DOCS[2]) + "\n")
    return str(d)


def test_jsonl_roundtrip_and_deterministic_ids(spark, jsonl_dir):
    df = read_documents(spark, jsonl_dir, "jsonl", schema=SCHEMA)
    rows = {r["text"]: r for r in df.collect()}
    assert set(rows) == {d["text"] for d in DOCS}
    assert all(r["lang"] == "en" for r in rows.values())
    assert all(r["source_file"].startswith("file:") for r in rows.values())
    # ids are content-addressed: a second, differently-partitioned read
    # produces identical ids
    again = {
        r["text"]: r["doc_id"]
        for r in read_documents(
            spark, jsonl_dir, "jsonl", schema=SCHEMA
        ).repartition(7).collect()
    }
    assert {t: r["doc_id"] for t, r in rows.items()} == again


def test_jsonl_gzip_transparent(spark, tmp_path):
    d = tmp_path / "gz"
    d.mkdir()
    with gzip.open(d / "a.jsonl.gz", "wt") as f:
        for r in DOCS:
            f.write(json.dumps(r) + "\n")
    df = read_documents(spark, str(d), "jsonl", schema=SCHEMA)
    assert df.count() == len(DOCS)


def test_corrupt_lines_dropped_or_quarantined(spark, tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    (d / "a.jsonl").write_text(
        json.dumps(DOCS[0]) + "\n" + "{this is not json\n" + json.dumps(DOCS[1]) + "\n"
    )
    clean = read_documents(spark, str(d), "jsonl", schema=SCHEMA)
    assert sorted(r["text"] for r in clean.collect()) == sorted(
        d_["text"] for d_ in DOCS[:2]
    )
    kept = read_documents(
        spark, str(d), "jsonl", schema=SCHEMA, keep_corrupt=True
    )
    bad = [r for r in kept.collect() if r["text"] is None]
    assert len(bad) == 1 and bad[0][CORRUPT_COL].startswith("{this")


def test_csv_and_text_formats(spark, tmp_path):
    c = tmp_path / "csv"
    c.mkdir()
    (c / "a.csv").write_text("text,lang\nhello world,en\nbonjour monde,fr\n")
    df = read_documents(spark, str(c), "csv", schema="text string, lang string")
    assert {(r["text"], r["lang"]) for r in df.collect()} == {
        ("hello world", "en"), ("bonjour monde", "fr"),
    }
    t = tmp_path / "txt"
    t.mkdir()
    (t / "a.txt").write_text("line one\nline two\n")
    tdf = read_documents(spark, str(t), "text")
    assert sorted(r["text"] for r in tdf.collect()) == ["line one", "line two"]
    assert "doc_id" in tdf.columns and "source_file" in tdf.columns


def test_exact_dupes_collapse_to_one_id(spark, tmp_path):
    d = tmp_path / "dup"
    d.mkdir()
    (d / "a.jsonl").write_text(
        json.dumps({"text": "same text", "lang": "en"}) + "\n"
        + json.dumps({"text": "same text", "lang": "fr"}) + "\n"
    )
    df = read_documents(spark, str(d), "jsonl", schema=SCHEMA)
    ids = [r["doc_id"] for r in df.collect()]
    assert len(ids) == 2 and len(set(ids)) == 1


def test_read_documents_handles_reserved_column_collisions(spark, tmp_path):
    """Input already carrying doc_id (a re-ingested dump) must not yield
    duplicate columns; corrupt rows get distinct content-addressed ids
    from their raw line instead of collapsing onto the null-hash."""
    import json

    import pyspark.sql.functions as F

    from heparchy_spark.sources.text_ingest import read_documents

    p = tmp_path / "dump.jsonl"
    lines = [
        json.dumps({"doc_id": 7, "text": "alpha beta"}),
        json.dumps({"doc_id": 8, "text": "gamma delta"}),
        "{broken json A",
        "{broken json B",
    ]
    p.write_text("\n".join(lines))
    schema = "doc_id long, text string"
    out = read_documents(
        spark, str(p), "jsonl", schema=schema, keep_corrupt=True
    )
    assert out.columns.count("doc_id") == 1
    rows = out.collect()
    # the two corrupt lines carry DIFFERENT ids (hashed from raw line)
    corrupt_ids = [r.doc_id for r in rows if r.text is None]
    assert len(corrupt_ids) == 2 and len(set(corrupt_ids)) == 2
    # downstream references resolve unambiguously
    assert out.where(F.col("doc_id").isNotNull()).count() == 4
