"""JSONL corpus I/O: Dolma-style round trip, id synthesis, gzip,
schema enforcement."""

import gzip
import json

import pytest

from opencosmo_spark.pipeline.jsonl import read_jsonl, write_jsonl


def test_read_jsonl_with_ids_and_passthrough(spark, tmp_path):
    rows = [
        {"id": "a1", "text": "first doc", "lang": "en", "score": 0.5},
        {"id": "a2", "text": "second doc", "lang": "fr", "score": 0.9},
    ]
    f = tmp_path / "part-0.jsonl"
    f.write_text("\n".join(json.dumps(r) for r in rows))
    df = read_jsonl(spark, str(tmp_path)).toPandas().set_index("doc_id")
    assert sorted(df.index) == ["a1", "a2"]
    assert df.loc["a1", "text"] == "first doc"
    assert df.loc["a2", "lang"] == "fr"  # extra fields pass through
    assert "id" not in df.columns


def test_read_jsonl_synthesizes_stable_ids(spark, tmp_path):
    (tmp_path / "p.jsonl").write_text(
        '{"text": "no id here"}\n{"text": "another"}'
    )
    a = read_jsonl(spark, str(tmp_path)).toPandas()
    b = read_jsonl(spark, str(tmp_path)).toPandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)  # stable across reads
    assert a.doc_id.nunique() == 2
    with pytest.raises(ValueError, match="not found"):
        read_jsonl(spark, str(tmp_path), text_field="body")


def test_jsonl_gzip_round_trip(spark, tmp_path):
    src = spark.createDataFrame(
        [(f"d{i}", f"text {i}", i) for i in range(20)],
        ["doc_id", "text", "n"],
    )
    out = str(tmp_path / "corpus")
    write_jsonl(src, out, n_files=3)
    import glob

    gz = glob.glob(out + "/part-*.json.gz")
    assert len(gz) == 3
    # the gzip members really are JSONL
    line = gzip.open(gz[0], "rt").readline()
    assert set(json.loads(line)) == {"doc_id", "text", "n"}
    back = read_jsonl(spark, out, id_field="doc_id").toPandas()
    assert len(back) == 20
    assert sorted(back.doc_id) == sorted(src.toPandas().doc_id)
