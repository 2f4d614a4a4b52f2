"""WebDataset tar sharding: deterministic round-trip, member order =
shard order, manifest accuracy, reader pruning and pivot."""

import tarfile

import pytest

from opencosmo_spark.pipeline.shard import assign_shards
from opencosmo_spark.pipeline.webdataset import (
    read_tar_shards,
    samples_from_members,
    write_tar_shards,
)

ROWS = [
    (f"doc{i:03d}", f"text body {i}", {"lang": "en", "i": i}, bytes([i, 255 - i]))
    for i in range(23)
]


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        ROWS, ["doc_id", "text", "meta", "payload"]
    )


def test_write_read_round_trip(spark, corpus, tmp_path):
    out = str(tmp_path / "wds")
    manifest = write_tar_shards(
        corpus,
        out,
        columns={"text": "txt", "meta": "json", "payload": "bin"},
        n_shards=4,
    ).toPandas()
    assert sorted(manifest["shard"]) == [0, 1, 2, 3]
    assert manifest["n_samples"].sum() == len(ROWS)

    back = read_tar_shards(spark, out)
    samples = samples_from_members(back, ("txt", "json", "bin")).toPandas()
    assert len(samples) == len(ROWS)
    got = {
        r["key"]: (bytes(r["txt"]).decode(), bytes(r["bin"]))
        for _, r in samples.iterrows()
    }
    for doc_id, text, _meta, payload in ROWS:
        assert got[doc_id] == (text, payload)
    # json members carry canonical serialization
    import json

    metas = {
        r["key"]: json.loads(bytes(r["json"]))
        for _, r in samples.iterrows()
    }
    # (Spark inferred the python dict as map<string,string>, so the
    # int arrived stringly — the json member round-trips what Spark held)
    assert metas["doc007"] == {"lang": "en", "i": "7"}


def test_member_order_is_shard_order_and_reproducible(spark, corpus, tmp_path):
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    for out in (out1, out2):
        write_tar_shards(
            corpus, out, columns={"text": "txt"}, n_shards=3
        ).collect()
    # byte-identical archives across runs (mtime pinned, hash order)
    for shard in range(3):
        b1 = (tmp_path / "a" / f"shard-{shard:05d}.tar").read_bytes()
        b2 = (tmp_path / "b" / f"shard-{shard:05d}.tar").read_bytes()
        assert b1 == b2
    # member order within a tar == assign_shards position order
    expect = (
        assign_shards(corpus, 3, id_col="doc_id")
        .select("doc_id", "shard", "shard_pos")
        .toPandas()
    )
    for shard in range(3):
        want = list(
            expect[expect["shard"] == shard]
            .sort_values("shard_pos")["doc_id"]
        )
        with tarfile.open(tmp_path / "a" / f"shard-{shard:05d}.tar") as tar:
            names = [m.name[: -len(".txt")] for m in tar if m.isfile()]
        assert names == want


def test_reader_extension_pruning_and_prestamped_shards(spark, corpus, tmp_path):
    out = str(tmp_path / "wds")
    pre = corpus.withColumn(
        "shard", (corpus["doc_id"].substr(4, 3).cast("int") % 2)
    )
    write_tar_shards(
        pre, out, columns={"text": "txt", "payload": "bin"}
    ).collect()
    only_txt = read_tar_shards(spark, out, extensions=("txt",)).toPandas()
    assert set(only_txt["ext"]) == {"txt"}
    assert len(only_txt) == len(ROWS)
    # missing shard spec is a loud error
    with pytest.raises(ValueError, match="n_shards"):
        write_tar_shards(corpus, out, columns={"text": "txt"})
    with pytest.raises(ValueError, match="not in the input"):
        write_tar_shards(corpus, out, columns={"nope": "txt"}, n_shards=2)
