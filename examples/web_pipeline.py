"""End-to-end example: the web-corpus path — synthesize a small WARC
crawl, ingest it distributed, extract text, gate by URL blocklist,
curate, profile the result as a dataset card, rank the host graph,
and hand off training shards in WebDataset tar form.

    python examples/web_pipeline.py [work_dir]

Every step is the public package API; the same calls run on real
Common-Crawl segments unchanged (one ~1 GB segment = one task).
"""

import gzip
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, ".")

from opencosmo_spark import get_spark  # noqa: E402
from opencosmo_spark.pipeline import (  # noqa: E402
    corpus_report,
    curate_corpus,
    format_dataset_card,
    host_edges,
    pagerank,
    read_warc,
    warc_to_documents,
    write_tar_shards,
)

WORK = Path(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp())


def _record(rtype, rid, uri, payload, extra=b""):
    head = (
        b"WARC/1.0\r\nWARC-Type: " + rtype
        + b"\r\nWARC-Record-ID: <urn:uuid:" + rid + b">"
        + b"\r\nWARC-Date: 2024-01-15T10:00:00Z\r\n"
        + (b"WARC-Target-URI: " + uri + b"\r\n" if uri else b"")
        + extra
        + b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
    )
    return head + payload + b"\r\n\r\n"


def _http(body, ctype=b"text/html"):
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n\r\n" + body
    )


def _page(i, host, links):
    anchors = "".join(f'<a href="https://{h}/p">l</a>' for h in links)
    body = (
        f"<html><body><h1>Doc {i}</h1>"
        f"<p>This is a perfectly reasonable paragraph of prose with "
        f"enough ordinary words to pass the quality gate number {i}.</p>"
        f"{anchors}</body></html>"
    ).encode()
    return _record(
        b"response",
        f"{i:04d}".encode(),
        f"https://{host}/doc/{i}".encode(),
        _http(body),
    )


def make_crawl(path: Path) -> None:
    hosts = ["news.example.com", "blog.example.org", "spam.casino.biz"]
    segs = [[], []]
    for i in range(24):
        host = hosts[i % 3]
        links = [hosts[(i + 1) % 3]]
        segs[i % 2].append(_page(i, host, links))
    (path / "seg-00.warc").write_bytes(b"".join(segs[0]))
    (path / "seg-01.warc.gz").write_bytes(gzip.compress(b"".join(segs[1])))


def main():
    spark = get_spark("web-example")
    crawl = WORK / "crawl"
    crawl.mkdir(parents=True, exist_ok=True)
    make_crawl(crawl)

    # 1. distributed WARC ingestion -> curate-ready document rows
    warc = read_warc(spark, str(crawl))
    docs = warc_to_documents(warc)
    print("ingested docs:", docs.count())

    # 1b. the higher-precision ingestion the modern recipes use:
    #     charset='faithful' resolves each page's real encoding
    #     (header param or <meta> sniff) instead of UTF-8-mangling
    #     legacy pages; extract='main' runs the boilerplate-block
    #     classifier (nav/sidebar/footer dropped by link density —
    #     the RefinedWeb/FineWeb posture). Canonical URL keys then
    #     collapse tracked/reordered variants for refetch dedup.
    from opencosmo_spark.pipeline import canonical_url

    main_docs = warc_to_documents(warc, charset="faithful", extract="main")
    print("main-content docs:", main_docs.count())
    n_canon = docs.select(canonical_url("url")).distinct().count()
    print(f"canonical url keys: {n_canon}")

    # 2. URL gate + curation in one call (blocklist drops the spam
    #    host and every subdomain)
    curated, counts = curate_corpus(
        docs,
        min_quality=0.0,
        min_tokens=5,
        url_block_domains=["casino.biz"],
    )
    print("curation attrition:", counts)

    # 3. dataset card over the survivors
    report = corpus_report(curated, group_by=None)
    print(format_dataset_card(report, title="Example web corpus"))

    # 4. host-graph PageRank over the RAW html (link tags are gone
    #    from the extracted text — the graph reads the payload)
    from pyspark.sql import functions as F

    pages = warc.select(
        F.col("target_uri").alias("url"),
        F.col("payload").cast("string").alias("html"),
    )
    ranks = pagerank(host_edges(pages, url_col="url", html_col="html"))
    top = ranks.orderBy("rank", ascending=False).first()
    print(f"top host: {top['node']} rank={top['rank']:.4f}")

    # 5. training handoff: WebDataset tar shards
    out = WORK / "shards"
    manifest = write_tar_shards(
        curated.select("doc_id", "text"),
        str(out),
        columns={"text": "txt"},
        n_shards=2,
    ).collect()
    print(
        "wrote shards:",
        sorted((m["shard"], m["n_samples"]) for m in manifest),
    )
    spark.stop()


if __name__ == "__main__":
    main()
