"""The examples must actually run — they are the documented
compositions users copy. Subprocess-isolated (each example owns and
stops its SparkSession)."""

import subprocess
import sys


def test_embedding_pipeline_example_runs():
    out = subprocess.run(
        [sys.executable, "examples/embedding_pipeline.py",
         "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "pca: kept k=8 axes" in out.stdout
    assert "ann top-5:" in out.stdout
    assert "semantic dedup:" in out.stdout
    assert "index search: top-1" in out.stdout
    assert "index append: +" in out.stdout
    assert "pooled docs:" in out.stdout  # chunk->pool->recall sweep


def test_curation_pipeline_example_runs():
    out = subprocess.run(
        [sys.executable, "examples/curation_pipeline.py",
         "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "curation attrition:" in out.stdout
    assert "release chain: v1 kept" in out.stdout
    assert "perplexity bands:" in out.stdout
    assert "classifier:" in out.stdout
    assert "calibration: ece=" in out.stdout
    assert "| gram | count |" in out.stdout  # card n-gram section
    assert "budget mix: 200 survivors" in out.stdout  # exact-k reservoir
    assert "bm25 top-5:" in out.stdout
    assert "incremental batch:" in out.stdout
    assert "profile artifact:" in out.stdout  # mergeable card shards
    assert "churn raw->curated:" in out.stdout
    assert "overlap sketch jaccard:" in out.stdout


def test_web_pipeline_example_runs(tmp_path):
    out = subprocess.run(
        [sys.executable, "examples/web_pipeline.py", str(tmp_path)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ingested docs: 24" in out.stdout
    assert "main-content docs:" in out.stdout
    assert "canonical url keys:" in out.stdout
    assert "'url_gate': 16" in out.stdout
    assert "# Example web corpus" in out.stdout
    assert "top host:" in out.stdout
    assert "wrote shards: [(0, 8), (1, 8)]" in out.stdout


def test_clustering_analysis_example_runs():
    out = subprocess.run(
        [sys.executable, "examples/clustering_analysis.py"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "fof: 12 groups with >= 20 members" in out.stdout
    assert "P(k):" in out.stdout and "shot noise" in out.stdout
    assert "densest center:" in out.stdout


def test_lightcone_analysis_example_runs():
    out = subprocess.run(
        [sys.executable, "examples/lightcone_analysis.py"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "lightcone: 4200 objects" in out.stdout
    assert "comoving depth:" in out.stdout
    assert "3-D pairs within 20 Mpc/h:" in out.stdout


def test_survey_statistics_example_runs():
    out = subprocess.run(
        [sys.executable, "examples/survey_statistics.py"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # the script itself asserts every planted-physics sign (Kaiser
    # xi_2 drop, declining wp, >3-sigma jackknife detection, net
    # infall v12 < 0, mass-marked M > 1, declining DeltaSigma,
    # bounded NFW r_s, b > 1); the sentinel proves it reached the end
    assert "survey statistics complete" in out.stdout
    assert "tracer bias: b(k_min)=" in out.stdout


def test_streaming_pipeline_example_runs():
    out = subprocess.run(
        [sys.executable, "examples/streaming_pipeline.py"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "windowed agg:" in out.stdout
    assert "sessions:" in out.stdout
    assert "first-arrival" in out.stdout
    assert "running stats: 15 users tracked" in out.stdout
    # the script itself asserts the sketch's modal kind equals the
    # batch groupBy's; the sentinel proves it got there
    assert "stream profile: 2 batch rows -> card docs=200" in out.stdout
    assert "streamed vector retrievable: top-1 for its own query = 60" in out.stdout
    assert "all full = True" in out.stdout and "ids consecutive = True" in out.stdout
    assert "streaming pipeline complete" in out.stdout


def test_sft_pipeline_example_runs():
    out = subprocess.run(
        [sys.executable, "examples/sft_pipeline.py",
         "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "conversations: 500" in out.stdout
    assert "mask check: span slices assistant content = True" in out.stdout
    assert "packed:" in out.stdout and "oversize=0" in out.stdout
    assert "all in-bounds = True" in out.stdout
    assert "shared prompt prefix = True" in out.stdout
    assert "pair hygiene:" in out.stdout
    assert "pretraining blocks:" in out.stdout
    assert "tokenizer artifact:" in out.stdout


def test_document_media_pipeline_example_runs():
    out = subprocess.run(
        [sys.executable, "examples/document_media_pipeline.py"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "pdf ledger" in out.stdout
    assert "extracted page images" in out.stdout
    assert "General Kenobi!" in out.stdout
    # audio section: real PCM row, metadata tier row, lyric document
    assert "mp3-meta" in out.stdout
    assert "Twinkle twinkle little star." in out.stdout
    assert "id3v2" in out.stdout
