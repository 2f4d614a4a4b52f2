"""Product quantization (encode / ADC search / training) and
temperature-based data mixing."""

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from opencosmo_spark.pipeline import (
    pq_encode,
    pq_pack_codes,
    pq_search,
    pq_train_codebooks,
    temperature_mixture_rates,
    temperature_sample,
)


def _vec_df(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )


# hand-built 2-subspace codebooks over 4-d vectors (dsub=2, ksub=2)
BOOKS = [
    [[0.0, 0.0], [10.0, 10.0]],  # subspace 0
    [[0.0, 5.0], [5.0, 0.0]],  # subspace 1
]


def test_pq_encode_matches_numpy_argmin(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(0, 6, size=(50, 4))
    df = _vec_df(spark, vecs)
    got = {
        r["vec_id"]: list(r["pq_codes"])
        for r in pq_encode(df, BOOKS).collect()
    }
    for i, v in enumerate(vecs):
        for s in range(2):
            sub = v[s * 2 : (s + 1) * 2]
            dists = [float(np.sum((sub - np.array(c)) ** 2)) for c in BOOKS[s]]
            want = int(np.argmin(np.round(dists, 6)))
            assert got[i][s] == want, (i, s)


def test_pq_search_matches_numpy_adc(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(0, 6, size=(40, 4))
    df = pq_encode(_vec_df(spark, vecs), BOOKS)
    q = [1.0, 2.0, 3.0, 4.0]
    got = [(r["vec_id"], r["adc_dist"]) for r in pq_search(df, BOOKS, q, k=5).collect()]

    # numpy ADC: distance table lookup per code
    tables = [
        [round(float(np.sum((np.array(q[s * 2 : (s + 1) * 2]) - np.array(c)) ** 2)), 6)
         for c in BOOKS[s]]
        for s in range(2)
    ]
    codes = {
        r["vec_id"]: list(r["pq_codes"]) for r in df.collect()
    }
    adc = {i: round(sum(tables[s][c[s]] for s in range(2)), 6) for i, c in codes.items()}
    want = sorted(adc.items(), key=lambda kv: (kv[1], kv[0]))[:5]
    assert [(i, pytest.approx(d, abs=1e-6)) for i, d in want] == got


def test_pq_search_reads_only_codes(spark, tmp_path):
    """Against a materialized encoded table (the ingest posture), the
    ADC scan must not read the embedding column at all — the whole
    point of PQ is scanning m-byte codes; a plan that still reads the
    vectors would be 64x the IO at scale."""
    rng = np.random.default_rng(3)
    path = str(tmp_path / "pq")
    pq_encode(_vec_df(spark, rng.normal(0, 6, size=(20, 4))), BOOKS).write.parquet(
        path
    )
    enc = spark.read.parquet(path)
    plan = (
        pq_search(enc, BOOKS, [0.0] * 4, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "ReadSchema" in plan and "embedding" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_pq_pack_codes_roundtrip(spark):
    df = spark.createDataFrame([Row(pq_codes=[3, 0, 255, 17])])
    packed = df.select(pq_pack_codes().alias("p")).collect()[0]["p"]
    assert packed == ((3 * 256 + 0) * 256 + 255) * 256 + 17


def test_pq_pack_codes_no_sign_overflow(spark):
    """m=8 with a leading code >= 128 needs the full 64 bits — the
    BIGINT form wrapped negative here; DECIMAL(38,0) must not."""
    codes = [255, 255, 255, 255, 255, 255, 255, 255]
    df = spark.createDataFrame([Row(pq_codes=codes)])
    packed = df.select(pq_pack_codes().alias("p")).collect()[0]["p"]
    want = 0
    for c in codes:
        want = want * 256 + c
    assert packed == want == 2**64 - 1


def test_pq_train_separates_clusters(spark):
    # two tight blobs per subspace: trained codebooks must land one
    # centroid near each blob, and encoding must separate the blobs
    rng = np.random.default_rng(5)
    a = rng.normal(0, 0.1, size=(30, 4))
    b = rng.normal(8, 0.1, size=(30, 4))
    vecs = np.vstack([a, b])
    df = _vec_df(spark, vecs)
    books = pq_train_codebooks(df, m=2, ksub=2, iters=4)
    assert len(books) == 2 and all(len(bk) == 2 for bk in books)
    enc = pq_encode(df, books)
    codes = {r["vec_id"]: tuple(r["pq_codes"]) for r in enc.collect()}
    blob_a = {codes[i] for i in range(30)}
    blob_b = {codes[i] for i in range(30, 60)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b
    # centroids converged onto the blob means (within a wide tolerance)
    cents = sorted(books[0], key=lambda c: c[0])
    assert cents[0][0] == pytest.approx(0.0, abs=0.5)
    assert cents[1][0] == pytest.approx(8.0, abs=0.5)


# ---------------------------------------------------------------- mixing
def _mix_df(spark, sizes):
    rows = []
    i = 0
    for grp, n in sizes.items():
        for _ in range(n):
            rows.append(Row(doc_id=i, lang=grp))
            i += 1
    return spark.createDataFrame(rows)


def test_temperature_rates_alpha_one_is_proportional(spark):
    df = _mix_df(spark, {"en": 800, "de": 150, "fr": 50})
    rates = temperature_mixture_rates(df, "lang", alpha=1.0, target_frac=0.4)
    # alpha=1: every group keeps the same fraction
    assert rates["en"] == pytest.approx(0.4)
    assert rates["de"] == pytest.approx(0.4)
    assert rates["fr"] == pytest.approx(0.4)


def test_temperature_rates_upweight_small_groups(spark):
    df = _mix_df(spark, {"en": 800, "de": 150, "fr": 50})
    rates = temperature_mixture_rates(df, "lang", alpha=0.5, target_frac=0.4)
    assert rates["fr"] > rates["de"] > rates["en"]
    # expected kept mass hits the target
    kept = 800 * rates["en"] + 150 * rates["de"] + 50 * rates["fr"]
    assert kept == pytest.approx(0.4 * 1000, rel=1e-9)


def test_temperature_rates_waterfill_clamps(spark):
    # tiny group would need rate > 1; it clamps to 1.0 and the excess
    # spreads to the others, still meeting the target exactly
    df = _mix_df(spark, {"en": 980, "fr": 20})
    rates = temperature_mixture_rates(df, "lang", alpha=0.1, target_frac=0.5)
    assert rates["fr"] == 1.0
    kept = 980 * rates["en"] + 20 * rates["fr"]
    assert kept == pytest.approx(0.5 * 1000, rel=1e-9)
    assert 0.0 < rates["en"] < 1.0


def test_temperature_sample_deterministic_and_near_target(spark):
    df = _mix_df(spark, {"en": 600, "de": 300, "fr": 100})
    out1 = temperature_sample(df, "lang", alpha=0.6, target_frac=0.5)
    out2 = temperature_sample(df, "lang", alpha=0.6, target_frac=0.5)
    ids1 = sorted(r["doc_id"] for r in out1.collect())
    ids2 = sorted(r["doc_id"] for r in out2.collect())
    assert ids1 == ids2  # hash-deterministic, not RNG
    # the realized fraction is close to the target (hash noise only)
    assert abs(len(ids1) / 1000 - 0.5) < 0.08


def test_pq_search_rejects_wrong_dim(spark):
    df = pq_encode(_vec_df(spark, np.zeros((3, 4))), BOOKS)
    with pytest.raises(ValueError, match="dim"):
        pq_search(df, BOOKS, [0.0] * 3, k=2)


def test_temperature_sample_null_stratum(spark):
    # NULL-stratum rows are a legal group: they get a temperature rate
    # like any other and the CASE compiles to isNull()
    rows = [Row(doc_id=i, lang="en") for i in range(80)]
    rows += [Row(doc_id=100 + i, lang=None) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING")
    rates = temperature_mixture_rates(df, "lang", alpha=0.5, target_frac=0.5)
    assert None in rates and rates[None] > rates["en"]
    out = temperature_sample(df, "lang", alpha=0.5, target_frac=0.5)
    kept = out.count()
    assert 0 < kept < 100


def test_ivf_pq_search_recovers_exact_with_rerank(spark):
    """IVF probe -> ADC scan -> exact rerank: with full probes and
    rerank, the result equals brute-force cosine top-k."""
    from opencosmo_spark.pipeline import (
        assign_ivf_cells,
        brute_force_cosine_topk,
        ivf_pq_search,
        pq_train_codebooks,
        train_ivf_codebook,
    )

    rng = np.random.default_rng(9)
    vecs = np.vstack(
        [rng.normal(0, 0.3, size=(25, 8)), rng.normal(5, 0.3, size=(25, 8))]
    )
    df = _vec_df(spark, vecs)
    ivf = train_ivf_codebook(df, nlist=2, iters=3, vec_col="embedding")
    books = pq_train_codebooks(df, m=4, ksub=4, iters=3)
    from opencosmo_spark.pipeline import pq_encode

    enc = pq_encode(assign_ivf_cells(df, ivf), books)
    q = list(vecs[3])

    got = ivf_pq_search(
        enc, ivf, books, q, k=5, nprobe=2, rerank=df
    ).collect()
    want = brute_force_cosine_topk(df, q, k=5).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in got] == [
        (r["vec_id"], r["cos_sim"]) for r in want
    ]

    # single-probe ADC-only: stays inside the query's blob
    adc_only = ivf_pq_search(enc, ivf, books, q, k=5, nprobe=1).collect()
    assert all(r["vec_id"] < 25 for r in adc_only)
