"""PSI drift report vs manual computation."""

import math

import numpy as np
import pytest
from pyspark.sql import Row

from opencosmo_spark.pipeline import psi_report


def _df(spark, vals, langs=None):
    langs = langs or ["en"] * len(vals)
    return spark.createDataFrame(
        [Row(x=float(v), lang=l) for v, l in zip(vals, langs)]
    )


def test_psi_zero_for_identical(spark):
    rng = np.random.default_rng(1)
    vals = rng.normal(0, 1, 2000)
    a = _df(spark, vals)
    rep = psi_report(a, a, numeric_cols=["x"], categorical_cols=["lang"])
    assert rep["x"] == pytest.approx(0.0, abs=1e-9)
    assert rep["lang"] == pytest.approx(0.0, abs=1e-9)


def test_psi_detects_numeric_shift(spark):
    rng = np.random.default_rng(2)
    ref = _df(spark, rng.normal(0, 1, 2000))
    same = _df(spark, rng.normal(0, 1, 2000))
    shifted = _df(spark, rng.normal(1.5, 1, 2000))
    rep_same = psi_report(ref, same, numeric_cols=["x"])
    rep_shift = psi_report(ref, shifted, numeric_cols=["x"])
    assert rep_same["x"] < 0.1  # stable band
    assert rep_shift["x"] > 0.25  # major shift band
    assert rep_shift["x"] > rep_same["x"] * 5


def test_psi_categorical_manual(spark):
    # ref: 80/20 en/de; cur: 50/50 -> PSI computable by hand
    ref = _df(spark, range(100), ["en"] * 80 + ["de"] * 20)
    cur = _df(spark, range(100), ["en"] * 50 + ["de"] * 50)
    rep = psi_report(ref, cur, categorical_cols=["lang"])
    want = (0.5 - 0.8) * math.log(0.5 / 0.8) + (0.5 - 0.2) * math.log(0.5 / 0.2)
    assert rep["lang"] == pytest.approx(want, rel=1e-9)


def test_psi_nulls_and_new_values(spark):
    ref = spark.createDataFrame(
        [Row(x=1.0, lang="en"), Row(x=2.0, lang="en"), Row(x=None, lang="en")],
        "x DOUBLE, lang STRING",
    )
    cur = spark.createDataFrame(
        [Row(x=None, lang="fr"), Row(x=None, lang="fr"), Row(x=1.0, lang="fr")],
        "x DOUBLE, lang STRING",
    )
    rep = psi_report(ref, cur, numeric_cols=["x"], categorical_cols=["lang"])
    # nulls form their own bucket; a brand-new categorical value gets
    # epsilon-smoothed, not a crash — both PSIs are large and finite
    assert math.isfinite(rep["x"]) and rep["x"] > 0.25
    assert math.isfinite(rep["lang"]) and rep["lang"] > 0.25
