"""Dataset.evaluate UDF tests (reference test_evaluate_formats.py
analog): row-wise and vectorized strategies, signature pruning,
insert modes, kwargs pass-through.
"""

import numpy as np
import pytest

import opencosmo_spark as oc


@pytest.fixture(scope="module")
def halos(spark, fixtures):
    return oc.open(f"{fixtures}/halo_properties")


def test_vectorized_insert(halos):
    def logm(fof_halo_mass):
        return {"logm": np.log10(fof_halo_mass)}

    out = halos.evaluate(logm, vectorize=True)
    data = out.get_data("pandas")
    np.testing.assert_allclose(
        data["logm"], np.log10(data["fof_halo_mass"]), rtol=1e-6
    )


def test_rowwise_insert(halos):
    def ratio(fof_halo_mass, sod_halo_mass):
        return {"ratio": float(sod_halo_mass / fof_halo_mass)}

    out = halos.take(50).evaluate(ratio)
    data = out.get_data("pandas")
    np.testing.assert_allclose(
        data["ratio"], data["sod_halo_mass"] / data["fof_halo_mass"], rtol=1e-6
    )


def test_kwargs_passthrough(halos):
    def scaled(fof_halo_mass, factor=1.0):
        return {"scaled": fof_halo_mass * factor}

    out = halos.take(20).evaluate(scaled, vectorize=True, factor=2.0)
    data = out.get_data("pandas")
    np.testing.assert_allclose(data["scaled"], data["fof_halo_mass"] * 2.0, rtol=1e-6)


def test_insert_false_returns_results(halos):
    def hist(fof_halo_mass):
        h, _ = np.histogram(np.log10(fof_halo_mass), bins=10, range=(11, 15))
        return h

    res = halos.evaluate(hist, vectorize=True, insert=False)
    assert res.sum() == len(halos)


def test_insert_false_rowwise_distributed(halos):
    def ratio(fof_halo_mass, sod_halo_mass):
        return float(sod_halo_mass / fof_halo_mass)

    sub = halos.take(40)
    res = sub.evaluate(ratio, insert=False)
    data = sub.get_data("pandas")
    expected = (data["sod_halo_mass"] / data["fof_halo_mass"]).tolist()
    assert res == pytest.approx(expected, rel=1e-9)


def test_insert_false_vectorized_batched_concat(halos):
    def logm(fof_halo_mass):
        return np.log10(fof_halo_mass)

    sub = halos.take(100)
    res = sub.evaluate(logm, vectorize=True, insert=False, batch_size=17)
    raw = sub.get_data("numpy")["fof_halo_mass"]
    np.testing.assert_allclose(res, np.log10(raw), rtol=1e-9)


def test_insert_false_never_collects_full_input(halos, monkeypatch):
    """The distributed insert=False paths must not materialize the
    input selection on the driver: every driver-side toPandas must be
    the <=8-row schema probe."""
    cls = type(halos.spark_df)  # the concrete (classic) DataFrame class
    seen = []
    orig = cls.toPandas

    def spy(self):
        out = orig(self)
        seen.append(len(out))
        return out

    monkeypatch.setattr(cls, "toPandas", spy)

    sub = halos.take(200)

    def ratio(fof_halo_mass, sod_halo_mass):
        return float(sod_halo_mass / fof_halo_mass)

    res = sub.evaluate(ratio, insert=False)
    assert len(res) == 200
    assert seen and max(seen) <= 8

    seen.clear()
    res2 = sub.evaluate(
        lambda fof_halo_mass: np.log10(fof_halo_mass),
        vectorize=True,
        insert=False,
        batch_size=50,
    )
    assert len(res2) == 200
    assert max(seen, default=0) <= 8


def test_signature_pruning_unknown_raises(halos):
    with pytest.raises(ValueError):
        halos.evaluate(lambda not_a_column: not_a_column * 2)


def test_pandas_format(halos):
    def mean_ratio(fof_halo_mass, sod_halo_mass):
        # pandas Series in
        return {"r": (sod_halo_mass / fof_halo_mass).to_numpy()}

    out = halos.take(30).evaluate(mean_ratio, vectorize=True, format="pandas")
    assert "r" in out.columns
