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


def test_signature_pruning_unknown_raises(halos):
    with pytest.raises(ValueError):
        halos.evaluate(lambda not_a_column: not_a_column * 2)


def test_pandas_format(halos):
    def mean_ratio(fof_halo_mass, sod_halo_mass):
        # pandas Series in
        return {"r": (sod_halo_mass / fof_halo_mass).to_numpy()}

    out = halos.take(30).evaluate(mean_ratio, vectorize=True, format="pandas")
    assert "r" in out.columns
