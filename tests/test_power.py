"""Power spectrum: CIC/NGP gridding vs an exact numpy twin, mass
conservation, periodic wrap, and a physics sanity check (a planted
plane wave shows up at its wavenumber and nowhere else)."""

import numpy as np
import pytest

from opencosmo_spark.spatial.power import (
    density_mesh,
    power_spectrum,
)

N_MESH = 16
BOX = 100.0


def _numpy_cic(pos, n, box, w=None):
    h = box / n
    rho = np.zeros((n, n, n))
    w = np.ones(len(pos)) if w is None else w
    s = pos / h - 0.5
    i0 = np.floor(s).astype(int)
    f = s - i0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                wt = (
                    (f[:, 0] if dx else 1 - f[:, 0])
                    * (f[:, 1] if dy else 1 - f[:, 1])
                    * (f[:, 2] if dz else 1 - f[:, 2])
                )
                np.add.at(
                    rho,
                    (
                        (i0[:, 0] + dx) % n,
                        (i0[:, 1] + dy) % n,
                        (i0[:, 2] + dz) % n,
                    ),
                    w * wt,
                )
    return rho


@pytest.fixture(scope="module")
def particles(spark):
    rng = np.random.default_rng(3)
    pos = rng.uniform(0, BOX, size=(4000, 3))
    wts = rng.uniform(0.5, 2.0, size=4000)
    df = spark.createDataFrame(
        [
            (float(x), float(y), float(z), float(w))
            for (x, y, z), w in zip(pos, wts)
        ],
        ["x", "y", "z", "w"],
    )
    return df, pos, wts


def test_cic_mesh_matches_numpy(spark, particles):
    df, pos, wts = particles
    mesh = density_mesh(df, N_MESH, BOX, weight="w").collect()
    got = np.zeros(N_MESH**3)
    for r in mesh:
        got[int(r["cell"])] = r["mass"]
    want = _numpy_cic(pos, N_MESH, BOX, wts).ravel()
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-9)
    # mass conservation is exact in both
    assert got.sum() == pytest.approx(wts.sum(), rel=1e-12)


def test_ngp_mesh_counts(spark, particles):
    df, pos, _ = particles
    mesh = density_mesh(df, N_MESH, BOX, scheme="ngp").collect()
    assert sum(r["mass"] for r in mesh) == len(pos)
    idx = (np.floor(pos / (BOX / N_MESH)).astype(int)) % N_MESH
    cells, counts = np.unique(
        (idx[:, 0] * N_MESH + idx[:, 1]) * N_MESH + idx[:, 2],
        return_counts=True,
    )
    got = {int(r["cell"]): r["mass"] for r in mesh}
    assert got == {int(c): float(n) for c, n in zip(cells, counts)}


def test_power_spectrum_plane_wave(spark):
    """Particles laid out with density 1 + eps*cos(k4 x) must show
    power in the k = 4*kf bin and noise-level power elsewhere."""
    rng = np.random.default_rng(7)
    n_part = 60_000
    # rejection-sample the modulated density
    x = rng.uniform(0, BOX, size=int(n_part * 2.5))
    keep = rng.uniform(0, 1, size=x.size) < (
        (1 + 0.6 * np.cos(2 * np.pi * 4 * x / BOX)) / 1.6
    )
    x = x[keep][:n_part]
    pos = np.column_stack(
        [x, rng.uniform(0, BOX, x.size), rng.uniform(0, BOX, x.size)]
    )
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in pos],
        ["x", "y", "z"],
    )
    out = power_spectrum(df, 32, BOX)
    kf = 2 * np.pi / BOX
    # the planted mode dominates every other bin by a wide margin,
    # and the dominating bin contains k = 4*kf (within a bin width)
    peak = int(np.argmax(out["power"]))
    assert abs(out["k"][peak] - 4 * kf) < 1.01 * kf
    others = np.delete(out["power"], peak)
    assert out["power"][peak] > 20 * np.abs(others).max()


def test_power_spectrum_shot_noise_flat(spark, particles):
    """Pure Poisson particles: after shot-noise subtraction the
    spectrum is ~0; without it, ~V/N in every bin."""
    df, pos, _ = particles
    raw = power_spectrum(
        df, N_MESH, BOX, subtract_shot_noise=False, weight=None
    )
    sub = power_spectrum(df, N_MESH, BOX, weight=None)
    shot = BOX**3 / len(pos)
    assert raw["shot_noise"] == pytest.approx(shot, rel=1e-12)
    mid = slice(1, len(raw["k"]) - 1)
    assert np.abs(raw["power"][mid] - shot).mean() < 0.6 * shot
    assert np.abs(sub["power"][mid]).mean() < 0.6 * shot


def test_cross_power_auto_equals_power(spark, particles):
    """cross(X, X) must equal the uncorrected auto spectrum exactly
    (same meshes, same FFT, no shot subtraction)."""
    from opencosmo_spark.spatial.power import cross_power_spectrum

    df, _, _ = particles
    auto = power_spectrum(
        df, N_MESH, BOX, weight="w", subtract_shot_noise=False
    )
    cross = cross_power_spectrum(
        df, df, N_MESH, BOX, weight_a="w", weight_b="w"
    )
    np.testing.assert_allclose(cross["power"], auto["power"], rtol=1e-12)
    np.testing.assert_array_equal(cross["n_modes"], auto["n_modes"])


def test_cross_power_independent_fields_near_zero(spark):
    """Two INDEPENDENT Poisson sets decorrelate: the cross power is
    far below either auto power (which sits at its shot noise)."""
    from opencosmo_spark.spatial.power import cross_power_spectrum

    rng = np.random.default_rng(21)
    mk = lambda seed: spark.createDataFrame(
        [
            (float(a), float(b), float(c))
            for a, b, c in np.random.default_rng(seed).uniform(
                0, BOX, size=(4000, 3)
            )
        ],
        ["x", "y", "z"],
    )
    a, b = mk(1), mk(2)
    cross = cross_power_spectrum(a, b, N_MESH, BOX)
    auto = power_spectrum(a, N_MESH, BOX, subtract_shot_noise=False)
    mid = slice(1, None)
    assert (
        np.abs(cross["power"][mid]).mean()
        < 0.35 * auto["power"][mid].mean()
    )


def test_sample_mesh_at_matches_numpy_trilinear(spark, particles):
    """Environment interpolation equals the numpy twin (same CIC
    kernel gathering from the same grid, empty cells = delta -1)."""
    from opencosmo_spark.spatial.power import density_mesh, sample_mesh_at

    df, pos, wts = particles
    mesh = density_mesh(df, N_MESH, BOX, weight="w")
    probes = [(i, float(p[0]), float(p[1]), float(p[2]))
              for i, p in enumerate(pos[:200])]
    pdf = spark.createDataFrame(probes, ["halo_tag", "x", "y", "z"])
    got = {
        r["halo_tag"]: r["delta"]
        for r in sample_mesh_at(pdf, mesh, N_MESH, BOX).collect()
    }
    rho = _numpy_cic(pos, N_MESH, BOX, wts)
    delta = rho / rho.mean() - 1.0
    h = BOX / N_MESH
    for i, x, y, z in probes:
        s = np.array([x, y, z]) / h - 0.5
        i0 = np.floor(s).astype(int)
        f = s - i0
        want = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    w = (
                        (f[0] if dx else 1 - f[0])
                        * (f[1] if dy else 1 - f[1])
                        * (f[2] if dz else 1 - f[2])
                    )
                    want += w * delta[
                        (i0[0] + dx) % N_MESH,
                        (i0[1] + dy) % N_MESH,
                        (i0[2] + dz) % N_MESH,
                    ]
        assert got[i] == pytest.approx(want, rel=1e-10, abs=1e-10)


def test_counts_in_cells_matches_numpy_and_physics(spark, particles):
    """CIC-in-cells moments vs a dense numpy twin (empty cells
    included), Poisson shot-noise subtraction ~0 on an unclustered
    field, and planted clumps driving positive skewness / excess
    variance."""
    from opencosmo_spark.spatial.power import counts_in_cells

    df, pos, wts = particles
    n = 8
    got = counts_in_cells(df, n, BOX, scheme="ngp")

    # dense numpy twin: NGP counts over ALL n^3 cells
    h = BOX / n
    idx = np.floor(pos / h).astype(int) % n
    rho = np.zeros((n, n, n))
    np.add.at(rho, (idx[:, 0], idx[:, 1], idx[:, 2]), 1.0)
    flat = rho.ravel()
    assert got["n_cells"] == n**3
    assert got["n_occupied"] == int((flat > 0).sum())
    assert got["mean"] == pytest.approx(flat.mean(), rel=1e-12)
    assert got["variance"] == pytest.approx(flat.var(), rel=1e-9)
    m2, m3 = flat.var(), ((flat - flat.mean()) ** 3).mean()
    m4 = ((flat - flat.mean()) ** 4).mean()
    assert got["skewness"] == pytest.approx(m3 / m2**1.5, rel=1e-9)
    assert got["kurtosis"] == pytest.approx(m4 / m2**2 - 3, rel=1e-9)
    mean = flat.mean()
    assert got["delta_var"] == pytest.approx(m2 / mean**2, rel=1e-9)
    assert got["s3"] == pytest.approx(
        (m3 / mean**3) / (m2 / mean**2) ** 2, rel=1e-9
    )

    # Poisson physics: unclustered -> corrected delta variance ~ 0
    # (|corrected| far below the raw 1/mean shot-noise term)
    assert abs(got["delta_var_shotnoise_corrected"]) < 0.3 / mean

    # clumps: pile half the particles into one cell-sized blob
    rng = np.random.default_rng(5)
    blob = np.array([50.0, 50.0, 50.0]) + rng.uniform(0, h / 2, (4000, 3))
    clumped = np.vstack([pos, blob])
    cdf = spark.createDataFrame(
        [(float(x), float(y), float(z)) for x, y, z in clumped],
        ["x", "y", "z"],
    )
    cgot = counts_in_cells(cdf, n, BOX, scheme="ngp")
    assert cgot["skewness"] > 5 * max(got["skewness"], 0.1)
    assert (
        cgot["delta_var_shotnoise_corrected"]
        > 10 * abs(got["delta_var_shotnoise_corrected"])
    )

    # weighted CIC twin: moments over the dense CIC mesh
    wgot = counts_in_cells(df, n, BOX, weight="w", scheme="cic")
    wflat = _numpy_cic(pos, n, BOX, wts).ravel()
    assert wgot["mean"] == pytest.approx(wflat.mean(), rel=1e-9)
    assert wgot["variance"] == pytest.approx(wflat.var(), rel=1e-9)


def test_tracer_bias_nulls_and_signal(spark, particles):
    """b(k) estimator consistency: tracers == matter gives b = r = 1
    identically at every k; a clump-only tracer set is biased high
    (b > 1 at the largest scales) while r stays <= 1."""
    from opencosmo_spark.spatial.power import tracer_bias

    df, pos, wts = particles
    out = tracer_bias(df, df, 16, BOX)
    assert np.allclose(out["b"], 1.0, atol=1e-10)
    assert np.allclose(out["r"], 1.0, atol=1e-10)

    # biased tracers: keep only particles near planted clump centers
    rng = np.random.default_rng(67)
    centers = rng.uniform(0, BOX, size=(10, 3))
    clumps = np.concatenate(
        [(c + rng.normal(0, 3.0, size=(200, 3))) % BOX for c in centers]
    )
    allpos = np.vstack([pos, clumps])
    matter = spark.createDataFrame(
        [(float(x), float(y), float(z)) for x, y, z in allpos],
        ["x", "y", "z"],
    )
    tracers = spark.createDataFrame(
        [(float(x), float(y), float(z)) for x, y, z in clumps],
        ["x", "y", "z"],
    )
    biased = tracer_bias(tracers, matter, 16, BOX)
    # the clump field over-weights the structured part of matter:
    # large-scale (lowest-k) bias exceeds 1
    assert biased["b"][0] > 1.1
    assert all(r <= 1.0 + 1e-9 for r in biased["r"] if not np.isnan(r))

    with pytest.raises(ValueError, match="empty"):
        tracer_bias(df.filter("x < -1"), df, 8, BOX)


def test_mesh_assembly_is_vectorized_no_row_loop(spark, particles):
    """The mesh→numpy assembly must go through Arrow toPandas + one
    numpy scatter, never a per-row collect() loop. Timing-free proof:
    poison DataFrame.collect and assert assembly still works AND
    matches the numpy CIC twin exactly."""
    from unittest import mock

    from pyspark.sql import DataFrame

    from opencosmo_spark.spatial.power import _mesh_to_numpy

    df, pos, wts = particles
    mesh = density_mesh(df, N_MESH, BOX, weight="w")
    with mock.patch.object(
        DataFrame,
        "collect",
        side_effect=AssertionError("row-loop collect() in mesh assembly"),
    ):
        rho = _mesh_to_numpy(mesh, N_MESH)
    assert np.allclose(rho, _numpy_cic(pos, N_MESH, BOX, wts), atol=1e-8)


def test_mesh_driver_budget_guard(spark, particles):
    """n_mesh over the driver budget raises loudly; an explicit
    max_mesh_cells override lifts the gate."""
    from opencosmo_spark.spatial.power import _mesh_to_numpy

    df, pos, wts = particles
    with pytest.raises(ValueError, match="max_mesh_cells"):
        power_spectrum(df, 1024, BOX)
    # the guard fires before any cluster work: a poisoned plan is fine
    with pytest.raises(ValueError, match="max_mesh_cells"):
        _mesh_to_numpy(df, 1024)
    # explicit override admits a small mesh under a tiny budget
    mesh = density_mesh(df, 8, BOX)
    rho = _mesh_to_numpy(mesh, 8, max_mesh_cells=8**3)
    assert rho.shape == (8, 8, 8)
    with pytest.raises(ValueError, match="max_mesh_cells"):
        _mesh_to_numpy(mesh, 8, max_mesh_cells=8**3 - 1)
