"""End-to-end example: the survey-statistics toolkit on one synthetic
periodic box — redshift-space distortions, correlation multipoles,
projected wp(rp), jackknife error bars, pairwise infall velocities,
mass-marked correlation, stacked excess surface density ΔΣ(rp), an
NFW profile fit, and tracer bias — the round-7 statistics layer tied
together the way clustering_analysis.py ties the round-6 layer.

    python examples/survey_statistics.py

The box plants the physics each statistic must recover: clumps whose
members stream toward their centers (infall → negative v12 and a
Kaiser-squashed quadrupole in redshift space) and carry 10× the field
mass (marked correlation > 1 at clump scales, positive declining
ΔΣ(rp), large-scale bias > 1). Every step is the public package API;
each statistic is one cell-keyed pair join or one mesh aggregation —
the same shuffle shapes at survey scale (SCALE.md).
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from opencosmo_spark import get_spark  # noqa: E402
from opencosmo_spark.analysis import fit_nfw  # noqa: E402
from opencosmo_spark.spatial.pairs import (  # noqa: E402
    apply_rsd,
    correlation_multipoles,
    marked_correlation,
    pairwise_velocity,
    projected_correlation,
    stacked_delta_sigma,
    stacked_radial_profile,
    two_point_jackknife,
)
from opencosmo_spark.spatial.power import tracer_bias  # noqa: E402

BOX = 100.0
N_CLUMPS = 30
MEMBERS = 40


def make_box(spark, seed=19):
    """Uniform field + clumps with coherent infall along z and heavy
    masses — every survey statistic below has a planted sign."""
    rng = np.random.default_rng(seed)
    field = rng.uniform(0, BOX, size=(3000, 3))
    fvel = rng.normal(0, 15.0, size=(3000, 3))
    centers = rng.uniform(8, BOX - 8, size=(N_CLUMPS, 3))
    members = np.concatenate(
        [c + rng.normal(0, 1.5, size=(MEMBERS, 3)) for c in centers]
    )
    # members stream toward their clump center along the line of
    # sight: dz -> -dz*60 km/s (the Kaiser-squash construction)
    mvz = np.concatenate(
        [
            -(members[i * MEMBERS : (i + 1) * MEMBERS, 2] - c[2]) * 60.0
            for i, c in enumerate(centers)
        ]
    )
    mvel = np.zeros_like(members)
    mvel[:, 2] = mvz
    pts = np.concatenate([field, np.mod(members, BOX)])
    vel = np.concatenate([fvel, mvel])
    mass = np.concatenate(
        [np.ones(len(field)), np.full(len(members), 10.0)]
    )
    df = spark.createDataFrame(
        [
            (i, *map(float, p), *map(float, v), float(m))
            for i, (p, v, m) in enumerate(zip(pts, vel, mass))
        ],
        ["id", "x", "y", "z", "vx", "vy", "vz", "mass"],
    )
    cdf = spark.createDataFrame(
        [(i, *map(float, c)) for i, c in enumerate(centers)],
        ["id", "x", "y", "z"],
    )
    return df, cdf


def main():
    spark = get_spark("survey-statistics-example")
    parts, centers = make_box(spark)
    n = parts.count()
    print(f"box: {n} particles, {N_CLUMPS} planted infalling clumps")

    # 1. RSD: map to redshift space (one JVM column expression),
    # then the multipoles before/after — coherent infall squashes
    # structures along the line of sight, driving xi_2 down
    s_bins = [2.0, 6.0]
    zspace = apply_rsd(parts, BOX, hubble=100.0)
    real = correlation_multipoles(
        parts, s_bins, BOX, ells=(0, 2)
    ).collect()[0]
    shifted = correlation_multipoles(
        zspace, s_bins, BOX, ells=(0, 2)
    ).collect()[0]
    print(
        f"multipoles s={s_bins[0]:.0f}-{s_bins[1]:.0f}: real "
        f"xi_0={real['xi_0']:.3f} xi_2={real['xi_2']:.3f} | zspace "
        f"xi_0={shifted['xi_0']:.3f} xi_2={shifted['xi_2']:.3f}"
    )
    assert shifted["xi_2"] < real["xi_2"], "Kaiser squash missing"

    # 2. wp(rp): the projection integral absorbs the z-shift — the
    # RSD-insensitive statistic stays clustered in both spaces
    wp_real = projected_correlation(
        parts, [0.5, 2.0, 6.0], pi_max=10.0, box_size=BOX
    ).collect()
    for r in wp_real:
        print(
            f"wp(rp {r['rp_lo']:.1f}-{r['rp_hi']:.1f}) = {r['wp']:.2f}"
        )
    assert wp_real[0]["wp"] > wp_real[1]["wp"] > 0, "wp must decline"

    # 3. jackknife error bars on xi(r): ALL K=27 leave-one-out
    # resamples from ONE pair join
    jk = two_point_jackknife(
        parts, [0.5, 2.0, 8.0], BOX, n_side=3
    ).collect()
    for r in jk:
        print(
            f"xi_jk({r['r_lo']:.1f}-{r['r_hi']:.1f}) = {r['xi']:.3f} "
            f"+- {r['xi_err']:.3f}"
        )
    assert jk[0]["xi"] > 3 * jk[0]["xi_err"] > 0, "clumps are >3 sigma"

    # 4. pairwise velocity: infall makes v12 negative at clump scales
    v12 = pairwise_velocity(parts, [0.5, 3.0, 10.0], BOX).collect()
    for r in v12:
        print(
            f"v12({r['r_lo']:.1f}-{r['r_hi']:.1f}) = "
            f"{r['v12_mean']:.1f} +- {r['v12_std']:.1f}"
        )
    assert v12[0]["v12_mean"] < -10.0, "net infall missing"

    # 5. mass-marked correlation: close pairs are heavy pairs
    mcf = marked_correlation(
        parts, [0.5, 3.0, 10.0], BOX, mark_col="mass"
    ).collect()
    for r in mcf:
        print(
            f"M({r['r_lo']:.1f}-{r['r_hi']:.1f}) = {r['mcf']:.2f}"
        )
    assert mcf[0]["mcf"] > 1.5, "mass marking missing at clump scales"

    # 6. stacked excess surface density around the planted centers —
    # outside the clump bulk (sigma=1.5) the lensing-style 1/rp^2
    # falloff of a compact mass shows up as positive declining excess
    ds = stacked_delta_sigma(
        centers, parts, [2.5, 5.0, 10.0], BOX, pi_max=8.0,
        mass_col="mass",
    ).collect()
    for r in ds:
        print(
            f"DeltaSigma(rp {r['rp_lo']:.1f}-{r['rp_hi']:.1f}) = "
            f"{r['delta_sigma']:.1f}"
        )
    assert ds[0]["delta_sigma"] > ds[-1]["delta_sigma"] > 0

    # 7. NFW fit of the stacked mass profile (driver-side: the
    # profile rows are the sufficient statistic)
    prof = stacked_radial_profile(
        centers, parts, list(np.geomspace(0.3, 8.0, 10)), BOX,
        mass_col="mass",
    )
    fit = fit_nfw(prof)
    print(
        f"NFW fit: r_s={fit['r_s']:.2f} rho_s={fit['rho_s']:.1f} "
        f"(log-rms {fit['log_rms']:.3f})"
    )
    assert 0.1 < fit["r_s"] < 8.0

    # 8. tracer bias: clump members against the full matter field —
    # two mesh aggregations share all three spectra
    members = parts.filter("mass > 1.0")
    bias = tracer_bias(members, parts, n_mesh=16, box_size=BOX)
    print(
        f"tracer bias: b(k_min)={bias['b'][0]:.2f} "
        f"r(k_min)={bias['r'][0]:.2f}"
    )
    assert bias["b"][0] > 1.1, "clump tracers must be biased high"

    print("survey statistics complete")
    spark.stop()


if __name__ == "__main__":
    main()
