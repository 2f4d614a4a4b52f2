"""End-to-end example: the clustering-analysis toolkit on a synthetic
periodic box — FoF group finding, two-point correlation, matter power
spectrum, halo-centric density profiles, and environment tagging.

    python examples/clustering_analysis.py

Every step is the public package API; at survey scale the same calls
run unchanged (see SCALE.md for each operator's shuffle shape).
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from opencosmo_spark import get_spark  # noqa: E402
from opencosmo_spark.spatial import (  # noqa: E402
    density_mesh,
    fof_groups,
    power_spectrum,
    sample_mesh_at,
    stacked_radial_profile,
    two_point_correlation,
)

BOX = 100.0


def make_box(spark, n_field=4000, n_clusters=12, seed=11):
    """Field particles plus gaussian clumps — enough structure for
    every statistic to show a signal."""
    rng = np.random.default_rng(seed)
    field = rng.uniform(0, BOX, size=(n_field, 3))
    centers = rng.uniform(0, BOX, size=(n_clusters, 3))
    clumps = np.concatenate(
        [(c + rng.normal(0, 1.5, size=(120, 3))) % BOX for c in centers]
    )
    pts = np.concatenate([field, clumps])
    df = spark.createDataFrame(
        [(i, *map(float, p)) for i, p in enumerate(pts)],
        ["id", "x", "y", "z"],
    )
    cdf = spark.createDataFrame(
        [(i, *map(float, c)) for i, c in enumerate(centers)],
        ["id", "x", "y", "z"],
    )
    return df, cdf


def main():
    spark = get_spark("clustering-example")
    parts, centers = make_box(spark)
    n = parts.count()
    print(f"box: {n} particles, {centers.count()} planted clusters")

    # 1. FoF group finding (cell-keyed pair join + star CC)
    groups = fof_groups(parts, linking_length=1.2, box_size=BOX)
    sizes = (
        groups.groupBy("group_id").count().filter("count >= 20").count()
    )
    print(f"fof: {sizes} groups with >= 20 members")

    # 2. two-point correlation (periodic natural estimator)
    xi = two_point_correlation(
        parts, [0.5, 2.0, 8.0, 20.0], BOX, id_col="id"
    ).collect()
    for r in xi:
        print(
            f"xi({r['r_lo']:.1f}-{r['r_hi']:.1f}) = {r['xi']:.3f}"
            f"  (dd={r['dd']})"
        )

    # 3. matter power spectrum (CIC mesh -> driver FFT)
    pk = power_spectrum(parts, n_mesh=32, box_size=BOX)
    peak = int(np.argmax(pk["power"]))
    print(
        f"P(k): {len(pk['k'])} bins, max power {pk['power'][peak]:.1f} "
        f"at k={pk['k'][peak]:.3f} (shot noise {pk['shot_noise']:.1f})"
    )

    # 4. stacked density profile around the planted centers
    prof = stacked_radial_profile(
        centers, parts, [0.0, 2.0, 5.0, 15.0], BOX
    ).collect()
    for r in prof:
        print(
            f"rho({r['r_lo']:.0f}-{r['r_hi']:.0f}): "
            f"overdensity {r['overdensity']:.2f}"
        )

    # 5. environment tagging: overdensity at each center's position
    mesh = density_mesh(parts, 32, BOX)
    env = sample_mesh_at(
        centers, mesh, 32, BOX, id_col="id", out_col="delta"
    )
    top = env.orderBy("delta", ascending=False).first()
    print(f"densest center: id={top['id']} delta={top['delta']:.2f}")

    # 6. error bars: the same pair join, delete-one jackknife
    from opencosmo_spark.spatial.pairs import two_point_jackknife

    jk = two_point_jackknife(
        parts, [0.5, 2.0, 8.0], BOX, n_side=3
    ).collect()
    for r in jk:
        print(
            f"xi_jk({r['r_lo']:.1f}-{r['r_hi']:.1f}) = "
            f"{r['xi']:.3f} +- {r['xi_err']:.3f}"
        )

    # 7. counts-in-cells one-point moments at two smoothing scales
    from opencosmo_spark.spatial.power import counts_in_cells

    for nm in (8, 16):
        mom = counts_in_cells(parts, nm, BOX)
        print(
            f"CiC n={nm}: delta_var={mom['delta_var']:.3f} "
            f"(shot-corrected {mom['delta_var_shotnoise_corrected']:.3f}) "
            f"S3={mom['s3']:.2f}"
        )

    # 8. NFW fit of the stacked profile (driver-side, profile is the
    # sufficient statistic)
    from opencosmo_spark.analysis import fit_nfw
    from opencosmo_spark.spatial.pairs import stacked_radial_profile as srp

    fine = srp(centers, parts, list(np.geomspace(0.2, 8.0, 10)), BOX)
    fit = fit_nfw(fine)
    print(
        f"NFW fit: r_s={fit['r_s']:.2f} rho_s={fit['rho_s']:.1f} "
        f"(log-rms {fit['log_rms']:.3f})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
