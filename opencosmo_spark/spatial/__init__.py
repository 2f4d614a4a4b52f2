from .crossmatch import (
    crossmatch_sky,
    precompute_rr_sky,
    sky_fof_groups,
    sky_pairs,
    uniform_sky_catalog,
    w_theta_landy_szalay,
)
from .region import (
    BoxRegion,
    ConeRegion,
    FullSkyRegion,
    HealpixRegion,
    SkyboxRegion,
    make_box,
    make_cone,
    make_skybox,
)

from .power import cross_power_spectrum, density_mesh, power_spectrum, sample_mesh_at
from .pairs import (
    stacked_radial_profile,
    stacked_value_profile,
    fof_groups,
    neighbor_pairs_3d,
    precompute_rr,
    release_rr,
    two_point_correlation,
    two_point_landy_szalay,
)

__all__ = [
    "density_mesh",
    "power_spectrum",
    "cross_power_spectrum",
    "sample_mesh_at",
    "stacked_radial_profile",
    "stacked_value_profile",
    "crossmatch_sky",
    "sky_fof_groups",
    "sky_pairs",
    "uniform_sky_catalog",
    "w_theta_landy_szalay",
    "precompute_rr",
    "precompute_rr_sky",
    "release_rr",
    "neighbor_pairs_3d",
    "two_point_correlation",
    "two_point_landy_szalay",
    "fof_groups",
    "BoxRegion",
    "ConeRegion",
    "SkyboxRegion",
    "HealpixRegion",
    "FullSkyRegion",
    "make_box",
    "make_cone",
    "make_skybox",
]
