"""Z-order (Morton) octree cells: ingest-time cell ids + the driver-side
region -> cell-list compiler.

Parity target: reference ``python/opencosmo/spatial/octree.py:49-177``
(z-order indexing, recursive octant query) and ``spatial/tree.py``. The
reference maps cells to contiguous file row ranges; here the cell id is
an ordinary column — Parquet min/max row-group statistics on a
z-order-clustered cell column give the same chunk-skip effect, and a
physical ``partitionBy(cell)`` layout gives directory pruning.

The cell id at level L encodes the Morton interleave of the quantized
(x, y, z) coordinates: 3*L bits. Computed JVM-side with shift/or
expressions — no UDF, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .region import BoxRegion


def morton_cell_column(
    coords: list[Column],
    origin: list[float],
    box_size: float,
    level: int,
) -> Column:
    """Spark expression: Morton cell id at ``level`` for 2-D or 3-D
    coordinates inside [origin, origin + box_size)^d."""
    n = 1 << level
    d = len(coords)
    quantized = []
    for c, o in zip(coords, origin):
        q = F.floor((c - F.lit(o)) / F.lit(box_size) * F.lit(n)).cast("long")
        q = F.greatest(F.lit(0), F.least(F.lit(n - 1), q))
        quantized.append(q)
    cell = F.lit(0).cast("long")
    for bit in range(level):
        for axis, q in enumerate(quantized):
            src = F.shiftright(q, bit).bitwiseAND(F.lit(1))
            cell = cell.bitwiseOR(F.shiftleft(src, bit * d + axis))
    return cell


def _cell_box(cell_coords: tuple[int, ...], cell_size: float, origin: list[float]) -> BoxRegion:
    lo = [origin[i] + c * cell_size for i, c in enumerate(cell_coords)]
    hi = [v + cell_size for v in lo]
    if len(lo) == 2:
        lo, hi = lo + [0.0], hi + [1.0]  # embed 2-D in a unit slab
    return BoxRegion(tuple(lo), tuple(hi))


def _morton_encode(coords: tuple[int, ...], level: int) -> int:
    d = len(coords)
    out = 0
    for bit in range(level):
        for axis, q in enumerate(coords):
            out |= ((q >> bit) & 1) << (bit * d + axis)
    return out


def region_to_cells(
    region,
    origin: list[float],
    box_size: float,
    level: int,
    dims: int = 3,
) -> tuple[list[int], list[int]]:
    """Recursive octant walk (reference octree.py:131-177): returns
    (interior_cells, boundary_cells) at ``level``. Interior cells are
    fully contained in the region — their rows skip the exact test."""
    interior: list[int] = []
    boundary: list[int] = []

    def visit(lvl: int, coords: tuple[int, ...]):
        size = box_size / (1 << lvl)
        cell = _cell_box(coords, size, origin)
        # region vs cell classification
        probe = BoxRegion(cell.p1, cell.p2) if dims == 3 else cell
        if _region_contains_box(region, probe, dims):
            # whole subtree is interior: enumerate leaf cells
            _emit(lvl, coords, interior)
            return
        if not _region_intersects_box(region, probe, dims):
            return
        if lvl == level:
            boundary.append(_morton_encode(coords, level))
            return
        for child in range(1 << dims):
            cc = tuple(
                (coords[a] << 1) | ((child >> a) & 1) for a in range(dims)
            )
            visit(lvl + 1, cc)

    def _emit(lvl: int, coords: tuple[int, ...], out: list[int]):
        if lvl == level:
            out.append(_morton_encode(coords, level))
            return
        for child in range(1 << dims):
            cc = tuple((coords[a] << 1) | ((child >> a) & 1) for a in range(dims))
            _emit(lvl + 1, cc, out)

    visit(0, tuple(0 for _ in range(dims)))
    return interior, boundary


def _region_contains_box(region, box: BoxRegion, dims: int) -> bool:
    if isinstance(region, BoxRegion):
        return region.contains(box)
    # generic convex region: all 2^d corners inside
    corners = _corners(box, dims)
    return all(region.contains_point(*c) for c in corners)


def _region_intersects_box(region, box: BoxRegion, dims: int) -> bool:
    if isinstance(region, BoxRegion):
        return region.intersects(box)
    corners = _corners(box, dims)
    if any(region.contains_point(*c) for c in corners):
        return True
    # region center inside box covers region-smaller-than-cell
    center = getattr(region, "center", None)
    if center is not None:
        p = tuple(center) + ((0.5,) if dims == 2 else ())
        lo, hi = box.p1, box.p2
        return all(a <= x < b for a, x, b in zip(lo, p[:dims] + ((0.5,) if dims == 2 else ()), hi))
    return True  # conservative: treat as boundary

def _corners(box: BoxRegion, dims: int):
    lo, hi = box.p1[:dims], box.p2[:dims]
    out = []
    for m in range(1 << dims):
        out.append(tuple(hi[a] if (m >> a) & 1 else lo[a] for a in range(dims)))
    return out
