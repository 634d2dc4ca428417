"""Multi-resolution tile-pyramid aggregation over the qcell grid.

The map-tile rollup every tiled visualization / density service runs
(the z/x/y pyramid of slippy maps, H3 ``compact``-style multi-res
aggregates): counts and weight sums per cell at every resolution of a
band. Semantics follow the reference's geotile/GeoGrid splitting family
(gis-tools layer.py split/geotile + the north star's tile assignment)
lifted to hierarchical aggregation.

Scale plan — the pyramid trick: only the FINEST level aggregates the
corpus (one shuffle over the point scan, map-side combined). Every
coarser level aggregates the PREVIOUS level's cells with pure bit-math
parent keys (4 child rows → 1 parent row), so each step shrinks its
input ~4× and total work beyond the base is a geometric tail — against
the naive per-level corpus re-scan this is (levels×corpus) → (corpus +
~4/3·base_cells). All keys are the engine-wide qcell int64 layout
(res << 58 | ix << 29 | iy), pure codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import cells as C


def _parent_cell(cell, child_res: int):
    """Bit-math parent of a qcell column at child_res → child_res - 1."""
    ix = F.shiftright(cell, C.IX_SHIFT).bitwiseAND(
        F.lit((1 << (C.RES_SHIFT - C.IX_SHIFT)) - 1))
    iy = cell.bitwiseAND(F.lit((1 << C.IX_SHIFT) - 1))
    r = child_res - 1
    return (F.lit(r).cast("long") * F.lit(1 << C.RES_SHIFT)
            + F.shiftright(ix, 1) * F.lit(1 << C.IX_SHIFT)
            + F.shiftright(iy, 1))


def tile_pyramid(df: DataFrame, *, lon_col: str = "lon",
                 lat_col: str = "lat", res_min: int = C.RES_MIN,
                 res_max: int = C.RES_MAX,
                 weight_col: str | None = None) -> DataFrame:
    """Aggregate points into every resolution of ``[res_min, res_max]``.

    Returns ``(res, cell, n, wsum)`` — one row per non-empty cell per
    level; ``wsum`` is the sum of ``weight_col`` (equal to ``n`` when no
    weight column is given, keeping the schema stable). Parent levels
    aggregate child cells, never the corpus (see module docstring), and
    every level's totals are invariant: sum(n) per res == corpus rows.
    """
    w = (F.col(weight_col).cast("double") if weight_col
         else F.lit(1.0))
    base = (df.select(C.cell_column(F.col(lon_col), F.col(lat_col),
                                    res_max).alias("cell"),
                      w.alias("w"))
            .groupBy("cell")
            .agg(F.count("*").alias("n"), F.sum("w").alias("wsum")))
    levels = [base.select(F.lit(res_max).alias("res"), "cell", "n", "wsum")]
    cur = base
    for r in range(res_max, res_min, -1):
        cur = (cur.select(_parent_cell(F.col("cell"), r).alias("cell"),
                          "n", "wsum")
               .groupBy("cell")
               .agg(F.sum("n").alias("n"), F.sum("wsum").alias("wsum")))
        levels.append(cur.select(F.lit(r - 1).alias("res"), "cell",
                                 "n", "wsum"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
