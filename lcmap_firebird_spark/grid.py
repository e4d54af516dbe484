"""Grid geometry — the reference's spatial addressing core.

Re-implements the tile/chip grid math of ccdc/grid.py (which fetches
grid definitions from the Chipmunk HTTP service at runtime,
grid.py:17-20, and computes tile extents + chip inventories,
grid.py:23-53, and 3×3 training neighborhoods, grid.py:69-89) as
pure local functions over an explicit GridSpec — no HTTP, no
driver-side service dependency.

Constants default to the LCMAP CONUS Albers grid recorded in the
reference's fixtures (test/data/grid_response.json,
test/data/snap_response.json; see FIXTURES.md §9): origin
(2565585, 3314805) is the tile/chip upper-left anchor, tiles are
150 000 m, chips 3 000 m, x increases east (rx=+1), y decreases
south (ry=−1). One tile = 50×50 chips = 2500 chips
(BASELINE.md work unit).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class GridSpec:
    ox: int = -2565585  # origin x (upper-left)
    oy: int = 3314805  # origin y (upper-left)
    tile_cell: int = 150_000
    chip_cell: int = 3_000
    rx: int = 1
    ry: int = -1

    @property
    def chips_per_tile_side(self) -> int:
        return self.tile_cell // self.chip_cell  # 50


CONUS = GridSpec()


def snap(x: float, y: float, cell: int, grid: GridSpec = CONUS) -> tuple[int, int, int, int]:
    """Snap a point to its grid cell: returns (h, v, ulx, uly) —
    horizontal/vertical cell indices and the cell's upper-left corner
    (reference: snap_fn lookups, ccdc/grid.py:33-36)."""
    import math

    h = math.floor((x - grid.ox) / (cell * grid.rx))
    v = math.floor((y - grid.oy) / (cell * grid.ry))
    ulx = grid.ox + h * cell * grid.rx
    uly = grid.oy + v * cell * grid.ry
    return h, v, ulx, uly


def tile(x: float, y: float, grid: GridSpec = CONUS) -> dict:
    """Tile containing (x, y): extents + full chip inventory
    (reference: ccdc/grid.py:23-53 returns
    {x,y,h,v,ulx,uly,lrx,lry,chips})."""
    h, v, ulx, uly = snap(x, y, grid.tile_cell, grid)
    return {
        "x": x,
        "y": y,
        "h": h,
        "v": v,
        "ulx": ulx,
        "uly": uly,
        "lrx": ulx + grid.tile_cell * grid.rx,
        "lry": uly + grid.tile_cell * grid.ry,
        "chips": chips(ulx, uly, grid),
    }


def chips(ulx: int, uly: int, grid: GridSpec = CONUS) -> list[tuple[int, int]]:
    """All chip upper-left coords of the tile anchored at (ulx, uly)
    (reference: ccdc/grid.py:56-66, 50×50 = 2500 ids)."""
    n = grid.chips_per_tile_side
    return [
        (ulx + i * grid.chip_cell * grid.rx, uly + j * grid.chip_cell * grid.ry)
        for j in range(n)
        for i in range(n)
    ]


def near(x: float, y: float, grid: GridSpec = CONUS) -> list[dict]:
    """The 3×3 tile neighborhood around (x, y) (reference training
    area: ccdc/grid.py:69-80; test/test_grid.py:18-20 expects 9
    tiles)."""
    h, v, ulx, uly = snap(x, y, grid.tile_cell, grid)
    out = []
    for dv in (-1, 0, 1):
        for dh in (-1, 0, 1):
            tx = ulx + dh * grid.tile_cell * grid.rx
            ty = uly + dv * grid.tile_cell * grid.ry
            out.append(tile(tx, ty, grid))
    return out


def training_chips(x: float, y: float, grid: GridSpec = CONUS) -> list[tuple[int, int]]:
    """Chip ids of the full 3×3 training neighborhood (reference:
    ccdc/grid.py:83-89 — 9 tiles × 2500 = 22 500 chips)."""
    out: list[tuple[int, int]] = []
    for t in near(x, y, grid):
        out.extend(t["chips"])
    return out
