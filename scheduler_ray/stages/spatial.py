"""Spatial operators: bbox containment join + Hilbert spatial sort key.

The reference's flagship join associates each feature's geometry with its
mainstem by spatial lookup against the hydrofabric (SURVEY.md J1;
reference release_graph_generator.py:41-83), and its GeoParquet export
Hilbert-sorts rows for locality (SURVEY.md O2; reference
export.py:147-152).  Both are reimplemented Ray-Data-first:

* **bbox join**: the (small) bbox table is grid-bucketed once on the
  driver and broadcast; each batch of points probes only its grid cells —
  a broadcast spatial join, no shuffle.
* **Hilbert key**: pure-numpy d2xy Hilbert-curve index at a configurable
  order, usable as a sort key for locality-preserving output.
"""

from __future__ import annotations

from collections import defaultdict


import numpy as np
import pandas as pd

import ray
from ray.data import Dataset


def _ragged_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), … concatenated — one vectorized expression (a
    per-count ``np.arange`` list comp was a measured hot spot)."""
    counts = np.asarray(counts, np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.array([], np.int64)
    starts = np.zeros(len(counts), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def narrow_i32(arr: np.ndarray, what: str) -> np.ndarray:
    """Bounds-checked int64 → int32 narrowing for CSR offsets/counts.

    Past 2^31 postings/vertices a bare ``astype(np.int32)`` WRAPS silently
    and corrupts candidate generation at exactly the scale this engine
    targets (round-4 advice) — fail loudly instead; the fix at that scale
    is sharding the broadcast-side index, not a wider dtype."""
    if arr.size and int(arr.max()) > np.iinfo(np.int32).max:
        raise OverflowError(
            f"{what}: max value {int(arr.max())} exceeds int32; shard this "
            "index before narrowing (silent wraparound otherwise)"
        )
    return arr.astype(np.int32)


def _pad_f32_down(a: np.ndarray) -> np.ndarray:
    """float64 → float32 rounded TOWARD -inf (never above the original)."""
    a32 = a.astype(np.float32)
    bump = a32.astype(np.float64) > a
    a32[bump] = np.nextafter(a32[bump], np.float32(-np.inf))
    return a32


def _pad_f32_up(a: np.ndarray) -> np.ndarray:
    """float64 → float32 rounded TOWARD +inf (never below the original)."""
    a32 = a.astype(np.float32)
    bump = a32.astype(np.float64) < a
    a32[bump] = np.nextafter(a32[bump], np.float32(np.inf))
    return a32


class GridBBoxIndex:
    """Uniform-grid index over bboxes (broadcast small side of J1).

    Cell size = the p95 bbox diagonal (so most boxes span few cells).

    ``coarse=True`` stores the bbox arrays as OUTWARD-padded float32
    (half the broadcast bytes): candidate sets become a superset of the
    exact-f64 ones, so it is only valid when an exact verify follows
    (polygon ray-cast / polyline distance) — the standalone bbox join
    keeps the exact f64 default.  ``store_ids=False`` skips the id
    array when the caller resolves rows itself (embedded use).
    """

    def __init__(
        self,
        boxes: pd.DataFrame,
        id_col: str = "id",
        cell: float | None = None,
        *,
        coarse: bool = False,
        store_ids: bool = True,
    ):
        self.ids = boxes[id_col].to_numpy() if store_ids else None
        n_boxes = len(boxes)
        xmin = boxes["bbox_xmin"].to_numpy(np.float64)
        ymin = boxes["bbox_ymin"].to_numpy(np.float64)
        xmax = boxes["bbox_xmax"].to_numpy(np.float64)
        ymax = boxes["bbox_ymax"].to_numpy(np.float64)
        if cell is None:
            diag = np.maximum(xmax - xmin, ymax - ymin)
            cell = max(float(np.percentile(diag, 95)) if len(diag) else 1.0, 1e-9) * 4
        self.cell = cell
        grid: dict[tuple[int, int], list[int]] = defaultdict(list)
        for i in range(n_boxes):
            for cx in range(int(xmin[i] // cell), int(xmax[i] // cell) + 1):
                for cy in range(int(ymin[i] // cell), int(ymax[i] // cell) + 1):
                    grid[(cx, cy)].append(i)
        if coarse:
            self.xmin, self.ymin = _pad_f32_down(xmin), _pad_f32_down(ymin)
            self.xmax, self.ymax = _pad_f32_up(xmax), _pad_f32_up(ymax)
        else:
            self.xmin, self.ymin, self.xmax, self.ymax = xmin, ymin, xmax, ymax
        # CSR form for vectorized probes: sorted cell keys + offsets +
        # flat box-row postings (round-1 verdict item 7; int32 postings —
        # box rows stay well under 2^31)
        keys = np.array([(cx << 32) ^ (cy & 0xFFFFFFFF) for cx, cy in grid], np.int64)
        order = np.argsort(keys)
        self.cell_keys = keys[order]
        counts = np.array([len(v) for v in grid.values()], np.int64)[order]
        self.cell_offsets = np.zeros(len(keys) + 1, np.int64)
        np.cumsum(counts, out=self.cell_offsets[1:])
        self.cell_offsets = narrow_i32(self.cell_offsets, "GridBBoxIndex.cell_offsets")
        vals = list(grid.values())
        self.cell_boxes = (
            np.concatenate([np.array(vals[i], np.int32) for i in order])
            if len(order)
            else np.array([], np.int32)
        )

    def query_pairs(self, xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized probe: (point_row, box_row) index pairs for every
        point-in-bbox containment (inclusive edges)."""
        if not len(self.cell_keys) or not len(xs):
            return np.array([], np.int64), np.array([], np.int64)
        cx = np.floor(xs / self.cell).astype(np.int64)
        cy = np.floor(ys / self.cell).astype(np.int64)
        key = (cx << 32) ^ (cy & 0xFFFFFFFF)
        pos = np.searchsorted(self.cell_keys, key)
        pos_c = np.clip(pos, 0, len(self.cell_keys) - 1)
        hit = self.cell_keys[pos_c] == key
        pts = np.flatnonzero(hit)
        cell = pos_c[pts]
        starts, ends = self.cell_offsets[cell], self.cell_offsets[cell + 1]
        counts = ends - starts
        reps = np.repeat(np.arange(len(counts)), counts)
        cand_boxes = self.cell_boxes[starts[reps] + _ragged_arange(counts)]
        cand_pts = pts[reps]
        ok = (
            (self.xmin[cand_boxes] <= xs[cand_pts])
            & (xs[cand_pts] <= self.xmax[cand_boxes])
            & (self.ymin[cand_boxes] <= ys[cand_pts])
            & (ys[cand_pts] <= self.ymax[cand_boxes])
        )
        return cand_pts[ok], cand_boxes[ok]

    def query_points(self, xs: np.ndarray, ys: np.ndarray) -> list[list[int]]:
        """Row indices of boxes containing each point (list-per-point
        convenience wrapper over :meth:`query_pairs`)."""
        rows, boxes = self.query_pairs(np.asarray(xs, np.float64), np.asarray(ys, np.float64))
        out: list[list[int]] = [[] for _ in range(len(xs))]
        for r, b in zip(rows.tolist(), boxes.tolist()):
            out[r].append(b)
        return out


# --------------------------------------------------- real geometry (J1)
def wkb_polygon(ring_xy: np.ndarray) -> bytes:
    """Little-endian single-ring WKB Polygon from an (n, 2) CLOSED ring."""
    import struct

    n = len(ring_xy)
    head = b"\x01" + struct.pack("<II", 3, 1) + struct.pack("<I", n)
    return head + np.asarray(ring_xy, "<f8").tobytes()


def wkb_polygons(vx: np.ndarray, vy: np.ndarray) -> np.ndarray:
    """Vectorized WKB Polygon encoding for n uniform rings.

    ``vx``/``vy`` are (n, k) vertex arrays (closed rings: first == last).
    Returns an object array of ``bytes`` — one 1+4+4+4+16k-byte WKB
    polygon per row, assembled with numpy views (no per-row struct loop).
    """
    n, k = vx.shape
    size = 13 + 16 * k
    buf = np.zeros((n, size), np.uint8)
    buf[:, 0] = 1  # little endian
    buf[:, 1:5] = np.frombuffer(np.uint32(3).tobytes(), np.uint8)  # Polygon
    buf[:, 5:9] = np.frombuffer(np.uint32(1).tobytes(), np.uint8)  # 1 ring
    buf[:, 9:13] = np.frombuffer(np.uint32(k).tobytes(), np.uint8)
    coords = buf[:, 13:].view("<f8").reshape(n, k, 2)
    coords[:, :, 0] = vx
    coords[:, :, 1] = vy
    return np.array([row.tobytes() for row in buf], object)


def wkb_polylines(vx: np.ndarray, vy: np.ndarray) -> np.ndarray:
    """Vectorized WKB LineString encoding for n uniform polylines.

    ``vx``/``vy`` are (n, k) vertex arrays.  Returns an object array of
    ``bytes`` — one 1+4+4+16k-byte WKB LineString per row (no per-row
    struct loop), the flowline analogue of :func:`wkb_polygons`.
    """
    n, k = vx.shape
    size = 9 + 16 * k
    buf = np.zeros((n, size), np.uint8)
    buf[:, 0] = 1  # little endian
    buf[:, 1:5] = np.frombuffer(np.uint32(2).tobytes(), np.uint8)  # LineString
    buf[:, 5:9] = np.frombuffer(np.uint32(k).tobytes(), np.uint8)
    coords = buf[:, 9:].view("<f8").reshape(n, k, 2)
    coords[:, :, 0] = vx
    coords[:, :, 1] = vy
    return np.array([row.tobytes() for row in buf], object)


class PolylineStore:
    """CSR vertex store parsed from WKB LineStrings with a vectorized
    point-to-segment nearest-distance kernel over candidate pairs.

    The broadcast-side numpy equivalent of the reference's FlatGeobuf
    flowline layer (nearest-flowline association, reference
    userCode/defs_test.py:75-80,120-127): parse once on the driver,
    score grid-pruned (point, line) candidate pairs in bulk — unlike
    :func:`nearest_polyline`, never all points × all segments.
    """

    def __init__(self, wkbs):
        import struct

        vxs, vys = [], []
        for w in wkbs:
            if w is None:
                vxs.append(np.array([], np.float64))
                vys.append(np.array([], np.float64))
                continue
            if w[0] != 1 or struct.unpack_from("<I", w, 1)[0] != 2:
                raise ValueError("expected little-endian WKB LineString")
            npts = struct.unpack_from("<I", w, 5)[0]
            pts = np.frombuffer(w, "<f8", npts * 2, 9).reshape(npts, 2)
            vxs.append(pts[:, 0].astype(np.float64))
            vys.append(pts[:, 1].astype(np.float64))
        counts = np.array([len(v) for v in vxs], np.int64)
        offsets = np.zeros(len(counts) + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        # int32 CSR: vertex totals stay far under 2^31 on broadcast sides
        self.offsets = narrow_i32(offsets, "PolylineStore.offsets")
        self.vx = np.concatenate(vxs) if len(vxs) else np.array([], np.float64)
        self.vy = np.concatenate(vys) if len(vys) else np.array([], np.float64)
        self.counts = narrow_i32(counts, "PolylineStore.counts")
        self.max_nv = int(counts.max()) if len(counts) else 0

    def bboxes(self) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        n = len(self.counts)
        xmin = np.full(n, np.inf)
        xmax = np.full(n, -np.inf)
        ymin = np.full(n, np.inf)
        ymax = np.full(n, -np.inf)
        if (self.counts > 0).any():
            idx = np.repeat(np.arange(n), self.counts)
            np.minimum.at(xmin, idx, self.vx)
            np.maximum.at(xmax, idx, self.vx)
            np.minimum.at(ymin, idx, self.vy)
            np.maximum.at(ymax, idx, self.vy)
        return xmin, ymin, xmax, ymax

    def distance_pairs(
        self, xs: np.ndarray, ys: np.ndarray, pt: np.ndarray, line: np.ndarray
    ) -> np.ndarray:
        """Min point-to-segment distance per candidate (pt, line) pair —
        vectorized across pairs, looping only over the (small, constant)
        max vertex count (same shape as PolygonStore.contains_pairs)."""
        m = len(pt)
        if m == 0:
            return np.zeros(0, np.float64)
        px, py = xs[pt], ys[pt]
        off = self.offsets[line]
        nv = self.counts[line]
        best = np.full(m, np.inf)
        for k in range(max(self.max_nv - 1, 0)):
            act = k + 1 < nv
            i1 = np.where(act, off + k, 0)
            i2 = np.where(act, off + k + 1, 0)
            x1, y1 = self.vx[i1], self.vy[i1]
            dx, dy = self.vx[i2] - x1, self.vy[i2] - y1
            len2 = dx * dx + dy * dy
            t = np.clip(
                ((px - x1) * dx + (py - y1) * dy) / np.maximum(len2, 1e-300), 0.0, 1.0
            )
            ex, ey = px - (x1 + t * dx), py - (y1 + t * dy)
            d2 = ex * ex + ey * ey
            best = np.where(act, np.minimum(best, d2), best)
        return np.sqrt(best)


class GridPolylineIndex:
    """Broadcast nearest-flowline index: uniform grid over PADDED line
    bboxes (candidate pruning — ``pad`` is the search radius) + exact
    point-to-segment distances on the candidates only."""

    def __init__(self, ids, wkbs, pad: float = 0.005, cell: float | None = None):
        self.ids = np.asarray(ids)
        self.store = PolylineStore(wkbs)
        xmin, ymin, xmax, ymax = self.store.bboxes()
        boxes = pd.DataFrame(
            {
                "id": self.ids,
                "bbox_xmin": xmin - pad,
                "bbox_ymin": ymin - pad,
                "bbox_xmax": xmax + pad,
                "bbox_ymax": ymax + pad,
            }
        )
        # coarse (outward-padded f32) grid: the pad is already a search
        # heuristic and exact distances score the candidates; ids resolve
        # through self.ids
        self.grid = GridBBoxIndex(
            boxes, id_col="id", cell=cell, coarse=True, store_ids=False
        )

    def nearest(self, xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Per point: (line_row, distance) of the nearest candidate line,
        or (-1, inf) when no line's padded bbox covers the point.
        Deterministic tie-break: smallest line row wins."""
        n = len(xs)
        best_line = np.full(n, -1, np.int64)
        best_dist = np.full(n, np.inf)
        pts, lines = self.grid.query_pairs(
            np.asarray(xs, np.float64), np.asarray(ys, np.float64)
        )
        if not len(pts):
            return best_line, best_dist
        dist = self.store.distance_pairs(
            np.asarray(xs, np.float64), np.asarray(ys, np.float64), pts, lines
        )
        # per-point argmin: distance asc, then line row asc (stable)
        order = np.lexsort((lines, dist, pts))
        p_s, l_s, d_s = pts[order], lines[order], dist[order]
        first = np.ones(len(p_s), bool)
        first[1:] = p_s[1:] != p_s[:-1]
        best_line[p_s[first]] = l_s[first]
        best_dist[p_s[first]] = d_s[first]
        return best_line, best_dist


class PolygonStore:
    """CSR vertex store parsed from WKB polygons (exterior ring only) with
    a vectorized ray-casting containment kernel.

    The reference joins features against FlatGeobuf flowline/catchment
    *geometries* (reference userCode/assetGroups/config.py:34-82,
    defs_test.py:75-80,120-127); this store is the broadcast-side numpy
    equivalent: parse once on the driver, test candidate pairs in bulk.
    """

    def __init__(self, wkbs):
        import struct

        vxs, vys = [], []
        for w in wkbs:
            if w is None:
                vxs.append(np.array([], np.float64))
                vys.append(np.array([], np.float64))
                continue
            if w[0] != 1 or struct.unpack_from("<I", w, 1)[0] != 3:
                raise ValueError("expected little-endian WKB Polygon")
            npts = struct.unpack_from("<I", w, 9)[0]
            pts = np.frombuffer(w, "<f8", npts * 2, 13).reshape(npts, 2)
            # drop the closing vertex (ray casting closes implicitly)
            vxs.append(pts[:-1, 0].astype(np.float64))
            vys.append(pts[:-1, 1].astype(np.float64))
        counts = np.array([len(v) for v in vxs], np.int64)
        offsets = np.zeros(len(counts) + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        # int32 CSR: vertex totals stay far under 2^31 on broadcast sides
        self.offsets = narrow_i32(offsets, "PolygonStore.offsets")
        self.vx = np.concatenate(vxs) if len(vxs) else np.array([], np.float64)
        self.vy = np.concatenate(vys) if len(vys) else np.array([], np.float64)
        self.counts = narrow_i32(counts, "PolygonStore.counts")
        self.max_nv = int(counts.max()) if len(counts) else 0

    def bboxes(self) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Per-polygon bounding boxes (for the candidate grid)."""
        n = len(self.counts)
        xmin = np.full(n, np.inf)
        xmax = np.full(n, -np.inf)
        ymin = np.full(n, np.inf)
        ymax = np.full(n, -np.inf)
        nz = self.counts > 0
        if nz.any():
            idx = np.repeat(np.arange(n), self.counts)
            np.minimum.at(xmin, idx, self.vx)
            np.maximum.at(xmax, idx, self.vx)
            np.minimum.at(ymin, idx, self.vy)
            np.maximum.at(ymax, idx, self.vy)
        return xmin, ymin, xmax, ymax

    def contains_pairs(
        self, xs: np.ndarray, ys: np.ndarray, pt: np.ndarray, poly: np.ndarray
    ) -> np.ndarray:
        """Ray-casting point-in-polygon over candidate (pt, poly) pairs —
        vectorized across pairs, looping only over the (small, constant)
        max vertex count."""
        m = len(pt)
        if m == 0:
            return np.zeros(0, bool)
        px, py = xs[pt], ys[pt]
        off = self.offsets[poly]
        nv = self.counts[poly]
        inside = np.zeros(m, bool)
        for k in range(self.max_nv):
            act = k < nv
            i1 = off + k
            i2 = off + np.where(k + 1 < nv, k + 1, 0)
            x1 = self.vx[np.where(act, i1, 0)]
            y1 = self.vy[np.where(act, i1, 0)]
            x2 = self.vx[np.where(act, i2, 0)]
            y2 = self.vy[np.where(act, i2, 0)]
            cross = act & ((y1 > py) != (y2 > py))
            with np.errstate(divide="ignore", invalid="ignore"):
                x_int = x1 + (x2 - x1) * (py - y1) / (y2 - y1)
            inside ^= cross & (px < x_int)
        return inside


class GridPolygonIndex:
    """Broadcast polygon-containment index: uniform grid over the ring
    bboxes (candidate pruning) + exact ray-casting verify."""

    def __init__(self, ids, wkbs, cell: float | None = None):
        self.ids = np.asarray(ids)
        self.store = PolygonStore(wkbs)
        xmin, ymin, xmax, ymax = self.store.bboxes()
        boxes = pd.DataFrame(
            {
                "id": self.ids,
                "bbox_xmin": xmin,
                "bbox_ymin": ymin,
                "bbox_xmax": xmax,
                "bbox_ymax": ymax,
            }
        )
        # coarse (outward-padded f32) grid is safe here: candidates are a
        # superset and the exact ray-casting verify restores exactness
        self.grid = GridBBoxIndex(
            boxes, id_col="id", cell=cell, coarse=True, store_ids=False
        )

    def query_pairs(self, xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        pts, polys = self.grid.query_pairs(xs, ys)
        ok = self.store.contains_pairs(xs, ys, pts, polys)
        return pts[ok], polys[ok]


def polygon_contains_join(
    points: Dataset,
    polys: pd.DataFrame,
    *,
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "id",
    wkb_col: str = "ring_wkb",
) -> Dataset:
    """Inner join: each point row × every polygon containing it (grid
    candidates + exact ray casting; broadcast small side, no shuffle)."""
    idx_ref = ray.put(GridPolygonIndex(polys[id_col].to_numpy(), polys[wkb_col]))

    def probe(b: pd.DataFrame) -> pd.DataFrame:
        idx: GridPolygonIndex = ray.get(idx_ref)
        rows, hit = idx.query_pairs(
            b[x_col].to_numpy(np.float64), b[y_col].to_numpy(np.float64)
        )
        out = b.iloc[rows].reset_index(drop=True)
        out["poly_id"] = idx.ids[hit]
        return out

    return points.map_batches(probe, batch_format="pandas")


def nearest_polyline(
    xs: np.ndarray,
    ys: np.ndarray,
    lines: "list[np.ndarray]",
) -> tuple[np.ndarray, np.ndarray]:
    """Nearest polyline per point: vectorized point-to-segment distance
    over every (point, segment) pair — the numpy kernel for the
    reference's nearest-flowline association (reference
    defs_test.py:75-80,120-127).  ``lines`` is a list of (k_i, 2) vertex
    arrays.  Returns (line_index, distance) per point.  Intended for
    broadcast-side line sets (candidates pre-pruned by a grid at scale).
    """
    segs = []
    seg_line = []
    for li, ln in enumerate(lines):
        ln = np.asarray(ln, np.float64)
        for s in range(len(ln) - 1):
            segs.append((ln[s], ln[s + 1]))
            seg_line.append(li)
    if not segs:
        return np.full(len(xs), -1, np.int64), np.full(len(xs), np.inf)
    a = np.array([s[0] for s in segs])  # (S, 2)
    b = np.array([s[1] for s in segs])
    seg_line = np.array(seg_line, np.int64)
    p = np.stack([xs, ys], axis=1)  # (N, 2)
    d = b - a  # (S, 2)
    len2 = (d * d).sum(axis=1)  # (S,)
    # t = clamp(((p - a) · d) / |d|², 0, 1) for every (point, segment)
    ap = p[:, None, :] - a[None, :, :]  # (N, S, 2)
    t = np.clip((ap * d[None, :, :]).sum(axis=2) / np.maximum(len2, 1e-300), 0.0, 1.0)
    proj = a[None, :, :] + t[:, :, None] * d[None, :, :]
    dist2 = ((p[:, None, :] - proj) ** 2).sum(axis=2)  # (N, S)
    best_seg = dist2.argmin(axis=1)
    return seg_line[best_seg], np.sqrt(dist2[np.arange(len(xs)), best_seg])


def bbox_contains_join(
    points: Dataset,
    boxes: pd.DataFrame,
    *,
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "id",
) -> Dataset:
    """Inner join: each point row × every box containing it (broadcast)."""
    idx_ref = ray.put(GridBBoxIndex(boxes, id_col=id_col))

    def probe(b: pd.DataFrame) -> pd.DataFrame:
        idx: GridBBoxIndex = ray.get(idx_ref)
        rows, boxes = idx.query_pairs(
            b[x_col].to_numpy(np.float64), b[y_col].to_numpy(np.float64)
        )
        out = b.iloc[rows].reset_index(drop=True)
        out["box_id"] = idx.ids[boxes]
        return out

    return points.map_batches(probe, batch_format="pandas")


def hilbert_index(xs: np.ndarray, ys: np.ndarray, order: int = 16,
                  bounds: tuple[float, float, float, float] = (-180, -90, 180, 90)) -> np.ndarray:
    """Vectorized Hilbert-curve index (xy2d) at 2^order × 2^order
    resolution — the locality-preserving sort key the reference's
    GeoParquet export uses (`.sort_hilbert()`, reference export.py:147-152)."""
    x0, y0, x1, y1 = bounds
    n = 1 << order
    x = np.clip(((xs - x0) / (x1 - x0) * n).astype(np.int64), 0, n - 1)
    y = np.clip(((ys - y0) / (y1 - y0) * n).astype(np.int64), 0, n - 1)
    rx = np.zeros_like(x)
    ry = np.zeros_like(y)
    d = np.zeros_like(x)
    s = n // 2
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f, y_f = x.copy(), y.copy()
        x[flip], y[flip] = s - 1 - x_f[flip], s - 1 - y_f[flip]
        x_s = x.copy()
        x[swap], y[swap] = y[swap], x_s[swap]
        s //= 2
    return d


# ---------------------------------------------------------------------------
# CRS reprojection (M8 — the reference only DECLARES EPSG:4326 on export,
# reference userCode/assetGroups/export.py:358 `set_crs(epsg=4326,
# allow_override=True)`; a real transform is the engine-native upgrade).
# Spherical web mercator is closed-form, so the kernel is pure vectorized
# numpy — no GIS library needed and the math is oracle-expressible in SQL.

#: WGS84 / spherical-mercator earth radius (EPSG:3857 semi-major axis, m)
R_MERCATOR = 6378137.0


def web_mercator_forward(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 (degrees) → EPSG:3857 (meters).  Valid for |lat| < 90;
    the standard web-mercator tile domain is |lat| <= 85.051129 but the
    kernel does not clamp — callers own their domain."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    x = R_MERCATOR * np.radians(lon)
    y = R_MERCATOR * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def web_mercator_inverse(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:3857 (meters) → EPSG:4326 (degrees)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    lon = np.degrees(x / R_MERCATOR)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / R_MERCATOR)) - np.pi / 2.0)
    return lon, lat


#: (src, dst) → vectorized (a, b) -> (a', b') transform
_CRS_TRANSFORMS = {
    ("EPSG:4326", "EPSG:3857"): web_mercator_forward,
    ("EPSG:3857", "EPSG:4326"): web_mercator_inverse,
}


def reproject_stage(
    ds: Dataset,
    *,
    src: str = "EPSG:4326",
    dst: str = "EPSG:3857",
    x_col: str = "bbox_xmin",
    y_col: str = "bbox_ymin",
    out_x: str = "x",
    out_y: str = "y",
) -> Dataset:
    """Append reprojected coordinate columns — a streaming ``map_batches``
    over the closed-form kernel (zero shuffle, zero state).  Unknown CRS
    pairs raise up front (honest boundary: only the closed-form spherical
    pair ships; ellipsoidal datum shifts would need a proj database)."""
    if src == dst:
        raise ValueError(f"src == dst ({src})")
    fn = _CRS_TRANSFORMS.get((src, dst))
    if fn is None:
        raise NotImplementedError(
            f"no closed-form transform {src} -> {dst}; supported: "
            f"{sorted(_CRS_TRANSFORMS)}"
        )

    def batch(b: pd.DataFrame) -> pd.DataFrame:
        xs, ys = fn(b[x_col].to_numpy(np.float64), b[y_col].to_numpy(np.float64))
        return b.assign(**{out_x: xs, out_y: ys})

    return ds.map_batches(batch, batch_format="pandas")
