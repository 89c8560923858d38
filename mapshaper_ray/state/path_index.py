"""PathIndex — broadcastable point-in-polygon index over a polygon layer.

Port of the reference's PathIndex / PolygonIndex pair
(src/paths/mapshaper-path-index.js:8-165, src/paths/mapshaper-polygon-index.js)
re-designed for Ray: the index is built ONCE (driver side) from a small
polygon layer, packed into plain numpy arrays, published with ``ray.put``,
and probed inside ``map_batches`` actors (``__init__`` unpacks once per
actor; ``__call__`` probes per batch).  Instead of an rbush R-tree we use a
uniform grid over the layer bbox mapping cells -> candidate ring ids —
equivalent candidate pruning, simpler to pack/broadcast.

Semantics: a point on a ring boundary counts as inside
(src/paths/mapshaper-path-index.js:153-165 pointOnShape handling →
testPointInPolygon on-boundary = true); holes flip containment via the
even-odd rule (geom.testPointInPolygon, src/geom/mapshaper-shape-geom.js:68-82).
"""

from __future__ import annotations

import numpy as np

from ..geom.kernels import points_in_ring


class PathIndex:
    def __init__(self, ring_x, ring_y, ring_offsets, ring_feature, grid_dim=None):
        """ring_x/ring_y: flat coords of all rings (each ring closed);
        ring_offsets: int64 (n_rings+1,) offsets into the flat arrays;
        ring_feature: int64 ring -> feature id."""
        self.rx = np.asarray(ring_x, dtype=np.float64)
        self.ry = np.asarray(ring_y, dtype=np.float64)
        self.offsets = np.asarray(ring_offsets, dtype=np.int64)
        self.ring_feature = np.asarray(ring_feature, dtype=np.int64)
        n = len(self.ring_feature)
        # per-ring bboxes
        bb = np.empty((n, 4), dtype=np.float64)
        for i in range(n):
            s, e = self.offsets[i], self.offsets[i + 1]
            bb[i] = (self.rx[s:e].min(), self.ry[s:e].min(),
                     self.rx[s:e].max(), self.ry[s:e].max())
        self.bboxes = bb
        if n:
            self.xmin, self.ymin = bb[:, 0].min(), bb[:, 1].min()
            self.xmax, self.ymax = bb[:, 2].max(), bb[:, 3].max()
        else:
            self.xmin = self.ymin = 0.0
            self.xmax = self.ymax = 1.0
        if grid_dim is None:
            # ~2 rings per cell on average, like rbush node sizing
            grid_dim = max(1, int(np.sqrt(max(n, 1) / 2)))
        self.dim = grid_dim
        self._build_grid()

    @classmethod
    def from_features(cls, features):
        """features: per feature, list of closed (n,2) rings (or (x,y) pairs)."""
        xs, ys, offs, feat = [], [], [0], []
        total = 0
        for fid, rings in enumerate(features):
            if rings is None:
                continue
            for r in rings:
                if isinstance(r, tuple):
                    x, y = np.asarray(r[0], float), np.asarray(r[1], float)
                else:
                    r = np.asarray(r, dtype=np.float64)
                    x, y = r[:, 0], r[:, 1]
                xs.append(x)
                ys.append(y)
                total += len(x)
                offs.append(total)
                feat.append(fid)
        if not xs:
            return cls(np.empty(0), np.empty(0), np.array([0]), np.empty(0, dtype=np.int64))
        return cls(np.concatenate(xs), np.concatenate(ys),
                   np.array(offs, dtype=np.int64), np.array(feat, dtype=np.int64))

    def _build_grid(self):
        d = self.dim
        w = (self.xmax - self.xmin) or 1.0
        h = (self.ymax - self.ymin) or 1.0
        self._sx = d / w
        self._sy = d / h
        cells = [[] for _ in range(d * d)]
        for i, (x0, y0, x1, y1) in enumerate(self.bboxes):
            c0 = min(max(int((x0 - self.xmin) * self._sx), 0), d - 1)
            c1 = min(max(int((x1 - self.xmin) * self._sx), 0), d - 1)
            r0 = min(max(int((y0 - self.ymin) * self._sy), 0), d - 1)
            r1 = min(max(int((y1 - self.ymin) * self._sy), 0), d - 1)
            for r in range(r0, r1 + 1):
                for c in range(c0, c1 + 1):
                    cells[r * d + c].append(i)
        # pack: CSR layout (broadcast-friendly plain arrays)
        counts = np.array([len(c) for c in cells], dtype=np.int64)
        self.cell_offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        self.cell_rings = (np.concatenate([np.array(c, dtype=np.int64) for c in cells])
                           if counts.sum() else np.empty(0, dtype=np.int64))

    # -- broadcast pack/unpack -------------------------------------------
    def pack(self) -> dict:
        return {
            "rx": self.rx, "ry": self.ry, "offsets": self.offsets,
            "ring_feature": self.ring_feature, "dim": self.dim,
        }

    @classmethod
    def unpack(cls, d: dict) -> "PathIndex":
        return cls(d["rx"], d["ry"], d["offsets"], d["ring_feature"], d["dim"])

    # -- probes -----------------------------------------------------------
    def _candidate_rings(self, px, py):
        """For each point, the grid cell id; returns (cell_ids, order) where
        order groups points by cell for batched ring testing."""
        d = self.dim
        cx = np.clip(((px - self.xmin) * self._sx).astype(np.int64), 0, d - 1)
        cy = np.clip(((py - self.ymin) * self._sy).astype(np.int64), 0, d - 1)
        return cy * d + cx

    def _candidate_pairs(self, px, py):
        """(point_idx, ring_idx) pairs whose ring bbox contains the
        point — the pluggable candidate step (the STRtree variant in
        state/strtree.py overrides just this)."""
        cells = self._candidate_rings(px, py)
        # gather (point, ring) candidate pairs via CSR expansion
        starts = self.cell_offsets[cells]
        ends = self.cell_offsets[cells + 1]
        reps = (ends - starts).astype(np.int64)
        empty = np.empty(0, dtype=np.int64)
        if reps.sum() == 0:
            return empty, empty
        pt_rep = np.repeat(np.arange(len(px)), reps)
        ring_idx = _csr_gather(self.cell_rings, starts, reps)
        # bbox filter per candidate pair
        bx = self.bboxes[ring_idx]
        pxx = px[pt_rep]
        pyy = py[pt_rep]
        ok = ((pxx >= bx[:, 0]) & (pxx <= bx[:, 2]) &
              (pyy >= bx[:, 1]) & (pyy <= bx[:, 3]))
        return pt_rep[ok], ring_idx[ok]

    def find_enclosing_feature(self, px, py, chunk=16384):
        """Vectorized point -> enclosing feature id (first match by lowest
        feature id; -1 if none).  Boundary counts as inside.
        Equivalent of PathIndex.findEnclosingShapes probing
        (src/paths/mapshaper-path-index.js:38-47).

        Internally chunked: the per-feature parity accumulators are sized
        by the point count, so one huge call would allocate
        O(n_features * n_points) — chunking keeps it O(n_features * chunk)."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        if len(px) > chunk:
            return np.concatenate([
                self.find_enclosing_feature(px[i:i + chunk], py[i:i + chunk])
                for i in range(0, len(px), chunk)])
        n = len(px)
        result = np.full(n, -1, dtype=np.int64)
        if len(self.ring_feature) == 0 or n == 0:
            return result
        inb = ((px >= self.xmin) & (px <= self.xmax) &
               (py >= self.ymin) & (py <= self.ymax))
        idx = np.nonzero(inb)[0]
        if len(idx) == 0:
            return result
        pt_rep, ring_idx = self._candidate_pairs(px[idx], py[idx])
        if len(ring_idx) == 0:
            return result
        # group candidate pairs by ring; vectorized in-ring test per ring
        order = np.argsort(ring_idx, kind="stable")
        ring_sorted = ring_idx[order]
        pt_sorted = pt_rep[order]
        uniq, group_starts = np.unique(ring_sorted, return_index=True)
        group_ends = np.append(group_starts[1:], len(ring_sorted))
        # even-odd accumulation per (point, feature)
        feat_ids = np.unique(self.ring_feature)
        # parity accumulator keyed by (point, feature) via dict of arrays
        flips = {}
        ons = {}
        for g, ring in enumerate(uniq):
            pts_g = pt_sorted[group_starts[g]:group_ends[g]]
            s, e = self.offsets[ring], self.offsets[ring + 1]
            res = points_in_ring(px[idx][pts_g], py[idx][pts_g],
                                 self.rx[s:e], self.ry[s:e])
            f = self.ring_feature[ring]
            if f not in flips:
                flips[f] = np.zeros(len(idx), dtype=np.int64)
                ons[f] = np.zeros(len(idx), dtype=bool)
            np.add.at(flips[f], pts_g, (res == 1).astype(np.int64))
            on_mask = res == -1
            if on_mask.any():
                ons[f][pts_g[on_mask]] = True
        best = np.full(len(idx), -1, dtype=np.int64)
        for f in sorted(flips, reverse=True):  # lowest feature id wins last
            inside = ((flips[f] & 1) == 1) | ons[f]
            best = np.where(inside, f, best)
        result[idx] = best
        return result


def _csr_gather(values, starts, lengths):
    """values[starts[i] : starts[i]+lengths[i]] concatenated, vectorized."""
    total = int(lengths.sum())
    out_idx = np.repeat(starts + lengths, lengths)
    cum = np.arange(total)
    # offset within each run
    run_ends = np.cumsum(lengths)
    run_starts_in_out = run_ends - lengths
    within = cum - np.repeat(run_starts_in_out, lengths)
    src = np.repeat(starts, lengths) + within
    return values[src]
