"""PolygonIndex — per-polygon x-bucketed segment index for repeated
point-in-polygon tests on LARGE rings.

Port of the reference structure (src/paths/mapshaper-polygon-index.js:
6-128): segments sorted by xmin into ``ceil(segs^0.75 / 10)`` x-buckets
("trial and error" formula, :58-64); a probe ray-crosses only the
segments of its bucket, the previous bucket, and the overflow bucket
(segments spanning multiple buckets).  The build gate mirrors
src/paths/mapshaper-path-index.js:142-146: only worth building when the
ring's bbox area exceeds ~1% of the layer bbox (smaller rings are
cheaper to scan directly).

Broadcast shape: ``pack``/``unpack`` round-trip plain numpy arrays so
the index rides in the same ``ray.put`` payload as PathIndex.
"""

from __future__ import annotations

import numpy as np


class PolygonIndex:
    def __init__(self, x, y):
        """x, y: closed ring(s) concatenated as segment soup — here one
        ring; multi-ring shapes concatenate segments."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        ax, ay = x[:-1], y[:-1]
        bx, by = x[1:], y[1:]
        keep = ~((ax == bx) & (ay == by))
        self.ax, self.ay = ax[keep], ay[keep]
        self.bx, self.by = bx[keep], by[keep]
        n = len(self.ax)
        self.xmin_all = float(min(x.min(), 1e308))
        self.xmax_all = float(x.max())
        self.ymin_all = float(y.min())
        self.ymax_all = float(y.max())
        self.n_buckets = max(1, int(np.ceil(n ** 0.75 / 10)))
        w = (self.xmax_all - self.xmin_all) or 1.0
        self.bucket_width = w / self.n_buckets
        seg_xmin = np.minimum(self.ax, self.bx)
        seg_xmax = np.maximum(self.ax, self.bx)
        b_lo = np.clip(((seg_xmin - self.xmin_all) / self.bucket_width)
                       .astype(np.int64), 0, self.n_buckets - 1)
        b_hi = np.clip(((seg_xmax - self.xmin_all) / self.bucket_width)
                       .astype(np.int64), 0, self.n_buckets - 1)
        # segments within one bucket (or its right neighbor) go to their
        # bucket; wider spans go to the overflow bucket (reference
        # layout: probe checks bucket, bucket-1, overflow)
        ofl = b_hi - b_lo > 1
        self.order = np.concatenate([
            np.nonzero(~ofl)[0][np.argsort(b_lo[~ofl], kind="stable")],
            np.nonzero(ofl)[0]])
        in_b = b_lo[~ofl]
        counts = np.bincount(in_b, minlength=self.n_buckets)
        self.offsets = np.concatenate([[0], np.cumsum(counts)]).astype(
            np.int64)
        self.n_regular = int((~ofl).sum())

    # -- broadcast ---------------------------------------------------------
    def pack(self):
        return {k: getattr(self, k) for k in
                ("ax", "ay", "bx", "by", "order", "offsets", "n_regular",
                 "n_buckets", "bucket_width", "xmin_all", "xmax_all",
                 "ymin_all", "ymax_all")}

    @classmethod
    def unpack(cls, d):
        obj = cls.__new__(cls)
        for k, v in d.items():
            setattr(obj, k, v)
        return obj

    # -- probe -------------------------------------------------------------
    def _bucket_of(self, x):
        i = int((x - self.xmin_all) / self.bucket_width)
        return min(max(i, 0), self.n_buckets - 1)

    def _cross_count(self, x, y, seg_ids):
        ax = self.ax[seg_ids]
        ay = self.ay[seg_ids]
        bx = self.bx[seg_ids]
        by = self.by[seg_ids]
        # VERTICAL (upward) ray from (x, y): only segments whose x-span
        # contains the probe x can cross — which is exactly what the
        # x-bucketing localizes (a horizontal ray would need every
        # bucket to the right)
        spans = (ax > x) != (bx > x)
        if not spans.any():
            return 0
        ax, ay, bx, by = ax[spans], ay[spans], bx[spans], by[spans]
        t = (x - ax) / (bx - ax)
        iy = ay + t * (by - ay)
        # exact equality, matching points_in_ring / the reference's
        # getRayIntersection — a relative tolerance here flips
        # near-boundary probes to "inside" (rtol 1e-5 is huge at
        # projected-coordinate magnitudes)
        if np.any(iy == y):
            return -1  # on boundary
        return int(np.count_nonzero(iy > y))

    def point_in_polygon(self, x, y):
        """1 inside, 0 outside, -1 on boundary (reference signature)."""
        if not (self.xmin_all <= x <= self.xmax_all and
                self.ymin_all <= y <= self.ymax_all):
            return 0
        b = self._bucket_of(x)
        total = 0
        for bid in {b, max(b - 1, 0)}:
            s, e = self.offsets[bid], self.offsets[bid + 1]
            c = self._cross_count(x, y, self.order[s:e])
            if c < 0:
                return -1
            total += c
        c = self._cross_count(x, y, self.order[self.n_regular:])
        if c < 0:
            return -1
        total += c
        return 1 if total % 2 == 1 else 0


def should_index(ring_bbox_area: float, layer_bbox_area: float) -> bool:
    """Reference build gate: index only rings whose bbox exceeds ~1% of
    the layer bbox (src/paths/mapshaper-path-index.js:142-146)."""
    return layer_bbox_area > 0 and \
        ring_bbox_area / layer_bbox_area > 0.01
