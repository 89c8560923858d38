"""ArcTable — columnar arc store, the Arrow equivalent of the reference's
ArcCollection (src/paths/mapshaper-arcs.js:11-111: xx/yy flat coord arrays,
nn per-arc counts, ii offsets, zz thresholds, bb per-arc bboxes).

The Arrow list-array offset encoding IS the reference's (nn, ii) pair, so
``to_arrow``/``from_arrow`` are zero-copy over the flat buffers.
Signed arc ids in shapes use the same convention as the reference
(src/topology/mapshaper-topology.js:40-41): ``~id`` (i.e. ``-id - 1``)
means arc ``id`` traversed in reverse.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import kernels


def rev_id(arc_id: int) -> int:
    """Signed-id reversal: ~id, identical to the reference convention."""
    return ~arc_id


def abs_id(arc_id: int) -> int:
    return ~arc_id if arc_id < 0 else arc_id


class ArcTable:
    __slots__ = ("xx", "yy", "nn", "ii", "zz")

    def __init__(self, xx, yy, nn, zz=None):
        self.xx = np.asarray(xx, dtype=np.float64)
        self.yy = np.asarray(yy, dtype=np.float64)
        self.nn = np.asarray(nn, dtype=np.int64)
        self.ii = np.concatenate([[0], np.cumsum(self.nn)[:-1]]).astype(np.int64)
        self.zz = None if zz is None else np.asarray(zz, dtype=np.float64)

    @classmethod
    def from_coord_lists(cls, arcs):
        """arcs: iterable of (n,2) arrays or (x_array, y_array) pairs."""
        xs, ys, nn = [], [], []
        for a in arcs:
            if isinstance(a, tuple):
                x, y = a
            else:
                a = np.asarray(a, dtype=np.float64)
                x, y = a[:, 0], a[:, 1]
            xs.append(np.asarray(x, dtype=np.float64))
            ys.append(np.asarray(y, dtype=np.float64))
            nn.append(len(x))
        if not xs:
            return cls(np.empty(0), np.empty(0), np.empty(0, dtype=np.int64))
        return cls(np.concatenate(xs), np.concatenate(ys), np.array(nn))

    def __len__(self):
        return len(self.nn)

    def arc(self, i):
        """(x, y) views of arc i (no copy)."""
        s = self.ii[i]
        e = s + self.nn[i]
        return self.xx[s:e], self.yy[s:e]

    def arc_z(self, i):
        s = self.ii[i]
        return self.zz[s:s + self.nn[i]]

    def arc_coords(self, signed_id, zlimit=0.0):
        """Coords of a signed arc id, honoring direction and an optional
        simplification interval (FilteredArcIter semantics,
        src/paths/mapshaper-arcs.js:423-431)."""
        i = abs_id(signed_id)
        x, y = self.arc(i)
        if zlimit and self.zz is not None:
            keep = self.arc_z(i) >= zlimit
            x, y = x[keep], y[keep]
        if signed_id < 0:
            x, y = x[::-1], y[::-1]
        return x, y

    def endpoints(self, i):
        """((x0,y0), (xn,yn)) of arc i."""
        s = self.ii[i]
        e = s + self.nn[i] - 1
        return (self.xx[s], self.yy[s]), (self.xx[e], self.yy[e])

    def bounds(self):
        """Per-arc bboxes (n,4) like _bb (src/paths/mapshaper-arcs.js:87-111)."""
        n = len(self)
        bb = np.empty((n, 4), dtype=np.float64)
        for i in range(n):
            x, y = self.arc(i)
            bb[i] = (x.min(), y.min(), x.max(), y.max())
        return bb

    def path_coords(self, signed_ids, zlimit=0.0):
        """Concatenate arcs of one path into a ring/line coordinate pair.
        Joins at shared endpoints (dedups the duplicated junction vertex)."""
        xs, ys = [], []
        for k, sid in enumerate(signed_ids):
            x, y = self.arc_coords(sid, zlimit)
            if k > 0:
                x, y = x[1:], y[1:]
            xs.append(x)
            ys.append(y)
        return np.concatenate(xs), np.concatenate(ys)

    # -- Arrow interop ----------------------------------------------------
    def to_arrow(self) -> pa.Table:
        offsets = np.concatenate([self.ii, [len(self.xx)]]).astype(np.int64)
        off = pa.array(offsets, type=pa.int64())
        cols = {
            "arc_id": pa.array(np.arange(len(self), dtype=np.int64)),
            "x": pa.LargeListArray.from_arrays(off, pa.array(self.xx, type=pa.float64())),
            "y": pa.LargeListArray.from_arrays(off, pa.array(self.yy, type=pa.float64())),
        }
        if self.zz is not None:
            cols["z"] = pa.LargeListArray.from_arrays(off, pa.array(self.zz, type=pa.float64()))
        return pa.table(cols)

    @classmethod
    def from_arrow(cls, table: pa.Table):
        xcol = table["x"].combine_chunks()
        ycol = table["y"].combine_chunks()
        xx = np.asarray(xcol.values)
        yy = np.asarray(ycol.values)
        offs = np.asarray(xcol.offsets)
        nn = np.diff(offs)
        zz = None
        if "z" in table.column_names:
            zz = np.asarray(table["z"].combine_chunks().values)
        return cls(xx, yy, nn, zz)
