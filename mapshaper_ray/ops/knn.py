"""Spatial nearest-neighbor operators.

Replaces the reference's linear-scan PointIndex
(src/points/mapshaper-point-index.js:4-25 — "TODO: use an actual
index") with a cell-bucketed grid index: source points hashed into
cells of side = search radius, probes check the 3×3 neighborhood (a
point within ``radius`` of the probe must fall there), ring-expanding
for k-NN beyond the radius.

Ray shapes:
- small source side → ``nearest_join``: build buckets once driver-side,
  broadcast packed arrays, probe inside task-pool ``map_batches``.
- large×large → shuffle BOTH sides by cell id (the §7.3 cell-prefix
  key), join per cell group with a halo: each source point is also
  emitted to its 8 neighbor cells, so every probe finds all candidates
  within ``radius`` inside its own group — one shuffle, no driver data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class GridPointIndex:
    """Packed cell-bucket index over (x, y) source points."""

    def __init__(self, xs, ys, ids, cell: float):
        self.xs = np.asarray(xs, dtype=np.float64)
        self.ys = np.asarray(ys, dtype=np.float64)
        self.ids = np.asarray(ids)
        self.cell = float(cell)
        cx = np.floor(self.xs / cell).astype(np.int64)
        cy = np.floor(self.ys / cell).astype(np.int64)
        key = cx * np.int64(0x9E3779B1) + cy
        order = np.argsort(key, kind="stable")
        self.order = order
        ks = key[order]
        uniq, starts = np.unique(ks, return_index=True)
        self.bucket_keys = uniq
        self.bucket_starts = np.append(starts, len(ks))

    def _bucket(self, kx: int, ky: int):
        key = np.int64(kx) * np.int64(0x9E3779B1) + np.int64(ky)
        i = np.searchsorted(self.bucket_keys, key)
        if i < len(self.bucket_keys) and self.bucket_keys[i] == key:
            s, e = self.bucket_starts[i], self.bucket_starts[i + 1]
            return self.order[s:e]
        return None

    def _gather_ring(self, cxs, cys, r):
        """Candidate (probe_pos, src_idx) pairs for every probe's cells
        at Chebyshev ring r — fully vectorized over probes: one batched
        searchsorted per ring cell offset, slice expansion with the
        repeat/cumsum trick (no per-probe Python loop)."""
        if r == 0:
            offsets = [(0, 0)]
        else:
            offsets = [(dx, dy)
                       for dx in range(-r, r + 1)
                       for dy in range(-r, r + 1)
                       if max(abs(dx), abs(dy)) == r]
        M = np.int64(0x9E3779B1)
        probe_pos_all, src_all = [], []
        nb = len(self.bucket_keys)
        for dx, dy in offsets:
            keys = (cxs + dx) * M + (cys + dy)
            i = np.searchsorted(self.bucket_keys, keys)
            i_c = np.minimum(i, nb - 1)
            valid = (i < nb) & (self.bucket_keys[i_c] == keys)
            if not valid.any():
                continue
            vi = i[valid]
            starts = self.bucket_starts[vi]
            ends = self.bucket_starts[vi + 1]
            lens = ends - starts
            tot = int(lens.sum())
            # concatenated arange(starts[k], ends[k]) without a loop
            flat = np.repeat(ends - np.cumsum(lens), lens) + np.arange(tot)
            probe_pos_all.append(np.repeat(np.nonzero(valid)[0], lens))
            src_all.append(self.order[flat])
        if not probe_pos_all:
            return (np.empty(0, np.int64), np.empty(0, np.int64))
        return (np.concatenate(probe_pos_all), np.concatenate(src_all))

    def nearest(self, px, py, max_radius=np.inf, exclude_id=None):
        """Per-probe nearest source point: (id, dist); (-1, inf) if none
        within max_radius.  Ring-expanding cell search over probe
        COHORTS: all probes still active at ring r are gathered and
        scored together (ties broken by lowest source id)."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        n = len(px)
        best_d = np.full(n, np.inf)
        best_id = np.full(n, -1, dtype=np.int64)
        cxs = np.floor(px / self.cell).astype(np.int64)
        cys = np.floor(py / self.cell).astype(np.int64)
        active = np.arange(n)
        max_ring = 64  # bail-out for empty space
        r = 0
        while len(active) and r <= max_ring:
            ppos, src = self._gather_ring(cxs[active], cys[active], r)
            if len(src):
                gp = active[ppos]
                d = np.hypot(self.xs[src] - px[gp], self.ys[src] - py[gp])
                sid = self.ids[src].astype(np.int64)
                if exclude_id is not None:
                    keep = sid != np.asarray(exclude_id)[gp]
                    gp, d, sid = gp[keep], d[keep], sid[keep]
                if len(d):
                    # best candidate per probe: sort (probe, dist, id),
                    # take each probe's first row
                    o = np.lexsort((sid, d, gp))
                    gp_s, d_s, id_s = gp[o], d[o], sid[o]
                    first = np.concatenate(
                        [[0], np.nonzero(np.diff(gp_s))[0] + 1])
                    win = d_s[first] < best_d[gp_s[first]]
                    upd = gp_s[first][win]
                    best_d[upd] = d_s[first][win]
                    best_id[upd] = id_s[first][win]
            # stop when a found neighbor can't be beaten by the next
            # ring (its nearest possible point is r*cell away), or the
            # radius bail-out triggers
            found_stop = (best_id[active] >= 0) & \
                (best_d[active] <= r * self.cell)
            radius_stop = (best_d[active] > max_radius) & \
                (r * self.cell > max_radius)
            active = active[~(found_stop | radius_stop)]
            r += 1
        ok = (best_id >= 0) & (best_d <= max_radius)
        out_id = np.where(ok, best_id, -1).astype(self.ids.dtype)
        out_d = np.where(ok, best_d, np.inf)
        return out_id, out_d


def nearest_join(probe_ds, src_df: pd.DataFrame, radius: float,
                 x_col="lon", y_col="lat", id_col="doc_id",
                 out_id="neighbor_id", out_dist="dist",
                 exclude_self=False):
    """point→point join: each probe row gets its nearest source point
    within ``radius`` (reference -join point layers semantics,
    src/commands/mapshaper-spatial-join.js:32-40, default buffer 1e-3).
    Source side broadcast once; probes in task-pool map_batches."""
    import ray
    idx = GridPointIndex(src_df[x_col].to_numpy(),
                         src_df[y_col].to_numpy(),
                         src_df[id_col].to_numpy(), cell=max(radius, 1e-9))
    ref = ray.put(idx)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        gi = ray.get(ref)
        ex = df[id_col].to_numpy() if exclude_self else None
        nid, nd = gi.nearest(df[x_col].to_numpy(), df[y_col].to_numpy(),
                             max_radius=radius, exclude_id=ex)
        df = df.copy()
        df[out_id] = nid
        df[out_dist] = nd
        return df
    return probe_ds.map_batches(probe, batch_format="pandas")


def nearest_join_shuffle(probe_ds, src_ds, radius: float,
                         x_col="lon", y_col="lat", id_col="doc_id",
                         out_id="neighbor_id", out_dist="dist",
                         exclude_self=False):
    """Large×large variant: one shuffle on cell id; source points
    duplicated into the 8 neighbor cells (halo) so each group is
    self-contained for a within-radius nearest search."""
    cell = max(radius, 1e-9)

    def tag_probe(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__cell"] = (np.floor(df[x_col] / cell).astype(np.int64) *
                        np.int64(0x9E3779B1) +
                        np.floor(df[y_col] / cell).astype(np.int64))
        df["__side"] = np.int8(0)
        return df

    def tag_src(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        cx = np.floor(df[x_col] / cell).astype(np.int64)
        cy = np.floor(df[y_col] / cell).astype(np.int64)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                d = df.copy()
                d["__cell"] = ((cx + dx) * np.int64(0x9E3779B1) + (cy + dy))
                d["__side"] = np.int8(1)
                out.append(d)
        return pd.concat(out, ignore_index=True)

    both = probe_ds.map_batches(tag_probe, batch_format="pandas").union(
        src_ds.map_batches(tag_src, batch_format="pandas"))

    def per_cell(df: pd.DataFrame) -> pd.DataFrame:
        probes = df[df["__side"] == 0]
        srcs = df[df["__side"] == 1]
        if len(probes) == 0:
            return probes.drop(columns=["__cell", "__side"])
        out = probes.drop(columns=["__cell", "__side"]).copy()
        if len(srcs) == 0:
            out[out_id] = -1
            out[out_dist] = np.inf
            return out
        px = probes[x_col].to_numpy()
        py = probes[y_col].to_numpy()
        sx = srcs[x_col].to_numpy()
        sy = srcs[y_col].to_numpy()
        sid = srcs[id_col].to_numpy()
        d = np.hypot(px[:, None] - sx[None, :], py[:, None] - sy[None, :])
        if exclude_self:
            d[probes[id_col].to_numpy()[:, None] == sid[None, :]] = np.inf
        # tie-break equal distances by lowest source id: argmin over
        # (d, id) lexicographic via stable double argsort is overkill —
        # sort source columns by id once instead
        id_order = np.argsort(sid, kind="stable")
        d = d[:, id_order]
        sid = sid[id_order]
        a = np.argmin(d, axis=1)
        best = d[np.arange(len(px)), a]
        nid = sid[a]
        out[out_id] = np.where(best <= radius, nid, -1)
        out[out_dist] = np.where(best <= radius, best, np.inf)
        return out

    return both.groupby("__cell").map_groups(per_cell, batch_format="pandas")
