"""Packed Sort-Tile-Recursive R-tree (Leutenegger/Lopez/Edgington,
ICDE 1997 — public algorithm) as flat numpy arrays, broadcastable to
actors like the cell-grid PathIndex (north rule: "point-in-polygon
tests against packed STRtree/arc-index structures broadcast to
actors").

Layout: one bbox array per level; level 0 holds the items in packed
STR order, node ``k`` at level ``l`` spans children
``[k*C, min((k+1)*C, n_{l-1}))`` at level ``l-1`` — no pointers, so
``pack()`` is just the arrays.  Every level re-applies the STR tiling
(sort by center x → √P vertical slices → sort by center y inside a
slice), keeping upper-level nodes square-ish instead of tall strips.

Queries are level-synchronous frontier descents vectorized over the
whole query batch: a (query, node) pair array is expanded one level at
a time with a single repeat + bbox test per level — no per-query
recursion.  Complements the cell grid: the grid wins on uniformly
spread rings (O(1) probe), the STRtree on heavily skewed bbox sizes
(no cell-list blowup under a giant ring).

``STRPathIndex`` plugs the tree into PathIndex's exact-PIP probe by
overriding only the candidate step — same ``find_enclosing_feature``
contract, same broadcast pack()/unpack().
"""

from __future__ import annotations

import numpy as np

from .path_index import PathIndex


def _str_order(boxes: np.ndarray, cap: int) -> np.ndarray:
    """Packed STR permutation of ``boxes``: sort by center x, cut into
    ceil(sqrt(P)) vertical slices of whole nodes, sort each slice by
    center y."""
    n = len(boxes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
    n_nodes = -(-n // cap)
    n_slices = int(np.ceil(np.sqrt(n_nodes)))
    slice_items = -(-n_nodes // n_slices) * cap
    by_x = np.argsort(cx, kind="stable")
    slice_id = np.arange(n) // slice_items
    # within each x-slice, order by center y
    order = np.lexsort((cy[by_x], slice_id))
    return by_x[order]


class STRtree:
    """Generic packed STR-tree over item bboxes (n, 4) as
    [xmin, ymin, xmax, ymax]."""

    def __init__(self, boxes, node_capacity: int = 16):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.cap = int(node_capacity)
        self.item_order = _str_order(boxes, self.cap)
        levels = [boxes[self.item_order]]
        perms = [None]  # per level: permuted-pos -> original-pos (for
        # child-span lookup); level 0 keeps item order, translated at
        # query exit via item_order instead
        while len(levels[-1]) > 1:
            cur = levels[-1]
            if len(levels) > 1:
                # re-tile upper levels so nodes stay square-ish; a
                # parent's child span refers to the ORIGINAL position,
                # recorded in perms for the descent to translate
                perm = _str_order(cur, self.cap)
                cur = cur[perm]
                levels[-1] = cur
                perms[-1] = perm
            starts = np.arange(0, len(cur), self.cap)
            nxt = np.empty((len(starts), 4), dtype=np.float64)
            nxt[:, 0] = np.minimum.reduceat(cur[:, 0], starts)
            nxt[:, 1] = np.minimum.reduceat(cur[:, 1], starts)
            nxt[:, 2] = np.maximum.reduceat(cur[:, 2], starts)
            nxt[:, 3] = np.maximum.reduceat(cur[:, 3], starts)
            levels.append(nxt)
            perms.append(None)
        self.levels = levels
        self._inv = perms

    def _expand(self, q, nodes, level):
        """(query, node)@level -> (query, child)@level-1 pairs."""
        child_n = len(self.levels[level - 1])
        start = nodes * self.cap
        reps = np.minimum(start + self.cap, child_n) - start
        q2 = np.repeat(q, reps)
        offs = np.arange(len(nodes)).repeat(reps)
        within = np.arange(reps.sum()) - (np.cumsum(reps) - reps)[offs]
        return q2, start[offs] + within

    def query_point(self, px, py):
        """(query_idx, item_idx) pairs whose item bbox contains the
        point; item_idx refers to the ORIGINAL box order."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        if len(self.levels[0]) == 0:
            e = np.empty(0, dtype=np.int64)
            return e, e
        top = len(self.levels) - 1
        q = np.arange(len(px), dtype=np.int64)
        nodes = np.zeros(len(px), dtype=np.int64)
        for level in range(top, -1, -1):
            bb = self.levels[level]
            keep = ((px[q] >= bb[nodes, 0]) & (px[q] <= bb[nodes, 2]) &
                    (py[q] >= bb[nodes, 1]) & (py[q] <= bb[nodes, 3]))
            q, nodes = q[keep], nodes[keep]
            if level:
                # translate through this level's re-tiling permutation
                if self._inv[level] is not None:
                    nodes = self._inv[level][nodes]
                q, nodes = self._expand(q, nodes, level)
        return q, self.item_order[nodes]

    def query_box(self, boxes):
        """(query_idx, item_idx) pairs with overlapping bboxes."""
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        if len(self.levels[0]) == 0:
            e = np.empty(0, dtype=np.int64)
            return e, e
        top = len(self.levels) - 1
        q = np.arange(len(boxes), dtype=np.int64)
        nodes = np.zeros(len(boxes), dtype=np.int64)
        for level in range(top, -1, -1):
            bb = self.levels[level]
            qa = boxes[q]
            keep = ((qa[:, 0] <= bb[nodes, 2]) & (qa[:, 2] >= bb[nodes, 0])
                    & (qa[:, 1] <= bb[nodes, 3])
                    & (qa[:, 3] >= bb[nodes, 1]))
            q, nodes = q[keep], nodes[keep]
            if level:
                if self._inv[level] is not None:
                    nodes = self._inv[level][nodes]
                q, nodes = self._expand(q, nodes, level)
        return q, self.item_order[nodes]


class STRPathIndex(PathIndex):
    """PathIndex with the cell grid swapped for a packed STRtree —
    identical ``find_enclosing_feature`` contract (first feature by
    lowest id, boundary inside) and broadcast pack()/unpack()
    (pack ships the rings; the tree rebuilds deterministically at
    unpack, same as the grid)."""

    def _build_grid(self):
        self.tree = STRtree(self.bboxes,
                            node_capacity=max(4, min(self.dim, 64)))

    def _candidate_pairs(self, px, py):
        return self.tree.query_point(px, py)
