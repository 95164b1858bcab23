"""HNSW graph over IVF centroids — sub-linear cell probing at large
``n_cells`` (the FAISS ``IVF*_HNSW`` coarse-quantizer shape,
paimon-faiss faiss/index/*; algorithm per Malkov & Yashunin 2018,
"Efficient and robust approximate nearest neighbor search using
Hierarchical Navigable Small World graphs").

Why this shape and not a corpus-wide HNSW: a billion-vector graph is a
single mutable in-memory structure — the opposite of a Spark-friendly
layout — while the CENTROID set is small (10³-10⁶), lives on the
driver, broadcasts cheaply, and is exactly where flat probing stops
scaling: ``nearest_cells`` unrolls every centroid into the Catalyst
expression tree (O(n_cells) plan size, O(n_cells) flops per row), fine
at 16 cells and hopeless at 10⁵. The graph search visits
O(M·ef·log n) centroids per lookup instead.

Pure numpy + stdlib heapq; the graph serializes to JSON inside the
global-index meta file and rides into Arrow-batched UDFs (globalindex
uses it for both build-time assignment and query-time probing when the
cell count crosses ``HNSW_THRESHOLD``). Distances are squared
euclidean — identical to ``similarity.nearest_cells`` — so flat and
graph probing agree on metric.
"""

from __future__ import annotations

import heapq
import math

import numpy as np

# below this many cells the flat (exact, JVM-side) probe is cheaper
HNSW_THRESHOLD = 64


def _search_layer(vecs, neigh, q, entry_points, ef):
    """Best-first search in one layer: returns up to ``ef`` (dist, id)
    pairs, closest first. ``neigh``: {node: [neighbor ids]}."""
    visited = set(entry_points)
    cand: list[tuple[float, int]] = []  # min-heap by distance
    out: list[tuple[float, int]] = []  # max-heap via negated distance
    for p in entry_points:
        d = float(((vecs[p] - q) ** 2).sum())
        heapq.heappush(cand, (d, p))
        heapq.heappush(out, (-d, p))
    while cand:
        d, c = heapq.heappop(cand)
        if d > -out[0][0]:
            break
        nbrs = [x for x in neigh.get(c, ()) if x not in visited]
        if not nbrs:
            continue
        visited.update(nbrs)
        ds = ((vecs[nbrs] - q) ** 2).sum(axis=1)
        for x, dx in zip(nbrs, ds):
            dx = float(dx)
            if len(out) < ef or dx < -out[0][0]:
                heapq.heappush(cand, (dx, x))
                heapq.heappush(out, (-dx, x))
                if len(out) > ef:
                    heapq.heappop(out)
    return sorted((-d, i) for d, i in out)


def build(vectors, M: int = 16, ef_construction: int = 200, seed: int = 42) -> dict:
    """Build the layered graph. Returns a JSON-serializable dict:
    ``{"M", "entry", "levels": [int per node],
    "neighbors": [ {node: [ids]} per layer ]}``."""
    vecs = np.asarray(vectors, dtype=np.float32)
    n = len(vecs)
    if n == 0:
        return {"M": M, "entry": -1, "levels": [], "neighbors": []}
    mL = 1.0 / math.log(M) if M > 1 else 1.0
    rng = np.random.default_rng(seed)
    levels = np.floor(-np.log(1.0 - rng.random(n)) * mL).astype(int)
    levels[0] = max(int(levels[0]), int(levels.max()))  # node 0 spans all layers
    top = int(levels.max())
    neighbors: list[dict[int, list[int]]] = [dict() for _ in range(top + 1)]
    entry = 0
    for lev in range(int(levels[0]) + 1):
        neighbors[lev][0] = []
    for i in range(1, n):
        q = vecs[i]
        li = int(levels[i])
        cur = entry
        for lev in range(top, li, -1):
            # greedy descend: step to the closest neighbor until local min
            improved = True
            dc = float(((vecs[cur] - q) ** 2).sum())
            while improved:
                improved = False
                for x in neighbors[lev].get(cur, ()):
                    dx = float(((vecs[x] - q) ** 2).sum())
                    if dx < dc:
                        cur, dc, improved = x, dx, True
        eps = [cur]
        for lev in range(min(top, li), -1, -1):
            found = _search_layer(vecs, neighbors[lev], q, eps, ef_construction)
            m_max = M * 2 if lev == 0 else M
            sel = [x for _d, x in found[:M]]
            neighbors[lev][i] = sel
            for x in sel:
                lst = neighbors[lev].setdefault(x, [])
                lst.append(i)
                if len(lst) > m_max:
                    ds = ((vecs[lst] - vecs[x]) ** 2).sum(axis=1)
                    keep = np.argsort(ds, kind="stable")[:m_max]
                    neighbors[lev][x] = [lst[j] for j in keep]
            eps = [x for _d, x in found]
        if li > int(levels[entry]):
            entry = i
    return {
        "M": M,
        "entry": entry,
        "levels": [int(x) for x in levels],
        "neighbors": [{str(k): v for k, v in lay.items()} for lay in neighbors],
    }


def prepare(graph: dict) -> dict:
    """One-time decode of a JSON graph (string neighbor keys → int) for
    repeated searches. O(n_cells·M) — do this once per batch/task, NOT
    per query; ``search`` accepts either form but re-decodes a raw JSON
    graph on every call."""
    return {
        "M": graph["M"],
        "entry": graph["entry"],
        "levels": graph["levels"],
        "neighbors": [
            {int(kk): vv for kk, vv in lay.items()} for lay in graph["neighbors"]
        ],
        "__prepared": True,
    }


def search(graph: dict, vectors, q, k: int = 1, ef: int = 64) -> list[int]:
    """ids of the ~k nearest vectors to ``q`` via the graph (closest
    first). ``vectors`` is the SAME array the graph was built over.
    For many queries, ``prepare`` the graph once first."""
    if graph["entry"] < 0:
        return []
    if not graph.get("__prepared"):
        graph = prepare(graph)
    vecs = np.asarray(vectors, dtype=np.float32)
    q = np.asarray(q, dtype=np.float32)
    neighbors = graph["neighbors"]
    entry, top = graph["entry"], len(neighbors) - 1
    cur = entry
    dc = float(((vecs[cur] - q) ** 2).sum())
    for lev in range(top, 0, -1):
        improved = True
        while improved:
            improved = False
            for x in neighbors[lev].get(cur, ()):
                dx = float(((vecs[x] - q) ** 2).sum())
                if dx < dc:
                    cur, dc, improved = x, dx, True
    found = _search_layer(vecs, neighbors[0], q, [cur], max(ef, k))
    return [i for _d, i in found[:k]]
