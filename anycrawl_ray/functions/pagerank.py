"""Distributed PageRank over the crawl link graph — sharded rank actors.

Link-authority scoring is the classic crawl-pipeline companion to the
frontier (prioritize what to fetch next; weight documents for corpus
sampling). Like connected components (functions/graph.py), an iterative
fixpoint is the wrong shape for per-round Ray Data shuffles — ranks and
arcs live SHARDED in actors and each round is one batched message exchange:

- partitioning: node n lives on shard ``hash(n) % n_shards``; arc
  (src, dst) is stored on ``shard(src)`` — the contribution
  ``d * r(src) / outdeg(src)`` only needs LOCAL state to compute.
- round: every shard emits, per stored arc, ``(dst, contribution)``
  grouped by ``shard(dst)`` (vectorized; one Arrow table per target
  shard, refs routed by the driver via ``num_returns=n_shards``).
  Dangling mass (rank parked on zero-outdegree nodes) is summed across
  shards and redistributed uniformly — the standard stochastic fix.
- apply: ``r_new(v) = (1-d)/N + d*dangling/N + sum(incoming)``; shards
  report their L1 delta and the driver stops at ``tol`` (or max_iters).

PageRank: Page, Brin, Motwani, Winograd 1999 (public). Parity against a
dense numpy reference is pinned by tests/test_pagerank.py.

Graph semantics (documented choices): DISTINCT (src, dst) edges — repeated
links from one page don't multiply authority; dead links (href resolving to
no page — the 404 analog) are dropped, shrinking the source's outdegree;
self-loops are kept.

Reference anchor: the reference has no ranking operator; its closest
surface is crawl priority ordering (O6, packages/scrape/src/managers/
Queue.ts) which this feeds at scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .graph import _shard_of
from ..corpus import CorpusIndex
from ..urlnorm import canonicalize_links, strip_fragment


def link_edges(corpus: pa.Table, *, batch_size: int = 256) -> pa.Table:
    """(src, dst) page-ordinal edges from the corpus span table: one
    streaming map_batches canonicalizes hrefs against each page URL,
    strips fragments and resolves targets through a broadcast CorpusIndex
    (dead links drop out as -1 lookups). DISTINCT edges."""
    idx_ref = ray.put(CorpusIndex(corpus))

    def f(t: pa.Table) -> pa.Table:
        idx: CorpusIndex = ray.get(idx_ref)
        src_urls = t.column("doc_id").to_pylist()
        src_ord = idx.lookup_batch([strip_fragment(u) for u in src_urls])
        spans_col = t.column("spans").to_pylist()
        srcs: list[int] = []
        hrefs: list[str] = []
        for so, url, spans in zip(src_ord, src_urls, spans_col):
            if so < 0:
                continue
            links = [s["media_ref"] for s in spans if s["kind"] == "link"]
            if not links:
                continue
            canon = canonicalize_links(links, url)
            srcs.extend([int(so)] * len(canon))
            hrefs.extend(canon)
        if not srcs:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        dst = idx.lookup_batch([strip_fragment(h) for h in hrefs])
        src_a = np.asarray(srcs, dtype=np.int64)
        ok = dst >= 0
        return pa.table({"src": pa.array(src_a[ok], pa.int64()),
                         "dst": pa.array(dst[ok].astype(np.int64), pa.int64())})

    ds = rd.from_arrow(corpus).map_batches(
        f, batch_format="pyarrow", batch_size=batch_size
    )
    parts = [p for p in ray.get(ds.to_arrow_refs()) if p.num_rows]
    if not parts:
        return pa.table({"src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64())})
    t = pa.concat_tables(parts)
    # DISTINCT edges, vectorized
    both = (t.column("src").to_numpy().astype(np.uint64) << np.uint64(32)) | \
        t.column("dst").to_numpy().astype(np.uint64)
    uniq = np.unique(both)
    return pa.table({
        "src": pa.array((uniq >> np.uint64(32)).astype(np.int64), pa.int64()),
        "dst": pa.array((uniq & np.uint64(0xFFFFFFFF)).astype(np.int64),
                        pa.int64()),
    })


class RankShardCore:
    """One shard: ranks for its nodes + arcs whose src lives here."""

    def __init__(self, shard_id: int, n_shards: int, n_nodes: int,
                 d: float = 0.85):
        self.shard_id = shard_id
        self.n_shards = n_shards
        self.n_nodes = n_nodes
        self.d = d
        self.nodes = np.zeros(0, dtype=np.int64)
        self.rank: dict[int, float] = {}
        self.arc_src = np.zeros(0, dtype=np.int64)
        self.arc_dst = np.zeros(0, dtype=np.int64)
        self.outdeg: dict[int, int] = {}

    def load(self, nodes: pa.Table, arcs: pa.Table) -> None:
        ids = nodes.column("node").to_numpy()
        self.nodes = np.concatenate([self.nodes, ids])
        r0 = 1.0 / self.n_nodes
        self.rank.update({int(i): r0 for i in ids})
        src = arcs.column("src").to_numpy()
        dst = arcs.column("dst").to_numpy()
        self.arc_src = np.concatenate([self.arc_src, src])
        self.arc_dst = np.concatenate([self.arc_dst, dst])
        u, c = np.unique(src, return_counts=True)
        for n, k in zip(u.tolist(), c.tolist()):
            self.outdeg[n] = self.outdeg.get(n, 0) + k

    def dangling_mass(self) -> float:
        return float(sum(r for n, r in self.rank.items()
                         if self.outdeg.get(n, 0) == 0))

    def emit(self):
        """Per arc: (dst, d*r(src)/outdeg(src)), grouped by shard(dst)."""
        if len(self.arc_src) == 0:
            empty = pa.table({"node": pa.array([], pa.int64()),
                              "w": pa.array([], pa.float64())})
            out = [empty] * self.n_shards
            return out if self.n_shards > 1 else out[0]
        r = np.fromiter((self.rank[int(s)] for s in self.arc_src),
                        np.float64, len(self.arc_src))
        deg = np.fromiter((self.outdeg[int(s)] for s in self.arc_src),
                          np.float64, len(self.arc_src))
        w = self.d * r / deg
        tgt = _shard_of(self.arc_dst, self.n_shards)
        out = []
        for t in range(self.n_shards):
            m = tgt == t
            out.append(pa.table({"node": pa.array(self.arc_dst[m], pa.int64()),
                                 "w": pa.array(w[m], pa.float64())}))
        return out if self.n_shards > 1 else out[0]

    def apply(self, base: float, *msg_tables: pa.Table) -> float:
        """r_new(v) = base + sum(incoming w); returns local L1 delta."""
        new = {int(n): base for n in self.nodes}
        parts = [t for t in msg_tables if t is not None and t.num_rows]
        if parts:
            t = pa.concat_tables(parts)
            nodes = t.column("node").to_numpy()
            w = t.column("w").to_numpy()
            order = np.argsort(nodes, kind="stable")
            nodes_s, w_s = nodes[order], w[order]
            uniq, starts = np.unique(nodes_s, return_index=True)
            sums = np.add.reduceat(w_s, starts)
            for n, s in zip(uniq.tolist(), sums.tolist()):
                new[int(n)] += s
        delta = sum(abs(new[n] - self.rank[n]) for n in new)
        self.rank = new
        return float(delta)

    def dump(self) -> pa.Table:
        items = sorted(self.rank.items())
        return pa.table({"node": pa.array([k for k, _ in items], pa.int64()),
                         "rank": pa.array([v for _, v in items], pa.float64())})


RankShard = ray.remote(RankShardCore)


def pagerank(
    edges: pa.Table, n_nodes: int, *, d: float = 0.85, tol: float = 1e-10,
    max_iters: int = 100, n_shards: int = 4,
) -> pa.Table:
    """(node, rank) for nodes 0..n_nodes-1 via sharded power iteration."""
    all_nodes = np.arange(n_nodes, dtype=np.int64)
    src = edges.column("src").to_numpy()
    dst = edges.column("dst").to_numpy()
    shards = [RankShard.options(num_cpus=0.25).remote(i, n_shards, n_nodes, d)
              for i in range(n_shards)]
    try:
        node_shard = _shard_of(all_nodes, n_shards)
        arc_shard = _shard_of(src, n_shards)  # arcs live with their SRC
        ray.get([
            shards[s].load.remote(
                pa.table({"node": pa.array(all_nodes[node_shard == s],
                                           pa.int64())}),
                pa.table({"src": pa.array(src[arc_shard == s], pa.int64()),
                          "dst": pa.array(dst[arc_shard == s], pa.int64())}),
            )
            for s in range(n_shards)
        ])
        for _ in range(max_iters):
            dm = sum(ray.get([s.dangling_mass.remote() for s in shards]))
            base = (1.0 - d) / n_nodes + d * dm / n_nodes
            if n_shards > 1:
                outs = [s.emit.options(num_returns=n_shards).remote()
                        for s in shards]
                deltas = ray.get([
                    shards[t].apply.remote(
                        base, *[outs[s][t] for s in range(n_shards)])
                    for t in range(n_shards)
                ])
            else:
                out = shards[0].emit.remote()
                deltas = ray.get([shards[0].apply.remote(base, out)])
            if sum(deltas) < tol:
                break
        parts = ray.get([s.dump.remote() for s in shards])
    finally:
        for s in shards:
            ray.kill(s)
    return pa.concat_tables(parts).sort_by("node")


def pagerank_dense(edges: pa.Table, n_nodes: int, *, d: float = 0.85,
                   tol: float = 1e-10, max_iters: int = 100) -> np.ndarray:
    """Dense numpy reference (parity gate for the sharded actors)."""
    src = edges.column("src").to_numpy()
    dst = edges.column("dst").to_numpy()
    outdeg = np.bincount(src, minlength=n_nodes).astype(np.float64)
    r = np.full(n_nodes, 1.0 / n_nodes)
    for _ in range(max_iters):
        dm = r[outdeg == 0].sum()
        contrib = np.bincount(dst, weights=d * r[src] / outdeg[src],
                              minlength=n_nodes)
        new = (1.0 - d) / n_nodes + d * dm / n_nodes + contrib
        delta = np.abs(new - r).sum()
        r = new
        if delta < tol:
            break
    return r
