"""louvain: deterministic synchronous Louvain — pinned bit-for-bit
against a pure-Python twin of the SAME algorithm (possible because the
gain argmax is exact long arithmetic: 2m*k_ic - k_i*tot'), plus
structural checks (two cliques split, modularity beats singletons)."""

from __future__ import annotations

import zlib
from collections import defaultdict


def _python_louvain(pairs, levels=2, move_rounds=4):
    """Driver-side twin of operators.pagerank.louvain: synchronous
    moves, exact-long scores, min-c tiebreak, crc32 parity gate."""
    adj = defaultdict(lambda: defaultdict(int))
    for s, d in set(pairs):
        if s == d:
            continue
        adj[s][d] = 1
        adj[d][s] = 1
    two_m = sum(len(v) for v in adj.values())
    if not two_m:
        return {}
    mapping = {n: n for n in adj}
    selfw = {n: 0 for n in adj}
    for _ in range(levels):
        k = {u: sum(adj[u].values()) + 2 * selfw.get(u, 0)
             for u in adj}
        comm = {u: u for u in adj}
        for r in range(move_rounds):
            tot = defaultdict(int)
            for u in adj:
                tot[comm[u]] += k[u]
            new_comm = {}
            for u in adj:
                kic = defaultdict(int)
                for v, w in adj[u].items():
                    kic[comm[v]] += w
                kic.setdefault(comm[u], 0)
                best, best_score = None, None
                for c in sorted(kic):
                    totp = tot[c] - (k[u] if c == comm[u] else 0)
                    score = two_m * kic[c] - k[u] * totp
                    if best_score is None or score > best_score:
                        best, best_score = c, score
                mover = zlib.crc32(str(u).encode()) % 2 == r % 2
                new_comm[u] = best if mover else comm[u]
            comm = new_comm
        mapping = {n: comm.get(c, c) for n, c in mapping.items()}
        # coarsen
        nadj = defaultdict(lambda: defaultdict(int))
        nself = defaultdict(int)
        for u in adj:
            nself[comm[u]] += selfw.get(u, 0)
        intra = defaultdict(int)
        for u in adj:
            for v, w in adj[u].items():
                cu, cv = comm[u], comm[v]
                if cu == cv:
                    intra[cu] += w
                else:
                    nadj[cu][cv] += w
        for c, tw in intra.items():
            nself[c] += tw // 2
        adj = {u: dict(vs) for u, vs in nadj.items()}
        selfw = dict(nself)
        if not adj:
            break
    canon = defaultdict(list)
    for n, c in mapping.items():
        canon[c].append(n)
    label = {c: min(ms) for c, ms in canon.items()}
    return {n: label[c] for n, c in mapping.items()}


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _run(edges, **kw):
    from mms_rdf_spark.operators.pagerank import louvain

    return {r.node: r.community for r in louvain(edges, **kw).collect()}


TWO_CLIQUES = (
    [(a, b) for a in "abcd" for b in "abcd" if a < b]
    + [(a, b) for a in "wxyz" for b in "wxyz" if a < b]
    + [("d", "w")]  # one bridge
)


def test_two_cliques_split(spark):
    got = _run(_edges(spark, TWO_CLIQUES))
    assert len({got[n] for n in "abcd"}) == 1
    assert len({got[n] for n in "wxyz"}) == 1
    assert got["a"] != got["w"]


def test_matches_python_twin(spark):
    for pairs in (TWO_CLIQUES,
                  [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
                   ("d", "e"), ("e", "f"), ("f", "d")],
                  [("1", "2")]):
        got = _run(_edges(spark, pairs))
        want = _python_louvain(pairs)
        assert got == want, (pairs, got, want)


def test_beats_singletons_on_modularity(spark):
    from mms_rdf_spark.operators.pagerank import louvain, modularity

    e = _edges(spark, TWO_CLIQUES)
    labels = louvain(e).withColumnRenamed("community", "label")
    q = modularity(e, labels).first()
    assert q.modularity > 0.3  # two cliques: near-optimal split
    assert q.n_communities == 2


def test_empty_edges(spark):
    assert _run(_edges(spark, []).limit(0)) == {}


def test_deterministic(spark):
    e = _edges(spark, TWO_CLIQUES)
    assert _run(e) == _run(e)
