"""Differential test: the DataFrame redirect-chain closure
(sources/cdx.resolve_redirect_chains) vs an independent, obviously-
correct Python reference (follow the dict up to max_hops), over
seeded-random edge sets that include chains, loops, converging trees,
self-loops, and duplicate-src conflicts — the adversarial shapes a
real crawl graph actually contains (the robots-vs-spec-reference
testing pattern from round 12)."""

from __future__ import annotations

import random


def _reference(edges: "list[tuple[str, str]]", max_hops: int):
    """Independent closure: duplicate src collapses to MIN dst (the
    documented tie rule), then each src follows links up to max_hops;
    resolved iff the stop node is not itself a source."""
    nxt: "dict[str, str]" = {}
    for s, d in edges:
        if s not in nxt or d < nxt[s]:
            nxt[s] = d
    out = {}
    for s in nxt:
        cur, hops = nxt[s], 1
        while hops < max_hops and cur in nxt:
            cur = nxt[cur]
            hops += 1
        out[s] = (cur, hops, cur not in nxt)
    return out


def test_chain_closure_matches_reference_on_random_graphs(spark):
    from nextbus2pg_spark.sources.cdx import resolve_redirect_chains

    for seed in range(6):
        rng = random.Random(1000 + seed)
        n = rng.randrange(8, 40)
        nodes = [f"u{i}" for i in range(n)]
        edges = []
        for _ in range(rng.randrange(4, n * 2)):
            s = rng.choice(nodes)
            d = rng.choice(nodes)  # self-loops and cycles included
            edges.append((s, d))
        max_hops = rng.choice([1, 2, 4, 7])
        want = _reference(edges, max_hops)
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r.src: (r.final_url, r.hops, r.resolved)
            for r in resolve_redirect_chains(
                df, max_hops=max_hops
            ).collect()
        }
        assert got == want, (seed, max_hops, sorted(edges))
