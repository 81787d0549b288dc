"""Brute-force equivalence tests for the round-2 pipeline additions:
k-hop BFS, n-gram containment, incremental rollup maintenance. The
oracle harness checks values at sf0.01; these re-derive the same answers
with independent driver-side Python over sf0.001."""

from __future__ import annotations

import re
from collections import defaultdict

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class TestKhopBfs:
    def test_matches_python_bfs(self, spark):
        from aristoteles_spark.operators.similarity import neardup_pairs
        from aristoteles_spark.queries.similarity import (
            K_HOPS,
            SEED_MOD,
            TRI_T,
            _load,
            _planes_for,
            q_khop_bfs,
        )

        got = {r.node: r.hop for r in q_khop_bfs(spark, SF).collect()}

        v = _load(spark, SF)
        pairs = neardup_pairs(v, _planes_for(spark, SF), threshold=TRI_T).collect()
        adj = defaultdict(set)
        for r in pairs:
            adj[r.vec_a].add(r.vec_b)
            adj[r.vec_b].add(r.vec_a)
        seeds = [
            r.vec_id
            for r in v.filter(F.col("vec_id") % SEED_MOD == 0)
            .select("vec_id")
            .collect()
        ]
        expected = {s: 0 for s in seeds}
        frontier = set(seeds)
        for hop in range(1, K_HOPS + 1):
            nxt = set()
            for n in frontier:
                nxt |= adj[n]
            nxt -= set(expected)
            for n in nxt:
                expected[n] = hop
            frontier = nxt
        assert got == expected
        assert len(got) > len(seeds)  # graph is connected enough to expand


class TestContainment:
    def test_matches_python_recompute(self, spark):
        from aristoteles_spark.queries.dedup import DF_CAP, q_containment
        from aristoteles_spark.queries.text import _GRAM

        rows = q_containment(spark, SF).collect()
        got = {(r.doc_a, r.doc_b): (r.n_common, r.n_a, r.n_b) for r in rows}

        docs = (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text")
            .collect()
        )
        gram_sets = {}
        for r in docs:
            toks = [t for t in re.split(r"[^a-z0-9]+", r.text.lower()) if t]
            gs = {
                tuple(toks[i : i + _GRAM])
                for i in range(len(toks) - _GRAM + 1)
            }
            gram_sets[r.doc_id] = gs
        df = defaultdict(int)
        for gs in gram_sets.values():
            for g in gs:
                df[g] += 1
        rare = {
            d: {g for g in gs if df[g] <= DF_CAP}
            for d, gs in gram_sets.items()
        }
        expected = {}
        ids = sorted(rare)
        inv = defaultdict(set)
        for d, gs in rare.items():
            for g in gs:
                inv[g].add(d)
        cand = set()
        for ds in inv.values():
            ds = sorted(ds)
            for i, a in enumerate(ds):
                for b in ds[i + 1 :]:
                    cand.add((a, b))
        for a, b in cand:
            common = len(rare[a] & rare[b])
            na, nb = len(rare[a]), len(rare[b])
            if common * 5 >= 4 * min(na, nb) and common > 0:
                expected[(a, b)] = (common, na, nb)
        assert got == expected
        for r in rows:  # ratio column is the exact integer division
            assert r.containment == r.n_common / min(r.n_a, r.n_b)


class TestIncrementalRollup:
    def test_merge_equals_full_recompute(self, spark):
        from aristoteles_spark.queries.io_formats import q_incremental_rollup
        from aristoteles_spark.sources.parquet_source import load_table

        merged = q_incremental_rollup(spark, SF).collect()
        ev = load_table(spark, SF, "events")
        cents = (
            F.when(F.col("value").isNull(), F.lit(0))
            .otherwise(F.round(F.col("value") * 100))
            .cast("long")
        )
        full = (
            ev.groupBy("event_type", F.to_date("ts").alias("d"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(cents).cast("long").alias("total_cents"),
            )
            .orderBy("event_type", "d")
            .collect()
        )
        assert merged == full


class TestFeatureSnapshot:
    def test_point_in_time_no_leakage(self, spark):
        """Each label's features must equal the latest at-or-before
        value (click additionally within 7 days) — never a future one."""
        import datetime as dt

        from aristoteles_spark.queries.temporal import q_feature_snapshot

        got = {
            r.event_id: (r.f_click_cents, r.f_view_cents)
            for r in q_feature_snapshot(spark, SF).collect()
        }
        ev = spark.read.parquet(f"{SF}/events.parquet").collect()
        labels = [r for r in ev if r.event_type == "purchase"]
        assert len(got) == len(labels)

        def latest(rows, uid, ts, horizon=None):
            best = None
            for r in rows:
                if r.user_id != uid or r.value is None or r.ts > ts:
                    continue
                if horizon is not None and r.ts < ts - horizon:
                    continue
                cents = round(r.value * 100)
                key = (r.ts, cents)
                if best is None or key > best:
                    best = key
            return -1 if best is None else best[1]

        clicks = [r for r in ev if r.event_type == "click"]
        views = [r for r in ev if r.event_type == "view"]
        for lbl in labels:
            want_click = latest(
                clicks, lbl.user_id, lbl.ts, dt.timedelta(days=7)
            )
            want_view = latest(views, lbl.user_id, lbl.ts)
            assert got[lbl.event_id] == (want_click, want_view)


class TestBloomFilter:
    def test_no_false_negatives_and_exact_members(self, spark):
        from aristoteles_spark.queries.analytics import q_bloom_filter

        rows = q_bloom_filter(spark, SF).collect()
        assert rows  # probe set non-empty
        for r in rows:
            assert r.n_false_neg == 0  # Bloom guarantee
            assert r.n_bloom_hits == r.n_members + r.n_false_pos
            assert 0 <= r.n_members <= r.n_probes
            assert r.n_bloom_hits <= r.n_probes

    def test_membership_matches_bruteforce(self, spark):
        import re as _re

        from aristoteles_spark.queries.analytics import (
            PROBE_MOD,
            q_bloom_filter,
        )

        got = {r.source: r.n_members for r in q_bloom_filter(spark, SF).collect()}
        docs = (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "source", "text")
            .collect()
        )
        vocab = defaultdict(set)
        probe = set()
        for r in docs:
            toks = {t for t in _re.split(r"[^a-z0-9]+", r.text.lower()) if t}
            vocab[r.source] |= toks
            if r.doc_id % PROBE_MOD == 0:
                probe |= toks
        want = {s: len(probe & v) for s, v in vocab.items()}
        assert got == want


class TestSentenceStats:
    def test_matches_python_recompute(self, spark):
        import re as _re

        from aristoteles_spark.queries.text import q_sentence_stats

        got = {
            r.doc_id: (r.n_sentences, r.total_sent_chars, r.max_sent_chars)
            for r in q_sentence_stats(spark, SF).collect()
        }
        docs = (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text")
            .collect()
        )
        for r in docs:
            sents = [s.strip(" ") for s in _re.split(r"[.!?]+", r.text)]
            sents = [s for s in sents if s]
            lens = [len(s) for s in sents]
            want = (len(sents), sum(lens), max(lens) if lens else 0)
            assert got[r.doc_id] == want, r.doc_id


class TestPagerank:
    def test_matches_python_fixed_point(self, spark):
        from aristoteles_spark.operators.similarity import neardup_pairs
        from aristoteles_spark.queries.similarity import (
            PR_ITERS,
            PR_ONE,
            TRI_T,
            _load,
            _planes_for,
            q_pagerank,
        )

        got = {r.node: r.rank for r in q_pagerank(spark, SF).collect()}
        v = _load(spark, SF)
        pairs = neardup_pairs(v, _planes_for(spark, SF), threshold=TRI_T).collect()
        nodes = [r.vec_id for r in v.select("vec_id").collect()]
        adj = defaultdict(list)
        for r in pairs:
            adj[r.vec_a].append(r.vec_b)
            adj[r.vec_b].append(r.vec_a)
        rank = {n: PR_ONE for n in nodes}
        for _ in range(PR_ITERS):
            s = defaultdict(int)
            for u, nbrs in adj.items():
                c = rank[u] // len(nbrs)
                for w in nbrs:
                    s[w] += c
            rank = {n: 150_000 + (85 * s[n]) // 100 for n in nodes}
        assert got == rank
        # mass sanity: connected nodes outrank isolated ones
        isolated = [n for n in nodes if not adj[n]]
        if isolated:
            assert all(got[n] == 150_000 for n in isolated)


class TestLinearTrend:
    def test_matches_numpy_lstsq(self, spark):
        import numpy as np

        from aristoteles_spark.queries.analytics import (
            T0_EPOCH_S,
            q_linear_trend,
        )

        rows = q_linear_trend(spark, SF).collect()
        ev = (
            spark.read.parquet(f"{SF}/events.parquet")
            .where("value IS NOT NULL")
            .collect()
        )
        by_type = defaultdict(list)
        for r in ev:
            x = int(r.ts.timestamp()) - T0_EPOCH_S
            by_type[r.event_type].append((x, round(r.value * 100)))
        for r in rows:
            pts = by_type[r.event_type]
            xs = np.array([p[0] for p in pts], dtype=float)
            ys = np.array([p[1] for p in pts], dtype=float)
            slope, icept = np.polyfit(xs, ys, 1)
            assert r.n == len(pts)
            assert abs(r.slope - slope) < 1e-9 * max(1, abs(slope))
            assert abs(r.intercept - icept) < 1e-6 * max(1, abs(icept))


class TestBloomDecontamination:
    def test_two_phase_equals_exact_single_phase(self, spark):
        """Bloom prefilter + exact verify must reproduce ct1's exact
        per-doc shared-gram counts (no false negatives), and bloom
        candidates always dominate the exact counts."""
        from aristoteles_spark.queries.text import (
            q_bloom_decontamination,
            q_contamination,
        )

        two_phase = {
            r.doc_id: (r.n_candidates, r.n_shared_grams)
            for r in q_bloom_decontamination(spark, SF).collect()
        }
        exact = {
            r.doc_id: r.n_shared_grams
            for r in q_contamination(spark, SF).collect()
        }
        for doc, n in exact.items():
            assert two_phase[doc][1] == n  # verify phase is exact
        for doc, (cand, shared) in two_phase.items():
            assert cand >= shared
            assert shared == exact.get(doc, 0)
