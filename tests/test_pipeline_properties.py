"""Independent brute-force verification of the batch-4 pipeline operators.

The DuckDB oracles mirror each query's *algorithm* (same candidates, same
bands). These tests re-derive the ANSWERS from first principles in plain
Python at sf0.001 — all pairs, no candidate pruning, no sweep partitioning —
so they additionally prove the pruning/partitioning claims:

- q211's rare-shingle candidates find EVERY containment pair >= 0.9
  (brute force scans all O(n²) pairs; the operator must miss none).
- q207/q210's day/hour-partitioned two-level sweeps equal a single global
  Python sweep line.
- q215's grouped rank-sum AUC equals the naive pairwise definition
  P(score_pos > score_neg) + ½·P(tie).
"""

from __future__ import annotations

import hashlib
import os
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from kinesis_writer_spark import io as kio
from kinesis_writer_spark.registry import all_queries

SF_SMALL = "/root/testdata/sf0.001"
#: The one test that needs a fixture large enough to discriminate the
#: PPJoin candidate cut (sf0.001/sf0.01 measure 1.0x); hosts without it
#: skip rather than error.
SF_CUT = "/root/testdata/sf0.1"

_GAP_US = 30 * 60 * 1_000_000
_HOUR_US = 3_600 * 1_000_000
_DAY_US = 24 * _HOUR_US


def _md5_60bit(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _sessions(events):
    """Python reference sessionizer: (user, [(start_us, end_us), ...])."""
    per_user = defaultdict(list)
    for r in events:
        per_user[r["user_id"]].append((r["us"], r["event_id"]))
    out = []
    for user, evts in per_user.items():
        evts.sort()
        start = prev = None
        for us, _eid in evts:
            if prev is None or us - prev > _GAP_US:
                if start is not None:
                    out.append((start, prev))
                start = us
            prev = us
        out.append((start, prev))
    return out


class TestSweepLineBruteForce:
    def _events(self, spark):
        return [
            r.asDict()
            for r in kio.load(spark, SF_SMALL, "events")
            .select("user_id", "event_id", F.unix_micros("ts").alias("us"))
            .collect()
        ]

    def test_q207_peaks_match_global_python_sweep(self, spark):
        got = {
            r["hour_idx"]: r["peak_concurrency"]
            for r in all_queries()["q207_concurrency_peak"](spark, SF_SMALL).collect()
        }
        deltas = []
        for s, e in _sessions(self._events(spark)):
            deltas.append((s, 1))
            deltas.append((e, -1))
        deltas.sort()  # (us, delta): -1 sorts before +1 at the same instant
        live = 0
        peak = defaultdict(int)
        for us, d in deltas:
            live += d
            h = us // _HOUR_US
            peak[h] = max(peak[h], live)
        # hours with only negative running contributions still appear in the
        # query output (they have deltas); compare on the query's key set
        assert set(got) == set(peak)
        for h in got:
            assert got[h] == peak[h], f"hour {h}: {got[h]} != {peak[h]}"

    def test_q210_coverage_matches_global_python_sweep(self, spark):
        got = {
            r["dayno"]: r["covered_us"]
            for r in all_queries()["q210_daily_coverage"](spark, SF_SMALL).collect()
        }
        deltas = []
        for s, e in _sessions(self._events(spark)):
            deltas.append((s, 1))
            deltas.append((e, -1))
        deltas.sort()
        covered = defaultdict(int)
        live = 0
        prev = None
        for us, d in deltas:
            if prev is not None and live > 0:
                lo = prev
                while lo < us:  # attribute the live segment day by day
                    day_end = (lo // _DAY_US + 1) * _DAY_US
                    hi = min(us, day_end)
                    covered[lo // _DAY_US] += hi - lo
                    lo = hi
            live += d
            prev = us
        for day, c in covered.items():
            assert got.get(day, 0) == c, f"day {day}: {got.get(day)} != {c}"
        # days in the query but not in covered must be zero-coverage days
        for day in set(got) - set(covered):
            assert got[day] == 0


class TestContainmentBruteForce:
    def test_q211_rare_shingle_candidates_are_complete(self, spark):
        """All-pairs brute force finds no containment pair the operator
        missed — the df-capped candidate join loses nothing on this data."""
        rows = all_queries()["q211_containment_pairs"](spark, SF_SMALL).collect()
        got = {(r["contained_id"], r["container_id"]): r["containment_ppm"] for r in rows}

        docs = kio.load(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
        shingles = {}
        for r in docs:
            ws = r["text"].split(" ")
            shingles[r["doc_id"]] = {
                _md5_60bit(" ".join(ws[i : i + 5])) for i in range(len(ws) - 4)
            }
        expected = {}
        ids = sorted(shingles)
        for i, a in enumerate(ids):
            sa = shingles[a]
            if not sa:
                continue
            for b in ids[i + 1 :]:
                sb = shingles[b]
                if not sb:
                    continue
                inter = len(sa & sb)
                small = min(len(sa), len(sb))
                if inter * 10 >= small * 9:
                    pair = (a, b) if len(sa) <= len(sb) else (b, a)
                    expected[pair] = inter * 1_000_000 // small
        assert got == expected


class TestAucBruteForce:
    def test_q215_equals_pairwise_definition(self, spark):
        from kinesis_writer_spark.operators.similarity import _LM_W

        row = all_queries()["q215_auc_rank"](spark, SF_SMALL).collect()[0]

        import math

        emb = kio.load(spark, SF_SMALL, "embeddings").collect()
        pos_scores, neg_scores = [], []
        for r in emb:
            q = [math.floor(float(x) * 1000) for x in r["embedding"]]
            score = sum(a * w for a, w in zip(q, _LM_W))
            (pos_scores if r["label"] % 2 == 1 else neg_scores).append(score)
        wins = ties = 0
        for p in pos_scores:
            for n in neg_scores:
                if p > n:
                    wins += 1
                elif p == n:
                    ties += 1
        n_pos, n_neg = len(pos_scores), len(neg_scores)
        assert row["n_pos"] == n_pos and row["n_neg"] == n_neg
        expected_ppm = (2 * wins + ties) * 1_000_000 // (2 * n_pos * n_neg)
        assert row["auc_ppm"] == expected_ppm


class TestPerceptronBruteForce:
    def test_q222_trajectory_matches_python(self, spark):
        import math

        rows = {
            r["epoch"]: r
            for r in all_queries()["q222_perceptron_train"](spark, SF_SMALL).collect()
        }
        emb = kio.load(spark, SF_SMALL, "embeddings").collect()
        data = [
            (
                1 if r["label"] % 2 == 1 else -1,
                [math.floor(float(x) * 1000) for x in r["embedding"]],
            )
            for r in emb
        ]
        w = [0] * 64
        for epoch in (1, 2):
            errs = [(y, x) for y, x in data if y * sum(a * b for a, b in zip(x, w)) <= 0]
            assert rows[epoch]["n_errors"] == len(errs)
            assert rows[epoch]["w_checksum"] == sum((d + 1) * v for d, v in enumerate(w))
            for y, x in errs:
                w = [wv + y * xv for wv, xv in zip(w, x)]
        final_errs = sum(
            1 for y, x in data if y * sum(a * b for a, b in zip(x, w)) <= 0
        )
        assert rows[3]["n_errors"] == final_errs
        assert rows[3]["w_checksum"] == sum((d + 1) * v for d, v in enumerate(w))


class TestKsBruteForce:
    def test_q224_matches_direct_cdf_scan(self, spark):
        row = all_queries()["q224_ks_statistic"](spark, SF_SMALL).collect()[0]
        ev = (
            kio.load(spark, SF_SMALL, "events")
            .filter(F.col("event_type").isin("click", "view"))
            .select("event_type", F.round(F.col("value") * 100).cast("bigint").alias("c"))
            .collect()
        )
        a = sorted(r["c"] for r in ev if r["event_type"] == "click")
        b = sorted(r["c"] for r in ev if r["event_type"] == "view")
        na, nb = len(a), len(b)
        best, best_at = -1, None
        for v in sorted(set(a) | set(b)):
            ca = sum(1 for x in a if x <= v)
            cb = sum(1 for x in b if x <= v)
            d = abs(ca * nb - cb * na)
            if d > best:
                best, best_at = d, v
        assert row["na"] == na and row["nb"] == nb
        assert row["ks_ppm"] == best * 1_000_000 // (na * nb)
        assert row["ks_at_cents"] == best_at


class TestPrefixFilterBruteForce:
    def test_q193_equals_all_pairs_jaccard(self, spark):
        """The PPJoin prefix filter claims EXACTNESS (no false negatives at
        the threshold) — the mirrored oracle can't prove that because it
        prunes the same way. All-pairs Python can."""
        rows = all_queries()["q193_prefix_filter_join"](spark, SF_SMALL).collect()
        got = {(r["doc_a"], r["doc_b"]): r["jacc_ppm"] for r in rows}

        docs = kio.load(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
        sh = {}
        for r in docs:
            ws = r["text"].split(" ")
            sh[r["doc_id"]] = {
                _md5_60bit(" ".join(ws[i : i + 3])) for i in range(len(ws) - 2)
            }
        expected = {}
        ids = sorted(sh)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                inter = len(sh[a] & sh[b])
                uni = len(sh[a]) + len(sh[b]) - inter
                if uni and inter * 5 >= uni * 4:  # Jaccard >= 0.8
                    expected[(a, b)] = inter * 1_000_000 // uni
        assert got == expected

    def test_q193_ppjoin_filters_stay_in_the_plan(self, spark):
        """The PPJoin length + positional filters live in the candidate
        join's ON condition; a refactor that dropped them would stay
        oracle-green (they're exact) and only resurface as an sf100
        ENOSPC (r10: unfiltered candidates demanded >65 GB scratch).
        Pin their presence structurally: the optimized candidate plan
        must carry the least/greatest filter expressions, and the
        filtered candidate set must be strictly smaller than the
        unfiltered prefix join on the same fixture."""
        from kinesis_writer_spark.operators.scale_ops import q193_stages

        _, cand = q193_stages(spark, SF_SMALL, ppjoin_filters=True)
        plan = cand._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "least" in plan and "greatest" in plan, plan[:2000]

    @pytest.mark.skipif(
        not os.path.isdir(SF_CUT), reason=f"{SF_CUT} fixture not present"
    )
    def test_q193_candidate_cut_pinned_at_sf01(self, spark):
        """r10 verdict task #5: pin the measured candidate cut so scratch
        blow-up can't regress silently. At sf0.1 the PPJoin filters cut
        raw prefix co-occurrence 118 806 -> 12 806 (9.3x, SCALE.md);
        assert the filtered count stays within 2x of the pinned figure
        and the cut stays >= 4x. (sf0.01 is too small to discriminate —
        measured cut there is 1.0x — so this one test runs at sf0.1,
        ~15 s.)"""
        from kinesis_writer_spark.operators.scale_ops import q193_stages

        _, cand = q193_stages(spark, SF_CUT, ppjoin_filters=True)
        _, raw = q193_stages(spark, SF_CUT, ppjoin_filters=False)
        n_filtered, n_raw = cand.count(), raw.count()
        assert n_filtered <= 2 * 12_806, n_filtered
        assert n_raw >= 4 * n_filtered, (n_raw, n_filtered)


class TestTriangleBruteForce:
    def test_q199_equals_adjacency_enumeration(self, spark):
        rows = all_queries()["q199_triangle_count"](spark, SF_SMALL).collect()
        got = {r[0]: r[1] for r in (tuple(r) for r in rows)}

        li = (
            kio.load(spark, SF_SMALL, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
            .collect()
        )
        from collections import defaultdict as dd

        orders = dd(set)
        for r in li:
            orders[r["l_orderkey"]].add(r["l_partkey"])
        weight = dd(int)
        for parts in orders.values():
            ps = sorted(parts)
            for i, a in enumerate(ps):
                for b in ps[i + 1 :]:
                    weight[(a, b)] += 1
        edges = {e for e, w in weight.items() if w >= 2}
        adj = dd(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        tri = dd(int)
        for a, b in edges:
            for c in adj[a] & adj[b]:
                if c > b:  # a < b < c orientation counts each once
                    tri[a] += 1
                    tri[b] += 1
                    tri[c] += 1
        assert got == dict(tri)


class TestWalkBruteForce:
    def test_q219_equals_python_argmin_walks(self, spark):
        rows = all_queries()["q219_random_walks"](spark, SF_SMALL).collect()
        got = {r["v0"]: (r["v1"], r["v2"], r["v3"], r["walk_len"]) for r in rows}

        li = (
            kio.load(spark, SF_SMALL, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
            .collect()
        )
        from collections import defaultdict as dd

        orders = dd(set)
        for r in li:
            orders[r["l_orderkey"]].add(r["l_partkey"])
        weight = dd(int)
        for parts in orders.values():
            ps = sorted(parts)
            for i, a in enumerate(ps):
                for b in ps[i + 1 :]:
                    weight[(a, b)] += 1
        adj = dd(list)
        for (a, b), w in weight.items():
            if w >= 2:
                adj[a].append(b)
                adj[b].append(a)

        def step(s, v):
            if v is None or v not in adj:
                return None
            return min(adj[v], key=lambda n: _md5_60bit(f"walk{s}#{v}#{n}"))

        expected = {}
        for v0 in adj:
            v1 = step(1, v0)
            v2 = step(2, v1)
            v3 = step(3, v2)
            ln = 3 if v3 is not None else 2 if v2 is not None else 1 if v1 is not None else 0
            expected[v0] = (v1, v2, v3, ln)
        assert got == expected
