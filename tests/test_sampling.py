"""Deterministic sampling operators: reproducibility, split stability under
corpus growth (the train/eval-leakage guarantee), per-stratum bounds, and
the WindowGroupLimit plan shape that keeps stratified sampling skew-safe."""

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.operators.sampling import (
    hash_sample,
    hash_split,
    stratified_sample,
)


def _docs(spark, n=400):
    rows = [(i, f"text {i}", ["en", "de", "fr"][i % 3], f"src{i % 4}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_hash_sample_deterministic_and_calibrated(spark):
    df = _docs(spark)
    a = set(r.doc_id for r in hash_sample(df, "doc_id", 0.3).collect())
    b = set(r.doc_id for r in hash_sample(df, "doc_id", 0.3).collect())
    assert a == b  # same draw every run
    # calibration: 400 draws at p=0.3 land well inside [0.15, 0.45]
    assert 0.15 * 400 < len(a) < 0.45 * 400
    # a different salt is an independent draw, not a subset
    c = set(r.doc_id for r in hash_sample(df, "doc_id", 0.3, salt="v2").collect())
    assert c != a and c - a and a - c


def test_hash_split_disjoint_exhaustive_and_growth_stable(spark):
    df = _docs(spark)
    out = hash_split(df, "doc_id").select("doc_id", "split").toPandas()
    assert len(out) == 400  # every row assigned exactly once
    counts = out["split"].value_counts()
    assert set(counts.index) <= {"train", "eval", "test"}
    assert counts["train"] > 0.8 * 400  # ~90%
    # THE guarantee: membership is a pure function of the key — computing
    # splits on half the corpus agrees with the full corpus on shared keys
    half = hash_split(df.where(F.col("doc_id") < 200), "doc_id").select(
        "doc_id", "split"
    ).toPandas()
    merged = half.merge(out, on="doc_id", suffixes=("_half", "_full"))
    assert (merged["split_half"] == merged["split_full"]).all()


def test_hash_split_fractions_must_sum_to_one(spark):
    import pytest

    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(_docs(spark), "doc_id", splits=(("a", 0.5), ("b", 0.2)))


def test_stratified_sample_bounds_and_determinism(spark):
    df = _docs(spark)  # 12 strata (3 langs x 4 sources), ~33 docs each
    out = stratified_sample(df, ("lang", "source"), k=3, key_col="doc_id").toPandas()
    per = out.groupby(["lang", "source"]).size()
    assert (per <= 3).all() and len(per) == 12
    assert set(out["rk"]) == {1, 2, 3}
    out2 = stratified_sample(df, ("lang", "source"), k=3, key_col="doc_id").toPandas()
    assert out.sort_values(["lang", "source", "rk"]).reset_index(drop=True).equals(
        out2.sort_values(["lang", "source", "rk"]).reset_index(drop=True)
    )


def test_stratified_sample_plan_has_group_limit_pushdown(spark):
    """Skew safety: the rank<=k bound must push into a WindowGroupLimit so
    the shuffle carries at most k rows per stratum per map task — a
    billion-row stratum costs its winners, not its population."""
    df = _docs(spark)
    out = stratified_sample(df, ("lang", "source"), k=3, key_col="doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_hash_fraction_thresholds_round_not_truncate(spark):
    """ADVICE r4: fractions not exactly representable in binary (0.29 →
    int(289999.999…) = 289999 under truncation) must round to the exact
    requested threshold so arbitrary fractions match a round()-based oracle."""
    from oplogtoredis_spark.operators.sampling import hash_sample, hash_split

    df = spark.range(4).withColumnRenamed("id", "k")
    plan = hash_sample(df, "k", 0.29)._jdf.queryExecution().analyzed().toString()
    assert "290000" in plan and "289999" not in plan
    plan2 = (
        hash_split(df, "k", splits=(("a", 0.29), ("b", 0.71)))
        ._jdf.queryExecution().analyzed().toString()
    )
    assert "290000" in plan2 and "289999" not in plan2


class TestWeightedSample:
    def _df(self, spark):
        rows = [(i, "s" if i % 2 else "t", float((i % 7) + 1)) for i in range(60)]
        return spark.createDataFrame(rows, "id long, g string, w double")

    def test_bounded_and_deterministic_under_repartition(self, spark):
        from oplogtoredis_spark.operators.sampling import weighted_sample

        df = self._df(spark)
        a = sorted(
            (r.g, r.id, r.rk)
            for r in weighted_sample(df.coalesce(1), "id", "w", 5, ("g",)).collect()
        )
        b = sorted(
            (r.g, r.id, r.rk)
            for r in weighted_sample(df.repartition(8), "id", "w", 5, ("g",)).collect()
        )
        assert a == b
        from collections import Counter

        per_g = Counter(g for g, _, _ in a)
        assert per_g == {"s": 5, "t": 5}

    def test_nonpositive_and_null_weights_excluded(self, spark):
        from oplogtoredis_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame(
            [(1, 1.0), (2, 0.0), (3, -4.0), (4, None), (5, 2.0)],
            "id long, w double",
        )
        got = {r.id for r in weighted_sample(df, "id", "w", 10).collect()}
        assert got == {1, 5}

    def test_inclusion_tracks_weight(self, spark):
        """k=1 draws across 40 salts: the item holding ~83% of the total
        mass must win the clear majority (fully deterministic given the
        salts — no flakiness)."""
        from oplogtoredis_spark.operators.sampling import weighted_sample

        rows = [(0, 1000.0)] + [(i, 1.0) for i in range(1, 200)]
        df = spark.createDataFrame(rows, "id long, w double")
        wins = sum(
            weighted_sample(df, "id", "w", 1, salt=f"s{j}").collect()[0].id == 0
            for j in range(40)
        )
        assert wins >= 25, wins

    def test_matches_python_reference(self, spark):
        """Exact parity with a pure-Python A-ES using the same hash draw."""
        import math

        from oplogtoredis_spark.functions.hashing import portable_hash64
        from oplogtoredis_spark.operators.sampling import weighted_sample

        df = self._df(spark)
        # pull the engine's own portable hash values, then rank in python
        hs = {
            r.id: r.h
            for r in df.select(
                "id",
                (portable_hash64(
                    F.concat(F.col("id").cast("string"), F.lit(""))
                ) % 1000000).alias("h"),
            ).collect()
        }
        rows = df.collect()
        want = {}
        for g in ("s", "t"):
            scored = sorted(
                (
                    (-(math.log((hs[r.id] + 1) / 1000001.0) / r.w), r.id)
                    for r in rows
                    if r.g == g
                ),
            )
            want[g] = [i for _, i in scored[:5]]
        got = {}
        for r in weighted_sample(df, "id", "w", 5, ("g",)).collect():
            got.setdefault(r.g, []).append((r.rk, r.id))
        got = {g: [i for _, i in sorted(v)] for g, v in got.items()}
        assert got == want

    def test_k_guard(self, spark):
        from oplogtoredis_spark.operators.sampling import weighted_sample

        with pytest.raises(ValueError, match="k must be"):
            weighted_sample(self._df(spark), "id", "w", 0)


def _py_draw(key, salt=""):
    """Pure-Python mirror of _sample_hash (the portable hash mod 1e6)."""
    import hashlib

    return int(
        hashlib.sha256(f"{key}{salt}".encode()).hexdigest()[:15], 16
    ) % 1_000_000


def _py_copies(key, rate, salt=""):
    import math

    base = math.floor(rate)
    return int(base) + (1 if _py_draw(key, salt) < (rate - base) * 1e6 else 0)


class TestResampleRate:
    def test_matches_python_reference(self, spark):
        """Exact multiplicity parity with the pure-Python floor+indicator
        model across down-, unit-, and up-sampling rates; copy indices are
        0..copies-1."""
        from collections import Counter

        from oplogtoredis_spark.operators.sampling import resample_rate

        rates = {0: 0.0, 1: 0.4, 2: 1.0, 3: 2.3, 4: 3.0, 5: 0.999999}
        df = spark.createDataFrame(
            [(i, r) for i, r in rates.items()], "id long, rate double"
        )
        got = resample_rate(df, "id", "rate").collect()
        mult = Counter(r.id for r in got)
        want = {i: _py_copies(i, r) for i, r in rates.items()}
        assert mult == {i: c for i, c in want.items() if c >= 1}
        for i, c in want.items():
            copies = sorted(r.copy for r in got if r.id == i)
            assert copies == list(range(c))
        # rate exactly 1.0 / 3.0: fractional part 0 -> never an extra copy
        assert mult[2] == 1 and mult[4] == 3

    def test_no_phantom_copies_at_rate_zero(self, spark):
        """Pinned footgun: Spark's two-arg sequence() infers step -1 when
        start > stop, so an unfiltered sequence(0, copies-1) at copies=0
        would emit [0, -1] — two phantom rows. Rows at rate 0 (and NULL
        or negative rates) must emit NOTHING."""
        from oplogtoredis_spark.operators.sampling import resample_rate

        df = spark.createDataFrame(
            [(1, 0.0), (2, None), (3, -2.5), (4, 1.0)], "id long, rate double"
        )
        got = [(r.id, r.copy) for r in resample_rate(df, "id", "rate").collect()]
        assert got == [(4, 0)]

    def test_rate_guard_fails_loud(self, spark):
        from oplogtoredis_spark.operators.sampling import resample_rate

        df = spark.createDataFrame([(1, 5000.0)], "id long, rate double")
        with pytest.raises(Exception, match="max_rate"):
            resample_rate(df, "id", "rate").collect()
        # and the knob raises the ceiling
        out = resample_rate(df, "id", "rate", max_rate=10000.0)
        assert out.count() == 5000

    def test_map_only_plan(self, spark):
        """100 TB shape: filter + explode live in the scan stage — no
        Exchange anywhere in the plan."""
        from oplogtoredis_spark.operators.sampling import resample_rate

        df = spark.range(100).select(
            F.col("id"), (F.lit(1.5)).alias("rate")
        )
        plan = (
            resample_rate(df, "id", "rate")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestMixtureResample:
    def _corpus(self, spark):
        # 3 domains with very different masses: web 300 docs x ~100 chars,
        # books 30 x ~1000, code 60 x ~200  (plus an unlisted 'junk')
        rows = []
        for i in range(300):
            rows.append((i, "web", 100 + i % 7))
        for i in range(300, 330):
            rows.append((i, "books", 1000 + i % 13))
        for i in range(330, 390):
            rows.append((i, "code", 200 + i % 11))
        for i in range(390, 410):
            rows.append((i, "junk", 50))
        return spark.createDataFrame(rows, "id long, dom string, n long")

    W = {"web": 0.5, "books": 0.3, "code": 0.2}

    def test_matches_python_reference_and_proportions(self, spark):
        """Exact multiplicity parity with a pure-Python model that derives
        the rates the same way (integer masses, one double expression), and
        the emitted mass shares land near the target weights."""
        from collections import Counter

        from oplogtoredis_spark.operators.sampling import mixture_resample

        df = self._corpus(spark)
        rows = [(r.id, r.dom, r.n) for r in df.collect()]
        mass = Counter()
        for _i, d, n in rows:
            if d in self.W:
                mass[d] += n
        t = sum(mass.values())
        rate = {d: (1.0 * w) * float(t) / float(mass[d]) for d, w in self.W.items()}
        want = {
            i: _py_copies(i, rate[d]) for i, d, _n in rows if d in self.W
        }
        got = mixture_resample(
            df, "dom", self.W, key_col="id", size_col="n"
        ).collect()
        mult = Counter(r.id for r in got)
        assert mult == {i: c for i, c in want.items() if c >= 1}
        # no unlisted-domain rows survive
        assert all(r.dom != "junk" for r in got)
        # emitted mass shares ≈ targets (law of large numbers at 390 docs)
        out_mass = Counter()
        for r in got:
            out_mass[r.dom] += r.n
        out_t = sum(out_mass.values())
        for d, w in self.W.items():
            assert abs(out_mass[d] / out_t - w) < 0.05, (d, out_mass)

    def test_count_mass_when_no_size_col(self, spark):
        from collections import Counter

        from oplogtoredis_spark.operators.sampling import mixture_resample

        df = self._corpus(spark)
        got = mixture_resample(df, "dom", self.W, key_col="id").collect()
        cnt = Counter(r.dom for r in got)
        total = sum(cnt.values())
        for d, w in self.W.items():
            assert abs(cnt[d] / total - w) < 0.06, (d, cnt)

    def test_weight_validation(self, spark):
        from oplogtoredis_spark.operators.sampling import mixture_resample

        df = self._corpus(spark)
        with pytest.raises(ValueError, match="sum to 1"):
            mixture_resample(df, "dom", {"web": 0.5}, key_col="id")
        with pytest.raises(ValueError, match="positive"):
            mixture_resample(
                df, "dom", {"web": 1.5, "books": -0.5}, key_col="id"
            )
        with pytest.raises(ValueError, match="non-empty"):
            mixture_resample(df, "dom", {}, key_col="id")

    def test_internal_name_collisions_rejected(self, spark):
        from oplogtoredis_spark.operators.sampling import (
            mixture_resample,
            resample_rate,
        )

        df = self._corpus(spark).withColumn("copy", F.lit(1))
        with pytest.raises(ValueError, match="collides"):
            mixture_resample(df, "dom", self.W, key_col="id")
        df2 = spark.createDataFrame([(1, 1.0, 0)], "id long, rate double, _copies int")
        with pytest.raises(ValueError, match="collides"):
            resample_rate(df2, "id", "rate")

    def test_rates_broadcast_not_shuffled(self, spark):
        """The corpus must never shuffle for the rate join: the
        dimension-sized rates frame broadcasts. The only Exchange in the
        plan is the stats aggregation's."""
        from oplogtoredis_spark.operators.sampling import mixture_resample

        out = mixture_resample(
            self._corpus(spark), "dom", self.W, key_col="id", size_col="n"
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
