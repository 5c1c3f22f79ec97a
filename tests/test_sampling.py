"""Deterministic token-budget sampling (operators/sampling.py)."""

import hashlib

from pyspark.sql import functions as F

from ocr_spark.operators import sampling
from ocr_spark.operators.textstats import token_count


def _corpus(spark, n=60):
    rows = [(i, " ".join(
        hashlib.md5(f"tb{i}:{j}".encode()).hexdigest()[:6]
        for j in range(1 + i % 7))) for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _global_rule(spark, df, budget, salt=0, mode="md5"):
    """The one-window global definition the bucketed path must match."""
    rows = df.select(
        "doc_id",
        token_count(F.col("text")).alias("n")).collect()
    def key(r):
        s = f"{r['doc_id']}#{salt}".encode()
        return hashlib.md5(s).hexdigest()
    ordered = sorted(rows, key=lambda r: (key(r), r["doc_id"]))
    kept, before = set(), 0
    for r in ordered:
        if before < budget:
            kept.add(r["doc_id"])
        before += r["n"]
    return kept


class TestTokenBudgetSample:
    def test_matches_global_definition(self, spark):
        df = _corpus(spark)
        total = df.select(F.sum(token_count(F.col("text")))).first()[0]
        for budget in (0, 1, 7, 40, total // 3, total - 1, total, total + 5):
            got = {r["doc_id"] for r in sampling.token_budget_sample(
                df, budget, hash_mode="md5").collect()}
            want = _global_rule(spark, df, budget)
            assert got == want, budget

    def test_deterministic_and_salted(self, spark):
        df = _corpus(spark)
        a = {r["doc_id"] for r in
             sampling.token_budget_sample(df, 50).collect()}
        b = {r["doc_id"] for r in
             sampling.token_budget_sample(df, 50).collect()}
        assert a == b
        c = {r["doc_id"] for r in
             sampling.token_budget_sample(df, 50, salt=1).collect()}
        assert a != c  # a different salt draws a different sample

    def test_monotone_in_budget(self, spark):
        df = _corpus(spark)
        small = {r["doc_id"] for r in
                 sampling.token_budget_sample(df, 30).collect()}
        big = {r["doc_id"] for r in
               sampling.token_budget_sample(df, 90).collect()}
        assert small <= big and len(small) < len(big)

    def test_report_and_overshoot_bound(self, spark):
        df = _corpus(spark)
        budget = 55
        out, report = sampling.token_budget_sample(
            df, budget, return_report=True)
        r = report.collect()[0]
        assert r["kept_docs"] == out.count()
        # The sample crosses the budget by at most one document
        # (max doc here is 7 tokens) and never stops short while
        # documents remain.
        assert budget <= r["kept_tokens"] < budget + 7
        assert r["total_docs"] == 60

    def test_schema_preserved(self, spark):
        df = _corpus(spark).withColumn("meta", F.lit("m"))
        out = sampling.token_budget_sample(df, 20)
        assert set(out.columns) == {"doc_id", "text", "meta"}

    def test_zero_and_full_budget(self, spark):
        df = _corpus(spark)
        assert sampling.token_budget_sample(df, 0).count() == 0
        assert sampling.token_budget_sample(df, 10**9).count() == 60


def _global_shards(df, per_shard, salt=0):
    """The global-window shard definition the bucketed path must
    match: shard = floor(preceding token mass / per_shard)."""
    rows = df.select(
        "doc_id", token_count(F.col("text")).alias("n")).collect()

    def key(r):
        return hashlib.md5(f"{r['doc_id']}#{salt}".encode()).hexdigest()

    ordered = sorted(rows, key=lambda r: (key(r), r["doc_id"]))
    out, before = {}, 0
    for r in ordered:
        out[r["doc_id"]] = before // per_shard
        before += r["n"]
    return out


class TestTokenShards:
    def test_matches_global_definition(self, spark):
        df = _corpus(spark)
        for per_shard in (1, 7, 40, 10_000):
            got = {r["doc_id"]: r["shard"]
                   for r in sampling.token_shards(
                       df, per_shard, hash_mode="md5").collect()}
            assert got == _global_shards(df, per_shard), per_shard

    def test_partitioning_invariance(self, spark):
        """Assignment is a pure function of (corpus, salt, S) — the
        input's physical partitioning must not change any shard."""
        df = _corpus(spark, n=80)
        a = {r["doc_id"]: r["shard"] for r in sampling.token_shards(
            df.repartition(1), 37, hash_mode="md5").collect()}
        b = {r["doc_id"]: r["shard"] for r in sampling.token_shards(
            df.repartition(16, "text"), 37, hash_mode="md5").collect()}
        assert a == b

    def test_manifest_accounts_every_token(self, spark):
        df = _corpus(spark)
        assigned, manifest = sampling.token_shards(
            df, 50, return_manifest=True)
        m = manifest.collect()
        total = df.select(F.sum(token_count(F.col("text")))).first()[0]
        assert sum(r["tokens"] for r in m) == total
        assert sum(r["docs"] for r in m) == df.count()
        # Contiguous shard ids from 0; every shard except possibly the
        # last crosses its budget only via its final document.
        ids = [r["shard"] for r in m]
        assert ids == list(range(len(ids)))
        # A shard's preceding mass is k*S by construction, so every
        # non-final shard holds >= S - (max doc tokens - 1) tokens.
        assert all(r["tokens"] > 0 for r in m)

    def test_write_round_trip(self, spark, tmp_path):
        df = _corpus(spark, n=40)
        out = str(tmp_path / "shards")
        sampling.write_token_shards(df, out, 60, hash_mode="md5")
        back = spark.read.parquet(f"{out}/shards")
        assert back.count() == 40
        assert "shard" in back.columns  # partition column round-trips
        man = spark.read.parquet(f"{out}/_manifest")
        assert man.count() == back.select("shard").distinct().count()

    def test_rejects_nonpositive_budget(self, spark):
        import pytest as _pt
        with _pt.raises(ValueError):
            sampling.token_shards(_corpus(spark, 3), 0)


def _mix_corpus(spark, n=90):
    rows = [(i, ["en", "de", "fr"][i % 3], " ".join(
        hashlib.md5(f"mx{i}:{j}".encode()).hexdigest()[:6]
        for j in range(1 + i % 7))) for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def _global_mix_rule(spark, df, weights, budget, salt=0):
    """Per-group global-window definition mixture_sample must match."""
    total_w = sum(weights.values())
    kept = set()
    for g, wgt in weights.items():
        sub = df.filter(F.col("lang") == g)
        kept |= _global_rule(spark, sub, int(budget * wgt / total_w),
                             salt=salt)
    return kept


class TestMixtureSample:
    def test_matches_per_group_global_rule(self, spark):
        df = _mix_corpus(spark)
        weights = {"en": 2.0, "de": 1.0}
        out, rep = sampling.mixture_sample(
            df, weights, 120, hash_mode="md5", return_report=True)
        got = {r["doc_id"] for r in out.select("doc_id").collect()}
        assert got == _global_mix_rule(spark, df, weights, 120)
        # fr absent from weights -> dropped entirely
        assert not out.filter(F.col("lang") == "fr").count()
        r = {x["lang"]: x for x in rep.collect()}
        assert r["en"]["budget_tokens"] == 80
        assert r["de"]["budget_tokens"] == 40
        # the at-most-one-doc overshoot contract per group
        for g in weights:
            assert r[g]["kept_tokens"] >= r[g]["budget_tokens"]
            assert r[g]["kept_docs"] <= r[g]["total_docs"]

    def test_small_group_kept_whole_never_backfilled(self, spark):
        df = _mix_corpus(spark)
        # de's whole mass is far below its share of a giant budget
        out, rep = sampling.mixture_sample(
            df, {"en": 1.0, "de": 1.0}, 10**9, hash_mode="md5",
            return_report=True)
        r = {x["lang"]: x for x in rep.collect()}
        assert r["de"]["kept_docs"] == r["de"]["total_docs"]
        assert r["en"]["kept_docs"] == r["en"]["total_docs"]

    def test_zero_weight_group_keeps_nothing(self, spark):
        df = _mix_corpus(spark)
        out = sampling.mixture_sample(df, {"en": 1.0, "de": 0.0}, 100,
                                      hash_mode="md5")
        assert out.filter(F.col("lang") == "de").count() == 0
        assert out.filter(F.col("lang") == "en").count() > 0

    def test_deterministic_and_salt_sensitive(self, spark):
        df = _mix_corpus(spark)
        w = {"en": 1.0, "fr": 2.0}
        a = {r["doc_id"] for r in sampling.mixture_sample(
            df, w, 150, hash_mode="md5").collect()}
        b = {r["doc_id"] for r in sampling.mixture_sample(
            df, w, 150, hash_mode="md5").collect()}
        c = {r["doc_id"] for r in sampling.mixture_sample(
            df, w, 150, salt=7, hash_mode="md5").collect()}
        assert a == b
        assert a != c

    def test_xxhash_mode_runs(self, spark):
        df = _mix_corpus(spark, 30)
        out, rep = sampling.mixture_sample(
            df, {"en": 1.0}, 50, return_report=True)
        assert out.count() == rep.first()["kept_docs"]

    def test_bad_weights_rejected(self, spark):
        df = _mix_corpus(spark, 6)
        import pytest as _pt
        with _pt.raises(ValueError):
            sampling.mixture_sample(df, {}, 10)
        with _pt.raises(ValueError):
            sampling.mixture_sample(df, {"en": -1.0, "de": 2.0}, 10)
        with _pt.raises(ValueError):
            sampling.mixture_sample(df, {"en": 0.0}, 10)


def test_mixture_report_keeps_group_dtype(spark):
    rows = [(i, i % 2, "w " * (1 + i % 3)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, grp int, text string")
    out, rep = sampling.mixture_sample(
        df, {0: 1.0, 1: 1.0}, 20, group_col="grp", hash_mode="md5",
        return_report=True)
    assert dict(rep.dtypes)["grp"] == "int"
    assert {r["grp"] for r in rep.collect()} == {0, 1}
