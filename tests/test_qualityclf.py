"""Model-based quality classifier (operators/qualityclf.py):
closed-form Naive Bayes train + broadcast-join scoring, the
DCLM/FineWeb-style learned quality signal."""

import math

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators import qualityclf


def _df(spark, rows, cols=("doc_id", "text")):
    return spark.createDataFrame(rows, list(cols))


class TestTokens:
    def test_normalized_with_multiplicity(self, spark):
        df = _df(spark, [(0, "  The  THE the\tdog ")])
        [r] = df.select(qualityclf.word_tokens(F.col("text"))
                        .alias("t")).collect()
        assert r["t"] == ["the", "the", "the", "dog"]

    def test_empty_and_null(self, spark):
        df = _df(spark, [(0, ""), (1, "   "), (2, None)])
        rows = df.select(qualityclf.word_tokens(F.col("text"))
                         .alias("t")).collect()
        assert all(r["t"] == [] for r in rows)


class TestTrain:
    def test_hand_computed_model(self, spark):
        # pos = "good good", neg = "bad": vocab=2, pos_tokens=2,
        # neg_tokens=1. Laplace llr per token, natural log.
        labeled = _df(spark, [("good good", 1), ("bad", 0)],
                      cols=("text", "label"))
        m = qualityclf.nb_train(labeled)
        assert m["vocab"] == 2
        assert m["pos_tokens"] == 2 and m["neg_tokens"] == 1
        assert m["prior"] == 0.0
        llr = {r["token"]: r["llr"] for r in m["model"].collect()}
        assert llr["good"] == pytest.approx(math.log(3 / 4) - math.log(1 / 3))
        assert llr["bad"] == pytest.approx(math.log(1 / 4) - math.log(2 / 3))
        assert m["unseen_llr"] == pytest.approx(
            math.log(1 / 4) - math.log(1 / 3))

    def test_needs_both_classes(self, spark):
        only_pos = _df(spark, [("hello there", 1)], cols=("text", "label"))
        with pytest.raises(ValueError):
            qualityclf.nb_train(only_pos)


class TestScore:
    @pytest.fixture(scope="class")
    def model(self, spark):
        labeled = _df(spark, [("good good", 1), ("bad", 0)],
                      cols=("text", "label"))
        return qualityclf.nb_train(labeled)

    def test_hand_computed_scores(self, spark, model):
        docs = _df(spark, [(0, "good bad"), (1, "novel"), (2, "")])
        got = {r["doc_id"]: (r["n_tokens"], r["mean_llr"])
               for r in qualityclf.nb_score(docs, model).collect()}
        mixed = (math.log(9 / 4) + math.log(3 / 8)) / 2
        assert got[0] == (2, round(mixed, 6))
        assert got[1] == (1, round(math.log(3 / 4), 6))
        assert got[2] == (0, None)  # empty doc: no phantom unseen score

    def test_broadcast_off_matches(self, spark, model):
        docs = _df(spark, [(0, "good bad novel"), (1, "bad bad")])
        a = sorted(map(tuple,
                       qualityclf.nb_score(docs, model).collect()))
        b = sorted(map(tuple, qualityclf.nb_score(
            docs, model, broadcast=False).collect()))
        assert a == b

    def test_filter_threshold_and_empty_drop(self, spark, model):
        docs = _df(spark, [(0, "good good"), (1, "bad bad"), (2, "")])
        kept = qualityclf.nb_filter(docs, model, threshold=0.0)
        assert sorted(r["doc_id"] for r in kept.collect()) == [0]
        assert kept.columns == docs.columns


class TestEndToEnd:
    def test_separates_natural_from_junk(self, spark):
        # Positive = natural sentences; negative = their vowel-stripped
        # mutilations. A held-out natural doc must outscore its own
        # stripped twin.
        nat = ["the quick brown fox jumps over the lazy dog",
               "a stitch in time saves nine every single day",
               "all that glitters is not gold my friend"]
        strip = [__import__("re").sub(r"[aeiou]", "", s) for s in nat]
        pos = _df(spark, [(t,) for t in nat], cols=("text",))
        neg = _df(spark, [(t,) for t in strip], cols=("text",))
        held = "the lazy dog jumps over a gold stitch"
        held_strip = __import__("re").sub(r"[aeiou]", "", held)
        docs = _df(spark, [(0, held), (1, held_strip)])
        got = {r["doc_id"]: r["mean_llr"]
               for r in qualityclf.nb_quality(docs, pos, neg).collect()}
        assert got[0] > 0 > got[1]
