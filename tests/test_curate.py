"""Curation funnel (operators/curate.py): planted documents each
violating exactly one stage, asserted stage by stage."""

import hashlib

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators import curate

RU = ("Это русский текст для проверки языкового фильтра. " * 4)


_LETTERS = str.maketrans("0123456789", "ghijklmnop")


def _w(sid, i):
    # All-letter words: a digit-bearing token could accidentally match
    # the phone/IP PII patterns.
    return hashlib.md5(f"{sid}:{i}".encode()).hexdigest()[:16]\
        .translate(_LETTERS)


def good(sid):
    """Six distinct English sentences (terminal punctuation, >= 3
    words, stopword-rich, no repeated lines, no dominant bigram) that
    pass the lang / Gopher / C4 gates — dominated by per-document
    hash words so UNRELATED docs are nowhere near the 0.5 near-dup
    threshold (a shared static template would cluster the whole
    corpus into one survivor)."""
    return "\n".join(
        f"The {_w(sid, 3 * i)} and the {_w(sid, 3 * i + 1)} are "
        f"{_w(sid, 3 * i + 2)}." for i in range(6))


@pytest.fixture(scope="module")
def result(spark):
    rows = [
        # survivors
        (0, good(0)),
        (1, good(1) + "\nContact someone@example.com or call "
            "(555) 123-4567 for more help today."),          # PII, kept
        (2, good(2).replace("\n", "\r\n") + "\n\n\n\n\n"),   # dirty, kept
        # gate victims
        (3, RU),                                             # lang
        (4, "Repeated boiler line for the gate.\n" * 6 + good(4)),  # gopher
        (5, good(5) + "\nvar f = function() { return 1; };"),  # c4 brace
        (6, good(6) + "\nSome lorem ipsum filler text here."),  # c4 lorem
        # exact-dup pair: 8 duplicates 7 -> min id 7 survives
        (7, good(7)),
        (8, good(7)),
        # near-dup pair: one variant line apart -> min id 9 survives
        (9, good(9) + "\nThe variant number zero closes it."),
        (10, good(9) + "\nThe variant number one closes it."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return curate.curate(df, neardup_threshold=0.5)


class TestDecisions:
    def test_final_survivors(self, result):
        got = {r["doc_id"] for r in result["survivors"].collect()}
        assert got == {0, 1, 2, 7, 9}

    def test_stage_verdicts(self, result):
        d = {r["doc_id"]: r for r in result["decisions"].collect()}
        assert len(d) == 11
        assert not d[3]["lang_ok"] and d[3]["lang_guess"] == "ru"
        assert d[4]["lang_ok"] and not d[4]["gopher_ok"]
        assert d[5]["gopher_ok"] and not d[5]["c4_ok"]
        assert not d[6]["c4_ok"]
        # exact pair: keep-first by min id
        assert d[7]["exact_ok"] is True and d[8]["exact_ok"] is False
        # near-dup pair: both pass exact, resolve keeps min id
        assert d[9]["exact_ok"] and d[10]["exact_ok"]
        assert d[9]["neardup_ok"] is True and d[10]["neardup_ok"] is False

    def test_null_means_not_reached(self, result):
        d = {r["doc_id"]: r for r in result["decisions"].collect()}
        # lang victim never reaches exact/neardup
        assert d[3]["exact_ok"] is None and d[3]["neardup_ok"] is None
        # exact loser never reaches neardup
        assert d[8]["neardup_ok"] is None
        # no benchmark given -> decontam never runs
        assert all(r["decontam_ok"] is None
                   for r in result["decisions"].collect())

    def test_transform_counters(self, result):
        d = {r["doc_id"]: r for r in result["decisions"].collect()}
        assert d[1]["n_pii_redacted"] == 2          # email + phone
        assert d[0]["n_pii_redacted"] == 0
        assert d[2]["n_chars_removed"] > 0          # CRLF + blank squeeze
        # curated_text is the C4-retained text (lines survive intact)
        assert _w(0, 0) in d[0]["curated_text"]


class TestFunnel:
    def test_stage_rows(self, result):
        rows = {r["stage"]: r for r in result["funnel"].collect()}
        assert [r["stage"] for r in
                sorted(rows.values(), key=lambda r: r["stage_idx"])] == [
            "input", "scrub", "clean", "lang", "gopher", "c4",
            "exact_dedup", "neardup"]
        assert rows["input"]["docs_out"] == 11
        assert rows["scrub"]["docs_dropped"] == 0
        assert rows["clean"]["docs_dropped"] == 0
        assert rows["lang"]["docs_out"] == 10
        assert rows["gopher"]["docs_out"] == 9
        assert rows["c4"]["docs_out"] == 7
        assert rows["exact_dedup"]["docs_out"] == 6
        assert rows["neardup"]["docs_out"] == 5
        # in/out chain is consistent
        ordered = sorted(rows.values(), key=lambda r: r["stage_idx"])
        for prev, cur in zip(ordered, ordered[1:]):
            assert cur["docs_in"] == prev["docs_out"]
            assert cur["docs_dropped"] == cur["docs_in"] - cur["docs_out"]


class TestRepairStage:
    @pytest.fixture(scope="class")
    def repaired(self, spark):
        rows = [
            (0, good(0)),
            (3, RU),                                              # lang
            # line spam: WITHOUT repair the Gopher dup-line gate
            # drops this doc whole; WITH repair the 5 repeats go and
            # the remainder passes every gate.
            (4, "Repeated boiler line for the gate.\n" * 6 + good(4)),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        return curate.curate(df, neardup_threshold=0.5,
                             repair_lines=True)

    def test_spam_doc_survives_after_repair(self, repaired):
        got = {r["doc_id"] for r in repaired["survivors"].collect()}
        assert got == {0, 4}
        d = {r["doc_id"]: r for r in repaired["decisions"].collect()}
        assert d[4]["gopher_ok"] is True
        assert d[4]["n_dup_lines_removed"] == 5
        assert d[0]["n_dup_lines_removed"] == 0
        # the repair edits the curated text, not just the verdict
        assert d[4]["curated_text"].count(
            "Repeated boiler line for the gate.") == 1

    def test_funnel_has_repair_row(self, repaired):
        rows = sorted(repaired["funnel"].collect(),
                      key=lambda r: r["stage_idx"])
        assert [r["stage"] for r in rows] == [
            "input", "scrub", "clean", "repair", "lang", "gopher",
            "c4", "exact_dedup", "neardup"]
        by = {r["stage"]: r for r in rows}
        assert by["repair"]["docs_dropped"] == 0   # a transform stage
        assert by["lang"]["docs_out"] == 2
        assert by["gopher"]["docs_out"] == 2
        for prev, cur in zip(rows, rows[1:]):
            assert cur["docs_in"] == prev["docs_out"]

    def test_off_by_default_column_is_null(self, result):
        assert all(r["n_dup_lines_removed"] is None
                   for r in result["decisions"].collect())


class TestDecontamStage:
    def test_benchmark_drops_overlap(self, spark):
        # doc 0's curated text is planted INTO the benchmark; with
        # n=13 the 13-token overlap drops exactly that doc.
        rows = [(i, good(i)) for i in range(4)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        bench = spark.createDataFrame([(good(0).replace("\n", " "),)],
                                      ["text"])
        res = curate.curate(df, benchmark=bench, decontam_ngram=13)
        got = {r["doc_id"] for r in res["survivors"].collect()}
        assert got == {1, 2, 3}
        d = {r["doc_id"]: r for r in res["decisions"].collect()}
        assert d[0]["decontam_ok"] is False and d[0]["neardup_ok"] is True
        funnel = {r["stage"]: r for r in res["funnel"].collect()}
        assert funnel["decontam"]["docs_dropped"] == 1
