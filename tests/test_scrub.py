"""PII scrubbing + unicode normalization (operators/scrub.py) and the
C4 heuristic cleanup (textstats.c4_*)."""

import unicodedata

from pyspark.sql import functions as F

from ocr_spark.operators import scrub, textstats


def _one(spark, text, fn, **kw):
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    return fn(df, **kw).collect()[0]


class TestPii:
    def test_email_redaction(self, spark):
        r = _one(spark, "mail john.doe+x@sub.example.co.uk now",
                 scrub.pii_scrub)
        assert r["text"] == "mail |||EMAIL_ADDRESS||| now"
        assert r["n_pii_redacted"] == 1

    def test_phone_forms(self, spark):
        for t in ["(555) 123-4567", "555-123-4567", "555.123.4567",
                  "5551234567"]:
            r = _one(spark, f"call {t} today", scrub.pii_scrub)
            assert r["text"] == "call |||PHONE_NUMBER||| today", t

    def test_ip_before_phone(self, spark):
        # A dotted quad must become an IP token, not a partial phone hit.
        r = _one(spark, "host 192.168.100.200 up", scrub.pii_scrub)
        assert r["text"] == "host |||IP_ADDRESS||| up"

    def test_email_digits_not_double_claimed(self, spark):
        # The email eats its digit runs before the phone pass sees them.
        r = _one(spark, "x 5551234567abc@d-e.io y", scrub.pii_scrub)
        assert r["text"] == "x |||EMAIL_ADDRESS||| y"
        assert r["n_pii_redacted"] == 1

    def test_stats_stagewise_counts(self, spark):
        r = _one(spark,
                 "a@b.io c@d.net 10.0.0.1 call (555) 123-4567 or "
                 "555.987.6543", scrub.pii_stats)
        assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (2, 1, 2)
        assert r["has_pii"]
        assert r["redacted_text"].count("|||EMAIL_ADDRESS|||") == 2

    def test_idempotent_and_clean_doc(self, spark):
        dirty = "see a@b.com at 10.0.0.1 phone 555-123-4567"
        once = _one(spark, dirty, scrub.pii_scrub)["text"]
        twice = _one(spark, once, scrub.pii_scrub)
        assert twice["text"] == once and twice["n_pii_redacted"] == 0
        clean = _one(spark, "no pii here at all", scrub.pii_stats)
        assert not clean["has_pii"]

    def test_null_text(self, spark):
        df = spark.createDataFrame([(0, None)], "doc_id: long, text: string")
        r = scrub.pii_scrub(df).collect()[0]
        assert r["text"] == "" and r["n_pii_redacted"] == 0


class TestCleanText:
    def test_crlf_controls_whitespace(self, spark):
        r = _one(spark, "  a\x00b\x07\r\nc\td   \n\n\n\n\ne \x7f ",
                 scrub.clean_text)
        assert r["text"] == "ab\nc d\n\ne"
        assert r["n_chars_removed"] == len("  a\x00b\x07\r\nc\td   \n\n\n\n\ne \x7f ") - len("ab\nc d\n\ne")

    def test_nfc_composition(self, spark):
        decomposed = "Cafe\u0301 nai\u0308ve"  # e + U+0301, i + U+0308
        r = _one(spark, decomposed, scrub.clean_text)
        assert r["text"] == unicodedata.normalize("NFC", decomposed)
        assert len(decomposed) == 12 and len(r["text"]) == 10
        assert r["n_chars_removed"] == 2

    def test_idempotent(self, spark):
        dirty = " x\r\ný\x01  z\n\n\n\nw\t"
        once = _one(spark, dirty, scrub.clean_text)["text"]
        assert _one(spark, once, scrub.clean_text)["text"] == once

    def test_null_and_schema_preserved(self, spark):
        df = spark.createDataFrame([(0, None, "k")],
                                   "doc_id: long, text: string, meta: string")
        r = scrub.clean_text(df).collect()[0]
        assert r["text"] == "" and r["meta"] == "k"


GOOD_PAGE = "\n".join(
    f"This is sentence number {i} of the page." for i in range(6))


class TestC4:
    def test_line_rules(self, spark):
        text = "\n".join([
            "A good long sentence ends here.",   # kept
            "No terminal punctuation at all",    # dropped: no terminal
            "Too short.",                        # dropped: < 3 words
            'A quoted ending works fine."',      # kept (end quote)
            "Enable JavaScript to view this.",   # dropped: javascript
            "Is this a question?",               # kept
        ])
        r = _one(spark, text, textstats.c4_stats)
        assert r["n_lines"] == 6 and r["n_kept_lines"] == 3
        assert r["kept_text"].splitlines() == [
            "A good long sentence ends here.",
            'A quoted ending works fine."',
            "Is this a question?"]

    def test_page_gates(self, spark):
        rows = [(0, GOOD_PAGE),
                (1, "Only one real sentence lives here."),
                (2, GOOD_PAGE + "\nSome lorem ipsum filler text here."),
                (3, GOOD_PAGE + "\nvar f = function() { return 1; };"),
                (4, GOOD_PAGE + "\nThis page says xbadwordx sadly.")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r for r in
               textstats.c4_stats(df, bad_words=("xbadwordx",)).collect()}
        assert out[0]["keep"]
        assert not out[1]["keep"] and out[1]["n_sentences"] == 1
        assert not out[2]["keep"] and out[2]["has_lorem"]
        assert not out[3]["keep"] and out[3]["has_brace"]
        assert not out[4]["keep"] and out[4]["has_bad_word"]
        # Default bad_words is vacuous (the LDNOOBW list is external).
        assert not textstats.c4_stats(df).collect()[4]["has_bad_word"]

    def test_filter_replaces_text_keeps_metadata(self, spark):
        rows = [(0, GOOD_PAGE + "\njunk line no punct", "m0"),
                (1, "Tiny.", "m1")]
        df = spark.createDataFrame(rows, ["doc_id", "text", "meta"])
        kept = textstats.c4_filter(df).collect()
        assert len(kept) == 1
        assert kept[0]["doc_id"] == 0 and kept[0]["meta"] == "m0"
        assert kept[0]["text"] == GOOD_PAGE

    def test_empty_text(self, spark):
        r = _one(spark, "", textstats.c4_stats)
        assert not r["keep"] and r["n_kept_lines"] == 0


class TestCrossEngineFuzz:
    """Seeded fuzz of the Java-regex (Spark) vs RE2 (DuckDB) parity the
    oracle queries rely on: the same nasty strings run through the real
    operators AND hand-built DuckDB twins of the same chains."""

    def _nasty_corpus(self):
        import random
        rng = random.Random(0xC0FFEE)
        atoms = ["user@example.org", "a@b.io", "(555) 123-4567",
                 "555.867.5309", "5551234567", "10.0.0.1", "8.8.8.8",
                 "999.999.999.999", "1234567890123456", "@", ".", "-",
                 "word", "Café", "naïve", "é", "\x0b", "\x07",
                 "\r\n", "\r", "\n\n\n\n", "\t\t", "   ", "{", "}",
                 "|||EMAIL_ADDRESS|||", "|||PHONE_NUMBER|||",
                 "a.b@c", "x+y@d-e.fg", "12.34", "...", "日本語",
                 "line ends here.", "Is it?", 'quote."', "javascript",
                 "JavaScript", "lorem ipsum"]
        corpus = []
        for i in range(250):
            n = rng.randint(0, 12)
            corpus.append((i, " ".join(rng.choice(atoms)
                                       for _ in range(n))))
        return corpus

    def test_pii_and_clean_match_duckdb(self, spark):
        import duckdb

        rows = self._nasty_corpus()
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {(r["doc_id"]): (r["text"], r["n_pii_redacted"])
               for r in scrub.pii_scrub(df).collect()}
        cleaned = {r["doc_id"]: r["text"]
                   for r in scrub.clean_text(df).collect()}

        con = duckdb.connect()
        con.execute("CREATE TABLE t (doc_id INT, text VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        e, i, p = scrub.EMAIL_RE, scrub.IPV4_RE, scrub.PHONE_RE_RE2
        et, it, pt = scrub.EMAIL_TOKEN, scrub.IP_TOKEN, scrub.PHONE_TOKEN

        def occ(col, tok):
            return (f"CAST((length({col}) - length(replace({col}, "
                    f"'{tok}', ''))) / {len(tok)} AS int)")

        ref = con.execute(f"""
            WITH s AS (SELECT doc_id, text AS raw,
                regexp_replace(text, '{e}', '{et}', 'g') AS ae FROM t),
            s2 AS (SELECT *, regexp_replace(ae, '{i}', '{it}', 'g') AS ai
                   FROM s),
            s3 AS (SELECT *, regexp_replace(ai, '{p}', '{pt}', 'g') AS fin
                   FROM s2)
            SELECT doc_id, fin,
              {occ('ae', et)} - {occ('raw', et)}
              + {occ('ai', it)} - {occ('ae', it)}
              + {occ('fin', pt)} - {occ('ai', pt)} AS n
            FROM s3""").fetchall()
        for doc_id, fin, n in ref:
            assert got[doc_id] == (fin, n), (doc_id, got[doc_id], fin, n)

        ctrl = scrub.CONTROL_RE
        ref2 = con.execute(f"""
            SELECT doc_id,
              regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                nfc_normalize(regexp_replace(regexp_replace(
                  text, '\\r\\n|\\r', chr(10), 'g'), '{ctrl}', '', 'g')),
                '[ \\t]+', ' ', 'g'),
                ' ?\\n ?', chr(10), 'g'),
                '\\n{{3,}}', chr(10) || chr(10), 'g'),
                '^[ \\n]+|[ \\n]+$', '', 'g') AS cleaned
            FROM t""").fetchall()
        for doc_id, expect in ref2:
            assert cleaned[doc_id] == expect, (doc_id,
                                               repr(cleaned[doc_id]),
                                               repr(expect))

    def test_repetition_full_matches_duckdb(self, spark):
        """Full-Gopher fuzz: multi-line compositions (digit-edged
        lines — the transform-arity trim-bug shape — repeated blocks,
        blank-run paragraph boundaries, unicode, n-gram loops) through
        repetition_stats_full vs the generated DuckDB chain."""
        import random

        import duckdb

        import __spark_entry__ as entry
        from ocr_spark.operators import textstats

        rng = random.Random(0xFEED)
        lines = ["0 line 0", "7.", "repeated boiler line", "word",
                 "Café naïve é", "日本語 テキスト", "a  b\tc",
                 "one two three four five six", "9 ends with 9",
                 "click here click here", "", "   ", "\t"]
        rows = []
        for i in range(200):
            n = rng.randint(0, 10)
            parts = []
            for _ in range(n):
                ln = rng.choice(lines)
                if rng.random() < 0.3:
                    ln = ln + "\n" + ln          # in-doc repeats
                parts.append(ln)
            sep = "\n\n" if rng.random() < 0.4 else "\n"
            rows.append((i, sep.join(parts)))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: tuple(r)[1:]
               for r in textstats.repetition_stats_full(df).collect()}

        con = duckdb.connect()
        con.execute("CREATE TABLE fuzz_docs (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO fuzz_docs VALUES (?, ?)", rows)
        sql = entry._sql_repetition_full_chain(
            "SELECT doc_id, text AS t FROM fuzz_docs")
        for rec in con.execute(sql).fetchall():
            doc_id, expect = rec[0], tuple(rec[1:])
            assert got[doc_id] == expect, (doc_id, got[doc_id], expect)
