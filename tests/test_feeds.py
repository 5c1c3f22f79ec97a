"""RSS/Atom feed parsing (textlib/feeds.py) + the feed_urls operator
and its crawl_frontier adapter."""

import datetime as dt

from ocr_spark.operators import domains
from ocr_spark.textlib import feeds

RSS = """<?xml version="1.0"?>
<rss version="2.0" xmlns:atom="http://www.w3.org/2005/Atom">
 <channel>
  <title>Example</title>
  <atom:link href="https://ex.net/feed" rel="self"/>
  <item>
   <title>First &amp; best</title>
   <link>https://ex.net/a</link>
   <pubDate>Mon, 10 Feb 2026 08:30:00 GMT</pubDate>
  </item>
  <item>
   <atom:link href="https://ex.net/self-only" rel="self"/>
   <link>https://ex.net/b</link>
   <pubDate>10 Feb 26 01:02:03 -0530</pubDate>
  </item>
  <item><title>no link</title></item>
  <item><link>https://ex.net/c</link>
   <pubDate>not a date</pubDate></item>
 </channel>
</rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
 <title>Example Atom</title>
 <entry>
  <title>alt wins</title>
  <link rel="enclosure" href="https://ex.net/media.mp3"/>
  <link rel="alternate" href="https://ex.net/x"/>
  <updated>2026-02-10T08:30:00Z</updated>
 </entry>
 <entry>
  <link href="https://ex.net/y"/>
  <published>2026-01-05</published>
 </entry>
 <entry>
  <link rel="enclosure" href="https://ex.net/only-enclosure"/>
 </entry>
 <entry><title>no link at all</title></entry>
</feed>"""


class TestRss:
    def test_items_and_dates(self):
        entries, skipped = feeds.parse_feed(RSS)
        assert skipped == 1
        locs = [e["loc"] for e in entries]
        assert locs == ["https://ex.net/a", "https://ex.net/b",
                        "https://ex.net/c"]
        assert entries[0]["title"] == "First & best"
        assert entries[0]["lastmod"] == dt.datetime(2026, 2, 10, 8, 30)
        # 2-digit year + numeric offset -> naive UTC
        assert entries[1]["lastmod"] == dt.datetime(2026, 2, 10, 6, 32, 3)
        assert entries[2]["lastmod"] is None  # unparseable pubDate

    def test_self_link_does_not_shadow(self):
        entries, _ = feeds.parse_feed(RSS)
        assert entries[1]["loc"] == "https://ex.net/b"


class TestAtom:
    def test_rel_preference_and_dates(self):
        entries, skipped = feeds.parse_feed(ATOM)
        assert skipped == 1
        assert [e["loc"] for e in entries] == [
            "https://ex.net/x",               # alternate beats enclosure
            "https://ex.net/y",               # no rel IS alternate
            "https://ex.net/only-enclosure",  # fallback: first other rel
        ]
        assert entries[0]["lastmod"] == dt.datetime(2026, 2, 10, 8, 30)
        assert entries[1]["lastmod"] == dt.datetime(2026, 1, 5)
        assert entries[2]["lastmod"] is None


class TestRfc822:
    def test_zones(self):
        p = feeds.parse_rfc822_datetime
        base = dt.datetime(2026, 2, 10, 13, 0)
        assert p("Tue, 10 Feb 2026 13:00 GMT") == base
        assert p("Tue, 10 Feb 2026 08:00 EST") == base
        assert p("Tue, 10 Feb 2026 05:00 PST") == base
        assert p("10 Feb 2026 14:00 +0100") == base
        assert p("Tue, 10 Feb 2026 13:00 XYZ") is None
        assert p("Tue, 99 Feb 2026 13:00 GMT") is None
        # RFC 2822 two-digit years: 50-99 -> 19xx
        assert p("10 Feb 71 00:00 GMT") == dt.datetime(1971, 2, 10)

    def test_garbage(self):
        assert feeds.parse_rfc822_datetime("") is None
        assert feeds.parse_rfc822_datetime("yesterday-ish") is None


class TestFallbackScan:
    def test_malformed_recovers_blocks(self):
        broken = (RSS.replace("</rss>", "")  # unterminated document
                  + "<item><link>https://ex.net/tail</link></item>")
        entries, skipped = feeds.parse_feed(broken)
        locs = [e["loc"] for e in entries]
        assert "https://ex.net/a" in locs
        assert "https://ex.net/tail" in locs
        assert skipped == 1  # the no-link block still counts

    def test_malformed_atom_href(self):
        broken = ("<feed><entry><link href='https://ex.net/m'/>"
                  "<updated>2026-02-01</updated></entry>")
        entries, _ = feeds.parse_feed(broken)
        assert entries[0]["loc"] == "https://ex.net/m"
        assert entries[0]["lastmod"] == dt.datetime(2026, 2, 1)

    def test_not_a_feed(self):
        assert feeds.parse_feed("<html><body>hi</body></html>") == ([], 0)


class TestFeedUrlsOperator:
    def test_rows_and_bookkeeping(self, spark):
        df = spark.createDataFrame(
            [("a.example", RSS), ("b.example", ATOM),
             ("c.example", None)],
            "host string, feed_xml string")
        out = domains.feed_urls(df).collect()
        by_host = {}
        for r in out:
            by_host.setdefault(r["host"], []).append(r)
        assert len([r for r in by_host["a.example"]
                    if r["loc"] is not None]) == 3
        # one bookkeeping row per lossy host, counter sums correctly
        book = [r for r in out if r["loc"] is None]
        assert sorted((r["host"], r["_feed_skipped"]) for r in book) \
            == [("a.example", 1), ("b.example", 1)]
        assert sum(r["_feed_skipped"] for r in out) == 2
        assert "c.example" not in by_host

    def test_frontier_adapter_end_to_end(self, spark):
        df = spark.createDataFrame([("a.example", RSS)],
                                   "host string, feed_xml string")
        entries = domains.feed_frontier_entries(domains.feed_urls(df))
        state = spark.createDataFrame(
            [("https://ex.net/a", dt.datetime(2026, 2, 11))],
            "url string, fetched_ts timestamp")
        fr = domains.crawl_frontier(entries, state,
                                    as_of="2026-02-12 00:00:00")
        got = {r["url"]: r["needs_fetch"] for r in fr.collect()}
        # /a was fetched AFTER its pubDate -> aged by default freq,
        # not due; /b and /c never fetched -> due
        assert got["https://ex.net/a"] is False
        assert got["https://ex.net/b"] and got["https://ex.net/c"]


def test_rfc822_utc_zone_accepted():
    import datetime as dt
    assert feeds.parse_rfc822_datetime(
        "Tue, 10 Feb 2026 13:00:00 UTC") == dt.datetime(2026, 2, 10, 13)


def test_rfc822_three_digit_year_rfc2822():
    # RFC 2822 §4.3: three-digit years are interpreted by adding 1900.
    got = feeds.parse_rfc822_datetime("10 Feb 102 12:00:00 GMT")
    assert got is not None and got.year == 2002
