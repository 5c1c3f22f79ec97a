"""Sitemap parsing (sitemaps.org 0.9) + the crawl frontier."""

import datetime as dt

from ocr_spark.textlib import sitemaps

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


class TestParseSitemap:
    def test_urlset_full_fields(self):
        xml = f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset {NS}>
  <url>
    <loc>https://a.example.com/p1</loc>
    <lastmod>2026-02-01T10:30:00Z</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://a.example.com/p2</loc></url>
</urlset>"""
        entries, skipped = sitemaps.parse_sitemap(xml)
        assert skipped == 0
        assert entries[0] == {
            "loc": "https://a.example.com/p1",
            "lastmod": dt.datetime(2026, 2, 1, 10, 30),
            "changefreq": "daily", "priority": 0.8, "is_index": False}
        assert entries[1]["lastmod"] is None
        assert entries[1]["priority"] is None

    def test_sitemapindex_flagged_not_followed(self):
        xml = f"""<sitemapindex {NS}>
  <sitemap><loc>https://x.com/s1.xml</loc>
    <lastmod>2026-01-05</lastmod></sitemap>
</sitemapindex>"""
        entries, skipped = sitemaps.parse_sitemap(xml)
        assert [e["is_index"] for e in entries] == [True]
        assert entries[0]["lastmod"] == dt.datetime(2026, 1, 5)

    def test_date_only_and_offset_lastmod(self):
        assert sitemaps.parse_w3c_datetime("2026-03-04") == \
            dt.datetime(2026, 3, 4)
        # +05:30 offset normalizes to UTC
        assert sitemaps.parse_w3c_datetime("2026-03-04T10:00:00+05:30") \
            == dt.datetime(2026, 3, 4, 4, 30)
        assert sitemaps.parse_w3c_datetime("2026-03-04T10:00:00-02:00") \
            == dt.datetime(2026, 3, 4, 12, 0)
        assert sitemaps.parse_w3c_datetime("not a date") is None
        assert sitemaps.parse_w3c_datetime("2026-13-99") is None

    def test_priority_clamped_changefreq_folded(self):
        xml = f"""<urlset {NS}>
  <url><loc>u1</loc><priority>7</priority>
       <changefreq>DAILY</changefreq></url>
  <url><loc>u2</loc><priority>-1</priority>
       <changefreq>fortnightly</changefreq></url>
  <url><loc>u3</loc><priority>abc</priority></url>
</urlset>"""
        entries, _ = sitemaps.parse_sitemap(xml)
        assert [e["priority"] for e in entries] == [1.0, 0.0, None]
        assert [e["changefreq"] for e in entries] == ["daily", None, None]

    def test_missing_loc_counted_skipped(self):
        xml = f"""<urlset {NS}>
  <url><lastmod>2026-01-01</lastmod></url>
  <url><loc>https://ok.com/x</loc></url>
</urlset>"""
        entries, skipped = sitemaps.parse_sitemap(xml)
        assert skipped == 1
        assert [e["loc"] for e in entries] == ["https://ok.com/x"]

    def test_namespaced_and_extension_tags_ignored(self):
        xml = """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
  xmlns:image="http://www.google.com/schemas/sitemap-image/1.1">
  <url><loc>https://n.com/a</loc>
    <image:image><image:loc>https://n.com/a.jpg</image:loc></image:image>
  </url>
</urlset>"""
        entries, skipped = sitemaps.parse_sitemap(xml)
        assert (skipped, len(entries)) == (0, 1)
        assert entries[0]["loc"] == "https://n.com/a"

    def test_malformed_xml_falls_back_and_recovers(self):
        # unclosed <urlset> + a stray bare ampersand: ElementTree
        # rejects the document, the tag scan still recovers the blocks
        xml = """<urlset>
  <url><loc>https://m.com/a?x=1&y=2</loc><priority>0.4</priority></url>
  <url><lastmod>2026-01-01</lastmod></url>
  <url><loc>https://m.com/b</loc></url>"""
        entries, skipped = sitemaps.parse_sitemap(xml)
        assert [e["loc"] for e in entries] == [
            "https://m.com/a?x=1&y=2", "https://m.com/b"]
        assert skipped == 1
        assert entries[0]["priority"] == 0.4

    def test_entity_escapes_unescaped_in_fallback(self):
        xml = "<urlset><url><loc>https://e.com/?a=1&amp;b=2</loc></url>"
        entries, _ = sitemaps.parse_sitemap(xml)
        assert entries[0]["loc"] == "https://e.com/?a=1&b=2"

    def test_empty_and_junk_inputs_total(self):
        assert sitemaps.parse_sitemap("") == ([], 0)
        assert sitemaps.parse_sitemap("   ") == ([], 0)
        assert sitemaps.parse_sitemap("not xml at all") == ([], 0)
        assert sitemaps.parse_sitemap("<html><body>404</body></html>") \
            == ([], 0)


class TestSitemapOperators:
    def _entries(self, spark):
        from ocr_spark.operators import domains
        xml_a = f"""<urlset {NS}>
  <url><loc>https://a.com/fresh</loc>
    <lastmod>2026-02-10T00:00:00Z</lastmod>
    <changefreq>daily</changefreq><priority>0.9</priority></url>
  <url><loc>https://a.com/stale</loc>
    <lastmod>2026-01-01</lastmod>
    <changefreq>yearly</changefreq><priority>0.2</priority></url>
  <url><lastmod>2026-01-01</lastmod></url>
</urlset>"""
        xml_b = f"""<sitemapindex {NS}>
  <sitemap><loc>https://b.com/more.xml</loc></sitemap>
</sitemapindex>"""
        df = spark.createDataFrame(
            [("a.com", xml_a), ("b.com", xml_b)],
            "host string, sitemap_xml string")
        return domains.sitemap_urls(df)

    def test_sitemap_urls_rows_and_skip_counter(self, spark):
        rows = self._entries(spark).collect()
        docs = [r for r in rows if r.loc is not None]
        assert {(r.host, r.loc, r.is_index) for r in docs} == {
            ("a.com", "https://a.com/fresh", False),
            ("a.com", "https://a.com/stale", False),
            ("b.com", "https://b.com/more.xml", True)}
        assert sum(r._sitemap_skipped for r in rows) == 1
        assert all(r._sitemap_skipped == 0 for r in docs)

    def test_crawl_frontier_scores(self, spark):
        import pyspark.sql.functions as F

        from ocr_spark.operators import domains
        entries = self._entries(spark)
        state = spark.createDataFrame(
            [("https://a.com/fresh", dt.datetime(2026, 2, 1)),
             ("https://a.com/stale", dt.datetime(2026, 2, 1))],
            "url string, fetched_ts timestamp")
        ranks = spark.createDataFrame(
            [("a.com", 0.5)], "host string, rank double")
        got = {r.url: r for r in domains.crawl_frontier(
            entries, state, as_of="2026-02-02 00:00:00",
            host_ranks=ranks).collect()}
        # index rows never enter the frontier
        assert set(got) == {"https://a.com/fresh", "https://a.com/stale"}
        fresh, stale = got["https://a.com/fresh"], got["https://a.com/stale"]
        # lastmod (Feb 10) > fetched (Feb 1) -> must refetch
        assert fresh.needs_fetch and fresh.staleness == 1.0
        assert abs(fresh.fetch_score - 0.9 * 1.0 * 1.5) < 1e-9
        # yearly page fetched yesterday: 24h / 8760h stale
        assert not stale.needs_fetch
        assert abs(stale.staleness - 24 / 8760) < 1e-9
        assert abs(stale.fetch_score - 0.2 * (24 / 8760) * 1.5) < 1e-9

    def test_crawl_frontier_cold_crawl_defaults(self, spark):
        from ocr_spark.operators import domains
        got = {r.url: r for r in domains.crawl_frontier(
            self._entries(spark), None,
            as_of="2026-02-02 00:00:00").collect()}
        assert all(r.needs_fetch and r.staleness == 1.0
                   for r in got.values())
        # no priority -> sitemaps.org default 0.5 applied by consumer;
        # no ranks -> multiplier 1
        assert abs(got["https://a.com/fresh"].fetch_score - 0.9) < 1e-9
