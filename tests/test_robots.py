"""RFC 9309 robots.txt: parser semantics (textlib/robots.py) and the
Spark crawl-permission gate (operators/domains.robots_rules /
crawl_gate)."""

import pytest

from pyspark.sql import functions as F

from ocr_spark.functions.expressions import url_path
from ocr_spark.operators import domains
from ocr_spark.textlib.robots import is_allowed, parse_robots


def _verdict(txt: str, path: str, agent: str = "testbot") -> bool:
    return is_allowed(parse_robots(txt, agent=agent), path)


class TestParseRobots:
    def test_basic_disallow(self):
        txt = "User-agent: *\nDisallow: /private"
        assert _verdict(txt, "/private") is False
        assert _verdict(txt, "/private/page") is False  # prefix match
        assert _verdict(txt, "/public") is True

    def test_no_match_is_allowed(self):
        assert _verdict("User-agent: *\nDisallow: /x", "/y") is True

    def test_empty_file_allows_all(self):
        assert parse_robots("", agent="anybot") == []
        assert _verdict("", "/anything") is True

    def test_empty_disallow_is_noop(self):
        txt = "User-agent: *\nDisallow:"
        assert parse_robots(txt) == []
        assert _verdict(txt, "/x") is True

    def test_longest_match_wins(self):
        # RFC 9309 §2.2.2: most-octets rule decides.
        txt = ("User-agent: *\n"
               "Disallow: /private\n"
               "Allow: /private/ok")
        assert _verdict(txt, "/private/no") is False
        assert _verdict(txt, "/private/ok/page") is True

    def test_allow_wins_length_tie(self):
        txt = ("User-agent: *\n"
               "Disallow: /dir/a\n"
               "Allow: /dir/b")
        # Same-length patterns never both match here; craft a real tie:
        txt = ("User-agent: *\n"
               "Disallow: /p\n"
               "Allow: /p")
        assert _verdict(txt, "/page") is True

    def test_wildcard_star(self):
        txt = "User-agent: *\nDisallow: /*.pdf"
        assert _verdict(txt, "/docs/file.pdf") is False
        assert _verdict(txt, "/docs/file.pdfx") is False  # no anchor
        assert _verdict(txt, "/docs/file.html") is True

    def test_dollar_anchor(self):
        txt = "User-agent: *\nDisallow: /*.pdf$"
        assert _verdict(txt, "/a/file.pdf") is False
        assert _verdict(txt, "/a/file.pdf?x=1") is True  # not at end

    def test_specific_agent_beats_star(self):
        txt = ("User-agent: *\n"
               "Disallow: /\n"
               "User-agent: testbot\n"
               "Disallow: /only-this")
        assert _verdict(txt, "/anything", agent="testbot") is True
        assert _verdict(txt, "/only-this/x", agent="testbot") is False
        assert _verdict(txt, "/anything", agent="otherbot") is False

    def test_longest_agent_token_wins(self):
        txt = ("User-agent: test\n"
               "Disallow: /short\n"
               "User-agent: testbot\n"
               "Disallow: /long")
        # Both tokens substring-match "testbot-v2"; longer wins.
        rules = parse_robots(txt, agent="testbot-v2")
        assert [r["pattern"] for r in rules] == ["/long"]

    def test_adjacent_agents_share_group(self):
        txt = ("User-agent: a\n"
               "User-agent: b\n"
               "Disallow: /x")
        assert _verdict(txt, "/x/y", agent="a") is False
        assert _verdict(txt, "/x/y", agent="b") is False

    def test_agent_line_after_rules_starts_new_group(self):
        txt = ("User-agent: a\n"
               "Disallow: /a\n"
               "User-agent: b\n"
               "Disallow: /b")
        assert _verdict(txt, "/a/x", agent="b") is True
        assert _verdict(txt, "/b/x", agent="b") is False

    def test_rules_before_any_agent_ignored(self):
        txt = "Disallow: /x\nUser-agent: *\nDisallow: /y"
        assert [r["pattern"] for r in parse_robots(txt)] == ["/y"]

    def test_comments_and_unknown_directives_skipped(self):
        txt = ("# preamble\n"
               "User-agent: * # inline comment\n"
               "Crawl-delay: 10\n"
               "Sitemap: https://x/s.xml\n"
               "Disallow: /hidden # comment\n")
        assert [r["pattern"] for r in parse_robots(txt)] == ["/hidden"]

    def test_case_insensitive_keys_and_agent(self):
        txt = "USER-AGENT: TestBot\nDISALLOW: /x"
        assert _verdict(txt, "/x/1", agent="testbot") is False

    def test_regex_specials_in_pattern_escaped(self):
        txt = "User-agent: *\nDisallow: /a+b(c)"
        assert _verdict(txt, "/a+b(c)/d") is False
        assert _verdict(txt, "/aab(c)/d") is True  # '+' is literal


class TestCrawlGateSpark:
    ROBOTS = [
        ("blocked.example", "User-agent: *\nDisallow: /"),
        ("mixed.example", ("User-agent: *\n"
                           "Disallow: /private\n"
                           "Allow: /private/ok\n"
                           "Disallow: /*.pdf$")),
        ("openbot.example", ("User-agent: otherbot\n"
                             "Disallow: /\n")),
    ]
    PAGES = [
        ("https://open.example/a", True),          # no robots row
        ("https://blocked.example/a", False),
        ("https://blocked.example/", False),
        ("https://mixed.example/pub/x", True),
        ("https://mixed.example/private/no", False),
        ("https://mixed.example/private/ok/deep", True),
        ("https://mixed.example/f.pdf", False),
        ("https://mixed.example/f.pdf?x=1", True),  # $ anchor misses
        ("https://openbot.example/a", False),       # '*'-group absent,
    ]

    def _gate(self, spark, agent="*"):
        robots = spark.createDataFrame(self.ROBOTS,
                                       "host string, robots_txt string")
        docs = spark.createDataFrame([(u,) for u, _ in self.PAGES],
                                     "url string")
        rules = domains.robots_rules(robots, agent=agent)
        return {r["url"]: r["crawl_allowed"]
                for r in domains.crawl_gate(docs, rules).collect()}

    def test_verdicts(self, spark):
        got = self._gate(spark, agent="mybot")
        want = dict(self.PAGES)
        # openbot.example blocks only otherbot; mybot has no group ->
        # no rows -> allowed.
        want["https://openbot.example/a"] = True
        assert got == want

    def test_agent_specific_group(self, spark):
        got = self._gate(spark, agent="otherbot")
        assert got["https://openbot.example/a"] is False

    def test_duplicate_urls_single_verdict(self, spark):
        robots = spark.createDataFrame(self.ROBOTS,
                                       "host string, robots_txt string")
        docs = spark.createDataFrame(
            [("https://blocked.example/a", i) for i in range(5)],
            "url string, n int")
        out = domains.crawl_gate(docs,
                                 domains.robots_rules(robots)).collect()
        assert len(out) == 5
        assert all(r["crawl_allowed"] is False for r in out)

    def test_url_path_expr(self, spark):
        rows = [("https://h/a/b?q=1#f",), ("https://h",),
                ("https://h#frag",), ("https://h:80/x",)]
        got = [r["p"] for r in
               spark.createDataFrame(rows, "url string")
               .select(url_path(F.col("url")).alias("p")).collect()]
        assert got == ["/a/b?q=1", "/", "/", "/x"]


class TestSitemapDirectives:
    def test_group_independent_and_dedup(self):
        from ocr_spark.textlib.robots import parse_sitemap_directives
        txt = ("User-agent: *\n"
               "Disallow: /private\n"
               "Sitemap: https://a.example/sitemap.xml\n"
               "User-agent: otherbot\n"
               "Sitemap: https://a.example/news.xml  # comment\n"
               "sitemap: https://a.example/sitemap.xml\n"   # dup, any case
               "Sitemap:\n"                                  # empty -> skip
               "NotSitemap: https://a.example/x.xml\n")
        assert parse_sitemap_directives(txt) == [
            "https://a.example/sitemap.xml",
            "https://a.example/news.xml"]

    def test_no_directives(self):
        from ocr_spark.textlib.robots import parse_sitemap_directives
        assert parse_sitemap_directives("User-agent: *\nDisallow: /") == []
        assert parse_sitemap_directives("") == []


class TestRobotsSitemapsSpark:
    def test_operator_rows(self, spark):
        from ocr_spark.operators import domains
        df = spark.createDataFrame(
            [("a.example", "Sitemap: https://a.example/s.xml\n"
                           "User-agent: *\nDisallow: /p\n"
                           "Sitemap: https://a.example/t.xml"),
             ("b.example", "User-agent: *\nAllow: /"),
             ("c.example", None)],
            "host string, robots_txt string")
        got = sorted((r["host"], r["sitemap_url"])
                     for r in domains.robots_sitemaps(df).collect())
        assert got == [("a.example", "https://a.example/s.xml"),
                       ("a.example", "https://a.example/t.xml")]

    def test_same_file_two_views_agree(self, spark):
        """The gate parser and the sitemap extractor read one file —
        a sitemap line inside an agent group must neither become a
        rule nor be lost."""
        from ocr_spark.operators import domains
        txt = ("User-agent: mybot\nDisallow: /q\n"
               "Sitemap: https://h.example/inside-group.xml\n")
        df = spark.createDataFrame([("h.example", txt)],
                                   "host string, robots_txt string")
        rules = domains.robots_rules(df, agent="mybot").collect()
        assert [(r["allow"], r["pattern"]) for r in rules] == [
            (False, "/q")]
        maps = domains.robots_sitemaps(df).collect()
        assert [m["sitemap_url"] for m in maps] == [
            "https://h.example/inside-group.xml"]
