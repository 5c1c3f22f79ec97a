"""Cross-engine lint over the driver contract's oracle SQL strings.

DuckDB regexes are RE2, Spark's are java.util.regex — the classes with
the same spelling don't always match the same characters. The r4 parity
fix rewrote every oracle whitespace-run TOKENIZER as the explicit
``[\\s\\v]+`` (RE2 ``\\s`` excludes \\x0B, Java's includes it); this
lint makes the trap structural: a future oracle that types the natural
``'\\s+'`` tokenizer fails here before it can hash-mismatch at the
driver gate.
"""

import importlib.util
import os

import pytest


@pytest.fixture(scope="module")
def entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_for_lint_tests",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_no_bare_whitespace_tokenizer_in_oracle_sql(entry):
    r"""No oracle normalizes/splits free text with the bare '\s+'
    pattern — the whitespace-run TOKENIZER must be the explicit
    '[\s\v]+' class (RE2 \s excludes \x0B, Java's includes it, so the
    bare form silently diverges wherever document text can carry a
    vertical tab). \s inside larger extraction regexes (e.g.
    'name\s*:') is allowed: those mirror the reference parsers and run
    with the SAME pattern on both engines against label-adjacent text.

    This lint exists because the scoped rule caught a real miss:
    pdf_layout's token derivation used Java \s+ on the Spark side and
    RE2 '\s+' in the oracle (fixed in _LAYOUT_TOKENS_SQL)."""
    offenders = [name for name, sql in entry.oracle_sql().items()
                 if "'\\s+'" in sql]
    assert offenders == []
