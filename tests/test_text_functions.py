"""Unit goldens for functions/text.py that the oracle fixtures can't catch.

Regression for the ADVICE r02 finding: the PII count patterns used to be
interpolated into F.expr() SQL strings, where the literal parser stripped
the backslash from '\\.' — so 'a@bcdef' (no dot-TLD) false-counted as an
email while the replacement (column-API, literal dot) left it alone.
Count and replace must share the identical compiled pattern.
"""

from pyspark.sql import Row

from full_lattice_search_spark.functions.text import redact_pii


def _run(spark, texts):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    out = redact_pii(df).orderBy("doc_id").collect()
    return [(r.clean_text, r.n_emails, r.n_urls) for r in out]


def test_no_tld_token_is_not_an_email(spark):
    # '\.' must stay a literal dot: 'a@bcdef' has no dot-TLD, so it is
    # neither counted nor redacted (previously n_emails=1 with no redaction).
    [(clean, n_emails, n_urls)] = _run(spark, ["mail a@bcdef end"])
    assert n_emails == 0
    assert clean == "mail a@bcdef end"


def test_counts_agree_with_replacements(spark):
    rows = _run(
        spark,
        [
            "contact me@example.com or ops@ex.co now",
            "foo@bar baz",  # '@' but no dot-TLD — not an email
            "see https://ex.org/path and http://a.b ok",
            "plain text only",
        ],
    )
    assert rows[0] == ("contact <EMAIL> or <EMAIL> now", 2, 0)
    assert rows[1] == ("foo@bar baz", 0, 0)
    assert rows[2] == ("see <URL> and <URL> ok", 0, 2)
    assert rows[3] == ("plain text only", 0, 0)
    # invariant: n_emails/n_urls == number of placeholders in clean_text
    for clean, n_emails, n_urls in rows:
        assert clean.count("<EMAIL>") == n_emails
        assert clean.count("<URL>") == n_urls
