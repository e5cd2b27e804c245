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


def test_duplicate_ngram_stats_scopes(spark):
    """Exact-substring dedup signal: corpus scope counts within-doc
    repetition, cross_doc scope only shared grams."""
    import pytest

    from full_lattice_search_spark.functions.text import (
        duplicate_ngram_stats,
    )

    shared = "the quick brown fox jumped over the lazy dog"  # 9 tokens
    docs = spark.createDataFrame(
        [
            (1, shared + " unique tail one"),
            (2, shared + " other ending here"),
            (3, "totally different words with no overlap at all ok"),
            (4, "rep rep rep rep rep rep rep rep rep rep"),  # within-doc
            (5, "short doc"),  # < k tokens -> no grams
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"])
        for r in duplicate_ngram_stats(docs, k=8).collect()
    }
    # doc1/doc2: 12 tokens -> 5 grams each; the 2 grams fully inside the
    # shared 9-token prefix are duplicated
    assert got[1] == (5, 2) and got[2] == (5, 2)
    assert got[3] == (2, 0)  # 9 tokens -> 2 grams
    # doc4: all 3 8-grams are 'rep'*8 -> identical -> all duplicated
    assert got[4] == (3, 3)
    assert got[5] == (0, 0)

    cross = {
        r["doc_id"]: r["n_dup_grams"]
        for r in duplicate_ngram_stats(docs, k=8, scope="cross_doc")
        .collect()
    }
    # within-doc repetition is NOT flagged under cross_doc
    assert cross[4] == 0 and cross[1] == 2
    with pytest.raises(ValueError, match="unknown scope"):
        duplicate_ngram_stats(docs, scope="both")


def test_strip_duplicate_ngrams(spark):
    from full_lattice_search_spark.functions.text import (
        strip_duplicate_ngrams,
    )

    shared = "the quick brown fox jumped over the lazy dog"
    docs = spark.createDataFrame(
        [
            (1, shared + " unique tail one"),
            (2, shared + " other ending here"),
            (3, "short doc"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in strip_duplicate_ngrams(docs, k=8).collect()
    }
    # duplicated grams cover tokens 0..8 (both grams inside the shared
    # prefix); the unique tails survive in order
    assert got[1]["clean_text"] == "unique tail one"
    assert got[2]["clean_text"] == "other ending here"
    assert (got[1]["n_tokens"], got[1]["n_kept"]) == (12, 3)
    # short doc passes through untouched (no grams -> nothing covered)
    assert got[3]["clean_text"] == "short doc"
    assert got[3]["n_kept"] == 2


def test_strip_duplicate_ngrams_keep_first(spark):
    """keep_first=True exempts the earliest occurrence per gram hash
    (Lee et al. keep-one semantics): the first copy of the shared
    boilerplate survives, later copies are cut."""
    from full_lattice_search_spark.functions.text import (
        strip_duplicate_ngrams,
    )

    shared = "the quick brown fox jumped over the lazy dog"
    docs = spark.createDataFrame(
        [
            (1, shared + " unique tail one"),
            (2, shared + " other ending here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in strip_duplicate_ngrams(
            docs, k=8, keep_first=True
        ).collect()
    }
    # doc 1 holds the first occurrence of both duplicated grams -> intact
    assert got[1]["clean_text"] == shared + " unique tail one"
    assert got[1]["n_kept"] == 12
    # doc 2's copies are the later occurrences -> stripped as before
    assert got[2]["clean_text"] == "other ending here"
    assert got[2]["n_kept"] == 3
