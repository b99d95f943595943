"""Quality-filter operators (operators/quality.py)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.operators.quality import (  # noqa: E402
    gopher_filter,
    pii_scan,
    repetition_stats,
)


@pytest.fixture(scope="module")
def qdocs(spark):
    rows = [
        (0, "spam spam spam spam"),                              # pure repetition
        (1, "the quick brown fox jumps over the lazy dog"),      # normal prose
        (2, ""),                                                 # empty
        (3, "alpha beta alpha beta alpha beta"),                 # bigram loop
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_repetition_stats_values(qdocs):
    out = {r["id"]: r for r in repetition_stats(qdocs, "text", "doc_id").collect()}
    r0 = out[0]
    assert r0["n_words"] == 4
    assert r0["distinct_word_frac"] == 0.25
    assert r0["consec_dup_frac"] == 1.0
    assert r0["top_bigram_frac"] == 1.0          # only gram: "spam spam"
    r1 = out[1]
    assert r1["n_words"] == 9
    assert r1["consec_dup_frac"] == 0.0
    assert r1["distinct_word_frac"] == pytest.approx(8 / 9, abs=1e-6)
    r2 = out[2]
    assert r2["n_words"] == 0 and r2["top_bigram_frac"] == 0.0
    r3 = out[3]
    # "alpha beta"×3 of 5 bigrams
    assert r3["top_bigram_frac"] == 0.6


def test_gopher_filter_flags(qdocs):
    out = {r["id"]: r for r in gopher_filter(
        qdocs, "text", "doc_id", min_words=4, min_stop_hits=0,
    ).collect()}
    assert not out[0]["pass_consec"] and not out[0]["keep"]
    assert out[1]["pass_word_len"] and out[1]["pass_consec"]
    assert not out[2]["pass_n_words"] and not out[2]["keep"]
    assert out[1]["stop_hits"] == 1              # 'the'


def test_pii_scan_counts(spark):
    rows = [
        (0, "mail me at a@b.co or c.d@e-f.org today"),
        (1, "server 10.0.0.1 and gateway 192.168.1.254"),
        (2, "call +1 (555) 123-4567 now"),
        (3, "see https://x.com/a?b=1 and http://y.io"),
        (4, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in pii_scan(df, "text", "doc_id").collect()}
    assert out[0]["n_emails"] == 2 and out[0]["has_pii"]
    assert out[1]["n_ipv4"] == 2
    assert out[2]["n_phones"] == 1
    assert out[3]["n_urls"] == 2
    assert not out[4]["has_pii"]
