"""Golden-output regression tests for the two rows-only oracle queries
(round-6 item #4, VERDICT r5).

``q_semantic_dedup`` (k-means) and ``q_quality_classifier`` (IRLS) have
no SQL oracle, so the driver's gate only checks that they run and
return rows.  Both are fully seeded/deterministic, so these tests pin
their exact sf0.01 outputs (captured once, stored under
``tests/golden/``) — upgrading them from "runs" to "exact-match" in the
local mirror.  Their *algorithmic* correctness oracles (brute-force
numpy SemDeDup, closed-form logistic fit) live in
tests/test_semantic_dedup.py and tests/test_classifier.py; this file
guards against silent drift (seed handling, partitioning sensitivity,
float-discipline changes).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
SF_DIR = "/root/testdata/sf0.01"


def _golden(name: str) -> dict:
    with open(os.path.join(GOLDEN_DIR, name)) as fh:
        return json.load(fh)


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_semantic_dedup_golden_assignment(spark):
    golden = _golden("semantic_dedup_sf001.json")
    expected = [tuple(r) for r in golden["rows"]]
    got = [
        (r["vec_id"], r["label"], r["cluster"])
        for r in entry.q_semantic_dedup(spark, SF_DIR).collect()
    ]
    assert len(got) == len(expected)
    assert got == expected, "seeded SemDeDup assignment drifted"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_quality_classifier_golden_counts_and_coefficients(spark):
    golden = _golden("quality_classifier_sf001.json")
    got_counts = [
        [bool(r["pred_en"]), r["n_docs"]]
        for r in entry.q_quality_classifier(spark, SF_DIR).collect()
    ]
    assert got_counts == golden["classifier_counts"]

    # the trained IRLS coefficient vector itself — a much tighter pin
    # than the 2-row count summary
    from muller_spark.operators.classifier import train_logreg
    from muller_spark.operators.text import quality_features

    docs = entry._t(spark, SF_DIR, "documents")
    feats = quality_features(docs, "text").withColumn(
        "label", (F.col("lang") == "en").cast("double")
    )
    cols = ["n_tokens", "stopword_ratio", "punct_ratio", "digit_ratio"]
    w = train_logreg(feats, cols, "label")
    expected = golden["coefficients"]
    assert len(w) == len(expected)
    for i, v in enumerate(w):
        assert float(v) == pytest.approx(expected[str(i)], abs=1e-6), (
            f"IRLS coefficient {i} drifted"
        )
