"""Trainable quality classifier over engineered text features.

Public technique: the "quality classifier" gate that WebText/GPT-3
(Brown et al. 2020, Appendix A) and CCNet (Wenzek et al. 2020) run over
scraped corpora — train a linear model to separate a target domain
(curated reference text) from the raw crawl, then keep documents the
model scores as target-like. The reference engine has no ML surface at
all (SQL-only QueryData, ``internal/query/engine.go``); this extends
the LLM-pipeline family with the distributed-training step.

Spark shape: features are the existing zero-shuffle quality signals
(token counts, type-token ratio, stopword/punctuation ratios) assembled
JVM-side; training is ``pyspark.ml`` LogisticRegression — L-BFGS over
``treeAggregate`` gradient sums, the standard distributed linear-model
path that scales with executors, not driver memory. Scoring is a pure
map (model broadcast by MLlib), so gating a 100 TB corpus is one narrow
scan + one projection.

The fixture corpus has no curated-vs-crawl split (every doc is the same
synthetic word soup), so the registry entry validates the TRAINING AND
SCORING PLUMBING against a label that is genuinely learnable from the
features — document length class (above/below the exact corpus median).
Held-out AUC must be near-perfect precisely because the signal is
clean; a feature-assembly, label-alignment, or train/test-leak bug
drops it. Production swaps the label column for wiki-vs-crawl; every
other line stays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import fixture_df

FEATURE_COLS = [
    "n_tokens", "ttr", "avg_token_len", "stopword_ratio", "punct_ratio",
]


def quality_features(df: DataFrame, col: str = "text") -> DataFrame:
    """Engineered per-document quality features — composed from the
    SAME expression definitions the quality operators use
    (``text.text_stats`` + ``text.quality_signals``), so a change to
    e.g. the stopword set or punctuation definition reaches the trained
    classifier automatically instead of silently drifting. All codegen
    expressions, narrow text scan, zero shuffle."""
    from .text import quality_signals, text_stats

    return quality_signals(text_stats(df, col), col)


def train_quality_classifier(train_df: DataFrame, label_col: str = "label"):
    """Fit the linear quality gate. Returns (assembler, model); apply
    with :func:`score_quality` — MLlib broadcasts the coefficient
    vector, so scoring is shuffle-free."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    va = VectorAssembler(
        inputCols=FEATURE_COLS, outputCol="features", handleInvalid="skip"
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        maxIter=50,
        regParam=0.01,
        standardization=True,
    )
    return va, lr.fit(va.transform(train_df))


def score_quality(df: DataFrame, va, model) -> DataFrame:
    """Model scores for a featurized corpus — a pure projection."""
    return model.transform(va.transform(df))


def register_queries(register) -> None:
    @register(
        "quality_classifier_auc",
        """
        SELECT true AS auc_ok,
               (SELECT CAST(count(*) AS BIGINT) FROM documents
                 WHERE doc_id % 2 = 0) AS n_train,
               (SELECT CAST(count(*) AS BIGINT) FROM documents
                 WHERE doc_id % 2 = 1) AS n_test
        """,
        doc="trainable quality-classifier gate (GPT-3 Appendix A / CCNet "
            "shape): pyspark.ml logistic regression over engineered "
            "zero-shuffle text features, trained on even doc_ids and "
            "evaluated on held-out odd doc_ids; the learnable reference "
            "label (length class vs the exact corpus median) must yield "
            "held-out AUC >= 0.9 — feature-assembly or leak bugs break it",
        tags=("llm", "capability"),
    )
    def quality_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.ml.evaluation import BinaryClassificationEvaluator

        docs = fixture_df(spark, sf_dir, "documents")
        median = docs.agg(F.expr("percentile(n_chars, 0.5)")).first()[0]
        feat = quality_features(docs).withColumn(
            "label", (F.col("n_chars") > F.lit(float(median))).cast("double")
        )
        train = feat.filter(F.col("doc_id") % 2 == 0)
        test = feat.filter(F.col("doc_id") % 2 == 1)
        va, model = train_quality_classifier(train)
        scored = score_quality(test, va, model)
        auc = BinaryClassificationEvaluator(
            labelCol="label", metricName="areaUnderROC"
        ).evaluate(scored)
        return spark.createDataFrame(
            [(bool(auc >= 0.9), train.count(), test.count())],
            "auc_ok boolean, n_train long, n_test long",
        )
