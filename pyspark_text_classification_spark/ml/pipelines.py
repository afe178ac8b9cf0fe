"""The three reference training recipes as Pipeline builders
(SURVEY.md §2.8 M1/M2; sst2_test2.py, qqp_test.py, qnli_test.py).

Each returns an unfit ``pyspark.ml.Pipeline`` whose stages carry the
reference's exact hyperparameters; ``fit`` on a (text, label) DataFrame.
Training input is cached before fit (the reference recomputed its cleaned
set for every action — SURVEY §4 'Caching').
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.sql import DataFrame

from pyspark_text_classification_spark.ml.featurize import (
    EmptyTokenGuard,
    build_count_vectorizer,
    build_hashing_tf,
    build_idf,
    build_regex_tokenizer,
    build_stopwords_remover,
    build_word2vec,
)


def sst2_recipe(text_col: str = "text", label_col: str = "label") -> Pipeline:
    """TF-IDF + LR: RegexTokenizer -> StopWords -> CountVectorizer(3000)
    -> IDF -> LR(maxIter=10)  (sst2_test2.py:50-59)."""
    return Pipeline(
        stages=[
            build_regex_tokenizer(text_col, "words"),
            build_stopwords_remover("words", "filtered_words"),
            build_count_vectorizer("filtered_words", "raw_features", 3000),
            build_idf("raw_features", "features"),
            LogisticRegression(
                featuresCol="features", labelCol=label_col, maxIter=10
            ),
        ]
    )


def qqp_recipe(text_col: str = "text", label_col: str = "label") -> Pipeline:
    """Hashing-TF-IDF + LR: RegexTokenizer -> StopWords -> HashingTF(2^16)
    -> IDF(minDocFreq=5) -> LR(maxIter=100, regParam=0.01,
    elasticNetParam=0.5)  (qqp_test.py:64-100)."""
    return Pipeline(
        stages=[
            build_regex_tokenizer(text_col, "words"),
            build_stopwords_remover("words", "filtered_words"),
            build_hashing_tf("filtered_words", "raw_features", 2**16),
            build_idf("raw_features", "features", min_doc_freq=5),
            LogisticRegression(
                featuresCol="features",
                labelCol=label_col,
                maxIter=100,
                regParam=0.01,
                elasticNetParam=0.5,
            ),
        ]
    )


def qnli_recipe(text_col: str = "text", label_col: str = "label") -> Pipeline:
    """Word2Vec + LR: RegexTokenizer(minTokenLength=2) -> EmptyTokenGuard
    -> StopWords -> Word2Vec(100, minCount=10) -> LR(maxIter=20,
    regParam=0.05, elasticNetParam=0.8)  (qnli_test.py:121-140).

    Stage order note: the guard runs BEFORE stopword removal as in the
    reference, and again implicitly protects Word2Vec because minCount
    filtering can still empty a doc's contribution (not its row)."""
    return Pipeline(
        stages=[
            build_regex_tokenizer(text_col, "words", min_token_length=2),
            EmptyTokenGuard(inputCol="words", outputCol="guarded_words"),
            build_stopwords_remover("guarded_words", "filtered_words"),
            EmptyTokenGuard(inputCol="filtered_words", outputCol="safe_words"),
            build_word2vec("safe_words", "features", 100, min_count=10),
            LogisticRegression(
                featuresCol="features",
                labelCol=label_col,
                maxIter=20,
                regParam=0.05,
                elasticNetParam=0.8,
            ),
        ]
    )


RECIPES = {"sst2": sst2_recipe, "qqp": qqp_recipe, "qnli": qnli_recipe}


def save_model(model: PipelineModel, path: str) -> None:
    """S6 model sink: distributed PipelineModel persistence with overwrite
    (qnli_test.py:254-265 pattern, minus the driver-side fallback — custom
    stages persist via DefaultParamsWritable, see featurize.EmptyTokenGuard)."""
    model.write().overwrite().save(path)


def load_model(path: str) -> PipelineModel:
    """S6 model source (sst2_test2.py:4 PipelineModel reload pattern)."""
    return PipelineModel.load(path)


def fit_text_classifier(
    train: DataFrame,
    recipe: str = "sst2",
    text_col: str = "text",
    label_col: str = "label",
) -> PipelineModel:
    """Cache the (pruned) training projection, fit the recipe, unpersist."""
    cols = train.select(text_col, label_col).cache()
    try:
        return RECIPES[recipe](text_col, label_col).fit(cols)
    finally:
        cols.unpersist()
