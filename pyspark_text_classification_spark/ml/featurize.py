"""Featurization layer: MLlib stage builders with the reference's
parameterizations as presets (SURVEY.md §2.7 T1-T8).

Each builder returns a configured, unfit MLlib stage; presets carry the
exact hyperparameters of the reference scripts so the three recipes in
``pipelines.py`` reproduce its behavior. The custom ``EmptyTokenGuard``
reimplements the reference's EmptyListHandler (qnli_test.py:23-49) on the
full Param framework — but its ``_transform`` is a native CASE expression
(functions/text.guard_empty_tokens) instead of the reference's row UDF, so
it stays inside codegen and costs nothing at 100 TB.
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Transformer
from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    HashingTF,
    RegexTokenizer,
    StopWordsRemover,
    StringIndexer,
    Word2Vec,
)
from pyspark.ml.param.shared import HasInputCol, HasOutputCol
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame

from pyspark_text_classification_spark.functions.text import guard_empty_tokens


def build_regex_tokenizer(
    input_col: str = "text",
    output_col: str = "words",
    min_token_length: int = 1,
) -> RegexTokenizer:
    """T1 preset: pattern='\\W' gaps, lowercase (sst2_test2.py:50,
    qqp_test.py:64-69; qnli adds minTokenLength=2, qnli_test.py:121)."""
    return RegexTokenizer(
        inputCol=input_col,
        outputCol=output_col,
        pattern=r"\W",
        gaps=True,
        toLowercase=True,
        minTokenLength=min_token_length,
    )


def build_stopwords_remover(
    input_col: str = "words", output_col: str = "filtered_words"
) -> StopWordsRemover:
    """T2 preset: default English list (sst2_test2.py:51, qnli_test.py:123)."""
    return StopWordsRemover(inputCol=input_col, outputCol=output_col)


def build_count_vectorizer(
    input_col: str = "filtered_words",
    output_col: str = "raw_features",
    vocab_size: int = 3000,
) -> CountVectorizer:
    """T3 preset: vocabSize=3000 (sst2_test2.py:52)."""
    return CountVectorizer(
        inputCol=input_col, outputCol=output_col, vocabSize=vocab_size
    )


def build_hashing_tf(
    input_col: str = "filtered_words",
    output_col: str = "raw_features",
    num_features: int = 2**16,
) -> HashingTF:
    """T4 preset: numFeatures=2^16 (qqp_test.py:76-80)."""
    return HashingTF(
        inputCol=input_col, outputCol=output_col, numFeatures=num_features
    )


def build_idf(
    input_col: str = "raw_features",
    output_col: str = "features",
    min_doc_freq: int = 0,
) -> IDF:
    """T5 preset: minDocFreq=5 at qqp (qqp_test.py:82-86), 0 at sst2."""
    return IDF(inputCol=input_col, outputCol=output_col, minDocFreq=min_doc_freq)


def build_word2vec(
    input_col: str = "filtered_words",
    output_col: str = "features",
    vector_size: int = 100,
    min_count: int = 10,
    seed: int = 42,
) -> Word2Vec:
    """T6 preset: vectorSize=100, minCount=10 (qnli_test.py:126-131);
    seed pinned for reproducible tests (the reference leaves it random)."""
    return Word2Vec(
        inputCol=input_col,
        outputCol=output_col,
        vectorSize=vector_size,
        minCount=min_count,
        seed=seed,
    )


def build_string_indexer(
    input_col: str, output_col: str = "label"
) -> StringIndexer:
    """T7 preset: frequency-descending label index (qqp_test.py:88-91).
    NOTE the reference hazard (SURVEY §7.4.5): the index orders by class
    frequency, so on imbalanced data index 0 is the majority class, not
    face-value 0."""
    return StringIndexer(inputCol=input_col, outputCol=output_col)


class EmptyTokenGuard(
    Transformer,
    HasInputCol,
    HasOutputCol,
    DefaultParamsWritable,
    DefaultParamsReadable,
):
    """T8: replace empty token arrays with ['unknown'] so Word2Vec never
    sees an empty document (reference EmptyListHandler, qnli_test.py:23-49).

    Same Param-framework surface (keyword_only ctor, setParams, get/set,
    DefaultParams persistence) — but the transform is the native CASE
    expression, not a Python row UDF.
    """

    @keyword_only
    def __init__(self, inputCol: str | None = None, outputCol: str | None = None):
        super().__init__()
        self._setDefault(inputCol=None, outputCol=None)
        kwargs = self._input_kwargs
        self.setParams(**kwargs)

    @keyword_only
    def setParams(
        self, inputCol: str | None = None, outputCol: str | None = None
    ) -> "EmptyTokenGuard":
        kwargs = self._input_kwargs
        return self._set(**kwargs)

    def setInputCol(self, value: str) -> "EmptyTokenGuard":
        return self._set(inputCol=value)

    def setOutputCol(self, value: str) -> "EmptyTokenGuard":
        return self._set(outputCol=value)

    def _transform(self, dataset: DataFrame) -> DataFrame:
        in_col = self.getInputCol()
        out_col = self.getOutputCol()
        return dataset.withColumn(
            out_col, guard_empty_tokens(dataset[in_col])
        )
