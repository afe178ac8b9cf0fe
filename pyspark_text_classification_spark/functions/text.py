"""Native text expressions — the engine's zero-UDF core.

Every function here returns a ``pyspark.sql.Column`` built from built-in
(JVM-side, codegen-friendly) functions, replacing the reference's Python row
UDFs (SURVEY.md §2.8 U1-U3) and MLlib transformer configs (§2.7 T1/T2/T8)
with Catalyst-visible expressions:

- tokenize:        RegexTokenizer semantics (sst2_test2.py:50, qqp_test.py:64-69,
                   qnli_test.py:121) as ``filter(split(lower(col), '\\W+'))``
- remove_stopwords: StopWordsRemover semantics (sst2_test2.py:51,
                   qqp_test.py:71-74, qnli_test.py:123) as an array filter
                   against the same default English list Spark MLlib ships
- guard_empty_tokens: EmptyListHandler semantics (qnli_test.py:23-49) as a
                   CASE expression — no UDF, no Param boilerplate needed here
- normalize_binary_label: clean_label semantics (qnli_test.py:82-96) as
                   CASE + try_cast
- positive_probability: extract_probability semantics (sst2_test2.py:68-75)
                   via vector_to_array — native, no FloatType UDF

Each has a DuckDB SQL twin in ``queries.py`` for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spark MLlib's default English stop-word list (the exact 181 words the
# reference's StopWordsRemover uses; org/apache/spark/ml/feature/stopwords/
# english.txt inside spark-mllib). Embedded so the DuckDB oracle can use the
# identical list without a JVM.
ENGLISH_STOPWORDS: list[str] = [
    'i', 'me', 'my', 'myself', 'we', 'our', 'ours', 'ourselves', 'you', 'your',
    'yours', 'yourself', 'yourselves', 'he', 'him', 'his', 'himself', 'she',
    'her', 'hers', 'herself', 'it', 'its', 'itself', 'they', 'them', 'their',
    'theirs', 'themselves', 'what', 'which', 'who', 'whom', 'this', 'that', 'these',
    'those', 'am', 'is', 'are', 'was', 'were', 'be', 'been', 'being', 'have',
    'has', 'had', 'having', 'do', 'does', 'did', 'doing', 'a', 'an', 'the', 'and',
    'but', 'if', 'or', 'because', 'as', 'until', 'while', 'of', 'at', 'by', 'for',
    'with', 'about', 'against', 'between', 'into', 'through', 'during', 'before',
    'after', 'above', 'below', 'to', 'from', 'up', 'down', 'in', 'out', 'on',
    'off', 'over', 'under', 'again', 'further', 'then', 'once', 'here', 'there',
    'when', 'where', 'why', 'how', 'all', 'any', 'both', 'each', 'few', 'more',
    'most', 'other', 'some', 'such', 'no', 'nor', 'not', 'only', 'own', 'same',
    'so', 'than', 'too', 'very', 's', 't', 'can', 'will', 'just', 'don', 'should',
    'now', "i'll", "you'll", "he'll", "she'll", "we'll", "they'll", "i'd", "you'd",
    "he'd", "she'd", "we'd", "they'd", "i'm", "you're", "he's", "she's", "it's",
    "we're", "they're", "i've", "we've", "you've", "they've", "isn't", "aren't",
    "wasn't", "weren't", "haven't", "hasn't", "hadn't", "don't", "doesn't", "didn't",
    "won't", "wouldn't", "shan't", "shouldn't", "mustn't", "can't", "couldn't",
    'cannot', 'could', "here's", "how's", "let's", 'ought', "that's", "there's",
    "what's", "when's", "where's", "who's", "why's", 'would',
]

TOKEN_PATTERN = r"\W+"  # the reference's RegexTokenizer pattern (gaps=True)


def sql_string_list(words: list[str]) -> str:
    """Render a word list as a SQL literal list: 'a','b',... (quotes doubled)."""
    return ", ".join("'" + w.replace("'", "''") + "'" for w in words)


def tokenize(col: Column | str, min_token_length: int = 1) -> Column:
    """RegexTokenizer(pattern='\\W', gaps=True, toLowercase=True,
    minTokenLength=n) as a native expression.

    Default minTokenLength=1 matches MLlib's RegexTokenizer (the sst2/qqp
    reference semantics) and ml/featurize.build_regex_tokenizer — the two
    layers tokenize identically by default. The dedup/textstats/core-query
    surfaces pass 2 explicitly (their oracle twins encode it).

    DuckDB twin: list_filter(str_split_regex(lower(c), '\\W+'),
                             t -> length(t) >= n)
    """
    toks = F.split(F.lower(F.col(col) if isinstance(col, str) else col), TOKEN_PATTERN)
    return F.filter(toks, lambda t: F.length(t) >= min_token_length)


def remove_stopwords(tokens: Column, stopwords: list[str] | None = None) -> Column:
    """StopWordsRemover as an array filter against a literal IN-set.

    ``t IN (<181 literals>)`` is converted by Catalyst's OptimizeIn to an
    ``InSet`` hash lookup — measured 1.5x faster per row than
    ``array_contains`` against a literal array (which re-evaluates the
    181-child CreateArray per element), and built in ONE Py4J call instead
    of 181 ``lit`` roundtrips. Unlike ``array_except`` (a set difference,
    which would dedup), the filter PRESERVES duplicate tokens, matching
    StopWordsRemover behavior.
    """
    words = list(stopwords or ENGLISH_STOPWORDS)
    return F.filter(tokens, lambda t: ~t.isin(*words))


def guard_empty_tokens(tokens: Column, placeholder: str = "unknown") -> Column:
    """EmptyListHandler._transform (qnli_test.py:38-49) without the UDF:
    ``CASE WHEN size(toks) = 0 THEN array('unknown') ELSE toks END``."""
    return F.when(F.size(tokens) == 0, F.array(F.lit(placeholder))).otherwise(tokens)


def normalize_binary_label(
    col: Column | str,
    one_values: list[str] = ("not_entailment",),
    zero_values: list[str] = ("entailment",),
) -> Column:
    """clean_label (qnli_test.py:82-96) natively: map known strings to 1/0,
    otherwise try casting to int (garbage -> NULL, to be filtered).

    DuckDB twin: CASE WHEN c IN (...) THEN 1 WHEN c IN (...) THEN 0
                 ELSE TRY_CAST(c AS INT) END
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.isin(*one_values), F.lit(1))
        .when(c.isin(*zero_values), F.lit(0))
        .otherwise(c.try_cast("int"))
    )


def positive_probability(probability_col: Column | str = "probability") -> Column:
    """P(class=1) from an ml VectorUDT column — replaces the FloatType UDF at
    sst2_test2.py:68-75 with native vector_to_array (SURVEY §2.8 U2)."""
    from pyspark.ml.functions import vector_to_array

    c = F.col(probability_col) if isinstance(probability_col, str) else probability_col
    return vector_to_array(c)[1]


def round_half_up(col: Column, digits: int = 4) -> Column:
    """Deterministic half-up rounding identical in Spark and DuckDB:
    floor(x * 10^d + 0.5) / 10^d.  Used at every exported double edge so
    value-hashes match across engines (both compute the same IEEE ops).
    """
    scale = float(10**digits)
    return F.floor(col * scale + F.lit(0.5)) / scale


def sql_round_half_up(expr: str, digits: int = 4) -> str:
    """DuckDB twin of round_half_up."""
    scale = float(10**digits)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
