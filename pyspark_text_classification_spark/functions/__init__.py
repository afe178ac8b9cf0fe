from pyspark_text_classification_spark.functions.text import (  # noqa: F401
    ENGLISH_STOPWORDS,
    TOKEN_PATTERN,
    guard_empty_tokens,
    normalize_binary_label,
    positive_probability,
    remove_stopwords,
    round_half_up,
    sql_round_half_up,
    sql_string_list,
    tokenize,
)
