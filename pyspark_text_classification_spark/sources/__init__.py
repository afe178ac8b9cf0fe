from pyspark_text_classification_spark.sources.csv import (  # noqa: F401
    normalize_columns,
    read_tsv,
)
from pyspark_text_classification_spark.sources.parquet import (  # noqa: F401
    TESTDATA_TABLES,
    load_table,
    load_tables,
    write_parquet,
)
