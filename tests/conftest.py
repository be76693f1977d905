import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from document_parser_private_spark.corpus import (  # noqa: E402
    DOCS_DDL,
    docs_to_rows,
    generate_docs,
)
from document_parser_private_spark.session import get_spark  # noqa: E402

N_TEST_DOCS = 150


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def corpus_rows():
    return docs_to_rows(generate_docs(N_TEST_DOCS, seed=42))


@pytest.fixture(scope="session")
def corpus_df(spark, corpus_rows):
    return spark.createDataFrame(corpus_rows, schema=DOCS_DDL).cache()
