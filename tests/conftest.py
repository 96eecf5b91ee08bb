import pytest


@pytest.fixture(scope="session")
def spark():
    from westa_ocr_spark.session import get_spark

    spark = get_spark(app_name="westa_ocr_spark_tests", master="local[4]",
                      shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def pages_parquet(tmp_path_factory):
    """Seeded 200-row pages table on disk (shared across spark tests)."""
    from westa_ocr_spark.corpus import write_pages_parquet

    path = tmp_path_factory.mktemp("corpus") / "pages"
    return write_pages_parquet(str(path), n=200, seed=42,
                               rows_per_file=50)
