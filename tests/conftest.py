import pytest

from biomedical_el_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def pages(spark):
    from biomedical_el_spark.datagen.pages import generate_pages

    return generate_pages(spark, 400, cluster_size=4).cache()
