import pytest

from subont.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # shuffle=1: fixture tables are tiny; scheduling overhead dominates.
    s = get_spark("subont-tests", cores=8, shuffle_partitions=1)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def dummy_extraction(spark):
    """Shared end-to-end extraction on the reference CI fixture."""
    from subont import fixtures
    from subont.pipeline import compute_subontology

    ont = fixtures.dummy_ontology(spark)
    res = compute_subontology(spark, ont, [fixtures.FOCUS], compute_rf2=True)
    return ont, res
