"""Every registered query with an oracle must hash-match DuckDB at sf0.001 —
the local mirror of the driver's t2 correctness gate (it runs sf0.01)."""

import pytest

from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.plans import registry

from .oracle_utils import assert_oracle_match

ORACLES = registry.oracle_sql()
ALL = registry.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck, sf_dir):
    df = ALL[name](spark, sf_dir)
    assert_oracle_match(df, duck, ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(set(ALL) - set(ORACLES)))
def test_rows_only(name, spark, sf_dir):
    df = ALL[name](spark, sf_dir)
    assert df.count() >= 0
