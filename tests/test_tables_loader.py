"""LazyTables / load_table session-memoization contract (sources/tables.py)."""

from liatrio_otel_collector_spark.sources.tables import TABLES, load_table, load_tables

SF = "/root/testdata/sf0.001"


def test_mapping_contract_matches_eager_dict(spark):
    t = load_tables(spark, SF)
    assert set(iter(t)) == set(TABLES)
    assert len(t) == len(TABLES)
    assert "events" in t and "no_such_table" not in t


def test_unknown_table_raises_keyerror_without_read(spark):
    import pytest

    with pytest.raises(KeyError):
        load_tables(spark, SF)["no_such_table"]


def test_memoized_per_session_and_per_path(spark):
    a = load_table(spark, SF, "region")
    b = load_table(spark, SF + "/", "region")  # realpath-normalized key
    assert a is b
    c = load_table(spark, "/root/testdata/sf0.01", "region")
    assert c is not a  # different sf dir -> different plan


def test_cache_lives_on_the_session_object(spark):
    load_table(spark, SF, "nation")
    cache = spark._lotc_table_cache
    assert any(k[1] == "nation" for k in cache)
