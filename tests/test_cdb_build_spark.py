"""Spark CDB-build job vs the driver-side exact build: golden dict
equality, the reference's own test strategy (tests/test_cdb_maker.py:44-112
asserts exact cui2names/name2cuis/name2cuis2status/... contents)."""

import pytest

from medcat_spark.cdb_build import build_cdb_tables, collect_cdb_model
from medcat_spark.config import EngineConfig
from medcat_spark.fixtures import build_fixture_cdb


@pytest.fixture(scope="module")
def spark_cdb(spark, concepts_df):
    tables = build_cdb_tables(concepts_df, EngineConfig())
    return collect_cdb_model(tables, EngineConfig())


@pytest.fixture(scope="module")
def exact_cdb():
    return build_fixture_cdb(EngineConfig())


def test_name2cuis_equal(spark_cdb, exact_cdb):
    assert spark_cdb.name2cuis == exact_cdb.name2cuis


def test_name2cuis2status_equal(spark_cdb, exact_cdb):
    assert spark_cdb.name2cuis2status == exact_cdb.name2cuis2status


def test_snames_equal(spark_cdb, exact_cdb):
    assert spark_cdb.snames == exact_cdb.snames


def test_cui2names_and_snames_equal(spark_cdb, exact_cdb):
    assert spark_cdb.cui2names == exact_cdb.cui2names
    assert spark_cdb.cui2snames == exact_cdb.cui2snames


def test_cui2preferred_name_equal(spark_cdb, exact_cdb):
    assert spark_cdb.cui2preferred_name == exact_cdb.cui2preferred_name


def test_cui2type_ids_equal(spark_cdb, exact_cdb):
    assert spark_cdb.cui2type_ids == exact_cdb.cui2type_ids


def test_token_vocab_counts_equal(spark_cdb, exact_cdb):
    assert spark_cdb.vocab == exact_cdb.vocab


def test_shared_name_disambiguation_candidates(spark_cdb):
    # 'virus' is shared by C0008 and C0009 in CSV-row order
    assert spark_cdb.name2cuis["virus"] == ["C0008", "C0009"]
    # C0009's later P row overwrites nothing for C0008
    assert spark_cdb.name2cuis2status["virus"] == {"C0008": "A", "C0009": "P"}


def test_parenthesis_removal_for_p_names(spark_cdb):
    # C0004 'Attack (behavior)' with status P registers both the full
    # name (parens skipped as punct -> 'attack~behavior') and the
    # paren-stripped 'attack' (cdb_maker.py:187-191)
    assert spark_cdb.cui2names["C0004"] == {"attack", "attack~behavior"}
    # the parenthesised punct tokens never appear in names/snames
    assert not any("(" in s for s in spark_cdb.snames)
