"""Keyed side-table CRUD (API-key store analog of the reference's
security service; see sinks/keystore.py docstring for the mapping)."""

from document_ai_spark.sinks.keystore import KeyStore


def test_keystore_crud_roundtrip(spark, tmp_path):
    ks = KeyStore(spark, str(tmp_path / "keys"))
    assert ks.read().count() == 0

    ks.create("k-boot", "bootstrap", is_initial=True, ts=1.0)
    ks.create("k-alice", "alice", ts=2.0)
    ks.create("k-bob", "bob", ts=3.0)
    assert ks.read().count() == 3

    # create is insert-or-REPLACE on the unique key
    ks.create("k-alice", "alice-rotated", ts=4.0)
    rows = {r.key: r for r in ks.read().collect()}
    assert len(rows) == 3 and rows["k-alice"].name == "alice-rotated"

    # validate touches last_used_at only for the matched active key
    assert ks.validate("k-alice", ts=10.0) is True
    assert ks.validate("missing", ts=11.0) is False
    rows = {r.key: r for r in ks.read().collect()}
    assert rows["k-alice"].last_used_at == 10.0
    assert rows["k-bob"].last_used_at is None

    assert ks.delete_by_key("k-bob") == 1
    assert ks.delete_by_key("k-bob") == 0
    assert ks.delete_initial() == 1  # the bootstrap key
    assert {r.key for r in ks.read().collect()} == {"k-alice"}


def test_keystore_inactive_key_rejected(spark, tmp_path):
    from pyspark.sql import functions as F

    ks = KeyStore(spark, str(tmp_path / "keys"))
    ks.create("k-old", "retired", ts=1.0)
    ks._swap_in(ks.read().withColumn("is_active", F.lit(False)))
    assert ks.validate("k-old", ts=2.0) is False
    # and last_used_at must NOT have been touched
    assert ks.read().collect()[0].last_used_at is None
