"""Tag lifetime (Tag.java tagCreateTime/tagTimeRetained + TagTimeExpire;
CoreOptions tag.default-time-retained, tag.time-expire-enabled) and
tag.automatic-completion backfill."""

from __future__ import annotations

import json
import os


def _age_tag(t, name, ms):
    p = os.path.join(t.snapshots.tag_dir, f"tag-{name}")
    doc = json.load(open(p))
    doc["tagCreateTime"] -= ms
    json.dump(doc, open(p, "w"))


def test_time_retained_tag_expires(spark, warehouse):
    t = warehouse.create_table("db.tg1", "id bigint")
    t.write(spark.createDataFrame([(1,)], "id bigint"))
    t.create_tag("ephemeral", time_retained="1 h")
    t.create_tag("forever")
    assert t.snapshots.expire_tags_by_time() == []
    _age_tag(t, "ephemeral", 2 * 3_600_000)
    assert t.snapshots.expire_tags_by_time() == ["ephemeral"]
    assert set(t.snapshots.tags()) == {"forever"}


def test_default_time_retained_option(spark, warehouse):
    t = warehouse.create_table(
        "db.tg2", "id bigint",
        options={"tag.default-time-retained": "1 h"},
    )
    t.write(spark.createDataFrame([(1,)], "id bigint"))
    t.create_tag("auto-bounded")
    p = os.path.join(t.snapshots.tag_dir, "tag-auto-bounded")
    doc = json.load(open(p))
    assert doc["tagTimeRetained"] == 3_600_000


def test_expiry_runs_at_commit(spark, warehouse):
    t = warehouse.create_table("db.tg3", "id bigint")
    t.write(spark.createDataFrame([(1,)], "id bigint"))
    t.create_tag("old", time_retained="1 s")
    _age_tag(t, "old", 60_000)
    t.write(spark.createDataFrame([(2,)], "id bigint"))  # commit hook fires
    assert "old" not in t.snapshots.tags()
    # opt-out
    t2 = warehouse.create_table(
        "db.tg4", "id bigint",
        options={"tag.time-expire-enabled": "false"},
    )
    t2.write(spark.createDataFrame([(1,)], "id bigint"))
    t2.create_tag("old", time_retained="1 s")
    _age_tag(t2, "old", 60_000)
    t2.write(spark.createDataFrame([(2,)], "id bigint"))
    assert "old" in t2.snapshots.tags()


def test_create_tag_procedure_time_retained(spark, tmp_path):
    from flink_table_store_spark.catalog import Catalog
    from flink_table_store_spark.sql import SqlSession

    cat = Catalog(str(tmp_path / "wh"))
    s = SqlSession(spark, cat)
    s.sql("CREATE TABLE db.tgp (id bigint)")
    t = cat.get_table("db.tgp")
    t.write(spark.createDataFrame([(1,)], "id bigint"))
    s.sql(
        "CALL sys.create_tag(table => 'db.tgp', tag => 'rel', "
        "time_retained => '2 h')"
    )
    doc = json.load(open(os.path.join(t.snapshots.tag_dir, "tag-rel")))
    assert doc["tagTimeRetained"] == 2 * 3_600_000


def test_automatic_completion_backfills_gaps(spark, warehouse, tmp_path):
    from flink_table_store_spark.procedures import call
    from flink_table_store_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh2"))
    t = cat.create_table(
        "db.tg5", "id bigint",
        options={
            "tag.automatic-creation": "process-time",
            "tag.creation-period": "daily",
            "tag.automatic-completion": "true",
        },
    )
    t.write(spark.createDataFrame([(1,)], "id bigint"))
    # simulate an auto tag from 3 days ago
    import datetime as dt

    old = (dt.datetime.utcnow() - dt.timedelta(days=3)).strftime("%Y-%m-%d")
    t.create_tag(old)
    created = call(spark, cat, "trigger_tag_automatic_creation", table="db.tg5")
    today = dt.datetime.utcnow().strftime("%Y-%m-%d")
    tags = set(t.snapshots.tags())
    # the two intermediate days were backfilled, today's tag created
    assert len(tags) == 4
    assert today in tags and old in tags
    assert sorted(created) == sorted(tags - {old})
