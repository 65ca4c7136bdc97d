"""DDL parser + schema registry evolution tests.

Corpus modeled on the reference's real-world ALTER strings
(``internal/sync_server/sync_test.go:126-156``): dbeaver comment
prefixes, add/drop/change, FIRST/AFTER placement, ``int (5)`` with a
space, backticked identifiers (which the reference's space-split
tokenizer can NOT handle — deliberate robustness divergence).
"""

from __future__ import annotations

from pyspark.sql import types as T

from galaxy_spark.cdc.ddl import (
    AddColumn, DropColumn, ModifyColumn, RenameColumn, parse_alter,
)
from galaxy_spark.cdc.schema_registry import (
    ColumnDef, SchemaRegistry, mysql_type_to_spark,
)


def _registry():
    reg = SchemaRegistry()
    reg.put("test", "casbin_rule", [
        ColumnDef("id", "bigint", True),
        ColumnDef("ptype", "varchar(100)"),
        ColumnDef("v0", "varchar(100)"),
        ColumnDef("v1", "varchar(100)"),
    ])
    return reg


# --- parser ---------------------------------------------------------

def test_parse_dbeaver_comment_change():
    stmt = parse_alter(
        "/* ApplicationName=DBeaver 21.1.0 - SQLEditor <Script-50.sql> */"
        "alter table test.casbin_rule change a22g22e2x vx int(64) default 20 null")
    assert stmt.database == "test" and stmt.table == "casbin_rule"
    assert stmt.ops == (RenameColumn("a22g22e2x", "vx", "int(64)"),)


def test_parse_add_after_and_first():
    s1 = parse_alter("alter table test.casbin_rule add age int(4) default 20 after v0")
    assert s1.ops == (AddColumn("age", "int(4)", "AFTER:v0"),)
    s2 = parse_alter("alter table test_table add test int (5) default 4  first")
    assert s2.database is None and s2.table == "test_table"
    assert s2.ops == (AddColumn("test", "int(5)", "FIRST"),)


def test_parse_drop_with_and_without_column_kw():
    assert parse_alter("ALTER TABLE test.casbin_rule DROP COLUMN num").ops == \
        (DropColumn("num"),)
    assert parse_alter("alter table test.casbin_rule drop v1").ops == \
        (DropColumn("v1"),)


def test_parse_add_varchar_null():
    stmt = parse_alter(
        "/* ApplicationName=DBeaver 21.1.0 - Main */ "
        "alter table test.casbin_rule add xxs varchar(100) null")
    assert stmt.ops == (AddColumn("xxs", "varchar(100)", None),)


def test_parse_modify_and_charset_change():
    stmt = parse_alter(
        "ALTER TABLE test.casbin_rule MODIFY COLUMN v2 varchar(300) "
        "CHARACTER SET utf8mb4 COLLATE utf8mb4_general_ci NULL")
    assert stmt.ops == (ModifyColumn("v2", "varchar(300)", None),)
    stmt2 = parse_alter(
        "ALTER TABLE test.casbin_rule CHANGE v2_v2 v2 varchar(100) "
        "CHARACTER SET utf8mb4 COLLATE utf8mb4_general_ci NULL")
    assert stmt2.ops == (RenameColumn("v2_v2", "v2", "varchar(100)"),)


def test_parse_backticks_and_multi_spec():
    stmt = parse_alter(
        "ALTER TABLE `test`.`casbin_rule` ADD COLUMN `score` decimal(10,2) NOT NULL, "
        "DROP COLUMN `v1`")
    assert stmt.database == "test" and stmt.table == "casbin_rule"
    assert stmt.ops == (AddColumn("score", "decimal(10,2)", None), DropColumn("v1"))


def test_parse_non_alter_returns_none():
    assert parse_alter("BEGIN") is None
    assert parse_alter("CREATE TABLE x (a int)") is None
    assert parse_alter("insert into t values (1)") is None
    assert parse_alter("") is None


# --- registry evolution ----------------------------------------------

def test_evolution_add_drop_rename_sequence():
    reg = _registry()
    assert reg.apply_ddl("test", "alter table casbin_rule add age int(4) default 20 after v0")
    assert reg.column_names("test", "casbin_rule") == ["id", "ptype", "v0", "age", "v1"]
    assert reg.apply_ddl("test", "alter table test.casbin_rule drop column v1")
    assert reg.column_names("test", "casbin_rule") == ["id", "ptype", "v0", "age"]
    assert reg.apply_ddl("test", "alter table test.casbin_rule change age vx int(64) null")
    assert reg.column_names("test", "casbin_rule") == ["id", "ptype", "v0", "vx"]
    ts = reg.get("test", "casbin_rule")
    assert len(ts.history) == 3
    # each delta stores the (old, new) snapshot pair like the
    # reference's {Old, Def}
    assert [c.name for c in ts.history[0][0]] == ["id", "ptype", "v0", "v1"]
    assert [c.name for c in ts.history[-1][1]] == ["id", "ptype", "v0", "vx"]


def test_evolution_first_and_idempotent_add():
    reg = _registry()
    reg.apply_ddl("test", "alter table casbin_rule add test int (5) default 4  first")
    assert reg.column_names("test", "casbin_rule")[0] == "test"
    # re-adding an existing column is a no-op (baseinfo.go:187-191)
    assert not reg.apply_ddl("test", "alter table casbin_rule add test int(5) first")


def test_evolution_added_column_keeps_type():
    reg = _registry()
    reg.apply_ddl("test", "alter table casbin_rule add score decimal(10,2) null")
    ts = reg.get("test", "casbin_rule")
    assert ts.columns[-1] == ColumnDef("score", "decimal(10,2)")
    assert ts.struct_type()["score"].dataType == T.DecimalType(10, 2)


def test_evolution_unknown_table_noop():
    reg = _registry()
    assert not reg.apply_ddl("test", "alter table nope add x int(4)")
    assert not reg.apply_ddl("other", "alter table casbin_rule add x int(4)")


def test_modify_updates_type():
    reg = _registry()
    reg.apply_ddl("test", "alter table casbin_rule modify column v0 varchar(300) null")
    assert reg.get("test", "casbin_rule").columns[2] == \
        ColumnDef("v0", "varchar(300)")


# --- persistence + type mapping --------------------------------------

def test_save_load_roundtrip(tmp_path):
    reg = _registry()
    reg.apply_ddl("test", "alter table casbin_rule add score decimal(10,2)")
    p = str(tmp_path / "registry.json")
    reg.save(p)
    reg2 = SchemaRegistry.load(p)
    assert reg2.column_names("test", "casbin_rule") == \
        reg.column_names("test", "casbin_rule")
    assert len(reg2.get("test", "casbin_rule").history) == 1


def test_mysql_type_mapping():
    assert mysql_type_to_spark("decimal(18,4)") == T.DecimalType(18, 4)
    assert mysql_type_to_spark("bigint(20)") == T.LongType()
    assert mysql_type_to_spark("int(64)") == T.IntegerType()
    assert mysql_type_to_spark("int(10) unsigned") == T.LongType()
    assert mysql_type_to_spark("tinyint(1)") == T.BooleanType()
    assert mysql_type_to_spark("varchar(100)") == T.StringType()
    assert mysql_type_to_spark("datetime") == T.TimestampType()
    assert mysql_type_to_spark("longblob") == T.BinaryType()
    assert mysql_type_to_spark(None) == T.StringType()


def test_struct_type_nullability():
    reg = _registry()
    st = reg.get("test", "casbin_rule").struct_type()
    assert st["id"].nullable is False
    assert st["v0"].nullable is True


def test_index_and_constraint_ddl_is_schema_neutral():
    """ADD/DROP INDEX|KEY|PRIMARY KEY|FOREIGN KEY|CONSTRAINT must
    never be read as column ops — 'ADD INDEX idx(email)' once
    inserted a phantom column named 'index' and quarantined every
    later row of the table on arity; 'DROP KEY x' once deleted a
    real column named 'key'. The bare keyword means an index op
    only WITHOUT the COLUMN keyword: quoted/COLUMN-prefixed columns
    named 'key'/'index' still parse as columns."""
    neutral = [
        "ALTER TABLE t ADD INDEX idx_email (email)",
        "ALTER TABLE t ADD KEY k1 (a, b)",
        "ALTER TABLE t ADD UNIQUE INDEX u1 (a)",
        "ALTER TABLE t ADD PRIMARY KEY (id)",
        "ALTER TABLE t ADD CONSTRAINT fk FOREIGN KEY (a) REFERENCES r(b)",
        "ALTER TABLE t DROP KEY idx_users_email",
        "ALTER TABLE t DROP INDEX i1",
        "ALTER TABLE t DROP PRIMARY KEY",
        "ALTER TABLE t DROP FOREIGN KEY fk1",
        "ALTER TABLE t RENAME TO t2",
        "ALTER TABLE t RENAME KEY k1 TO k2",
    ]
    for q in neutral:
        assert parse_alter(q) is None, q

    st = parse_alter("ALTER TABLE t ADD COLUMN key int")
    assert st.ops == (AddColumn("key", "int", None),)
    st = parse_alter("ALTER TABLE t DROP COLUMN `index`")
    assert st.ops == (DropColumn("index"),)
    st = parse_alter("ALTER TABLE t ADD COLUMN c int, ADD INDEX ix (c)")
    assert st.ops == (AddColumn("c", "int", None),)


def test_rename_column_8_0_syntax():
    """MySQL 8.0 'RENAME COLUMN old TO new' — arity-neutral, so
    silently skipping it left every later projection under the
    obsolete name (no quarantine to surface it)."""
    st = parse_alter("ALTER TABLE t RENAME COLUMN old_c TO new_c")
    assert st.ops == (RenameColumn("old_c", "new_c", None),)
