"""Session-layer tests: prepared statements, pending results, interrupt
(reference src/main_entry behavior)."""

import pytest

import sqlrs_tpu
from sqlrs_tpu.errors import ExecutorError


@pytest.fixture()
def db():
    d = sqlrs_tpu.Database()
    d.run("create table t(a int, b int); insert into t values (1,10),(2,20),(3,30)")
    return d


def test_query_roundtrip(db):
    ctx = db.connect()
    res = ctx.query("select a, b from t where a > 1")
    assert res.names == ["a", "b"]
    assert res.lines() == ["2 20", "3 30"]
    assert res.row_count() == 2


def test_prepared_statement_reexecution(db):
    ctx = db.connect()
    prep = ctx.prepare("select sum(b) from t")
    r1 = ctx.execute_prepared(prep)
    assert r1.lines() == ["60"]
    db.run("insert into t values (4, 40)")
    r2 = ctx.execute_prepared(prep)
    assert r2.lines() == ["100"]  # plan re-runs over fresh data


def test_pending_invalidated_by_next_query(db):
    ctx = db.connect()
    p1 = ctx.pending_query("select a from t")
    p2 = ctx.pending_query("select b from t")
    with pytest.raises(ExecutorError):
        p1.execute()
    assert p2.execute().row_count() == 3


def test_interrupt(db):
    ctx = db.connect()
    p = ctx.pending_query("select a from t")
    ctx.interrupt()
    with pytest.raises(ExecutorError):
        p.execute()


def test_profile_report(db):
    d2 = sqlrs_tpu.Database(profile=True)
    d2.run("create table t(a int); insert into t values (1),(2)")
    d2.run("select a from t where a > 1")
    rep = d2.last_profile.report()
    assert "TableScan" in rep and "Filter" in rep


def test_cli_engine_personality_toggle(db, capsys, monkeypatch):
    """Reference src/cli.rs:17-31: typing `enable_v2` flips the session into
    the v2 engine personality (statements route through ClientContext.query,
    the v2 session API); ENABLE_V2=1 presets it. Union engine => identical
    results either way."""
    from sqlrs_tpu.cli import Cli

    monkeypatch.delenv("ENABLE_V2", raising=False)
    cli = Cli(db)
    assert cli.enable_v2 is False
    cli.run_sql("select a from t where a > 1")
    v1_out = capsys.readouterr().out
    assert "2" in v1_out and "3" in v1_out

    cli.run_sql("enable_v2")
    assert cli.enable_v2 is True
    assert "enable sqlrs v2" in capsys.readouterr().out

    cli.run_sql("select a from t where a > 1")
    v2_out = capsys.readouterr().out
    assert "2" in v2_out and "3" in v2_out
    # v2 path went through ClientContext (prepared statement machinery)
    assert cli._context is not None

    monkeypatch.setenv("ENABLE_V2", "1")
    assert Cli(db).enable_v2 is True


def test_v2_explain_populates_plan_strings(db):
    """ADVICE round 4 (medium): `explain` through ClientContext must emit
    the same three plan strings the v1 session path does (reference v2
    materializes them at prepare time, physical_explain.rs:12-40)."""
    ctx = db.connect()
    res = ctx.query("explain select a from t where b > 15")
    keys = [r[0] for r in res.rows()]
    assert keys == ["logical_plan", "optimized_logical_plan", "physical_plan"]
    vals = {r[0]: r[1] for r in res.rows()}
    assert "TableScan" in vals["physical_plan"]
    assert all(v.strip() for v in vals.values())


def test_v2_multi_statement(db):
    """ADVICE round 4 (low): multi-statement input runs every statement in
    the v2 personality, like the v1 path (no parse_one restriction)."""
    ctx = db.connect()
    results = ctx.query_all(
        "insert into t values (4, 40); select sum(a) from t"
    )
    assert results[-1].rows() == [["10"]]
