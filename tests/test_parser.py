import pytest

import sqlrs_tpu  # noqa: F401
from sqlrs_tpu.errors import ParserError
from sqlrs_tpu.parser import ast, parse, parse_one


def test_select_basic():
    s = parse_one("select a, b from t1 where a > 1")
    assert isinstance(s, ast.SelectStmt)
    assert len(s.select_list) == 2
    assert isinstance(s.from_table, ast.BaseTableRef)
    assert s.from_table.name == "t1"
    assert isinstance(s.where, ast.BinaryOp)


def test_select_without_from():
    s = parse_one("select 1, 2.3, 'x', true, null")
    kinds = [e.kind for e in s.select_list]
    assert kinds == ["int", "float", "string", "bool", "null"]


def test_precedence():
    s = parse_one("select 1 + 2 * 3 > 4 and true or false")
    top = s.select_list[0]
    assert isinstance(top, ast.BinaryOp) and top.op == "OR"
    assert top.left.op == "AND"
    cmp = top.left.left
    assert cmp.op == ">"
    assert cmp.left.op == "+"
    assert cmp.left.right.op == "*"


def test_aliases():
    s = parse_one("select a as c1, b c2, sum(c) from t")
    assert s.aliases == ["c1", "c2", None]


def test_joins_left_deep():
    s = parse_one(
        "select * from a left join b on a.x=b.x right join c on c.y=a.y"
    )
    j = s.from_table
    assert isinstance(j, ast.JoinRef) and j.join_type == "right"
    assert isinstance(j.left, ast.JoinRef) and j.left.join_type == "left"


def test_comma_cross_join():
    s = parse_one("select * from t1, t2 where t1.a = 0")
    assert isinstance(s.from_table, ast.JoinRef)
    assert s.from_table.join_type == "cross"


def test_subquery_in_from_requires_nothing_but_parses():
    s = parse_one("select t.a from (select * from t1 where a > 1) t where t.b > 7")
    assert isinstance(s.from_table, ast.SubqueryRef)
    assert s.from_table.alias == "t"


def test_scalar_subquery():
    s = parse_one("select a, (select max(b) from t1) max_b from t1")
    assert isinstance(s.select_list[1], ast.ScalarSubquery)
    assert s.aliases[1] == "max_b"


def test_agg_distinct_forms():
    s = parse_one("select sum(distinct b), sum(distinct(b)), count(distinct(b)) from t2")
    assert all(isinstance(e, ast.FunctionCall) and e.distinct for e in s.select_list)


def test_count_star():
    s = parse_one("select count(*) from t")
    fc = s.select_list[0]
    assert isinstance(fc.args[0], ast.Star)


def test_order_limit_offset_any_order():
    s = parse_one("select id from employee order by id desc offset 2 limit 1")
    assert not s.order_by[0].asc
    assert s.limit.value == 1 and s.offset.value == 2
    s2 = parse_one("select id from e limit 2 offset 1")
    assert s2.limit.value == 2 and s2.offset.value == 1


def test_qualified_star():
    s = parse_one("select t.*, *, t1.a from t1 t")
    assert isinstance(s.select_list[0], ast.Star)
    assert s.select_list[0].qualifier == "t"
    assert isinstance(s.select_list[1], ast.Star)
    assert s.select_list[1].qualifier is None


def test_create_table():
    s = parse_one(
        "create table t3(v1 boolean, v2 tinyint unsigned, v3 smallint unsigned,"
        " v4 int unsigned, v5 bigint unsigned, v6 float, v7 double, v8 varchar)"
    )
    from sqlrs_tpu.types import LogicalType as LT

    assert [c.type for c in s.columns] == [
        LT.BOOLEAN, LT.UTINYINT, LT.USMALLINT, LT.UINTEGER,
        LT.UBIGINT, LT.FLOAT, LT.DOUBLE, LT.VARCHAR,
    ]


def test_create_table_as():
    s = parse_one("create table x as select * from read_csv('tests/csv/t2.csv')")
    assert s.as_query is not None


def test_insert_forms():
    s = parse_one("insert into t1(v3, v2) values ('0','4'), ('1','5')")
    assert s.columns == ["v3", "v2"] and len(s.values) == 2
    s2 = parse_one("INSERT INTO integers SELECT 42")
    assert s2.query is not None


def test_copy():
    s = parse_one("copy state from 'tests/slt/csv/state2.csv' ( DELIMITER '|', HEADER false)")
    assert s.path.endswith("state2.csv")
    assert s.options == {"delimiter": "|", "header": False}


def test_table_function_named_args():
    s = parse_one("select a from read_csv('t1.csv', header=>true, delim=>',') where a = 1")
    tf = s.from_table
    assert tf.name == "read_csv"
    assert set(tf.named_args) == {"header", "delim"}


def test_replacement_scan():
    s = parse_one("select tt.a from 'tests/csv/t1.csv' tt")
    tf = s.from_table
    assert tf.name == "read_csv" and tf.alias == "tt"


def test_date_interval_literals():
    s = parse_one("select date '1998-12-01' - interval '1' month")
    e = s.select_list[0]
    assert isinstance(e, ast.BinaryOp) and e.op == "-"
    assert isinstance(e.left, ast.TypedString)
    assert isinstance(e.right, ast.IntervalLiteral) and e.right.unit == "MONTH"


def test_statements_split():
    stmts = parse("create table t1(v1 int); insert into t1 values (1);")
    assert len(stmts) == 2


def test_show_describe_explain():
    assert isinstance(parse_one("show tables"), ast.ShowTablesStmt)
    assert isinstance(parse_one("describe t1"), ast.DescribeStmt)
    e = parse_one("explain select 1")
    assert isinstance(e, ast.ExplainStmt)


def test_string_escaping_and_unicode():
    s = parse_one("select 'it''s', '😇'")
    assert s.select_list[0].value == "it's"
    assert s.select_list[1].value == "😇"


def test_parse_error():
    with pytest.raises(ParserError):
        parse_one("select from where")
    with pytest.raises(ParserError):
        parse_one("selec 1")
