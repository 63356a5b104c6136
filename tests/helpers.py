from __future__ import annotations

from decimal import Decimal


def canon(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return round(v, 9)
    return v


def rows_of(df):
    return sorted(tuple(canon(v) for v in r) for r in df.collect())


def duck_rows(con, sql):
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return cols, sorted(tuple(canon(v) for v in r) for r in res.fetchall())
