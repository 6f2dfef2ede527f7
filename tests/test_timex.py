"""TIMEX-lite normalization (operators/timex): every surface family,
the dayfirst flag, range validation, and free-text scanning."""

from __future__ import annotations

import pytest

from deepee_spark.operators.timex import extract_dates, normalize_date_col


CASES = [
    ("2020-01-05", "2020-01-05"),
    (" 2020-01-05 ", "2020-01-05"),          # trimmed
    ("2020-13-05", None),                     # bad month
    ("2020-01-32", None),                     # bad day
    ("1/5/2020", "2020-01-05"),               # M/D/Y default
    ("12/31/1999", "1999-12-31"),
    ("13/31/1999", None),                     # month 13
    ("January 5, 2020", "2020-01-05"),
    ("january 5 2020", "2020-01-05"),         # case-insensitive, no comma
    ("Jan 5th, 2020", "2020-01-05"),          # abbreviation + ordinal
    ("Sept 1, 2020", "2020-09-01"),           # 4-letter abbreviation
    ("Frobuary 5, 2020", None),               # unknown month name
    ("5 January 2020", "2020-01-05"),
    ("31st Dec, 1999", "1999-12-31"),
    ("3rd Mar 2021", "2021-03-03"),
    ("not a date", None),
    ("", None),
]


@pytest.mark.parametrize("raw,expect", CASES)
def test_normalize_forms(spark, raw, expect):
    df = spark.createDataFrame([(raw,)], "d string")
    got = normalize_date_col(df, "d").collect()[0].iso_date
    assert got == expect, (raw, got, expect)


def test_dayfirst_slash(spark):
    df = spark.createDataFrame([("5/1/2020",), ("31/12/1999",)], "d string")
    got = [r.iso_date for r in normalize_date_col(df, "d", dayfirst=True).collect()]
    assert got == ["2020-01-05", "1999-12-31"]
    # 31/12 under month-first is invalid
    got_mf = [r.iso_date for r in normalize_date_col(df, "d").collect()]
    assert got_mf == ["2020-05-01", None]


def test_extract_dates_scan(spark):
    text = (
        "Founded on January 5, 2020 in Berlin. IPO 2021-06-30; "
        "rumors since 12/31/2019, denied on 3rd Mar 2021. Noise 99/99/9999."
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = extract_dates(df).collect()
    got = {(r.mention, r.iso_date) for r in rows}
    assert ("January 5, 2020", "2020-01-05") in got
    assert ("2021-06-30", "2021-06-30") in got
    assert ("12/31/2019", "2019-12-31") in got
    assert ("3rd Mar 2021", "2021-03-03") in got
    assert not any("9999" in m for m, _ in got)
    assert len(got) == 4
